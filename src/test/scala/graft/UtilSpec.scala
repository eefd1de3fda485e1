package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Util

class UtilSpec extends AnyFunSuite {

  test("isDoi accepts valid DOIs, rejects junk and null") {
    assert(Util.isDoi("10.5281/zenodo.123456"))
    assert(Util.isDoi("10.1234/ABC-def_(x):9"))
    assert(!Util.isDoi("doi:10.5281/zenodo.123456"))
    assert(!Util.isDoi("10.12/short-prefix"))
    assert(!Util.isDoi(null))
  }

  test("flattenList flattens arbitrary nesting") {
    assert(Util.flattenList(List(1, List(2, List(3, 4)), 5)) ==
      List(1, 2, 3, 4, 5))
    assert(Util.flattenList(Nil) == Nil)
  }

  test("listify wraps scalars and passes lists through") {
    assert(Util.listify(7) == List(7))
    assert(Util.listify(List("a", "b")) == List("a", "b"))
  }

  test("mergeDicts: later keys win") {
    assert(Util.mergeDicts(Seq(Map("a" -> 1, "b" -> 2), Map("b" -> 9))) ==
      Map("a" -> 1, "b" -> 9))
  }

  test("iterateMultivalue expands multi-value entries") {
    val got = Util.iterateMultivalue(
      scala.collection.immutable.ListMap("k" -> List(1, 2), "s" -> "x"))
    assert(got == Seq("k" -> 1, "k" -> 2, "s" -> "x"))
  }
}
