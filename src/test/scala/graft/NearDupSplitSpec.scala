package graft

import graft.dedup.NearDup

/** The window-function form of splitClusters must match a literal
  * set-based greedy first-fit simulation on arbitrary inputs. */
class NearDupSplitSpec extends SparkSpec {
  import spark.implicits._

  /** Reference simulation: place each member (id order) into the first
    * sub-cluster whose key-set lacks its key. */
  private def greedy(members: Seq[(Long, Long, String)]): Map[Long, Int] = {
    members.groupBy(_._2).flatMap { case (_, ms) =>
      val subs = scala.collection.mutable.ArrayBuffer
        .empty[scala.collection.mutable.Set[String]]
      ms.sortBy(_._1).map { case (id, _, key) =>
        val i = subs.indexWhere(!_.contains(key)) match {
          case -1 => subs += scala.collection.mutable.Set.empty[String]
                     subs.length - 1
          case j  => j
        }
        subs(i) += key
        id -> i
      }
    }
  }

  test("window first-fit == set-based greedy on random clusters") {
    val rnd = new scala.util.Random(31)
    val rows = (0 until 400).map { i =>
      (i.toLong, rnd.nextInt(12).toLong, s"y${rnd.nextInt(5)}")
    }
    val got = NearDup.splitClusters(rows.toDF("id", "cluster", "yr"),
        "cluster", "id", "yr")
      .as[(Long, Long, Int)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got == greedy(rows), "window form diverged from greedy simulation")
  }

  test("no (cluster, sub) holds a duplicate key; subs are dense from 0") {
    val rnd = new scala.util.Random(77)
    val rows = (0 until 300).map { i =>
      (i.toLong, rnd.nextInt(7).toLong, s"k${rnd.nextInt(3)}")
    }
    val out = NearDup.splitClusters(rows.toDF("id", "cluster", "yr"),
        "cluster", "id", "yr")
      .as[(Long, Long, Int)].collect()
    val bySub = out.groupBy(r => (r._2, r._3))
    val keyOf = rows.map(r => r._1 -> r._3).toMap
    bySub.foreach { case ((c, s), ms) =>
      val keys = ms.map(m => keyOf(m._1))
      assert(keys.distinct.length == keys.length,
        s"duplicate key inside cluster $c sub $s")
    }
    out.groupBy(_._2).foreach { case (c, ms) =>
      val subs = ms.map(_._3).distinct.sorted.toSeq
      assert(subs == (0 until subs.length), s"non-dense subs in cluster $c")
    }
  }
}
