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

  test("agglomerate: average-linkage semantics at the threshold") {
    // chain distances picked to DISTINGUISH average linkage: after {0,1}
    // merge (d=0.2), avg({0,1},{2}) = (0.5+0.45)/2 = 0.475 < 0.5 → merge,
    // where complete linkage (max = 0.5 >= 0.5) would stop
    val d1 = Array(
      Array(0.0, 0.2, 0.5),
      Array(0.2, 0.0, 0.45),
      Array(0.5, 0.45, 0.0))
    assert(NearDup.agglomerate(d1, 0.5).toSeq == Seq(0, 0, 0))
    // raise the far edge: avg = (0.6+0.45)/2 = 0.525 >= 0.5 → stop at two
    val d2 = Array(
      Array(0.0, 0.2, 0.6),
      Array(0.2, 0.0, 0.45),
      Array(0.6, 0.45, 0.0))
    assert(NearDup.agglomerate(d2, 0.5).toSeq == Seq(0, 0, 1))
    // nothing below threshold: all singletons, labeled by min member
    val d3 = Array(
      Array(0.0, 0.9, 0.8),
      Array(0.9, 0.0, 0.7),
      Array(0.8, 0.7, 0.0))
    assert(NearDup.agglomerate(d3, 0.5).toSeq == Seq(0, 1, 2))
  }

  test("splitClustersAgglomerative: reference (sklearn) semantics per cluster") {
    val dim = 4
    def axis(i: Int) = Array.tabulate(dim)(d => if (d == i) 1.0f else 0.0f)
    // cluster 1: records 1,2 identical (2019, 2020) + record 3 orthogonal
    // (2019): duplicate year → re-split by distance: {1,2} together, {3} out
    // cluster 2: records 4,5 identical AND both 2019: sklearn semantics
    // keep them together (distance 0) — the year constraint does NOT split,
    // unlike the greedy first-fit
    // cluster 3: no duplicate years → untouched, sub 0 for all
    val rows = Seq(
      (1L, 1L, "2019", axis(0)), (2L, 1L, "2020", axis(0)),
      (3L, 1L, "2019", axis(1)),
      (4L, 2L, "2019", axis(2)), (5L, 2L, "2019", axis(2)),
      (6L, 3L, "2019", axis(3)), (7L, 3L, "2020", axis(1))
    ).toDF("id", "cluster", "yr", "emb")
    val got = NearDup.splitClustersAgglomerative(rows, "cluster", "id",
        "yr", "emb", distanceThreshold = 0.5)
      .as[(Long, Long, Int)].collect().map(r => r._1 -> r._3).toMap
    assert(got(1L) == got(2L), s"identical cross-year pair stays: $got")
    assert(got(3L) != got(1L), s"orthogonal same-year record splits out: $got")
    assert(got(4L) == got(5L),
      s"identical same-year records stay together under sklearn semantics: $got")
    assert(got(6L) == 0 && got(7L) == 0, s"clean cluster untouched: $got")
    // contrast: the greedy first-fit splits 4 and 5 (year uniqueness)
    val greedy = NearDup.splitClusters(rows.select("id", "cluster", "yr"),
        "cluster", "id", "yr")
      .as[(Long, Long, Int)].collect().map(r => r._1 -> r._3).toMap
    assert(greedy(4L) != greedy(5L))
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
