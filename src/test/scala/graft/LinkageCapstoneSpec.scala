package graft

import org.apache.spark.sql.functions._

/** Linkage capstone (`Etl.buildLinkageWide`): the reference's
  * record-linkage pipeline start-to-finish — name canon → phonetic
  * blocking → FS training → prediction → best match — on the supplier
  * fixture's two legal-form dressings of the same entities. */
class LinkageCapstoneSpec extends SparkSpec {

  private lazy val out = Etl.buildLinkageWide(spark, sf).collect()

  test("cleaner is load-bearing: every true pair differs raw, agrees canon") {
    // replicate the two dressings for a handful of ids and check the
    // canon convergence the pipeline depends on
    import graft.functions.CompanyNames
    val ident = concat(lit("id"),
      translate(format_string("%05d", col("k")), "0123456789", "abcdefghij"))
    val probe = spark.range(1, 9).toDF("k")
      .withColumn("a", concat(lit("Acme Power & Light "), ident, lit(" "),
        element_at(array(Seq("LLC", "Inc.", "Corp", "Ltd").map(lit): _*),
          (pmod(col("k"), lit(4)) + 1).cast("int"))))
      .withColumn("b", upper(concat(lit("Acme Power & Light "), ident,
        lit(", "),
        element_at(array(Seq("Ltd Liability Co", "Incorporated",
          "Corporation", "Limited").map(lit): _*),
          (pmod(col("k"), lit(4)) + 1).cast("int")))))
      .select(col("a"), col("b"),
        (CompanyNames.clean(col("a")) === CompanyNames.clean(col("b")))
          .as("eq"),
        (col("a") === col("b")).as("rawEq"))
      .collect()
    assert(probe.forall(!_.getBoolean(3)), "raw names must differ")
    assert(probe.forall(_.getBoolean(2)),
      probe.filterNot(_.getBoolean(2)).take(2).mkString("; "))
  }

  test("one best match per right record; accepted matches are self-matches") {
    val rIds = out.map(_.getLong(0))
    assert(rIds.length == rIds.distinct.length, "r_id must be unique")
    assert(out.nonEmpty)
    val accepted = out.filter(_.getBoolean(7))
    assert(accepted.length * 10 >= out.length * 7,
      s"${accepted.length}/${out.length} accepted — FS should accept most")
    val selfAmongAccepted =
      accepted.count(r => r.getLong(0) == r.getLong(1))
    assert(selfAmongAccepted * 100 >= accepted.length * 95,
      s"$selfAmongAccepted/${accepted.length} accepted are self-matches")
  }

  test("accepted rows clear the 0.9 probability threshold, rejected don't") {
    val thr = math.round(math.log(0.9 / (1.0 - 0.9)) / math.log(2.0) * 1e9)
    assert(out.forall(r => r.getBoolean(7) == (r.getLong(6) >= thr)))
  }

  test("capstone run: write + checks pass end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("graft_linkcap")
    try {
      val (core, checks, failed) = Etl.linkageCapstone(spark, sf, dir.toString)
      assert(core > 0 && checks >= 0)
      assert(failed == 0, s"$failed failed checks")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rm)
        f.delete(); ()
      }
      rm(dir.toFile)
    }
  }
}
