package graft

import java.nio.file.Files
import scala.sys.process._
import graft.sources.SqliteSink

/** Validates the pure-JDK SQLite writer against a REAL SQLite
  * implementation: files are written by `SqliteSink` and read back with
  * python3's stdlib `sqlite3` module (present in this environment; tests
  * cancel gracefully if not). Every test also runs PRAGMA integrity_check.
  */
class SqliteSinkSpec extends SparkSpec {
  import spark.implicits._

  private lazy val havePython =
    try { Seq("python3", "-c", "import sqlite3").! == 0 }
    catch { case _: Throwable => false }

  private def pyQuery(db: String, sql: String): String = {
    val script =
      s"""import sqlite3, json
         |con = sqlite3.connect("$db")
         |ic = con.execute("PRAGMA integrity_check").fetchone()[0]
         |rows = con.execute(${"\"\"\""}$sql${"\"\"\""}).fetchall()
         |print(json.dumps({"ic": ic, "rows": rows}))""".stripMargin
    val out = new StringBuilder; val err = new StringBuilder
    val rc = Seq("python3", "-c", script) !
      ProcessLogger(out.append(_), err.append(_))
    assert(rc == 0, s"python3 failed (rc=$rc): $err")
    out.toString.trim
  }

  test("mixed-type rows round-trip through a real sqlite3 reader") {
    assume(havePython, "python3+sqlite3 unavailable")
    val db = Files.createTempDirectory("sq").resolve("t.db").toString
    val df = Seq(
      (1L, "alpha", 1.5, Some(true)),
      (2L, "béta™", -0.25, Some(false)),
      (3L, null.asInstanceOf[String], 0.0, None)
    ).toDF("id", "name", "x", "flag")
    SqliteSink.write(Seq("t1" -> df), db)
    val out = pyQuery(db, "SELECT id, name, x, flag FROM t1 ORDER BY id")
    assert(out.contains("\"ic\": \"ok\""), s"integrity check failed: $out")
    assert(out.contains("[1, \"alpha\", 1.5, 1]"))
    assert(out.contains("[2, \"b\\u00e9ta\\u2122\", -0.25, 0]"))
    assert(out.contains("[3, null, 0.0, null]"))
  }

  test("multi-page table (interior b-tree) has every row and exact sums") {
    assume(havePython, "python3+sqlite3 unavailable")
    val db = Files.createTempDirectory("sq").resolve("big.db").toString
    val n = 20000
    val df = (1 to n).map(i => (i.toLong, s"name_$i" * 3, i * 7L))
      .toDF("id", "pad", "v")
    SqliteSink.write(Seq("big" -> df), db)
    val out = pyQuery(db,
      "SELECT count(*), sum(v), min(id), max(id) FROM big")
    assert(out.contains("\"ic\": \"ok\""), s"integrity check failed: $out")
    val expSum = (1 to n).map(_.toLong * 7).sum
    assert(out.contains(s"[$n, $expSum, 1, $n]"), out)
  }

  test("oversized text spills to overflow pages and reads back intact") {
    assume(havePython, "python3+sqlite3 unavailable")
    val db = Files.createTempDirectory("sq").resolve("ov.db").toString
    val big = "x" * 10000 + "END"
    val df = Seq((1L, big), (2L, "small")).toDF("id", "txt")
    SqliteSink.write(Seq("ov" -> df), db)
    val out = pyQuery(db,
      "SELECT id, length(txt), substr(txt, -3) FROM ov ORDER BY id")
    assert(out.contains("\"ic\": \"ok\""), s"integrity check failed: $out")
    assert(out.contains("[1, 10003, \"END\"]"), out)
    assert(out.contains("[2, 5, \"all\"]"), out)
  }

  test("multiple tables share one database file; empty table allowed") {
    assume(havePython, "python3+sqlite3 unavailable")
    val db = Files.createTempDirectory("sq").resolve("m.db").toString
    val a = Seq((1L, "x")).toDF("id", "s")
    val b = Seq.empty[(Long, Double)].toDF("k", "v")
    SqliteSink.write(Seq("ta" -> a, "tb" -> b), db)
    val out = pyQuery(db,
      "SELECT (SELECT count(*) FROM ta), (SELECT count(*) FROM tb), " +
        "(SELECT count(*) FROM sqlite_master WHERE type='table')")
    assert(out.contains("\"ic\": \"ok\""), s"integrity check failed: $out")
    assert(out.contains("[1, 0, 2]"), out)
  }

  test("integer width boundaries and blobs encode exactly") {
    assume(havePython, "python3+sqlite3 unavailable")
    val db = Files.createTempDirectory("sq").resolve("i.db").toString
    val vals = Seq(0L, 1L, -1L, 127L, -128L, 128L, 32767L, -32769L,
      8388607L, 2147483647L, -2147483649L, 140737488355327L,
      Long.MaxValue, Long.MinValue)
    val df = vals.zipWithIndex
      .map { case (v, i) => (i.toLong, v, Array(0xde.toByte, 0xad.toByte)) }
      .toDF("id", "v", "bin")
    SqliteSink.write(Seq("ints" -> df), db)
    val out = pyQuery(db, "SELECT v, hex(bin) FROM ints ORDER BY id")
    assert(out.contains("\"ic\": \"ok\""), s"integrity check failed: $out")
    vals.foreach(v => assert(out.contains(s"[$v, \"DEAD\"]"), s"$v in $out"))
  }

  test("three-level b-tree (interior of interiors) stays consistent") {
    assume(havePython, "python3+sqlite3 unavailable")
    val db = Files.createTempDirectory("sq").resolve("deep.db").toString
    val n = 60000
    val df = (1 to n).map(i => (i.toLong, i.toDouble * 0.5)).toDF("id", "v")
    SqliteSink.write(Seq("deep" -> df), db)
    val out = pyQuery(db,
      "SELECT count(*), sum(id), round(sum(v), 1) FROM deep")
    assert(out.contains("\"ic\": \"ok\""), s"integrity check failed: $out")
    val sid = (1 to n).map(_.toLong).sum
    assert(out.contains(s"[$n, $sid,"), out)
  }

  test("dates and timestamps store as ISO text") {
    assume(havePython, "python3+sqlite3 unavailable")
    val db = Files.createTempDirectory("sq").resolve("d.db").toString
    val df = Seq((java.sql.Date.valueOf("2026-08-12"),
      java.sql.Timestamp.valueOf("2026-08-12 13:45:00")))
      .toDF("d", "ts")
    SqliteSink.write(Seq("dt" -> df), db)
    val out = pyQuery(db, "SELECT d, ts FROM dt")
    assert(out.contains("\"ic\": \"ok\""), s"integrity check failed: $out")
    assert(out.contains("2026-08-12"), out)
  }
}
