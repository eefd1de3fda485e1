package graft

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._
import graft.plans.{WkbFromPolygons, WkbGeometry, WkbToPolygons}

/** WKB / GeoParquet bridge (reference: io_managers.py:395-397,
  * spatial.py:15-50 — geopandas moves geometry as WKB inside parquet). */
class WkbSpec extends SparkSpec {
  import spark.implicits._

  private type Ring = IndexedSeq[(Double, Double)]
  private def sq(ox: Double, oy: Double, s: Double): Ring =
    IndexedSeq((ox, oy), (ox + s, oy), (ox + s, oy + s), (ox, oy + s))
  // concave L (CCW) and its reverse-wound twin
  private val ell: Ring =
    IndexedSeq((0.0, 0.0), (4.0, 0.0), (4.0, 2.0), (2.0, 2.0), (2.0, 4.0), (0.0, 4.0))

  test("encode: known byte vector for a unit-grid polygon") {
    // POLYGON((0 0,4 0,4 4,0 4,0 0)) little-endian:
    // 01 | 03000000 | 01000000 | 05000000 | 5 x (x,y) doubles
    val wkb = WkbGeometry.encode(IndexedSeq(IndexedSeq(sq(0, 0, 4))), forceMulti = false)
    val hexStr = wkb.map("%02x".format(_)).mkString
    val zero = "0000000000000000"
    val four = "0000000000001040" // 4.0 = 0x4010000000000000, LE
    assert(hexStr ==
      "010300000001000000" + "05000000" +
        zero + zero + four + zero + four + four + zero + four + zero + zero)
  }

  test("round-trip: concave multipolygon with a hole, either winding") {
    val polys: WkbGeometry.Polys = IndexedSeq(
      IndexedSeq(ell.reverse),                       // CW shell, no hole
      IndexedSeq(sq(10, 10, 8), sq(12, 12, 2)))      // shell + hole
    for (multi <- Seq(false, true)) {
      val (gtype, back) = WkbGeometry.decode(WkbGeometry.encode(polys, multi))
      assert(gtype == WkbGeometry.MULTIPOLYGON) // 2 polys => multi either way
      assert(back == polys)
    }
    val single: WkbGeometry.Polys = IndexedSeq(IndexedSeq(ell, sq(1, 1, 1)))
    assert(WkbGeometry.decode(WkbGeometry.encode(single, forceMulti = false)) ==
      ((WkbGeometry.POLYGON, single)))
    assert(WkbGeometry.decode(WkbGeometry.encode(single, forceMulti = true)) ==
      ((WkbGeometry.MULTIPOLYGON, single)))
  }

  test("decode: big-endian input and unclosed rings accepted") {
    // hand-build a big-endian POLYGON((0 0,1 0,0 1)) with NO closing vertex
    val bb = ByteBuffer.allocate(1 + 4 + 4 + 4 + 3 * 16).order(ByteOrder.BIG_ENDIAN)
    bb.put(0.toByte); bb.putInt(3); bb.putInt(1); bb.putInt(3)
    Seq((0.0, 0.0), (1.0, 0.0), (0.0, 1.0)).foreach { case (x, y) =>
      bb.putDouble(x); bb.putDouble(y)
    }
    // a 3-point ring is below WKB's closed-ring minimum of 4
    intercept[Exception](WkbGeometry.decode(bb.array()))
    val bb4 = ByteBuffer.allocate(1 + 4 + 4 + 4 + 4 * 16).order(ByteOrder.BIG_ENDIAN)
    bb4.put(0.toByte); bb4.putInt(3); bb4.putInt(1); bb4.putInt(4)
    Seq((0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0)).foreach { case (x, y) =>
      bb4.putDouble(x); bb4.putDouble(y)
    }
    // unclosed 4-vertex ring: all four vertices survive
    assert(WkbGeometry.decode(bb4.array()) ==
      ((WkbGeometry.POLYGON, IndexedSeq(IndexedSeq(sq(0, 0, 1))))))
  }

  test("decode: unsupported type codes fail fast, naming the code") {
    val bb = ByteBuffer.allocate(1 + 4 + 16).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(1.toByte); bb.putInt(1); bb.putDouble(2.0); bb.putDouble(3.0) // Point
    val e = intercept[IllegalArgumentException](WkbGeometry.decode(bb.array()))
    assert(e.getMessage.contains("type 1"))
  }

  test("Column expressions round-trip and feed the spatial kit") {
    val df = Seq((1L, 2.0), (2L, 6.0)).toDF("id", "off")
    def pt(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      struct(x.as("x"), y.as("y"))
    val ring = array(
      pt(col("off"), lit(0.0)), pt(col("off") + 4.0, lit(0.0)),
      pt(col("off") + 4.0, lit(2.0)), pt(col("off") + 2.0, lit(2.0)),
      pt(col("off") + 2.0, lit(4.0)), pt(col("off"), lit(4.0)))
    val out = df
      .withColumn("wkb", WkbFromPolygons(array(array(ring))))
      .withColumn("dec", WkbToPolygons(col("wkb")))
      .select(col("id"), col("dec.wkb_type").as("t"),
        graft.spatial.SpatialOps.shoelaceArea(
          element_at(element_at(col("dec.polys"), 1), 1)).as("area"),
        (element_at(col("dec.polys"), 1) === array(ring)).as("same"))
      .collect()
    assert(out.forall(r => r.getInt(1) == 3 && r.getDouble(2) == 12.0 &&
      r.getBoolean(3)))
  }

}
