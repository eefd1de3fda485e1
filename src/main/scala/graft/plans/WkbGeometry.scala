package graft.plans

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftaccess.Internals
import org.apache.spark.sql.types._

/** WKB (well-known binary) bridge between graft's native ring encoding and
  * the GeoParquet interchange format the reference reads and writes
  * (`/root/reference/src/pudl/dagster/io_managers.py:395-397`,
  * `/root/reference/src/pudl/analysis/spatial.py:15-50` — geopandas
  * serializes geometry columns as WKB inside parquet).
  *
  * graft's geometry kit ([[graft.spatial.SpatialOps]]) works on open
  * `array<struct<x:double,y:double>>` rings; real census/territory data
  * arrives as WKB Polygon / MultiPolygon blobs. These two expressions are
  * the (loss-free for doubles) bijection between the encodings, so the
  * overlay/dissolve/self-union machinery runs on actual GeoParquet without
  * conversion scripts:
  *
  *  - [[WkbToPolygons]]: binary → `struct<wkb_type:int,
  *    polys:array<array<array<struct<x,y>>>>>` — polygons × rings (shell
  *    first, then holes) × vertices, rings OPENED (the closing duplicate
  *    vertex is dropped). A WKB Polygon decodes as a 1-element `polys`.
  *    Both byte orders are accepted (the spec allows either; geopandas
  *    emits little-endian).
  *  - [[WkbFromPolygons]]: the inverse — emits canonical little-endian
  *    2D WKB with closed rings; a 1-element `polys` becomes a Polygon
  *    unless `forceMulti` asks for MultiPolygon.
  *
  * Scale shape: both are per-row scalar expressions over columnar
  * ArrayData / byte arrays — a narrow projection, no shuffle, no driver
  * state. CodegenFallback is fine: the work is one tight byte-buffer pass
  * per row, not per-element lambda dispatch.
  *
  * Only 2D Polygon (type 3) and MultiPolygon (type 6) are supported —
  * the reference's geometry universe. Other type codes (points, lines,
  * Z/M variants) raise `IllegalArgumentException` naming the code: honest
  * fail-fast beats silently nulling a 100 TB geometry column.
  */
object WkbGeometry {

  val pointType: StructType =
    StructType(Seq(StructField("x", DoubleType, nullable = false),
      StructField("y", DoubleType, nullable = false)))
  val ringType: ArrayType = ArrayType(pointType, containsNull = false)
  val polygonType: ArrayType = ArrayType(ringType, containsNull = false)
  val polysType: ArrayType = ArrayType(polygonType, containsNull = false)
  val decodedType: StructType =
    StructType(Seq(StructField("wkb_type", IntegerType, nullable = false),
      StructField("polys", polysType, nullable = false)))

  val POLYGON = 3
  val MULTIPOLYGON = 6

  /** polygons × rings × open vertex seq — the plain-JVM twin of the
    * Catalyst encodings, shared by both expressions and the specs. */
  type Polys = IndexedSeq[IndexedSeq[IndexedSeq[(Double, Double)]]]

  def encode(polys: Polys, forceMulti: Boolean): Array[Byte] = {
    def polygonSize(rings: IndexedSeq[IndexedSeq[(Double, Double)]]): Int =
      1 + 4 + 4 + rings.map(r => 4 + (r.length + 1) * 16).sum
    def putPolygon(bb: ByteBuffer,
                   rings: IndexedSeq[IndexedSeq[(Double, Double)]]): Unit = {
      bb.put(1.toByte) // little-endian marker
      bb.putInt(POLYGON)
      bb.putInt(rings.length)
      rings.foreach { r =>
        bb.putInt(r.length + 1) // closed on the wire
        r.foreach { case (x, y) => bb.putDouble(x); bb.putDouble(y) }
        bb.putDouble(r.head._1); bb.putDouble(r.head._2)
      }
    }
    require(polys.nonEmpty && polys.forall(p => p.nonEmpty && p.forall(_.length >= 3)),
      "wkb_from_polygons: every polygon needs >= 1 ring of >= 3 vertices")
    val multi = forceMulti || polys.length != 1
    val size = (if (multi) 1 + 4 + 4 else 0) + polys.map(polygonSize).sum
    val bb = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    if (multi) { bb.put(1.toByte); bb.putInt(MULTIPOLYGON); bb.putInt(polys.length) }
    polys.foreach(putPolygon(bb, _))
    bb.array()
  }

  def decode(wkb: Array[Byte]): (Int, Polys) = {
    val bb = ByteBuffer.wrap(wkb)
    def readHeader(): Int = {
      val order = bb.get()
      bb.order(if (order == 0) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN)
      bb.getInt()
    }
    def readRing(): IndexedSeq[(Double, Double)] = {
      val n = bb.getInt()
      require(n >= 4, s"wkb_to_polygons: ring with $n < 4 points")
      val pts = IndexedSeq.fill(n)((bb.getDouble(), bb.getDouble()))
      // drop the closing duplicate → graft's open-ring convention
      if (pts.head == pts.last) pts.dropRight(1) else pts
    }
    def readPolygonBody(): IndexedSeq[IndexedSeq[(Double, Double)]] =
      IndexedSeq.fill(bb.getInt())(readRing())
    val gtype = readHeader()
    val polys: Polys = gtype match {
      case POLYGON => IndexedSeq(readPolygonBody())
      case MULTIPOLYGON =>
        IndexedSeq.fill(bb.getInt()) {
          val t = readHeader() // each member carries its own header
          require(t == POLYGON,
            s"wkb_to_polygons: MultiPolygon member has type $t, expected 3")
          readPolygonBody()
        }
      case other => throw new IllegalArgumentException(
        s"wkb_to_polygons: unsupported WKB geometry type $other " +
          "(only 2D Polygon=3 / MultiPolygon=6)")
    }
    require(!bb.hasRemaining,
      s"wkb_to_polygons: ${bb.remaining()} trailing bytes after geometry")
    (gtype, polys)
  }
}

/** `array<array<array<struct<x,y>>>>` (polygons × open rings × vertices)
  * → canonical little-endian WKB Polygon/MultiPolygon bytes. */
case class WkbFromPolygons(child: Expression, forceMulti: Boolean)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ArrayType(ArrayType(StructType(fs), _), _), _)
      if fs.length == 2 && fs.forall(_.dataType == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      "wkb_from_polygons expects array<array<array<struct<x:double,y:double>>>>, " +
        s"got ${other.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "wkb_from_polygons"

  override def nullSafeEval(input: Any): Any = {
    val ps = input.asInstanceOf[ArrayData]
    val polys: WkbGeometry.Polys = IndexedSeq.tabulate(ps.numElements()) { i =>
      val rings = ps.getArray(i)
      IndexedSeq.tabulate(rings.numElements()) { j =>
        val ring = rings.getArray(j)
        IndexedSeq.tabulate(ring.numElements()) { k =>
          val s = ring.getStruct(k, 2)
          (s.getDouble(0), s.getDouble(1))
        }
      }
    }
    WkbGeometry.encode(polys, forceMulti)
  }

  override protected def withNewChildInternal(newChild: Expression): WkbFromPolygons =
    copy(child = newChild)
}

object WkbFromPolygons {
  def apply(polys: Column, forceMulti: Boolean = false): Column =
    Internals.column(WkbFromPolygons(Internals.expression(polys), forceMulti))
}

/** WKB Polygon/MultiPolygon bytes → `struct<wkb_type:int,
  * polys:array<array<array<struct<x,y>>>>>` with open rings. */
case class WkbToPolygons(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"wkb_to_polygons expects a binary column, got ${other.simpleString}")
  }
  override def dataType: DataType = WkbGeometry.decodedType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "wkb_to_polygons"

  override def nullSafeEval(input: Any): Any = {
    val (gtype, polys) = WkbGeometry.decode(input.asInstanceOf[Array[Byte]])
    val polysData = new GenericArrayData(polys.map { rings =>
      new GenericArrayData(rings.map { ring =>
        new GenericArrayData(ring.map { case (x, y) =>
          new GenericInternalRow(Array[Any](x, y)): InternalRow
        }.toArray[Any])
      }.toArray[Any])
    }.toArray[Any])
    new GenericInternalRow(Array[Any](gtype, polysData))
  }

  override protected def withNewChildInternal(newChild: Expression): WkbToPolygons =
    copy(child = newChild)
}

object WkbToPolygons {
  def apply(wkb: Column): Column =
    Internals.column(WkbToPolygons(Internals.expression(wkb)))
}
