package graft.sources

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.ByteBuffer
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Pure-JDK SQLite database writer — the `SqliteIOManager.handle_output`
  * twin (`/root/reference/src/pudl/dagster/io_managers.py:245-320`) with no
  * sqlite library dependency, implementing the public SQLite file format
  * (https://sqlite.org/fileformat2.html) directly: database header,
  * table b-tree leaf/interior pages, varint record encoding with standard
  * serial types, and chained overflow pages for large payloads.
  *
  * Scale position: SQLite is the reference's *legacy* single-file sink
  * (parquet is canonical there and here — `ParquetSink`). A SQLite file is
  * inherently a single-node artifact, so this sink streams rows to the
  * driver via `toLocalIterator` (one partition in memory at a time) and is
  * meant for dimension/metadata-sized outputs, exactly how the reference
  * uses it. Big tables belong in parquet.
  *
  * Layout produced: page 1 = header + `sqlite_master` leaf; then, per
  * table, its leaf pages followed by interior levels built bottom-up.
  * Text encoding UTF-8, schema format 1, reserved space 0.
  */
object SqliteSink {

  private val PageSize = 4096
  private val Usable = PageSize // reserved-per-page = 0
  // table b-tree payload spill thresholds (fileformat2.html §B-tree Pages)
  private val MaxLeafLocal = Usable - 35
  private val MinLocal = (Usable - 12) * 32 / 255 - 23

  // ---------- varints & records ----------

  private def varint(v: Long): Array[Byte] = {
    if (v == 0) return Array(0.toByte)
    require(v >= 0, s"negative varint $v")
    val groups = new scala.collection.mutable.ArrayBuffer[Int]
    var x = v
    while (x != 0) { groups += (x & 0x7f).toInt; x >>>= 7 }
    val out = groups.reverse.zipWithIndex.map { case (g, i) =>
      if (i == groups.length - 1) g.toByte else (g | 0x80).toByte
    }
    out.toArray
  }

  /** (serialType, bodyBytes) for one value per the record format. */
  private def encodeValue(v: Any): (Long, Array[Byte]) = v match {
    case null => (0L, Array.empty)
    case b: Boolean => encodeValue(if (b) 1L else 0L)
    case i: Int => encodeValue(i.toLong)
    case s: Short => encodeValue(s.toLong)
    case b: Byte => encodeValue(b.toLong)
    case l: Long =>
      if (l == 0L) (8L, Array.empty)
      else if (l == 1L) (9L, Array.empty)
      else {
        val nBytes =
          if (l >= -128 && l <= 127) 1
          else if (l >= -32768 && l <= 32767) 2
          else if (l >= -8388608 && l <= 8388607) 3
          else if (l >= Int.MinValue && l <= Int.MaxValue) 4
          else if (l >= -140737488355328L && l <= 140737488355327L) 6
          else 8
        val st = nBytes match {
          case 1 => 1L; case 2 => 2L; case 3 => 3L
          case 4 => 4L; case 6 => 5L; case 8 => 6L
        }
        val body = (0 until nBytes).reverseIterator
          .map(i => ((l >> (8 * i)) & 0xff).toByte).toArray
        (st, body)
      }
    case f: Float => encodeValue(f.toDouble)
    case d: Double =>
      val bb = ByteBuffer.allocate(8); bb.putDouble(d); (7L, bb.array())
    case s: String =>
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      (13L + 2L * b.length, b)
    case b: Array[Byte] => (12L + 2L * b.length, b)
    case d: java.sql.Date => encodeValue(d.toString)
    case d: java.time.LocalDate => encodeValue(d.toString)
    case t: java.sql.Timestamp =>
      encodeValue(t.toInstant.toString.stripSuffix("Z").replace("T", " "))
    case t: java.time.Instant =>
      encodeValue(t.toString.stripSuffix("Z").replace("T", " "))
    case d: java.math.BigDecimal => encodeValue(d.toPlainString)
    case other => encodeValue(other.toString)
  }

  /** Full record (header + body) for one row of values. */
  private def record(values: Seq[Any]): Array[Byte] = {
    val encoded = values.map(encodeValue)
    val stBytes = encoded.map(e => varint(e._1))
    val stLen = stBytes.map(_.length).sum
    // header length includes its own varint — iterate to the fixpoint
    var hdrLen = stLen + 1
    while (varint(hdrLen).length + stLen != hdrLen)
      hdrLen = varint(hdrLen).length + stLen
    val out = new java.io.ByteArrayOutputStream()
    out.write(varint(hdrLen))
    stBytes.foreach(out.write)
    encoded.foreach(e => out.write(e._2))
    out.toByteArray
  }

  // ---------- page assembly ----------

  private final class Db {
    val pages = new scala.collection.mutable.ArrayBuffer[Array[Byte]]
    def newPage(): Int = { pages += new Array[Byte](PageSize); pages.length }
    def page(n: Int): Array[Byte] = pages(n - 1)
  }

  /** One table-leaf cell, spilling to overflow pages when needed.
    * Returns the cell bytes (local part + 4-byte overflow pointer). */
  private def leafCell(db: Db, rowid: Long, payload: Array[Byte]): Array[Byte] = {
    val p = payload.length
    val head = varint(p.toLong) ++ varint(rowid)
    if (p <= MaxLeafLocal) head ++ payload
    else {
      val k = MinLocal + (p - MinLocal) % (Usable - 4)
      val local = if (k <= MaxLeafLocal) k else MinLocal
      var rest = payload.drop(local)
      // chain overflow pages: [4-byte next][data]
      val firstOv = db.newPage()
      var cur = firstOv
      while (rest.nonEmpty) {
        val chunk = rest.take(Usable - 4)
        rest = rest.drop(Usable - 4)
        val next = if (rest.nonEmpty) db.newPage() else 0
        val pg = db.page(cur)
        putInt(pg, 0, next)
        System.arraycopy(chunk, 0, pg, 4, chunk.length)
        cur = next
      }
      head ++ payload.take(local) ++ intBytes(firstOv)
    }
  }

  private def intBytes(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def putInt(page: Array[Byte], off: Int, v: Int): Unit =
    System.arraycopy(intBytes(v), 0, page, off, 4)
  private def putShort(page: Array[Byte], off: Int, v: Int): Unit = {
    page(off) = ((v >> 8) & 0xff).toByte; page(off + 1) = (v & 0xff).toByte
  }

  /** Pack cells into b-tree pages (leaf type 13 or interior type 5).
    * `headerAt` leaves room for the 100-byte db header on page 1. */
  private def packPage(db: Db, pageNo: Int, pageType: Int,
                       cells: Seq[Array[Byte]], rightMost: Int = 0): Unit = {
    val pg = db.page(pageNo)
    val hdrOff = if (pageNo == 1) 100 else 0
    val btHdrLen = if (pageType == 5) 12 else 8
    pg(hdrOff) = pageType.toByte
    putShort(pg, hdrOff + 1, 0) // no freeblocks
    putShort(pg, hdrOff + 3, cells.length)
    pg(hdrOff + 7) = 0 // fragmented bytes
    if (pageType == 5) putInt(pg, hdrOff + 8, rightMost)
    var content = PageSize
    val ptrArray = hdrOff + btHdrLen
    cells.zipWithIndex.foreach { case (c, i) =>
      content -= c.length
      System.arraycopy(c, 0, pg, content, c.length)
      putShort(pg, ptrArray + 2 * i, content)
    }
    putShort(pg, hdrOff + 5, if (content == 65536) 0 else content)
  }

  private def pageCapacity(pageNo: Int, pageType: Int): Int = {
    val hdr = (if (pageNo == 1) 100 else 0) + (if (pageType == 5) 12 else 8)
    PageSize - hdr
  }

  /** Build a table b-tree from (rowid, payload) pairs; returns root page.
    * Leaves are filled greedily, then interior levels bottom-up. */
  private def buildTable(db: Db, rows: Iterator[(Long, Array[Byte])]): Int = {
    // fill leaves
    val leaves = new scala.collection.mutable.ArrayBuffer[(Int, Long)] // (page, maxRowid)
    var cells = new scala.collection.mutable.ArrayBuffer[Array[Byte]]
    var used = 0
    var maxRowid = 0L
    def flushLeaf(): Unit = if (cells.nonEmpty) {
      val pg = db.newPage()
      packPage(db, pg, 13, cells.toSeq)
      leaves += ((pg, maxRowid))
      cells = new scala.collection.mutable.ArrayBuffer[Array[Byte]]
      used = 0
    }
    rows.foreach { case (rowid, payload) =>
      val cell = leafCell(db, rowid, payload)
      val need = cell.length + 2
      if (used + need > pageCapacity(0, 13) && cells.nonEmpty) flushLeaf()
      cells += cell; used += need; maxRowid = rowid
    }
    flushLeaf()
    if (leaves.isEmpty) { // empty table: one empty leaf
      val pg = db.newPage(); packPage(db, pg, 13, Seq.empty); return pg
    }
    // interior levels
    var level = leaves.toSeq
    while (level.length > 1) {
      val parents = new scala.collection.mutable.ArrayBuffer[(Int, Long)]
      var kids = new scala.collection.mutable.ArrayBuffer[(Int, Long)]
      var bytes = 0
      def flushInterior(): Unit = if (kids.nonEmpty) {
        val pg = db.newPage()
        val cellsI = kids.init.map { case (child, key) =>
          intBytes(child) ++ varint(key)
        }
        packPage(db, pg, 5, cellsI.toSeq, rightMost = kids.last._1)
        parents += ((pg, kids.last._2))
        kids = new scala.collection.mutable.ArrayBuffer[(Int, Long)]
        bytes = 0
      }
      level.foreach { case (child, key) =>
        val need = 4 + varint(key).length + 2
        if (bytes + need > pageCapacity(0, 5) - 4 && kids.nonEmpty) flushInterior()
        kids += ((child, key)); bytes += need
      }
      flushInterior()
      level = parents.toSeq
    }
    level.head._1
  }

  // ---------- public API ----------

  private def sqliteType(dt: DataType): String = dt match {
    case _: ByteType | _: ShortType | _: IntegerType | _: LongType |
         _: BooleanType => "INTEGER"
    case _: FloatType | _: DoubleType => "REAL"
    case _: BinaryType => "BLOB"
    case _ => "TEXT"
  }

  def createSql(table: String, schema: StructType): String =
    schema.fields
      .map(f => s""""${f.name}" ${sqliteType(f.dataType)}""")
      .mkString(s"""CREATE TABLE "$table" (""", ", ", ")")

  /** Write DataFrames into one SQLite database file. Rows stream through
    * the driver (`toLocalIterator`); rowids are 1-based insertion order. */
  def write(tables: Seq[(String, DataFrame)], path: String): Unit = {
    import scala.jdk.CollectionConverters._
    val db = new Db()
    require(db.newPage() == 1) // page 1: header + sqlite_master
    val masterRows = tables.map { case (name, df) =>
      val it = df.toLocalIterator().asScala.zipWithIndex
        .map { case (r: Row, i) => ((i + 1).toLong, record(r.toSeq)) }
      val root = buildTable(db, it)
      (name, root, createSql(name, df.schema))
    }
    val masterCells = masterRows.zipWithIndex.map { case ((name, root, sql), i) =>
      leafCell(db, i + 1L,
        record(Seq("table", name, name, root.toLong, sql)))
    }
    packPage(db, 1, 13, masterCells)
    writeHeader(db)
    val out = new BufferedOutputStream(new FileOutputStream(path))
    try db.pages.foreach(out.write) finally out.close()
  }

  private def writeHeader(db: Db): Unit = {
    val h = db.page(1)
    val magic = ("SQLite format 3"
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1) :+ 0.toByte)
    System.arraycopy(magic, 0, h, 0, 16)
    putShort(h, 16, PageSize)
    h(18) = 1; h(19) = 1 // write/read version: legacy (rollback journal)
    h(20) = 0 // reserved space per page
    h(21) = 64; h(22) = 32; h(23) = 32 // payload fractions (fixed values)
    putInt(h, 24, 1) // file change counter
    putInt(h, 28, db.pages.length) // database size in pages
    putInt(h, 32, 0); putInt(h, 36, 0) // freelist trunk / count
    putInt(h, 40, 1) // schema cookie
    putInt(h, 44, 1) // schema format 1
    putInt(h, 48, 0) // default page cache
    putInt(h, 52, 0) // largest root (non-vacuum: 0)
    putInt(h, 56, 1) // text encoding: UTF-8
    putInt(h, 60, 0) // user version
    putInt(h, 64, 0) // incremental vacuum
    putInt(h, 68, 0) // application id
    putInt(h, 92, 1) // version-valid-for
    putInt(h, 96, 3045001) // sqlite version number (3.45.1)
  }
}
