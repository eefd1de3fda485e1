package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Minimal pure-JDK dBase III / FoxPro DBF reader — the binary format
  * behind the reference's FERC Form 1 extraction
  * (`FercDbfReader`/`FercDbfExtractor`,
  * `/root/reference/src/pudl/extract/dbf.py:294-676`). No external codec:
  * the format is a fixed-width binary table (32-byte header, 32-byte field
  * descriptors, one fixed-size record per row with a deletion flag).
  *
  * Distribution model mirrors the reference's per-year archives: one file
  * per partition via `binaryFiles`, parsed entirely in the executor that
  * holds it; the schema comes from the first file (per-year drift is then
  * `Extractor.extract`'s column-map alignment job, as in the reference).
  *
  * Field types: C→string, N/F (decimals>0)→double, N (decimals=0)→long,
  * L→boolean (Y/T/y/t true, N/F/n/f false, else null), D→date(yyyyMMdd);
  * blank numerics → null; deleted records (0x2A flag) are skipped.
  */
object DbfReader {

  case class DbfField(name: String, ftype: Char, length: Int, decimals: Int)

  def parseHeader(bytes: Array[Byte]): (Seq[DbfField], Int, Int) = {
    def u8(i: Int): Int = bytes(i) & 0xff
    val headerSize = u8(8) | (u8(9) << 8)
    val recordSize = u8(10) | (u8(11) << 8)
    val fields = Iterator.from(0)
      .map(i => 32 + i * 32)
      .takeWhile(off => off + 32 <= headerSize && (bytes(off) & 0xff) != 0x0d)
      .map { off =>
        val nameBytes = bytes.slice(off, off + 11).takeWhile(_ != 0)
        DbfField(new String(nameBytes, "US-ASCII").trim,
          (bytes(off + 11) & 0xff).toChar, u8(off + 16), u8(off + 17))
      }.toSeq
    (fields, headerSize, recordSize)
  }

  def sparkType(f: DbfField): DataType = f.ftype match {
    case 'C' => StringType
    case 'N' | 'F' => if (f.decimals > 0 || f.ftype == 'F') DoubleType else LongType
    case 'L' => BooleanType
    case 'D' => DateType
    case _ => StringType
  }

  def schemaOf(fields: Seq[DbfField]): StructType =
    StructType(fields.map(f => StructField(f.name, sparkType(f), nullable = true)))

  /** Parse one DBF file's bytes into rows (deleted records skipped). */
  def parseRecords(bytes: Array[Byte]): Seq[Row] = {
    val (fields, headerSize, recordSize) = parseHeader(bytes)
    val out = Seq.newBuilder[Row]
    var off = headerSize
    while (off + recordSize <= bytes.length && (bytes(off) & 0xff) != 0x1a) {
      val deleted = (bytes(off) & 0xff) == 0x2a
      if (!deleted) {
        var pos = off + 1
        val vals = fields.map { f =>
          val raw = new String(bytes.slice(pos, pos + f.length), "US-ASCII")
          pos += f.length
          val s = raw.trim
          f.ftype match {
            case 'C' => if (s.isEmpty) null else s
            case 'N' | 'F' =>
              if (s.isEmpty) null
              // explicit Any: a bare if/else would numerically widen the
              // Long branch to Double and break the declared LongType
              else if (f.decimals > 0 || f.ftype == 'F') (s.toDouble: Any)
              else (s.toLong: Any)
            case 'L' => s.toUpperCase match {
              case "Y" | "T" => true
              case "N" | "F" => false
              case _ => null
            }
            case 'D' =>
              if (s.length == 8 && s.forall(_.isDigit))
                java.sql.Date.valueOf(
                  s"${s.substring(0, 4)}-${s.substring(4, 6)}-${s.substring(6, 8)}")
              else null
            case _ => if (s.isEmpty) null else s
          }
        }
        out += Row.fromSeq(vals)
      }
      off += recordSize
    }
    out.result()
  }

  /** Read a glob of DBF files into one DataFrame. Schema from the first
    * file; every file is parsed where its bytes live (one task per file). */
  def read(spark: SparkSession, pathGlob: String): DataFrame = {
    val files = spark.sparkContext.binaryFiles(pathGlob)
    val firstBytes = files.first()._2.toArray()
    val schema = schemaOf(parseHeader(firstBytes)._1)
    val rows = files.flatMap { case (_, stream) => parseRecords(stream.toArray()) }
    spark.createDataFrame(rows, schema)
  }
}
