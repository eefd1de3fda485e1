package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Minimal pure-JDK XLSX reader — the workbook format behind the
  * reference's EIA extraction (`ExcelExtractor`,
  * `/root/reference/src/pudl/extract/excel.py:94-256`). An .xlsx file is a
  * ZIP of XML parts; this reads `xl/worksheets/sheet{n}.xml` +
  * `xl/sharedStrings.xml` with the JDK's zip + StAX — no POI dependency.
  *
  * Faithful to the reference's shape: every cell surfaces as a STRING
  * column (`col_0..col_{n-1}` or the values of a designated header row);
  * per-year `skipRows`/sheet selection mirror the reference's page maps,
  * and typing happens downstream via column maps + `enforceSchema`
  * (`Extractor.extract`), exactly as the reference coerces after load.
  * Distribution: one file per task via `binaryFiles`, like the per-year
  * workbook fan-out.
  */
object XlsxReader {

  /** Parse one workbook's bytes: returns rows of (rowIndex, colIndex→text). */
  def parseSheet(bytes: Array[Byte], sheet: Int): Seq[(Int, Map[Int, String])] = {
    def entryBytes(name: String): Option[Array[Byte]] = {
      val zis = new ZipInputStream(new ByteArrayInputStream(bytes))
      try {
        Iterator.continually(zis.getNextEntry)
          .takeWhile(_ != null)
          .find(_.getName == name)
          .map { _ =>
            val buf = new java.io.ByteArrayOutputStream()
            val tmp = new Array[Byte](8192)
            Iterator.continually(zis.read(tmp)).takeWhile(_ > 0)
              .foreach(n => buf.write(tmp, 0, n))
            buf.toByteArray
          }
      } finally zis.close()
    }

    val factory = javax.xml.stream.XMLInputFactory.newInstance()
    factory.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)

    // shared strings table (optional part)
    val shared = entryBytes("xl/sharedStrings.xml").map { ss =>
      val r = factory.createXMLStreamReader(new ByteArrayInputStream(ss))
      val items = mutable.ArrayBuffer.empty[String]
      val cur = new StringBuilder
      var inT = false; var inSi = false
      while (r.hasNext) {
        r.next() match {
          case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
            r.getLocalName match {
              case "si" => inSi = true; cur.clear()
              case "t" if inSi => inT = true
              case _ => ()
            }
          case javax.xml.stream.XMLStreamConstants.CHARACTERS if inT =>
            cur.append(r.getText)
          case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
            r.getLocalName match {
              case "t" => inT = false
              case "si" => inSi = false; items += cur.toString
              case _ => ()
            }
          case _ => ()
        }
      }
      items.toIndexedSeq
    }.getOrElse(IndexedSeq.empty)

    val sheetBytes = entryBytes(s"xl/worksheets/sheet$sheet.xml")
      .getOrElse(throw new IllegalArgumentException(s"no sheet$sheet.xml"))
    val r = factory.createXMLStreamReader(new ByteArrayInputStream(sheetBytes))
    val rows = mutable.ArrayBuffer.empty[(Int, Map[Int, String])]
    var rowIdx = -1
    var rowCells = mutable.Map.empty[Int, String]
    var cellCol = -1; var cellType = ""; var inV = false; var inIs = false
    val v = new StringBuilder

    def colOf(ref: String): Int =
      ref.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1

    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              rowIdx = Option(r.getAttributeValue(null, "r"))
                .map(_.toInt - 1).getOrElse(rowIdx + 1)
              rowCells = mutable.Map.empty
            case "c" =>
              cellCol = Option(r.getAttributeValue(null, "r")).map(colOf)
                .getOrElse(cellCol + 1)
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
            case "v" => inV = true; v.clear()
            case "is" => inIs = true
            case "t" if inIs => inV = true; v.clear()
            case _ => ()
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if inV =>
          v.append(r.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" | "t" if inV =>
              inV = false
              val text = cellType match {
                case "s" => shared.lift(v.toString.toInt).orNull
                case "b" => if (v.toString == "1") "true" else "false"
                case _ => v.toString
              }
              if (text != null) rowCells(cellCol) = text
            case "is" => inIs = false
            case "row" => rows += ((rowIdx, rowCells.toMap))
            case _ => ()
          }
        case _ => ()
      }
    }
    rows.toSeq
  }

  /** Read a glob of xlsx files into one all-string DataFrame.
    * `skipRows` rows are dropped from the top; if `headerRow`, the next row
    * names the columns (else `col_0..`). Width = max used column. */
  def read(spark: SparkSession, pathGlob: String, sheet: Int = 1,
           skipRows: Int = 0, headerRow: Boolean = true): DataFrame = {
    val files = spark.sparkContext.binaryFiles(pathGlob)
    val firstRows = parseSheet(files.first()._2.toArray(), sheet)
      .sortBy(_._1).drop(skipRows)
    val width = firstRows.iterator.flatMap(_._2.keys).reduceOption(_ max _)
      .getOrElse(-1) + 1
    val names: Seq[String] =
      if (headerRow && firstRows.nonEmpty)
        (0 until width).map(i =>
          firstRows.head._2.getOrElse(i, s"col_$i").trim
            .toLowerCase.replaceAll("[^a-z0-9]+", "_"))
      else (0 until width).map(i => s"col_$i")
    val schema = StructType(names.map(StructField(_, StringType, nullable = true)))
    val dataStart = skipRows + (if (headerRow) 1 else 0)
    val rows = files.flatMap { case (_, stream) =>
      parseSheet(stream.toArray(), sheet).sortBy(_._1).drop(dataStart)
        .map { case (_, cells) =>
          Row.fromSeq((0 until width).map(i => cells.get(i).orNull))
        }
    }
    spark.createDataFrame(rows, schema)
  }
}
