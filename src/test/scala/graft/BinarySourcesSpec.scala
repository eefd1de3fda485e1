package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.sources.{DbfReader, XlsxReader}

/** Pure-JDK binary source readers (SURVEY §2.1 Excel/DBF rows): fixtures
  * are built byte-by-byte in the test, so the parsers are validated against
  * the format spec, not against another library. */
class BinarySourcesSpec extends SparkSpec {

  private def writeDbf(path: String): Unit = {
    val fields = Seq(
      ("NAME", 'C', 8, 0), ("QTY", 'N', 6, 0), ("PRICE", 'N', 8, 2),
      ("ACTIVE", 'L', 1, 0), ("DAY", 'D', 8, 0))
    val recordSize = 1 + fields.map(_._3).sum
    val headerSize = 32 + fields.size * 32 + 1
    val records = Seq(
      (" ", "alpha   ", "    42", "   12.50", "Y", "20240115"),
      ("*", "deleted ", "     1", "    1.00", "N", "20240101"), // deleted
      (" ", "beta    ", "      ", "        ", "?", "        "))
    val out = new ByteArrayOutputStream()
    def u8(v: Int): Unit = out.write(v & 0xff)
    u8(0x03); u8(124); u8(1); u8(15) // version + date
    val n = records.count(_._1 == " ")
    u8(records.size); u8(0); u8(0); u8(0) // record count (incl. deleted)
    u8(headerSize & 0xff); u8(headerSize >> 8)
    u8(recordSize & 0xff); u8(recordSize >> 8)
    (0 until 20).foreach(_ => u8(0))
    fields.foreach { case (name, t, len, dec) =>
      val nb = name.getBytes("US-ASCII")
      out.write(nb); (nb.length until 11).foreach(_ => u8(0))
      u8(t); (0 until 4).foreach(_ => u8(0))
      u8(len); u8(dec); (0 until 14).foreach(_ => u8(0))
    }
    u8(0x0d)
    records.foreach { case (flag, name, qty, price, active, day) =>
      out.write((flag + name + qty + price + active + day).getBytes("US-ASCII"))
    }
    u8(0x1a)
    val f = new FileOutputStream(path); f.write(out.toByteArray); f.close()
    assert(n == 2)
  }

  test("DbfReader parses records, types, nulls and skips deleted rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dbf").toString
    writeDbf(s"$dir/f2024.dbf")
    val df = DbfReader.read(spark, s"$dir/*.dbf")
    assert(df.schema.map(f => (f.name, f.dataType.simpleString)) == Seq(
      ("NAME", "string"), ("QTY", "bigint"), ("PRICE", "double"),
      ("ACTIVE", "boolean"), ("DAY", "date")))
    val rows = df.orderBy("NAME").collect()
    assert(rows.length == 2) // deleted row skipped
    assert(rows(0).getString(0) == "alpha" && rows(0).getLong(1) == 42L &&
      rows(0).getDouble(2) == 12.5 && rows(0).getBoolean(3) &&
      rows(0).getDate(4).toString == "2024-01-15")
    assert(rows(1).getString(0) == "beta" && rows(1).isNullAt(1) &&
      rows(1).isNullAt(2) && rows(1).isNullAt(3) && rows(1).isNullAt(4))
  }

  private def writeXlsx(path: String): Unit = {
    val shared =
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3"><si><t>Plant Name</t></si><si><t>Fuel</t></si><si><t>coal</t></si></sst>"""
    val sheet =
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="inlineStr"><is><t>MW</t></is></c></row>
        |<row r="2"><c r="A2" t="inlineStr"><is><t>Big Plant</t></is></c><c r="B2" t="s"><v>2</v></c><c r="C2"><v>451.5</v></c></row>
        |<row r="3"><c r="A3" t="inlineStr"><is><t>Small Plant</t></is></c><c r="C3"><v>7</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val zos = new ZipOutputStream(new FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    put("xl/sharedStrings.xml", shared)
    put("xl/worksheets/sheet1.xml", sheet)
    zos.close()
  }

  test("XlsxReader reads shared strings, inline strings, numbers, headers") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx").toString
    writeXlsx(s"$dir/y2024.xlsx")
    val df = XlsxReader.read(spark, s"$dir/*.xlsx", sheet = 1,
      skipRows = 0, headerRow = true)
    assert(df.columns.toSeq == Seq("plant_name", "fuel", "mw"))
    val rows = df.orderBy("plant_name").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "Big Plant" && rows(0).getString(1) == "coal"
      && rows(0).getString(2) == "451.5")
    assert(rows(1).getString(0) == "Small Plant" && rows(1).isNullAt(1) &&
      rows(1).getString(2) == "7")
  }

  test("XlsxReader output flows into the Extractor + enforceSchema path") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx2").toString
    writeXlsx(s"$dir/y2024.xlsx")
    val raw = XlsxReader.read(spark, s"$dir/*.xlsx")
    val res = graft.schema.Resource("plants", Seq(
      graft.schema.Field("plant_name", graft.schema.FieldType.Str),
      graft.schema.Field("mw", graft.schema.FieldType.Number)))
    val typed = res.enforceSchema(raw)
    assert(typed.schema("mw").dataType.simpleString == "double")
    assert(typed.where(org.apache.spark.sql.functions.col("mw") === 451.5)
      .count() == 1)
  }
}
