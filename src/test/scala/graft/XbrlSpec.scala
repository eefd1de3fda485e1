package graft

import java.nio.file.{Files, Paths}

import graft.sources.XbrlReader

/** XBRL instance reader (SURVEY §2.1 XBRL row): fixture instance documents
  * are authored inline against the XBRL 2.1 instance shape (contexts with
  * instant/duration periods, units, namespaced facts with contextRef), so
  * the parser is validated against the format, not another library. */
class XbrlSpec extends SparkSpec {

  private def instanceXml(entity: String, year: Int): String =
    s"""<?xml version="1.0" encoding="utf-8"?>
       |<xbrli:xbrl xmlns:xbrli="http://www.xbrl.org/2003/instance"
       |            xmlns:ferc="http://ferc.gov/form/2023-01-01/ferc">
       |  <xbrli:context id="c_instant">
       |    <xbrli:entity>
       |      <xbrli:identifier scheme="http://ferc.gov/CID">$entity</xbrli:identifier>
       |    </xbrli:entity>
       |    <xbrli:period><xbrli:instant>$year-12-31</xbrli:instant></xbrli:period>
       |  </xbrli:context>
       |  <xbrli:context id="c_year">
       |    <xbrli:entity>
       |      <xbrli:identifier scheme="http://ferc.gov/CID">$entity</xbrli:identifier>
       |    </xbrli:entity>
       |    <xbrli:period>
       |      <xbrli:startDate>$year-01-01</xbrli:startDate>
       |      <xbrli:endDate>$year-12-31</xbrli:endDate>
       |    </xbrli:period>
       |  </xbrli:context>
       |  <xbrli:unit id="usd">
       |    <xbrli:measure>iso4217:USD</xbrli:measure>
       |  </xbrli:unit>
       |  <ferc:PlantInServiceBase contextRef="c_instant" unitRef="usd"
       |    decimals="0">1000${year % 10}</ferc:PlantInServiceBase>
       |  <ferc:AccumulatedDepreciation contextRef="c_instant" unitRef="usd"
       |    decimals="0">250</ferc:AccumulatedDepreciation>
       |  <ferc:OperatingRevenue contextRef="c_year" unitRef="usd"
       |    decimals="0">777</ferc:OperatingRevenue>
       |  <ferc:UtilityName contextRef="c_year">Acme Power $entity</ferc:UtilityName>
       |</xbrli:xbrl>""".stripMargin

  test("XbrlReader parses contexts, units and facts into the long table") {
    val dir = Files.createTempDirectory("graft_xbrl").toString
    Files.writeString(Paths.get(dir, "f1.xbrl"), instanceXml("C001", 2023))
    Files.writeString(Paths.get(dir, "f2.xbrl"), instanceXml("C002", 2024))

    val facts = XbrlReader.read(spark, s"$dir/*.xbrl")
    assert(facts.count() == 8) // 4 facts × 2 filings
    val row = facts.where(facts("filing") === "f1.xbrl" &&
        facts("concept") === "PlantInServiceBase")
      .collect().head
    assert(row.getAs[String]("entity_id") == "C001")
    assert(row.getAs[String]("period_type") == "instant")
    assert(row.getAs[String]("date_instant") == "2023-12-31")
    assert(row.getAs[String]("unit") == "iso4217:USD")
    assert(row.getAs[String]("decimals") == "0")
    assert(row.getAs[String]("value") == "10003")

    val dur = facts.where(facts("concept") === "OperatingRevenue").collect()
    assert(dur.forall(_.getAs[String]("period_type") == "duration"))
    assert(dur.forall(_.getAs[String]("date_start").endsWith("-01-01")))
    // facts with no unitRef surface NULL unit
    val name = facts.where(facts("concept") === "UtilityName" &&
      facts("filing") === "f2.xbrl").collect().head
    assert(name.getAs[String]("unit") == null)
    assert(name.getAs[String]("value") == "Acme Power C002")
  }

  test("parseInstance round-trips arbitrary generated facts") {
    // property-style round trip on seeded random instances: serialize
    // random facts to instance XML, parse, compare field-by-field —
    // including XML-escaped text values
    val rnd = new scala.util.Random(42L)
    (0 until 10).foreach { trial =>
      val nCtx = 1 + rnd.nextInt(4)
      val ctxs = (0 until nCtx).map { c =>
        val inst = rnd.nextBoolean()
        (s"ctx$c", inst,
          f"20${10 + rnd.nextInt(15)}%d-01-01", f"20${10 + rnd.nextInt(15)}%d-12-31")
      }
      val facts = (0 until 1 + rnd.nextInt(8)).map { f =>
        val (cid, _, _, _) = ctxs(rnd.nextInt(nCtx))
        val value = rnd.nextInt(4) match {
          case 0 => s"${rnd.nextInt(100000)}"
          case 1 => s"name & <co> ${rnd.nextInt(99)}"   // escaping
          case 2 => s"  padded ${rnd.nextInt(99)}  "    // trimming
          case _ => s"${rnd.nextDouble()}"
        }
        (s"Concept$f", cid, value)
      }
      def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
      val xml = new StringBuilder(
        """<?xml version="1.0"?><xbrli:xbrl xmlns:xbrli="http://www.xbrl.org/2003/instance" xmlns:t="http://example.com/t">""")
      ctxs.foreach { case (cid, inst, d0, d1) =>
        xml.append(s"""<xbrli:context id="$cid"><xbrli:entity>""")
          .append(s"""<xbrli:identifier scheme="s">E$trial</xbrli:identifier>""")
          .append("</xbrli:entity><xbrli:period>")
          .append(
            if (inst) s"<xbrli:instant>$d1</xbrli:instant>"
            else s"<xbrli:startDate>$d0</xbrli:startDate><xbrli:endDate>$d1</xbrli:endDate>")
          .append("</xbrli:period></xbrli:context>")
      }
      facts.foreach { case (concept, cid, value) =>
        xml.append(s"""<t:$concept contextRef="$cid">${esc(value)}</t:$concept>""")
      }
      xml.append("</xbrli:xbrl>")
      val parsed = XbrlReader.parseInstance(
        xml.toString.getBytes("UTF-8"), s"trial$trial")
      assert(parsed.length == facts.length)
      facts.zip(parsed).foreach { case ((concept, cid, value), row) =>
        val ctx = ctxs.find(_._1 == cid).get
        assert(row(2) == concept)
        assert(row(3) == cid)
        assert(row(1) == s"E$trial")
        assert(row(4) == (if (ctx._2) "instant" else "duration"))
        assert(row(10) == value.trim)
      }
    }
  }

  test("instant/duration pivots split facts by period type") {
    val dir = Files.createTempDirectory("graft_xbrl2").toString
    Files.writeString(Paths.get(dir, "f1.xbrl"), instanceXml("C001", 2023))
    val facts = XbrlReader.read(spark, s"$dir/*.xbrl")

    val inst = XbrlReader.instantTable(facts,
      Seq("PlantInServiceBase", "AccumulatedDepreciation")).collect()
    assert(inst.length == 1)
    assert(inst.head.getAs[String]("PlantInServiceBase") == "10003")
    assert(inst.head.getAs[String]("AccumulatedDepreciation") == "250")
    assert(inst.head.getAs[String]("date_instant") == "2023-12-31")

    val dur = XbrlReader.durationTable(facts,
      Seq("OperatingRevenue", "UtilityName")).collect()
    assert(dur.length == 1)
    assert(dur.head.getAs[String]("OperatingRevenue") == "777")
    assert(dur.head.getAs[String]("date_end") == "2023-12-31")
  }
}
