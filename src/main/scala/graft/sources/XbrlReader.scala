package graft.sources

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Pure-JDK XBRL instance-document reader — engine-core coverage for the
  * reference's XBRL extraction step (`convert_form`,
  * `/root/reference/src/pudl/extract/xbrl.py:90-150`), which shells out to
  * the external `ferc_xbrl_extractor` package. The package itself is a
  * separate product; what the pipeline actually consumes is the instance
  * semantics reproduced here:
  *
  *   - `<xbrli:context>` declares an entity identifier and a period —
  *     either `<instant>` or `<startDate>`/`<endDate>`;
  *   - `<xbrli:unit>` declares a measure;
  *   - every element carrying a `contextRef` attribute is a FACT: concept =
  *     element local name, value = element text, optional `unitRef` /
  *     `decimals`.
  *
  * Facts surface as ONE long all-string DataFrame (typing happens
  * downstream via column maps + `enforceSchema`, like every other source
  * here); [[instantTable]] / [[durationTable]] pivot selected concepts wide
  * per context — the instant/duration table split `ferc_xbrl_extractor`
  * emits per fact group, which `filter_for_freshest_data_xbrl` (q04) then
  * dedups. Distribution: one filing per task via `binaryFiles`, mirroring
  * the reference's per-filing batch fan-out (`xbrl.py` workers/batch_size).
  */
object XbrlReader {

  val schema: StructType = StructType(Seq(
    StructField("filing", StringType),
    StructField("entity_id", StringType),
    StructField("concept", StringType),
    StructField("context_id", StringType),
    StructField("period_type", StringType), // instant | duration
    StructField("date_instant", StringType),
    StructField("date_start", StringType),
    StructField("date_end", StringType),
    StructField("unit", StringType),
    StructField("decimals", StringType),
    StructField("value", StringType)))

  private case class Ctx(entity: String, periodType: String,
                         instant: String, start: String, end: String)

  /** Parse one instance document's bytes into fact tuples
    * (concept, contextId, unitRef, decimals, value) + context/unit maps,
    * resolved into [[schema]]-ordered value arrays. */
  def parseInstance(bytes: Array[Byte], filing: String): Seq[Seq[String]] = {
    val factory = javax.xml.stream.XMLInputFactory.newInstance()
    factory.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    val r = factory.createXMLStreamReader(new ByteArrayInputStream(bytes))

    val contexts = mutable.Map.empty[String, Ctx]
    val units = mutable.Map.empty[String, String]
    // facts buffered as (concept, ctxRef, unitRef, decimals, value) and
    // resolved after the pass — the spec does not require contexts to
    // precede the facts that reference them
    val facts = mutable.ArrayBuffer.empty[(String, String, String, String, String)]

    // context under construction
    var ctxId: String = null
    var entity, instant, start, end: String = null
    var unitId: String = null
    // fact under construction
    var factConcept, factCtx, factUnit, factDec: String = null
    // which simple element's text we are collecting
    var textTarget: String = null
    val text = new StringBuilder

    import javax.xml.stream.XMLStreamConstants._
    while (r.hasNext) {
      r.next() match {
        case START_ELEMENT =>
          val name = r.getLocalName
          name match {
            case "context" =>
              ctxId = r.getAttributeValue(null, "id")
              entity = null; instant = null; start = null; end = null
            case "unit" =>
              unitId = r.getAttributeValue(null, "id")
            case "identifier" | "instant" | "startDate" | "endDate"
                 | "measure" =>
              textTarget = name; text.clear()
            case _ =>
              val ctxRef = r.getAttributeValue(null, "contextRef")
              if (ctxRef != null) { // a fact element
                factConcept = name
                factCtx = ctxRef
                factUnit = r.getAttributeValue(null, "unitRef")
                factDec = r.getAttributeValue(null, "decimals")
                textTarget = name; text.clear()
              }
          }
        case CHARACTERS if textTarget != null =>
          text.append(r.getText)
        case END_ELEMENT =>
          val name = r.getLocalName
          name match {
            case "context" =>
              if (ctxId != null)
                contexts(ctxId) = Ctx(entity,
                  if (instant != null) "instant" else "duration",
                  instant, start, end)
              ctxId = null
            case "unit" =>
              unitId = null
            case "identifier" if textTarget == name =>
              entity = text.toString.trim; textTarget = null
            case "instant" if textTarget == name =>
              instant = text.toString.trim; textTarget = null
            case "startDate" if textTarget == name =>
              start = text.toString.trim; textTarget = null
            case "endDate" if textTarget == name =>
              end = text.toString.trim; textTarget = null
            case "measure" if textTarget == name =>
              if (unitId != null) units(unitId) = text.toString.trim
              textTarget = null
            case _ if name == factConcept && textTarget == name =>
              facts += ((factConcept, factCtx, factUnit, factDec,
                text.toString.trim))
              factConcept = null; textTarget = null
            case _ => ()
          }
        case _ => ()
      }
    }
    r.close()

    facts.toSeq.map { case (concept, ctxRef, unitRef, dec, value) =>
      val ctx = contexts.getOrElse(ctxRef, Ctx(null, null, null, null, null))
      Seq(filing, ctx.entity, concept, ctxRef, ctx.periodType, ctx.instant,
        ctx.start, ctx.end, Option(unitRef).flatMap(units.get).orNull,
        dec, value)
    }
  }

  /** Read a glob of XBRL instance documents into the long fact table.
    * `filing` is the source file name (the per-filing provenance key the
    * freshest-record dedup sorts on downstream). */
  def read(spark: SparkSession, pathGlob: String): DataFrame = {
    val rows = spark.sparkContext.binaryFiles(pathGlob)
      .flatMap { case (path, stream) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        parseInstance(stream.toArray(), name).map(Row.fromSeq(_))
      }
    spark.createDataFrame(rows, schema)
  }

  /** Wide instant table: one row per (filing, entity, context, instant
    * date), one column per requested concept — the "instant" half of
    * ferc_xbrl_extractor's fact-group split. Contexts are the row key
    * (each context is a distinct axes combination), `first` is safe
    * because a concept appears at most once per context. */
  def instantTable(facts: DataFrame, concepts: Seq[String]): DataFrame =
    facts.where(col("period_type") === "instant" &&
        col("concept").isin(concepts: _*))
      .groupBy("filing", "entity_id", "context_id", "date_instant")
      .pivot("concept", concepts)
      .agg(first("value"))

  /** Wide duration table: one row per (filing, entity, context,
    * start, end) — the "duration" half of the split. */
  def durationTable(facts: DataFrame, concepts: Seq[String]): DataFrame =
    facts.where(col("period_type") === "duration" &&
        col("concept").isin(concepts: _*))
      .groupBy("filing", "entity_id", "context_id", "date_start", "date_end")
      .pivot("concept", concepts)
      .agg(first("value"))
}
