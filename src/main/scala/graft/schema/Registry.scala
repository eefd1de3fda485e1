package graft.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Declarative schema/metadata system (SURVEY §1.2-1.3) — the Spark
  * re-expression of the reference's Field/Schema/Resource/Package registry
  * (`/root/reference/src/pudl/metadata/classes.py:635,992,1554`) and its 8
  * canonical types (`metadata/dtypes.py:44-101`).
  *
  * `enforceSchema` is the IO-boundary contract: select declared columns in
  * declared order, cast to declared types, apply enum nullification —
  * exactly what `Resource.enforce_schema` does before every parquet write
  * (`dagster/io_managers.py:393-401`).
  */
object FieldType {
  val Boolean = "boolean"
  val Date = "date"
  val Datetime = "datetime"
  val Integer = "integer"
  val Number = "number"
  val Str = "string"
  val Year = "year"

  def toSpark(t: String): DataType = t match {
    case Boolean => BooleanType
    case Date => DateType
    case Datetime => TimestampType
    case Integer => LongType // nullable Int64 analogue
    case Number => DoubleType
    case Str => StringType
    case Year => IntegerType // parquet stores year as int (dtypes.py:79-89)
    case other => throw new IllegalArgumentException(s"unknown field type $other")
  }
}

/** One declared column with constraint metadata
  * (`/root/reference/src/pudl/metadata/classes.py:328-377`). */
case class Field(
    name: String,
    fieldType: String,
    required: Boolean = false,
    enum: Option[Seq[String]] = None,
    min: Option[Double] = None,
    max: Option[Double] = None) {
  def sparkField: StructField =
    StructField(name, FieldType.toSpark(fieldType), nullable = !required)
}

/** One declared output table (analogue of `Resource`,
  * `/root/reference/src/pudl/metadata/classes.py:1554`). */
case class Resource(name: String, fields: Seq[Field],
                    primaryKey: Seq[String] = Nil) {
  def schema: StructType = StructType(fields.map(_.sparkField))

  /** Coerce dtypes, order columns, null out enum violations — plan-time
    * only, no data pass beyond the projection itself. */
  def enforceSchema(df: DataFrame): DataFrame = {
    val cols = fields.map { f =>
      val base = col(f.name).cast(f.sparkField.dataType)
      val withEnum = f.enum match {
        case Some(values) => when(base.isin(values: _*), base)
        case None => base
      }
      withEnum.as(f.name)
    }
    df.select(cols: _*)
  }
}

/** The registry: declared resources addressable by name — `Package`
  * (`/root/reference/src/pudl/metadata/classes.py:1868-1930`). */
case class Registry(resources: Seq[Resource]) {
  private val byName = resources.map(r => r.name -> r).toMap
  def apply(name: String): Resource = byName(name)
}
