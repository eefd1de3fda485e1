package graft

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{MinMaxScaler, OneHotEncoder, StringIndexer, VectorAssembler}
import org.apache.spark.sql.functions._

/** MLlib wiring for the reference's vectorizer stack (SURVEY §2.11):
  * CategoricalVectorizer → OneHotEncoder, NumericalNormalizer →
  * MinMaxScaler, feature concat → VectorAssembler, pair-match model →
  * LogisticRegression. */
class MlPipelineSpec extends SparkSpec {

  test("one-hot + scale + assemble + logistic regression learns a separable label") {
    val df = Tables.load(spark, sf, "customer")
      .withColumn("label", (col("c_acctbal") > 0).cast("double"))
    val pipeline = new Pipeline().setStages(Array(
      new StringIndexer().setInputCol("c_mktsegment").setOutputCol("seg_idx"),
      new OneHotEncoder().setInputCol("seg_idx").setOutputCol("seg_vec"),
      new VectorAssembler().setInputCols(Array("c_acctbal")).setOutputCol("num_raw"),
      new MinMaxScaler().setInputCol("num_raw").setOutputCol("num_scaled"),
      new VectorAssembler().setInputCols(Array("seg_vec", "num_scaled"))
        .setOutputCol("features"),
      new LogisticRegression().setMaxIter(50)))
    val model = pipeline.fit(df)
    val pred = model.transform(df)
    val acc = pred.where(col("prediction") === col("label")).count().toDouble /
      pred.count()
    assert(acc > 0.95, s"accuracy $acc")
  }
}
