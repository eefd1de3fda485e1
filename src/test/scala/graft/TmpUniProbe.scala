package graft
import org.apache.spark.sql.functions._
class TmpUniProbe extends SparkSpec {
  test("probe") {
    import graft.text.Unigram
    val words = Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .where(length(col("word")) >= 1)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val seed = Unigram.seedVocab(words, "word", "cnt", k = 24)
    seed.orderBy("piece").collect().foreach(r =>
      println(s"SEED|${r.getString(0)}|${r.getLong(1)}|${r.getLong(2)}"))
    // segmentation of a few words under seed
    val segd = Unigram.viterbiSegment(
      Unigram.scoreArrays(words, "word", seed, 4, -23025850930L), "word", 4)
    segd.orderBy("word").limit(8).collect().foreach(r =>
      println(s"SEG|${r.getString(0)}|${r.getSeq[String](r.fieldIndex("pieces")).mkString("+")}|${r.getLong(r.fieldIndex("score_nano"))}"))
  }
}
