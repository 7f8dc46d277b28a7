package graft

import graft.functions.{TextAnalysis, Train}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** In-engine pocket-perceptron training: the classifier must genuinely
  * learn the teacher (beat the majority baseline), deterministically.
  */
class TrainSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("training beats the majority-class baseline on the teacher labels") {
    val r = Train.pocketPerceptron(docs, "doc_id", "text").collect().head
    val n = r.getAs[Long]("n_docs")
    val correct = r.getAs[Long]("n_correct")
    // majority share of the teacher label, same integer arithmetic
    val pos = docs
      .select(TextAnalysis.wsTokenCount(col("text")).cast("long").as("nt"),
        org.apache.spark.sql.functions.length(col("text")).cast("long").as("nc"),
        org.apache.spark.sql.functions.length(
          regexp_replace(col("text"), "[^A-Za-z]", ""))
          .cast("long").as("na"))
      .selectExpr("coalesce(sum(CASE WHEN nt >= 20 AND nt <= 70 AND " +
        "na * 1024 DIV greatest(nc, 1) >= 700 THEN 1 ELSE 0 END), 0) AS p")
      .as[Long].collect().head
    val majority = math.max(pos, n - pos)
    assert(correct > majority,
      s"no learning: $correct correct of $n vs majority $majority")
    // the pocket round is a real round, not the zero init
    r.getAs[Long]("best_round") should be > 0L
  }

  test("training is deterministic and partitioning-independent") {
    val a = Train.pocketPerceptron(docs, "doc_id", "text")
      .collect().head.toSeq
    val b = Train.pocketPerceptron(docs.repartition(13), "doc_id", "text")
      .collect().head.toSeq
    a shouldBe b
  }
}
