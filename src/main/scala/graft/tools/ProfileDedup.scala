package graft.tools

import graft.functions.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    t("warmup")(spark.range(100).count())
    t("read+count")(docs.count())
    t("shingles_array")(docs.select(Dedup.shingles(col("text")).as("s")).count())
    t("shingles_explode")(docs.select(explode(Dedup.shingles(col("text"))).as("s")).count())
    t("explode+md5")(docs.select(explode(Dedup.shingles(col("text"))).as("s")).select(md5(col("s"))).count())
    t("explode+basehash")(docs.select(col("doc_id"), explode(Dedup.shingles(col("text"))).as("s")).select(Dedup.baseHash(col("s"))).count())
    val sh = docs.select(col("doc_id").as("id"), explode(Dedup.shingles(col("text"))).as("shingle")).withColumn("h", Dedup.baseHash(col("shingle")))
    val minAggs = (0 until 16).map(i => min(pmod(col("h") * Dedup.hashCoeffA(i) + Dedup.hashCoeffB(i), lit(Dedup.MinhashP))).as(s"m$i"))
    t("sig_groupby")(sh.groupBy("id").agg(minAggs.head, minAggs.tail: _*).count())
    t("bands_full")(Dedup.minhashBands(docs, "doc_id", "text").count())
    t("ngram_pairs")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5).count())
    spark.stop()
  }
}
