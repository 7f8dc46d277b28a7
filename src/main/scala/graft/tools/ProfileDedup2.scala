package graft.tools

import graft.functions.Dedup
import org.apache.spark.sql.functions._

object ProfileDedup2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROFILE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    t("warmup")(spark.range(100).count())
    // barrier via cache: explode a MATERIALIZED array column
    val arr = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("s")).cache()
    t("materialize arrays")(arr.count())
    t("explode cached arrays")(arr.select(col("doc_id"), explode(col("s"))).count())
    arr.unpersist()
    docs.select(col("doc_id"), explode(Dedup.shingles(col("text"))).as("s"))
      .explain("formatted")
    spark.stop()
  }
}
