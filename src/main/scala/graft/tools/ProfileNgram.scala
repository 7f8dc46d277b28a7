package graft.tools

import graft.functions.Dedup
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PROFILE $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    t("warmup")(spark.range(100).count())
    val sh = docs.select(col("doc_id").as("id"), explode(Dedup.shingles(col("text"))).as("shingle")).cache()
    t("sh materialize")(sh.count())
    val dfreqAll = sh.groupBy("shingle").agg(count(lit(1)).as("dfc"))
    t("dfreq")(dfreqAll.count())
    val tau = 0.5
    val wDoc = Window.partitionBy(col("id")).orderBy(col("dfc").asc, col("shingle").asc)
    val wN = Window.partitionBy(col("id"))
    val prefix = sh.join(dfreqAll, Seq("shingle"))
      .withColumn("rk", row_number().over(wDoc))
      .withColumn("n", count(lit(1)).over(wN))
      .filter(col("rk") <= col("n") - ceil(lit(tau) * col("n")) + 1)
      .select(col("id"), col("shingle")).cache()
    t("prefix index")(prefix.count())
    val cand = prefix.as("x").join(prefix.as("y"), Seq("shingle"))
      .filter(col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b")).distinct().cache()
    t("candidates")(cand.count())
    val shArr = sh.groupBy("id")
      .agg(collect_list(col("shingle")).as("sh_arr"), count(lit(1)).as("n"))
    val co = cand
      .join(shArr.select(col("id").as("id_a"), col("sh_arr").as("sa")), Seq("id_a"))
      .join(shArr.select(col("id").as("id_b"), col("sh_arr").as("sb")), Seq("id_b"))
      .select(size(array_intersect(col("sa"), col("sb"))).as("co"))
    t("verify co (array)")(co.count())
    t("full op")(Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.5).count())
    spark.stop()
  }
}
