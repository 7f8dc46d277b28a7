package graft.tools

import graft.functions.Similarity
import org.apache.spark.sql.functions._

/** Controlled ANN scale experiment: hold the QUERY COUNT fixed while the
  * corpus grows (the bench queries use `vec_id % 50 = 0`, so their query
  * set grows WITH the corpus and pair work grows ∝ data² — this control
  * isolates the corpus-only axis). Usage:
  * `runMain graft.tools.ProfileAnnControl <sfDir> <queryModulus> [reps]`
  * — queryModulus 50 reproduces the bench set; 50×scale holds ~40
  * queries at any scale.
  */
object ProfileAnnControl {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ProfileAnnControl <sfDir> <queryModulus> [reps]")
    val (dir, qmod, reps) =
      (args(0), args(1).toLong, if (args.length > 2) args(2).toInt else 3)
    val spark = graft.core.Sessions.local()
    try {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val queries = emb.filter(col("vec_id") % qmod === 0)
      val nQ = queries.count()
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding", k = 10,
            nCoarse = 8, coarseIters = 2, m = 8, subDim = 8, nCentroids = 8,
            pqIters = 2, nProbe = 2, dim = 64)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        dt
      }
      println(f"""{"tool":"ann_control","sf":"$dir","qmod":$qmod,"nQueries":$nQ,"min":${times.min}%.3f,"times":[${times.map(t => f"$t%.3f").mkString(",")}]}""")
    } finally spark.stop()
  }
}
