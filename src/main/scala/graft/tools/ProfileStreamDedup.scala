package graft.tools

import graft.core.Sessions
import graft.streaming.StreamingDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Commit-cost sweep for the watermark-bounded streaming dedup
  * (round-14 verdict #4: the 18× stream-vs-batch gap at sf10 is
  * RocksDB-commit-bound; find which knob closes it).
  *
  * Sweeps the four levers that change COMMIT count or width, holding
  * the data and the dedup semantics fixed:
  *   - state partitions (RocksDB instances that commit per batch)
  *   - files per trigger (micro-batch size)
  *   - no-data micro-batches (watermark-advance commits that carry no
  *     rows but still commit every store)
  *   - trackTotalNumberOfRows (per-put state metric bookkeeping)
  *
  * Each config streams the same staged N-file documents dir through a
  * FRESH checkpoint and prints one JSON line: config, wall, rows/s,
  * survivors (parity vs batch is the correctness pin — survivors must
  * match the batch dedup count exactly in every row of the sweep).
  *
  * Usage: tools/bench_java.sh graft.tools.ProfileStreamDedup \
  *          /tmp/graft_sf10b 20
  */
object ProfileStreamDedup {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/graft_sf1b"
    val nFiles = if (args.length > 1) args(1).toInt else 20
    org.apache.logging.log4j.core.config.Configurator.setRootLevel(
      org.apache.logging.log4j.Level.ERROR)
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    Sessions.useRocksDbStateStore(spark)

    val stage = java.nio.file.Files.createTempDirectory("graft_sdprof_").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .withColumn("ts", timestamp_micros(lit(1700000000000000L) +
        col("doc_id") % 1800L * 1000000L))
    val docDir = s"$stage/docs"
    docs.repartition(nFiles).write.parquet(docDir)
    val docN = spark.read.parquet(docDir).count()
    val schema = spark.read.parquet(docDir).schema

    // batch reference (also the survivor-parity oracle)
    val t0 = System.nanoTime()
    val batchSurvivors = spark.read.parquet(docDir)
      .withColumn("fingerprint",
        graft.functions.TextAnalysis.fingerprint(col("text")))
      .dropDuplicates("fingerprint").count()
    val batchSec = (System.nanoTime() - t0) / 1e9
    println(s"""{"config":"batch","rows":$docN,"sec":${"%.1f".format(batchSec)},"rows_per_s":${(docN / batchSec).toLong},"survivors":$batchSurvivors}""")

    var run = 0
    def sweep(tag: String, stateParts: Int, filesPerTrigger: Int,
              noData: Boolean, trackRows: Boolean): Unit = {
      run += 1
      spark.conf.set("spark.sql.shuffle.partitions", stateParts)
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled",
        noData.toString)
      spark.conf.set("spark.sql.streaming.stateStore.rocksdb." +
        "trackTotalNumberOfRows", trackRows.toString)
      var survivors = 0L
      var batches = 0L
      val t = System.nanoTime()
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", filesPerTrigger).parquet(docDir)
      val q = StreamingDedup.withinWatermark(src, "text", "ts", "1 hour")
        .writeStream
        .option("checkpointLocation", s"$stage/ckpt_$run")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, _: Long) =>
          survivors += b.count(); batches += 1
        }
        .start()
      q.awaitTermination()
      val sec = (System.nanoTime() - t) / 1e9
      spark.conf.set("spark.sql.shuffle.partitions", 32)
      val parity = if (survivors == batchSurvivors) "EXACT" else "MISMATCH"
      // commit-cost attribution straight from the progress events: the
      // sizing rule's C is walCommit + commitOffsets + the state
      // store's own commit, NOT addBatch (which scales with rows)
      val progs = q.recentProgress
      def durSum(k: String) = progs.flatMap(p =>
        Option(p.durationMs.get(k)).map(_.toLong)).sum
      val addBatchMs = durSum("addBatch")
      val commitMs = durSum("commitOffsets") + durSum("walCommit") +
        durSum("commitBatch")
      val stateCommitMs = progs.flatMap(p =>
        Option(p.stateOperators).toSeq.flatten.map(so =>
          Option(so.customMetrics).map(m =>
            Option(m.get("rocksdbCommitLatency")).map(_.toLong).getOrElse(0L))
            .getOrElse(0L))).sum
      println(s"""{"config":"$tag","state_parts":$stateParts,"files_per_trigger":$filesPerTrigger,"no_data":$noData,"track_rows":$trackRows,"batches":$batches,"sec":${"%.1f".format(sec)},"rows_per_s":${(docN / sec).toLong},"survivors":$survivors,"parity":"$parity","add_batch_ms":$addBatchMs,"commit_ms":$commitMs,"state_commit_ms":$stateCommitMs}""")
    }

    // r14 baseline shape first, then one lever at a time, then combos
    sweep("r14_baseline", 32, 1, noData = true, trackRows = true)
    sweep("no_nodata", 32, 1, noData = false, trackRows = true)
    sweep("parts8", 8, 1, noData = true, trackRows = true)
    sweep("untracked", 32, 1, noData = true, trackRows = false)
    sweep("files4", 32, 4, noData = true, trackRows = true)
    sweep("combo8", 8, 4, noData = false, trackRows = false)
    sweep("combo8_f1", 8, 1, noData = false, trackRows = false)
    sweep("combo16", 16, 4, noData = false, trackRows = false)
    spark.stop()
  }
}
