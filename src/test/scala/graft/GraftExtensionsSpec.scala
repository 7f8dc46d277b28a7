package graft

import graft.functions.Similarity
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._

/** The SQL-function surface must agree with the Column API — same native
  * expressions behind both.
  */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("registered SQL functions match the Column API results") {
    GraftFunctions.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .createOrReplaceTempView("emb_v")

    val viaSql = spark.sql("SELECT vec_id, lsh_bucket(embedding) AS b FROM emb_v")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCol = spark.table("emb_v")
      .select($"vec_id", Similarity.lshBucket($"embedding").as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaCol && viaSql.nonEmpty)

    val wf = spark.sql(
      "SELECT winnow_fingerprints('the quick brown fox jumps over the lazy dog') AS f")
      .collect()(0).getSeq[Long](0)
    assert(wf.nonEmpty && wf == wf.sorted)

    // natural SQL spelling: bare decimal literals (DECIMAL in Spark's
    // parser) must implicitly cast — no D suffix required
    val pip = spark.sql(
      """SELECT point_in_polygon(51.5, 2.5,
        |  array(51.0, 2.0, 51.0, 3.0, 52.0, 3.0, 52.0, 2.0)) AS inside,
        |point_in_polygon(50.0, 2.5,
        |  array(51.0, 2.0, 51.0, 3.0, 52.0, 3.0, 52.0, 2.0)) AS outside
        |""".stripMargin).collect()(0)
    assert(pip.getBoolean(0) && !pip.getBoolean(1))

    // constant-but-unfolded int args work (builders run pre-folding)
    val wf2 = spark.sql(
      "SELECT winnow_fingerprints('abcdefghij klmnopqrs tuvwxyz abcdefghij', 2*4, 16) AS f")
      .collect()(0).getSeq[Long](0)
    assert(wf2.nonEmpty)

    // cosine_sim == the Column API's single-loop fold
    val cosRow = spark.sql(
      """SELECT cosine_sim(array(CAST(1.0 AS DOUBLE), CAST(0.0 AS DOUBLE)),
        |                  array(CAST(0.6 AS DOUBLE), CAST(0.8 AS DOUBLE))) AS c""".stripMargin)
      .collect()(0)
    assert(math.abs(cosRow.getDouble(0) - 0.6) < 1e-12)

    // geodesic_dist: bare decimal literals cast; one degree of meridian
    val gd = spark.sql("SELECT geodesic_dist(50.5, 3.0, 51.5, 3.0) AS m")
      .collect()(0).getDouble(0)
    assert(gd > 110500 && gd < 111500, s"meridian degree: $gd")

    // shingles == the compiled kernel's contract (distinct k-grams)
    val sh = spark.sql("SELECT shingles('a b c a b c d') AS s")
      .collect()(0).getSeq[String](0)
    assert(sh == Seq("a b c", "b c a", "c a b", "b c d"))
    val sh2 = spark.sql("SELECT shingles('a b c', 2) AS s").collect()(0).getSeq[String](0)
    assert(sh2 == Seq("a b", "b c"))

    // hash_bucket == Sampling.hashBucket (same md5-prefix bucket)
    val hbSql = spark.sql("SELECT hash_bucket(42, 'mix1') AS b, hash_bucket(42) AS d")
      .collect()(0)
    val hbCol = spark.range(1).select(
      graft.functions.Sampling.hashBucket(lit(42), "mix1").as("b"),
      graft.functions.Sampling.hashBucket(lit(42), "graft").as("d")).collect()(0)
    assert(hbSql.getLong(0) == hbCol.getLong(0) && hbSql.getLong(1) == hbCol.getLong(1))
    assert(hbSql.getLong(0) >= 0 && hbSql.getLong(0) < 1000000L)
  }

  test("extensions class wires the same builders into a session-extensions hook") {
    // the spark.sql.extensions entry point applies cleanly
    new GraftExtensions().apply(new SparkSessionExtensions)
    // arity validation is enforced at the SQL layer
    GraftFunctions.register(spark)
    val err = intercept[Exception](spark.sql("SELECT lsh_bucket()").collect())
    assert(err.getMessage.contains("lsh_bucket"))
  }
}
