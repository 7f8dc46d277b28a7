package graft

import graft.ops.EntityResolution
import org.scalatest.matchers.should.Matchers

/** ER matching stage: distinct-name universe, multi-pass token
  * blocking, Levenshtein verify, block cap.
  */
class EntityResolutionSpec extends SparkSpec with Matchers {
  import spark.implicits._

  test("matches through either token pass; exact dups collapse upstream") {
    val df = Seq(
      "red widget", "red widget",      // same name twice: one universe row
      "red wigdet",                    // transposed second token
      "rad widget",                    // first-token typo
      "blue anvil"                     // unrelated
    ).toDF("p_name")
    val got = EntityResolution.nameMatchPairs(df, "p_name",
        maxDist = 2, blockCap = 100L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4))).toSet
    // "red widget"~"red wigdet" share block t1:red; "red widget"~
    // "rad widget" share block t2:widget; "rad"~"wigdet" pair exceeds
    // dist 2 through any block; anvil matches nothing
    got shouldBe Set(
      ("red widget", "red wigdet", 2, 2L, 1L),
      ("rad widget", "red widget", 1, 1L, 2L))
  }

  test("pairs deduplicate across passes (shared first AND second token)") {
    // both tokens shared => candidate appears in both passes, once out
    val df = Seq("hot gear", "hot gears").toDF("p_name")
    val got = EntityResolution.nameMatchPairs(df, "p_name", 2, 100L).collect()
    got.length shouldBe 1
    got(0).getInt(2) shouldBe 1
  }

  test("block cap drops oversized blocks but keeps the other pass") {
    // 3 names share t2:widget (> cap 2) so that block is dropped —
    // "rad widget"/"ted widget" lose their only shared block — but the
    // pair that ALSO shares a small first-token block survives
    val df = Seq("red widget", "rad widget", "ted widget", "red wigdet")
      .toDF("p_name")
    val got = EntityResolution.nameMatchPairs(df, "p_name", 2, 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    got shouldBe Set(("red widget", "red wigdet")) // via t1:red (size 2)
  }

  test("clusters: min-name survivorship over transitive match chains") {
    val s = spark; import s.implicits._
    // chain: "rad widget" ~ "red widget" ~ "red wigdet" (transitive);
    // "blue anvil" isolated
    val df = Seq("red widget", "rad widget", "red wigdet", "blue anvil")
      .toDF("p_name")
    val names = df.groupBy($"p_name".as("name"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_rows"))
    val pairs = EntityResolution.nameMatchPairs(df, "p_name", 2, 100L)
    val got = graft.functions.Dedup.nearDupClusters(
        names.select($"name".as("id")), pairs,
        aCol = "name_a", bCol = "name_b")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getBoolean(2)))
      .toMap
    got("rad widget") shouldBe (("rad widget", true)) // lexicographic min
    got("red widget") shouldBe (("rad widget", false))
    got("red wigdet") shouldBe (("rad widget", false))
    got("blue anvil") shouldBe (("blue anvil", true))
  }

  test("single-token names: pass 2 nulls out instead of erroring") {
    val df = Seq("widget", "wigdet", "bolt").toDF("p_name")
    val got = EntityResolution.nameMatchPairs(df, "p_name", 2, 100L).collect()
    got.length shouldBe 0 // t1 blocks are singletons; no null-key joins
  }
}
