package graft

import graft.functions.Retrieval
import org.apache.spark.sql.functions._

/** RRF fusion semantics + the hybrid capstone's output contract.
  * Integer parity with DuckDB is pinned by the t_hybrid_search oracle.
  */
class HybridSearchSpec extends SparkSpec {

  test("RRF: a doc ranked by both systems beats single-system docs; scores are exact integers") {
    val s = spark; import s.implicits._
    val lex = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("query_id", "doc_id", "rnk")
    val dense = Seq((1L, 10L, 2), (1L, 12L, 1)).toDF("query_id", "match_id", "rank")
    val got = Retrieval.rrfFuse(lex, dense, kRrf = 60L, k = 10)
      .orderBy("rnk").collect()
    // doc 10: 1000000/61 + 1000000/62 = 16393 + 16129 = 32522
    // doc 12: 1000000/61 = 16393; doc 11: 1000000/62 = 16129
    assert(got.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((10L, 32522L), (12L, 16393L), (11L, 16129L)))
    assert(got.map(_.getInt(3)).toSeq == Seq(1, 2, 3))
  }

  test("RRF ties break by doc_id; k truncates") {
    val s = spark; import s.implicits._
    val lex = Seq((1L, 5L, 1), (1L, 3L, 1)).toDF("query_id", "doc_id", "rnk")
      .withColumn("rnk", col("rnk") * 1) // keep schema simple
    val dense = Seq.empty[(Long, Long, Int)].toDF("query_id", "match_id", "rank")
    val got = Retrieval.rrfFuse(lex, dense, kRrf = 60L, k = 1).collect()
    assert(got.length == 1 && got.head.getLong(1) == 3L)
  }

  test("mining triples: roles disjoint, pos unique, negatives exclude self and pos") {
    val rows = SparkEntry.queries("t_mining_triples")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getInt(3)))
    assert(rows.nonEmpty)
    val byQuery = rows.groupBy(_._1)
    byQuery.foreach { case (q, rs) =>
      val pos = rs.filter(_._3 == "pos")
      assert(pos.length == 1, s"query $q: exactly one positive")
      val roles = rs.groupBy(_._3).view.mapValues(_.map(_._2).toSet).toMap
      // no doc plays two roles for the same query; nothing equals the query
      val all = rs.map(_._2)
      assert(all.distinct.length == all.length, s"query $q: role overlap")
      assert(!all.contains(q), s"query $q: self leaked into triples")
      assert(roles.getOrElse("rand_neg", Set()).size <= 3)
      // ranks dense per role
      rs.groupBy(_._3).foreach { case (_, rr) =>
        assert(rr.map(_._4).sorted.toSeq == (1 to rr.length))
      }
    }
  }

  test("t_hybrid_search: self never appears; every query returns rows") {
    val res = SparkEntry.queries("t_hybrid_search")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(res.nonEmpty)
    assert(res.forall(r => r.getLong(0) != r.getLong(1)),
      "self-matches must be excluded on both legs")
    val queries = res.map(_.getLong(0)).distinct
    assert(queries.forall(q => q % 50 == 0))
    // the dense leg alone guarantees 10 candidates per query
    assert(res.groupBy(_.getLong(0)).values.forall(_.length == 10))
  }
}
