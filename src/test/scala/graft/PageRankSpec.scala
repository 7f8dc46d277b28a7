package graft

import graft.ops.PageRank
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers

/** Integer PageRank — hand-computed fixpoint prefix on a 3-node path,
  * dangling-node teleport floor, and partitioning invariance (the ranks
  * are a pure function of the edge SET).
  */
class PageRankSpec extends SparkSpec with Matchers {
  import spark.implicits._

  private def sym(pairs: (String, String)*) = {
    val e = pairs.toDF("src", "dst")
    e.union(e.select($"dst".as("src"), $"src".as("dst")))
  }

  test("two iterations on the a-b-c path match the hand computation") {
    // deg: a=1 b=2 c=1; r0 = 1e6
    // it1: in(a)=500000 in(b)=2000000 in(c)=500000
    //      r1(a)=150000+425000=575000, r1(b)=150000+1700000=1850000
    // it2: in(a)=925000 in(b)=1150000 in(c)=925000
    //      r2(a)=150000+786250=936250, r2(b)=150000+977500=1127500
    val out = PageRank.ranks(sym("a" -> "b", "b" -> "c"), iters = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out shouldBe Map("a" -> 936250L, "b" -> 1127500L, "c" -> 936250L)
  }

  test("a node with out- but no in-edges settles at the bare teleport mass") {
    val e = Seq(("a", "b")).toDF("src", "dst") // directed, NOT symmetrized
    val out = PageRank.ranks(e, iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // only out-edge nodes are ranked; 'a' receives nothing but teleport
    out shouldBe Map("a" -> PageRank.TeleportMicro)
  }

  test("symmetric star: center accumulates, leaves tie; partitioning invariant") {
    val star = sym("hub" -> "x", "hub" -> "y", "hub" -> "z")
    val a = PageRank.ranks(star, iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    a("hub") should be > a("x")
    a("x") shouldBe a("y")
    a("y") shouldBe a("z")
    val b = PageRank.ranks(star.repartition(13), iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    b shouldBe a
  }

  test("trade-graph edges: distinct typed pairs, symmetrized") {
    val orders = Seq((1L, 10L), (2L, 10L), (3L, 20L)).toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((1L, 5L), (1L, 5L), (2L, 5L), (3L, 6L))
      .toDF("l_orderkey", "l_suppkey")
    val e = PageRank.tradeGraphEdges(orders, lineitem)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    e shouldBe Set(("c10", "s5"), ("c20", "s6"), ("s5", "c10"), ("s6", "c20"))
  }
}
