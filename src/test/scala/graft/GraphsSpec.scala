package graft

import graft.ops.Graphs
import org.apache.spark.sql.functions._

/** Triangle counting on hand-built graphs with known answers; the
  * q_triangles oracle pins the integer replay at data scale.
  */
class GraphsSpec extends SparkSpec {

  private def stats(edges: Seq[(Long, Long)]) = {
    val s = spark; import s.implicits._
    val r = Graphs.triangleStats(edges.toDF("a", "b")).collect()(0)
    (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"),
      r.getAs[Long]("n_wedges"), r.getAs[Long]("n_triangles"),
      r.getAs[Long]("closure_micro"))
  }

  test("K4 has 4 triangles and closure 1; path and star have none") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val (n, e, w, t, c) = stats(k4)
    assert((n, e, t) == (4L, 6L, 4L))
    assert(w == 12L)           // 4 nodes x C(3,2)
    assert(c == 1000000L)      // 3*4/12 = 1.0
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    assert(stats(path)._4 == 0L)
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    assert(stats(star)._4 == 0L)
  }

  test("triangle with a pendant: 1 triangle, correct wedge count") {
    // 1-2-3 triangle, 4 hangs off 3
    val g = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    val (n, e, w, t, c) = stats(g)
    assert((n, e, t) == (4L, 4L, 1L))
    assert(w == 1 + 1 + 3)     // deg 2,2,3,1 -> C(2,2)? wedges: 1+1+3+0
    assert(c == 3000000L / 5)  // 3*1/5
  }

  test("hub-heavy graph: every triangle counted exactly once") {
    // hub 0 connected to 1..6; ring 1-2,3-4,5-6 => 3 triangles
    val g = (1L to 6L).map(i => (0L, i)) ++ Seq((1L, 2L), (3L, 4L), (5L, 6L))
    assert(stats(g)._4 == 3L)
  }

  test("co-occurrence edges: distinct pairs within groups, a < b") {
    val s = spark; import s.implicits._
    val df = Seq((10L, 3L), (10L, 1L), (10L, 2L), (10L, 1L), (20L, 2L), (20L, 3L))
      .toDF("g", "item")
    val got = Graphs.coOccurrenceEdges(df, "g", "item")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }
}
