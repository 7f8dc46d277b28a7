package graft.queries

import org.apache.spark.sql.functions._

/** Headline analytical queries over the TPC-H-ish tables — generic
  * filter/join/aggregate coverage (SURVEY §2.2-2.4; the reference's own
  * joins/aggregations are all subsumed by these shapes) and the BENCH
  * workhorses.
  *
  * Numeric discipline for oracle parity: measures are cast to DECIMAL
  * before SUM (exact, associative — immune to partial-aggregation order),
  * products of doubles are rounded *then* cast, and averages divide the
  * exact decimal sum as a final double op.
  */
object QueriesTpch {

  private val dec = "decimal(25,6)"

  val defs: Seq[QDef] = Seq(

    QDef("q1_pricing_summary",
      (s, dir) => {
        val l = Q.table(s, dir, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        l.groupBy("l_returnflag", "l_linestatus").agg(
          sum(col("l_quantity").cast(dec)).cast(dec).as("sum_qty"),
          sum(col("l_extendedprice").cast(dec)).cast(dec).as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec))
            .cast(dec).as("sum_disc_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).cast(dec))
            .cast(dec).as("sum_charge"),
          round(sum(col("l_quantity").cast(dec)).cast("double") / count(lit(1)), 6).as("avg_qty"),
          round(sum(col("l_discount").cast(dec)).cast("double") / count(lit(1)), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS sum_qty,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS sum_base_price,
             |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS sum_disc_price,
             |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS sum_charge,
             |  round(CAST(sum(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / count(*), 6) AS avg_qty,
             |  round(CAST(sum(CAST(l_discount AS DECIMAL(25,6))) AS DOUBLE) / count(*), 6) AS avg_disc,
             |  count(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
             |GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    QDef("q3_top_orders",
      (s, dir) => {
        val c = Q.table(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val o = Q.table(s, dir, "orders")
          .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
        val l = Q.table(s, dir, "lineitem")
          .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderpriority"))
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec))
            .cast(dec).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey").asc)
          .limit(10)
      },
      Some("""SELECT l_orderkey, o_orderpriority,
             |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
             |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
             |GROUP BY l_orderkey, o_orderpriority
             |ORDER BY revenue DESC, l_orderkey ASC
             |LIMIT 10""".stripMargin)),

    QDef("q5_nation_revenue",
      (s, dir) => {
        val l = Q.table(s, dir, "lineitem")
        val o = Q.table(s, dir, "orders")
        val c = Q.table(s, dir, "customer")
        val sup = Q.table(s, dir, "supplier")
        val n = Q.table(s, dir, "nation")
        val r = Q.table(s, dir, "region")
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(dec))
            .cast(dec).as("revenue"),
            count(lit(1)).as("n_lines"))
      },
      Some("""SELECT r_name, n_name,
             |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS revenue,
             |  count(*) AS n_lines
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name, n_name""".stripMargin)),

    // semi/anti join coverage (free Spark builtins; SURVEY §2.10)
    QDef("q_semi_anti",
      (s, dir) => {
        val o = Q.table(s, dir, "orders")
        val l = Q.table(s, dir, "lineitem").filter(col("l_quantity") > 45)
        val withBig = o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .select(col("o_orderkey"), lit(1).as("has_big"))
        val withoutBig = o.join(l, col("o_orderkey") === col("l_orderkey"), "left_anti")
          .select(col("o_orderkey"), lit(0).as("has_big"))
        withBig.unionByName(withoutBig)
      },
      Some("""SELECT o_orderkey, 1 AS has_big FROM orders
             |WHERE EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
             |UNION ALL
             |SELECT o_orderkey, 0 AS has_big FROM orders
             |WHERE NOT EXISTS (SELECT 1 FROM lineitem
             |                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)""".stripMargin))
  )
}
