package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Aggregation surface (SURVEY §2.3): global/grouped/having/distinct/
  * rollup/cube/grouping-sets/statistical.
  *
  * Scale notes: all grouped aggregates are two-phase HashAggregate (map-side
  * partial combine, then a shuffle keyed on the group columns) — cardinality
  * of the shuffle is |groups|, not |rows|. rollup/cube expand rows BEFORE the
  * partial aggregate (Expand operator), so the combine still happens map-side.
  * Stats are Spark's built-in streaming moment aggregates rounded for the
  * oracle hash; sums use the exact-decimal Det helpers.
  */
object Aggregates {

  val q: Map[String, Q] = Map(
    "q_agg_global" -> ((s, d) =>
      Tables(s, d, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        Det.dsum(col("l_extendedprice")).as("sum_price"),
        Det.davg(col("l_discount")).as("avg_disc"),
        date_format(min(col("l_shipdate")), "yyyy-MM-dd").as("min_ship"),
        date_format(max(col("l_shipdate")), "yyyy-MM-dd").as("max_ship"))),

    "q_agg_having" -> ((s, d) =>
      Tables(s, d, "orders")
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          Det.dsum(col("o_totalprice")).as("sum_total"))
        .filter(col("n_orders") > 12)
        .orderBy("o_custkey")),

    "q_agg_distinct" -> ((s, d) =>
      Tables(s, d, "orders").agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        countDistinct(col("o_orderstatus")).as("n_status"),
        Det.d2(sum_distinct(col("o_totalprice").cast("decimal(12,2)")))
          .as("sum_distinct_total"),
        count(lit(1)).as("n_rows"))),

    // Pre-select to unqualified columns before rollup: df-qualified refs
    // through a join trip DetectAmbiguousSelfJoin (round-1 AnalysisException).
    "q_agg_rollup" -> ((s, d) => {
      val c = Tables(s, d, "customer"); val n = Tables(s, d, "nation")
      val r = Tables(s, d, "region")
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .select(r("r_name").as("r_name"), n("n_name").as("n_name"),
          c("c_acctbal").as("c_acctbal"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          Det.dsum(col("c_acctbal")).as("sum_bal"),
          grouping(col("r_name")).cast("int").as("g_r"),
          grouping(col("n_name")).cast("int").as("g_n"))
        .orderBy(col("r_name").asc_nulls_last, col("n_name").asc_nulls_last)
    }),

    "q_agg_cube" -> ((s, d) =>
      Tables(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          Det.dsum(col("o_totalprice")).as("sum_total"),
          grouping(col("o_orderstatus")).cast("int").as("g_s"),
          grouping(col("o_orderpriority")).cast("int").as("g_p"))
        .orderBy(col("o_orderstatus").asc_nulls_last,
          col("o_orderpriority").asc_nulls_last)),

    "q_agg_grouping_sets" -> ((s, d) => {
      val li = Tables(s, d, "lineitem")
      li.groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"),
          Det.dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_last,
          col("l_linestatus").asc_nulls_last)
    }),

    // collect_list arrival order is partition-dependent — always sort the
    // collected array before it reaches a deterministic surface (§7.4).
    // Arrays are CSV-serialized for the comparator (pandas can't hash list
    // cells); safe here because elements are ints/strings, never floats.
    "q_agg_collect" -> ((s, d) =>
      Tables(s, d, "orders")
        .filter(col("o_totalprice") > 450000)
        .groupBy("o_orderstatus")
        .agg(
          array_join(
            transform(sort_array(collect_list(col("o_orderkey"))),
              _.cast("string")), ",").as("order_keys"),
          array_join(sort_array(collect_set(col("o_orderpriority"))), ",")
            .as("prios"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")),

    // Pivot: status x priority counts; fixed pivot-value list so the
    // output schema is static (required at scale — dynamic pivot values
    // force an extra distinct pass over the data).
    "q_agg_pivot" -> ((s, d) =>
      Tables(s, d, "orders")
        .groupBy("o_orderstatus")
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .withColumnsRenamed(Map(
          "1-URGENT" -> "p1", "2-HIGH" -> "p2", "3-MEDIUM" -> "p3",
          "4-NOT SPECIFIED" -> "p4", "5-LOW" -> "p5"))
        // pivot yields NULL for empty cells; SQL's SUM(CASE) yields 0
        .select(col("o_orderstatus") +: Seq("p1", "p2", "p3", "p4", "p5")
          .map(p => coalesce(col(p), lit(0L)).as(p)): _*)
        .orderBy("o_orderstatus")),

    // Built-in streaming moment aggregates; rounded because the merge order
    // differs from DuckDB's sequential scan in the last ulp.
    "q_agg_stats" -> ((s, d) =>
      Tables(s, d, "lineitem").agg(
        round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6)
          .as("corr_qty_price"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2)
          .as("covar_qty_price"))),
  )

  private val dsumS = (x: String) => s"CAST(ROUND(SUM(CAST($x AS DECIMAL(30,8))), 2) AS DOUBLE)"

  val oracle: Map[String, String] = Map(
    "q_agg_global" ->
      s"""SELECT COUNT(*) AS n_rows,
         |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
         |  ${dsumS("l_extendedprice")} AS sum_price,
         |  ${dsumS("l_discount")} / COUNT(l_discount) AS avg_disc,
         |  strftime(MIN(l_shipdate), '%Y-%m-%d') AS min_ship,
         |  strftime(MAX(l_shipdate), '%Y-%m-%d') AS max_ship
         |FROM lineitem""".stripMargin,

    "q_agg_having" ->
      s"""SELECT o_custkey, COUNT(*) AS n_orders,
         |  ${dsumS("o_totalprice")} AS sum_total
         |FROM orders GROUP BY o_custkey
         |HAVING COUNT(*) > 12
         |ORDER BY o_custkey""".stripMargin,

    "q_agg_distinct" ->
      """SELECT COUNT(DISTINCT o_custkey) AS n_cust,
        |  COUNT(DISTINCT o_orderstatus) AS n_status,
        |  CAST(ROUND(SUM(DISTINCT CAST(o_totalprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_distinct_total,
        |  COUNT(*) AS n_rows
        |FROM orders""".stripMargin,

    "q_agg_rollup" ->
      s"""SELECT r_name, n_name, COUNT(*) AS n_cust,
         |  ${dsumS("c_acctbal")} AS sum_bal,
         |  CAST(GROUPING(r_name) AS INT) AS g_r,
         |  CAST(GROUPING(n_name) AS INT) AS g_n
         |FROM customer
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY ROLLUP(r_name, n_name)
         |ORDER BY r_name ASC NULLS LAST, n_name ASC NULLS LAST""".stripMargin,

    "q_agg_cube" ->
      s"""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
         |  ${dsumS("o_totalprice")} AS sum_total,
         |  CAST(GROUPING(o_orderstatus) AS INT) AS g_s,
         |  CAST(GROUPING(o_orderpriority) AS INT) AS g_p
         |FROM orders
         |GROUP BY CUBE(o_orderstatus, o_orderpriority)
         |ORDER BY o_orderstatus ASC NULLS LAST, o_orderpriority ASC NULLS LAST""".stripMargin,

    "q_agg_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
         |  ${dsumS("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         |ORDER BY l_returnflag ASC NULLS LAST, l_linestatus ASC NULLS LAST""".stripMargin,

    "q_agg_collect" ->
      """SELECT o_orderstatus,
        |  array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys,
        |  array_to_string(list_sort(list(DISTINCT o_orderpriority)), ',') AS prios,
        |  COUNT(*) AS n
        |FROM orders WHERE o_totalprice > 450000
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "q_agg_pivot" ->
      """SELECT o_orderstatus,
        |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS p1,
        |  CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS p2,
        |  CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS p3,
        |  CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS p4,
        |  CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS p5
        |FROM orders
        |GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "q_agg_stats" ->
      """SELECT
        |  ROUND(stddev_samp(l_extendedprice), 2) AS sd_price,
        |  ROUND(var_samp(l_quantity), 4) AS var_qty,
        |  ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |  ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price
        |FROM lineitem""".stripMargin,
  )
}
