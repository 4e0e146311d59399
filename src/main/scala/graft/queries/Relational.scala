package graft.queries

import graft.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scan / filter / project / sort / limit surface (SURVEY §2.3 block 2) plus
  * the flagship grouped aggregate (§7.2). Every query ends in a total ORDER
  * BY over a unique key set so the DuckDB hash-compare is stable (§7.4).
  *
  * Scale notes: these are single-pass scans — predicates and projections
  * are plain Catalyst expressions, so Parquet pushdown + column pruning keep
  * the scan I/O proportional to the selected columns at any scale. The sorts
  * exist for oracle determinism; at 100 TB a consumer would drop the global
  * ORDER BY (range-partitioned sort otherwise).
  */
object Relational {

  val q: Map[String, Q] = Map(
    // lineitem has NO unique key (driver fixture: (l_orderkey,
    // l_linenumber) collides) — ORDER BY must cover every output column
    // or tie order depends on physical partitioning (§7.4).
    "q_scan_project" -> ((s, d) =>
      Tables(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice")),

    "q_scan_pushdown" -> ((s, d) =>
      Tables(s, d, "lineitem")
        .filter(col("l_shipdate") < to_timestamp(lit("1996-01-01 00:00:00")))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_discount")),

    // Partition pruning (round 6): the third physical-layout lever after
    // row-group pushdown (q_scan_pushdown) and bucketing
    // (q_join_bucketed) — events materialized ONCE partitioned by
    // event_type, then a type-selective aggregate reads ONLY that
    // partition's directory: the filter shows up as a PartitionFilter
    // (metadata-level pruning, no data I/O for other types;
    // QueriesSpec pins it), which at 100 TB is the difference between
    // scanning one partition and scanning the corpus. The layout is
    // content-addressed and atomically published (FixtureLayout, round
    // 7): regenerating the fixture re-materializes under a new tag
    // instead of silently serving the stale copy, and concurrent JVMs
    // can't read a half-written overwrite.
    "q_scan_partition_pruned" -> ((s, d) => {
      val tag = FixtureLayout.contentTag(d, Seq("events"))
      val path = FixtureLayout.ensureDir(
        s"${System.getProperty("java.io.tmpdir")}/graft_part_$tag/events") {
        staging =>
          Tables(s, d, "events")
            .write.partitionBy("event_type")
            .mode("overwrite").parquet(staging)
      }
      s.read.parquet(path)
        .filter(col("event_type") === "purchase")
        .groupBy(date_format(date_trunc("day", col("ts")), "yyyy-MM-dd")
          .as("day"))
        .agg(count(lit(1)).as("n_events"), Det.dsum(col("value")).as("sum_value"))
        .orderBy("day")
    }),

    // ── Z-order layout key (round 11) ────────────────────────────────
    // The multi-dimensional clustering lever next to partitionBy's
    // single-column pruning (q_scan_partition_pruned) and bucketing
    // (q_join_bucketed): Morton-interleave the bits of TWO scan
    // dimensions so that sorting/bucketing by the one z-value bounds
    // BOTH dimensions' min/max per file — the property Delta's
    // OPTIMIZE ZORDER and Iceberg's sort orders buy, which lets a scan
    // with a predicate on EITHER column prune files by its stats. The
    // demonstration is the property itself: per 12-bit z-bucket (top 6
    // interleaved bits of each dimension), the per-bucket span of each
    // coordinate is < 64 of its 4096-value space — i.e. every bucket
    // is a tight rectangle, not a stripe (QueriesSpec pins the bound).
    // The interleave is the classic shift-and-mask spread, pure
    // integer column ops identical on both engines; at 100 TB the
    // z-value feeds repartitionByRange + per-file min/max stats, and
    // scans prune on them for free.
    "q_zorder_layout" -> ((s, d) => {
      def spread(c: Column): Column = {
        val s1 = c.bitwiseOR(shiftleft(c, 8)).bitwiseAND(lit(0x00FF00FFL))
        val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
        val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333L))
        s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555L))
      }
      val x = pmod(col("l_partkey"), lit(4096L))
      val y = pmod(col("l_suppkey"), lit(4096L))
      Tables(s, d, "lineitem")
        .select(x.as("x"), y.as("y"))
        .select(col("x"), col("y"),
          spread(col("x")).bitwiseOR(shiftleft(spread(col("y")), 1))
            .as("zval"))
        .select(col("x"), col("y"), expr("zval div 4096").as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_rows"),
          min("x").as("min_x"), max("x").as("max_x"),
          min("y").as("min_y"), max("y").as("max_y"))
        .orderBy("bucket")
    }),

    "q_filter_compound" -> ((s, d) =>
      Tables(s, d, "part")
        .filter(
          col("p_size").between(5, 40) &&
          (col("p_brand").isin("Brand#1", "Brand#5", "Brand#13", "Brand#19")
            || col("p_type").like("%OMO%")) &&
          !col("p_name").like("%bolt%") &&
          col("p_retailprice") >= 900.5)
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size",
          "p_retailprice")
        .orderBy("p_partkey")),

    "q_filter_null" -> ((s, d) => {
      val o = Tables(s, d, "orders")
        .withColumn("prio",
          when(col("o_orderpriority") === "5-LOW", lit(null))
            .otherwise(col("o_orderpriority")))
        .withColumn("stat",
          when(col("o_orderstatus") === "P", lit(null))
            .otherwise(col("o_orderstatus")))
      o.filter(col("prio").isNull || (col("stat") <=> lit("F")))
        .select(col("o_orderkey"), col("prio"), col("stat"),
          col("prio").isNotNull.as("has_prio"),
          (col("stat") <=> col("prio")).as("null_safe_eq"))
        .orderBy("o_orderkey")
    }),

    "q_project_case_cast" -> ((s, d) =>
      Tables(s, d, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        when(col("l_quantity") < 10, "low")
          .when(col("l_quantity") < 25, "mid")
          .otherwise("high").as("qty_band"),
        floor(col("l_extendedprice")).cast("long").as("price_floor"),
        col("l_quantity").cast("decimal(12,2)").cast("string").as("qty_str"),
        col("l_linenumber").cast("double").as("ln_dbl"),
        when(col("l_tax") > 0.04, col("l_tax")).otherwise(lit(0.0))
          .as("tax_adj"))
        .orderBy("l_orderkey", "l_linenumber", "qty_band", "price_floor",
          "qty_str", "ln_dbl", "tax_adj")),

    "q_sort_multi" -> ((s, d) =>
      Tables(s, d, "customer")
        .withColumn("bal",
          when(col("c_acctbal") < 1000, lit(null)).otherwise(col("c_acctbal")))
        .select("c_custkey", "c_nationkey", "bal", "c_mktsegment")
        .orderBy(col("c_mktsegment").asc, col("bal").desc_nulls_last,
          col("c_custkey").asc)),

    "q_limit_topk" -> ((s, d) =>
      Tables(s, d, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
          col("l_linenumber").asc)
        .limit(100)),

    // Flagship: TPC-H Q1-style pricing summary (SURVEY §7.2). Two-phase
    // hash aggregate; decimal-exact sums for hash-stable comparison.
    "q_agg_group" -> ((s, d) =>
      Tables(s, d, "lineitem")
        .filter(col("l_shipdate") <= to_timestamp(lit("2000-12-01 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          Det.dsum(col("l_quantity")).as("sum_qty"),
          Det.dsum(col("l_extendedprice")).as("sum_base_price"),
          Det.d2(sum(Det.dec2(col("l_extendedprice"))
            * (Det.one - Det.rate(col("l_discount"))))).as("sum_disc_price"),
          Det.d2(sum(Det.dec2(col("l_extendedprice"))
            * (Det.one - Det.rate(col("l_discount")))
            * (Det.one + Det.rate(col("l_tax"))))).as("sum_charge"),
          Det.davg(col("l_quantity")).as("avg_qty"),
          Det.davg(col("l_extendedprice")).as("avg_price"),
          Det.davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),
  )

  private val dsumS = (x: String) => s"CAST(ROUND(SUM(CAST($x AS DECIMAL(30,8))), 2) AS DOUBLE)"
  private val davgS = (x: String) => s"${dsumS(x)} / COUNT($x)"

  val oracle: Map[String, String] = Map(
    "q_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey, l_quantity, l_extendedprice""".stripMargin,

    "q_zorder_layout" ->
      """WITH xy AS (
        |  SELECT l_partkey % 4096 AS x, l_suppkey % 4096 AS y
        |  FROM lineitem),
        |s1 AS (
        |  SELECT x, y,
        |    ((x | (x << 8)) & 16711935) AS sx,
        |    ((y | (y << 8)) & 16711935) AS sy
        |  FROM xy),
        |s2 AS (
        |  SELECT x, y,
        |    ((sx | (sx << 4)) & 252645135) AS sx,
        |    ((sy | (sy << 4)) & 252645135) AS sy
        |  FROM s1),
        |s3 AS (
        |  SELECT x, y,
        |    ((sx | (sx << 2)) & 858993459) AS sx,
        |    ((sy | (sy << 2)) & 858993459) AS sy
        |  FROM s2),
        |s4 AS (
        |  SELECT x, y,
        |    ((sx | (sx << 1)) & 1431655765) AS sx,
        |    ((sy | (sy << 1)) & 1431655765) AS sy
        |  FROM s3),
        |z AS (
        |  SELECT x, y, (sx | (sy << 1)) // 4096 AS bucket FROM s4)
        |SELECT bucket, COUNT(*) AS n_rows,
        |  CAST(MIN(x) AS BIGINT) AS min_x, CAST(MAX(x) AS BIGINT) AS max_x,
        |  CAST(MIN(y) AS BIGINT) AS min_y, CAST(MAX(y) AS BIGINT) AS max_y
        |FROM z GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_scan_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
        |FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount""".stripMargin,

    // The partitioned layout is physical; the oracle is the plain
    // filtered aggregate over the original table.
    "q_scan_partition_pruned" ->
      """SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
        |  COUNT(*) AS n_events,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(30,8))), 2) AS DOUBLE)
        |    AS sum_value
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY day
        |ORDER BY day""".stripMargin,

    "q_filter_compound" ->
      """SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
        |FROM part
        |WHERE p_size BETWEEN 5 AND 40
        |  AND (p_brand IN ('Brand#1','Brand#5','Brand#13','Brand#19') OR p_type LIKE '%OMO%')
        |  AND p_name NOT LIKE '%bolt%'
        |  AND p_retailprice >= 900.5
        |ORDER BY p_partkey""".stripMargin,

    "q_filter_null" ->
      """WITH o AS (
        |  SELECT o_orderkey,
        |         NULLIF(o_orderpriority, '5-LOW') AS prio,
        |         NULLIF(o_orderstatus, 'P') AS stat
        |  FROM orders)
        |SELECT o_orderkey, prio, stat,
        |       prio IS NOT NULL AS has_prio,
        |       (stat IS NOT DISTINCT FROM prio) AS null_safe_eq
        |FROM o
        |WHERE prio IS NULL OR stat IS NOT DISTINCT FROM 'F'
        |ORDER BY o_orderkey""".stripMargin,

    "q_project_case_cast" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_quantity < 10 THEN 'low' WHEN l_quantity < 25 THEN 'mid' ELSE 'high' END AS qty_band,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  CAST(CAST(l_quantity AS DECIMAL(12,2)) AS VARCHAR) AS qty_str,
        |  CAST(l_linenumber AS DOUBLE) AS ln_dbl,
        |  CASE WHEN l_tax > 0.04 THEN l_tax ELSE 0.0 END AS tax_adj
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, qty_band, price_floor, qty_str, ln_dbl, tax_adj""".stripMargin,

    "q_sort_multi" ->
      """SELECT c_custkey, c_nationkey,
        |       CASE WHEN c_acctbal < 1000 THEN NULL ELSE c_acctbal END AS bal,
        |       c_mktsegment
        |FROM customer
        |ORDER BY c_mktsegment ASC, bal DESC NULLS LAST, c_custkey ASC""".stripMargin,

    "q_limit_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        |LIMIT 100""".stripMargin,

    "q_agg_group" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsumS("l_quantity")} AS sum_qty,
         |  ${dsumS("l_extendedprice")} AS sum_base_price,
         |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(2,0)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE) AS sum_disc_price,
         |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(2,0)) - CAST(l_discount AS DECIMAL(6,4))) * (CAST(1 AS DECIMAL(2,0)) + CAST(l_tax AS DECIMAL(6,4)))), 2) AS DOUBLE) AS sum_charge,
         |  ${davgS("l_quantity")} AS avg_qty,
         |  ${davgS("l_extendedprice")} AS avg_price,
         |  ${davgS("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
  )
}
