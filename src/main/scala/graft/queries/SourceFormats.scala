package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Source-format ingest surface (SURVEY §2.2 sources; round-7 addition).
  *
  * The reference ingests exactly one wire format — NDJSON over HTTP
  * (handler.go's ndjson body loop) — but a user switching their pipeline
  * onto this engine lands files in whatever format the upstream emits.
  * These keys elevate the bundled format readers (csv, json-lines, orc;
  * parquet is the canonical path every other query already exercises)
  * from round-trip specs (SourcesSpec/FormatsSpec) to first-class
  * oracle-checked operators: each materializes a content-addressed copy
  * of a fixture table in the target format ONCE (FixtureLayout: atomic
  * publish, regenerated fixture => new tag), reads it back through the
  * real datasource, and aggregates. The DuckDB oracle runs the same
  * aggregate on the ORIGINAL parquet, so a hash match proves the format
  * round-trip lost nothing — types, fractional-second timestamps,
  * shortest-repr doubles, embedded-JSON strings — not merely that the
  * reader parsed *something*.
  *
  * Scale notes (100 TB):
  *   - Schema is supplied EXPLICITLY on every text read (derived from the
  *     canonical table's parquet footer — a metadata read). Schema
  *     inference is a second full pass over the data before the first
  *     real one; at 100 TB that is the difference between one scan and
  *     two. Never inferSchema in production paths.
  *   - Text formats parse row-at-a-time and cannot push predicates or
  *     prune columns below the parse; they are INGEST EDGES, not storage.
  *     The orc key shows the contrast: its filter reaches the scan as a
  *     real pushed predicate (SourcesSpec pins PushedFilters), same as
  *     parquet.
  *   - timestampFormat is pinned to microsecond precision on write AND
  *     read: Spark's default text-format pattern carries milliseconds
  *     only, which silently truncates micro-precision event times — an
  *     ingest-edge corruption the oracle twin catches here (events.ts is
  *     micro-precision; see the ndjson max_ts column).
  */
object SourceFormats {

  /** Microsecond-precision wire format for timestamps in text files. */
  private val TsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  private def tmpRoot = System.getProperty("java.io.tmpdir")

  val q: Map[String, Q] = Map(
    // CSV ingest: orders written once as headered CSV, read back with the
    // canonical schema (no inference scan), then a grouped summary whose
    // doubles/timestamps only hash-match the parquet oracle if the text
    // round-trip was value-exact (shortest-repr doubles re-parse to the
    // same bits; TsFmt keeps the full timestamp).
    "q_source_csv" -> ((s, d) => {
      val tag = FixtureLayout.contentTag(d, Seq("orders"))
      val path = FixtureLayout.ensureDir(
        s"$tmpRoot/graft_src_$tag/orders_csv") { staging =>
        Tables(s, d, "orders").write
          .option("header", "true").option("timestampFormat", TsFmt)
          .csv(staging)
      }
      s.read
        .schema(Tables(s, d, "orders").schema)
        .option("header", "true").option("timestampFormat", TsFmt)
        .csv(path)
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(
          count(lit(1)).as("n_orders"),
          Det.dsum(col("o_totalprice")).as("sum_price"),
          date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("first_day"),
          date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("last_day"))
        .orderBy("o_orderpriority", "o_orderstatus")
    }),

    // NDJSON ingest — the reference's own wire format, as a batch file
    // source: events (micro-precision ts, JSON-in-string props) written
    // as json-lines, read back with the canonical schema. props_chars
    // proves the embedded-JSON string survived quoting/escaping
    // byte-exactly; max_ts proves microseconds survived TsFmt.
    "q_source_ndjson" -> ((s, d) => {
      val tag = FixtureLayout.contentTag(d, Seq("events"))
      val path = FixtureLayout.ensureDir(
        s"$tmpRoot/graft_src_$tag/events_ndjson") { staging =>
        Tables(s, d, "events").write
          .option("timestampFormat", TsFmt).json(staging)
      }
      s.read
        .schema(Tables(s, d, "events").schema)
        .option("timestampFormat", TsFmt)
        .json(path)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n_events"),
          Det.dsum(col("value")).as("sum_value"),
          sum(length(col("props"))).as("props_chars"),
          countDistinct(col("user_id")).as("n_users"),
          date_format(max(col("ts")), TsFmt).as("max_ts"))
        .orderBy("event_type")
    }),

    // ORC ingest: the second real columnar format. A projected lineitem
    // copy (columnar write keeps only the queried columns), then a
    // Q1-shaped aggregate whose ship-date filter is pushed INTO the ORC
    // scan (SourcesSpec pins PushedFilters) — the storage-format
    // contract text formats cannot offer.
    "q_source_orc" -> ((s, d) => {
      val tag = FixtureLayout.contentTag(d, Seq("lineitem"))
      val path = FixtureLayout.ensureDir(
        s"$tmpRoot/graft_src_$tag/lineitem_orc") { staging =>
        Tables(s, d, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_returnflag",
            "l_linestatus", "l_shipdate", "l_quantity", "l_extendedprice",
            "l_discount")
          .write.orc(staging)
      }
      s.read.orc(path)
        .filter(col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("n_items"),
          Det.dsum(col("l_quantity")).as("sum_qty"),
          Det.dsum(col("l_extendedprice")).as("sum_price"),
          Det.d2(sum(Det.dec2(col("l_extendedprice"))
            * (Det.one - Det.rate(col("l_discount"))))).as("sum_disc_price"))
        .orderBy("l_returnflag", "l_linestatus")
    })
  )

  private val dsumS =
    (x: String) => s"CAST(ROUND(SUM(CAST($x AS DECIMAL(30,8))), 2) AS DOUBLE)"

  /** Oracles read the ORIGINAL parquet tables: equality proves the
    * format round-trip, not just the aggregate. */
  val oracle: Map[String, String] = Map(
    "q_source_csv" ->
      """SELECT o_orderpriority, o_orderstatus,
        |  COUNT(*) AS n_orders,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,8))), 2) AS DOUBLE)
        |    AS sum_price,
        |  strftime(MIN(o_orderdate), '%Y-%m-%d') AS first_day,
        |  strftime(MAX(o_orderdate), '%Y-%m-%d') AS last_day
        |FROM orders
        |GROUP BY o_orderpriority, o_orderstatus
        |ORDER BY o_orderpriority, o_orderstatus""".stripMargin,

    "q_source_ndjson" ->
      """SELECT event_type,
        |  COUNT(*) AS n_events,
        |  CAST(ROUND(SUM(CAST(value AS DECIMAL(30,8))), 2) AS DOUBLE)
        |    AS sum_value,
        |  CAST(SUM(LENGTH(props)) AS BIGINT) AS props_chars,
        |  COUNT(DISTINCT user_id) AS n_users,
        |  strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f') AS max_ts
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q_source_orc" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  COUNT(*) AS n_items,
         |  ${dsumS("l_quantity")} AS sum_qty,
         |  ${dsumS("l_extendedprice")} AS sum_price,
         |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(2,0)) - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE) AS sum_disc_price
         |FROM lineitem
         |WHERE l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
