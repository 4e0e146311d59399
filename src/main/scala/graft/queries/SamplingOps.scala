package graft.queries

import graft.Tables
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling & distribution operators for the training-data pipeline:
  * reproducible corpus sampling and distribution profiling are everyday
  * operations at 100 TB (hold-out splits, per-source quotas, QA).
  *
  * Sampling here is HASH-based, not RNG-based: `sample()`'s seed is
  * per-partition-RNG and irreproducible across engines/partitionings,
  * while `hash(key) mod N < k` is deterministic everywhere, stable under
  * repartitioning, and exactly re-derivable later (the property a
  * training corpus split must have). Uses the same portable 60-bit
  * md5-prefix hash as the dedup family.
  */
object SamplingOps {

  private def h60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")

  private val h60Sql = (x: String) =>
    s"CAST(('0x' || substring(md5(CAST($x AS VARCHAR)), 1, 15)) AS BIGINT)"

  val q: Map[String, Q] = Map(
    // ~10% reproducible sample of documents by id-hash bucket.
    "q_sample_hash" -> ((s, d) =>
      Tables(s, d, "documents")
        .filter(pmod(h60(col("doc_id").cast("string")), lit(100)) < 10)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")),

    // Stratified sampling: per-language rates (en kept at 50%, others at
    // 10%) — the per-source quota shape of corpus curation.
    "q_stratified_sample" -> ((s, d) => {
      val bucket = pmod(h60(col("doc_id").cast("string")), lit(100))
      Tables(s, d, "documents")
        .filter((col("lang") === "en" && bucket < 50) ||
          (col("lang") =!= "en" && bucket < 10))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_sampled"))
        .orderBy("lang")
    }),

    // Exact interpolated quantiles, distributed: Spark's `percentile`
    // buffers EVERY value in one final aggregation buffer (OOM at 100 TB),
    // so this is the classic two-pass exact-rank shape instead:
    //   1. range-repartition on the value (the same exchange a global sort
    //      uses), row_number WITHIN each partition (no single-partition
    //      window anywhere);
    //   2. per-partition counts to the driver — O(#partitions) rows, not
    //      O(n) — cumulated into rank offsets;
    //   3. fetch only the <=2 boundary rows per requested quantile and
    //      interpolate linearly (type-7, same as DuckDB quantile_cont).
    // Results rounded to 4dp against last-ulp interpolation differences.
    "q_quantiles" -> ((s, d) => {
      val qs = Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75, "p99" -> 0.99)
      val x = Tables(s, d, "lineitem")
        .select(col("l_extendedprice").cast("double").as("x"))
      val nPart = s.sparkContext.defaultParallelism
      val parted = x.repartitionByRange(nPart, col("x"))
        .withColumn("pid", spark_partition_id())
        .persist() // two actions below must see the SAME partitioning
      try {
        val cnts = parted.groupBy("pid").agg(count(lit(1)).as("cnt"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
        val n = cnts.values.sum
        // range partitions are ordered by pid, so offsets are prefix sums
        val pids = cnts.keys.toSeq.sorted
        val offsets = pids.zip(pids.map(cnts).scanLeft(0L)(_ + _)).toMap
        val pos = qs.map { case (name, q) => name -> (q * (n - 1) + 1.0) }
        val need = pos.flatMap { case (_, p) =>
          Seq(math.floor(p).toLong, math.ceil(p).toLong)
        }.distinct
        val offExpr = element_at(
          map(cnts.keys.toSeq.sorted.flatMap(p =>
            Seq(lit(p), lit(offsets(p)))): _*), col("pid"))
        val w = Window.partitionBy("pid").orderBy("x")
        // The rank offsets are only valid if this second action sees the
        // SAME partitioning as the counts pass. That holds while the
        // persisted blocks live, but an evicted block re-runs the range
        // exchange, which MAY resample boundaries — so this pass also
        // returns EVERY partition's first row carrying that partition's
        // count (same window exchange, no extra job) and validates the
        // full per-pid count map, not just partitions that happened to
        // hold a boundary rank: compensating drift (one partition gains a
        // row, another loses one) shifts offsets of partitions whose own
        // count is unchanged, so per-boundary-row checks alone would pass
        // on silently wrong quantiles (round-3 advice, round-4 review).
        val firstRns = pids.map(p => offsets(p) + 1L)
        val rows = parted
          .withColumn("rn", row_number().over(w) + offExpr)
          .withColumn("cnt2", count(lit(1)).over(Window.partitionBy("pid")))
          .filter(col("rn").isin((need ++ firstRns).distinct: _*))
          .select("pid", "rn", "x", "cnt2").collect()
        val cnts2 = rows.filter(r => r.getLong(1) == offsets
            .getOrElse(r.getInt(0), Long.MinValue) + 1L)
          .map(r => r.getInt(0) -> r.getLong(3)).toMap
        if (cnts2 != cnts)
          throw new IllegalStateException(
            s"q_quantiles: boundary-pass partition counts $cnts2 != " +
              s"counts-pass $cnts — cached range partitioning was lost " +
              "and resampled between the two passes")
        val boundary = rows.map(r => r.getLong(1) -> r.getDouble(2)).toMap
        val missingRank = need.filterNot(boundary.contains)
        if (missingRank.nonEmpty)
          throw new IllegalStateException(
            s"q_quantiles: boundary ranks $missingRank not found — " +
              "partitioning drifted between the two passes")
        val cells = pos.map { case (name, p) =>
          val lo = math.floor(p).toLong
          val frac = p - lo
          val v = boundary(lo) + frac * (boundary(math.ceil(p).toLong) - boundary(lo))
          round(lit(v), 4).as(name)
        }
        s.range(1).select(cells: _*)
      } finally parted.unpersist()
    }),

    // Per-group quantiles via approx_percentile: a KLL/GK-style sketch —
    // constant-size, mergeable, two-phase — which IS the per-group
    // quantile shape at 100 TB (per-group exact needs every value of
    // every group co-resident; the global-exact two-pass above doesn't
    // decompose by group). No oracle (sketch internals differ per
    // engine); PropertiesSpec pins the error contract against exact.
    "q_quantiles_grouped" -> ((s, d) =>
      Tables(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("approx_percentile(l_extendedprice, 0.5, 10000)").as("p50"),
          expr("approx_percentile(l_extendedprice, 0.95, 10000)").as("p95"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")),

    // Fixed-width histogram of document lengths: integer bucket math,
    // two-phase agg — the distribution-profiling shape.
    "q_histogram" -> ((s, d) =>
      Tables(s, d, "documents")
        .withColumn("bucket", floor(col("n_chars") / 500).cast("long"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .orderBy("bucket")),
  )

  val oracle: Map[String, String] = Map(
    "q_sample_hash" ->
      s"""SELECT doc_id, lang, source, n_chars
         |FROM documents
         |WHERE ${h60Sql("doc_id")} % 100 < 10
         |ORDER BY doc_id""".stripMargin,

    "q_stratified_sample" ->
      s"""SELECT lang, COUNT(*) AS n_sampled
         |FROM documents
         |WHERE (lang = 'en' AND ${h60Sql("doc_id")} % 100 < 50)
         |   OR (lang <> 'en' AND ${h60Sql("doc_id")} % 100 < 10)
         |GROUP BY lang
         |ORDER BY lang""".stripMargin,

    "q_quantiles" ->
      """SELECT
        |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
        |  round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
        |FROM lineitem""".stripMargin,

    "q_histogram" ->
      """SELECT CAST(floor(n_chars / 500) AS BIGINT) AS bucket,
        |  COUNT(*) AS n_docs,
        |  MIN(n_chars) AS min_chars,
        |  MAX(n_chars) AS max_chars
        |FROM documents
        |GROUP BY bucket
        |ORDER BY bucket""".stripMargin,
  )
}
