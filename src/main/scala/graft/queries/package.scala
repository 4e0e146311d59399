package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

package object queries {
  /** A declared query: (session, scale-factor dir) => result frame. */
  type Q = (SparkSession, String) => DataFrame

  /** Local-fixture scan-parallelism shim. The driver's test parquet is one
    * file with ONE row group per table, so Spark cannot split the scan and
    * every narrow pipeline runs on a single core until its first shuffle.
    * Queries whose per-row compute dominates the scan (md5 sketches,
    * regex routing, json parsing) insert this cheap exchange right after
    * the scan to spread that work across all cores. A real deployment
    * reads many row groups/files in parallel and must NOT carry this
    * repartition — it would be a gratuitous full-data shuffle at 100 TB —
    * so it is OFF unless the harness opts in via
    * `spark.graft.singleRowgroupShim=true` (set by Verify/Bench, whose
    * input IS the single-row-group fixture). Production sessions never set
    * it and get the clean no-exchange plan.
    */
  def par(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    if (s.conf.get("spark.graft.singleRowgroupShim", "false") == "true")
      df.repartition(s.sparkContext.defaultParallelism)
    else df
  }

  /** Persist `df` MEMORY_AND_DISK and eagerly fill the cache with one
    * count, so a frame read by several downstream branches computes its
    * pipeline exactly once instead of racing per-side. Under the
    * DumpPlans escape hatch (`spark.graft.skipEagerMaterialize=true`)
    * it returns `df` untouched: a plan-inspection session must neither
    * execute the job at frame-BUILD time nor persist a cache that
    * materializeAndFree would then skip unpersisting (round-10 advice —
    * the graph operators ran their pair-counts job and leaked the edge
    * cache in dump sessions). `unpersist()` on the un-persisted frame
    * is a no-op, so materializeAndFree(handles…) stays correct either
    * way. */
  private[queries] def persistEager(df: DataFrame): DataFrame = {
    if (df.sparkSession.conf
        .get("spark.graft.skipEagerMaterialize", "false") == "true") df
    else {
      val p = df.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count()
      p
    }
  }

  /** [[persistEager]] without the cache-filling count job — for a frame
    * whose FIRST consumer is itself a single eagerly-materialized frame
    * (the consumer's one action fills this cache as it runs, so the
    * explicit count would be a pure extra job; the per-side race
    * persistEager exists to prevent cannot happen when exactly one
    * consumer runs first). Honors the DumpPlans escape hatch like
    * persistEager: a plan-inspection session gets the bare frame and
    * no cache to leak. */
  private[queries] def persistLazy(df: DataFrame): DataFrame = {
    if (df.sparkSession.conf
        .get("spark.graft.skipEagerMaterialize", "false") == "true") df
    else df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** Has Dataset.observe delivered a metric for an eager localCheckpoint
    * in this JVM? Tri-state: null = untested, TRUE = works (fused
    * per-round scalars ride the checkpoint job), FALSE = never landed
    * once — skip the bounded wait for the rest of the JVM and pay the
    * explicit tiny agg job instead. Defensive: on every Spark version
    * tested the checkpoint runs through withAction and fires
    * QueryExecutionListeners, but a hang here would freeze every
    * fixpoint consumer, so the fallback stays. Shared by the CC kernel's
    * convergence sum (AnnOps) and PageRank's dangling-mass sum
    * (GraphOps) — round 17 generalized it out of AnnOps. */
  @volatile private var observeOnCheckpoint: java.lang.Boolean = null

  /** Eagerly checkpoint `df` and return it with the value of `metric`
    * (a long-valued aggregate over df's rows) WITHOUT a second job: the
    * aggregate rides the checkpoint's own action as a Dataset.observe
    * metric. The old shape re-scanned every checkpointed round with a
    * separate agg action — one extra job per round for every fixpoint
    * consumer. Callers must coalesce the metric so an empty frame gives
    * 0, not null. */
  private[queries] def checkpointedWithSum(
      df: DataFrame, metric: Column): (DataFrame, Long) = {
    def explicit(out: DataFrame): Long =
      out.agg(metric).head().getLong(0)
    if (observeOnCheckpoint == java.lang.Boolean.FALSE) {
      val out = df.localCheckpoint(true)
      (out, explicit(out))
    } else {
      val obs = org.apache.spark.sql.Observation()
      val out = df.observe(obs, metric.as("m")).localCheckpoint(true)
      // listener delivery is async (post-action) — bounded wait, then
      // fall back once and remember for the JVM
      try {
        val row = scala.concurrent.Await.result(obs.future,
          scala.concurrent.duration.Duration(2, "s"))
        observeOnCheckpoint = java.lang.Boolean.TRUE
        (out, row.getAs[Long]("m"))
      } catch {
        case _: java.util.concurrent.TimeoutException =>
          observeOnCheckpoint = java.lang.Boolean.FALSE
          (out, explicit(out))
      }
    }
  }

  /** [[persistEager]] whose cache-filling count also delivers a
    * long-valued aggregate over `df` via Dataset.observe — the
    * fan-back short-circuit's data probe (round 18): the dedup family
    * branches on the corpus's max exact-dup class size without paying
    * a second job. Same bounded-wait + explicit-agg fallback contract
    * as [[checkpointedWithSum]] (the fallback reads the just-filled
    * cache, so either path returns the same data-determined value —
    * the branch can never depend on timing). In a plan-inspection
    * session (skipEagerMaterialize) no job runs, so the metric is None
    * and callers MUST take their general branch — plan digests stay
    * data-independent. Callers coalesce NULL aggregates themselves if
    * an empty frame is possible (getAs returns 0L for a null long
    * here via the isNullAt guard). */
  private[queries] def persistEagerWithLong(
      df: DataFrame, metric: Column): (DataFrame, Option[Long]) = {
    if (df.sparkSession.conf
        .get("spark.graft.skipEagerMaterialize", "false") == "true")
      (df, None)
    else {
      val obs = org.apache.spark.sql.Observation()
      val p = df.observe(obs, metric.as("m"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count()
      val v = try {
        val row = scala.concurrent.Await.result(obs.future,
          scala.concurrent.duration.Duration(2, "s"))
        if (row.isNullAt(0)) 0L else row.getAs[Long]("m")
      } catch {
        case _: java.util.concurrent.TimeoutException =>
          val r = p.agg(metric.as("m")).head()
          if (r.isNullAt(0)) 0L else r.getLong(0)
      }
      (p, Some(v))
    }
  }

  /** Eagerly materialize `df` via localCheckpoint, then release the
    * internal caches it depended on. Sketch queries (minhash / simhash /
    * sign-LSH / ngram-jaccard) persist big intermediates that a
    * lazy-returned frame could never unpersist — they would sit in the
    * CacheManager for the whole session (round-4 advice #1). Checkpoint
    * blocks, by contrast, are ContextCleaner-managed: freed when the
    * frame is GC'd, no explicit release needed. The materialization is
    * not extra work — callers materialize exactly once anyway — and the
    * checkpointed rows are the SMALL end product (pair lists /
    * per-doc sketch rows), not the big intermediates. On a multi-node
    * cluster prefer reliable checkpoint() (localCheckpoint blocks die
    * with an executor).
    */
  private[queries] def materializeAndFree(
      df: DataFrame, handles: DataFrame*): DataFrame = {
    // Plan-inspection escape hatch: DumpPlans sets this so building the
    // frame does NOT execute the sketch job (an eager localCheckpoint at
    // plan-dump time would both run the full query and collapse the
    // dumped plan to a LogicalRDD scan). Leaks the internal caches —
    // acceptable only in a dump/inspection session, never the harness.
    if (df.sparkSession.conf
        .get("spark.graft.skipEagerMaterialize", "false") == "true") df
    else {
      val out = df.localCheckpoint(true)
      handles.foreach(_.unpersist())
      out
    }
  }
}

package queries {
  /** Determinism helpers for the DuckDB hash-compare (SURVEY §7.4).
    *
    * Float reductions are order-dependent; Spark's partial aggregation and
    * DuckDB's sequential scan would disagree in the last ulp. Casting each
    * row to an exact decimal BEFORE the sum makes the reduction exact and
    * order-independent, and the final decimal->double cast is the same
    * IEEE-nearest value on both engines.
    */
  object Det {
    /** Exact, order-independent sum of a double column, rounded to 2dp and
      * returned as double. The ROUND-to-2 before the double cast matters:
      * DuckDB's decimal->double cast is int128->double then /10^scale (two
      * roundings, can be 1 ulp off correctly-rounded), so high-scale decimal
      * sums must be scale-reduced until the unscaled int fits a double
      * exactly. SQL twin: CAST(ROUND(SUM(CAST(x AS DECIMAL(30,8))), 2) AS DOUBLE). */
    def dsum(c: Column): Column =
      round(sum(c.cast("decimal(30,8)")), 2).cast("double")

    /** Deterministic mean: 2dp-rounded exact sum divided by count (the same
      * double division on both engines).
      * SQL twin: CAST(ROUND(SUM(CAST(x AS DECIMAL(30,8))), 2) AS DOUBLE) / COUNT(x). */
    def davg(c: Column): Column = dsum(c) / count(c)

    /** Deterministic double cast of any exact-decimal aggregate. */
    def d2(c: Column): Column = round(c, 2).cast("double")

    /** Source money/quantity column (<= 2 decimal digits) as exact decimal.
      * A double holding a 2-dp value is ~1e-17 from it, so the cast is
      * unambiguous on both engines — unlike casting a full-precision double
      * PRODUCT, where Spark (shortest-repr HALF_UP) and DuckDB (binary)
      * round the 8th decimal differently. Always cast operands, not results. */
    def dec2(c: Column): Column = c.cast("decimal(12,2)")

    /** Small rate column (discount/tax, <= 4 decimal digits) as exact decimal. */
    def rate(c: Column): Column = c.cast("decimal(6,4)")

    /** Literal 1 with tight decimal precision so Spark's decimal type
      * arithmetic stays under precision 38 (no allowPrecisionLoss rounding). */
    def one: Column = lit(1).cast("decimal(2,0)")
  }
}
