package graft.queries

import graft.Tables
import org.apache.spark.sql.Column
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

    // Exact interpolated quantiles of the price distribution. Both
    // engines sort the same doubles and interpolate linearly; results
    // rounded to 4dp against last-ulp interpolation differences.
    "q_quantiles" -> ((s, d) =>
      Tables(s, d, "lineitem").agg(
        round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_extendedprice, 0.75)"), 4).as("p75"),
        round(expr("percentile(l_extendedprice, 0.99)"), 4).as("p99"))),

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
