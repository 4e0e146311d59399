package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** UDF / UDAF / UDTF surface (SURVEY §2.5).
  *
  * Scale notes: a Scala UDF is a codegen black box (no pushdown through it,
  * ser/de per row) — acceptable here because q_udf_topic_name exists to
  * demonstrate the UDF category itself; the same logic ships codegen'd in
  * q_cdc_route. The typed Aggregator compiles to a two-phase (partial +
  * merge) aggregate, so it map-side combines like any built-in. The
  * "UDTF" is Spark's built-in posexplode generator over a split body —
  * custom Generator classes are unnecessary for line splitting.
  */
object Udfs {

  /** The bridge's topic naming as a scalar function: prefix + first regex
    * group of the changefeed path (publisher.go:80-82, 158-160). Null for
    * paths that match neither regex (the 404 branch). */
  private val topicPattern = java.util.regex.Pattern.compile(
    Cdc.generalFile)
  private val resolvedPattern = java.util.regex.Pattern.compile(
    Cdc.resolvedFile)

  private def topicNameImpl(prefix: String, path: String): String = {
    if (path == null) return null
    val r = resolvedPattern.matcher(path)
    if (r.find()) return prefix + r.group(1)
    val g = topicPattern.matcher(path)
    if (g.find()) prefix + g.group(1) else null
  }

  /** Weighted mean via a typed Aggregator — two-phase merge semantics.
    * Buffer is (sum(w*x), sum(w)); double accumulation is order-dependent
    * in the last ulp, so the query rounds the result to 4dp (§7.4). */
  object WeightedAvg
    extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
      (b._1 + in._1 * in._2, b._2 + in._2)
    override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Double, Double)): Double =
      if (b._2 == 0.0) Double.NaN else b._1 / b._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Count-min sketch over tokens as a typed Aggregator (round 5): a
    * depth x width long matrix in one flat buffer. Cell-wise addition
    * makes it MERGEABLE, so Spark runs it as a two-phase aggregate with
    * map-side partials — the 100-TB frequency shape when the vocabulary
    * itself is too big for a token-keyed shuffle (the exact
    * q_heavy_hitters): total state is O(depth * width) no matter the
    * corpus. Estimates never undercount; overcount is bounded by hash
    * collisions (~N/width per row w.h.p.), spec-pinned against exact
    * counts in LlmOpsSpec. Hashes are MurmurHash3 with the row index as
    * seed — deterministic across JVMs and partitionings. */
  final class CountMinSketchAgg(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](depth * width)
    override def reduce(b: Array[Long], tok: String): Array[Long] = {
      var i = 0
      while (i < depth) {
        b(i * width + CountMinSketchAgg.cell(tok, i, width)) += 1L
        i += 1
      }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  object CountMinSketchAgg {
    def cell(tok: String, row: Int, width: Int): Int =
      java.lang.Math.floorMod(
        scala.util.hashing.MurmurHash3.stringHash(tok, row), width)
    /** Point estimate = min over rows (the CMS read path). */
    def estimate(sketch: Array[Long], tok: String,
      depth: Int, width: Int): Long =
      (0 until depth).map(i => sketch(i * width + cell(tok, i, width))).min
  }

  val q: Map[String, Q] = Map(
    // CMS counts for the exact heavy-hitter tokens: builds the sketch in
    // one distributed pass (constant state), then reads the estimates
    // driver-side for the (bounded, phi-frequent) candidate set — the
    // standard sketch+candidates split at scale. No oracle (approximate);
    // LlmOpsSpec pins est >= exact and the collision bound.
    "q_heavy_hitters_cms" -> ((s, d) => {
      import s.implicits._
      val depth = 4; val width = 2048
      val toks = par(Tables(s, d, "documents"))
        .select(explode(split(lower(col("text")), " ")).as("token"))
        .filter(col("token") =!= "").as[String]
      val sketch = toks.select(new CountMinSketchAgg(depth, width)
        .toColumn.name("cms")).head()
      val exact = TextOps.q("q_heavy_hitters")(s, d)
        .select("token", "occurrences").collect()
      val rows = exact.toSeq.map { r =>
        (r.getString(0), r.getLong(1),
          CountMinSketchAgg.estimate(sketch, r.getString(0), depth, width))
      }
      s.createDataset(rows).toDF("token", "occurrences", "cms_estimate")
        .orderBy(col("occurrences").desc, col("token").asc)
    }),

    "q_udf_topic_name" -> ((s, d) => {
      val topicName = udf(topicNameImpl _)
      Cdc.withPath(Tables(s, d, "orders"))
        .select(col("o_orderkey"), col("path"),
          topicName(lit("cdc-"), col("path")).as("topic"))
        .orderBy("o_orderkey")
    }),

    "q_udaf_weighted_avg" -> ((s, d) => {
      val wavg = udaf(WeightedAvg)
      Tables(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(round(wavg(col("l_extendedprice"), col("l_quantity")), 4)
          .as("wavg_price"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // R2 as a query: a multi-line body string split back into one row per
    // line with its ordinal (publisher.go:182-202). Line payloads are
    // lpad'd so lexicographic collect_list order == numeric order.
    // Batch key is a contiguous orderkey block of 16, so each collected
    // body is <= 16 lines NO MATTER the table size — a `% 100` key would
    // grow each body linearly with the data (multi-GB strings at 100 TB).
    "q_udtf_line_split" -> ((s, d) => {
      val o = Tables(s, d, "orders")
      val line = concat(lit("ok="),
        lpad(col("o_orderkey").cast("string"), 10, "0"))
      o.select(floor(col("o_orderkey") / 16).cast("long").as("batch"),
          line.as("line"))
        .groupBy("batch")
        .agg(concat_ws("\n", sort_array(collect_list(col("line"))))
          .as("body"))
        .select(col("batch"),
          posexplode(split(col("body"), "\n")).as(Seq("ordinal", "line")))
        .orderBy("batch", "ordinal")
    }),
  )

  val oracle: Map[String, String] = Map(
    "q_udf_topic_name" -> s"""WITH p AS (${Cdc.withPathSql})
      |SELECT o_orderkey, path,
      |  CASE WHEN regexp_extract(path, '${Cdc.resolvedFile}', 1) <> '' THEN 'cdc-' || regexp_extract(path, '${Cdc.resolvedFile}', 1)
      |       WHEN regexp_extract(path, '${Cdc.generalFile}', 1) <> '' THEN 'cdc-' || regexp_extract(path, '${Cdc.generalFile}', 1)
      |       ELSE NULL END AS topic
      |FROM p ORDER BY o_orderkey""".stripMargin,

    "q_udaf_weighted_avg" ->
      """SELECT l_returnflag, l_linestatus,
        |  ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4) AS wavg_price,
        |  COUNT(*) AS n_rows
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_udtf_line_split" ->
      """SELECT CAST(floor(o_orderkey / 16) AS BIGINT) AS batch,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY CAST(floor(o_orderkey / 16) AS BIGINT) ORDER BY o_orderkey) - 1 AS INT) AS ordinal,
        |  'ok=' || lpad(CAST(o_orderkey AS VARCHAR), 10, '0') AS line
        |FROM orders
        |ORDER BY batch, ordinal""".stripMargin,
  )
}
