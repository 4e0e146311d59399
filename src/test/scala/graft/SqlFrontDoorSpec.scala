package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL front door contract (round 11): contract queries re-written
  * as pure `spark.sql` TEXT — resolving tables via GraftSql's temp
  * views and native functions via the injected GraftExtensions — must
  * return row-identical results to their DataFrame originals. Three
  * queries chosen to cover the three resolution paths: plain relational
  * SQL (q_agg_group), an injected scalar kernel (cosine_sim in
  * q_similarity_cosine), and the engine's portable hash
  * (graft_h60 in q_sample_hash). */
class SqlFrontDoorSpec extends AnyFunSuite {
  import TestSpark._

  private def viaSql(text: String) =
    GraftSql.sql(spark, sf, text).collect().map(_.toString).toSeq

  private def viaDf(key: String) =
    SparkEntry.queries(key)(spark, sf).collect().map(_.toString).toSeq

  test("q_agg_group runs as pure SQL text with identical rows") {
    val dsum = (x: String) =>
      s"CAST(ROUND(SUM(CAST($x AS DECIMAL(30,8))), 2) AS DOUBLE)"
    val sqlRows = viaSql(
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsum("l_quantity")} AS sum_qty,
         |  ${dsum("l_extendedprice")} AS sum_base_price,
         |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
         |    * (CAST(1 AS DECIMAL(2,0)) - CAST(l_discount AS DECIMAL(6,4)))),
         |    2) AS DOUBLE) AS sum_disc_price,
         |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
         |    * (CAST(1 AS DECIMAL(2,0)) - CAST(l_discount AS DECIMAL(6,4)))
         |    * (CAST(1 AS DECIMAL(2,0)) + CAST(l_tax AS DECIMAL(6,4)))),
         |    2) AS DOUBLE) AS sum_charge,
         |  ${dsum("l_quantity")} / COUNT(l_quantity) AS avg_qty,
         |  ${dsum("l_extendedprice")} / COUNT(l_extendedprice) AS avg_price,
         |  ${dsum("l_discount")} / COUNT(l_discount) AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP_NTZ'2000-12-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    assert(sqlRows == viaDf("q_agg_group"))
  }

  test("q_similarity_cosine runs as pure SQL via the injected cosine_sim") {
    val sqlRows = viaSql(
      """WITH probe AS (
        |  SELECT embedding AS probe FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  ROUND(cosine_sim(e.embedding, p.probe), 6) AS cos_sim
        |FROM embeddings e CROSS JOIN probe p
        |ORDER BY cos_sim DESC, vec_id ASC
        |LIMIT 20""".stripMargin)
    assert(sqlRows == viaDf("q_similarity_cosine"))
  }

  test("q_sample_hash runs as pure SQL via the injected graft_h60") {
    val sqlRows = viaSql(
      """SELECT doc_id, lang, source, n_chars
        |FROM documents
        |WHERE pmod(graft_h60(CAST(doc_id AS STRING)), 100) < 10
        |ORDER BY doc_id""".stripMargin)
    assert(sqlRows == viaDf("q_sample_hash"))
  }

  test("round-11 operators run as pure SQL text (k-anonymity, z-order)") {
    // k-anonymity: plain relational SQL (Spark dialect: div for the
    // positive-shifted cents band)
    val kanon = viaSql(
      """WITH b AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    (cast(round(c_acctbal * 100) as bigint) + 100000) div 100000
        |      AS band
        |  FROM customer)
        |SELECT c_nationkey, c_mktsegment,
        |  COUNT(*) AS n,
        |  CAST(COUNT(DISTINCT band) AS BIGINT) AS n_sensitive,
        |  round(1.0D / COUNT(*), 6) AS reident_risk,
        |  COUNT(*) >= 5 AS meets_k,
        |  COUNT(DISTINCT band) >= 3 AS meets_l
        |FROM b
        |GROUP BY c_nationkey, c_mktsegment
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin)
    assert(kanon == viaDf("q_k_anonymity"))
    // z-order: the Morton spread as stepwise SQL bit expressions
    val zsql = viaSql(
      """WITH xy AS (
        |  SELECT pmod(l_partkey, 4096) AS x, pmod(l_suppkey, 4096) AS y
        |  FROM lineitem),
        |s1 AS (
        |  SELECT x, y,
        |    ((x | shiftleft(x, 8)) & 16711935) AS sx,
        |    ((y | shiftleft(y, 8)) & 16711935) AS sy
        |  FROM xy),
        |s2 AS (
        |  SELECT x, y,
        |    ((sx | shiftleft(sx, 4)) & 252645135) AS sx,
        |    ((sy | shiftleft(sy, 4)) & 252645135) AS sy
        |  FROM s1),
        |s3 AS (
        |  SELECT x, y,
        |    ((sx | shiftleft(sx, 2)) & 858993459) AS sx,
        |    ((sy | shiftleft(sy, 2)) & 858993459) AS sy
        |  FROM s2),
        |s4 AS (
        |  SELECT x, y,
        |    ((sx | shiftleft(sx, 1)) & 1431655765) AS sx,
        |    ((sy | shiftleft(sy, 1)) & 1431655765) AS sy
        |  FROM s3),
        |z AS (SELECT x, y, (sx | shiftleft(sy, 1)) div 4096 AS bucket
        |      FROM s4)
        |SELECT bucket, COUNT(*) AS n_rows,
        |  MIN(x) AS min_x, MAX(x) AS max_x,
        |  MIN(y) AS min_y, MAX(y) AS max_y
        |FROM z GROUP BY bucket ORDER BY bucket""".stripMargin)
    assert(zsql == viaDf("q_zorder_layout"))
  }

  test("registerTables exposes every engine table to SQL text") {
    GraftSql.registerTables(spark, sf)
    Tables.names.foreach { n =>
      assert(spark.sql(s"SELECT * FROM $n LIMIT 1").collect().length == 1,
        s"table $n not reachable from SQL")
    }
  }
}
