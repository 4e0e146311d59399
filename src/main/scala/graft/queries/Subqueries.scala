package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Subquery / CTE surface via `spark.sql` — exercises Catalyst's
  * decorrelation rewrites (RewriteCorrelatedScalarSubquery,
  * RewritePredicateSubquery) that the DataFrame API paths don't reach
  * (SURVEY §4.2). The SQL text is the ANSI subset DuckDB also runs, so
  * each oracle is the same query.
  *
  * Scale notes: Catalyst decorrelates the scalar subquery into an
  * aggregate + equi-join (one shuffle on the correlation key) and IN /
  * NOT IN into semi/anti joins — never a per-row nested loop.
  */
object Subqueries {

  private def sql(s: SparkSession, d: String, tables: Seq[String],
    text: String): DataFrame = {
    tables.foreach(t => Tables(s, d, t).createOrReplaceTempView(t))
    s.sql(text)
  }

  private val scalarSql =
    """SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
      |FROM orders o
      |WHERE o.o_totalprice > 2 * (SELECT AVG(o2.o_totalprice)
      |                            FROM orders o2
      |                            WHERE o2.o_custkey = o.o_custkey)
      |ORDER BY o.o_orderkey""".stripMargin

  private val inSql =
    """SELECT c_custkey, c_name
      |FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders
      |                    WHERE o_totalprice > 400000)
      |  AND c_custkey NOT IN (SELECT o_custkey FROM orders
      |                        WHERE o_orderstatus = 'P'
      |                          AND o_totalprice < 50000)
      |ORDER BY c_custkey""".stripMargin

  private val cteSql =
    """WITH big AS (
      |  SELECT o_custkey, COUNT(*) AS n_big
      |  FROM orders WHERE o_totalprice > 300000
      |  GROUP BY o_custkey),
      |seg AS (
      |  SELECT c_custkey, c_mktsegment FROM customer)
      |SELECT seg.c_mktsegment, COUNT(*) AS n_cust,
      |  CAST(SUM(big.n_big) AS BIGINT) AS total_big
      |FROM big JOIN seg ON big.o_custkey = seg.c_custkey
      |GROUP BY seg.c_mktsegment
      |ORDER BY seg.c_mktsegment""".stripMargin

  val q: Map[String, Q] = Map(
    "q_subquery_scalar" -> ((s, d) =>
      sql(s, d, Seq("orders"), scalarSql)),
    "q_subquery_in" -> ((s, d) =>
      sql(s, d, Seq("customer", "orders"), inSql)),
    "q_cte" -> ((s, d) =>
      sql(s, d, Seq("customer", "orders"), cteSql)),
  )

  val oracle: Map[String, String] = Map(
    "q_subquery_scalar" -> scalarSql,
    "q_subquery_in" -> inSql,
    "q_cte" -> cteSql,
  )
}
