package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Set-operation surface (SURVEY §2.3): UNION ALL / UNION / INTERSECT [ALL]
  * / EXCEPT [ALL], plus the unpivot reshape (§2.6).
  *
  * Scale notes: UNION ALL is a free concatenation (no shuffle). The distinct
  * set ops shuffle on the full row — at 100 TB you'd pre-project to the key
  * columns first (done here: single-column sets), which makes the shuffle
  * payload minimal.
  */
object SetOps {

  val q: Map[String, Q] = Map(
    "q_union_all" -> ((s, d) => {
      val o = Tables(s, d, "orders")
      o.filter(col("o_totalprice") < 250000)
        .select(col("o_orderkey"), col("o_totalprice"))
        .withColumn("src", lit("lo"))
        .unionByName(
          o.filter(col("o_totalprice") >= 200000)
            .select(col("o_orderkey"), col("o_totalprice"))
            .withColumn("src", lit("hi")))
        .orderBy("o_orderkey", "src")
    }),

    "q_union_distinct" -> ((s, d) => {
      val o = Tables(s, d, "orders")
      o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
        .union(o.filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey").as("k")))
        .distinct()
        .orderBy("k")
    }),

    "q_intersect" -> ((s, d) => {
      val o = Tables(s, d, "orders")
      o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
        .intersect(o.filter(col("o_orderstatus") === "P")
          .select(col("o_custkey").as("k")))
        .orderBy("k")
    }),

    "q_except" -> ((s, d) => {
      val o = Tables(s, d, "orders")
      o.select(col("o_custkey").as("k"))
        .except(o.filter(col("o_orderstatus") === "O")
          .select(col("o_custkey").as("k")))
        .orderBy("k")
    }),

    "q_intersect_all" -> ((s, d) => {
      val o = Tables(s, d, "orders")
      o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
        .intersectAll(o.filter(col("o_orderstatus") === "O")
          .select(col("o_custkey").as("k")))
        .orderBy("k")
    }),

    "q_except_all" -> ((s, d) => {
      val o = Tables(s, d, "orders")
      o.filter(col("o_orderstatus") === "F").select(col("o_custkey").as("k"))
        .exceptAll(o.filter(col("o_orderstatus") === "O")
          .select(col("o_custkey").as("k")))
        .orderBy("k")
    }),

    // Wide -> long reshape via the native unpivot operator (Expand under
    // the hood: row fan-out with NO shuffle, the transpose-free melt a
    // feature-extraction pipeline uses before a per-metric aggregate).
    "q_unpivot" -> ((s, d) =>
      Tables(s, d, "orders")
        .select(col("o_orderkey"),
          col("o_totalprice").cast("double").as("o_totalprice"),
          col("o_custkey").cast("double").as("o_custkey"),
          year(col("o_orderdate")).cast("double").as("o_year"))
        .unpivot(Array(col("o_orderkey")),
          Array(col("o_totalprice"), col("o_custkey"), col("o_year")),
          "metric", "value")
        .orderBy("o_orderkey", "metric")),
  )

  val oracle: Map[String, String] = Map(
    "q_union_all" ->
      """SELECT o_orderkey, o_totalprice, 'lo' AS src FROM orders WHERE o_totalprice < 250000
        |UNION ALL
        |SELECT o_orderkey, o_totalprice, 'hi' AS src FROM orders WHERE o_totalprice >= 200000
        |ORDER BY o_orderkey, src""".stripMargin,

    "q_union_distinct" ->
      """SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        |UNION
        |SELECT o_custkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY k""".stripMargin,

    "q_intersect" ->
      """SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY k""".stripMargin,

    "q_except" ->
      """SELECT o_custkey AS k FROM orders
        |EXCEPT
        |SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY k""".stripMargin,

    "q_intersect_all" ->
      """SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT ALL
        |SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY k""".stripMargin,

    "q_except_all" ->
      """SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT ALL
        |SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY k""".stripMargin,

    // UNION ALL of per-metric projections == unpivot, engine-portable
    "q_unpivot" ->
      """SELECT o_orderkey, 'o_totalprice' AS metric,
        |       CAST(o_totalprice AS DOUBLE) AS value FROM orders
        |UNION ALL
        |SELECT o_orderkey, 'o_custkey', CAST(o_custkey AS DOUBLE) FROM orders
        |UNION ALL
        |SELECT o_orderkey, 'o_year', CAST(year(o_orderdate) AS DOUBLE) FROM orders
        |ORDER BY o_orderkey, metric""".stripMargin,
  )
}
