package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-salted equi join (SURVEY §4 scale checklist; AQE's skew-join
  * handles sort-merge cases at runtime, but salting is the portable,
  * plan-level fix when one build key dominates).
  *
  * Shape: salt the skewed (fact) side with a per-row salt in [0, S), clone
  * the dim side S ways, join on (key, salt) — the hot key's rows spread
  * over S tasks instead of one straggler. Salting is semantics-neutral:
  * the result set is EXACTLY the plain join's (the demo query's oracle is
  * the unsalted SQL join), only the physical distribution changes.
  */
object SaltedJoin {

  val numSalts = 8

  /** fact ⋈ dim on fact(factKey) == dim(dimKey), with fact-side salting.
    * The salt derives from per-row values (hash of the whole row id space
    * isn't needed — any per-row spread works; result is salt-invariant). */
  def join(fact: DataFrame, dim: DataFrame, factKey: String, dimKey: String,
    salts: Int = numSalts): DataFrame = {
    val salted = fact.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val cloned = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    salted.join(cloned,
      salted(factKey) === cloned(dimKey) &&
        salted("_salt") === cloned("_salt"))
      .drop("_salt")
  }

  val q: Map[String, Q] = Map(
    // Deliberately skewed key (l_orderkey % 10: ~60k rows per hot key at
    // sf0.1, all landing on 10 of 32 reduce tasks unsalted) joined to a
    // tiny dim through the salted path; aggregate proves result equality
    // with the plain-join oracle.
    "q_join_salted" -> ((s, d) => {
      val fact = Tables(s, d, "lineitem")
        .select((col("l_orderkey") % 10).as("bucket_id"),
          col("l_quantity"), col("l_extendedprice"))
      val dim = Tables(s, d, "region")
        .select(col("r_regionkey").cast("long").as("dim_bucket"),
          col("r_name"))
      join(fact, dim, "bucket_id", "dim_bucket")
        .groupBy("bucket_id", "r_name")
        .agg(count(lit(1)).as("n_rows"),
          Det.dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("bucket_id")
    }),
  )

  val oracle: Map[String, String] = Map(
    // The unsalted join: salting must not change the result set.
    "q_join_salted" ->
      """SELECT l_orderkey % 10 AS bucket_id, r_name, COUNT(*) AS n_rows,
        |  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(30,8))), 2) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |JOIN region ON l_orderkey % 10 = CAST(r_regionkey AS BIGINT)
        |GROUP BY bucket_id, r_name
        |ORDER BY bucket_id""".stripMargin,
  )
}
