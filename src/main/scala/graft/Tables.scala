package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loader (see TESTDATA.md / FIXTURES.md).
  *
  * At 100 TB these would be partitioned/bucketed catalog tables; here they
  * are single parquet files per scale factor. Everything downstream reads
  * through this one chokepoint so a real deployment only swaps this object.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
