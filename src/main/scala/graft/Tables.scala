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
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects
      // outright. Read it as raw nanos and truncate to Spark's native
      // microsecond timestamp with INTEGER division — double division
      // would lose precision above 2^53 (~epoch-nanos scale).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts div 1000)"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
}
