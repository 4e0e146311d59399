package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time one query N times at a given SF dir.
  * Usage: runMain graft.TimeOne <queryKey> [sfDir] [iters] */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val key = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // fixture parquet is one row group per table: enable the scan shim
      .config("spark.graft.singleRowgroupShim", "true")
      .config("spark.graft.allowQuadratic", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to iters).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(key)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[timeone] $key iter $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
