package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Source/sink format coverage: the engine's tables round-trip through
  * every bundled columnar/row format with identical contents. Parquet is
  * the canonical storage; CSV/JSON are the interchange edges a pipeline
  * ingests from; ORC exercises the second columnar path. */
class FormatsSpec extends AnyFunSuite {
  import TestSpark._

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(col("n_nationkey").cast("long"), col("n_name"),
      col("n_regionkey").cast("long"))
      .collect().map(_.toString).sorted.toSeq

  test("nation round-trips identically through parquet, orc, csv, json") {
    val src = Tables(spark, sf, "nation")
    val golden = canon(src)
    assert(golden.size == 25)
    val root = Files.createTempDirectory("graft-formats")
    root.toFile.deleteOnExit()
    Seq("parquet", "orc", "json").foreach { fmt =>
      val out = s"$root/$fmt"
      src.write.format(fmt).save(out)
      assert(canon(spark.read.format(fmt).load(out)) == golden, fmt)
    }
    // CSV is schema-less on read: header + explicit schema
    val out = s"$root/csv"
    src.write.option("header", "true").csv(out)
    val back = spark.read.option("header", "true")
      .schema(src.schema).csv(out)
    assert(canon(back) == golden, "csv")
  }
}
