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

  // ---- q_source_* contract keys (round 7): the format readers as
  // first-class oracle-checked operators. Pins here cover what the
  // DuckDB oracle cannot see: WHICH datasource the plan scanned and
  // whether the ORC filter actually pushed down.

  test("q_source_csv scans the csv datasource and matches parquet-direct") {
    val df = SparkEntry.queries("q_source_csv")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Scan csv"), s"csv scan missing in:\n$plan")
    // Same aggregate straight off the canonical parquet: equality proves
    // the text round-trip (not just that the reader parsed something).
    val direct = Tables(spark, sf, "orders")
      .groupBy("o_orderpriority", "o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        graft.queries.Det.dsum(col("o_totalprice")).as("sum_price"),
        date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("first_day"),
        date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("last_day"))
      .orderBy("o_orderpriority", "o_orderstatus")
    assert(df.collect().map(_.toString).toSeq ==
      direct.collect().map(_.toString).toSeq)
  }

  test("q_source_ndjson scans the json datasource and keeps microseconds") {
    val df = SparkEntry.queries("q_source_ndjson")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Scan json"), s"json scan missing in:\n$plan")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // events.ts is micro-precision: the default text timestampFormat
    // would truncate to millis and max_ts would end in "000" for every
    // group only by a 1-in-1000 fluke per group; require at least one
    // group whose max_ts carries live sub-millisecond digits.
    val maxTs = rows.map(_.getAs[String]("max_ts"))
    assert(maxTs.exists(t => !t.endsWith("000")),
      s"all max_ts millisecond-truncated: ${maxTs.mkString(", ")}")
  }

  test("q_export_shards writes one file per shard dir and loses no rows") {
    val df = SparkEntry.queries("q_export_shards")(spark, sf)
    val rows = df.collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum ==
      Tables(spark, sf, "documents").count())
    // the published layout: one dir per shard under the COMMITTED version
    // (resolved via the manifest, like any reader), ONE data file in
    // each — the keyed pre-write repartition is what prevents the
    // |tasks|x|shards| small-file spray
    val tag = graft.queries.FixtureLayout.contentTag(sf, Seq("documents"))
    val (vroot, files) = graft.queries.FixtureLayout.manifestedFiles(
      s"${System.getProperty("java.io.tmpdir")}/graft_src_$tag/documents_shards")
    val shardDirs = new java.io.File(vroot).listFiles()
      .filter(_.isDirectory).filter(_.getName.startsWith("shard="))
    assert(shardDirs.length == 16, s"expected 16 shard dirs in $vroot")
    shardDirs.foreach { sd =>
      val dataFiles = sd.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(dataFiles.length == 1,
        s"${sd.getName}: ${dataFiles.length} data files (want 1)")
    }
    // every manifested file exists with its recorded size (validated by
    // manifestedFiles) and every data file read came from the manifest
    assert(files.forall(_.startsWith(vroot)))
  }

  test("export manifest commit: a writer crash mid-export is invisible") {
    import graft.queries.FixtureLayout
    val dest = java.nio.file.Files
      .createTempDirectory("graft-manifest").toString + "/exp"
    // first export commits fine: two "shard" files
    FixtureLayout.publishManifested(dest) { staging =>
      val d = new java.io.File(staging); d.mkdirs()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$staging/a.parquet"), "A1".getBytes)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$staging/b.parquet"), "B1".getBytes)
    }
    val (v1, files1) = FixtureLayout.manifestedFiles(dest)
    assert(files1.size == 2)
    // second export dies between shard files — BEFORE the commit point
    intercept[RuntimeException] {
      FixtureLayout.publishManifested(dest) { staging =>
        val d = new java.io.File(staging); d.mkdirs()
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$staging/a.parquet"), "A2-new".getBytes)
        throw new RuntimeException("writer killed mid-export")
      }
    }
    // readers still see the OLD consistent view: same version, same
    // files, the half-written version dir is unreferenced garbage
    val (v2, files2) = FixtureLayout.manifestedFiles(dest)
    assert(v2 == v1 && files2 == files1,
      s"crashed export leaked into the committed view: $v1 -> $v2")
    // and a successful re-publish swaps the pointer atomically
    FixtureLayout.publishManifested(dest) { staging =>
      val d = new java.io.File(staging); d.mkdirs()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$staging/a.parquet"), "A3".getBytes)
    }
    val (v3, files3) = FixtureLayout.manifestedFiles(dest)
    assert(v3 != v1 && files3.size == 1)
  }

  test("export vacuum deletes only unreferenced versions, readers unaffected") {
    import graft.queries.FixtureLayout
    val dest = java.nio.file.Files
      .createTempDirectory("graft-manifest").toString + "/exp"
    def publish(content: String): Unit =
      FixtureLayout.publishManifested(dest) { staging =>
        val d = new java.io.File(staging); d.mkdirs()
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$staging/a.parquet"), content.getBytes)
      }
    publish("V1")                      // superseded below
    intercept[RuntimeException] {      // crashed writer leaves a torn dir
      FixtureLayout.publishManifested(dest) { staging =>
        val d = new java.io.File(staging); d.mkdirs()
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$staging/a.parquet"), "TORN".getBytes)
        throw new RuntimeException("killed")
      }
    }
    publish("V3")                      // current
    val before = FixtureLayout.manifestedFiles(dest)
    val deleted = FixtureLayout.vacuumExport(dest)
    assert(deleted.size == 2, s"expected 2 stale versions, got $deleted")
    // the committed view is untouched and still fully readable
    val after = FixtureLayout.manifestedFiles(dest)
    assert(after == before, "vacuum changed the committed view")
    val left = new java.io.File(dest).listFiles()
      .filter(_.getName.startsWith("v-")).map(_.getName).toSeq
    assert(left == Seq(new java.io.File(after._1).getName),
      s"unexpected version dirs remain: $left")
  }

  test("export time travel: pinned versions readable until vacuumed, then loud") {
    import graft.queries.FixtureLayout
    val dest = java.nio.file.Files
      .createTempDirectory("graft-manifest").toString + "/exp"
    def publish(content: String): Unit =
      FixtureLayout.publishManifested(dest) { staging =>
        val d = new java.io.File(staging); d.mkdirs()
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$staging/a.parquet"), content.getBytes)
      }
    publish("V1"); publish("V2"); publish("V3")
    // history is sequential and complete
    val versions = FixtureLayout.listVersions(dest)
    assert(versions.map(_._1) == Seq(1, 2, 3), s"history: $versions")
    // a crashed writer never enters history
    intercept[RuntimeException] {
      FixtureLayout.publishManifested(dest) { staging =>
        val d = new java.io.File(staging); d.mkdirs()
        throw new RuntimeException("killed")
      }
    }
    assert(FixtureLayout.listVersions(dest).map(_._1) == Seq(1, 2, 3))
    // while MANIFEST points at v3, a reader can still pin v1 and sees
    // EXACTLY the old bytes
    def bytesAt(seq: Int): String = {
      val (_, fs) = FixtureLayout.manifestedFilesAt(dest, seq)
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(fs.head)), "UTF-8")
    }
    assert(bytesAt(1) == "V1" && bytesAt(2) == "V2" && bytesAt(3) == "V3")
    // current-pointer read agrees with the newest history entry
    assert(FixtureLayout.manifestedFiles(dest)._2 ==
      FixtureLayout.manifestedFilesAt(dest, 3)._2)
    // vacuum expires superseded version DIRS but keeps the history log:
    // time travel past the horizon fails loudly naming the vacuum
    FixtureLayout.vacuumExport(dest)
    assert(FixtureLayout.listVersions(dest).map(_._1) == Seq(1, 2, 3))
    val e = intercept[IllegalStateException] { bytesAt(1) }
    assert(e.getMessage.contains("vacuum"))
    assert(bytesAt(3) == "V3", "current version must survive vacuum")
    // unknown versions are loud, listing the known ones
    val e2 = intercept[IllegalStateException] {
      FixtureLayout.manifestedFilesAt(dest, 9)
    }
    assert(e2.getMessage.contains("no committed version 9"))
  }

  test("export compaction: fewer files, same rows, old snapshot pinnable") {
    import graft.queries.FixtureLayout
    val dest = java.nio.file.Files
      .createTempDirectory("graft-compact").toString + "/exp"
    // a deliberately fragmented export: 8 small files
    FixtureLayout.publishManifested(dest) { staging =>
      Tables(spark, sf, "documents").select("doc_id", "source", "n_chars")
        .repartition(8).write.parquet(staging)
    }
    val before = FixtureLayout.manifestedFiles(dest)._2
      .filter(_.endsWith(".parquet"))
    assert(before.length == 8, s"expected 8 fragments: ${before.length}")
    def rowsOf(files: Seq[String]) =
      spark.read.parquet(files: _*).collect()
        .map(_.toString).sorted.toSeq
    val truth = rowsOf(before)
    // compact to 2 files — a NEW committed version, same rows
    val seq2 = FixtureLayout.compactExport(spark, dest, 2)
    assert(seq2 == 2)
    val after = FixtureLayout.manifestedFiles(dest)._2
      .filter(_.endsWith(".parquet"))
    assert(after.length == 2, s"compaction left ${after.length} files")
    assert(rowsOf(after) == truth, "compaction must not change content")
    // the pre-compaction snapshot is still pinnable (time travel)...
    assert(rowsOf(FixtureLayout.manifestedFilesAt(dest, 1)._2
      .filter(_.endsWith(".parquet"))) == truth)
    // ...until vacuum reclaims it; the compacted version survives
    FixtureLayout.vacuumExport(dest)
    intercept[IllegalStateException] {
      FixtureLayout.manifestedFilesAt(dest, 1)
    }
    assert(rowsOf(FixtureLayout.manifestedFiles(dest)._2
      .filter(_.endsWith(".parquet"))) == truth)
  }

  test("export manifest read side fails loudly on truncated files") {
    import graft.queries.FixtureLayout
    val dest = java.nio.file.Files
      .createTempDirectory("graft-manifest").toString + "/exp"
    FixtureLayout.publishManifested(dest) { staging =>
      val d = new java.io.File(staging); d.mkdirs()
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$staging/a.parquet"), "AAAA".getBytes)
    }
    val (vroot, files) = FixtureLayout.manifestedFiles(dest)
    // truncate the manifested file behind the manifest's back
    java.nio.file.Files.write(
      java.nio.file.Paths.get(files.head), "A".getBytes)
    val e = intercept[IllegalStateException] {
      FixtureLayout.manifestedFiles(dest)
    }
    assert(e.getMessage.contains("truncated"))
    // an unpublished dest (no manifest) is loud too, not an empty read
    val e2 = intercept[IllegalStateException] {
      FixtureLayout.manifestedFiles(dest + "-never-published")
    }
    assert(e2.getMessage.contains("no committed manifest"))
  }

  test("q_source_orc scans orc and pushes the ship-date filter down") {
    val df = SparkEntry.queries("q_source_orc")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Scan orc"), s"orc scan missing in:\n$plan")
    assert(plan.contains("PushedFilters: [") &&
      plan.contains("LessThan(l_shipdate"),
      s"ship-date predicate not pushed into the orc scan:\n$plan")
    assert(df.count() == 6)
  }
}
