package graft

import java.io.File

import graft.queries.FixtureLayout
import org.scalatest.funsuite.AnyFunSuite

/** FixtureLayout contract (round-6 ADVICE, medium): physical fixture
  * copies in the shared tmpdir must be content-addressed (regenerating a
  * fixture in place must not serve the stale copy) and publish
  * atomically (concurrent JVMs/sessions must never read a half-written
  * overwrite, and concurrent creators must all succeed).
  */
class FixtureLayoutSpec extends AnyFunSuite {
  import TestSpark._

  private def deleteRec(f: File): Unit = {
    if (f.isDirectory) { val cs = f.listFiles(); if (cs != null) cs.foreach(deleteRec) }
    f.delete(); ()
  }

  test("contentTag tracks file identity (size, mtime), not just path") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tag").toFile
    try {
      val f = new File(dir, "events.parquet")
      java.nio.file.Files.write(f.toPath, "v1-payload".getBytes)
      assert(f.setLastModified(1000000000000L))
      val t1 = FixtureLayout.contentTag(dir.getAbsolutePath, Seq("events"))
      // unchanged file → same tag (reruns hit the cache)
      assert(t1 == FixtureLayout.contentTag(dir.getAbsolutePath, Seq("events")))
      // regenerated in place with different size → new tag
      java.nio.file.Files.write(f.toPath, "v2-payload-longer".getBytes)
      assert(f.setLastModified(1000000000000L))
      val t2 = FixtureLayout.contentTag(dir.getAbsolutePath, Seq("events"))
      assert(t2 != t1, "size change must change the tag")
      // regenerated with same size but new mtime → new tag
      assert(f.setLastModified(2000000000000L))
      val t3 = FixtureLayout.contentTag(dir.getAbsolutePath, Seq("events"))
      assert(t3 != t2, "mtime change must change the tag")
    } finally deleteRec(dir)
  }

  test("contentTag samples content: same-size same-mtime byte flip changes tag") {
    // Round-8 ADVICE: (name, size, mtime) alone misses an in-place
    // regeneration within the filesystem's mtime granularity. The tag now
    // samples first+last 4KiB, so a byte flip with identical size AND
    // mtime must still re-address the cache.
    val dir = java.nio.file.Files.createTempDirectory("graft_tag8").toFile
    try {
      val f = new File(dir, "events.parquet")
      java.nio.file.Files.write(f.toPath, "payload-AAAA".getBytes)
      assert(f.setLastModified(1000000000000L))
      val t1 = FixtureLayout.contentTag(dir.getAbsolutePath, Seq("events"))
      java.nio.file.Files.write(f.toPath, "payload-BBBB".getBytes)
      assert(f.setLastModified(1000000000000L)) // same size, same mtime
      val t2 = FixtureLayout.contentTag(dir.getAbsolutePath, Seq("events"))
      assert(t2 != t1, "byte flip at same size+mtime must change the tag")
      // a file larger than the 8KiB sample window: flip a TAIL byte
      // (parquet puts row-group stats in the footer, so real data changes
      // perturb the tail)
      val big = ("x" * 20000).getBytes
      java.nio.file.Files.write(f.toPath, big)
      assert(f.setLastModified(1000000000000L))
      val t3 = FixtureLayout.contentTag(dir.getAbsolutePath, Seq("events"))
      big(big.length - 10) = 'y'
      java.nio.file.Files.write(f.toPath, big)
      assert(f.setLastModified(1000000000000L))
      val t4 = FixtureLayout.contentTag(dir.getAbsolutePath, Seq("events"))
      assert(t4 != t3, "tail byte flip in a large file must change the tag")
    } finally deleteRec(dir)
  }

  test("contentTag fails fast on a missing fixture table") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tag9").toFile
    try {
      val e = intercept[IllegalArgumentException] {
        FixtureLayout.contentTag(dir.getAbsolutePath, Seq("no_such_table"))
      }
      assert(e.getMessage.contains("no_such_table"))
    } finally deleteRec(dir)
  }

  test("ensureDir: concurrent publishers all succeed, no staging debris") {
    val base = java.nio.file.Files.createTempDirectory("graft_pub").toFile
    try {
      val dest = new File(base, "copy").getAbsolutePath
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      val barrier = new java.util.concurrent.CyclicBarrier(4)
      val futures = (1 to 4).map { i =>
        pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String = {
            barrier.await() // maximize overlap of the check-write-rename
            FixtureLayout.ensureDir(dest) { staging =>
              val d = new File(staging)
              d.mkdirs()
              // deterministic content regardless of which writer wins
              java.nio.file.Files.write(
                new File(d, "part-0").toPath, "payload".getBytes)
            }
          }
        })
      }
      val results = futures.map(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
      pool.shutdown()
      assert(results.forall(_ == dest))
      assert(new String(java.nio.file.Files.readAllBytes(
        new File(dest, "part-0").toPath)) == "payload")
      val leftovers = base.listFiles().map(_.getName).filterNot(_ == "copy")
      assert(leftovers.isEmpty,
        s"losing publishers must clean their staging dirs: ${leftovers.toSeq}")
    } finally deleteRec(base)
  }

  test("q_join_bucketed: concurrent sessions on one fixture both succeed and agree") {
    // Reset to the cold path: drop the catalog entries and the published
    // layout, then race two sessions through ensureBucketedTable — the
    // exact two-JVMs-one-tmpdir scenario, minus the process boundary.
    val tag = FixtureLayout.contentTag(sf, Seq("orders", "customer"))
    Seq("orders", "customer").foreach(n =>
      spark.sql(s"DROP TABLE IF EXISTS graft_bkt_${tag}_$n"))
    deleteRec(new File(
      s"${System.getProperty("java.io.tmpdir")}/graft_buckets_$tag"))
    val s2 = spark.newSession()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    val futures = Seq(spark, s2).map { sess =>
      pool.submit(new java.util.concurrent.Callable[Seq[String]] {
        def call(): Seq[String] = {
          barrier.await()
          SparkEntry.queries("q_join_bucketed")(sess, sf)
            .collect().map(_.toString).toSeq
        }
      })
    }
    val Seq(a, b) = futures.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()
    assert(a.nonEmpty)
    assert(a == b, "racing sessions must see identical bucketed results")
  }
}
