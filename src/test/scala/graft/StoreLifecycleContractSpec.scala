package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The versioned-store LIFECYCLE contract written once and instantiated
  * per store (round-15 verdict #7 — the PublishTransportContract
  * pattern applied to storage): the export store
  * (queries.FixtureLayout's publishManifested / compactExport /
  * vacuumExport / manifestedFilesAt) and the affinity store
  * (streaming.Streams' epoch publish / compactAffinityStore /
  * vacuumAffinityStore / readAffinityIndexAt) grew PARALLEL
  * manifest/compact/vacuum/time-travel lifecycles with separately
  * written specs, so a change to one could silently drift from the
  * semantics the other still promises. This contract pins the shared
  * core for both:
  *
  *  1. committed increments change the served view; a writer crash
  *     before the commit point is invisible;
  *  2. replaying a committed increment is a no-op (exactly-once);
  *  3. compaction preserves the served view bit-for-bit and extends
  *     the version history;
  *  4. vacuum preserves the served view, and a pinned read past the
  *     vacuum horizon fails LOUDLY naming the vacuum — never partial
  *     data;
  *  5. replay stays a no-op even after vacuum reclaimed the bytes.
  *
  * The store-specific specs (SourcesSpec export legs, StreamingSpec
  * affinity legs) keep pinning their richer per-store behavior — racing
  * folds, cap tags, torn-file integrity; this spec is the part that
  * must never diverge BETWEEN them. */
abstract class StoreLifecycleContract extends AnyFunSuite {
  def legName: String

  trait Store {
    /** Commit increment #n (1-based, called in order). */
    def publish(n: Int): Unit
    /** Attempt a publish that dies BEFORE its commit point. */
    def publishCrashing(): Unit
    /** Re-deliver committed increment #n; must be a no-op. The
      * implementation fails the test if the write re-runs. */
    def replay(n: Int): Unit
    /** Normalized current committed view. */
    def served(): Seq[String]
    /** Fold/rewrite maintenance — must preserve served(). */
    def compact(): Unit
    /** Reclaim superseded bytes — must preserve served(). */
    def vacuum(): Unit
    /** Committed version history (seq numbers, oldest first). */
    def versions(): Seq[Int]
    /** Pinned (time-travel) view at version `seq`; collect-forcing. */
    def pinnedView(seq: Int): Seq[String]
  }
  def withStore(f: Store => Unit): Unit

  test(s"$legName store: increments commit; a crashed writer is invisible") {
    withStore { st =>
      st.publish(1)
      val v1 = st.served()
      st.publish(2)
      val v2 = st.served()
      assert(v2 != v1, "second committed increment did not change the view")
      st.publishCrashing()
      assert(st.served() == v2,
        "a crash BEFORE the commit point leaked into the served view")
    }
  }

  test(s"$legName store: replay of committed increments is a no-op") {
    withStore { st =>
      st.publish(1); st.publish(2)
      val v = st.served()
      st.replay(1); st.replay(2)
      assert(st.served() == v, "replay changed the served view")
    }
  }

  test(s"$legName store: compaction preserves the view and extends history") {
    withStore { st =>
      st.publish(1); st.publish(2)
      val pre = st.served()
      val histPre = st.versions()
      st.compact()
      assert(st.served() == pre, "compaction changed the served view")
      assert(st.versions().size > histPre.size,
        "compaction did not commit a new version")
      // a post-compaction increment lands on top of the fold
      st.publish(3)
      assert(st.served() != pre,
        "post-compaction increment did not reach the served view")
    }
  }

  test(s"$legName store: vacuum keeps the view; expired pins name the vacuum") {
    withStore { st =>
      st.publish(1); st.publish(2)
      st.compact()
      st.publish(3)
      st.compact()
      val v = st.served()
      val earliest = st.versions().head
      val latest = st.versions().last
      // pre-vacuum: both horizons resolvable, latest pin == live view
      assert(st.pinnedView(latest) == v,
        "latest pinned version disagrees with the live view")
      st.vacuum()
      assert(st.served() == v, "vacuum changed the served view")
      val e = intercept[IllegalStateException] { st.pinnedView(earliest) }
      assert(e.getMessage.toLowerCase.contains("vacuum"),
        s"expired pin must name the vacuum, got: ${e.getMessage}")
      assert(st.pinnedView(st.versions().last) == v,
        "current version must survive vacuum")
      // replay stays a no-op even after the bytes are gone
      st.replay(1)
      assert(st.served() == v, "post-vacuum replay changed the served view")
    }
  }
}

/** Export-store leg: FixtureLayout's manifested parquet export. The
  * export has REPLACE semantics — the served view is the current
  * committed version's rows. */
class ExportStoreLifecycleSpec extends StoreLifecycleContract {
  import TestSpark._
  import graft.queries.FixtureLayout

  override def legName = "export"

  override def withStore(f: Store => Unit): Unit = {
    val dest = Files.createTempDirectory("graft-lifecycle-exp")
      .toString + "/exp"
    f(new Store {
      private def rowsOf(files: Seq[String]): Seq[String] =
        spark.read.parquet(files.filter(_.endsWith(".parquet")): _*)
          .collect().map(_.toString).sorted.toSeq
      override def publish(n: Int): Unit = {
        import spark.implicits._
        FixtureLayout.publishManifested(dest) { staging =>
          Seq.tabulate(4)(i => (n.toLong, i.toLong))
            .toDF("inc", "row").repartition(2).write.parquet(staging)
        }
        ()
      }
      override def publishCrashing(): Unit =
        intercept[RuntimeException] {
          FixtureLayout.publishManifested(dest) { staging =>
            import spark.implicits._
            Seq((99L, 99L)).toDF("inc", "row").write.parquet(staging)
            throw new RuntimeException("writer killed before commit")
          }
        }
      override def replay(n: Int): Unit =
        // the export's idempotence wrapper: with a committed manifest
        // present the write must never re-run
        FixtureLayout.ensureManifested(dest) { st =>
          fail(s"replay of increment $n re-ran its write into $st")
        }
      override def served(): Seq[String] =
        rowsOf(FixtureLayout.manifestedFiles(dest)._2)
      override def compact(): Unit = {
        FixtureLayout.compactExport(spark, dest, 1); ()
      }
      override def vacuum(): Unit = { FixtureLayout.vacuumExport(dest); () }
      override def versions(): Seq[Int] =
        FixtureLayout.listVersions(dest).map(_._1)
      override def pinnedView(seq: Int): Seq[String] =
        rowsOf(FixtureLayout.manifestedFilesAt(dest, seq)._2)
    })
  }
}

/** Affinity-store leg: Streams' epoch-published pair index. The store
  * has MERGE semantics — the served view is the support-floored sum
  * over the folded base plus every committed epoch — and its version
  * history is the base-fold history (empty until the first
  * compaction), so version assertions only engage after compact(),
  * exactly as the contract sequences them. */
class AffinityStoreLifecycleSpec extends StoreLifecycleContract {
  import TestSpark._
  import graft.streaming.Streams

  override def legName = "affinity"

  override def withStore(f: Store => Unit): Unit = {
    import org.apache.spark.sql.types._
    val root = Files.createTempDirectory("graft-lifecycle-aff").toString
    val in = s"$root/in"; val store = s"$root/store"
    val ckpt = s"$root/ckpt"
    val schema = StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_partkey", LongType)))
    f(new Store {
      private def runBatch(): Unit = {
        val q = Streams.affinityUpdate(
          spark.readStream.schema(schema).json(in), store, ckpt)
        try q.processAllAvailable() finally q.stop()
      }
      override def publish(n: Int): Unit = {
        val lines = Seq(100L, 200L).map(pk =>
          s"""{"l_orderkey":$n,"l_partkey":$pk}""")
        val p = java.nio.file.Paths.get(in, s"d$n.ndjson")
        Files.createDirectories(p.getParent)
        Files.writeString(p, lines.mkString("\n"))
        runBatch()
      }
      override def publishCrashing(): Unit =
        // a maintainer dying mid-epoch: version dir written, no MANIFEST
        intercept[RuntimeException] {
          graft.queries.FixtureLayout.publishManifested(
            s"$store/epoch=999") { staging =>
            val d = new java.io.File(staging); d.mkdirs()
            Files.write(java.nio.file.Paths.get(s"$staging/part.parquet"),
              "torn".getBytes("UTF-8"))
            throw new RuntimeException("maintainer killed mid-epoch")
          }
        }
      override def replay(n: Int): Unit =
        // epoch ids are 0-based batch ids: increment #n = epoch n-1
        graft.queries.FixtureLayout.ensureManifested(
          s"$store/epoch=${n - 1}") { st =>
          fail(s"replayed committed epoch ${n - 1} re-ran its write into $st")
        }
      override def served(): Seq[String] =
        Streams.readAffinityIndex(spark, store)
          .collect().map(_.toString).sorted.toSeq
      override def compact(): Unit = {
        Streams.compactAffinityStore(spark, store); ()
      }
      override def vacuum(): Unit = {
        // both horizons, as a maintenance cron would: reclaim folded
        // epochs' data dirs AND superseded base versions
        Streams.vacuumAffinityStore(store)
        graft.queries.FixtureLayout.vacuumExport(s"$store/base")
        ()
      }
      override def versions(): Seq[Int] =
        Streams.listAffinityVersions(store).map(_._1)
      override def pinnedView(seq: Int): Seq[String] =
        Streams.readAffinityIndexAt(spark, store, seq)
          .collect().map(_.toString).sorted.toSeq
    })
  }
}
