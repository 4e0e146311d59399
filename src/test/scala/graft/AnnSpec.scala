package graft

import graft.queries.AnnOps
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the approximate dedup/ANN family that the oracle can't
  * express. */
class AnnSpec extends AnyFunSuite {
  import TestSpark._

  test("q_ann_ivf with nprobe = numCells degrades to exact brute force") {
    val exhaustive = AnnOps.ivfKnn(spark, sf, nprobe = AnnOps.numCells)
      .select("probe_id", "vec_id", "cos_sim")
    val brute = SparkEntry.queries("q_knn_pergroup")(spark, sf)
    assert(exhaustive.collect().map(_.toString).toSeq ==
      brute.collect().map(_.toString).toSeq)
  }

  test("q_ann_ivf prunes: visited candidates are a strict corpus subset") {
    // nprobe=2 of 8 cells must scan well under the full corpus per probe
    val perProbeScan = AnnOps.ivfKnn(spark, sf, nprobe = 2)
    val rows = perProbeScan.collect()
    assert(rows.nonEmpty)
    // every probe still returns its full k (cells are dense enough)
    val byProbe = rows.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    assert(byProbe.values.forall(_ == 5), s"per-probe counts: $byProbe")
    // determinism: same result on a second run
    val again = AnnOps.ivfKnn(spark, sf, nprobe = 2).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q_ann_ivf cell assignment is stateless (no pre-join Exchange 8x)") {
    // assignment must be a projection over driver-literal centroids — the
    // old crossJoin(8 centroids) + window row_number shuffled 8x the
    // corpus; the only exchanges allowed are the cell equi-join's own and
    // the final per-probe top-k window.
    val plan = AnnOps.ivfKnn(spark, sf, nprobe = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 3,
      s"too many hash exchanges ($exchanges) — assignment shuffles?\n$plan")
  }

  test("minhash candidates achieve full recall on planted near-dups") {
    val lsh = SparkEntry.queries("q_dedup_minhash")(spark, sf)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = SparkEntry.queries("q_dedup_ngram_jaccard")(spark, sf)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact,
      s"minhash missed ${exact -- lsh}, spurious ${lsh -- exact}")
  }

  test("simhash finds the low-hamming planted near-dup pairs") {
    val pairs = SparkEntry.queries("q_dedup_simhash")(spark, sf).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall(_.getLong(2) <= 3))
  }
}
