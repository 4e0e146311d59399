package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression pins (round 7, VERDICT #6): PLANS.md was
  * hand-audited each round; this automates the watch. Every declared
  * batch query's pre-AQE physical plan is canonicalized (exprIds
  * normalized by Catalyst, volatile artifacts scrubbed below) and
  * digested; the digests live in PLAN_DIGESTS.tsv at the repo root and
  * this spec fails on any unexplained drift — a silently changed join
  * strategy, a window that lost its chunked partition spec, a filter
  * that stopped pushing down.
  *
  * On INTENTIONAL plan changes, regenerate the record and re-audit the
  * diff:
  *   GRAFT_UPDATE_PLAN_DIGESTS=1 sbt "testOnly graft.PlanDigestSpec"
  */
class PlanDigestSpec extends AnyFunSuite {
  import TestSpark._

  private val recordPath = "PLAN_DIGESTS.tsv"

  /** Volatile artifacts that vary across runs/hosts without the plan
    * SHAPE changing: object identity hashes, content-addressed cache
    * tags (fixture mtime-derived), temp/staging paths, AQE plan ids. */
  private def scrub(plan: String): String = plan
    .replaceAll("@[0-9a-fA-F]+", "@X")
    .replaceAll("\\$\\$Lambda\\$\\d+/0x[0-9a-f]+", "\\$\\$Lambda\\$X")
    .replaceAll("graft_(bkt|mhidx|part|buckets|src)_[0-9a-f]+", "graft_$1_TAG")
    .replaceAll("plan_id=\\d+", "plan_id=X")
    // canonicalization normalizes attribute exprIds but NOT subquery
    // ids, lambda-variable ids/names, or exprIds inside an
    // InMemoryRelation's captured cached plan — all follow the
    // session's global counters (i.e. whatever ran before). Normalize
    // every #id and lambda ordinal.
    .replaceAll("#\\d+", "#X")
    .replaceAll("lambda x_\\d+", "lambda x_N")
    .replaceAll("file:[^\\s,\\]\\)]*", "file:X")
    .replaceAll("Location [A-Za-z]+\\([^\\)]*\\)\\[[^\\]]*\\]", "Location X")

  /** Conjunct order inside a Filter condition is not canonicalized by
    * Catalyst (ExpressionSet iteration follows exprId hashes, which
    * follow the session's global counter) — A AND B == B AND A, so sort
    * the top-level conjuncts of every Filter line before hashing. */
  private def sortTopAnds(cond: String): String = {
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    var depth = 0; var start = 0; var i = 0
    while (i < cond.length) {
      val c = cond.charAt(i)
      if (c == '(') depth += 1 else if (c == ')') depth -= 1
      if (depth == 0 && cond.startsWith(" AND ", i)) {
        parts += cond.substring(start, i); start = i + 5; i += 4
      }
      i += 1
    }
    parts += cond.substring(start)
    parts.sorted.mkString(" AND ")
  }

  private val filterLine = "^(.*?Filter )\\((.*)\\)\\s*$".r

  /** Split at top-level ", " (outside any parens). */
  private def splitTopCommas(s: String): Seq[String] = {
    val parts = scala.collection.mutable.ArrayBuffer[String]()
    var depth = 0; var start = 0; var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '(') depth += 1 else if (c == ')') depth -= 1
      if (depth == 0 && s.startsWith(", ", i)) {
        parts += s.substring(start, i); start = i + 2; i += 1
      }
      i += 1
    }
    parts += s.substring(start)
    parts.toSeq
  }

  /** Spark 4 canonicalizes commutative conjunctions/disjunctions into
    * `multicommutativeop(args..., class, None)` whose operand ORDER
    * follows ExpressionSet hash iteration — unstable across sessions.
    * `least(`/`greatest(` children are commutative too and Canonicalize
    * reorders them BY HASHCODE — and when a child is a
    * MultiCommutativeOp, that hashCode includes a captured
    * `java.lang.Class` object whose IDENTITY hash differs per JVM fork,
    * so the child order is a per-fork coin flip (first seen round 13:
    * the PassJoin probe's `least(M - li, pi + 2)` flipped between a
    * standalone digest run and the full suite). Sort every such operand
    * list (innermost first) — Spark already declared these orders
    * meaningless by reordering them, so sorting loses no drift
    * sensitivity. */
  private val commutativeCalls =
    Seq("multicommutativeop(", "least(", "greatest(")
  private def normMulti(s: String): String = {
    val hits = commutativeCalls.map(t => (s.indexOf(t), t)).filter(_._1 >= 0)
    if (hits.isEmpty) return s
    val (idx, token) = hits.minBy(_._1)
    val open = idx + token.length - 1
    var depth = 0; var end = -1; var j = open
    while (j < s.length && end < 0) {
      val c = s.charAt(j)
      if (c == '(') depth += 1
      else if (c == ')') { depth -= 1; if (depth == 0) end = j }
      j += 1
    }
    if (end < 0) return s
    val inner = normMulti(s.substring(open + 1, end))
    s.substring(0, open + 1) + splitTopCommas(inner).sorted.mkString(", ") +
      normMulti(s.substring(end))
  }

  /** RewriteDistinctAggregates assigns distinct-group ordinals and
    * Expand slots by hash-set iteration (follows the JVM-global exprId
    * counter), so a multi-distinct aggregate's HashAggregate/Expand
    * lines are semantically-identical permutations across sessions.
    * Slot assignment can't be un-permuted textually, so those lines are
    * digested as a sorted token BAG — still sensitive to a changed
    * function, key, or type, insensitive to slot order. */
  private val bagNodes = "(HashAggregate|Expand)".r
  /** Shared bag-normalizer: keep everything up to the first match of
    * `node` verbatim, token-bag (split + sort) the rest of the line. */
  private def bagAfter(node: scala.util.matching.Regex, l: String): String =
    node.findFirstMatchIn(l).map { m =>
      val toks = l.substring(m.end).split("[^A-Za-z0-9_#.]+")
        .filter(_.nonEmpty).sorted
      l.substring(0, m.end) + "{" + toks.mkString(" ") + "}"
    }.getOrElse(l)
  private def tokenBag(l: String): String = bagAfter(bagNodes, l)

  /** A line carrying a `multicommutativeop(` is one Canonicalize has
    * already scrambled by unstable hashCodes at EVERY level — operand
    * lists, least/greatest child order, and even the orientation of a
    * comparison around it (`A <= B` vs `B >= A` flips per JVM fork via
    * the captured Class object's identity hash). No textual sort can
    * reconstruct one orientation, so these lines get the same treatment
    * as HashAggregate/Expand: a sorted token BAG — still sensitive to a
    * changed function, column, or constant; insensitive to the
    * hash-driven permutations. */
  private val anyNode = "[A-Za-z]+".r
  private def bagWholeLine(l: String): String = bagAfter(anyNode, l)

  private def normalizeLine(l: String): String = {
    val n = normMulti(l)
    if (n.contains("multicommutativeop(")) bagWholeLine(n)
    else n match {
      case filterLine(pre, cond) => pre + "(" + sortTopAnds(cond) + ")"
      case other => tokenBag(other)
    }
  }

  private def digest(name: String): String = {
    // cached frames left by OTHER suites (or by previously digested
    // queries) would substitute InMemoryRelation into matching subplans
    // and make the digest depend on what ran before — always start cold
    spark.sharedState.cacheManager.clearCache()
    // default toString truncates wide plans at 25 fields ("... N more
    // fields"), which would blind the pin to drift inside the elision
    spark.conf.set("spark.sql.debug.maxToStringFields", "4000")
    val plan = SparkEntry.queries(name)(spark, sf)
      .queryExecution.sparkPlan.canonicalized.toString
    val canon = scrub(plan).linesIterator.map(normalizeLine).mkString("\n")
    // debug aid for chasing an unstable digest: dump the exact hashed text
    sys.env.get("GRAFT_DUMP_PLANS").foreach { dir =>
      val d = new java.io.File(dir); d.mkdirs()
      Files.write(Paths.get(s"$dir/$name.txt"), canon.getBytes("UTF-8"))
    }
    java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 16)
  }

  test("canonical plan digests match the committed record") {
    // Plan inspection only — keep sketch pipelines un-materialized so
    // the digested plan is the real pipeline, not a LogicalRDD stub.
    // NB digest() clears the CacheManager before every build — but a
    // builder that persists mid-build UNGATED by skipEagerMaterialize
    // still splices an InMemoryRelation (with session-history-dependent
    // captured text) into its own digested plan: q_dedup_report's bare
    // sized.persist did exactly that and its digest drifted between the
    // standalone and full-suite runs until it moved to persistEager
    // (round 15). Keep builder-side persists gated.
    spark.conf.set("spark.graft.skipEagerMaterialize", "true")
    try {
      val names = SparkEntry.queries.keys.toSeq.sorted
      val digests = names.map(n => n -> digest(n))
      if (sys.env.contains("GRAFT_UPDATE_PLAN_DIGESTS")) {
        val body = digests.map { case (n, d) => s"$n\t$d" }.mkString("\n")
        Files.write(Paths.get(recordPath), (body + "\n").getBytes("UTF-8"))
        info(s"regenerated $recordPath with ${digests.size} entries")
      } else {
        assert(Files.exists(Paths.get(recordPath)),
          s"$recordPath missing — regenerate with " +
            "GRAFT_UPDATE_PLAN_DIGESTS=1 sbt 'testOnly graft.PlanDigestSpec'")
        val recorded = scala.io.Source.fromFile(recordPath).getLines()
          .filter(_.nonEmpty).map { l =>
            val Array(n, d) = l.split("\t"); n -> d
          }.toMap
        val drifted = digests.filter { case (n, d) =>
          recorded.get(n).exists(_ != d)
        }
        val missing = digests.filterNot { case (n, _) => recorded.contains(n) }
        val stale = recorded.keySet -- names.toSet
        assert(drifted.isEmpty && missing.isEmpty && stale.isEmpty,
          s"plan digest drift — audit the plan change, then regenerate " +
            s"the record (GRAFT_UPDATE_PLAN_DIGESTS=1).\n" +
            s"  drifted: ${drifted.map(_._1).mkString(", ")}\n" +
            s"  unrecorded new queries: ${missing.map(_._1).mkString(", ")}\n" +
            s"  stale records: ${stale.mkString(", ")}")
      }
    } finally {
      spark.conf.set("spark.graft.skipEagerMaterialize", "false")
      spark.sharedState.cacheManager.clearCache()
    }
  }

  test("plan digests are self-consistent within a session") {
    // guards the pin itself against flaky inputs (object hashes, cache
    // tags) — a digest that varies between two builds of the same query
    // would make the record test meaningless noise
    spark.conf.set("spark.graft.skipEagerMaterialize", "true")
    try {
      val probe = Seq("q_agg_group", "q_join_bucketed", "q_dedup_minhash",
        "q_ks_drift", "q_pack_sequences", "q_dedup_incremental",
        // the round-15 drifter: composes every sketch family and once
        // persisted mid-build ungated (see the record test's NB)
        "q_dedup_report")
      probe.foreach { n =>
        assert(digest(n) == digest(n), s"$n digest unstable across builds")
      }
    } finally {
      spark.conf.set("spark.graft.skipEagerMaterialize", "false")
      spark.sharedState.cacheManager.clearCache()
    }
  }
}
