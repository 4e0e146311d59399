package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL front door contract (round 11): contract queries re-written
  * as pure `spark.sql` TEXT — resolving tables via GraftSql's temp
  * views and native functions via the injected GraftExtensions — must
  * return row-identical results to their DataFrame originals. Three
  * queries chosen to cover the three resolution paths: plain relational
  * SQL (q_agg_group), an injected scalar kernel (cosine_sim in
  * q_similarity_cosine), and the engine's portable hash
  * (graft_h60 in q_sample_hash). */
class SqlFrontDoorSpec extends AnyFunSuite {
  import TestSpark._

  private def viaSql(text: String) =
    GraftSql.sql(spark, sf, text).collect().map(_.toString).toSeq

  private def viaDf(key: String) =
    SparkEntry.queries(key)(spark, sf).collect().map(_.toString).toSeq

  test("q_agg_group runs as pure SQL text with identical rows") {
    val dsum = (x: String) =>
      s"CAST(ROUND(SUM(CAST($x AS DECIMAL(30,8))), 2) AS DOUBLE)"
    val sqlRows = viaSql(
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsum("l_quantity")} AS sum_qty,
         |  ${dsum("l_extendedprice")} AS sum_base_price,
         |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
         |    * (CAST(1 AS DECIMAL(2,0)) - CAST(l_discount AS DECIMAL(6,4)))),
         |    2) AS DOUBLE) AS sum_disc_price,
         |  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
         |    * (CAST(1 AS DECIMAL(2,0)) - CAST(l_discount AS DECIMAL(6,4)))
         |    * (CAST(1 AS DECIMAL(2,0)) + CAST(l_tax AS DECIMAL(6,4)))),
         |    2) AS DOUBLE) AS sum_charge,
         |  ${dsum("l_quantity")} / COUNT(l_quantity) AS avg_qty,
         |  ${dsum("l_extendedprice")} / COUNT(l_extendedprice) AS avg_price,
         |  ${dsum("l_discount")} / COUNT(l_discount) AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP_NTZ'2000-12-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin)
    assert(sqlRows == viaDf("q_agg_group"))
  }

  test("q_similarity_cosine runs as pure SQL via the injected cosine_sim") {
    val sqlRows = viaSql(
      """WITH probe AS (
        |  SELECT embedding AS probe FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  ROUND(cosine_sim(e.embedding, p.probe), 6) AS cos_sim
        |FROM embeddings e CROSS JOIN probe p
        |ORDER BY cos_sim DESC, vec_id ASC
        |LIMIT 20""".stripMargin)
    assert(sqlRows == viaDf("q_similarity_cosine"))
  }

  test("q_sample_hash runs as pure SQL via the injected graft_h60") {
    val sqlRows = viaSql(
      """SELECT doc_id, lang, source, n_chars
        |FROM documents
        |WHERE pmod(graft_h60(CAST(doc_id AS STRING)), 100) < 10
        |ORDER BY doc_id""".stripMargin)
    assert(sqlRows == viaDf("q_sample_hash"))
  }

  test("round-11 operators run as pure SQL text (k-anonymity, z-order)") {
    // k-anonymity: plain relational SQL (Spark dialect: div for the
    // positive-shifted cents band)
    val kanon = viaSql(
      """WITH b AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    (cast(round(c_acctbal * 100) as bigint) + 100000) div 100000
        |      AS band
        |  FROM customer)
        |SELECT c_nationkey, c_mktsegment,
        |  COUNT(*) AS n,
        |  CAST(COUNT(DISTINCT band) AS BIGINT) AS n_sensitive,
        |  round(1.0D / COUNT(*), 6) AS reident_risk,
        |  COUNT(*) >= 5 AS meets_k,
        |  COUNT(DISTINCT band) >= 3 AS meets_l
        |FROM b
        |GROUP BY c_nationkey, c_mktsegment
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin)
    assert(kanon == viaDf("q_k_anonymity"))
    // z-order: the Morton spread as stepwise SQL bit expressions
    val zsql = viaSql(
      """WITH xy AS (
        |  SELECT pmod(l_partkey, 4096) AS x, pmod(l_suppkey, 4096) AS y
        |  FROM lineitem),
        |s1 AS (
        |  SELECT x, y,
        |    ((x | shiftleft(x, 8)) & 16711935) AS sx,
        |    ((y | shiftleft(y, 8)) & 16711935) AS sy
        |  FROM xy),
        |s2 AS (
        |  SELECT x, y,
        |    ((sx | shiftleft(sx, 4)) & 252645135) AS sx,
        |    ((sy | shiftleft(sy, 4)) & 252645135) AS sy
        |  FROM s1),
        |s3 AS (
        |  SELECT x, y,
        |    ((sx | shiftleft(sx, 2)) & 858993459) AS sx,
        |    ((sy | shiftleft(sy, 2)) & 858993459) AS sy
        |  FROM s2),
        |s4 AS (
        |  SELECT x, y,
        |    ((sx | shiftleft(sx, 1)) & 1431655765) AS sx,
        |    ((sy | shiftleft(sy, 1)) & 1431655765) AS sy
        |  FROM s3),
        |z AS (SELECT x, y, (sx | shiftleft(sy, 1)) div 4096 AS bucket
        |      FROM s4)
        |SELECT bucket, COUNT(*) AS n_rows,
        |  MIN(x) AS min_x, MAX(x) AS max_x,
        |  MIN(y) AS min_y, MAX(y) AS max_y
        |FROM z GROUP BY bucket ORDER BY bucket""".stripMargin)
    assert(zsql == viaDf("q_zorder_layout"))
  }

  // ── Family completeness sweep (round-13 verdict #5) ────────────────
  // A migrating user's first question is whether the WHOLE surface is
  // reachable from SQL text. One representative key per operator family
  // runs as pure `spark.sql` + GraftExtensions and must be row-identical
  // to its DataFrame original. Together with the standalone legs above
  // (relational: q_agg_group; ANN serving: q_similarity_cosine via the
  // injected cosine_sim; sampling: q_sample_hash via graft_h60;
  // curation-audit/layout: q_k_anonymity + q_zorder_layout), every
  // family of SURVEY.md §2 has a SQL-front-door proof.
  test("family sweep: one representative key per family runs as pure SQL text") {
    val sweep: Seq[(String, String, String)] = Seq(
      ("joins", "q_join_anti",
        """SELECT c_custkey, c_name, c_acctbal
          |FROM customer
          |LEFT ANTI JOIN (SELECT o_custkey FROM orders
          |                WHERE o_totalprice > 400000) o
          |  ON c_custkey = o.o_custkey
          |ORDER BY c_custkey""".stripMargin),
      ("windows", "q_win_lag_lead",
        """SELECT event_id, user_id,
          |  date_format(ts, 'yyyy-MM-dd HH:mm:ss.SSSSSS') AS ts_s, value,
          |  lag(value, 1, -1.0) OVER
          |    (PARTITION BY user_id ORDER BY ts, event_id) AS prev_val,
          |  lead(value, 1, -1.0) OVER
          |    (PARTITION BY user_id ORDER BY ts, event_id) AS next_val
          |FROM events
          |ORDER BY event_id""".stripMargin),
      ("cdc", "q_cdc_latest_by_key",
        """WITH o AS (
          |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
          |  FROM orders),
          |versions AS (
          |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
          |         o_orderkey * 10 AS updated, FALSE AS deleted
          |  FROM o
          |  UNION ALL
          |  SELECT o_orderkey, o_custkey, 'U', o_totalprice + 1000.0D,
          |         o_orderkey * 10 + 1, FALSE
          |  FROM o WHERE o_orderkey % 3 = 0
          |  UNION ALL
          |  SELECT o_orderkey, CAST(NULL AS BIGINT), CAST(NULL AS STRING),
          |         CAST(NULL AS DOUBLE), o_orderkey * 10 + 2, TRUE
          |  FROM o WHERE o_orderkey % 10 = 0),
          |latest AS (
          |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
          |    ORDER BY updated DESC) AS rn
          |  FROM versions)
          |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
          |       updated
          |FROM latest WHERE rn = 1 AND NOT deleted
          |ORDER BY o_orderkey""".stripMargin),
      ("dedup", "q_dedup_exact",
        """WITH d AS (
          |  SELECT doc_id, lang, source,
          |    md5(CAST(lower(trim(text)) AS BINARY)) AS digest
          |  FROM documents),
          |w AS (
          |  SELECT doc_id, digest, lang, source,
          |    ROW_NUMBER() OVER (PARTITION BY digest ORDER BY doc_id)
          |      AS rn,
          |    COUNT(*) OVER (PARTITION BY digest) AS n_copies
          |  FROM d)
          |SELECT doc_id, digest, lang, source, n_copies
          |FROM w WHERE rn = 1
          |ORDER BY doc_id""".stripMargin),
      ("graph", "q_degree_hist",
        """WITH inc AS (
          |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
          |  FROM lineitem),
          |pairs AS (
          |  SELECT a.pk AS p1, b.pk AS p2, COUNT(*) AS co
          |  FROM inc a JOIN inc b ON a.ok = b.ok AND a.pk < b.pk
          |  GROUP BY a.pk, b.pk HAVING COUNT(*) >= 2),
          |deg AS (
          |  SELECT pk, COUNT(*) AS degree FROM (
          |    SELECT p1 AS pk FROM pairs
          |    UNION ALL SELECT p2 AS pk FROM pairs)
          |  GROUP BY pk),
          |tot AS (SELECT COUNT(*) AS n_nodes_total FROM deg),
          |binned AS (
          |  SELECT CAST(length(bin(degree)) - 1 AS BIGINT) AS bucket,
          |         degree
          |  FROM deg)
          |SELECT bucket,
          |  shiftleft(1L, CAST(bucket AS INT)) AS bucket_lo,
          |  shiftleft(1L, CAST(bucket + 1 AS INT)) - 1 AS bucket_hi,
          |  COUNT(*) AS n_nodes,
          |  MIN(degree) AS min_degree, MAX(degree) AS max_degree,
          |  round(CAST(COUNT(*) AS DOUBLE) / n_nodes_total, 6) AS share
          |FROM binned CROSS JOIN tot
          |GROUP BY bucket, n_nodes_total
          |ORDER BY bucket""".stripMargin),
      ("curation", "q_pii_redact",
        """WITH t AS (
          |  SELECT c_custkey,
          |    concat(c_mktsegment, ' contact ',
          |      lower(regexp_replace(c_name, '[^A-Za-z0-9]', '')),
          |      '@mail.example phone 555-',
          |      lpad(CAST(pmod(c_custkey, 10000) AS STRING), 4, '0'),
          |      ' ref ', c_name) AS contact
          |  FROM customer)
          |SELECT c_custkey,
          |  CAST(regexp_count(contact, '[a-z0-9.]+@[a-z0-9.]+') AS BIGINT)
          |    AS n_emails,
          |  CAST(regexp_count(contact, '555-[0-9]{4}') AS BIGINT)
          |    AS n_phones,
          |  regexp_replace(
          |    regexp_replace(contact, '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>'),
          |    '555-[0-9]{4}', '<PHONE>') AS redacted
          |FROM t
          |ORDER BY c_custkey""".stripMargin))
    sweep.foreach { case (family, key, text) =>
      assert(viaSql(text) == viaDf(key),
        s"family $family: SQL text for $key drifted from the DataFrame")
    }
  }

  // ── Remaining-family sweep (round-14 verdict #3) ────────────────────
  // sources, set-ops, sampling, the incremental family, and ANN serving
  // over the STORED index were the families still unproven from pure
  // SQL text. Each leg below is row-identical to its DataFrame original.

  test("set-ops family: q_except_all runs as pure SQL text") {
    val sqlRows = viaSql(
      """SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT ALL
        |SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY k""".stripMargin)
    assert(sqlRows == viaDf("q_except_all"))
  }

  test("sampling family: q_stratified_sample runs as pure SQL text") {
    val sqlRows = viaSql(
      """SELECT lang, COUNT(*) AS n_sampled
        |FROM documents
        |WHERE (lang = 'en'
        |       AND pmod(graft_h60(CAST(doc_id AS STRING)), 100) < 50)
        |   OR (lang <> 'en'
        |       AND pmod(graft_h60(CAST(doc_id AS STRING)), 100) < 10)
        |GROUP BY lang
        |ORDER BY lang""".stripMargin)
    assert(sqlRows == viaDf("q_stratified_sample"))
  }

  test("sources family: q_source_csv runs as SQL text over a csv view") {
    // the DataFrame run publishes the headered CSV copy; the SQL leg
    // then binds it as a USING csv view (schema + the same options in
    // the view DDL — still pure SQL text) and re-aggregates.
    val dfRows = viaDf("q_source_csv")
    val tag = graft.queries.FixtureLayout.contentTag(sf, Seq("orders"))
    val path = s"${System.getProperty("java.io.tmpdir")}/" +
      s"graft_src_$tag/orders_csv"
    val ddl = Tables(spark, sf, "orders").schema.toDDL
    spark.sql("DROP VIEW IF EXISTS orders_csv")
    spark.sql(
      s"""CREATE TEMPORARY VIEW orders_csv ($ddl)
         |USING csv OPTIONS (
         |  path '$path', header 'true',
         |  timestampFormat 'yyyy-MM-dd HH:mm:ss.SSSSSS')""".stripMargin)
    val sqlRows = viaSql(
      """SELECT o_orderpriority, o_orderstatus,
        |  COUNT(*) AS n_orders,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(30,8))), 2)
        |    AS DOUBLE) AS sum_price,
        |  date_format(MIN(o_orderdate), 'yyyy-MM-dd') AS first_day,
        |  date_format(MAX(o_orderdate), 'yyyy-MM-dd') AS last_day
        |FROM orders_csv
        |GROUP BY o_orderpriority, o_orderstatus
        |ORDER BY o_orderpriority, o_orderstatus""".stripMargin)
    assert(sqlRows == dfRows)
  }

  test("incremental family: q_stats_incremental runs as SQL text over " +
      "the stored partials") {
    // the DataFrame run publishes the per-source partial table; the SQL
    // leg reads it with the parquet path-table syntax and merges the
    // same new-drop partials — the stored-artifact maintenance shape,
    // from text.
    val dfRows = viaDf("q_stats_incremental")
    val tag = graft.queries.FixtureLayout.contentTag(sf, Seq("documents"))
    val stored = s"${System.getProperty("java.io.tmpdir")}/" +
      s"graft_statsidx_$tag/source_partials"
    val sqlRows = viaSql(
      s"""WITH new_p AS (
         |  SELECT source, COUNT(*) AS n_docs,
         |    SUM(n_chars) AS sum_chars,
         |    SUM(CAST(size(split(text, ' ')) AS BIGINT)) AS n_tokens
         |  FROM documents WHERE doc_id % 10 = 3
         |  GROUP BY source),
         |merged AS (
         |  SELECT * FROM parquet.`$stored`
         |  UNION ALL SELECT * FROM new_p)
         |SELECT source, SUM(n_docs) AS n_docs,
         |  SUM(sum_chars) AS sum_chars, SUM(n_tokens) AS n_tokens,
         |  round(CAST(SUM(sum_chars) AS DOUBLE) / SUM(n_docs), 6)
         |    AS avg_chars
         |FROM merged GROUP BY source ORDER BY source""".stripMargin)
    assert(sqlRows == dfRows)
  }

  test("ANN serving family: q_ann_search_incremental runs as SQL text " +
      "over the stored index") {
    // The full FAISS-on-a-lake serving path from pure SQL: probes
    // cell-assign via the injected ivf_top_cells (centroids spliced as
    // a literal from the stored model), candidates ride the stored
    // cell-bucketed coded catalog table, and the ADC reconstruction is
    // done RELATIONALLY from the model parquet — decoded[p] =
    // CAST(centroid[p] + book[sub][code][j] AS FLOAT), elementwise
    // bit-identical to pq_decode, so dot_product/cosine_sim see the
    // same floats and every rank matches the DataFrame original
    // exactly. (pq_decode itself requires foldable codebook literals —
    // ~350 KB of SQL text — which is why the SQL twin reconstructs from
    // the stored relations instead.)
    val dfRows = viaDf("q_ann_search_incremental")
    val tag = graft.queries.FixtureLayout.contentTag(sf, Seq("embeddings"))
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_annidx_$tag"
    val centsLit = {
      val rows = spark.read.parquet(s"$base/model/centroids").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      rows.groupBy(_._1).toSeq.sortBy(_._1)
        .map(_._2.sortBy(_._2).map(t => s"${t._3}D")
          .mkString("array(", ", ", ")"))
        .mkString("array(", ", ", ")")
    }
    val sqlRows = viaSql(
      s"""WITH probes AS (
         |  SELECT vec_id AS probe_id, embedding AS probe,
         |    explode(ivf_top_cells(embedding, $centsLit, 2)) AS cell
         |  FROM embeddings WHERE vec_id % 10 = 3 AND vec_id < 50),
         |pvec AS (
         |  SELECT vec_id AS probe_id, embedding AS probe
         |  FROM embeddings WHERE vec_id % 10 = 3 AND vec_id < 50),
         |cent_arr AS (
         |  SELECT cell,
         |    transform(array_sort(collect_list(struct(pos, w))),
         |      x -> x.w) AS arr
         |  FROM parquet.`$base/model/centroids` GROUP BY cell),
         |books_arr AS (
         |  SELECT sub, code,
         |    transform(array_sort(collect_list(struct(pos, w))),
         |      x -> x.w) AS arr
         |  FROM parquet.`$base/model/books` GROUP BY sub, code),
         |cand AS (
         |  SELECT p.probe_id, i.vec_id, i.cell, i.codes, i.vec_norm
         |  FROM graft_annidx_${tag}_coded i JOIN probes p ON i.cell = p.cell),
         |dec0 AS (
         |  SELECT probe_id, vec_id, cell, vec_norm, sub, codes[sub] AS code
         |  FROM cand
         |  LATERAL VIEW explode(sequence(0, size(codes) - 1)) t AS sub),
         |dec1 AS (
         |  SELECT d.probe_id, d.vec_id, d.cell, d.vec_norm, d.sub, b.arr
         |  FROM dec0 d JOIN books_arr b ON b.sub = d.sub AND b.code = d.code),
         |dec2 AS (
         |  SELECT probe_id, vec_id, cell, vec_norm,
         |    flatten(transform(array_sort(collect_list(struct(sub, arr))),
         |      x -> x.arr)) AS resid
         |  FROM dec1 GROUP BY probe_id, vec_id, cell, vec_norm),
         |adc AS (
         |  SELECT d.probe_id, d.vec_id, d.cell,
         |    dot_product(p.probe,
         |      zip_with(c.arr, d.resid,
         |        (a, b) -> CAST(a + b AS FLOAT))) /
         |      (sqrt(dot_product(p.probe, p.probe)) * d.vec_norm)
         |      AS adc_sim
         |  FROM dec2 d
         |  JOIN cent_arr c ON c.cell = d.cell
         |  JOIN pvec p ON p.probe_id = d.probe_id),
         |short AS (
         |  SELECT probe_id, vec_id, cell,
         |    ROW_NUMBER() OVER (PARTITION BY probe_id
         |      ORDER BY adc_sim DESC, vec_id ASC) AS rn
         |  FROM adc),
         |rerank AS (
         |  SELECT s.probe_id, s.vec_id, s.cell,
         |    round(cosine_sim(e.embedding, p.probe), 6) AS cos_sim
         |  FROM short s
         |  JOIN embeddings e ON e.vec_id = s.vec_id
         |  JOIN pvec p ON p.probe_id = s.probe_id
         |  WHERE s.rn <= 64),
         |top AS (
         |  SELECT probe_id, vec_id, cell, cos_sim,
         |    ROW_NUMBER() OVER (PARTITION BY probe_id
         |      ORDER BY cos_sim DESC, vec_id ASC) AS rn
         |  FROM rerank)
         |SELECT probe_id, vec_id, cell, cos_sim
         |FROM top WHERE rn <= 5
         |ORDER BY probe_id ASC, cos_sim DESC, vec_id ASC""".stripMargin)
    assert(sqlRows == dfRows)
  }

  test("registerTables exposes every engine table to SQL text") {
    GraftSql.registerTables(spark, sf)
    Tables.names.foreach { n =>
      assert(spark.sql(s"SELECT * FROM $n LIMIT 1").collect().length == 1,
        s"table $n not reachable from SQL")
    }
  }

  // ── Enumerable family completeness (round-15 verdict #6) ────────────
  // Every family in SparkEntry.queryFamilies must have a representative
  // leg in this spec (or a justified exemption). The family map is
  // derived from the same per-module maps that assemble `queries`, so a
  // NEW module cannot ship without landing here — the keySet-equality
  // assertion catches a module wired into queries but not the family
  // map, and the unswept-family assertion catches a family with no leg.

  /** family -> the key a test in THIS spec proves from pure SQL text. */
  private val familyRepresentatives: Map[String, String] = Map(
    "relational" -> "q_agg_group",
    "joins" -> "q_join_anti",
    "aggregates" -> "q_agg_distinct",
    "windows" -> "q_win_lag_lead",
    "set-ops" -> "q_except_all",
    "functions" -> "q_null_funcs",
    "cdc" -> "q_cdc_latest_by_key",
    "udfs" -> "q_udf_topic_name",
    "llm-dedup" -> "q_dedup_exact",
    "text" -> "q_token_count",
    "ann" -> "q_ann_search_incremental",
    "salted-join" -> "q_join_salted",
    "subqueries" -> "q_subquery_in",
    "sampling" -> "q_sample_hash",
    "curation" -> "q_k_anonymity",
    "sources" -> "q_source_csv",
    "graph" -> "q_degree_hist")

  /** Families with no SQL-expressible surface, each with the reason. */
  private val sqlExempt: Map[String, String] = Map(
    "multimodal" -> ("binary codec seam (batched mapPartitions decode " +
      "of PNG/WAV/frame containers) — no SQL-expressible surface; " +
      "spec-pinned in MultiModalSpec"))

  test("every operator family has a SQL front door or a declared exemption") {
    assert(SparkEntry.queryFamilies.keySet == SparkEntry.queries.keySet,
      "queryFamilies drifted from queries — a module was wired into " +
        "one map but not the other")
    val fams = SparkEntry.queryFamilies.values.toSet
    val unswept = fams -- familyRepresentatives.keySet -- sqlExempt.keySet
    assert(unswept.isEmpty,
      s"families with NO SQL-front-door leg: ${unswept.mkString(", ")} — " +
        "add a representative leg to SqlFrontDoorSpec (or a justified " +
        "sqlExempt entry)")
    // representatives must be real keys of their own family, exemptions
    // must be real families that do not also have a leg
    familyRepresentatives.foreach { case (fam, key) =>
      assert(SparkEntry.queryFamilies.get(key).contains(fam),
        s"representative $key is not a member of family $fam")
    }
    assert(sqlExempt.keySet.subsetOf(fams))
    assert(sqlExempt.keySet.intersect(familyRepresentatives.keySet).isEmpty)
    // and no family list rot: a representative for a family that
    // vanished from the engine is stale
    assert(familyRepresentatives.keySet.subsetOf(fams),
      "familyRepresentatives names a family no module declares")
  }

  // ── Round-16 legs for the six families the sweep still missed ───────
  // Where the committed DuckDB oracle text is dialect-portable, the leg
  // runs THAT text — proving both the SQL front door and that the
  // oracle is not DuckDB-only.

  test("aggregates family: q_agg_distinct runs as pure SQL text (oracle text)") {
    assert(viaSql(SparkEntry.oracleSql("q_agg_distinct"))
      == viaDf("q_agg_distinct"))
  }

  test("functions family: q_null_funcs runs as pure SQL text (oracle text)") {
    assert(viaSql(SparkEntry.oracleSql("q_null_funcs"))
      == viaDf("q_null_funcs"))
  }

  test("udfs family: q_udf_topic_name runs as pure SQL text") {
    // the UDF's logic as regexp_extract CASE text. The ORACLE text is
    // DuckDB-dialect here (bare VARCHAR casts; raw \d regex escapes,
    // which Spark's escaped string literals would eat) — this is the
    // Spark text with identical semantics, regexes spliced with doubled
    // backslashes. No UDF registration needed from SQL.
    def esc(p: String) = p.replace("\\", "\\\\")
    val res = esc(graft.queries.Cdc.resolvedFile)
    val gen = esc(graft.queries.Cdc.generalFile)
    val sqlRows = viaSql(
      s"""WITH p AS (
         |  SELECT o_orderkey, CASE
         |    WHEN o_orderkey % 17 = 0 THEN '/v1/ord_topic/2024-01-01/'
         |      || lpad(CAST(o_orderkey AS STRING), 33, '0') || '.RESOLVED'
         |    WHEN o_orderkey % 13 = 0 THEN '/v1/bogus/'
         |      || CAST(o_orderkey AS STRING)
         |    ELSE '/v1/ord_topic/2024-01-01/'
         |      || lpad(CAST(o_orderkey AS STRING), 33, '0')
         |      || '-u' || CAST(o_orderkey % 97 AS STRING)
         |      || '-orders-1.ndjson'
         |  END AS path
         |  FROM orders)
         |SELECT o_orderkey, path,
         |  CASE WHEN regexp_extract(path, '$res', 1) <> ''
         |         THEN 'cdc-' || regexp_extract(path, '$res', 1)
         |       WHEN regexp_extract(path, '$gen', 1) <> ''
         |         THEN 'cdc-' || regexp_extract(path, '$gen', 1)
         |       ELSE NULL END AS topic
         |FROM p ORDER BY o_orderkey""".stripMargin)
    assert(sqlRows == viaDf("q_udf_topic_name"))
  }

  test("subqueries family: q_subquery_in runs as pure SQL text (oracle text)") {
    assert(viaSql(SparkEntry.oracleSql("q_subquery_in"))
      == viaDf("q_subquery_in"))
  }

  test("salted-join family: q_join_salted runs as pure SQL text (oracle text)") {
    // plain-join text: the salt is semantics-neutral (PropertiesSpec
    // pins salted == plain), so the SQL front door IS the plain join
    assert(viaSql(SparkEntry.oracleSql("q_join_salted"))
      == viaDf("q_join_salted"))
  }

  test("text family: q_token_count runs as pure SQL text") {
    // the oracle text is DuckDB-dialect (len/string_split/
    // regexp_extract_all) — Spark text with identical semantics
    val sqlRows = viaSql(
      """SELECT doc_id,
        |  CAST(size(split(text, ' ')) AS BIGINT) AS ws_tokens,
        |  CAST(regexp_count(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]') AS BIGINT)
        |    AS bpe_pieces,
        |  CAST(length(text) AS BIGINT) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin)
    assert(sqlRows == viaDf("q_token_count"))
  }
}
