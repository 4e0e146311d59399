package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** Streaming throughput record (round-12 verdict #4): rows/s for the
  * composed bridge pipeline on a FIXED deterministic changefeed drop, at
  * two micro-batch sizes, over both shipped sinks. The reference
  * publishes no throughput numbers (BASELINE.md), so this record IS the
  * baseline for the streaming surface; one JSON line on stdout, durable
  * copy in BENCH_STREAMING.json.
  *
  * Methodology:
  *  - The drop is `SPARK_GRAFT_STREAM_ROWS` (default 120000) envelope
  *    lines in the reference's delivery layout
  *    (`sharedKey=k1/t<j>/<date>/<ts33>-u<i>-orders-1.ndjson`,
  *    publisher.go:133-134 path grammar), `..._ROWS_PER_FILE` (default
  *    1000) lines per file round-robined over 8 topics — every row
  *    routable, auth-passing, parseable, so the number measures the
  *    pipeline, not error paths (those are spec'd in StreamingSpec).
  *  - Files are FULLY pre-dropped; elapsed = query.start() →
  *    processAllAvailable() return, i.e. listing + ingest + parse + auth
  *    + route + publish + every epoch commit. rows/s = rows / elapsed.
  *  - Two batch sizes via `spark.graft.maxFilesPerTrigger`: `batch8`
  *    (8 files ≈ 8k rows per micro-batch — steady-state replay-unit
  *    shape, pays per-epoch commit overhead ~15x) and `batch_all`
  *    (unbounded — one giant catch-up batch, minimal per-epoch cost).
  *  - Sinks: `dir_*` = publishPipeline's partitioned-parquet topic sink
  *    (Streams.routePublish); `net_*` = the wire leg (routePublishNet →
  *    NetTransport → in-process NetBroker, per-frame ACKs, ack window
  *    1000) — the Pub/Sub-semantics path. Every leg ASSERTS full
  *    delivery (sink row count == drop rows) before reporting a time; a
  *    throughput number for partially delivered data would be a lie.
  *  - A small warmup drop runs both sinks first (JIT/codegen/classload),
  *    unrecorded. Kafka leg: recorded as skipped unless the kafka-clients
  *    jar is on the classpath (zero-egress sandbox ships none); with the
  *    jar, KafkaTransport inherits the same contract (KafkaSink.scala).
  *  - Host-load self-defense fields (loadavg, load_warn, waited_quiet)
  *    match Bench.scala's so the reader can discount a loaded-host run.
  */
object BenchStreaming {
  private val payload = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_totalprice", DoubleType)))

  private def envLine(k: Long): String =
    s"""{"after": {"o_orderkey": $k, "o_custkey": ${k % 1000}, """ +
      s""""o_totalprice": ${k % 100000}.25}, "key": [$k], """ +
      f""""updated": "$k%023d.0000000001"}"""

  /** Write `rows` envelope lines as the reference's delivery layout:
    * one file per `rowsPerFile` lines, round-robin over `topics` topic
    * dirs, 33-digit monotone timestamps. Returns the file count. */
  private def writeDrop(in: String, rows: Long, rowsPerFile: Int,
      topics: Int): Int = {
    var k = 0L
    var file = 0
    while (k < rows) {
      val n = math.min(rowsPerFile.toLong, rows - k)
      val topic = s"t${file % topics}"
      val ts33 = f"$file%033d"
      val p = Paths.get(in,
        s"sharedKey=k1/$topic/2024-01-01/$ts33-u$file-orders-1.ndjson")
      Files.createDirectories(p.getParent)
      val sb = new StringBuilder
      var i = 0L
      while (i < n) { sb.append(envLine(k + i)).append('\n'); i += 1 }
      Files.writeString(p, sb.toString)
      k += n
      file += 1
    }
    file
  }

  private def tmp(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    p.toFile.deleteOnExit()
    p.toString
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val osBean =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val warnThreshold = sys.env
      .getOrElse("SPARK_GRAFT_BENCH_LOAD_WARN", "2.0").toDouble
    // Same quiet-wait contract as Bench.scala, including the round-17
    // 5-min-loadavg gate (the r15 streaming re-record ran with
    // waited_quiet_sec=0 on a loaded host and read 2.6x low; the r16
    // batch record was poisoned by a DRAINING host the 1-min average
    // called quiet). Opt out with =0.
    val waitBudgetSec = sys.env
      .getOrElse("SPARK_GRAFT_BENCH_WAIT_QUIET", "420").toLong
    def isLoaded(l: (Double, Double)): Boolean =
      l._1 >= warnThreshold || (l._2 >= 0 && l._2 >= warnThreshold)
    var waitedSec = 0L
    var lw = Bench.loadAvgs()
    while (waitedSec < waitBudgetSec && isLoaded(lw)) {
      System.err.println(s"[bench-streaming] loadavg ${lw._1} (1m) / " +
        s"${lw._2} (5m) >= $warnThreshold — waiting " +
        s"($waitedSec/${waitBudgetSec}s)")
      Thread.sleep(10000)
      waitedSec += 10
      lw = Bench.loadAvgs()
    }
    val (loadStart, load5Start) = Bench.loadAvgs()
    val loadWarn = isLoaded((loadStart, load5Start))

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.graft.sharedKeys", "k1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rows = sys.env.getOrElse("SPARK_GRAFT_STREAM_ROWS", "120000").toLong
    val rowsPerFile =
      sys.env.getOrElse("SPARK_GRAFT_STREAM_ROWS_PER_FILE", "1000").toInt
    val smallTrigger =
      sys.env.getOrElse("SPARK_GRAFT_STREAM_SMALL_TRIGGER", "8").toInt
    val topics = 8

    /** One measured leg: returns (elapsedSec, microBatches). */
    def runDirLeg(in: String, nRows: Long, mft: Int): (Double, Long) = {
      spark.conf.set("spark.graft.maxFilesPerTrigger", mft.toString)
      streaming.Streams.TopicCache.reset()
      val out = tmp("bs-out"); val ckpt = tmp("bs-ckpt")
      val t0 = System.nanoTime()
      val q = streaming.Streams.publishPipeline(spark, in, out, ckpt, payload)
      q.processAllAvailable()
      val sec = (System.nanoTime() - t0) / 1e9
      val batches = Option(q.lastProgress).map(_.batchId + 1).getOrElse(0L)
      q.stop()
      val delivered = spark.read.parquet(s"$out/data").count()
      require(delivered == nRows,
        s"dir sink delivered $delivered of $nRows rows — refusing to " +
          "record a throughput number for partial delivery")
      (sec, batches)
    }

    def runNetLeg(in: String, nRows: Long, mft: Int): (Double, Long) = {
      spark.conf.set("spark.graft.maxFilesPerTrigger", mft.toString)
      streaming.NetPublisher.reset()
      val broker = new streaming.NetBroker()
      try {
        val ckpt = tmp("bs-ckpt")
        val cfg = GraftConfig.from(spark)
        val routed = streaming.Streams.route(
          streaming.Streams.authFilter(
            streaming.Streams.parseEnvelope(
              streaming.Streams.ingestLines(spark, in), payload),
            cfg.sharedKeys),
          cfg.topicPrefix)
        val t0 = System.nanoTime()
        val q = streaming.Streams.routePublishNet(routed,
          streaming.NetTransport(broker.addr), ckpt)
        q.processAllAvailable()
        val sec = (System.nanoTime() - t0) / 1e9
        val batches = Option(q.lastProgress).map(_.batchId + 1).getOrElse(0L)
        q.stop()
        val delivered =
          broker.topicNames.toSeq.map(t => broker.messages(t).size.toLong).sum
        require(delivered == nRows,
          s"net sink delivered $delivered of $nRows rows — refusing to " +
            "record a throughput number for partial delivery")
        (sec, batches)
      } finally broker.close()
    }

    // Warmup (unrecorded): both sinks over a 2-file drop.
    val warmIn = tmp("bs-warm")
    writeDrop(warmIn, 2L * rowsPerFile, rowsPerFile, topics)
    runDirLeg(warmIn, 2L * rowsPerFile, 0)
    runNetLeg(warmIn, 2L * rowsPerFile, 0)

    // The fixed drop, written once and shared by all measured legs.
    val in = tmp("bs-in")
    val files = writeDrop(in, rows, rowsPerFile, topics)

    val legs = Seq(
      ("dir_batch8", () => runDirLeg(in, rows, smallTrigger)),
      ("dir_batch_all", () => runDirLeg(in, rows, 0)),
      ("net_batch8", () => runNetLeg(in, rows, smallTrigger)),
      ("net_batch_all", () => runNetLeg(in, rows, 0)))

    def fmt(v: Double): String = BigDecimal(v)
      .setScale(1, BigDecimal.RoundingMode.HALF_UP).toString
    // n passes per leg, min-time (= max-throughput) headline — batch-row
    // methodology parity (round 17, r16 verdict #5): the single-pass
    // record's first quiet attempt once read 3-4x low on a cold page
    // cache and only a prose caveat marked the committed row as the
    // second pass. Now every leg records its per-pass times and the min
    // IS the row, so the steady-state number needs no caveat. Passes
    // run back-to-back per leg (fresh out/checkpoint dirs each), the
    // same fixed drop every time.
    val iters = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_STREAM_BENCH_ITERS", "2").toInt)
    val results = legs.map { case (name, f) =>
      val passes = (1 to iters).map { i =>
        val (sec, batches) = f()
        System.err.println(
          s"[bench-streaming] $name pass $i/$iters: ${fmt(sec)}s, " +
            s"$batches batches, ${fmt(rows / sec)} rows/s")
        (sec, batches)
      }
      val (sec, batches) = passes.minBy(_._1)
      name -> (sec, batches, rows / sec, passes.map(_._1))
    }
    val kafkaStatus =
      try { Class.forName("org.apache.kafka.clients.producer.KafkaProducer")
            "available_not_benched" }
      catch { case _: ClassNotFoundException => "skipped_no_client_jar" }

    val loadEnd = osBean.getSystemLoadAverage
    val legsJson = results.map { case (n, (sec, b, rps, passes)) =>
      s""""$n":{"sec":${fmt(sec)},"micro_batches":$b,""" +
        s""""rows_per_sec":${fmt(rps)},""" +
        s""""passes_sec":${passes.map(fmt).mkString("[", ",", "]")}}"""
    }.mkString("{", ",", "}")
    val best = results.map(_._2._3).max
    val json = s"""{"metric":"streaming_rows_per_sec","value":${fmt(best)},""" +
      s""""unit":"rows/sec","legs":$legsJson,"rows":$rows,"files":$files,""" +
      s""""rows_per_file":$rowsPerFile,"topics":$topics,""" +
      s""""small_trigger_files":$smallTrigger,"kafka":"$kafkaStatus",""" +
      s""""iters":$iters,"stat":"min",""" +
      s""""loadavg_start":$loadStart,"loadavg5_start":$load5Start,""" +
      s""""loadavg_end":$loadEnd,""" +
      s""""load_warn":$loadWarn,"waited_quiet_sec":$waitedSec,""" +
      s""""cpus":$cpus}"""
    Files.write(
      Paths.get(sys.env.getOrElse("SPARK_GRAFT_STREAM_BENCH_OUT",
        "BENCH_STREAMING.json")),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
    println(json)
  }
}
