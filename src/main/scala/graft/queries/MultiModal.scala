package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north star): image/audio/video as opaque
  * binary columns with typed metadata, plus decode / feature-extract /
  * resize / frame-sample stages.
  *
  * The container has no codec libraries, so the DECODE STEP IS A STUB — a
  * deterministic fake that derives bytes from the documents fixture — and
  * clearly marked below. Everything around it is the real Spark shape a
  * production pipeline needs and what the tests pin:
  *  - schema: (id, modality, content: binary, meta: struct) — the binary
  *    payload is opaque to Catalyst, metadata columns stay prunable and
  *    filterable WITHOUT touching payload bytes;
  *  - partitioning: repartition by modality before the heavy stage so one
  *    task loads one codec (cache locality at 1000 executors);
  *  - batch shape: the extract stage runs via mapPartitions draining the
  *    iterator in fixed-size batches — the JVM twin of a Pandas-UDF
  *    `mapInPandas` batch loop, where a real impl would hand each batch
  *    to a native decoder;
  *  - output: fixed-dim Array[Float] features ready for the ANN/similarity
  *    operators (AnnOps / LlmOps).
  */
object MultiModal {

  case class MMeta(width: Int, height: Int, sample_rate: Int, n_frames: Int)
  case class MMRecord(id: Long, modality: String, content: Array[Byte],
    meta: MMeta)
  case class MMFeature(id: Long, modality: String, dim: Int,
    features: Array[Float])

  val featureDim = 16
  val batchSize = 32

  /** Deterministic fake corpus: binary payloads derived from documents.
    * (Stands in for reading real image/audio/video bytes from storage.) */
  def corpus(spark: SparkSession, dir: String): Dataset[MMRecord] = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"))
      .as[(Long, String, Long)]
      .map { case (id, text, nChars) =>
        val modality = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        // STUB payload: real pipeline reads encoded media bytes here.
        val content = text.getBytes("UTF-8")
        val meta = modality match {
          case "image" => MMeta((nChars % 640).toInt + 1,
            (nChars % 480).toInt + 1, 0, 1)
          case "audio" => MMeta(0, 0, 16000, 0)
          case _ => MMeta(320, 240, 0, (nChars % 120).toInt + 1)
        }
        MMRecord(id, modality, content, meta)
      }
  }

  /** ??? in spirit — the decode seam. A real implementation calls the
    * modality's codec (JPEG/PNG decode, PCM resample, H.264 frame pull)
    * on each batch. The deterministic fake below byte-histograms the
    * payload so tests can pin shape, determinism, and batch behavior. */
  private def decodeBatchSTUB(batch: Seq[MMRecord]): Seq[MMFeature] =
    batch.map { r =>
      val hist = new Array[Float](featureDim)
      r.content.foreach(b => hist((b & 0xff) % featureDim) += 1f)
      val n = math.max(r.content.length, 1).toFloat
      MMFeature(r.id, r.modality, featureDim, hist.map(_ / n))
    }

  /** Feature extraction with real batch shape: repartition by modality
    * (codec locality), then drain each partition in fixed-size batches —
    * the JVM analogue of `mapInPandas` over Arrow record batches. */
  def extractFeatures(records: Dataset[MMRecord]): Dataset[MMFeature] = {
    import records.sparkSession.implicits._
    records
      .repartition(col("modality"))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap(decodeBatchSTUB)
      }
  }

  /** Resize stage (image/video): pure metadata transform — payload bytes
    * pass through untouched (a real impl would re-encode in the same
    * batched seam as decode). */
  def resizeMeta(records: Dataset[MMRecord], maxW: Int, maxH: Int): Dataset[MMRecord] = {
    import records.sparkSession.implicits._
    records.map { r =>
      if (r.modality == "audio" || (r.meta.width <= maxW && r.meta.height <= maxH)) r
      else {
        val scale = math.min(maxW.toDouble / r.meta.width,
          maxH.toDouble / r.meta.height)
        r.copy(meta = r.meta.copy(
          width = math.max(1, (r.meta.width * scale).toInt),
          height = math.max(1, (r.meta.height * scale).toInt)))
      }
    }
  }

  /** Frame sampling (video): every k-th frame index, computed from
    * metadata only — the real impl would pull those frames in the decode
    * seam. */
  def sampleFrames(records: Dataset[MMRecord], everyK: Int): DataFrame = {
    import records.sparkSession.implicits._
    records.filter(_.modality == "video").toDF()
      .select(col("id"), col("meta.n_frames").as("n_frames"),
        sequence(lit(0), col("meta.n_frames") - 1, lit(everyK))
          .as("frame_idx"))
  }

  /** Query-surface entry: end-to-end features joined back to metadata —
    * no oracle (binary plumbing is not SQL-expressible); MultiModalSpec
    * pins schema, determinism, batching, and feature math. */
  val q: Map[String, Q] = Map(
    "q_multimodal_features" -> ((s, d) => {
      import s.implicits._
      extractFeatures(corpus(s, d)).toDF()
        .select(col("id"), col("modality"), col("dim"),
          round(element_at(col("features"), 1), 6).as("f0"),
          round(aggregate(col("features"), lit(0.0),
            (acc, x) => acc + x), 4).as("f_sum"))
        .orderBy("id")
    }),
  )
}
