package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck-generated property for the schema-drift boundary: for
  * ARBITRARY generated event rows and ANY combination of the physical
  * encodings [[Tables.reconcile]] claims to absorb (epoch-nanos int64 /
  * NTZ / instant timestamps; int/long keys; float/double measures), the
  * reconciled frame presents the contract schema and the contract VALUES
  * — the same rows a natively-encoded fixture would yield. The round-9
  * failure class, quantified over the whole encoding lattice rather than
  * the three fixture variants TablesSpec pins. */
class ReconcilePropertySpec extends AnyFunSuite {
  import TestSpark._

  // (event_id, epoch-micros, user_id, event_type, value, props)
  private type E = (Long, Long, Long, String, Double, String)

  private val rowGen: Gen[E] = for {
    id <- Gen.chooseNum(0L, Int.MaxValue.toLong)
    // micros range safely inside both int64-nanos (x1000) and timestamp
    us <- Gen.chooseNum(0L, 4102444800000000L) // 1970..2100
    uid <- Gen.chooseNum(0L, 100000L)
    et <- Gen.oneOf("view", "click", "purchase", "signup")
    v <- Gen.oneOf(Gen.chooseNum(-1e6, 1e6), Gen.const(0.0))
    props <- Gen.oneOf("""{"k": 1}""", """{"k": 99}""", "{}")
  } yield (id, us, uid, et, v, props)

  private def sample(n: Int, seed: Long): List[E] =
    Iterator.iterate((Seed(seed), List.empty[E])) { case (s, acc) =>
      (s.next, rowGen.pureApply(Gen.Parameters.default, s) :: acc)
    }.drop(n).next()._2

  private def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.select(col("event_id"), unix_micros(col("ts")).as("us"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  test("reconcile absorbs the full encoding lattice value-exactly") {
    val rows = sample(120, 7L)
    // ground truth: rows built directly in the contract schema
    val native = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, us, uid, et, v, p) =>
        Row(id, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          us / 1000000L, (us % 1000000L) * 1000L)), uid, et, v, p)
      }),
      StructType(Seq(
        StructField("event_id", LongType), StructField("ts", TimestampType),
        StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType), StructField("props", StringType))))
    val truth = canon(Tables.reconcile("events", native))

    // the encoding lattice: every combination this table can drift into
    val tsEncodings = Seq[(DataType, Long => Any)](
      (LongType, us => us * 1000L),                      // epoch nanos
      (LongType, us => us * 1000L + 999L),               // sub-us noise
      (TimestampNTZType,
        us => java.time.LocalDateTime.ofEpochSecond(
          us / 1000000L, ((us % 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)))
    val idEncodings = Seq[DataType](LongType, IntegerType)
    for {
      (tsType, tsOf) <- tsEncodings
      idType <- idEncodings
    } {
      val variant = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map {
          case (id, us, uid, et, v, p) =>
            Row(if (idType == IntegerType) id.toInt else id,
              tsOf(us), uid, et, v, p)
        }),
        StructType(Seq(
          StructField("event_id", idType), StructField("ts", tsType),
          StructField("user_id", LongType),
          StructField("event_type", StringType),
          StructField("value", DoubleType), StructField("props", StringType))))
      val rec = Tables.reconcile("events", variant)
      Tables.expected("events").foreach { case (c, want) =>
        assert(rec.schema(c).dataType == want,
          s"[$tsType/$idType] $c: ${rec.schema(c).dataType} != $want")
      }
      assert(canon(rec) == truth,
        s"[$tsType/$idType] reconciled values diverge from native encoding")
    }
  }

  test("reconcile never silently passes an unknown encoding") {
    import spark.implicits._
    val bad = Seq(("1", "2024-01-01", 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val e = intercept[IllegalArgumentException] {
      Tables.reconcile("events", bad)
    }
    assert(e.getMessage.contains("'ts'") ||
      e.getMessage.contains("'event_id'"))
  }
}
