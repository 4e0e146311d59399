package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck-generated property (SURVEY §5.2): the CDC envelope
  * build-then-parse pipeline round-trips ARBITRARY payload values —
  * including JSON metacharacters, unicode, and extreme numerics — not
  * just the fixture's tame ones. */
class EnvelopePropertySpec extends AnyFunSuite {
  import TestSpark._

  private type P = (Long, String, Double)

  private val statusGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(12)),
    Gen.oneOf("""quote"inside""", """back\slash""", "tab\there",
      "newline\nline", "委托状态", "emoji❤", "", " spaced "))

  private val priceGen: Gen[Double] = Gen.oneOf(
    Gen.chooseNum(-1e12, 1e12),
    Gen.oneOf(0.0, -0.0, Double.MinPositiveValue, 1.7976931348623157e308))

  private val rowGen: Gen[P] = for {
    key <- Gen.chooseNum(Long.MinValue + 1, Long.MaxValue)
    st <- statusGen
    price <- priceGen
  } yield (key, st, price)

  test("envelope build -> from_json parse round-trips generated payloads") {
    // deterministic sample set: fixed seed, 300 cases
    val rows = Iterator.iterate((Seed(42L), List.empty[P])) { case (seed, acc) =>
      val r = rowGen.pureApply(Gen.Parameters.default, seed)
      (seed.next, r :: acc)
    }.drop(300).next()._2
    import spark.implicits._
    val df = rows.toDF("key", "status", "price")

    val afterJson = to_json(struct(col("key"), col("status"), col("price")))
    val line = concat(lit("{\"after\": "), afterJson,
      lit(", \"key\": ["), col("key").cast("string"),
      lit("], \"updated\": \"1\"}"))
    val env = StructType(Seq(
      StructField("after", StructType(Seq(
        StructField("key", LongType),
        StructField("status", StringType),
        StructField("price", DoubleType)))),
      StructField("key", ArrayType(LongType)),
      StructField("updated", StringType)))
    val parsed = df.select(
      col("key").as("in_key"), col("status").as("in_status"),
      col("price").as("in_price"),
      from_json(line, env).as("env"))
    val bad = parsed.filter(
      !(col("env.after.key") <=> col("in_key")) ||
      !(col("env.after.status") <=> col("in_status")) ||
      !(col("env.after.price") <=> col("in_price")) ||
      !(element_at(col("env.key"), 1) <=> col("in_key")))
    val failures = bad.collect()
    assert(failures.isEmpty,
      s"${failures.length} round-trip failures, first: ${failures.headOption}")
  }
}
