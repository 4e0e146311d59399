package graft

import graft.functions.ShingleHash60
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the fused shingle_hash60 expression to the composed Catalyst
  * chain it replaced (lower -> split -> transform/slice/concat_ws ->
  * [array_distinct] -> md5-hex -> substring -> conv(16,10)): the chain
  * IS the engine-parity contract (the DuckDB twins are written against
  * it), so bit-equality here on adversarial inputs extends the oracle's
  * fixture coverage to the edge cases fixtures don't contain. */
class ShingleHashSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** The original chain, verbatim semantics. */
  private def chain(n: Int, distinct: Boolean) = {
    val tok = split(lower(col("text")), " ")
    val sh = when(size(tok) >= n,
      transform(sequence(lit(0), size(tok) - n),
        i => concat_ws(" ", slice(tok, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
    val dsh = if (distinct) array_distinct(sh) else sh
    transform(dsh, s =>
      conv(substring(md5(s.cast("binary")), 1, 15), 16, 10).cast("long"))
  }

  private val cases = Seq(
    "",                                    // empty text -> 1 empty token
    "a",                                   // below n
    "a b",                                 // still below n for n=3
    "a b c",                               // exactly one shingle
    "a  b c d",                            // double space -> empty token
    " leading and trailing ",              // boundary empty tokens
    "x y z x y z x y z",                   // repeated shingles (dedup path)
    "The QUICK brown FOX the quick BROWN fox", // case folding + repeats
    "Straße GROSSE ÄÖÜ über ÄÖÜ über straße grosse", // non-ASCII folding
    "tab\tis not a separator here",        // only ' ' splits
    (1 to 300).map(i => s"w${i % 7}").mkString(" ")) // long, heavy dedup

  test("fused hasher == original Catalyst chain (n=3/4, distinct on/off)") {
    val df = cases.toDF("text")
    for (n <- Seq(3, 4); distinct <- Seq(true, false)) {
      val got = df.select(
        ShingleHash60(spark, col("text"), n, distinct).as("a"),
        chain(n, distinct).as("b")).collect()
      got.zip(cases).foreach { case (r, text) =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"n=$n distinct=$distinct text='$text'")
      }
    }
  }

  test("null text yields null, not a crash") {
    val df = Seq[Option[String]](None, Some("a b c")).toDF("text")
    val out = df.select(
      ShingleHash60(spark, col("text"), 3, distinct = true).as("h"))
      .collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getSeq[Long](0).nonEmpty)
  }
}
