package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Conv, Expression, ExpressionInfo, Literal, Md5, Substring}
import org.apache.spark.sql.types.{BinaryType, LongType}

/** Session-extension entry point: the idiomatic way to ship this
  * library's native functions to a cluster —
  *
  *   spark.sql.extensions=graft.functions.GraftExtensions
  *
  * — so every session (including ones the user's platform creates, where
  * application code never gets to call a register() helper) resolves them
  * from SQL and the Column API. Injected:
  *
  *  - `cosine_sim(array<float>, array<float>)` — the codegen'd similarity
  *    kernel (CosineSim.scala);
  *  - `graft_h60(string)` — the engine's portable 60-bit hash (first 15
  *    hex chars of md5 read as a long), the determinism foundation of the
  *    dedup/sampling family. Composed from built-in Catalyst expressions
  *    (Md5/Substring/Conv/Cast), so it whole-stage-codegens with zero new
  *    expression classes, and its SQL twin is
  *    `CAST(('0x' || substring(md5(x), 1, 15)) AS BIGINT)` in DuckDB.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.inject(ext)
}

object GraftExtensions {

  private def h60Builder(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 1) throw new IllegalArgumentException(
      s"graft_h60 requires exactly 1 argument, got ${exprs.length}")
    Cast(
      Conv(
        Substring(Md5(Cast(exprs.head, BinaryType)),
          Literal(1), Literal(15)),
        Literal(16), Literal(10)),
      LongType)
  }

  val h60Ident = FunctionIdentifier("graft_h60")

  def inject(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"cosine_sim requires exactly 2 arguments, got ${exprs.length}")
        CosineSim(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"dot_product requires exactly 2 arguments, got ${exprs.length}")
        DotProduct(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      h60Ident,
      new ExpressionInfo(classOf[Conv].getName, "graft_h60"),
      h60Builder _))
  }
}
