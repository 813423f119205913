package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.RollingHash

/** Session extensions exposing graft's custom Catalyst expressions to SQL.
  * Activate with `--conf spark.sql.extensions=graft.GraftExtensions`, or
  * call `GraftExtensions.register(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (exprs: Seq[Expression]) => RollingHash(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("token_count"),
      new ExpressionInfo(classOf[graft.functions.TokenCount].getName, "token_count"),
      (exprs: Seq[Expression]) => graft.functions.TokenCount(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[graft.functions.CosineSim].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => graft.functions.CosineSim(exprs(0), exprs(1))))
  }
}

object GraftExtensions {
  def register(spark: SparkSession): Unit = {
    org.apache.spark.sql.GraftColumnShim.registerFunction(
      spark, "rolling_hash", exprs => RollingHash(exprs.head))
    // UDF-backed training-data functions, exposed to SQL users. (The pure
    // Column combinators in graft.functions.Text need no registration —
    // they compile to built-in expressions usable from SQL already.)
    spark.udf.register("lang_id", graft.functions.Text.langIdF)
    spark.udf.register("nfc_normalize", (s: String) =>
      if (s == null) null
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    spark.udf.register("simhash64",
      (toks: Seq[String]) => // null in → null out, like built-ins
        if (toks == null) null
        else java.lang.Long.valueOf(graft.functions.Dedup.simHash64(toks)))
    org.apache.spark.sql.GraftColumnShim.registerFunction(
      spark, "cosine_sim",
      exprs => graft.functions.CosineSim(exprs(0), exprs(1)))
    org.apache.spark.sql.GraftColumnShim.registerFunction(
      spark, "token_count",
      exprs => graft.functions.TokenCount(exprs.head))
  }
}
