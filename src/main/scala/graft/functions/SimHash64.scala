package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** SimHash over a token array as a native Catalyst expression with
  * codegen — same construction as [[Dedup.simHash64]] (FNV-1a over UTF-16
  * code units + murmur fmix64 finalizer, per-bit majority vote), but it
  * stays inside whole-stage codegen instead of paying the Scala-UDF
  * Seq[String] deserialization per row. Null tokens are skipped.
  *
  * Fixture values in the q_simhash oracle
  * (tools/simhash_expected.py) pin the algorithm for both paths.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val acc = new Array[Int](64)
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val h = Dedup.hash64(arr.getUTF8String(t).toString)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) acc(j) += 1 else acc(j) -= 1
          j += 1
        }
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (acc(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val acc = ctx.freshName("acc")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int[] $acc = new int[64];
         |for (int $t = 0; $t < $c.numElements(); $t++) {
         |  if (!$c.isNullAt($t)) {
         |    long $h = graft.functions.Dedup$$.MODULE$$.hash64(
         |      $c.getUTF8String($t).toString());
         |    for (int $j = 0; $j < 64; $j++) {
         |      if ((($h >>> $j) & 1L) == 1L) $acc[$j]++; else $acc[$j]--;
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($acc[$j] > 0) $out |= (1L << $j);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHash64Expr {
  import org.apache.spark.sql.GraftColumnShim
  def simhash64(c: Column): Column =
    GraftColumnShim.toColumn(SimHash64Expr(GraftColumnShim.toExpression(c)))
}
