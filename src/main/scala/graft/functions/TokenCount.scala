package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace-token count as a native codegen'd expression: one pass over
  * the UTF-8 bytes counting maximal non-space runs — semantically
  * identical to `size(filter(split(c, " "), t => t != ""))`
  * ([[Text.nTokens]]'s composed form) but with ZERO allocations, where the
  * composed form materializes the full token array plus a filtered copy
  * per row just to take its length. Token counting runs over every
  * document of a corpus (budgeting, quality signals, q_text_stats /
  * q_token_count / q_pipeline), so this is a hot-path expression by
  * construction; the A/B is recorded in SCALE.md (`MicroBench ntokens`).
  *
  * Byte-level scan is UTF-8-safe because the delimiter is the ASCII space
  * and multi-byte sequences never contain 0x20.
  */
case class TokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_count requires string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var n = 0L
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) != 0x20 && (i == 0 || bytes(i - 1) == 0x20)) n += 1
      i += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $n = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  if ($bytes[$i] != 0x20 && ($i == 0 || $bytes[$i - 1] == 0x20)) $n++;
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

object TokenCount {
  import org.apache.spark.sql.GraftColumnShim
  def token_count(c: Column): Column =
    GraftColumnShim.toColumn(TokenCount(GraftColumnShim.toExpression(c)))
}
