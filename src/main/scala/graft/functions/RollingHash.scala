package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit polynomial rolling hash over a string's UTF-8 bytes
  * (h = h*31 + byte), as a native Catalyst expression with codegen so it
  * stays inside whole-stage codegen on the hot path (vs a Scala UDF, which
  * breaks the codegen pipeline and forces ser/de per row).
  *
  * Used for document fingerprinting (SURVEY.md §7 step 8). The reference
  * has no scalar-function layer at all (SURVEY.md §2.9) — this is part of
  * the beyond-reference training-data-pipeline surface.
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + (bytes(i) & 0xff); i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * 31L + ($bytes[$i] & 0xFF);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  import org.apache.spark.sql.GraftColumnShim
  def rolling_hash(c: Column): Column =
    GraftColumnShim.toColumn(RollingHash(GraftColumnShim.toExpression(c)))
}
