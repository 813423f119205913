package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Byte-level content-defined chunking (gear-style rolling hash) — the
  * binary sibling of [[Corpus.cdcChunks]]' token-window CDC, applicable to
  * the multimodal `binary` columns as well as UTF-8 text.
  *
  * Algorithm (fixed here so any engine can re-derive it; the shape is the
  * published gear/FastCDC construction, Xia et al. ATC'16, on LBFS
  * boundaries, Muthitacharoen et al. SOSP'01):
  *   - 32-bit state `h := (2·h + G[byte]) mod 2^32`, `G` the 256-entry
  *     [[GearCdc.table]] derived from fmix64 — h mod 2^k therefore depends
  *     on ONLY the last k bytes (the `2·h` shift ages bytes out), which is
  *     exactly the locality that makes chunks insertion-robust.
  *   - a byte position is a boundary iff `h mod 2^maskBits == 0` AND at
  *     least `minSize` bytes have accumulated since the last boundary
  *     (the LBFS minimum-chunk guard); expected chunk ≈ minSize + 2^maskBits.
  *   - the final position always closes the last (possibly short) chunk.
  *
  * The hash state itself never resets at boundaries — only the distance
  * counter does — so boundary decisions past `minSize` stay purely local
  * to the trailing `maskBits` bytes.
  */
object GearCdc {

  /** 256-entry gear table, fmix64-derived (deterministic, engine-neutral
    * integers) and truncated to 32 bits so the rolling state stays below
    * 2^33 — re-derivable in any SQL engine as literal VALUES without
    * signed-overflow hazards.
    */
  val table: Array[Long] = Array.tabulate(256) { i =>
    Dedup.fmix64(0x6765617243444321L + i) & 0xffffffffL
  }

  /** Chunk END positions (1-based, inclusive) of the byte array — the
    * single implementation both the interpreted and codegen paths call.
    * Empty input → empty array.
    */
  def boundaries(bytes: Array[Byte], maskBits: Int, minSize: Int): Array[Long] = {
    val n = bytes.length
    if (n == 0) return Array.emptyLongArray
    val mask = (1L << maskBits) - 1
    val out = new scala.collection.mutable.ArrayBuffer[Long](n / (minSize + (1 << maskBits)) + 2)
    var h = 0L
    var dist = 0
    var i = 0
    while (i < n) {
      h = ((h << 1) + table(bytes(i) & 0xff)) & 0xffffffffL
      dist += 1
      if (dist >= minSize && (h & mask) == 0L) {
        out += (i + 1).toLong
        dist = 0
      }
      i += 1
    }
    if (out.isEmpty || out.last != n.toLong) out += n.toLong
    out.toArray
  }
}

/** `gear_boundaries(bytes)` as a native expression: array<long> of chunk
  * end positions. Codegen emits one static call into [[GearCdc.boundaries]]
  * — no Scala-UDF boundary, no boxed Seq, stays inside whole-stage codegen.
  */
case class GearBoundariesExpr(child: Expression, maskBits: Int, minSize: Int)
    extends UnaryExpression {
  require(maskBits >= 1 && maskBits <= 31, s"need 1 <= maskBits <= 31, got $maskBits")
  require(minSize >= 1, s"minSize must be >= 1, got $minSize")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gear_boundaries requires binary, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      GearCdc.boundaries(input.asInstanceOf[Array[Byte]], maskBits, minSize))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.GearCdc$$.MODULE$$.boundaries(
         |    $c, $maskBits, $minSize));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GearBoundariesExpr =
    copy(child = newChild)
}

object GearBoundariesExpr {
  import org.apache.spark.sql.GraftColumnShim
  def gear_boundaries(c: Column, maskBits: Int, minSize: Int): Column =
    GraftColumnShim.toColumn(
      GearBoundariesExpr(GraftColumnShim.toExpression(c), maskBits, minSize))
}
