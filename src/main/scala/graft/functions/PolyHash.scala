package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash of a UTF-8 string: `h = Σ byte_i · B^i mod M`
  * with B = 257 and M = 2^61 − 1 (a Mersenne prime, reduced with the
  * shift-add trick — no BigInt, no division).
  *
  * This is the document-fingerprinting primitive (SURVEY.md §2.b "text
  * analysis" extension): content-defined, byte-stable, cheap. Implemented
  * as a native Catalyst expression WITH `doGenCode` so it stays inside
  * whole-stage codegen — the preferred extension point over a Scala UDF
  * (which would box, break codegen spans, and serialize per-row).
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PolyHash.hashBytes($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  private final val M = (1L << 61) - 1
  private final val B = 257L

  /** mod-Mersenne multiply-accumulate; called from generated code. */
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var pow = 1L
    var i = 0
    while (i < bytes.length) {
      h = modM(h + mulModM(bytes(i) & 0xffL, pow))
      pow = mulModM(pow, B)
      i += 1
    }
    h
  }

  private def modM(x: Long): Long = {
    val r = (x & M) + (x >>> 61)
    if (r >= M) r - M else r
  }

  /** (a*b) mod M for 0 ≤ a,b < M. The 122-bit product is HI·2^64 + LO;
    * 2^64 ≡ 2^3 (mod 2^61−1), so value ≡ HI·8 + LO. HI < 2^58 keeps
    * HI·8 in range; LO is folded as unsigned via shift.
    */
  private def mulModM(a: Long, b: Long): Long = {
    val lo = a * b
    val hi = Math.multiplyHigh(a, b) // operands nonneg → high word exact
    modM(modM((lo & M) + (lo >>> 61)) + modM(hi * 8L))
  }
}

object PolyHashFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column API: `poly_hash(col)` → 61-bit stable content fingerprint. */
  def poly_hash(c: Column): Column =
    ColumnBridge.column(PolyHash(ColumnBridge.expression(c)))
}
