package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 16-bit SimHash fingerprint of a token array, in one map-only pass.
  *
  * Bit-compatible with the exploded form it replaces (and with the DuckDB
  * oracle, Dedup.scala q33): token's md5 hex digits 1–4 supply bits 0–15
  * (bit b lives in hex digit b/4 at position 3 − b%4, i.e. big-endian
  * within the digit); each token votes ±1 per bit; fingerprint bit b is
  * set iff the vote sum is strictly positive; result = Σ 2^b.
  *
  * The composed form explodes doc × token × 16 bit-rows through two hash
  * aggregations (row inflation 16·|tokens| and two shuffles); this is a
  * per-row loop with |tokens| md5 calls, no shuffle at all.
  */
case class SimHash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_simhash requires array<string>")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHash16.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHash16$$.MODULE$$.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash"
}

/** 64-bit SimHash — the production fingerprint width. Same vote rule as
  * [[SimHash16]] extended over md5 hex digits 1–16 (bytes 0–7): bit b
  * comes from hex digit b/4 at in-digit position 3 − b%4. Bits 0–15 are
  * IDENTICAL to graft_simhash's (the 16-bit form is a prefix), so the two
  * widths stay mutually checkable. Bit 63 may set the sign — the value is
  * the raw two's-complement long, and the DuckDB oracle wraps its HUGEINT
  * sum to match.
  *
  * Why the width matters at scale: Hamming-≤3 pigeonhole blocking over a
  * 16-bit fingerprint keys buckets by one of 4 nibbles (16 values) — each
  * bucket holds ~n/16 of the corpus and the candidate join goes
  * near-quadratic at 100× data. 64 bits split into 4 SIXTEEN-BIT blocks
  * gives 65536-value block keys: buckets hold ~n/65536 and the join stays
  * collision-bounded (see Dedup q33c for measured occupancy).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_simhash64 requires array<string>")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SimHash64$$.MODULE$$.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash64"
}

object SimHash16 {
  def compute(toks: ArrayData): Long = SimHash.compute(toks, 16)
}

object SimHash64 {
  def compute(toks: ArrayData): Long = SimHash.compute(toks, 64)
}

object SimHash {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Shared vote loop: `bits` ∈ {16, 64} selects the fingerprint width;
    * the bit→digit mapping is width-independent so narrower widths are
    * prefixes of wider ones.
    */
  def compute(toks: ArrayData, bits: Int): Long = {
    val votes = new Array[Int](bits)
    val digest = md5.get()
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      digest.reset()
      val d = digest.digest(toks.getUTF8String(i).getBytes)
      // hex digit b/4 = high/low nibble of byte b/8; bit b sits in the
      // digit at position 3 - b%4 (matches the oracle's
      // (digit >> (3 - b%4)) & 1)
      var b = 0
      while (b < bits) {
        val nibble =
          if (b / 4 % 2 == 0) (d(b / 8) & 0xf0) >> 4 else d(b / 8) & 0x0f
        val bit = (nibble >> (3 - b % 4)) & 1
        votes(b) += (if (bit == 1) 1 else -1)
        b += 1
      }
      i += 1
    }
    var result = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) result |= 1L << b
      b += 1
    }
    result
  }
}
