package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All MinHash signature slots in ONE pass over a shingle array.
  *
  * Slot i (0-based) is semantically identical to the composed form used by
  * the DuckDB oracle (Dedup.scala / its list_min rendering):
  *
  *   array_min(transform(sh, x ->
  *     substring(md5(concat(x, '#' || (i/2))), 1 + 16*(i%2), 16)))
  *
  * i.e. salts are shared by slot pairs — one md5 per (shingle, salt) yields
  * two 16-hex-char slots. The composed form runs `nSlots` interpreted
  * lambda loops and `nSlots`·|sh| md5 calls per document; this expression
  * does one loop with (nSlots/2)·|sh| md5 calls and no lambda interpreter —
  * the hot inner loop of q32/q32b at corpus scale.
  *
  * Returns NULL for an empty shingle array (array_min of empty is NULL).
  */
case class MinHashSlots(child: Expression, nSlots: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if nSlots >= 2 && nSlots % 2 == 0 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_minhash requires array<string> and an even slot count >= 2")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinHashSlots.compute(input.asInstanceOf[ArrayData], nSlots)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val result = ctx.freshName("mh")
      s"""
         |Object $result =
         |  graft.functions.MinHashSlots$$.MODULE$$.compute($a, $nSlots);
         |if ($result == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $result;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSlots =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash"
}

object MinHashSlots {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private val hex = "0123456789abcdef".toCharArray

  /** One pass: per shingle, one md5 per salt; each digest's hex splits into
    * two 16-char slot candidates compared lexicographically (ASCII hex, so
    * String ordering == the oracle's lexicographic min).
    */
  def compute(sh: ArrayData, nSlots: Int): ArrayData = {
    val n = sh.numElements()
    if (n == 0) return null
    val nSalts = nSlots / 2
    val mins = new Array[String](nSlots)
    val digest = md5.get()
    var i = 0
    while (i < n) {
      val bytes = sh.getUTF8String(i).getBytes
      var j = 0
      while (j < nSalts) {
        digest.reset()
        digest.update(bytes)
        digest.update('#'.toByte)
        // salts 0-5 are single digits for any realistic slot count
        val salt = j.toString
        var k = 0
        while (k < salt.length) { digest.update(salt.charAt(k).toByte); k += 1 }
        val d = digest.digest()
        val chars = new Array[Char](32)
        var b = 0
        while (b < 16) {
          chars(2 * b) = hex((d(b) & 0xf0) >> 4)
          chars(2 * b + 1) = hex(d(b) & 0x0f)
          b += 1
        }
        val full = new String(chars)
        val lo = full.substring(0, 16)
        val hi = full.substring(16)
        if (mins(2 * j) == null || lo.compareTo(mins(2 * j)) < 0) mins(2 * j) = lo
        if (mins(2 * j + 1) == null || hi.compareTo(mins(2 * j + 1)) < 0) mins(2 * j + 1) = hi
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(s => UTF8String.fromString(s): Any))
  }
}
