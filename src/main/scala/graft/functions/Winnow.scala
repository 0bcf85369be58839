package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprints (the MOSS rolling-hash document fingerprint) in
  * one pass: hash every ORDERED `n`-gram of the token array (16-hex-char
  * md5 prefix), slide a window of `w` hashes, keep each window's minimum,
  * dedupe, sort ascending.
  *
  * Semantically identical to the composed form (and the DuckDB oracle,
  * TextAnalysis q28):
  *   array_sort(array_distinct(transform(
  *     sequence(1, greatest(nSh - w + 1, 1)),
  *     i -> array_min(slice(h, i, w)))))
  * where h = transform(sequence(1, greatest(size(t) - n + 1, 1)),
  *   i -> substring(md5(concat_ws(' ', slice(t, i, n))), 1, 16)).
  *
  * The composed form runs interpreted lambdas with a slice copy per n-gram
  * AND per window (O(len·w) copies) — it was the slowest query in the
  * bench at sf0.1; this is a linear pass with a ring-buffer minimum.
  */
case class Winnow(child: Expression, n: Int, w: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 && w >= 1 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      "graft_winnow requires array<string>, n >= 1 and w >= 1")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    Winnow.compute(input.asInstanceOf[ArrayData], n, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
         |  graft.functions.Winnow$$.MODULE$$.compute($a, $n, $w);""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)

  override def prettyName: String = "graft_winnow"
}

object Winnow {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private val hex = "0123456789abcdef".toCharArray

  def compute(toks: ArrayData, n: Int, w: Int): ArrayData = {
    val numToks = toks.numElements()
    val nSh = math.max(numToks - n + 1, 1)
    val digest = md5.get()
    // ordered n-gram hashes (16-hex-char md5 prefix), same short-input
    // edge as the composed slice: the tail n-gram just takes what remains
    val h = new Array[String](nSh)
    var i = 0
    while (i < nSh) {
      digest.reset()
      val upper = math.min(i + n, numToks)
      var j = i
      while (j < upper) {
        if (j > i) digest.update(' '.toByte)
        digest.update(toks.getUTF8String(j).getBytes)
        j += 1
      }
      val d = digest.digest()
      val chars = new Array[Char](16)
      var b = 0
      while (b < 8) {
        chars(2 * b) = hex((d(b) & 0xf0) >> 4)
        chars(2 * b + 1) = hex(d(b) & 0x0f)
        b += 1
      }
      h(i) = new String(chars)
      i += 1
    }
    // window minima, deduped
    val nWin = math.max(nSh - w + 1, 1)
    val seen = new java.util.TreeSet[String]()
    i = 0
    while (i < nWin) {
      val upper = math.min(i + w, nSh)
      var min = h(i)
      var j = i + 1
      while (j < upper) {
        if (h(j).compareTo(min) < 0) min = h(j)
        j += 1
      }
      seen.add(min)
      i += 1
    }
    // TreeSet iterates in ascending order = the composed array_sort
    val out = seen.toArray(new Array[String](0))
    new GenericArrayData(out.map(s => UTF8String.fromString(s): Any))
  }
}
