package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct token n-gram shingles: array<string> tokens → array<string> of
  * space-joined n-grams, first-occurrence order.
  *
  * Semantically identical to the composed form
  *   array_distinct(transform(sequence(1, greatest(size(t)-n+1, 1)),
  *                            i -> concat_ws(' ', slice(t, i, n))))
  * and to the DuckDB oracle's list_distinct/list_transform/list_slice
  * rendering — including the short-input edge (fewer than n tokens → one
  * shingle of all tokens; empty input → [""]).
  *
  * Exists for throughput: the composed form runs the lambda interpreter
  * with a slice copy per shingle (~1 ms/doc measured at sf0.1), which made
  * shingling dominate every dedup operator. This single-pass version is
  * ~100× cheaper and is the hot inner loop of q31/q32 at 100 TB.
  */
case class TokenShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires array<string> and n >= 1")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val numToks = toks.numElements()
    val numShingles = math.max(numToks - n + 1, 1)
    val seen = new mutable.LinkedHashSet[UTF8String]
    var i = 0
    while (i < numShingles) {
      val upper = math.min(i + n, numToks)
      var s = if (i < numToks) toks.getUTF8String(i) else UTF8String.EMPTY_UTF8
      var j = i + 1
      while (j < upper) {
        s = UTF8String.concat(s, space, toks.getUTF8String(j))
        j += 1
      }
      seen += s
      i += 1
    }
    new GenericArrayData(seen.toArray[Any])
  }

  /** Whole-stage codegen: same loop as nullSafeEval, emitted inline so the
    * shingle stage stays inside the generated consume path.
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val spaceRef = ctx.addReferenceObj("shingleSpace", space, classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, a => {
      val numToks = ctx.freshName("numToks")
      val numSh = ctx.freshName("numShingles")
      val seen = ctx.freshName("seen")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val upper = ctx.freshName("upper")
      val s = ctx.freshName("s")
      val utf8 = classOf[UTF8String].getName
      s"""
         |int $numToks = $a.numElements();
         |int $numSh = java.lang.Math.max($numToks - $n + 1, 1);
         |java.util.LinkedHashSet $seen = new java.util.LinkedHashSet();
         |for (int $i = 0; $i < $numSh; $i++) {
         |  int $upper = java.lang.Math.min($i + $n, $numToks);
         |  $utf8 $s = $i < $numToks ? $a.getUTF8String($i) : $utf8.EMPTY_UTF8;
         |  for (int $j = $i + 1; $j < $upper; $j++) {
         |    $s = $utf8.concat($s, $spaceRef, $a.getUTF8String($j));
         |  }
         |  $seen.add($s);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($seen.toArray());
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): TokenShingles =
    copy(child = newChild)

  override def prettyName: String = "graft_shingles"
}
