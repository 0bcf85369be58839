package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass within-document n-gram repetition statistics:
  * `graft_gram_stats(tokens, n)` → struct(n_grams, n_distinct, top_cnt,
  * top_g) over the space-joined token n-grams of the document.
  *
  * Exactly the numbers q148's Gopher repetition filters (Rae et al.
  * 2021 §A1.1) consume, with the semantics of the composed rendering it
  * replaces:
  *   - `n_grams`    = size of the zip_with gram list (0 when size(t) < n)
  *   - `n_distinct` = size(array_distinct(grams))
  *   - `top_cnt`/`top_g` = the max(struct(cnt, g)) of the per-gram
  *     counts — count first, ties broken by the binary-LARGEST gram
  *     (Spark struct ordering) — (0, NULL) when there are no grams.
  *
  * The composed form paid an interpreted `array_distinct` + lambda
  * `zip_with` per doc for the fractions, then an explode + (doc, gram)
  * count + per-doc argmax — two corpus-sized shuffles — for the top
  * gram. This expression computes all four numbers in ONE pass over the
  * token array with a single per-doc hash map, so q148 becomes map-only
  * (its only remaining exchange is the presentation orderBy).
  *
  * Null contract: NULL tokens array → NULL struct. A null TOKEN makes
  * the grams containing it null (concat semantics); null grams count
  * toward n_grams, count once in n_distinct, and lose top-gram ties to
  * any non-null gram (nulls-first struct ordering) — matching the
  * composed form; corpus token arrays never actually contain nulls.
  */
case class GramStats(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "graft_gram_stats: n must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_gram_stats requires array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_cnt", IntegerType, nullable = false),
    StructField("top_g", StringType, nullable = true)))

  override def nullable: Boolean = child.nullable

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val numToks = toks.numElements()
    val numGrams = math.max(numToks - n + 1, 0)
    if (numToks < n) {
      new GenericInternalRow(Array[Any](0, 0, 0, null))
    } else {
      val counts = new java.util.HashMap[UTF8String, Int]()
      var nullGrams = 0
      var i = 0
      while (i < numGrams) {
        var g: UTF8String = null
        var broken = false
        var j = i
        while (j < i + n && !broken) {
          if (toks.isNullAt(j)) broken = true
          else {
            val t = toks.getUTF8String(j)
            g = if (j == i) t else UTF8String.concat(g, space, t)
          }
          j += 1
        }
        if (broken) nullGrams += 1
        else counts.put(g, counts.getOrDefault(g, 0) + 1)
        i += 1
      }
      var topCnt = nullGrams // a null gram can only win on strict count
      var topG: UTF8String = null
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val better = e.getValue > topCnt ||
          (e.getValue == topCnt &&
            (topG == null || e.getKey.compareTo(topG) > 0))
        if (better) { topCnt = e.getValue; topG = e.getKey }
      }
      val distinct = counts.size() + (if (nullGrams > 0) 1 else 0)
      new GenericInternalRow(Array[Any](numGrams, distinct, topCnt, topG))
    }
  }

  /** Same loop emitted inline (LinkedHashMap-free: iteration order does
    * not affect the argmax because the tie-break is a total order).
    */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val spaceRef = ctx.addReferenceObj("gramSpace", space, classOf[UTF8String].getName)
    val utf8 = classOf[UTF8String].getName
    nullSafeCodeGen(ctx, ev, a => {
      val numToks = ctx.freshName("numToks")
      val numGrams = ctx.freshName("numGrams")
      val counts = ctx.freshName("counts")
      val nullGrams = ctx.freshName("nullGrams")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val g = ctx.freshName("g")
      val broken = ctx.freshName("broken")
      val topCnt = ctx.freshName("topCnt")
      val topG = ctx.freshName("topG")
      val it = ctx.freshName("it")
      val e = ctx.freshName("e")
      val cnt = ctx.freshName("cnt")
      val key = ctx.freshName("key")
      val better = ctx.freshName("better")
      val distinct = ctx.freshName("distinct")
      val prev = ctx.freshName("prev")
      s"""
         |int $numToks = $a.numElements();
         |int $numGrams = java.lang.Math.max($numToks - $n + 1, 0);
         |if ($numToks < $n) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[] {java.lang.Integer.valueOf(0), java.lang.Integer.valueOf(0),
         |      java.lang.Integer.valueOf(0), null});
         |} else {
         |  java.util.HashMap $counts = new java.util.HashMap();
         |  int $nullGrams = 0;
         |  for (int $i = 0; $i < $numGrams; $i++) {
         |    $utf8 $g = null;
         |    boolean $broken = false;
         |    for (int $j = $i; $j < $i + $n && !$broken; $j++) {
         |      if ($a.isNullAt($j)) { $broken = true; }
         |      else {
         |        $g = ($j == $i) ? $a.getUTF8String($j)
         |          : $utf8.concat($g, $spaceRef, $a.getUTF8String($j));
         |      }
         |    }
         |    if ($broken) { $nullGrams++; }
         |    else {
         |      Object $prev = $counts.get($g);
         |      $counts.put($g, java.lang.Integer.valueOf($prev == null ? 1
         |        : ((java.lang.Integer) $prev).intValue() + 1));
         |    }
         |  }
         |  int $topCnt = $nullGrams;
         |  $utf8 $topG = null;
         |  java.util.Iterator $it = $counts.entrySet().iterator();
         |  while ($it.hasNext()) {
         |    java.util.Map.Entry $e = (java.util.Map.Entry) $it.next();
         |    int $cnt = ((java.lang.Integer) $e.getValue()).intValue();
         |    $utf8 $key = ($utf8) $e.getKey();
         |    boolean $better = $cnt > $topCnt ||
         |      ($cnt == $topCnt && ($topG == null || $key.compareTo($topG) > 0));
         |    if ($better) { $topCnt = $cnt; $topG = $key; }
         |  }
         |  int $distinct = $counts.size() + ($nullGrams > 0 ? 1 : 0);
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[] {java.lang.Integer.valueOf($numGrams),
         |      java.lang.Integer.valueOf($distinct),
         |      java.lang.Integer.valueOf($topCnt), $topG});
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): GramStats =
    copy(child = newChild)

  override def prettyName: String = "graft_gram_stats"
}
