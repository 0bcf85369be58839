package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Divide, Expression, Multiply, Sqrt}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused normalized cosine over two `array<float|double>` columns:
  * `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` in ONE pass.
  *
  * The composed rendering (`Similarity.normCosExpr`) walks each array
  * three times — once per dot product. At 100 TB × 384-dim embeddings
  * that is 3× the memory traffic of the fused loop, which accumulates
  * all three sums in one traversal. Results are BIT-IDENTICAL to the
  * composed form: each accumulator adds the same products in the same
  * left-to-right order, and the final sqrt/multiply/divide is the same
  * fixed sequence of correctly-rounded IEEE ops — so swapping the
  * composed plan for the fusion never moves a hash (FunctionsSpec pins
  * this bit-for-bit).
  *
  * Null contract matches the composition: NULL if either array is NULL
  * or the lengths differ (the composed `dot(a,b)` nulls there, nulling
  * the division). Zero-norm inputs yield NaN in both forms (0/0).
  */
case class VectorCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  private def isVector(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVector(left.dataType) && isVector(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_cosine requires array<float|double> arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) return null
    val n = a.numElements()
    val aIsF = elemType(left) == FloatType
    val bIsF = elemType(right) == FloatType
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aIsF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bIsF) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aGet = if (elemType(left) == FloatType) "getFloat" else "getDouble"
    val bGet = if (elemType(right) == FloatType) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0;
         |  double $na = 0.0;
         |  double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = (double) $a.$aGet($i);
         |    double $y = (double) $b.$bGet($i);
         |    $dot += $x * $y;
         |    $na += $x * $x;
         |    $nb += $y * $y;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorCosine =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_cosine"
}

/** Optimizer rule: fuse the composed normalized cosine
  *
  * {{{ graft_dot(a, b) / (sqrt(graft_dot(a, a)) * sqrt(graft_dot(b, b))) }}}
  *
  * into [[VectorCosine]]. Runs after [[NativeDotProduct]] in the same
  * user-rule fixpoint batch, so even the fully-declarative SQL spelling
  * (three aggregate/zip_with folds) cascades: composed dots → VectorDot
  * → fused cosine. Fires only on the exact canonical shape — a/b must
  * be semantically the same subtrees across all three dots — which is
  * the shape `Similarity.normCosExpr` emits.
  */
object CosineFusion extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(VectorDot(a, b),
            Multiply(Sqrt(VectorDot(a2, a3)), Sqrt(VectorDot(b2, b3)), _), _)
          if a2.semanticEquals(a) && a3.semanticEquals(a) &&
            b2.semanticEquals(b) && b3.semanticEquals(b) =>
        VectorCosine(a, b)
    }
}
