package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, BinaryExpression, Expression, Size}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused `size(array_intersect(a, b))` — the intersection CARDINALITY
  * without materializing the intersection array.
  *
  * Every candidate-verify join in the dedup family (q31/q61/q120/q125/
  * q126's exact-Jaccard and containment checks) computes
  * `size(array_intersect(sh_a, sh_b))`: Spark's composition builds an
  * OpenHashSet, allocates a result ArrayData holding the matched
  * elements, then throws it away after reading its length. This
  * expression runs the same membership scan and emits only the count —
  * zero result allocation, one pass over each array — on the hottest
  * inner loop a 100 TB dedup run has.
  *
  * Exact-count parity with the composition: array_intersect returns the
  * DISTINCT elements of `a` present in `b` (null counted once if null
  * appears in both), so the count here dedups `a`'s matches the same
  * way. Element types are restricted to atomic types whose boxed
  * `equals` matches SQL equality (strings, integrals, booleans,
  * date/timestamp) — floating-point arrays keep the composed form, whose
  * NaN/-0.0 set semantics box differently.
  *
  * Null contract matches the composition under the DEFAULT
  * `spark.sql.legacy.sizeOfNull=false`: NULL in → NULL out. The
  * [[IntersectSizeFusion]] rule refuses to fire under the legacy flag
  * (where `size(NULL)` is −1).
  */
case class IntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
          if lt == rt && IntersectSize.supportedElem(lt) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          "graft_intersect_size requires two arrays of the same " +
            s"non-floating atomic element type, got " +
            s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def dataType: DataType = IntegerType

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val et = elemType
    val setB = new java.util.HashSet[Any]()
    var bHasNull = false
    var i = 0
    while (i < b.numElements()) {
      if (b.isNullAt(i)) bHasNull = true
      else setB.add(b.get(i, et))
      i += 1
    }
    val seen = new java.util.HashSet[Any]()
    var seenNull = false
    var cnt = 0
    i = 0
    while (i < a.numElements()) {
      if (a.isNullAt(i)) {
        if (bHasNull && !seenNull) { seenNull = true; cnt += 1 }
      } else {
        val x = a.get(i, et)
        if (setB.contains(x) && seen.add(x)) cnt += 1
      }
      i += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val setB = ctx.freshName("setB")
      val seen = ctx.freshName("seen")
      val bNull = ctx.freshName("bHasNull")
      val seenNull = ctx.freshName("seenNull")
      val cnt = ctx.freshName("cnt")
      val getB = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
        .getValue(b, elemType, i)
      val getA = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
        .getValue(a, elemType, i)
      s"""
         |java.util.HashSet $setB = new java.util.HashSet();
         |boolean $bNull = false;
         |for (int $i = 0; $i < $b.numElements(); $i++) {
         |  if ($b.isNullAt($i)) { $bNull = true; }
         |  else { $setB.add((Object) $getB); }
         |}
         |java.util.HashSet $seen = new java.util.HashSet();
         |boolean $seenNull = false;
         |int $cnt = 0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if ($a.isNullAt($i)) {
         |    if ($bNull && !$seenNull) { $seenNull = true; $cnt++; }
         |  } else {
         |    Object x = (Object) $getA;
         |    if ($setB.contains(x) && $seen.add(x)) { $cnt++; }
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectSize =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_intersect_size"
}

object IntersectSize {
  /** Boxed-equals ≡ SQL-equals element types (floats excluded: boxed
    * Double/Float disagree with SQL on -0.0).
    */
  def supportedElem(dt: DataType): Boolean = dt match {
    case StringType | BooleanType | ByteType | ShortType | IntegerType |
        LongType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }
}

/** Optimizer rule: rewrite `size(array_intersect(a, b))` to
  * [[IntersectSize]] whenever only the cardinality is consumed — the
  * intersection array itself is never built. Fires only for supported
  * element types and only under the default `sizeOfNull` semantics
  * (legacy mode makes `size(NULL)` −1, which the fused form does not
  * reproduce).
  */
object IntersectSizeFusion extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // the per-node flag (captured at expression-construction time) is
      // the source of truth for that node's semantics — a Size built
      // under legacy mode keeps size(NULL) = -1 even if the conf has
      // since flipped, so the rule must read the instance, not the conf
      case Size(ArrayIntersect(a, b), false)
          if a.dataType.isInstanceOf[ArrayType] &&
            b.dataType.isInstanceOf[ArrayType] &&
            a.dataType.asInstanceOf[ArrayType].elementType ==
              b.dataType.asInstanceOf[ArrayType].elementType &&
            IntersectSize.supportedElem(
              a.dataType.asInstanceOf[ArrayType].elementType) =>
        IntersectSize(a, b)
    }
}
