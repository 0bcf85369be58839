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

/** Merge-based `size(array_intersect(a, b))` for arrays the CALLER has
  * already sorted ascending (nulls first — `sort_array`'s default).
  *
  * [[IntersectSize]] already avoids materializing the intersection, but
  * still builds two boxed hash sets PER ROW — at q31b's verify volume
  * (~17M array elements across the candidate pairs at sf0.1) the
  * HashSet allocation and boxed hashing is the measured hot spot. When
  * both arrays are sorted, a two-pointer merge counts the same distinct
  * matches with ZERO allocation and pure comparisons; sorting happens
  * once per DOCUMENT (corpus-linear, map-only) instead of hashing once
  * per CANDIDATE PAIR (candidate-quadratic). Same count contract as the
  * composition: distinct elements of `a` present in `b`, null counted
  * once if present in both.
  *
  * UNDEFINED on unsorted input (it would undercount) — this is a
  * private building block for verify joins that sort first, not a
  * general function; SortedIntersectSpec property-checks equality with
  * `size(array_intersect(...))` on sorted random arrays.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
          if lt == rt && IntersectSize.supportedElem(lt) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          "graft_sorted_intersect_size requires two arrays of the same " +
            s"non-floating atomic element type, got " +
            s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }

  override def dataType: DataType = IntegerType

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  @transient private lazy val ordering: Ordering[Any] =
    org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(elemType)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val et = elemType
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var cnt = 0
    // nulls sort first: count the null match once, then skip
    var aNull = false
    while (i < na && a.isNullAt(i)) { aNull = true; i += 1 }
    var bNull = false
    while (j < nb && b.isNullAt(j)) { bNull = true; j += 1 }
    if (aNull && bNull) cnt += 1
    while (i < na && j < nb) {
      val x = a.get(i, et)
      val y = b.get(j, et)
      val c = ordering.compare(x, y)
      if (c < 0) i += 1
      else if (c > 0) j += 1
      else {
        cnt += 1
        i += 1
        while (i < na && ordering.compare(a.get(i, et), x) == 0) i += 1
        j += 1
        while (j < nb && ordering.compare(b.get(j, et), y) == 0) j += 1
      }
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cg = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
      val jt = cg.javaType(elemType)
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val cnt = ctx.freshName("cnt")
      val aNull = ctx.freshName("aNull")
      val bNull = ctx.freshName("bNull")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val c = ctx.freshName("c")
      val getAi = cg.getValue(a, elemType, i)
      val getBj = cg.getValue(b, elemType, j)
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $cnt = 0;
         |boolean $aNull = false;
         |while ($i < $na && $a.isNullAt($i)) { $aNull = true; $i++; }
         |boolean $bNull = false;
         |while ($j < $nb && $b.isNullAt($j)) { $bNull = true; $j++; }
         |if ($aNull && $bNull) $cnt++;
         |while ($i < $na && $j < $nb) {
         |  $jt $x = $getAi;
         |  $jt $y = $getBj;
         |  int $c = ${ctx.genComp(elemType, x, y)};
         |  if ($c < 0) { $i++; }
         |  else if ($c > 0) { $j++; }
         |  else {
         |    $cnt++;
         |    $i++;
         |    while ($i < $na && ${ctx.genComp(elemType, s"($getAi)", x)} == 0) $i++;
         |    $j++;
         |    while ($j < $nb && ${ctx.genComp(elemType, s"($getBj)", y)} == 0) $j++;
         |  }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sorted_intersect_size"
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
