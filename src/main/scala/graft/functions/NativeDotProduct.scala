package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the declaratively-composed dot product
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x) }}}
  *
  * into the codegen'd [[VectorDot]] loop, so a user writing plain Spark SQL
  * gets the native hot path without knowing `graft_dot` exists. The composed
  * form materializes an intermediate array and interprets two lambdas per
  * element (~1 ms/doc on 384-dim embeddings); the native loop is one fused
  * whole-stage-codegen pass.
  *
  * The rewrite fires only where it is bit-identical to the composed form:
  *
  *  - zero literal is exactly +0.0 double (the fold's seed);
  *  - each multiply operand is the lambda variable itself (double element)
  *    or the variable cast to double (float element) — widen-then-multiply,
  *    matching VectorDot; a raw float*float multiply rounds differently and
  *    is left alone;
  *  - merge is a bare `acc + x` (operand order free: IEEE-754 double add and
  *    multiply are commutative bit-for-bit), finish is the identity lambda;
  *  - both array types have `containsNull = false` (typed Datasets of
  *    `Array[Float|Double]`). With nullable elements the composed form nulls
  *    the whole sum on a null element while VectorDot reads it as 0.0, so
  *    nullable-element arrays keep the composed plan. Length mismatch needs
  *    no gate: zip_with's null padding nulls the sum and VectorDot returns
  *    NULL — identical.
  */
object NativeDotProduct extends Rule[LogicalPlan] {

  private def isNonNullVector(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, false) | ArrayType(DoubleType, false) => true
    case _ => false
  }

  /** `e` is lambda variable `v` widened to double (or already double). */
  private def asDoubleOf(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case nv: NamedLambdaVariable =>
        nv.exprId == v.exprId && nv.dataType == DoubleType
      case c: Cast if c.dataType == DoubleType =>
        c.child match {
          case nv: NamedLambdaVariable => nv.exprId == v.exprId
          case _ => false
        }
      case _ => false
    }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case nv: NamedLambdaVariable => nv.exprId == v.exprId
      case _ => false
    }

  private def isPlusZeroD(e: Expression): Boolean = e match {
    case Literal(v: Double, DoubleType) =>
      java.lang.Double.doubleToRawLongBits(v) == 0L
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(mul: Multiply,
                Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            zero,
            LambdaFunction(add: Add,
              Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
            LambdaFunction(fin, Seq(facc: NamedLambdaVariable), _))
          if isNonNullVector(a) && isNonNullVector(b) &&
            isPlusZeroD(zero) &&
            ((asDoubleOf(mul.left, x) && asDoubleOf(mul.right, y)) ||
              (asDoubleOf(mul.left, y) && asDoubleOf(mul.right, x))) &&
            ((isVar(add.left, acc) && isVar(add.right, el)) ||
              (isVar(add.left, el) && isVar(add.right, acc))) &&
            isVar(fin, facc) =>
        VectorDot(a, b)
    }
}
