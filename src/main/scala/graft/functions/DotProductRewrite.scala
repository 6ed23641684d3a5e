package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule (the §2.10 "custom Rule[LogicalPlan]" rung): rewrite the
  * declarative higher-order dot product
  *
  *   aggregate(zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
  *             0d, (acc, p) -> acc + p)
  *
  * into the native codegen kernel [[FloatVectorDot]]. Users write the
  * readable HOF form; the optimizer swaps in the tight primitive loop —
  * HOF lambdas evaluate interpreted per element and sit outside
  * whole-stage codegen, which is exactly the per-element overhead a
  * 64-dim-per-row similarity scan cannot afford at scale.
  *
  * The rewrite is semantics-preserving, not approximate: FloatVectorDot
  * folds left-to-right in double like the lambda chain, and returns null
  * on length mismatch or null elements exactly as the zip_with padding /
  * null-absorbing addition would. Guards are strict — both sides must be
  * ARRAY<FLOAT>, the multiply must be over double-casts of the two lambda
  * variables (a float-typed multiply would round differently and is NOT
  * rewritten), the fold zero must be literal 0.0, and the finish lambda
  * must be the identity.
  *
  * Injected per-session via `spark.experimental.extraOptimizations`
  * (Engine.tune) and cluster-wide via [[GraftExtensions]].
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  private def isDoubleCastOfVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case Cast(c, DoubleType, _, _) => isVar(c, v)
    case _ => false
  }

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(l, r,
            LambdaFunction(Multiply(ml, mr, _),
              Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(Add(al, ar, _),
            Seq(acc: NamedLambdaVariable, p: NamedLambdaVariable), _),
          LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
        if isFloatArray(l) && isFloatArray(r) &&
          ((isDoubleCastOfVar(ml, x) && isDoubleCastOfVar(mr, y)) ||
           (isDoubleCastOfVar(ml, y) && isDoubleCastOfVar(mr, x))) &&
          ((isVar(al, acc) && isVar(ar, p)) || (isVar(al, p) && isVar(ar, acc))) &&
          isVar(fin, fv) =>
      FloatVectorDot(l, r)
  }
}
