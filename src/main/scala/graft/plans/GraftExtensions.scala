package graft.plans

import graft.functions.DotProduct
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: rewrite the DECLARATIVE dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) => x * y), 0.0d, (acc, v) => acc + v)
  *
  * into the native codegen'd [[graft.functions.DotProduct]] expression.
  * Higher-order functions are CodegenFallback — the idiom materializes a
  * product array and folds it with interpreted per-element lambda calls —
  * so a user writing the natural DataFrame form silently pays ~4x on
  * every row. The rewrite is SEMANTICS-PRESERVING, bit for bit: both
  * forms accumulate left-to-right from 0.0, yield null on a null element,
  * and yield null on length mismatch (zip_with pads the short side with
  * null, which nulls the fold). Guarded to array<double> inputs, the
  * exact multiply/add lambda shapes, a literal 0.0 zero, and the identity
  * finish lambda — anything else is left alone.
  *
  * This is the engine's `SparkSessionExtensions` seam (registered via the
  * production `spark.sql.extensions` conf in `core.Sessions`): the brief's
  * preference order for operators Spark lacks — compose built-ins, then a
  * native Expression, then a Rule/Strategy — lands here when the built-in
  * COMPOSITION is expressible but not fast enough.
  */
object RewriteHofDot extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def sameVar(body: Expression, arg: NamedExpression): Boolean =
    (body, arg) match {
      case (b: NamedLambdaVariable, a: NamedLambdaVariable) => b.exprId == a.exprId
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(a, b,
            LambdaFunction(mul: Multiply, Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(add: Add, Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
          LambdaFunction(finishBody, Seq(finishArg), _))
        if sameVar(mul.left, x) && sameVar(mul.right, y) &&
          sameVar(add.left, acc) && sameVar(add.right, v) &&
          sameVar(finishBody, finishArg) &&
          isDoubleArray(a) && isDoubleArray(b) =>
      DotProduct(a, b)
  }
}

/** `spark.sql.extensions` entry point (zero-arg class, the spark-submit
  * registration shape). Injected rules run inside the main optimizer
  * fixed-point batch.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => RewriteHofDot)
}
