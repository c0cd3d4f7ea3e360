package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}
import graft.functions.DotProduct

/** Optimizer rule: rewrite the composable dot-product idiom
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0.0, (acc, x) => acc + x) }}}
  *
  * into the codegen'd [[graft.functions.DotProduct]] expression. The
  * higher-order-function form is what a user naturally writes with
  * `org.apache.spark.sql.functions` — and it evaluates through interpreted
  * lambdas (25× slower in the all-pairs cosine join, BENCH r01→r02). This
  * rule gives any such query the fast path without the user knowing
  * DotProduct exists — the same contract as Catalyst's own
  * expression-normalization rules: pure plan surgery, identical semantics
  * in ALL cases, including the edge ones: both forms are a sequential left
  * fold over index order, and DotProduct returns NULL on mismatched lengths
  * and on null elements exactly as zip_with's null-padding +
  * null-propagating lambdas do (pinned by the equivalence spec's ragged and
  * null-element cases).
  *
  * Registered through [[GraftExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftExtensions`) or per-session via
  * `spark.experimental.extraOptimizations`.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  /** x * y over exactly the two lambda variables (either order). */
  private def isPairwiseMultiply(f: Expression): Boolean = f match {
    case LambdaFunction(Multiply(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      (l.exprId == a.exprId && r.exprId == b.exprId) ||
        (l.exprId == b.exprId && r.exprId == a.exprId)
    case _ => false
  }

  /** acc + x over exactly the two lambda variables (either order). */
  private def isPairwiseAdd(f: Expression): Boolean = f match {
    case LambdaFunction(Add(l: NamedLambdaVariable, r: NamedLambdaVariable, _),
        Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
      (l.exprId == a.exprId && r.exprId == b.exprId) ||
        (l.exprId == b.exprId && r.exprId == a.exprId)
    case _ => false
  }

  /** finish lambda is the identity on its single argument. */
  private def isIdentityFinish(f: Expression): Boolean = f match {
    case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
      v.exprId == a.exprId
    case _ => false
  }

  private def isZero(e: Expression): Boolean = e match {
    case Literal(0.0, DoubleType) => true
    case Cast(Literal(0.0, DoubleType), DoubleType, _, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(ZipWith(a, b, mult), zero, merge, finish)
        if isDoubleArray(a) && isDoubleArray(b) && isZero(zero)
          && isPairwiseMultiply(mult) && isPairwiseAdd(merge) && isIdentityFinish(finish) =>
      DotProduct(a, b)
  }
}

/** `SparkSessionExtensions` entry point:
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  * Injects the optimizer rule AND registers the library's custom
  * expressions/aggregates as SQL functions, so a pure-SQL user (the
  * reference's notebook audience) can call `graft_dot`, `theta_agg` and
  * `kll_agg` without touching the Scala API. The builder list is exposed
  * so GraftExtensionsSpec can register it into an existing session's
  * registry and exercise each function through `spark.sql`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectOptimizerRule(_ => DotProductRewrite)
    GraftExtensions.functions.foreach(extensions.injectFunction)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  /** (identifier, info, builder) triples — the injectFunction payload. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - codegen'd double-array dot product"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))),
    (FunctionIdentifier("theta_agg"),
      info("theta_agg", "theta_agg(key) - theta distinct-set sketch (binary)"),
      (es: Seq[Expression]) => graft.functions.ThetaAgg(es.head)),
    (FunctionIdentifier("kll_agg"),
      info("kll_agg", "kll_agg(value) - KLL quantile sketch (binary)"),
      (es: Seq[Expression]) => graft.functions.KllAgg(es.head)))
}
