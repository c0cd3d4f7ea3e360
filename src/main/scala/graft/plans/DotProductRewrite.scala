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
  import org.apache.spark.sql.AnalysisException
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
  import org.apache.spark.sql.types.IntegerType

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  /** Arity gate for the SQL builders: without it `graft_dot(x)` dies with
    * an IndexOutOfBoundsException and `kll_agg(v, 300)` would silently
    * ignore the 300 — a SQL user deserves the standard analysis error the
    * built-ins raise.
    */
  private def requireArity(name: String, es: Seq[Expression], expected: String): Unit = {
    val ok = expected.split("\\|").map(_.trim.toInt).toSet
    if (!ok.contains(es.length))
      throw new AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name`", "expectedNum" -> expected,
          "actualNum" -> es.length.toString, "docroot" -> "https://spark.apache.org/docs/latest"),
        cause = None)
  }

  private def literalK(es: Seq[Expression]): Int = es(1) match {
    case Literal(k: Int, IntegerType) => k
    case _ => throw new AnalysisException(
      errorClass = "NON_FOLDABLE_ARGUMENT",
      messageParameters = Map(
        "funcName" -> "`kll_agg`", "paramName" -> "`k`", "paramType" -> "\"INT\""),
      cause = None)
  }

  /** (identifier, info, builder) triples — the injectFunction payload. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - codegen'd double-array dot product"),
      (es: Seq[Expression]) => { requireArity("graft_dot", es, "2"); DotProduct(es(0), es(1)) }),
    (FunctionIdentifier("theta_agg"),
      info("theta_agg", "theta_agg(key) - theta distinct-set sketch (binary)"),
      (es: Seq[Expression]) => { requireArity("theta_agg", es, "1"); graft.functions.ThetaAgg(es.head) }),
    (FunctionIdentifier("kll_agg"),
      info("kll_agg", "kll_agg(value[, k]) - KLL quantile sketch (binary); k = sketch size parameter (default 200)"),
      (es: Seq[Expression]) => {
        requireArity("kll_agg", es, "1|2")
        if (es.length == 2) graft.functions.KllAgg(es.head, literalK(es))
        else graft.functions.KllAgg(es.head)
      }))
}
