package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite
import graft.functions.Exprs

/** The optimizer rule must turn the user-facing composable dot-product idiom
  * into the codegen'd DotProduct — same results, faster plan. Inputs come
  * from parquet (not local Seqs): ConvertToLocalRelation constant-folds
  * local inputs before any custom rule can be observed.
  */
class DotProductRewriteSpec extends SparkSuite with Matchers {

  private val dir = sf("sf0.001")

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def withRule[T](body: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ DotProductRewrite
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == DotProductRewrite)
  }

  private def vectors = {
    import spark.implicits._
    graft.Tables.embeddings(spark, dir)
      .filter($"vec_id" < 20)
      .select($"vec_id", Exprs.vecAsDouble($"embedding").as("v"))
  }

  test("rewrites aggregate(zip_with(*)) to graft_dot with identical results") {
    import spark.implicits._
    val q = vectors.select($"vec_id", hofDot($"v", $"v").as("d")).orderBy($"vec_id")
    val plain = q.collect().map(_.getDouble(1)).toSeq
    withRule {
      val optimized = vectors.select($"vec_id", hofDot($"v", $"v").as("d")).orderBy($"vec_id")
      optimized.queryExecution.optimizedPlan.toString should include("graft_dot")
      // bitwise-identical: both forms fold sequentially in index order
      optimized.collect().map(_.getDouble(1)).toSeq shouldBe plain
    }
  }

  test("ragged lengths: both forms yield NULL — rewrite is semantics-preserving") {
    import spark.implicits._
    // zip_with pads the shorter array with null and null*x then acc+null
    // propagate, so the HOF form yields null; DotProduct must match (it
    // returns null on length mismatch), or the globally-registered rule
    // would silently change user query results on ragged inputs.
    val ragged = vectors.filter($"vec_id" === 0)
      .select($"v".as("a"), slice($"v", 1, 1).as("b"))
    ragged.select(hofDot($"a", $"b").as("d")).collect().head.isNullAt(0) shouldBe true
    withRule {
      val optimized = ragged.select(hofDot($"a", $"b").as("d"))
      optimized.queryExecution.optimizedPlan.toString should include("graft_dot")
      optimized.collect().head.isNullAt(0) shouldBe true
    }
  }

  test("null elements: both forms yield NULL — rewrite is semantics-preserving") {
    import spark.implicits._
    // A null element makes the zipped product null and the fold null.
    val withNullElem = vectors.filter($"vec_id" === 0)
      .select($"v".as("a"),
        concat(slice($"v", 1, 3), array(lit(null).cast("double")),
          slice($"v", 5, 60)).as("b"))
    withNullElem.select(hofDot($"a", $"b").as("d"))
      .collect().head.isNullAt(0) shouldBe true
    withRule {
      val optimized = withNullElem.select(hofDot($"a", $"b").as("d"))
      optimized.queryExecution.optimizedPlan.toString should include("graft_dot")
      optimized.collect().head.isNullAt(0) shouldBe true
    }
  }

  test("rule does not fire on non-dot aggregates") {
    import spark.implicits._
    withRule {
      // sum of pairwise MAX — shares the shape but not the multiply lambda
      val q = vectors.select(
        aggregate(zip_with($"v", $"v", (x, y) => greatest(x, y)), lit(0.0), (acc, x) => acc + x).as("m"))
      (q.queryExecution.optimizedPlan.toString should not).include("graft_dot")
      q.collect().length shouldBe 20
    }
  }
}
