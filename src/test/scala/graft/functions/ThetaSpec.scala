package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Pins for the theta-sketch aggregate (ev_theta_audience is additionally
  * oracle-checked end-to-end): exact below k, bounded error in estimation
  * mode, full set algebra on planted sets, and partitioning invariance of
  * the merge.
  */
class ThetaSpec extends SparkSuite with Matchers {

  private def sketchOf(ids: Seq[Long], parts: Int = 4): Array[Byte] = {
    import spark.implicits._
    ids.toDF("id").repartition(parts)
      .agg(ThetaAgg(col("id")).as("sk"))
      .collect().head.getAs[Array[Byte]]("sk")
  }

  test("below k the sketch is exact; set algebra matches planted overlap") {
    val a = ThetaAgg.wrap(sketchOf(1L to 300L))
    val b = ThetaAgg.wrap(sketchOf(201L to 500L))
    a.getEstimate shouldBe 300.0
    ThetaAgg.union(a, b).getEstimate shouldBe 500.0
    ThetaAgg.intersect(a, b).getEstimate shouldBe 100.0
    ThetaAgg.aNotB(a, b).getEstimate shouldBe 200.0
  }

  test("empty-sketch fallback is the set-algebra identity (empty-audience guard)") {
    // ev_theta_audience falls back to this when an audience has no
    // qualifying member (ADVICE r09) — all four operations must degrade to
    // the zero-count answers instead of throwing
    val e = ThetaAgg.wrap(ThetaAgg.emptySketchBytes)
    val a = ThetaAgg.wrap(sketchOf(1L to 100L))
    e.getEstimate shouldBe 0.0
    ThetaAgg.union(e, a).getEstimate shouldBe 100.0
    ThetaAgg.intersect(e, a).getEstimate shouldBe 0.0
    ThetaAgg.aNotB(e, a).getEstimate shouldBe 0.0
    ThetaAgg.aNotB(a, e).getEstimate shouldBe 100.0
  }

  test("estimation mode (n ≫ k): within 5% of the true distinct count") {
    val n = 50000L
    val est = ThetaAgg.wrap(sketchOf(1L to n)).getEstimate
    est shouldBe n.toDouble +- n * 0.05
  }

  test("merge is a set union: below k the serialized sketch is identical under any partitioning") {
    // below k every hash is retained (θ = 1), so the merged retained SET —
    // and its ordered compact serialization — cannot depend on how the
    // input was split; above k, θ depends on insertion history and only
    // the error bound (previous test) is guaranteed
    val once = sketchOf(1L to 3000L, parts = 1)
    val wide = sketchOf(1L to 3000L, parts = 17)
    wide shouldBe once
  }
}
