package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** JL-property pins for the Rademacher random projection (sim_rp_project,
  * also oracle-checked coordinate-by-coordinate): norms are preserved in
  * expectation (mean ratio over the corpus tight around 1), and a basis
  * vector projects to exactly its sign column / 4 — the deterministic
  * seed's exactness case.
  */
class RpProjectSpec extends SparkSuite with Matchers {

  test("mean squared-norm ratio over the corpus is ≈ 1 (E‖y‖² = ‖x‖²)") {
    import spark.implicits._
    val emb = graft.Tables.embeddings(spark, sf("sf0.001"))
    val proj = Similarity.rpProject(spark, emb)
    val projNorm = proj
      .select($"vec_id", ($"proj_micro" / 1e6) * ($"proj_micro" / 1e6) as "c2")
      .groupBy($"vec_id").agg(sum($"c2").as("y2"))
    val inNorm = emb.select($"vec_id",
      aggregate(transform(graft.functions.Exprs.vecAsDouble($"embedding"), x => x * x),
        lit(0.0), (a, x) => a + x).as("x2"))
    val ratios = projNorm.join(inNorm, "vec_id")
      .select(($"y2" / $"x2").as("r")).collect().map(_.getDouble(0))
    val mean = ratios.sum / ratios.length
    // per-vector σ = √(2/16) ≈ 0.35; the corpus mean concentrates ~σ/√n —
    // [0.8, 1.2] is a ≥ 4σ band at n = 50
    mean should (be >= 0.8 and be <= 1.2)
  }

  test("a basis vector projects to exactly its sign column / 4") {
    import spark.implicits._
    val dim = Similarity.RpInDim
    val e0 = Seq((0L, Array.tabulate(dim)(i => if (i == 0) 1.0f else 0.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.rpProject(spark, e0)
      .orderBy($"j").collect().map(_.getLong(2))
    got should have length Similarity.RpOutDim
    // each coordinate is ±1/4 in micro-units, sign decided by the md5 seed
    got.foreach(v => math.abs(v) shouldBe 250000L)
  }
}
