package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite
import graft.functions.Exprs

/** Pins the MIPS norm-augmentation reduction as a theorem on the real
  * corpus, independently of sim_mips_topk's oracle replay:
  *  1. ranking by augmented-space cosine returns the SAME top-10
  *     inner-product sequence as ranking by the inner product directly
  *     (score-sequence equality is robust to id swaps between equal
  *     scores);
  *  2. q̃·x̃ equals q·x at float precision (the appended query coordinate
  *     is exactly 0.0);
  *  3. every augmented database vector's norm is M within float error.
  */
class MipsSpec extends SparkSuite with Matchers {

  test("augmented-cosine top-10 == inner-product top-10 (score sequences)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val e = graft.Tables.embeddings(spark, sf("sf0.01"))
      .select($"vec_id", Exprs.vecAsDouble($"embedding").as("v"))
      .withColumn("nrm", Exprs.l2norm($"v"))
    val m = e.agg(max($"nrm")).collect().head.getDouble(0)
    val aug = e.select($"vec_id",
        concat($"v", array(sqrt(greatest(lit(0.0), lit(m * m) - $"nrm" * $"nrm")))).as("av"))
      .withColumn("anrm", Exprs.l2norm($"av"))
    // 3. constant augmented norm
    aug.agg(max(abs($"anrm" - lit(m)))).collect().head.getDouble(0) should be < 1e-6
    val queries = e.filter($"vec_id" < 5)
      .select($"vec_id".as("qid"), $"v".as("qv"), concat($"v", array(lit(0.0))).as("aq"),
        $"nrm".as("qnrm"))
    val scored = broadcast(queries).join(aug.as("c"), $"qid" =!= $"c.vec_id")
      .select($"qid", $"c.vec_id".as("cid"),
        Exprs.dot($"qv", expr("slice(c.av, 1, 64)")).as("ip_direct"),
        Exprs.dot($"aq", $"c.av").as("ip_aug"),
        (Exprs.dot($"aq", $"c.av") / ($"qnrm" * lit(m))).as("mips_cos"))
      .collect()
    // 2. q̃·x̃ == q·x exactly
    scored.foreach { r =>
      r.getDouble(3) shouldBe r.getDouble(2)
    }
    // 1. per-query top-10 score sequences agree between the two rankings
    scored.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byCos = rows.sortBy(r => (-r.getDouble(4), r.getLong(1))).take(10).map(_.getDouble(3))
      val byIp = rows.sortBy(r => (-r.getDouble(3), r.getLong(1))).take(10).map(_.getDouble(3))
      byCos shouldBe byIp
    }
  }
}
