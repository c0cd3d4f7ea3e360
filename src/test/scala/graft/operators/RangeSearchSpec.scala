package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Pins for the pruned range search that the oracle (which only proves
  * exactness on the weakly-clustered corpus) can't show: on SEPARABLE
  * clusters the angular-radius bound really skips partitions, and the
  * pruned result still equals brute force exactly.
  */
class RangeSearchSpec extends SparkSuite with Matchers {

  test("planted clusters: pruning skips partitions, result stays exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 4 tight axis-aligned clusters (the IvfIncrSpec geometry): queries
    // (vec_id < 5) live in cluster 2, so clusters far from it must prune.
    val dim = 64
    def vec(axis: Int, perturbAxis: Int, eps: Float): Array[Float] = {
      val a = Array.fill(dim)(0f); a(axis) = 10f; a(perturbAxis) += eps; a
    }
    val rows = (0L until 80L).map { id =>
      val lab = if (id < 5) 2 else (id % 4).toInt
      (id, vec(lab, 40 + (id % 8).toInt, 0.1f), lab)
    }
    val planted = java.nio.file.Files.createTempDirectory("graft-range").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$planted/embeddings.parquet")

    val (res, scanned, total) = Similarity.rangeSearchPruned(spark, planted, 0.25)
    scanned should be < total // the bound skipped at least one partition
    scanned should be >= 1L

    // exactness vs in-spec brute force, same rounding and threshold
    val e = spark.read.parquet(s"$planted/embeddings.parquet")
      .select($"vec_id", graft.functions.Exprs.vecAsDouble($"embedding").as("v"))
      .withColumn("nrm", graft.functions.Exprs.l2norm($"v"))
    val q = e.filter($"vec_id" < 5)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qnrm"))
    val bf = broadcast(q).join(e.as("c"), $"query_id" =!= $"c.vec_id")
      .select($"query_id", $"c.vec_id".as("cand_id"),
        round(graft.functions.Exprs.dot($"qv", $"c.v") / ($"qnrm" * $"c.nrm"), 6).as("cos"))
      .filter($"cos" >= 0.25)
    bf.count() should be > 0L // the planted geometry yields real results
    res.count() shouldBe bf.count()
    res.join(bf, Seq("query_id", "cand_id", "cos")).count() shouldBe bf.count()
  }
}
