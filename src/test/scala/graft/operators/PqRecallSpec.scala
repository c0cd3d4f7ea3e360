package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.{SparkSuite, Tables}
import graft.functions.Exprs

/** Measures sim_pq_adc's retrieval quality against the exact-L2 baseline
  * (the quantity PQ trades for its 64× storage cut) and pins the output
  * contract: 10 ranked rows per query, deterministic across runs.
  *
  * The recall bound is intentionally modest: the test embeddings are
  * near-random, the hardest case for PQ (no cluster structure for the
  * codebooks to exploit — real embedding corpora are far more compressible),
  * and one deterministic Lloyd step is a floor on codebook quality, not a
  * converged train. The IVF specs use the same clusterless-data rationale.
  */
class PqRecallSpec extends SparkSuite with Matchers {
  import spark.implicits._

  private lazy val adc = Similarity.pqAdc(spark, Tables.embeddings(spark, sf("sf0.01"))).collect()

  test("sim_pq_adc emits 10 ranked candidates per query, ranks contiguous") {
    val byQuery = adc.groupBy(_.getLong(0))
    byQuery.keySet shouldBe (0L until Similarity.PqQueryMax.toLong).toSet
    byQuery.values.foreach { rows =>
      rows.length shouldBe Similarity.PqTopK
      rows.map(_.getLong(3)).sorted shouldBe (1L to Similarity.PqTopK.toLong).toArray
      // ADC distances are non-negative and non-decreasing in rank
      val inRank = rows.sortBy(_.getLong(3)).map(_.getLong(2))
      inRank.head should be >= 0L
      inRank.zip(inRank.tail).foreach { case (a, b) => b should be >= a }
    }
  }

  test("sim_pq_adc top-10 overlaps the exact-L2 top-10") {
    val e = Tables.embeddings(spark, sf("sf0.01"))
      .select($"vec_id", Exprs.vecAsDouble($"embedding").as("v"))
    val q = e.filter($"vec_id" < Similarity.PqQueryMax)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val exact = broadcast(q).join(e.as("c"), $"query_id" =!= $"c.vec_id")
      .select($"query_id", $"c.vec_id".as("cand_id"),
        expr("aggregate(zip_with(qv, v, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)").as("d2"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"query_id")
          .orderBy($"d2".asc, $"cand_id".asc)))
      .filter($"rk" <= Similarity.PqTopK)
      .select($"query_id", $"cand_id")
      .collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val got = adc.groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val overlaps = exact.keys.toSeq.sorted.map { qid =>
      (exact(qid) intersect got(qid)).size.toDouble / Similarity.PqTopK
    }
    val mean = overlaps.sum / overlaps.length
    withClue(s"per-query overlap: $overlaps") {
      mean should be >= 0.2
    }
  }

  test("sim_pq_adc is deterministic across runs") {
    val again = Similarity.pqAdc(spark, Tables.embeddings(spark, sf("sf0.01"))).collect()
    again.map(_.toString) shouldBe adc.map(_.toString)
  }

  test("sampled codebook training: exact-L2 recall survives training on the stratum") {
    // the count overload is the valve input (the semBits/exactPairsVecs
    // discipline), so the spec can flip the training gate on the SAME
    // corpus: n at face value trains on every vector, n past the cap
    // trains on the vec_id % ExactPairsStride stratum while encoding all.
    // NOTE the pin is against the EXACT-L2 truth, not full-vs-sampled
    // top-10 agreement: on near-random vectors ADC distances sit at noise
    // level and any codebook perturbation reshuffles the (arbitrary)
    // top-10, so two equally-good codebooks can disagree almost entirely
    // while both recover the same exact-truth fraction — quality is
    // recall@truth (Jégou's own metric), not inter-codebook agreement.
    // sf0.1 (2 000 vectors) keeps the forced stratum at 500 training
    // vectors — the production gate's sample is >= cap/stride = 2 500, so
    // this is already a harsher case than any real over-cap corpus
    val emb = Tables.embeddings(spark, sf("sf0.1"))
    val n = emb.count()
    val e = emb.select($"vec_id", Exprs.vecAsDouble($"embedding").as("v"))
    val q = e.filter($"vec_id" < Similarity.PqQueryMax)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val exact = broadcast(q).join(e.as("c"), $"query_id" =!= $"c.vec_id")
      .select($"query_id", $"c.vec_id".as("cand_id"),
        expr("aggregate(zip_with(qv, v, (x, y) -> (x - y) * (x - y)), 0D, (acc, x) -> acc + x)").as("d2"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"query_id")
          .orderBy($"d2".asc, $"cand_id".asc)))
      .filter($"rk" <= Similarity.PqTopK)
      .select($"query_id", $"cand_id")
      .collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    def meanRecall(nArg: Long): Double = {
      val got = Similarity.pqAdc(spark, emb, nArg).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
      val o = exact.keys.toSeq.sorted.map(qid =>
        (exact(qid) intersect got(qid)).size.toDouble / Similarity.PqTopK)
      o.sum / o.length
    }
    val fullRecall = meanRecall(n)
    val sampledRecall = meanRecall(Dedup.ExactPairsDocCap + 1L)
    info(f"exact-L2 recall: full-trained=$fullRecall%.2f stratum-trained=$sampledRecall%.2f")
    // near-random 2 000-vector corpora give LOW absolute PQ recall at any
    // training size (the class caveat in the suite scaladoc) — the pin is
    // the sampled-vs-full GAP plus non-degeneracy, not an absolute floor
    sampledRecall should be >= fullRecall - 0.1
    sampledRecall should be > 0.0
  }

  test("trained codebook keeps all PqCodes cells live in full AND sampled modes") {
    // ADVICE r15: the old `vec_id % PqCodes` init over the stride-4
    // stratum only populated codes ≡ 0 mod 4, silently collapsing each
    // sub-quantizer from 16 to 4 centroids above the cap — and the
    // recall pin alone (near-noise absolute recall) could not see it.
    // This pins the cardinality directly in both modes. The one Lloyd
    // refinement step can legitimately kill an occasional cell (a code
    // whose init members all reassign elsewhere — ordinary k-means cell
    // death, observed: 15/16 on one sub at sf0.1), so the pin allows a
    // 2-cell margin; the init-collapse failure mode it guards against
    // sits at 4/16, far below it.
    val emb = Tables.embeddings(spark, sf("sf0.1"))
    val n = emb.count()
    for ((mode, nArg) <- Seq("full" -> n, "sampled" -> (Dedup.ExactPairsDocCap + 1L))) {
      val perSub = Similarity.pqCodebookOf(spark, emb, nArg)
        .groupBy($"sub").agg(countDistinct($"code").as("k"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      withClue(s"$mode-trained codebook cells per sub: $perSub") {
        perSub.keySet shouldBe (0 until Similarity.PqSubs).toSet
        perSub.values.foreach(_ should be >= (Similarity.PqCodes - 2).toLong)
      }
    }
  }

  test("sampled training preserves codebook reconstruction quality (MSE)") {
    import org.apache.spark.sql.DataFrame
    // reconstruction MSE of the stratum-trained codebook, measured over
    // the FULL corpus, vs the full-trained codebook's: the sample pays a
    // bounded quality premium, not a blowup
    val emb = Tables.embeddings(spark, sf("sf0.01"))
    val n = emb.count()
    def mse(adcOut: DataFrame): Double = {
      // proxy: mean ADC distance of each query's top-10 (micro-units) —
      // monotone in codebook reconstruction error on the same corpus
      adcOut.agg(avg($"adc_micro")).collect().head.getDouble(0)
    }
    val full = mse(Similarity.pqAdc(spark, emb, n))
    val sampled = mse(Similarity.pqAdc(spark, emb, Dedup.ExactPairsDocCap + 1L))
    info(f"top-10 mean ADC micro-distance: full=$full%.0f sampled=$sampled%.0f")
    sampled should be <= full * 1.25
  }
}
