package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.{SparkSuite, Tables}
import graft.functions.Exprs

/** Retrieval-quality and routing gates for the composed IVFADC operator
  * (sim_ivfpq_adc, also oracle-checked end-to-end): the coarse quantizer
  * must route queries to the right inverted lists, and residual-PQ scoring
  * must preserve the exact-L2 neighbourhood on clustered vectors — the
  * regime the composition exists for (the PqRecallSpec clusterless-data
  * rationale applies to the sf0.01 corpus checks).
  */
class IvfPqRecallSpec extends SparkSuite with Matchers {
  import spark.implicits._

  private lazy val adc =
    Similarity.ivfPqAdc(spark, Tables.embeddings(spark, sf("sf0.01"))).collect()

  // 5 well-separated clusters × 12 members with per-cluster labels (the
  // coarse quantizer trains on them); queries 0-4 live in cluster 0.
  private def clustered = {
    val dim = Similarity.PqSubs * Similarity.PqSubDim
    val vecs = for {
      g <- 0 until 5
      i <- 0 until 12
    } yield {
      val id = (g * 12 + i).toLong
      val v = Array.tabulate(dim) { d =>
        val center = if (d >= g * 3 && d < g * 3 + 3) 10.0f else 0.0f
        val jitter = if ((d + i) % 7 == 0) 0.3f * ((i % 5) - 2) else 0.0f
        center + jitter
      }
      (id, v, g)
    }
    vecs.toDF("vec_id", "embedding", "label")
  }

  test("sim_ivfpq_adc emits 10 ranked candidates per query, distances non-decreasing") {
    val byQuery = adc.groupBy(_.getLong(0))
    byQuery.keySet shouldBe (0L until Similarity.PqQueryMax.toLong).toSet
    byQuery.values.foreach { rows =>
      rows.length shouldBe Similarity.PqTopK
      rows.map(_.getLong(3)).sorted shouldBe (1L to Similarity.PqTopK.toLong).toArray
      val inRank = rows.sortBy(_.getLong(3)).map(_.getLong(2))
      inRank.head should be >= 0L
      inRank.zip(inRank.tail).foreach { case (a, b) => b should be >= a }
    }
  }

  test("coarse routing + residual ADC recover the exact top-10 on clustered vectors") {
    val emb = clustered
    val got = Similarity.ivfPqAdc(spark, emb).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // the query's true neighbourhood is its own well-separated cluster —
    // every returned candidate staying in cluster 0 proves the coarse
    // quantizer routed the probe correctly
    got.values.flatten.foreach(_ should be < 12L)
    // exact full-space L2 top-10 over the same query slice
    val pv = emb.select($"vec_id", Exprs.vecAsDouble($"embedding").as("v"))
    val q = pv.filter($"vec_id" < Similarity.PqQueryMax)
      .select($"vec_id".as("query_id"), $"v".as("qv"))
    val d2 = aggregate(zip_with($"qv", $"v", (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"d2", $"cand_id")
    val exact = pv.join(broadcast(q), $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("cand_id"), d2.as("d2"))
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= Similarity.PqTopK)
      .select($"query_id", $"cand_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val recalls = exact.keys.toSeq.sorted.map { qid =>
      (exact(qid) intersect got(qid)).size.toDouble / Similarity.PqTopK
    }
    withClue(s"per-query recall $recalls") {
      (recalls.sum / recalls.size) should be >= 0.8
    }
  }

  test("sim_ivfpq_adc is deterministic across runs") {
    val again =
      Similarity.ivfPqAdc(spark, Tables.embeddings(spark, sf("sf0.01"))).collect()
    again.map(_.toString) shouldBe adc.map(_.toString)
  }
}
