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
}
