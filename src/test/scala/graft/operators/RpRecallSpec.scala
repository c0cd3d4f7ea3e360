package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Neighbour-preservation gate for projected-space search (sim_rp_topk,
  * also oracle-checked end-to-end): on CLUSTERED vectors — the regime the
  * JL lemma covers — the 16-dim integer search must return mostly the same
  * top-10 as full-space 64-dim search. (On pure-random vectors distances
  * concentrate and no 4× reduction preserves top-k; that regime is
  * documented, not gated.)
  */
class RpRecallSpec extends SparkSuite with Matchers {

  test("projected top-10 overlaps full-space top-10 ≥ 0.8 on clustered vectors") {
    import spark.implicits._
    val dim = Similarity.RpInDim
    // 3 well-separated clusters × 20 members; deterministic small offsets
    val vecs = for {
      g <- 0 until 3
      i <- 0 until 20
    } yield {
      val id = (g * 20 + i).toLong
      val v = Array.tabulate(dim) { d =>
        val center = if (d >= g * 3 && d < g * 3 + 3) 10.0f else 0.0f
        val jitter = if ((d + i) % 7 == 0) 0.3f * ((i % 5) - 2) else 0.0f
        center + jitter
      }
      (id, v)
    }
    val emb = vecs.toDF("vec_id", "embedding")

    val projected = Similarity.rpTopk(spark, emb)
      .select($"query_id", $"cand_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

    // full-space exact top-10 by L2 over the same query slice
    val full = {
      val pv = emb.select($"vec_id", graft.functions.Exprs.vecAsDouble($"embedding").as("v"))
      val q = pv.filter($"vec_id" < Similarity.RpQueryMax)
        .select($"vec_id".as("query_id"), $"v".as("qv"))
      val d2 = aggregate(zip_with($"qv", $"v", (a, b) => (a - b) * (a - b)),
        lit(0.0), (acc, x) => acc + x)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"query_id").orderBy($"d2", $"cand_id")
      pv.join(broadcast(q), $"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id".as("cand_id"), d2.as("d2"))
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= Similarity.RpTopK)
        .select($"query_id", $"cand_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    }

    full.keySet shouldBe projected.keySet
    val recalls = full.keys.toSeq.sorted.map { q =>
      val r = (projected(q) intersect full(q)).size.toDouble / full(q).size
      withClue(s"query $q recall $r") { r should be >= 0.5 }
      r
    }
    (recalls.sum / recalls.size) should be >= 0.8
  }
}
