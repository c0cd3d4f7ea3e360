package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.QueryDef.{rowsOnly, sqlChecked}
import graft.functions.Exprs

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`Array[Float]` column, dim 64).
  *
  *  - `sim_topk_bruteforce`: exact top-k cosine — the correctness baseline.
  *    The (small) query set is broadcast, so the big candidate side is
  *    scanned once with no shuffle; per-query ranking is a window over
  *    query_id. At 100 TB the candidate scan parallelizes linearly. Norms
  *    are computed once per row before the join; the per-pair dot product
  *    is the codegen'd DotProduct expression.
  *  - `sim_lsh_topk`: OR-amplified random-hyperplane LSH ([[HyperplaneLsh]],
  *    L=24 tables × b=4 planes) — the scale path. Candidate generation is an
  *    equi-join on (table, bucket); only candidates are exactly scored.
  *    Top-10 overlap vs the brute-force baseline is asserted ≥ 0.8 by
  *    LshRecallSpec (round 1's single-table variant returned 0 rows).
  */
object Similarity {

  val defs: Seq[QueryDef] = Seq(

    sqlChecked(
      "sim_topk_bruteforce",
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM v),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |    round(list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]))
        |      / (q.nrm * c.nrm), 6) AS cos
        |  FROM n q JOIN n c ON q.vec_id <> c.vec_id WHERE q.vec_id < 5),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rk
        |  FROM scored)
        |SELECT query_id, cand_id, cos, rk FROM ranked WHERE rk <= 10
        |ORDER BY query_id, rk""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = Tables.embeddings(s, dir)
        .select($"vec_id", Exprs.vecAsDouble($"embedding").as("v"))
        .withColumn("nrm", Exprs.l2norm($"v"))
      val q = e.filter($"vec_id" < 5)
        .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qnrm"))
      val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"cand_id".asc)
      broadcast(q)
        .join(e.as("c"), $"query_id" =!= $"c.vec_id")
        .select($"query_id", $"c.vec_id".as("cand_id"),
          round(Exprs.dot($"qv", $"c.v") / ($"qnrm" * $"c.nrm"), 6).as("cos"))
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 10)
        .select($"query_id", $"cand_id", $"cos", $"rk".cast("long").as("rk"))
        .orderBy($"query_id", $"rk")
    },

    rowsOnly("sim_lsh_topk") { (s, dir) =>
      import s.implicits._
      val e = Tables.embeddings(s, dir)
        .select($"vec_id", Exprs.vecAsDouble($"embedding").as("v"))
        .withColumn("nrm", Exprs.l2norm($"v"))
      val buckets = HyperplaneLsh.bucketed(e, $"v")
        .select($"vec_id", $"lsh_table", $"lsh_bucket")
      val qb = buckets.filter($"vec_id" < 5).select(
        $"vec_id".as("query_id"), $"lsh_table", $"lsh_bucket")
      // Candidate ids via bucket equality in ANY of the L tables, then one
      // exact scoring pass per distinct candidate (never per bucket hit).
      val cands = broadcast(qb)
        .join(buckets.as("c"),
          qb("lsh_table") === $"c.lsh_table" && qb("lsh_bucket") === $"c.lsh_bucket"
            && $"query_id" =!= $"c.vec_id")
        .select($"query_id", $"c.vec_id".as("cand_id"))
        .distinct()
      val q = e.select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qnrm"))
        .filter($"query_id" < 5)
      val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"cand_id".asc)
      cands
        .join(broadcast(q), Seq("query_id"))
        .join(e.as("c"), $"cand_id" === $"c.vec_id")
        .select($"query_id", $"cand_id",
          round(Exprs.dot($"qv", $"c.v") / ($"qnrm" * $"c.nrm"), 6).as("cos"))
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 10)
        .select($"query_id", $"cand_id", $"cos", $"rk".cast("long").as("rk"))
        .orderBy($"query_id", $"rk")
    }
  )
}
