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
  *    query_id. At 100 TB the candidate scan parallelizes linearly.
  *  - `sim_lsh_topk`: random-hyperplane LSH — the scale path. Each vector
  *    maps to a 16-bit bucket; only same-bucket candidates are ranked, so
  *    the join is bucket-equality (hash shuffle on a 2-byte key), never
  *    all-pairs. Hyperplanes are a fixed-seed constant, broadcast as
  *    literals.
  */
object Similarity {

  private val Dim = 64
  private val NPlanes = 16

  /** Fixed-seed Gaussian hyperplanes (deterministic across runs/executors). */
  private lazy val planes: Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(NPlanes)(Seq.fill(Dim)(rnd.nextGaussian()))
  }

  val defs: Seq[QueryDef] = Seq(

    sqlChecked(
      "sim_topk_bruteforce",
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
        |    round(list_sum(list_transform(generate_series(1, len(q.v)), i -> q.v[i] * c.v[i]))
        |      / (sqrt(list_sum(list_transform(q.v, x -> x*x)))
        |         * sqrt(list_sum(list_transform(c.v, x -> x*x)))), 6) AS cos
        |  FROM v q JOIN v c ON q.vec_id <> c.vec_id WHERE q.vec_id < 5),
        |ranked AS (
        |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rk
        |  FROM scored)
        |SELECT query_id, cand_id, cos, rk FROM ranked WHERE rk <= 10
        |ORDER BY query_id, rk""".stripMargin) { (s, dir) =>
      import s.implicits._
      val e = Tables.embeddings(s, dir)
        .select($"vec_id", Exprs.vecAsDouble($"embedding").as("v"))
      val q = e.filter($"vec_id" < 5)
      val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"cand_id".asc)
      broadcast(q).as("q")
        .join(e.as("c"), $"q.vec_id" =!= $"c.vec_id")
        .select($"q.vec_id".as("query_id"), $"c.vec_id".as("cand_id"),
          round(Exprs.cosine($"q.v", $"c.v"), 6).as("cos"))
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 10)
        .select($"query_id", $"cand_id", $"cos", $"rk".cast("long").as("rk"))
        .orderBy($"query_id", $"rk")
    },

    rowsOnly("sim_lsh_topk") { (s, dir) =>
      import s.implicits._
      val planeCols = planes.map(p => array(p.map(lit): _*))
      val bucketBits = (0 until NPlanes)
        .map(p => when(Exprs.dot(col("v"), planeCols(p)) > 0, lit(1L << p)).otherwise(lit(0L)))
        .reduce((a, b) => a.bitwiseOR(b))
      val e = Tables.embeddings(s, dir)
        .select($"vec_id", Exprs.vecAsDouble($"embedding").as("v"))
        .withColumn("bucket", bucketBits)
      val q = e.filter($"vec_id" < 5)
        .select($"vec_id".as("query_id"), $"v".as("qv"), $"bucket".as("qbucket"))
      val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"cand_id".asc)
      broadcast(q)
        .join(e.as("c"), $"qbucket" === $"c.bucket" && $"query_id" =!= $"c.vec_id")
        .select($"query_id", $"c.vec_id".as("cand_id"),
          round(Exprs.cosine($"qv", $"c.v"), 6).as("cos"))
        .withColumn("rk", row_number().over(w))
        .filter($"rk" <= 10)
        .select($"query_id", $"cand_id", $"cos", $"rk".cast("long").as("rk"))
        .orderBy($"query_id", $"rk")
    }
  )
}
