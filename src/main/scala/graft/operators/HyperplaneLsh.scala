package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Exprs

/** Random-hyperplane (SimHash-for-vectors) LSH shared by the embedding
  * near-dup and ANN operators.
  *
  * OR-amplification: `L` independent tables of `b` hyperplanes each. A pair
  * with angle θ collides in one table with prob (1-θ/π)^b and in at least one
  * of L tables with prob 1-(1-(1-θ/π)^b)^L. Round 1 used a single 16-plane
  * table — each vector landed in a 1-in-65k bucket, so candidate sets (and
  * recall) were empty. With L=24, b=4 the collision probability for a
  * cos ≥ 0.24 neighbor is ≥ 0.9; recall is pinned by LshRecallSpec.
  *
  * Scale: each vector maps to exactly L (table, bucket) keys, so candidate
  * generation is an equi-join on a 2-int key — shuffle-partitionable, never
  * all-pairs. The driver testdata is *random* (no cluster structure), the
  * adversarial case for ANN: buckets stay balanced, and the candidate set is
  * a large fraction of n. On real clustered embeddings the same plan prunes
  * to near-neighbors only; the plan shape, not the testdata selectivity, is
  * the 100 TB argument.
  *
  * Hyperplanes are a fixed-seed constant folded into the plan as literals —
  * identical on every executor, every run, every engine.
  */
object HyperplaneLsh {

  val Dim = 64
  val Tables = 24
  val PlanesPerTable = 4

  /** Fixed-seed Gaussian hyperplanes (deterministic: java.util.Random(42)). */
  private lazy val planes: IndexedSeq[IndexedSeq[Double]] = {
    val rnd = new scala.util.Random(42)
    IndexedSeq.fill(Tables * PlanesPerTable)(IndexedSeq.fill(Dim)(rnd.nextGaussian()))
  }

  private def planeCol(p: Int): Column = array(planes(p).map(lit): _*)

  /** Bucket id (0..2^b-1) of vector column `v` in table `t`. */
  private def bucketBits(v: Column, t: Int): Column =
    (0 until PlanesPerTable)
      .map { i =>
        val p = t * PlanesPerTable + i
        when(Exprs.dot(v, planeCol(p)) > 0, lit(1 << i)).otherwise(lit(0))
      }
      .reduce(_.bitwiseOR(_))

  /** One row per (input row × table): columns of `df` + `lsh_table`,
    * `lsh_bucket`. The L bucket ids are computed in a single projection
    * (L×b codegen'd dot products) then exploded — one scan, no shuffle.
    */
  def bucketed(df: DataFrame, v: Column): DataFrame = {
    val entries = (0 until Tables).map { t =>
      struct(lit(t).as("t"), bucketBits(v, t).as("bk"))
    }
    df.withColumn("lsh", explode(array(entries: _*)))
      .withColumn("lsh_table", col("lsh.t"))
      .withColumn("lsh_bucket", col("lsh.bk"))
      .drop("lsh")
  }
}
