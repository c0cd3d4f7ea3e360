package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** mm_embed_ann's values are fully oracle-replayed; this pins the SEMANTIC
  * claims the hash alone doesn't state: the embedding is exactly zero-mean
  * per image (the DC brightness component is gone, which is what makes
  * cosine discriminative), and the planted near-duplicate (ph_1000 = base
  * ph_0 with a perturbed corner) is base 0's nearest neighbour by a wide
  * cosine margin — the pixel embedding functions as a similarity feature,
  * not just a deterministic number.
  */
class MmEmbedSpec extends SparkSuite with Matchers {

  test("embeddings are exactly zero-mean per image") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val bad = Multimodal.embedFrames(spark).toDF()
      .select(aggregate($"e", lit(0L), (acc, x) => acc + x).as("s"))
      .filter($"s" =!= 0L)
      .count()
    bad shouldBe 0L
  }

  test("planted near-dup is the base image's rank-1 neighbour with margin") {
    val rows = graft.SparkEntry.queries("mm_embed_ann")(spark, sf("sf0.001")).collect()
    val q0 = rows.filter(_.getLong(0) == 0L).sortBy(_.getLong(3))
    q0.head.getLong(1) shouldBe 1000L
    q0.head.getDouble(2) should be > 0.95
    q0(1).getDouble(2) should be < 0.6
  }
}
