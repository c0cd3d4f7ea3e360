package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.{SparkSuite, Tables}

/** Fixed points for the Matryoshka truncate-then-rerank eval that the
  * oracle (a full replay) can't distinguish from a coincidentally-equal
  * reimplementation:
  *  - all signal in the prefix → both stages perfect (1.0 / 1.0);
  *  - a prefix-blind corpus where the truth sits inside the id-tie-broken
  *    shortlist but outside the truncated top-10 → the rerank recovers
  *    EXACTLY what the shortlist retained (0.0 / 1.0);
  *  - the subset guarantee recall_rerank >= recall_trunc holds on real
  *    data (a truncated-top-10 truth hit is in the shortlist, and a
  *    global full-cos top-10 item is top-10 by full cos in ANY subset).
  */
class DimTruncateSpec extends SparkSuite with Matchers {

  private val D = 64
  private val TD = Similarity.TruncDims

  test("prefix-informative corpus: both stages perfect") {
    import spark.implicits._
    // signal only in the first TD dims, zero tail → truncated cosine IS
    // the full cosine, so the truncated ranking is already the truth
    val vecs = (0L until 40L).map { i =>
      val v = new Array[Float](D)
      for (j <- 0 until TD) v(j) = (((i * 7 + j * 3) % 11) - 5).toFloat
      if (v.take(TD).forall(_ == 0f)) v(0) = 1f
      (i, v.toSeq)
    }
    val r = Similarity.mrlEval(spark, vecs.toDF("vec_id", "embedding")).collect()
    r.length shouldBe 5
    r.foreach { row =>
      row.getDouble(3) shouldBe 1.0 // recall_trunc
      row.getDouble(4) shouldBe 1.0 // recall_rerank
    }
  }

  test("prefix-blind corpus: rerank recovers exactly what the shortlist kept") {
    import spark.implicits._
    // identical all-ones prefix (tcos == 1.0 for every pair → the
    // truncated ranking degrades to the cand_id tie-break) and all signal
    // in the tail NORM: full cosine = P/(|q||c|) ranks candidates by
    // ascending norm. Ids 21..30 get zero tails (smallest norm → the
    // truth top-10), every other candidate a big tail, queries the
    // biggest (so they rank last as candidates).
    val vecs = (0L until 45L).map { i =>
      val v = Array.fill(D)(0f)
      for (j <- 0 until TD) v(j) = 1f
      val tail =
        if (i < 5) 10f                        // queries: largest norm
        else if (i >= 21 && i <= 30) 0f       // the planted truth
        else 2f + (i % 7) * 0.25f             // mid-pack, varied
      v(TD + (i % (D - TD)).toInt) = tail
      (i, v.toSeq)
    }
    val r = Similarity.mrlEval(spark, vecs.toDF("vec_id", "embedding"))
      .collect().map(row => row.getLong(0) ->
        (row.getDouble(3), row.getDouble(4))).toMap
    r.keySet shouldBe Set(0L, 1L, 2L, 3L, 4L)
    r.values.foreach { case (trunc, rerank) =>
      trunc shouldBe 0.0   // truth 21..30 is outside the id-order top-10
      rerank shouldBe 1.0  // but inside the 30-wide shortlist
    }
  }

  test("subset guarantee on real data: rerank recall >= truncated recall") {
    val r = Similarity.mrlEval(spark, Tables.embeddings(spark, sf("sf0.001")))
      .collect()
    r.length shouldBe 5
    r.foreach { row =>
      row.getDouble(4) should be >= row.getDouble(3)
    }
  }
}
