package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Invariants of sim_quantize_int8 that hold for ANY input (the oracle row
  * pins cross-engine equality on the testdata; these pin that the numbers
  * mean int8 quantization): the max-magnitude element saturates to ±127,
  * no element exceeds the int8 range, the quantized norm reconstructs the
  * true norm within the rounding budget, and the MSE respects the
  * per-element bound (scale/2)² of round-to-nearest.
  */
class QuantizeSpec extends SparkSuite with Matchers {

  test("sim_quantize_int8: saturation, range, norm reconstruction and MSE bound") {
    val rows = graft.SparkEntry.queries("sim_quantize_int8")(spark, sf("sf0.001")).collect()
    rows.length should be > 0
    // Dimension comes from the data, not a literal (ADVICE r07): a hardcoded
    // 64 silently weakens or spuriously fails these bounds if the embeddings
    // testdata dimension changes.
    val dim = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .selectExpr("size(embedding) AS d").head().getInt(0).toLong
    dim should be > 0L
    for (r <- rows) {
      val (scale, qnormSq, nSat, mse) =
        (r.getDouble(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      scale should be > 0.0
      // the max-|x| element quantizes to round(±127.0) — at least one hit
      nSat should be >= 1L
      // no element can exceed 127 in magnitude, so qnorm_sq <= d * 127²
      qnormSq should be <= dim * 127 * 127
      qnormSq should be > 0L
      // per-element rounding error <= scale/2 → mse <= (scale/2)²
      mse should be <= (scale / 2) * (scale / 2) + 1e-15
      // reconstructed norm within the rounding budget of the true norm
      // (embeddings are unit vectors): |sqrt(qnorm_sq)*scale - 1| <= d·(scale/2)
      val rec = math.sqrt(qnormSq.toDouble) * scale
      math.abs(rec - 1.0) should be <= dim * scale / 2
    }
  }
}
