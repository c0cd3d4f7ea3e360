package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** sim_kmeans_train's full trajectory is oracle-replayed; this pins the
  * invariants the hash doesn't name: every vector is assigned exactly once
  * (membership conserves the corpus), the integer pipeline is bit-stable
  * across repeated runs (no RNG, no float drift — the property that makes
  * iterating safe), and training actually moves: the final centroids are
  * not the init vectors.
  */
class KmeansTrainSpec extends SparkSuite with Matchers {

  test("membership conserves the corpus; reruns are bit-identical; centroids moved") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = sf("sf0.001")
    val run1 = graft.SparkEntry.queries("sim_kmeans_train")(spark, dir).collect()
    val run2 = graft.SparkEntry.queries("sim_kmeans_train")(spark, dir).collect()
    run1.map(_.toSeq) shouldBe run2.map(_.toSeq)
    run1.length shouldBe Similarity.KmK
    val total = graft.Tables.embeddings(spark, dir).count()
    run1.map(_.getLong(1)).sum shouldBe total
    // init centroid j = quantized vector j; training must have moved at
    // least one centroid off its init checksum
    val initSums = graft.Tables.embeddings(spark, dir)
      .filter($"vec_id" < Similarity.KmK)
      .select($"vec_id",
        aggregate(transform(graft.functions.Exprs.vecAsDouble($"embedding"),
          x => (round(x * 1e6) + lit(1e8)).cast("long")), lit(0L), (a, x) => a + x).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val moved = run1.count(r => initSums(r.getLong(0)) != r.getLong(3))
    moved should be > 0
  }
}
