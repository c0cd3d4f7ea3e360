package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Pins for the persisted IVF index (sim_ivf_persist, also oracle-checked):
  * serving from the materialized index must equal the inline build exactly,
  * and the postings read must prune to the probed clusters at PLANNING time
  * (partition pruning over the cluster-partitioned parquet — the whole
  * point of persisting the inverted lists as the storage layout).
  */
class IvfPersistSpec extends SparkSuite with Matchers {

  test("served result ≡ the inline sim_ivf_topk result, row for row") {
    val dir = sf("sf0.001")
    val inline = graft.SparkEntry.queries("sim_ivf_topk")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val served = graft.SparkEntry.queries("sim_ivf_persist")(spark, dir)
      .collect().map(_.toSeq).toSeq
    served shouldBe inline
  }

  test("the postings scan carries a cluster partition filter — probe reads nprobe/K dirs") {
    // the served query plans its probed-cluster set as a partition filter
    // (at sf0.001 the 5×3 probes happen to cover all 10 clusters, so pin
    // the FILTER'S presence here and the pruning arithmetic below)
    val p = graft.SparkEntry.queries("sim_ivf_persist")(spark, sf("sf0.001"))
      .queryExecution.executedPlan.toString
    p should include("PartitionFilters: [cluster")

    // a 3-cluster probe over the same index prunes the scan to exactly
    // those partition directories at planning time
    import org.apache.spark.sql.functions.col
    val idx = Similarity.ivfIndexDir(spark, sf("sf0.001"))
    val pruned = spark.read.parquet(s"$idx/postings")
      .filter(col("cluster").isin(1, 4, 7))
    pruned.queryExecution.executedPlan.toString should
      include regex ("PartitionFilters: \\[cluster#\\d+ IN \\(1,4,7\\)")
    val full = spark.read.parquet(s"$idx/postings").count()
    pruned.count().toDouble should be < full * 0.5 // 3 of 10 lists read
  }
}
