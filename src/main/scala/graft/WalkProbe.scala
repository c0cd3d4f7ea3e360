package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Measurement probe for the ANN serve path (guide §1: measure first).
  * Runs one named sim_hnsw query at SPARK_GRAFT_SF_DIR under the bench
  * session config and prints every Spark job's (description, wall ms) so
  * per-phase cost inside the localCheckpoint-stepped walk is attributable —
  * the walk's phases are labeled via setJobDescription in GraphAnn.
  *
  * Usage: sbt "runMain graft.WalkProbe sim_hnsw_persist"
  */
object WalkProbe {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "sim_hnsw_persist"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]").appName("walk-probe")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    s.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        starts.put(j.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.get(j.jobId)).foreach { case (t0, desc) =>
          lines.add(f"job ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e6}%8.1f ms  $desc")
        }
      }
    })
    // warm run (build memos + JIT), then the measured run
    for (pass <- 1 to 2) {
      lines.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(s, sfDir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      println(s"===== $name pass $pass wall ${f"$wall%.2f"} s =====")
      Thread.sleep(500)
      lines.forEach(l => println(l))
    }
    s.stop()
  }
}
