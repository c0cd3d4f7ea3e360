package graft

/** One-off measurement probe for the entry-seed signature path (guide §1).
  * Times memberSigs alone, then the full seedsOf chain, at sf0.1.
  */
object SeedProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]").appName("seed-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._
    import org.apache.spark.sql.functions._
    val nodes = graft.operators.GraphAnn.hnswNodes(Tables.embeddings(s, sfDir))
      .localCheckpoint()
    val q = nodes.filter($"vec_id" < graft.operators.GraphAnn.HnswQueryMax)
      .select($"vec_id".as("query_id"), $"v".as("qv"), $"nrm".as("qnrm"))
      .localCheckpoint()
    def t(label: String)(thunk: => Unit): Unit = {
      val t0 = System.nanoTime()
      thunk
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    for (pass <- 1 to 2) {
      println(s"--- pass $pass ---")
      t("memberSigs noop") {
        graft.operators.GraphAnn.memberSigs(nodes)
          .write.format("noop").mode("overwrite").save()
      }
      t("seedsOf noop") {
        graft.operators.GraphAnn.seedsOf(q, nodes, 1)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // optional plan dump (the r17 before/after evidence): first arg = file
    args.headOption.foreach { out =>
      val txt = graft.operators.GraphAnn.seedsOf(q, nodes, 1)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(out).getParent)
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        ("-- hnswWalk entry-seed derivation (seedsOf) @ " + sfDir + " --\n" + txt)
          .getBytes("UTF-8"))
      println(s"wrote $out")
    }
    s.stop()
  }
}
