package graft

/** Plan-evidence harness for pr_triangles (plans/r17): rebuilds the exact
  * triangle-counting frame (oriented edges → wedge join → closing-edge
  * join) at SPARK_GRAFT_SF_DIR and writes its `.explain("formatted")` to
  * the given file. `SPARK_GRAFT_TRI_CAP=0` forces the above-cap (shuffle)
  * branch so the before-shape is reproducible from the same code.
  *
  * Usage: sbt "runMain graft.GraphPlanProbe plans/r17/pr_triangles_after.txt"
  */
object GraphPlanProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: GraphPlanProbe <outFile>")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cap = sys.env.get("SPARK_GRAFT_TRI_CAP").map(_.toLong)
    val s = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]").appName("graph-plan-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._
    import org.apache.spark.sql.functions._
    val co = graft.operators.Graph.copurchaseEdges(s, sfDir).cache()
    val nEdges = co.count()
    val deg = co.select($"u".as("node")).union(co.select($"v"))
      .groupBy($"node").agg(count(lit(1)).as("d"))
    val ori = graft.operators.Graph.orientedEdges(s, co, deg).cache()
    ori.count()
    val frame = graft.operators.Graph.triangleClosures(s, ori,
      cap.map(c => if (nEdges > c) Long.MaxValue else nEdges).getOrElse(nEdges))
    val t0 = System.nanoTime()
    val n = frame.count()
    val wall = (System.nanoTime() - t0) / 1e9
    val txt = frame.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    java.nio.file.Files.write(java.nio.file.Paths.get(args(0)),
      (f"-- pr_triangles closing-wedge frame @ $sfDir (nEdges=$nEdges, " +
        f"capOverride=$cap, n_triangles=$n, count wall $wall%.2f s) --%n" + txt)
        .getBytes("UTF-8"))
    println(f"n_triangles=$n wall=$wall%.2f s -> ${args(0)}")
    s.stop()
  }
}
