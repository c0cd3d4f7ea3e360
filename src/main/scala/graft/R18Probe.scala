package graft

import org.apache.spark.sql.functions._

/** Round-18 measurement probe (guide §1: measure first). Dumps
  * `.explain("formatted")` of the inner iterative-step frames the round
  * touches (the PlanDump main only sees a checkpointed query's FINAL frame)
  * and times isolated phases with the noop sink.
  *
  * Usage: sbt "runMain graft.R18Probe <what> [outFile]"
  *   what ∈ nnd_rerank | pagerank_iter | hits_iter | nnd_time | ppjoin_time
  *
  * Master/paths come from SPARK_GRAFT_CPUS / SPARK_GRAFT_SF_DIR (ADVICE r17
  * #5: no box-specific hardcodes), defaulting to the bench session config.
  */
object R18Probe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: R18Probe <what> [outFile]")
    val what = args(0)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]").appName("r18-probe")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "8"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    import s.implicits._

    def dump(df: org.apache.spark.sql.DataFrame, header: String): Unit = {
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      args.lift(1) match {
        case Some(out) =>
          val p = java.nio.file.Paths.get(out)
          Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
          java.nio.file.Files.write(p,
            (s"-- $header @ $sfDir --\n" + txt).getBytes("UTF-8"))
          println(s"wrote $out")
        case None => println(s"-- $header --\n$txt")
      }
    }
    // second dump target: <arg1 path with "_before" replaced by "_after">
    def dump2(df: org.apache.spark.sql.DataFrame, header: String): Unit = {
      val saved = args.lift(1).map(_.replace("_before", "_after"))
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      saved match {
        case Some(out) if out != args(1) =>
          java.nio.file.Files.write(java.nio.file.Paths.get(out),
            (s"-- $header @ $sfDir --\n" + txt).getBytes("UTF-8"))
          println(s"wrote $out")
        case _ => println(s"-- $header --\n$txt")
      }
    }
    def timed(label: String)(thunk: => Unit): Unit = {
      val t0 = System.nanoTime()
      thunk
      println(f"$label%-32s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }

    what match {
      case "nnd_rerank" =>
        // ONE NN-descent round's candidate re-rank frame, exactly as
        // nndEdges composes it (init edges as the input edge set).
        val nodes = operators.GraphAnn.hnswNodes(Tables.embeddings(s, sfDir))
          .localCheckpoint()
        val n = nodes.count()
        val init = operators.GraphAnn.nndInit(s, nodes).localCheckpoint()
        val gen = init
          .union(init.select($"shard", $"dst".as("src"), $"src".as("dst")))
          .distinct()
        val cand = gen.as("g1")
          .join(broadcast(gen.as("g2")),
            $"g1.shard" === $"g2.shard" && $"g1.dst" === $"g2.src" &&
              $"g1.src" =!= $"g2.dst")
          .select($"g1.shard".as("shard"), $"g1.src".as("src"), $"g2.dst".as("dst"))
          .union(gen)
        dump(operators.GraphAnn.rerankEdges(nodes, cand, 12, Some(n)),
          "NN-descent round re-rank (rerankEdges over one round's candidates)")

      case "nnd_time" =>
        // per-job wall breakdown (the WalkProbe listener shape)
        val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
        val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
        s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            starts.put(j.jobId, System.nanoTime())
          override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
            Option(starts.get(j.jobId)).foreach { t0 =>
              lines.add(f"job ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
            }
        })
        val nodes = operators.GraphAnn.hnswNodes(Tables.embeddings(s, sfDir))
          .localCheckpoint()
        val n = nodes.count()
        for (pass <- 1 to 2) {
          lines.clear()
          timed(s"nndEdges full build pass $pass") {
            operators.GraphAnn.nndEdges(s, nodes, nOpt = Some(n))
              .write.format("noop").mode("overwrite").save()
          }
          Thread.sleep(300)
          lines.forEach(l => println(l))
        }

      case "pagerank_iter" =>
        // one pagerank iteration's frame over the cached edge layout —
        // dumps BOTH the r17 shuffle-join form ("before") and the r18
        // state-broadcast form ("after") from the same inputs (the
        // GraphPlanProbe force-either-branch discipline); arg(1) is used
        // as a directory: <out>/pr_pagerank_iter_{before,after}.txt
        val edges0 = operators.Graph.pagerankEdges(s, sfDir)
        val edges = edges0.select($"a", $"b")
          .union(edges0.select($"b".as("a"), $"a".as("b")))
          .repartition($"a").cache()
        val deg = edges.groupBy($"a".as("node")).agg(count(lit(1)).as("deg")).cache()
        val nNodes = deg.count()
        val r0 = operators.Graph.PrScale / nNodes
        val ranks = deg.select($"node", lit(r0).as("r")).localCheckpoint()
        def iterFrame(bc: Boolean) = {
          val shares0 = ranks.join(if (bc) broadcast(deg) else deg, "node")
            .select($"node", expr("r DIV deg").as("share"))
          val shares = if (bc) broadcast(shares0) else shares0
          edges.join(shares, edges("a") === shares("node"))
            .groupBy(edges("b").as("node"))
            .agg(sum($"share").as("acc"))
        }
        dump(iterFrame(false), s"pagerank one-iteration frame, r17 shuffle form (n_nodes=$nNodes)")
        dump2(iterFrame(true), s"pagerank one-iteration frame, r18 broadcast form (n_nodes=$nNodes)")

      case "hits_iter" =>
        val inc = s.read.parquet(operators.Graph.purchaseIncidence(s, sfDir))
          .select(concat(lit("c:"), $"custkey").as("c"),
            concat(lit("p:"), $"partkey").as("p"))
          .distinct()
        val edgesByC = inc.repartition($"c").cache()
        val nHubs = edgesByC.select($"c").distinct().count()
        val h0 = operators.Graph.PrScale / nHubs
        val hub = edgesByC.select($"c").distinct()
          .select($"c", lit(h0).as("h")).localCheckpoint()
        def halfStep(bc: Boolean) =
          edgesByC.join(if (bc) broadcast(hub) else hub, "c")
            .groupBy($"p").agg(sum($"h").as("raw"))
        dump(halfStep(false), s"hits one-half-step frame, r17 shuffle form (n_hubs=$nHubs)")
        dump2(halfStep(true), s"hits one-half-step frame, r18 broadcast form (n_hubs=$nHubs)")

      case "ppjoin_time" =>
        val docs = Tables.documents(s, sfDir)
        for (pass <- 1 to 2)
          timed(s"ppJoinPairs pass $pass") {
            operators.Dedup.ppJoinPairs(s, docs)
              .write.format("noop").mode("overwrite").save()
          }

      case other => sys.error(s"unknown probe: $other")
    }
    s.stop()
  }
}
