package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Checkpoint-recovery and sink-idempotence pins for the exactly-once
  * upsert topology (ev_stream_upsert, also DuckDB-oracle-checked): a
  * restarted query resumes from the checkpoint and processes ONLY new
  * input; already-written batch partitions are never touched; a replay
  * with no new data changes nothing; and the materialized last-write-wins
  * state always equals the batch aggregate over everything ingested so
  * far.
  */
class StreamRestartSpec extends SparkSuite with Matchers {

  test("resume processes only new files; state converges to the batch aggregate") {
    import spark.implicits._
    val root = Files.createTempDirectory("restart-spec").toString
    val (src, out, ck) = (s"$root/src", s"$root/out", s"$root/ck")

    val events = graft.Tables.events(spark, sf("sf0.001")).cache()
    def appendPart(k: Int): Unit =
      events.filter($"user_id" % 4 === k).coalesce(1)
        .write.mode("append").parquet(src)
    def expected(parts: Int) = events.filter($"user_id" % 4 < parts)
      .groupBy($"user_id").agg(count(lit(1)).as("n_events"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def state() = EventAnalytics.upsertState(spark, out)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def batchDirs() = Files.list(Paths.get(out)).toArray.map(_.toString)
      .filter(_.contains("batch=")).sorted.toSeq

    // phase 1: two source files, first run
    appendPart(0); appendPart(1)
    EventAnalytics.upsertStreamPass(spark, src, out, ck)
    state() shouldBe expected(2)
    val dirsAfter1 = batchDirs()
    dirsAfter1.size should be >= 2 // maxFilesPerTrigger=1 → ≥1 batch per file
    val fingerprints1 = dirsAfter1.map(d =>
      d -> spark.read.parquet(d).collect().map(_.toString).sorted.mkString("|")).toMap

    // phase 2: two more files, SAME checkpoint — resume, don't reprocess
    appendPart(2); appendPart(3)
    EventAnalytics.upsertStreamPass(spark, src, out, ck)
    state() shouldBe expected(4)
    val dirsAfter2 = batchDirs()
    (dirsAfter2.toSet -- dirsAfter1.toSet).size should be >= 2 // new batches appended
    // phase-1 batch partitions byte-stable: the restart never rewrote them
    dirsAfter1.foreach { d =>
      spark.read.parquet(d).collect().map(_.toString).sorted.mkString("|") shouldBe
        fingerprints1(d)
    }

    // phase 3: replay with no new data — nothing changes
    EventAnalytics.upsertStreamPass(spark, src, out, ck)
    batchDirs() shouldBe dirsAfter2
    state() shouldBe expected(4)
  }
}
