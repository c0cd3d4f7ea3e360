package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Pins for the persisted graph index (sim_hnsw_persist): the index is
  * built once per (dir, JVM) into (lvl, shard)-partitioned parquet, and
  * serving from it reproduces the fused build+search result exactly (the
  * oracle already pins both against the same SQL replay; this spec pins
  * the Spark-side index plumbing itself).
  */
class HnswPersistSpec extends SparkSuite with Matchers {

  test("index builds once, is (lvl, shard)-partitioned, and serve == fused search") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val idx = GraphAnn.hnswIndexDir(spark, dir)
    GraphAnn.hnswIndexDir(spark, dir) shouldBe idx // memoized, no rebuild
    // base layer + every active upper layer gets its own lvl= directory,
    // each sharded — the executor-serving-one-shard read pattern
    val lvlDirs = new java.io.File(s"$idx/edges").listFiles()
      .filter(_.getName.startsWith("lvl=")).map(_.getName).sorted
    lvlDirs should contain("lvl=0")
    lvlDirs.length should be >= 2 // base + at least one upper layer
    val shardDirs = new java.io.File(s"$idx/edges/lvl=0").listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    shardDirs should have size GraphAnn.HnswShards.toLong
    val served = GraphAnn.hnswTopkFrom(GraphAnn.hnswWalkStored(spark, idx))
      .orderBy($"query_id", $"rk").collect().toSeq
    val fused = GraphAnn.hnswTopk(spark, graft.Tables.embeddings(spark, dir))
      .orderBy($"query_id", $"rk").collect().toSeq
    served shouldBe fused
  }
}
