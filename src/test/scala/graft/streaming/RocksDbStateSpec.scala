package graft.streaming

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** The 100 TB streaming-state path: the same stateful sessionization run on
  * the RocksDB state store provider (spillable, off-heap — the backend that
  * holds state larger than executor memory, vs the default in-memory
  * HDFS-backed provider). Same results, different state engine — proving
  * the operators don't depend on the default provider's semantics.
  */
class RocksDbStateSpec extends SparkSuite with Matchers {

  private val dir = sf("sf0.001")
  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("stateful sessionization is identical on the RocksDB state store") {
    val q = graft.SparkEntry.queries("ev_sessionize_stream")
    val default = q(spark, dir).collect().map(_.toString).toSeq
    val before = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    val rocks =
      try q(spark, dir).collect().map(_.toString).toSeq
      finally before match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    rocks shouldBe default
    rocks.length should be > 0
  }
}
