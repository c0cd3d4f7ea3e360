package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** The format round-trips are value-checked by their oracles; this pins the
  * PLAN property that matters at scale for the JDBC source: the read-back
  * must be range-partitioned into concurrent per-executor cursors, not one
  * serial result set.
  */
class FormatsSpec extends SparkSuite with Matchers {

  test("jdbc round-trip reads back through 4 partitioned range scans") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = sf("sf0.001")
    val db = java.nio.file.Files.createTempDirectory("graft-derby-spec").resolve("db").toString
    val url = s"jdbc:derby:$db;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val cust = graft.Tables.customer(spark, dir)
      .select($"c_custkey", $"c_mktsegment", $"c_acctbal")
    cust.write.mode("overwrite").jdbc(url, "customers", props)
    val maxKey = cust.agg(max($"c_custkey")).collect().head.getLong(0)
    val back = spark.read.jdbc(url, "customers",
      columnName = "c_custkey", lowerBound = 0L, upperBound = maxKey + 1,
      numPartitions = 4, connectionProperties = props)
    back.rdd.getNumPartitions shouldBe 4
    back.count() shouldBe cust.count()
  }

  test("io_partitioned_prune: the day filter prunes to ONE partition directory") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val pruned = Formats.partitionedPruneRead(spark, sf("sf0.001"))
    val plan = pruned.queryExecution.executedPlan
    plan.toString should include("PartitionFilters")
    val scan = plan.collectLeaves().collectFirst { case f: FileSourceScanExec => f }.get
    // events spans 30 days → 30 day= dirs; the filter must list-and-scan 1
    scan.selectedPartitions.partitionCount shouldBe 1
    // and the data rows really are only that day's
    import spark.implicits._
    pruned.select(org.apache.spark.sql.functions.countDistinct($"day")).collect()
      .head.getLong(0) shouldBe 1L
  }

  test("io_schema_evolution: merged read reconciles vintages, null-fills the old one") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(Formats.evolvedOrdersDir(spark, dir))
    merged.schema.fieldNames.sorted shouldBe
      Array("o_custkey", "o_orderkey", "o_totalprice")
    val orders = graft.Tables.orders(spark, dir)
    merged.count() shouldBe orders.count()
    // exactly the generation-1 (even-key) rows lack the added column
    merged.filter($"o_totalprice".isNull).count() shouldBe
      orders.filter($"o_orderkey" % 2 === 0).count()
    merged.filter($"o_totalprice".isNull && $"o_orderkey" % 2 === 1).count() shouldBe 0L
  }

  test("io_compaction: coalesce merges 64 files to 4 with zero shuffle") {
    import spark.implicits._
    val dir = sf("sf0.001")
    val small = spark.read.parquet(Formats.smallFilesDir(spark, dir))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = small.coalesce(4).queryExecution.executedPlan
      plan.toString should include("Coalesce")
      plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      } shouldBe empty
    } finally spark.conf.unset("spark.sql.adaptive.enabled")
    val row = graft.SparkEntry.queries("io_compaction")(spark, dir).collect().head
    row.getLong(0) shouldBe 64L
    row.getLong(1) shouldBe 4L
    row.getLong(2) shouldBe graft.Tables.events(spark, dir).count()
    row.getBoolean(3) shouldBe true
  }
}
