package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Pins the behavioral split io_dynamic_overwrite's oracle can't show: the
  * SAME `mode("overwrite")` call with a one-day batch either replaces one
  * partition (dynamic) or truncates the whole table first (static, the
  * default) — the production foot-gun the conf disarms. Also pins that
  * untouched partitions are byte-identical files, not rewrites.
  */
class DynamicOverwriteSpec extends SparkSuite with Matchers {
  import spark.implicits._

  private def writeBase(p: String) = {
    val ev = graft.Tables.events(spark, sf("sf0.001"))
      .withColumn("day", date_format(date_trunc("day", $"ts"), "yyyy-MM-dd"))
    ev.write.mode("overwrite").partitionBy("day").parquet(p)
    ev
  }

  private def correction(ev: org.apache.spark.sql.DataFrame) =
    ev.filter($"day" === "2024-01-15").withColumn("value", $"value" * 2)

  test("dynamic mode replaces one partition; untouched partitions keep their files") {
    val p = Files.createTempDirectory("dynover-spec").toString
    val ev = writeBase(p)
    val before = new java.io.File(s"$p/day=2024-01-14").listFiles()
      .map(f => f.getName -> f.lastModified).toMap
    correction(ev).write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").partitionBy("day").parquet(p)
    val days = spark.read.parquet(p).select(countDistinct($"day")).collect().head.getLong(0)
    days shouldBe 30L // every day still present
    val after = new java.io.File(s"$p/day=2024-01-14").listFiles()
      .map(f => f.getName -> f.lastModified).toMap
    after shouldBe before // neighbour partition untouched, not rewritten
  }

  test("static mode (the default) truncates every other partition") {
    val p = Files.createTempDirectory("dynover-static-spec").toString
    val ev = writeBase(p)
    correction(ev).write.mode("overwrite").partitionBy("day").parquet(p)
    val days = spark.read.parquet(p).select(countDistinct($"day")).collect().head.getLong(0)
    days shouldBe 1L // 29 days of history gone — the foot-gun, demonstrated
  }
}
