package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.{SparkSuite, Tables}

/** The one property the bloom index MUST hold for pruning to be sound —
  * no false negatives: every custkey that actually lives in a file passes
  * that file's stored bloom, for every (file, key) pair in the corpus.
  * (False positives are allowed and merely cost a wasted read; the query
  * gate already cross-checks the pruned aggregate.) Also pins that the
  * index is one row per data file.
  */
class BloomIndexSpec extends SparkSuite with Matchers {

  test("bloom index: zero false negatives across every (file, key) pair") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = sf("sf0.001")
    val root = Formats.bloomIndexDir(spark, dir)
    val blooms = spark.read.parquet(s"$root/_blooms")
    val files = spark.read.parquet(s"$root/_stats")
      .select($"file").as[String].collect().sorted
    blooms.count() shouldBe files.length

    val present = spark.read.parquet(files.map(f => s"$root/$f"): _*)
      .select(
        substring_index(input_file_name(), "/", -1).as("file"),
        graft.functions.Exprs.hash60(concat(lit("bk:"), $"o_custkey")).as("h"))
      .distinct()
    val misses = present.join(blooms, Seq("file"))
      .filter(!graft.functions.BloomAgg.mightContain(
        "bits", "h", Formats.BloomIdxBits, Formats.BloomIdxProbes))
      .count()
    misses shouldBe 0
  }
}
