package graft.operators

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Parquet ROW-GROUP pruning via min/max statistics — the intra-file half
  * of the skipping story (lo_zorder pins the file level): the same narrow
  * key-range filter over the same rows reads a small fraction of the data
  * when the file is written key-SORTED (each small row group spans a
  * narrow key range, so the pushed predicate skips almost all of them)
  * and reads ~everything when written key-SHUFFLED (every row group spans
  * the full range — min/max stats prune nothing). Measured through the
  * scan's own numOutputRows metric, which counts rows surviving row-group
  * and page-level pushdown. At 100 TB this is why ingest SORTS WITHIN
  * FILES on the dominant filter key even when directory partitioning is
  * by something else.
  */
class RowGroupPruneSpec extends SparkSuite with Matchers {
  import spark.implicits._

  private def scanRows(path: String, lo: Long, hi: Long): (Long, Long) = {
    val df = spark.read.parquet(path).filter($"l_orderkey" >= lo && $"l_orderkey" < hi)
    // execute THIS QueryExecution (a separate count() would plan its own
    // instance and leave these metrics untouched)
    val n = df.collect().length.toLong
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec => f }.get
    (scan.metrics("numOutputRows").value, n)
  }

  test("sorted row groups prune under a range filter; shuffled ones don't") {
    val li = graft.Tables.lineitem(spark, sf("sf0.01"))
      .select($"l_orderkey", $"l_quantity")
    val root = java.nio.file.Files.createTempDirectory("rg-prune").toString
    // small row groups => many min/max windows per file
    val rg = (64 * 1024).toString
    li.orderBy($"l_orderkey").coalesce(1).write
      .option("parquet.block.size", rg).parquet(s"$root/sorted")
    li.orderBy(md5($"l_orderkey".cast("string"))).coalesce(1).write
      .option("parquet.block.size", rg).parquet(s"$root/shuffled")
    val (max, min) = (15000L, 0L)
    val (lo, hi) = (min + (max - min) * 45 / 100, min + (max - min) * 55 / 100)
    val (sortedRead, sortedMatch) = scanRows(s"$root/sorted", lo, hi)
    val (shuffledRead, shuffledMatch) = scanRows(s"$root/shuffled", lo, hi)
    sortedMatch shouldBe shuffledMatch // same answer either way
    withClue(s"sortedRead=$sortedRead shuffledRead=$shuffledRead match=$sortedMatch: ") {
      // sorted: reads little more than the matching ~10% slice
      sortedRead should be < shuffledRead / 2
      // shuffled: min/max spans the whole range in every group — no skip
      shuffledRead.toDouble should be > sortedRead * 2.0
    }
  }
}
