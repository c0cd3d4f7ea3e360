package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Pins for the manifest-table VACUUM (io_vacuum): liveness is membership
  * in the UNION of retained manifests (a file shared between an expired
  * and a retained version must survive), vacuum is idempotent, and a wider
  * retention window removes no data at all.
  */
class VacuumSpec extends SparkSuite with Matchers {

  private def freshTable(): String = {
    val root = java.nio.file.Files.createTempDirectory("vacuum-spec").toString
    Formats.buildVersionedTable(spark, sf("sf0.001"), root)
    root
  }

  private def exists(root: String, name: String) =
    java.nio.file.Files.exists(java.nio.file.Paths.get(s"$root/$name"))

  test("retain 1: only the orphan goes; the shared file survives; idempotent") {
    val root = freshTable()
    val (removed, expired, nBefore) = Formats.vacuum(spark, root, retainLatest = 1)
    nBefore shouldBe 3L
    removed shouldBe Seq("data-a.parquet") // referenced only by expired v1/v2
    expired shouldBe Seq("manifest-v1.txt", "manifest-v2.txt")
    // data-b is in expired v2 AND retained v3 — membership wins over age
    exists(root, "data-b.parquet") shouldBe true
    exists(root, "data-a2.parquet") shouldBe true
    exists(root, "manifest-v3.txt") shouldBe true
    // second pass finds nothing to do
    val (removed2, expired2, nBefore2) = Formats.vacuum(spark, root, retainLatest = 1)
    nBefore2 shouldBe 2L
    removed2 shouldBe empty
    expired2 shouldBe empty
  }

  test("retain 2: the v2 window still references every file — no data removed") {
    val root = freshTable()
    val (removed, expired, _) = Formats.vacuum(spark, root, retainLatest = 2)
    removed shouldBe empty // live = {a,b} ∪ {a2,b} = all three
    expired shouldBe Seq("manifest-v1.txt")
    Seq("data-a.parquet", "data-b.parquet", "data-a2.parquet")
      .foreach(f => exists(root, f) shouldBe true)
  }
}
