package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** The put-if-absent commit primitive under a REAL race: N threads claim
  * the same version concurrently — exactly one wins, the manifest holds
  * the winner's complete content (never torn, never the loser's — the
  * POSIX-rename-replaces-target bug this primitive exists to avoid), and
  * every loser's staging temp is cleaned up.
  */
class OccCommitSpec extends SparkSuite with Matchers {

  test("commit race: exactly one winner, content intact, no stray staging") {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Files.createTempDirectory("graft-occ-race").toString
    val writers = 8
    val pool = java.util.concurrent.Executors.newFixedThreadPool(writers)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val results = (0 until writers).map { i =>
      pool.submit(new java.util.concurrent.Callable[(Int, Boolean)] {
        def call(): (Int, Boolean) = {
          gate.await()
          (i, Formats.tryCommitManifest(root, 7, Seq(s"writer-$i-line-a", s"writer-$i-line-b")))
        }
      })
    }
    gate.countDown()
    val outcome = results.map(_.get(30, java.util.concurrent.TimeUnit.SECONDS))
    pool.shutdown()

    val winners = outcome.filter(_._2)
    winners.length shouldBe 1
    val w = winners.head._1
    val content = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get(s"$root/manifest-v7.txt"))
      .asScala.toSeq
    content shouldBe Seq(s"writer-$w-line-a", s"writer-$w-line-b")

    // a LATE stale writer must not clobber the committed version
    Formats.tryCommitManifest(root, 7, Seq("stale")) shouldBe false
    java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get(s"$root/manifest-v7.txt"))
      .asScala.toSeq shouldBe content

    // no staging temp survives any attempt
    new java.io.File(root).listFiles().map(_.getName).toSeq shouldBe Seq("manifest-v7.txt")
  }
}
