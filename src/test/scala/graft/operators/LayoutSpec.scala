package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** The economics lo_zorder exists to demonstrate (also DuckDB-oracle-checked
  * end-to-end): under the Z-order layout the band probe's zone-map check
  * prunes almost every file; under the insertion-order layout it prunes
  * none. Both layouts must partition the same rows.
  */
class LayoutSpec extends SparkSuite with Matchers {

  test("zone maps prune z-ordered files but not insertion-ordered ones") {
    val rows = graft.SparkEntry.queries("lo_zorder")(spark, sf("sf0.001")).collect()
    val byLayout = rows.groupBy(_.getString(0))
    val zHits = byLayout("zorder").count(_.getBoolean(7))
    val linHits = byLayout("linear").count(_.getBoolean(7))
    val zFiles = byLayout("zorder").length
    withClue(s"zorder $zHits/$zFiles vs linear $linHits/${byLayout("linear").length}") {
      linHits shouldBe byLayout("linear").length // linear skips nothing
      zHits.toDouble / zFiles should be <= 0.25  // zorder skips ≥ 75%
    }
    // both layouts partition the identical row set
    byLayout("zorder").map(_.getLong(2)).sum shouldBe
      byLayout("linear").map(_.getLong(2)).sum
  }

  test("hilbert layout prunes at least as well as zorder on the band probe") {
    val rows = graft.SparkEntry.queries("lo_hilbert")(spark, sf("sf0.001")).collect()
    val byLayout = rows.groupBy(_.getString(0))
    val hHits = byLayout("hilbert").count(_.getBoolean(7))
    val zHits = byLayout("zorder").count(_.getBoolean(7))
    val hFiles = byLayout("hilbert").length
    withClue(s"hilbert $hHits/$hFiles vs zorder $zHits/${byLayout("zorder").length}") {
      // the better-locality curve never hits MORE files than Morton here,
      // and both achieve the ≥75% prune that is the point of clustering
      hHits should be <= zHits
      hHits.toDouble / hFiles should be <= 0.25
    }
    // both curves partition the identical row set into the same file count
    hFiles shouldBe byLayout("zorder").length
    byLayout("hilbert").map(_.getLong(2)).sum shouldBe
      byLayout("zorder").map(_.getLong(2)).sum
  }
}
