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
}
