package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Hand-computable pins for integer HITS that the oracle replay can't
  * isolate: exact uniform scores on a complete bipartite graph (the L1
  * normalization's floor arithmetic included), the star-graph ordering
  * (the universally-bought part is the top authority, the widest buyer
  * the top hub), and bit-identical output under any partition width —
  * the whole point of the integer formulation.
  */
class HitsSpec extends SparkSuite with Matchers {

  test("complete bipartite graph: exactly uniform scores on both sides") {
    import spark.implicits._
    val edges = (for { c <- 1 to 3; p <- 1 to 4 } yield (s"c$c", s"p$p"))
      .toDF("c", "p")
    val r = Graph.hits(spark, edges).collect()
    val (auths, hubs) = r.partition(_.getString(0) == "auth")
    auths.length shouldBe 4
    hubs.length shouldBe 3
    // L1-normalized uniform vectors: every auth = SCALE div 4 (floored),
    // every hub = SCALE div 3, at every iteration — so exactly at the end
    auths.map(_.getLong(2)).toSet shouldBe Set(Graph.PrScale / 4)
    hubs.map(_.getLong(2)).toSet shouldBe Set(Graph.PrScale / 3)
  }

  test("star-ish graph: shared part tops authorities, widest buyer tops hubs") {
    import spark.implicits._
    // p0 bought by everyone; c1 additionally buys every niche part
    val edges = (
      (1 to 5).map(c => (s"c$c", "p0")) ++
      (1 to 4).map(p => ("c1", s"p$p"))
    ).toDF("c", "p")
    val r = Graph.hits(spark, edges).collect()
    val topAuth = r.filter(_.getString(0) == "auth")
      .maxBy(x => (x.getLong(2), x.getString(1)))
    val topHub = r.filter(_.getString(0) == "hub")
      .maxBy(x => (x.getLong(2), x.getString(1)))
    topAuth.getString(1) shouldBe "p0"
    topHub.getString(1) shouldBe "c1"
  }

  test("bit-identical under partition width") {
    import spark.implicits._
    val edges = (for { c <- 1 to 7; p <- 1 to 9 if (c * 3 + p) % 4 != 0 }
      yield (s"c$c", s"p$p")).toDF("c", "p")
    def run(parts: Int) =
      Graph.hits(spark, edges.repartition(parts)).collect()
        .map(x => (x.getString(0), x.getString(1), x.getLong(2))).toSeq
    run(1) shouldBe run(7)
  }
}
