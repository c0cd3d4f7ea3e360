package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Pins the REAL PNG decode against facts known from [[MediaFixtureGen]]'s
  * construction — sizes follow i → (8 + 13i mod 97, 8 + 29i mod 71) and the
  * color type cycles BGR/GRAY/ABGR — so a decoder that returned payload
  * arithmetic (the old stub) or wrong band counts fails here even before the
  * IHDR-parsing oracle runs.
  */
class MultimodalSpec extends SparkSuite with Matchers {

  private val dir = sf("sf0.001") // media queries read fixtures, not the sfdir

  test("mm_decode decodes real PNG geometry and channel counts") {
    val rows = graft.SparkEntry.queries("mm_decode")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    rows should have size 48
    for ((id, (w, h, ch)) <- rows) {
      w shouldBe 8 + (id * 13) % 97
      h shouldBe 8 + (id * 29) % 71
      ch shouldBe Seq(3L, 1L, 4L)((id % 3).toInt)
    }
  }

  test("mm_resize fits the long side to 224 preserving aspect") {
    val rows = graft.SparkEntry.queries("mm_resize")(spark, dir).collect()
    rows should have size 48
    for (r <- rows) {
      val (w, h) = (r.getLong(1), r.getLong(2))
      math.max(w, h) shouldBe 224 // long side lands exactly on the target
      w should be >= 1L
      h should be >= 1L
    }
  }
}
