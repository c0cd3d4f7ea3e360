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

  /** Guards the oracle's byte-level GIF parse against LZW false positives:
    * the decoder's frame count must equal the byte-aligned GCE-signature
    * count on every COMMITTED fixture (the oracle counts signatures; a new
    * fixture whose compressed data happened to contain 21 F9 04 at a byte
    * boundary would fail here at generation time, not silently at verify).
    */
  test("mm_framesample: ImageIO frame count equals the oracle's GCE byte scan") {
    import javax.imageio.ImageIO
    val files = new java.io.File(
      graft.Fixtures.dir("media", "GRAFT_MEDIA_DIR"))
      .listFiles((_, n) => n.startsWith("vid_") && n.endsWith(".gif")).sorted
    files should have size 12
    for (f <- files) {
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val aligned = (0 until bytes.length - 2).count { i =>
        bytes(i) == 0x21.toByte && bytes(i + 1) == 0xF9.toByte &&
          bytes(i + 2) == 0x04.toByte
      }
      val reader = ImageIO.getImageReadersByFormatName("gif").next()
      val iis = ImageIO.createImageInputStream(f)
      reader.setInput(iis)
      reader.getNumImages(true) shouldBe aligned
      reader.dispose(); iis.close()
    }
  }

  test("mm_framesample decodes real frames whose pixels match the generator formula") {
    val rows = graft.SparkEntry.queries("mm_framesample")(spark, dir).collect()
    rows.length should be > 12 // several files have >8 frames → multiple samples
    for (r <- rows) {
      val (doc, f, n, w, h, hash) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      n shouldBe 3 + (doc * 9) % 24
      w shouldBe 10 + (doc * 7) % 23
      h shouldBe 8 + (doc * 5) % 17
      f % 8 shouldBe 0
      val expected = (for (y <- 0L until h; x <- 0L until w) yield
        MediaFixtureGen.pixelValue(x.toInt, y.toInt, f.toInt, doc.toInt).toLong *
          (1 + x + y * w)).sum
      hash shouldBe expected
    }
  }
}
