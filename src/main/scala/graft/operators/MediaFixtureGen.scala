package graft.operators

import java.awt.image.BufferedImage
import java.nio.file.{Files, Paths}
import javax.imageio.ImageIO

/** Generates the committed PNG fixtures under `fixtures/media/` — REAL image
  * bytes (pure-JDK `javax.imageio`, no external codec), deterministic pixel
  * content, three PNG color types so the decode stage sees 1-, 3- and
  * 4-channel rasters:
  *
  *   - `TYPE_3BYTE_BGR`  → PNG color type 2 (truecolor, 3 channels)
  *   - `TYPE_BYTE_GRAY`  → PNG color type 0 (grayscale, 1 channel)
  *   - `TYPE_4BYTE_ABGR` → PNG color type 6 (truecolor+alpha, 4 channels)
  *
  * The mm_decode / mm_resize oracles re-derive width/height/channels
  * independently by parsing the PNG IHDR chunk bytes in SQL, so the Spark
  * decode is checked against the file format spec, not against itself.
  *
  * Run once: `sbt "runMain graft.operators.MediaFixtureGen fixtures/media"`.
  */
object MediaFixtureGen {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(if (args.nonEmpty) args(0) else "fixtures/media")
    Files.createDirectories(outDir)
    val types = Seq(
      BufferedImage.TYPE_3BYTE_BGR, BufferedImage.TYPE_BYTE_GRAY,
      BufferedImage.TYPE_4BYTE_ABGR)
    for (i <- 0 until 48) {
      val w = 8 + (i * 13) % 97
      val h = 8 + (i * 29) % 71
      val img = new BufferedImage(w, h, types(i % 3))
      for (x <- 0 until w; y <- 0 until h) {
        val rgb = (((x * 31 + y * 17 + i * 7) % 256) << 16) |
          (((x * 13 + i) % 256) << 8) | ((y * 11 + i * 3) % 256)
        img.setRGB(x, y, 0xFF000000 | rgb)
      }
      ImageIO.write(img, "png", outDir.resolve(f"img_$i%04d.png").toFile)
    }
    println(s"wrote 48 png fixtures to $outDir")
  }
}
