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

    writeGifs(outDir)
    writePhash(outDir)
    writeWavs(outDir)
  }

  /** 8-bit unsigned mono PCM sample formula for the audio family, shared
    * with the mm_audio oracles THROUGH THE FILE BYTES (the oracles replay
    * energies from the WAV data section itself — canonical 44-byte header,
    * samples at byte 44+i — so this formula never appears in SQL).
    * Variant k (doc_id = 1000+k) shifts the first 150·(k+1) samples by
    * 6+k mod 256: a byte-different file whose 65-window energy fingerprint
    * stays within the near-dup threshold (planted distances 0–3).
    */
  def audioSample(i: Int, doc: Int, variantK: Int): Int = {
    val v = (i * (2 * doc + 3) + (i % 64) * 5) % 256
    if (variantK >= 0 && i < 150 * (variantK + 1)) (v + 6 + variantK) % 256 else v
  }

  val AudioBases = 12
  val AudioVariants = 4
  def audioVariantBase(k: Int): Int = k * 3
  def audioLen(doc: Int): Int = 2000 + doc * 256

  /** WAV fixtures for the audio modality: 12 bases + 4 near-dup variants,
    * written through `javax.sound.sampled` (real encoder; canonical RIFF
    * header), 8 kHz 8-bit unsigned mono — the one PCM layout where the
    * byte stream IS the sample stream, keeping the oracle's from-bytes
    * replay exact.
    */
  def writeWavs(outDir: java.nio.file.Path): Unit = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    def write(docId: Int, base: Int, variantK: Int): Unit = {
      val n = audioLen(base)
      val bytes = Array.tabulate(n)(i => audioSample(i, base, variantK).toByte)
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED,
        8000f, 8, 1, 1, 8000f, false)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(bytes), fmt, n.toLong)
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE,
        outDir.resolve(f"au_$docId%04d.wav").toFile)
      ais.close()
    }
    for (d <- 0 until AudioBases) write(d, d, -1)
    for (k <- 0 until AudioVariants) write(1000 + k, audioVariantBase(k), k)
    println(s"wrote ${AudioBases + AudioVariants} wav fixtures to $outDir")
  }

  /** Truecolor pixel formula for the perceptual-hash family, shared verbatim
    * with the mm_phash / mm_phash_dedup oracles. Variants (doc_id ≥ 1000)
    * reuse their base's formula with the red channel shifted +128 in the
    * 4×4 top-left corner — byte-different files whose 9×8 box-mean dHash
    * stays within the near-dup threshold.
    */
  def phashRgb(x: Int, y: Int, fi: Int, perturbed: Boolean): Int = {
    val bump = if (perturbed && x < 4 && y < 4) 128 else 0
    (((x * 31 + y * 17 + fi * 7 + bump) % 256) << 16) |
      (((x * 13 + fi) % 256) << 8) | ((y * 11 + fi * 3) % 256)
  }

  val PhashBases = 24
  val PhashVariants = 8
  /** Variant k perturbs base 3k (spread across the corpus). */
  def phashVariantBase(k: Int): Int = (k * 3) % PhashBases
  def phashDims(fi: Int): (Int, Int) = (18 + (fi * 13) % 46, 16 + (fi * 29) % 40)

  /** Perceptual-hash dedup fixtures: 24 truecolor bases + 8 near-dup
    * variants. All TYPE_3BYTE_BGR (PNG color type 2) so the encode→decode
    * roundtrip is pixel-exact and the oracle can recompute the decoded
    * raster from this formula — grayscale would pass through the JDK's
    * ICC colorspace conversion and break SQL replay.
    */
  def writePhash(outDir: java.nio.file.Path): Unit = {
    def write(docId: Int, fi: Int, perturbed: Boolean): Unit = {
      val (w, h) = phashDims(fi)
      val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
      for (x <- 0 until w; y <- 0 until h)
        img.setRGB(x, y, 0xFF000000 | phashRgb(x, y, fi, perturbed))
      ImageIO.write(img, "png", outDir.resolve(f"ph_$docId%04d.png").toFile)
    }
    for (i <- 0 until PhashBases) write(i, i, perturbed = false)
    for (k <- 0 until PhashVariants)
      write(1000 + k, phashVariantBase(k), perturbed = true)
    println(s"wrote ${PhashBases + PhashVariants} phash png fixtures to $outDir")
  }

  /** 64-level gray palette, value = index*4 — encode→decode is pixel-exact
    * because the GIF color table IS this palette (no quantization), which is
    * what lets the mm_framesample oracle recompute the decoded-pixel hash
    * from the generator formula below.
    */
  private def grayPalette: java.awt.image.IndexColorModel = {
    val ramp = Array.tabulate(64)(v => (v * 4).toByte)
    new java.awt.image.IndexColorModel(6, 64, ramp, ramp, ramp)
  }

  /** The per-pixel value formula shared verbatim with the DuckDB oracle:
    * v(x, y, frame, doc) = (x*31 + y*17 + frame*7 + doc*13) % 64.
    */
  def pixelValue(x: Int, y: Int, frame: Int, doc: Int): Int =
    (x * 31 + y * 17 + frame * 7 + doc * 13) % 64

  /** Animated multi-frame GIFs for the REAL frame-sample stage: 12 files,
    * 3–26 frames each, every frame full-screen with an explicit Graphic
    * Control Extension (so the oracle's frame count = byte-aligned GCE
    * signature count is exact on this corpus — pinned against
    * `ImageReader.getNumImages` by MultimodalSpec).
    */
  def writeGifs(outDir: java.nio.file.Path): Unit = {
    import javax.imageio.{IIOImage, ImageTypeSpecifier}
    import javax.imageio.metadata.IIOMetadataNode
    for (d <- 0 until 12) {
      val w = 10 + (d * 7) % 23
      val h = 8 + (d * 5) % 17
      val nFrames = 3 + (d * 9) % 24
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      val ios = ImageIO.createImageOutputStream(
        outDir.resolve(f"vid_$d%04d.gif").toFile)
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      for (f <- 0 until nFrames) {
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
        val raster = img.getRaster
        for (x <- 0 until w; y <- 0 until h)
          raster.setSample(x, y, 0, pixelValue(x, y, f, d))
        val meta = writer.getDefaultImageMetadata(
          new ImageTypeSpecifier(img), writer.getDefaultWriteParam)
        val fmt = meta.getNativeMetadataFormatName // javax_imageio_gif_image_1.0
        val root = meta.getAsTree(fmt).asInstanceOf[IIOMetadataNode]
        val gce = new IIOMetadataNode("GraphicControlExtension")
        gce.setAttribute("disposalMethod", "none")
        gce.setAttribute("userInputFlag", "FALSE")
        gce.setAttribute("transparentColorFlag", "FALSE")
        gce.setAttribute("delayTime", "10")
        gce.setAttribute("transparentColorIndex", "0")
        root.appendChild(gce)
        meta.setFromTree(fmt, root)
        writer.writeToSequence(new IIOImage(img, null, meta), null)
      }
      writer.endWriteSequence()
      ios.close()
      writer.dispose()
    }
    println(s"wrote 12 animated gif fixtures to $outDir")
  }
}
