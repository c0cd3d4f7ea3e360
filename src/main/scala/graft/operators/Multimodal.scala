package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.QueryDef.sqlChecked

/** One on-disk media file: id parsed from the filename plus the raw bytes. */
final case class MediaFile(doc_id: Long, content: Array[Byte])

/** Output of the real PNG decode stage. */
final case class DecodedMedia(
    doc_id: Long, byte_len: Long, width: Long, height: Long, channels: Long)

/** Output of the real resize stage. */
final case class ResizedMedia(
    doc_id: Long, width: Long, height: Long, scale_num: Long, scale_den: Long)

/** One sampled "frame" of a (stubbed) video payload. */
final case class SampledFrame(doc_id: Long, frame_idx: Long, frame_hash: Long)

/** Input row for the frame-sample stub stage. */
final case class MediaRow(doc_id: Long, payload: Array[Byte], format: String)

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded via a per-partition batch function.
  *
  * mm_decode / mm_resize are REAL image decodes: committed PNG fixtures
  * ([[MediaFixtureGen]]) read through Spark's `binaryFile` source, decoded
  * with pure-JDK `javax.imageio` inside `mapPartitions` (the Scala analog of
  * `mapInPandas`: one iterator per partition, so codec setup amortizes
  * across the batch). The oracle re-derives width/height/channels
  * INDEPENDENTLY by parsing the PNG IHDR chunk bytes (offsets 16-25) in
  * SQL — the decode is checked against the file-format spec, not against
  * itself.
  *
  * mm_framesample remains a clearly-marked deterministic stub: the JDK ships
  * no video codec, so the generator shape (one row → many frame rows inside
  * the stage) is the tested part.
  *
  * Scale: decode is embarrassingly parallel; no shuffle until the final
  * presentation sort. Partition sizing (`files.maxPartitionBytes` for big
  * files; `binaryFile` packs many small files per task) is the only knob
  * that matters at 100 TB of media bytes.
  */
object Multimodal {

  /** Committed PNG fixture dir (absolute so the DuckDB oracle reads the same
    * bytes; override with GRAFT_MEDIA_DIR).
    */
  private val mediaDir =
    sys.env.getOrElse("GRAFT_MEDIA_DIR", "/root/repo/fixtures/media")

  /** The binaryFile scan: path + raw bytes → (doc_id, content). */
  private def mediaFiles(s: org.apache.spark.sql.SparkSession) = {
    import s.implicits._
    s.read.format("binaryFile").option("pathGlobFilter", "*.png").load(mediaDir)
      .select(
        regexp_extract($"path", "img_(\\d+)\\.png", 1).cast("long").as("doc_id"),
        $"content")
      .as[MediaFile]
  }

  /** Real PNG decode — geometry and band count from the decoded raster. */
  private def decode(m: MediaFile): DecodedMedia = {
    val img = ImageIO.read(new ByteArrayInputStream(m.content))
    DecodedMedia(m.doc_id, m.content.length.toLong,
      img.getWidth.toLong, img.getHeight.toLong,
      img.getRaster.getNumBands.toLong)
  }

  /** IHDR fields re-derived in SQL: width @ bytes 16-19, height @ 20-23,
    * color type @ byte 25 (hex-string offsets 33/41/51, 1-indexed pairs).
    */
  private val IhdrSql =
    s"""SELECT CAST(regexp_extract(filename, 'img_(\\d+)', 1) AS BIGINT) AS doc_id,
       |  octet_length(content) AS byte_len,
       |  CAST(concat('0x', substr(hex(content), 33, 8)) AS BIGINT) AS width,
       |  CAST(concat('0x', substr(hex(content), 41, 8)) AS BIGINT) AS height,
       |  CASE CAST(concat('0x', substr(hex(content), 51, 2)) AS BIGINT)
       |    WHEN 0 THEN 1 WHEN 2 THEN 3 WHEN 4 THEN 2 WHEN 6 THEN 4 END AS channels
       |FROM read_blob('$mediaDir/*.png')""".stripMargin

  val defs: Seq[QueryDef] = Seq(

    // Binary-column feature extraction (pure expressions, no decode).
    sqlChecked(
      "mm_features",
      """SELECT doc_id, strlen(text) AS byte_len, md5(text) AS content_hash
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables.documents(s, dir)
        .select($"doc_id",
          octet_length($"text").cast("long").as("byte_len"),
          md5($"text".cast("binary")).as("content_hash"))
        .orderBy($"doc_id")
    },

    // REAL decode pipeline: binaryFile scan → mapPartitions ImageIO decode →
    // typed geometry. Oracle parses the PNG IHDR chunk in SQL.
    sqlChecked(
      "mm_decode",
      s"""SELECT doc_id, byte_len, width, height, channels
         |FROM ($IhdrSql) ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      mediaFiles(s)
        .mapPartitions { it => ImageIO.setUseCache(false); it.map(decode) }
        .toDF()
        .orderBy($"doc_id")
    },

    // REAL resize: decode, then an actual Graphics2D raster resample into an
    // aspect-preserving fit of 224×224 — output dims are read back from the
    // RESIZED image, not recomputed. Oracle mirrors the integer fit
    // arithmetic over IHDR dims.
    sqlChecked(
      "mm_resize",
      s"""SELECT doc_id,
         | (width * 224) // GREATEST(width, height) AS width,
         | (height * 224) // GREATEST(width, height) AS height,
         | 224 AS scale_num, GREATEST(width, height) AS scale_den
         |FROM ($IhdrSql) ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      mediaFiles(s)
        .mapPartitions { it =>
          ImageIO.setUseCache(false)
          it.map { m =>
            val img = ImageIO.read(new ByteArrayInputStream(m.content))
            val longSide = math.max(img.getWidth, img.getHeight).toLong
            val nw = (img.getWidth * 224 / longSide).toInt
            val nh = (img.getHeight * 224 / longSide).toInt
            val out = new BufferedImage(nw, nh, BufferedImage.TYPE_3BYTE_BGR)
            val g = out.createGraphics()
            g.drawImage(img, 0, 0, nw, nh, null)
            g.dispose()
            ResizedMedia(m.doc_id, out.getWidth.toLong, out.getHeight.toLong,
              224L, longSide)
          }
        }
        .toDF()
        .orderBy($"doc_id")
    },

    // Frame sampling: each payload is a "video" of byte_len/100 frames;
    // every 8th frame is emitted with a deterministic stub frame hash (the
    // JDK has no video codec — the generator shape is the tested part).
    // Generator shape: flatMap inside mapPartitions (one input row → many
    // frame rows) — the row-explosion stays inside the stage, nothing
    // materializes per-executor beyond the iterator.
    sqlChecked(
      "mm_framesample",
      """SELECT doc_id, frame_idx, (strlen(text) * 31 + frame_idx * 7919) % 1000000007 AS frame_hash
        |FROM (SELECT doc_id, text, unnest(range(0, strlen(text) // 100, 8)) AS frame_idx
        |      FROM documents)
        |ORDER BY doc_id, frame_idx""".stripMargin) { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select($"doc_id", $"text".cast("binary").as("payload"),
          lit("fake/video").as("format"))
        .as[MediaRow]
      media
        .mapPartitions(it => it.flatMap { r =>
          val nFrames = r.payload.length / 100
          (0L until nFrames.toLong by 8L).iterator.map { i =>
            SampledFrame(r.doc_id, i, (r.payload.length.toLong * 31 + i * 7919) % 1000000007L)
          }
        })
        .toDF()
        .orderBy($"doc_id", $"frame_idx")
    }
  )
}
