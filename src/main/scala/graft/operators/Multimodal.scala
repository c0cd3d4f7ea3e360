package graft.operators

import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.QueryDef.sqlChecked

/** Input row for the decode stage: an opaque binary payload plus typed
  * metadata — the shape a real image/audio/video column takes at scale.
  */
final case class MediaRow(doc_id: Long, payload: Array[Byte], format: String)

/** Output of the (stubbed) decoder. */
final case class DecodedMedia(
    doc_id: Long, byte_len: Long, width: Long, height: Long, channels: Long)

/** Output of the (stubbed) resize stage. */
final case class ResizedMedia(
    doc_id: Long, width: Long, height: Long, scale_num: Long, scale_den: Long)

/** One sampled "frame" of a (stubbed) video payload. */
final case class SampledFrame(doc_id: Long, frame_idx: Long, frame_hash: Long)

/** Multimodal-column plumbing: treat media as opaque `binary` columns with
  * typed metadata, decoded via a per-partition batch function.
  *
  * The Spark-side plumbing is real — binary column, metadata, a
  * `mapPartitions` decode stage (the Scala analog of `mapInPandas`: one
  * iterator per partition, so a real decoder would amortize codec/model
  * initialization across the batch). The decode itself is a clearly-marked
  * DETERMINISTIC STUB (this container has no image/audio libraries): it
  * derives "dimensions" arithmetically from the payload bytes, which is what
  * makes the stage oracle-checkable end-to-end.
  *
  * Scale: decode is embarrassingly parallel; no shuffle until the final
  * presentation sort. Partition sizing (`files.maxPartitionBytes`) is the
  * only knob that matters at 100 TB of media bytes.
  */
object Multimodal {

  /** STUB decoder — replace with a real codec when libraries are available.
    * Deterministic arithmetic on payload length stands in for decoded
    * image geometry.
    */
  private def decodeStub(r: MediaRow): DecodedMedia = {
    val n = r.payload.length.toLong
    DecodedMedia(r.doc_id, n, (n % 640) + 1, ((n * 7) % 480) + 1, 3L)
  }

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

    // Full decode pipeline: binary payload + metadata → mapPartitions decode
    // stub → typed features. Oracle mirrors the stub arithmetic in SQL.
    sqlChecked(
      "mm_decode",
      """SELECT doc_id, strlen(text) AS byte_len,
        | (strlen(text) % 640) + 1 AS width,
        | ((strlen(text) * 7) % 480) + 1 AS height,
        | CAST(3 AS BIGINT) AS channels
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select($"doc_id", $"text".cast("binary").as("payload"),
          lit("fake/raw").as("format"))
        .as[MediaRow]
      media
        .mapPartitions(it => it.map(decodeStub))
        .toDF()
        .orderBy($"doc_id")
    },

    // Resize: decode → aspect-preserving fit into 224×224 (integer
    // arithmetic so the oracle mirrors it exactly). The real version swaps
    // the per-row arithmetic for a codec call inside the same
    // mapPartitions stage; the plumbing (typed Dataset in/out, per-partition
    // batching, no shuffle) is the part that survives contact with 100 TB.
    sqlChecked(
      "mm_resize",
      """SELECT doc_id,
        | (width * 224) // GREATEST(width, height) AS width,
        | (height * 224) // GREATEST(width, height) AS height,
        | 224 AS scale_num, GREATEST(width, height) AS scale_den
        |FROM (SELECT doc_id, (strlen(text) % 640) + 1 AS width,
        |             ((strlen(text) * 7) % 480) + 1 AS height
        |      FROM documents) ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val media = Tables.documents(s, dir)
        .select($"doc_id", $"text".cast("binary").as("payload"),
          lit("fake/raw").as("format"))
        .as[MediaRow]
      media
        .mapPartitions(it => it.map { r =>
          val d = decodeStub(r)
          val longSide = math.max(d.width, d.height)
          ResizedMedia(d.doc_id, d.width * 224 / longSide, d.height * 224 / longSide,
            224L, longSide)
        })
        .toDF()
        .orderBy($"doc_id")
    },

    // Frame sampling: each payload is a "video" of byte_len/100 frames;
    // every 8th frame is emitted with a deterministic stub frame hash.
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
