package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Fixed-point pins for the CLIP-style alignment filter that the oracle
  * gate (a full replay) can't distinguish from a coincidentally-equal
  * reimplementation: a caption whose hashed projection IS the image vector
  * scores exactly 1.0 (kept), its negation exactly -1.0 (dropped), an
  * orthogonal image exactly 0.0 (dropped), and the two degenerate inputs —
  * an empty caption and a caption whose token signs fully cancel — drop
  * out of the result instead of dividing by zero.
  */
class ClipFilterSpec extends SparkSuite with Matchers {

  private val D = 64

  /** Scala twin of Exprs.hash60 (first 15 md5 hex digits as a long). */
  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  private def dimOf(t: String): Int = (h60("clipdim:" + t) % D).toInt
  private def sgnOf(t: String): Float = if (h60("clipsign:" + t) % 2 == 0) 1f else -1f

  private def hashedVec(caption: String): Array[Float] = {
    val v = new Array[Float](D)
    caption.split(" ").filter(_.nonEmpty).foreach(t => v(dimOf(t)) += sgnOf(t))
    v
  }

  test("clip filter: fixed points, degenerate captions, missing pairs") {
    import spark.implicits._
    val caption = "red panda climbs bamboo"
    val vec = hashedVec(caption)
    vec.exists(_ != 0f) shouldBe true

    // an image direction the caption never touches
    val freeDim = vec.indexWhere(_ == 0f)
    val orth = new Array[Float](D); orth(freeDim) = 0.5f

    // a caption whose two tokens land on one dim with opposite signs —
    // found by search so the pin survives any future vocab change
    val vocab = (0 until 300).map(i => s"w$i")
    val cancelling = (for {
      a <- vocab.iterator; b <- vocab.iterator
      if a < b && dimOf(a) == dimOf(b) && sgnOf(a) != sgnOf(b)
    } yield s"$a $b").next()

    val docs = Seq(
      (1L, caption),      // aligned: image = own hashed projection
      (2L, caption),      // misaligned: image = negated projection
      (3L, caption),      // orthogonal image
      (4L, "?!. ,,,"),    // normalizes to zero tokens
      (5L, cancelling),   // tokens cancel: zero caption vector
      (6L, caption))      // no image at all
      .toDF("doc_id", "text")
    val embeds = Seq(
      (1L, vec.map(x => x * 0.25f).toSeq),
      (2L, vec.map(x => -x * 0.25f).toSeq),
      (3L, orth.toSeq),
      (4L, vec.toSeq),
      (5L, vec.toSeq))
      .toDF("vec_id", "embedding")

    val r = Multimodal.clipScores(spark, docs, embeds)
      .collect().map(row => row.getLong(0) -> (row.getDouble(1), row.getBoolean(2)))
      .toMap

    // only the three well-formed pairs survive
    r.keySet shouldBe Set(1L, 2L, 3L)
    r(1L) shouldBe ((1.0, true))   // exact: integer dot/norms cancel
    r(2L) shouldBe ((-1.0, false))
    r(3L) shouldBe ((0.0, false))
  }

  test("clip filter: score is scale-invariant in the image embedding") {
    import spark.implicits._
    val caption = "a dog on a skateboard"
    val vec = hashedVec(caption)
    val docs = Seq((1L, caption), (2L, caption)).toDF("doc_id", "text")
    // mix the aligned direction with an orthogonal one, then rescale —
    // cosine must not move (norms divide out, exactly, in micro-units)
    val freeDim = vec.indexWhere(_ == 0f)
    val mixed = vec.map(x => x * 0.5f); mixed(freeDim) = 0.5f
    val embeds = Seq(
      (1L, mixed.toSeq),
      (2L, mixed.map(x => x * 0.5f).toSeq))
      .toDF("vec_id", "embedding")
    val r = Multimodal.clipScores(spark, docs, embeds)
      .collect().map(row => row.getLong(0) -> row.getDouble(1)).toMap
    r(1L) shouldBe r(2L)
    r(1L) should (be > 0.0 and be < 1.0)
  }
}
