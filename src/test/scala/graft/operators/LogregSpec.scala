package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Pins for the integer hard-sigmoid GD trainer: on planted linearly
  * separable data the weights move in the separating direction and
  * training accuracy improves over the zero model; and the trajectory is
  * bit-identical under any partitioning (integer gradient sums — the whole
  * point of the micro-unit formulation).
  */
class LogregSpec extends SparkSuite with Matchers {

  // y=1 rows have large x1, y=0 rows small x1; x2/x3 uninformative noise
  private def planted(parts: Int): DataFrame = {
    import spark.implicits._
    val rows = (0 until 200).map { i =>
      val pos = i % 2 == 0
      (i.toLong, 1L, if (pos) 15L + i % 5 else 2L + i % 3,
        (i % 4).toLong, (i % 7).toLong, if (pos) 1000000L else 0L)
    }
    rows.toDF("doc_id", "x0", "x1", "x2", "x3", "y").repartition(parts)
  }

  private def sigmoid(w: Array[Long], x: Array[Long]): Long = {
    val z = (0 until 4).map(j => w(j) * x(j)).sum
    math.max(0L, math.min(1000000L, 500000L + z / 4))
  }

  test("weights learn the separating feature and accuracy improves") {
    val traj = Training.trainTrajectory(planted(4))
    traj should have size (Training.Steps + 1)
    traj.head._2.toSeq shouldBe Seq(0L, 0L, 0L, 0L)
    val wFinal = traj.last._2
    // x1 separates the classes: its weight must dominate and be positive
    wFinal(1) should be > 0L
    wFinal(1) should be > wFinal(2).abs
    wFinal(1) should be > wFinal(3).abs
    // SEPARATION check at the class-midpoint threshold (the
    // ta_classifier_score tau discipline): three steps move the scores
    // apart long before the bias calibrates the 0.5 cut — with
    // non-negative features and a balanced prior, w0's gradient is the
    // small class-asymmetry of s, so calibration takes many more rounds;
    // asserting raw s > 0.5 accuracy would test calibration, not learning
    val rows = planted(1).collect().map(r =>
      (Array(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)), r.getLong(5)))
    val scored = rows.map { case (x, y) => (sigmoid(wFinal, x), y) }
    val tau = (scored.filter(_._2 > 0).map(_._1).sum / scored.count(_._2 > 0)
      + scored.filter(_._2 == 0).map(_._1).sum / scored.count(_._2 == 0)) / 2
    val acc = scored.count { case (s, y) => (s > tau) == (y > 0L) }.toDouble / rows.length
    acc should be > 0.9
  }

  test("trajectory is bit-identical under 1-, 4- and 16-way partitioning") {
    val ref = Training.trainTrajectory(planted(1)).map(_._2.toSeq)
    for (parts <- Seq(4, 16))
      Training.trainTrajectory(planted(parts)).map(_._2.toSeq) shouldBe ref
  }

  test("scoring face: score = σ_h(w_final·x) per doc, keep ⇔ score ≥ 0.5") {
    val dir = sf("sf0.001")
    val feat = Training.features(spark, dir)
    val wFinal = Training.trainTrajectory(feat).last._2
    val expected = feat.collect().map { r =>
      val x = Array(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      (r.getLong(0), sigmoid(wFinal, x))
    }.sortBy(_._1)
    val scored = graft.SparkEntry.queries("ta_logreg_score")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    scored.map(t => (t._1, t._2)).toSeq shouldBe expected.toSeq
    scored.foreach { case (_, s, keep) => keep shouldBe (s >= 500000L) }
    // learning pin (the same separation discipline as the train spec —
    // 3 steps separate the scores long before the 0.5 cut calibrates):
    // mean score of label-true docs exceeds mean score of label-false docs
    val labels = feat.collect().map(r => (r.getLong(0), r.getLong(5) > 0L)).toMap
    val (pos, neg) = scored.partition(t => labels(t._1))
    pos should not be empty
    neg should not be empty
    (pos.map(_._2).sum / pos.length) should be > (neg.map(_._2).sum / neg.length)
  }

  test("eval face: confusion matrix equals the driver-side recount") {
    val dir = sf("sf0.001")
    val feat = Training.features(spark, dir)
    val wFinal = Training.trainTrajectory(feat).last._2
    val cells = feat.collect().map { r =>
      val x = Array(r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      (sigmoid(wFinal, x) >= 500000L, r.getLong(5) > 0L)
    }
    val (tp, fp, tn, fn) = (
      cells.count(c => c._1 && c._2).toLong, cells.count(c => c._1 && !c._2).toLong,
      cells.count(c => !c._1 && !c._2).toLong, cells.count(c => !c._1 && c._2).toLong)
    val row = graft.SparkEntry.queries("ta_logreg_eval")(spark, dir).collect().head
    (row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4)) shouldBe ((tp, fp, tn, fn))
    row.getLong(0) shouldBe cells.length.toLong
    if (tp + fp > 0) row.getLong(5) shouldBe tp * 1000000L / (tp + fp)
    if (tp + fn > 0) row.getLong(6) shouldBe tp * 1000000L / (tp + fn)
  }
}
