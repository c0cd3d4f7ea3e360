package graft.freshkart

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Completes the A5 tutorial-surface enumeration (SURVEY §2.4: reduceByKey /
  * groupByKey / groupBy(f)): the oracle-checked fk_rdd_wordcount uses
  * reduceByKey (the map-side-combining production shape); this spec pins the
  * other two against it on the same fixture.
  */
class RddSurfaceSpec extends SparkSuite with Matchers {

  private def words = spark.sparkContext
    .textFile("fixtures/freshkart/data.txt")
    .flatMap(_.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[^a-z0-9\\s]", " ").trim.split("\\s+"))
    .filter(_.nonEmpty)

  test("A5: groupByKey word count equals reduceByKey (which combines map-side)") {
    val byReduce = words.map((_, 1L)).reduceByKey(_ + _).collect().toMap
    val byGroup = words.map((_, 1L)).groupByKey().mapValues(_.sum).collect().toMap
    byGroup shouldBe byReduce
    byReduce.values.sum shouldBe words.count()
  }

  test("A5: groupBy(predicate) partitions words by a derived key") {
    val byLen = words.distinct().groupBy(_.length % 2 == 0).collectAsMap()
    val even = byLen.getOrElse(true, Nil).toSet
    val odd = byLen.getOrElse(false, Nil).toSet
    (even ++ odd) shouldBe words.distinct().collect().toSet
    even.intersect(odd) shouldBe empty
    all(even.toSeq.map(_.length % 2)) shouldBe 0
  }
}
