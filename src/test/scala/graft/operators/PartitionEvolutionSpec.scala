package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.{SparkSuite, Tables}

/** Pins for partition evolution that the oracle gate can't see: the
  * per-file partition contract (spec-1 files hold exactly their hash
  * bucket of the even-key half, spec-2 files exactly their status of the
  * odd-key half), the evolution invariant (legacy files + evolved files =
  * the logical table, no row lost or duplicated), and the SYMMETRIC
  * pruning direction the query doesn't exercise — a predicate on the OLD
  * partition dim prunes the legacy files while the evolved files become
  * the residual side.
  */
class PartitionEvolutionSpec extends SparkSuite with Matchers {

  test("partition evolution: per-file contract, no row lost, symmetric pruning") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val dir = sf("sf0.001")
    val root = Formats.evoTableDir(spark, dir)
    val entries = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get(s"$root/manifest-evo.txt"))
      .asScala.filter(_.nonEmpty).map { l =>
        val Array(name, spec, tuple) = l.split('|'); (name, spec, tuple)
      }.toSeq
    entries.map(_._1).sorted shouldBe Seq(
      "evo-s1-b0.parquet", "evo-s1-b1.parquet", "evo-s1-b2.parquet",
      "evo-s1-b3.parquet", "evo-s2-F.parquet", "evo-s2-O.parquet",
      "evo-s2-P.parquet")

    // per-file partition contract under each file's OWN spec
    for ((name, spec, tuple) <- entries) {
      val f = spark.read.parquet(s"$root/$name")
      if (spec == "1") {
        val b = tuple.stripPrefix("bucket=").toInt
        f.filter($"o_orderkey" % 2 =!= 0 ||
            org.apache.spark.sql.functions.expr("(o_orderkey div 2) % 4") =!= b)
          .count() shouldBe 0
        // legacy files know nothing about status: all three present
        f.select($"o_orderstatus").distinct().count() shouldBe 3
      } else {
        val st = tuple.stripPrefix("status=")
        f.filter($"o_orderkey" % 2 =!= 1 || $"o_orderstatus" =!= st)
          .count() shouldBe 0
      }
    }

    // evolution invariant: the union of every file IS the logical table
    val all = spark.read.parquet(entries.map(e => s"$root/${e._1}"): _*)
    val orders = Tables.orders(spark, dir)
    all.count() shouldBe orders.count()
    all.exceptAll(orders.select(all.columns.map(org.apache.spark.sql.functions.col).toSeq: _*))
      .count() shouldBe 0

    // symmetric direction: predicate on the OLD dim (bucket 1) prunes
    // spec-1 to one file; spec-2 files are kept and residual-filtered
    val kept = entries.collect {
      case (n, "2", _) => n
      case (n, "1", t) if t == "bucket=1" => n
    }
    kept.count(_.contains("-s1-")) shouldBe 1
    val bucketExpr = org.apache.spark.sql.functions.expr("(o_orderkey div 2) % 4")
    val prunedN = spark.read.parquet(kept.map(f => s"$root/$f"): _*)
      .filter(bucketExpr === 1).count()
    prunedN shouldBe orders.filter(bucketExpr === 1).count()
  }
}
