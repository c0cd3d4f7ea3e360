package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Pins for webdataset tar-shard ingestion (mm_tar_shards): extraction is
  * byte-preserving (md5 of every extracted .png equals the committed
  * file), adjacency assembly pairs each sample's entries exactly, and the
  * ingestion plan is shuffle-free up to the presentation sort.
  */
class TarShardsSpec extends SparkSuite with Matchers {

  private def fixtureMd5(name: String): String = {
    val b = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(graft.Fixtures.dir("media", "GRAFT_MEDIA_DIR"), name))
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString
  }

  test("tar extraction is byte-preserving against the committed fixtures") {
    import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
    val root = Multimodal.tarShardDir
    var checked = 0
    for (shard <- 0 until Multimodal.TarShardCount) {
      val in = new TarArchiveInputStream(new java.io.BufferedInputStream(
        new java.io.FileInputStream(s"$root/shard-$shard.tar")))
      var e = in.getNextEntry
      while (e != null) {
        val bytes = in.readAllBytes()
        if (e.getName.endsWith(".png")) {
          val got = java.security.MessageDigest.getInstance("MD5")
            .digest(bytes).map("%02x".format(_)).mkString
          withClue(e.getName) { got shouldBe fixtureMd5(e.getName) }
          checked += 1
        }
        e = in.getNextEntry
      }
      in.close()
    }
    checked shouldBe 48
  }

  test("adjacency assembly: every sample pairs its png with its cls") {
    val root = Multimodal.tarShardDir
    for (shard <- 0 until Multimodal.TarShardCount) {
      val samples = Multimodal.readTarShard(s"file:$root/shard-$shard.tar").toSeq
      samples should have size (48 / Multimodal.TarShardCount)
      samples.foreach { s =>
        s.doc_id % Multimodal.TarShardCount shouldBe shard
        s.shard shouldBe shard.toLong
        s.label shouldBe s.doc_id % 10
        s.width should be > 0L
      }
    }
  }

  test("the packer's shards roundtrip byte-identically too") {
    import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
    val root = Multimodal.packedShardDir(spark)
    var checked = 0
    for (shard <- 0 until Multimodal.PackShardCount) {
      val in = new TarArchiveInputStream(new java.io.BufferedInputStream(
        new java.io.FileInputStream(s"$root/shard-$shard.tar")))
      var e = in.getNextEntry
      var lastId = -1L
      while (e != null) {
        val bytes = in.readAllBytes()
        if (e.getName.endsWith(".png")) {
          val got = java.security.MessageDigest.getInstance("MD5")
            .digest(bytes).map("%02x".format(_)).mkString
          withClue(e.getName) { got shouldBe fixtureMd5(e.getName) }
          // entries are sorted by doc_id within the shard (the writer's
          // in-partition sort) — adjacency AND determinism
          val id = e.getName.stripPrefix("img_").stripSuffix(".png").toLong
          id should be > lastId
          lastId = id
          checked += 1
        }
        e = in.getNextEntry
      }
      in.close()
    }
    checked shouldBe 48
  }

  test("packing is deterministic — a retried/re-run write is byte-identical") {
    // the packer's task body is retry-idempotent BY CONSTRUCTION: sorted
    // input + overwrite-create + no timestamps in entries. Two independent
    // pack runs must produce byte-identical shards, which is what makes a
    // mid-write task retry safe (the retry rewrites the same bytes).
    val first = Multimodal.packedShardDir(spark)
    val second = java.nio.file.Files.createTempDirectory("tar-pack-2").toString
    Multimodal.packInto(spark, second)
    for (shard <- 0 until Multimodal.PackShardCount) {
      def md5(p: String) = java.security.MessageDigest.getInstance("MD5")
        .digest(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)))
        .map("%02x".format(_)).mkString
      withClue(s"shard $shard: ") {
        md5(s"$second/shard-$shard.tar") shouldBe md5(s"$first/shard-$shard.tar")
      }
    }
  }

  test("a zstd-compressed shard reads identically to its plain twin") {
    val root = Multimodal.tarShardDir
    val tmp = java.nio.file.Files.createTempDirectory("tar-zst").toString
    val in = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$root/shard-0.tar"))
    val out = new com.github.luben.zstd.ZstdOutputStream(
      new java.io.FileOutputStream(s"$tmp/shard-0.tar.zst"))
    out.write(in); out.close()
    val plain = Multimodal.readTarShard(s"file:$root/shard-0.tar").toSeq
    val zst = Multimodal.readTarShard(s"file:$tmp/shard-0.tar.zst").toSeq
    zst shouldBe plain
  }

  test("ingestion plans shuffle-free up to the presentation sort") {
    val plan = withPlainSort {
      graft.SparkEntry.queries("mm_tar_shards")(spark, sf("sf0.001"))
        .queryExecution.executedPlan.toString
    }
    // exactly ONE exchange: the final sort's range partitioning — the
    // scan → stream → assemble → decode pipeline itself never shuffles
    "Exchange".r.findAllIn(plan).size shouldBe 1
  }
}
