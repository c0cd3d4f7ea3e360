package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scale-up smoke: synthesize an N×-scaled copy of a testdata dir
  * (key-shifted unions — documents/embeddings become exact duplicate
  * families, the realistic dedup workload) and time the scale-critical
  * queries on it, printing per-query seconds and the ratio vs the source
  * dir. This is the measured half of SCALING.md's argument: a plan whose
  * runtime scales ≈ linearly in rows here has no hidden all-pairs/
  * global-sort step; a super-linear one does.
  *
  * Run: `sbt "runMain graft.ScaleSmoke"` (env: SPARK_GRAFT_COPIES=8,
  * SPARK_GRAFT_SCALE_SRC=/root/testdata/sf0.1,
  * SPARK_GRAFT_SCALE_DST=/tmp/graft_scale).
  */
object ScaleSmoke {

  private val queries = Seq(
    "q01_pricing_summary", "q20_sketch_stats", "q32_percentiles",
    "ta_tokens", "ta_langid", "ta_seq_pack", "ta_pipeline_e2e",
    "dd_span_dup", "dd_minhash_lsh", "dd_components", "dd_embedding_lsh")

  def main(args: Array[String]): Unit = {
    val src = sys.env.getOrElse("SPARK_GRAFT_SCALE_SRC", "/root/testdata/sf0.1")
    val dst = sys.env.getOrElse("SPARK_GRAFT_SCALE_DST", "/tmp/graft_scale")
    val copies = sys.env.getOrElse("SPARK_GRAFT_COPIES", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-scale-smoke")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(dst, "lineitem.parquet")))
      synthesize(spark, src, dst, copies)

    def timed(thunk: => Unit): Double = {
      val t0 = System.nanoTime(); thunk; (System.nanoTime() - t0) / 1e9
    }
    def run(dir: String, name: String): Double = timed(
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save())

    // warm codegen/scan paths once on the small side
    run(src, "q01_pricing_summary")
    val rows = queries.map { name =>
      val small = run(src, name)
      val big = run(dst, name)
      println(f"""[scale] $name%-22s src=$small%6.2f s  ${copies}x=$big%6.2f s  ratio=${big / small}%5.2f""")
      (name, small, big)
    }
    val obj = rows.map { case (n, s, b) =>
      f""""$n":{"src_sec":$s%.3f,"big_sec":$b%.3f,"ratio":${b / s}%.2f}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_smoke","copies":$copies,"queries":$obj}""")
    spark.stop()
  }

  /** Key-shifted union ×copies for the tables the smoke queries read.
    * documents get a per-copy suffix token so copies stay exact near-dup
    * families without being byte-identical in the tail grams.
    */
  private def synthesize(spark: SparkSession, src: String, dst: String, copies: Int): Unit = {
    def shifted(df: DataFrame, key: String, shift: Long, i: Int): DataFrame =
      df.withColumn(key, col(key) + lit(shift * i))
    def union(df: DataFrame, key: String, tweak: (DataFrame, Int) => DataFrame): DataFrame = {
      val shift = df.agg(max(col(key))).collect().head.getLong(0) + 1
      (0 until copies).map(i => tweak(shifted(df, key, shift, i), i)).reduce(_ union _)
    }
    val li = spark.read.parquet(s"$src/lineitem.parquet")
      .withColumn("l_orderkey", col("l_orderkey").cast("long"))
    union(li, "l_orderkey", (d, _) => d)
      .write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
    val docs = spark.read.parquet(s"$src/documents.parquet")
    union(docs, "doc_id", (d, i) =>
      d.withColumn("text", concat(col("text"), lit(s" copytag$i"))))
      .write.mode("overwrite").parquet(s"$dst/documents.parquet")
    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    union(emb, "vec_id", (d, _) => d)
      .write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    println(s"[scale] synthesized ${copies}x copies of lineitem/documents/embeddings at $dst")
  }
}
