package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Parquet carries its own schema, so no inference pass is needed (unlike the
  * reference, which re-reads CSV/JSON inputs to infer schemas —
  * reference `src/pyspark/pipeline_pyspark.py:94-98`). At 100 TB the parquet
  * footer read is O(files), not O(bytes); filters/projections applied by the
  * caller are pushed into the scan by Catalyst.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  /** The driver's events.parquet stores ts as TIMESTAMP(NANOS), which
    * Spark's parquet reader rejects without the nanosAsLong legacy conf;
    * other writers (e.g. DuckDB COPY) emit TIMESTAMP/TIMESTAMP_NTZ or an
    * explicit BIGINT epoch-nanos column. The reader tolerates ALL of these
    * by branching on the schema it actually read instead of assuming the
    * conf+writer pairing (VERDICT r08 #4: the BIGINT-nanos assumption
    * silently failed 12 ev_* queries against an NTZ-written sf1 file).
    * Nanos→micros uses integer division — ns-since-epoch (~1e18) exceeds
    * double's 53-bit mantissa, so a float division would corrupt
    * timestamps.
    */
  private def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => // epoch-nanos (explicit BIGINT or nanosAsLong)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => // wall-clock written as NTZ; sessions run UTC
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other =>
        throw new IllegalArgumentException(s"events.ts: unsupported type $other")
    }
  }
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(load(spark, dir, "events"))
  }
  /** Streaming twin of [[events]]: same ts normalization over a
    * `readStream` parquet source.
    */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val rawSchema = spark.read.parquet(s"$dir/events.parquet").schema
    normalizeEventTs(
      spark.readStream.schema(rawSchema)
        .option("pathGlobFilter", "events.parquet").parquet(dir))
  }

  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
