package graft.freshkart

import org.apache.spark.sql.types._

/** Explicit input schemas for the FreshKart sales pipeline.
  *
  * The reference infers every schema at read time (multiLine JSON inference,
  * CSV `inferSchema=True` — reference `src/pyspark/pipeline_pyspark.py:94-98`),
  * which re-reads the input and is non-deterministic under dirty data. We
  * declare the schemas the reference's inference converges to on its data
  * (field shapes from `pipeline_pyspark.py:113-121` and the Postgres DDL
  * `freshkartmindump.sql:14-28`):
  *
  *  - `is_active` is STRING, not BOOLEAN: the column arrives dirty
  *    ("1"/"yes"/"t"/"0.5"/empty), so inference lands on string and the
  *    Python UDF takes its string branch — our boolNorm string path mirrors
  *    exactly that (SURVEY §2.9 U1).
  *  - `amount` is STRING: garbage values occur and the reference guards with
  *    `try_cast(amount AS double)` (`pipeline_pyspark.py:106`).
  *  - `created_at` stays STRING end-to-end; the dedup sort key is the raw
  *    string (SURVEY §7.1.6).
  */
object Schemas {

  val itemType: StructType = StructType(Seq(
    StructField("sku", StringType),
    StructField("qty", LongType),
    StructField("unit_price", DoubleType)))

  val orders: StructType = StructType(Seq(
    StructField("order_id", StringType),
    StructField("customer_id", StringType),
    StructField("channel", StringType),
    StructField("created_at", StringType),
    StructField("payment_status", StringType),
    StructField("items", ArrayType(itemType))))

  val customers: StructType = StructType(Seq(
    StructField("customer_id", StringType),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("email", StringType),
    StructField("city", StringType),
    StructField("is_active", StringType)))

  val refunds: StructType = StructType(Seq(
    StructField("refund_id", StringType),
    StructField("order_id", StringType),
    StructField("amount", StringType),
    StructField("reason", StringType),
    StructField("created_at", StringType)))
}
