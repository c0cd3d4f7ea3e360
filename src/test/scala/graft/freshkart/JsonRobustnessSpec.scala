package graft.freshkart

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import org.apache.spark.SparkException
import org.apache.spark.sql.functions._
import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** S1 robustness: malformed-input behavior of the JSON scan, pinned as it
  * actually is in Spark 4.
  *
  *  - multiLine array files (the reference's format): the WHOLE FILE is the
  *    parse unit — one bad byte collapses the file to a SINGLE all-null row
  *    under PERMISSIVE, silently losing its valid records too.
  *    Operationally: validate/quarantine files BEFORE multiLine ingestion;
  *    per-record tolerance is not available in this mode.
  *  - line-delimited JSON: per-RECORD tolerance works — PERMISSIVE nulls
  *    only the bad line, FAILFAST stops the scan with a read error.
  */
class JsonRobustnessSpec extends SparkSuite with Matchers {

  private def write(name: String, content: String): String = {
    val dir = Files.createTempDirectory("fk-badjson")
    Files.write(dir.resolve(name), content.getBytes(StandardCharsets.UTF_8))
    dir.toString
  }

  private val goodRec =
    """{"order_id": "O1", "customer_id": "C0001", "channel": "web", "created_at": "2025-03-01", "payment_status": "paid", "items": [{"sku": "S1", "qty": 1, "unit_price": 2.50}]}"""
  private val badRec =
    """{"order_id": "O2", "items": [{"sku": "S2", "qty": THIS_IS_NOT_JSON}]}"""

  test("multiLine PERMISSIVE: one malformed byte collapses the file to a single null row") {
    val dir = write("orders_2025-03-01.json", s"[\n  $goodRec,\n  $badRec\n]")
    val rows = SalesPipeline.readOrders(spark, dir).collect()
    rows.length shouldBe 1
    rows.head.anyNull shouldBe true
    rows.head.isNullAt(0) shouldBe true // the valid record is gone too
  }

  test("line-delimited PERMISSIVE: only the bad line nulls out") {
    val dir = write("orders.ndjson", s"$goodRec\n$badRec\n")
    val df = spark.read.schema(Schemas.orders).json(s"$dir/orders.ndjson")
    df.count() shouldBe 2
    df.filter(col("order_id").isNotNull).count() shouldBe 1
    df.filter(col("order_id") === "O1")
      .select(col("items")(0)("unit_price")).collect().head.getDouble(0) shouldBe 2.50
  }

  test("line-delimited FAILFAST: malformed line stops the scan") {
    val dir = write("orders.ndjson", s"$goodRec\n$badRec\n")
    val ex = intercept[SparkException] {
      spark.read.option("mode", "FAILFAST").schema(Schemas.orders)
        .json(s"$dir/orders.ndjson").collect()
    }
    // Spark 4 wraps the malformed-record error as FAILED_READ_FILE
    ex.getMessage should include("FAILED_READ_FILE")
  }
}
