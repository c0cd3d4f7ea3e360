package graft.freshkart

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.Locale
import scala.util.Random

/** Deterministic generator for the March-2025 FreshKart fixtures (FIXTURES.md).
  *
  * The reference's own input data is gitignored and absent from the snapshot
  * (`/root/reference/.gitignore`), so the fixtures are generated to the shapes
  * the reference documents: 31 daily `orders_YYYY-MM-DD.json` files (each a
  * JSON *array*, read with multiLine — reference `pipeline_pyspark.py:94-96`),
  * `customers.csv` (800 rows, dirty `is_active`), `refunds.csv` (972 rows,
  * negative amounts, some garbage), plus `data.txt` for the text-scan /
  * word-count tutorial surface.
  *
  * Must-have edge rows (FIXTURES.md §1.1) are all planted:
  *  - duplicate `order_id` records (re-emitted later the same day with a
  *    strictly larger `created_at`, sometimes different items) → W1 dedup;
  *  - multi-item orders → the one-item-line-per-order trap (SURVEY §7.1.1);
  *  - negative `unit_price` items → the rejects split (P4);
  *  - date-only `created_at` values → the two-format parse (U2);
  *  - non-"paid" statuses → P3; unknown customer_ids → null join + P5 drop;
  *  - refunds pointing at filtered-out and non-existent orders → A2 trap
  *    (aggregate before filtering);
  *  - garbage refund amounts → F2 `try_cast`.
  *
  * Single fixed seed; doubles are emitted with 2 decimals so JSON/CSV parse
  * to bit-identical doubles in any engine. Run once, output is committed:
  * `sbt "runMain graft.freshkart.FixtureGen fixtures/freshkart"`.
  */
object FixtureGen {

  private def f2(x: Double): String = String.format(Locale.ROOT, "%.2f", Double.box(x))

  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(if (args.nonEmpty) args(0) else "fixtures/freshkart")
    Files.createDirectories(outDir)
    val rnd = new Random(20250301L)

    val cities = Seq("Nice", "Marseille", "Paris", "Lille", "Lyon", "Toulouse", "Bordeaux", "Nantes")
    val channels = Seq("web", "mobile", "store")
    val statuses = Seq("paid", "paid", "paid", "paid", "pending", "failed", "refunded")
    val reasons = Seq("delay", "item_issue", "gesture", "coupon")
    val firstNames = Seq("Marie", "Jean", "Luc", "Sophie", "Paul", "Julie", "Hugo", "Emma", "Louis", "Alice")
    val lastNames = Seq("Martin", "Bernard", "Dubois", "Thomas", "Robert", "Richard", "Petit", "Durand", "Leroy", "Moreau")
    // Dirty is_active inputs covering every branch of the U1 string truth
    // table; weighted so ~2/3 of customers are active.
    val dirtyTrue = Seq("true", "1", "yes", "y", "t", "TRUE", "True", "YES")
    val dirtyFalse = Seq("false", "0", "no", "FALSE", "0.5", "2", "oui", "")

    // ---- customers.csv (800 rows) ------------------------------------------
    val customers = (1 to 800).map { i =>
      val id = f"C$i%04d"
      val fn = firstNames(rnd.nextInt(firstNames.size))
      val ln = lastNames(rnd.nextInt(lastNames.size))
      val city = cities(rnd.nextInt(cities.size))
      val act =
        if (rnd.nextDouble() < 0.66) dirtyTrue(rnd.nextInt(dirtyTrue.size))
        else dirtyFalse(rnd.nextInt(dirtyFalse.size))
      s"$id,$fn,$ln,${fn.toLowerCase(Locale.ROOT)}.${ln.toLowerCase(Locale.ROOT)}$i@example.com,$city,$act"
    }
    Files.write(outDir.resolve("customers.csv"),
      ("customer_id,first_name,last_name,email,city,is_active" +: customers).mkString("", "\n", "\n")
        .getBytes(StandardCharsets.UTF_8))

    // ---- orders_YYYY-MM-DD.json (31 files, ~103 records each) --------------
    val allOrderIds = collection.mutable.ArrayBuffer.empty[String]
    for (day <- 1 to 31) {
      val date = f"2025-03-$day%02d"
      val recs = collection.mutable.ArrayBuffer.empty[String]
      val baseCount = 100
      val dayRecords = (1 to baseCount).map { seq =>
        val orderId = f"O202503$day%02d$seq%04d"
        allOrderIds += orderId
        // ~3% unknown customers (not in customers.csv) → dropped by P5.
        val custId =
          if (rnd.nextDouble() < 0.03) f"C${801 + rnd.nextInt(20)}%04d"
          else f"C${1 + rnd.nextInt(800)}%04d"
        val channel = channels(rnd.nextInt(channels.size))
        // ~10% date-only created_at → second strptime format (U2).
        val createdAt =
          if (rnd.nextDouble() < 0.10) date
          else f"$date ${6 + rnd.nextInt(16)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d"
        val status = statuses(rnd.nextInt(statuses.size))
        val nItems = 1 + rnd.nextInt(4)
        val items = (1 to nItems).map { _ =>
          val sku = f"SKU-${1 + rnd.nextInt(300)}%04d"
          val qty = 1 + rnd.nextInt(5)
          // ~2% negative unit_price → rejects split (P4).
          val price = if (rnd.nextDouble() < 0.02) -(1 + rnd.nextInt(5000)) / 100.0
                      else (100 + rnd.nextInt(9900)) / 100.0
          s"""{"sku": "$sku", "qty": $qty, "unit_price": ${f2(price)}}"""
        }
        (orderId, custId, channel, createdAt, status, items)
      }
      dayRecords.foreach { case (oid, cid, ch, ts, st, items) =>
        recs += s"""  {"order_id": "$oid", "customer_id": "$cid", "channel": "$ch", "created_at": "$ts", "payment_status": "$st", "items": [${items.mkString(", ")}]}"""
      }
      // ~3 duplicate records per day: same order_id, strictly later
      // created_at (original + suffix time), possibly different items → the
      // dedup must keep the FIRST occurrence's first item line.
      (1 to 3).foreach { _ =>
        val (oid, cid, ch, ts, st, items) = dayRecords(rnd.nextInt(dayRecords.size))
        val laterTs =
          if (ts.length == 10) s"$ts 23:5${rnd.nextInt(10)}:00" // date-only < any timestamped string
          else ts + ".5" // fractional second: sorts strictly after the original
        val dupItems =
          if (rnd.nextBoolean()) items
          else items.take(1 + rnd.nextInt(items.size))
        recs += s"""  {"order_id": "$oid", "customer_id": "$cid", "channel": "$ch", "created_at": "$laterTs", "payment_status": "$st", "items": [${dupItems.mkString(", ")}]}"""
      }
      Files.write(outDir.resolve(s"orders_$date.json"),
        recs.mkString("[\n", ",\n", "\n]\n").getBytes(StandardCharsets.UTF_8))
    }

    // ---- refunds.csv (972 rows) --------------------------------------------
    val refunds = (1 to 972).map { i =>
      val id = f"R$i%06d"
      // Mostly real orders (paid or not — refunds are aggregated BEFORE any
      // filtering, SURVEY §7.1.3); ~2% orphans pointing at no order at all.
      val orderId =
        if (rnd.nextDouble() < 0.02) f"O20250399${rnd.nextInt(10000)}%04d"
        else allOrderIds(rnd.nextInt(allOrderIds.size))
      // ~2% garbage amounts → try_cast null → filled 0.0 (F2).
      val amount =
        if (rnd.nextDouble() < 0.02) Seq("n/a", "", "abc", "12.50.1")(rnd.nextInt(4))
        else f2(-(100 + rnd.nextInt(1900)) / 100.0)
      val reason = reasons(rnd.nextInt(reasons.size))
      val day = 1 + rnd.nextInt(31)
      val ts = f"2025-03-$day%02d ${8 + rnd.nextInt(12)}%02d:${rnd.nextInt(60)}%02d:${rnd.nextInt(60)}%02d"
      s"$id,$orderId,$amount,$reason,$ts"
    }
    Files.write(outDir.resolve("refunds.csv"),
      ("refund_id,order_id,amount,reason,created_at" +: refunds).mkString("", "\n", "\n")
        .getBytes(StandardCharsets.UTF_8))

    // ---- data.txt (word-count tutorial surface: S3/F4-F7/A4/O2) ------------
    val vocab = Seq("spark", "data", "pipeline", "fresh", "kart", "orders", "daily",
      "revenue", "city", "channel", "refund", "customer", "paris", "lyon", "stream")
    val lines = (1 to 200).map { _ =>
      val n = 4 + rnd.nextInt(10)
      (1 to n).map { _ =>
        val w = vocab(rnd.nextInt(vocab.size))
        val cased = if (rnd.nextDouble() < 0.2) w.toUpperCase(Locale.ROOT) else w
        if (rnd.nextDouble() < 0.15) cased + Seq(".", "!", "?", ",")(rnd.nextInt(4)) else cased
      }.mkString(" ")
    }
    Files.write(outDir.resolve("data.txt"),
      lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))

    // ---- settings.yaml (config fixture, mirrors reference settings.yaml) ---
    Files.write(outDir.resolve("settings.yaml"),
      s"""# Paths (relative or absolute)
         |input_dir: ${outDir.toAbsolutePath}
         |output_dir: /tmp/freshkart-out
         |db_path: /tmp/freshkart-out/sales.db
         |
         |# CSV export options
         |csv_sep: ";"
         |csv_encoding: "utf-8"
         |csv_float_format: "%.2f"
         |""".stripMargin.getBytes(StandardCharsets.UTF_8))

    println(s"fixtures written to ${outDir.toAbsolutePath}")
  }
}
