package graft.freshkart

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Pipeline configuration (reference `settings.yaml:1-9` +
  * `pipeline_pyspark.py:24-33,59-69`): input/output/db paths and the CSV
  * export locale options. Relative paths resolve against the settings
  * file's directory, like the reference resolves against the repo root.
  *
  * Parsed with a minimal flat `key: value` reader — the reference's settings
  * surface is exactly one level of scalar keys, and no YAML library is
  * resolvable offline (build.sbt constraint).
  */
final case class Config(
    inputDir: String,
    outputDir: String,
    dbPath: String,
    csvSep: String = ";",
    csvEncoding: String = "utf-8",
    csvFloatFormat: String = "%.2f")

object Config {

  def load(path: String): Config = {
    val p = Paths.get(path)
    val base = Option(p.toAbsolutePath.getParent)
    def resolve(raw: String): String = {
      val c = Paths.get(raw)
      if (c.isAbsolute) raw else base.map(_.resolve(c).normalize.toString).getOrElse(raw)
    }
    val kv = Files.readAllLines(p, StandardCharsets.UTF_8).asScala
      .map(_.takeWhile(_ != '#').trim)
      .filter(l => l.nonEmpty && l.contains(':'))
      .map { l =>
        val i = l.indexOf(':')
        val v = l.drop(i + 1).trim.stripPrefix("\"").stripSuffix("\"")
        l.take(i).trim -> v
      }
      .toMap
    Config(
      inputDir = resolve(kv.getOrElse("input_dir", "./data/march-input")),
      outputDir = resolve(kv.getOrElse("output_dir", "./data/out")),
      dbPath = resolve(kv.getOrElse("db_path", "./data/sales_db.db")),
      csvSep = kv.getOrElse("csv_sep", ";"),
      csvEncoding = kv.getOrElse("csv_encoding", "utf-8"),
      csvFloatFormat = kv.getOrElse("csv_float_format", "%.2f"))
  }
}
