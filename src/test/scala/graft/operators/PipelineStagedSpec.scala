package graft.operators

import org.scalatest.matchers.should.Matchers
import graft.SparkSuite

/** Plan pins for the staged curation pipeline (ta_pipeline_e2e, r9 verdict
  * #9): the corpus must be tokenized ONCE — in the write job that builds
  * [[TextAnalysis.curationIntermediate]] — and the pipeline query itself
  * must consume only the materialized feature table.
  */
class PipelineStagedSpec extends SparkSuite with Matchers {

  test("ta_pipeline_e2e reads only the curation intermediate — no corpus re-scan, no re-tokenize") {
    spark.conf.set(graft.QueryDef.PlainSortConf, "true")
    try {
      val df = graft.SparkEntry.queries("ta_pipeline_e2e")(spark, sf("sf0.001"))
      val p = df.queryExecution.executedPlan.toString
      // every scan is the intermediate; the raw corpus never re-enters
      (p should not).include("documents.parquet")
      p should include("graft-curation-ti")
      // the tokenizer/stats/trigram expressions ran in the write job only
      (p should not).include("norm_words")
      (p should not).include("text_stats")
      (p should not).include("packed_trigrams")
    } finally spark.conf.unset(graft.QueryDef.PlainSortConf)
  }

  test("the intermediate holds exactly the stage feature columns") {
    val ti = spark.read.parquet(
      TextAnalysis.curationIntermediate(spark, sf("sf0.001")))
    ti.schema.fieldNames.toSeq shouldBe Seq(
      "doc_id", "toks", "char_len", "n_tokens", "n_punct", "n_stop", "tgs")
    ti.count() shouldBe spark.read
      .parquet(sf("sf0.001") + "/documents.parquet").count()
  }
}
