package graft.sources

import graft.SparkSpec

/** [[JsonlCorpusSource]] — declared-schema JSONL read with corrupt-line
  * quarantine.
  */
class JsonlCorpusSourceSpec extends SparkSpec {
  import spark.implicits._

  private def writeLines(lines: Seq[String]): String = {
    val dir = tmpDir("jsonl")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-000.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir
  }

  test("clean lines parse with exact declared types") {
    val dir = writeLines(Seq(
      """{"doc_id": 1, "text": "hello world", "lang": "en", "url": "https://example.com/a", "fetched_at": "2024-01-01T00:00:00Z"}""",
      """{"doc_id": 2, "text": "xin chao", "lang": "vi"}"""))
    val df = JsonlCorpusSource.read(spark, dir)
    assert(df.schema === JsonlCorpusSource.schema)
    val valid = JsonlCorpusSource.valid(df)
      .select("doc_id", "text", "lang")
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(valid === Seq((1L, "hello world", "en"), (2L, "xin chao", "vi")))
    // absent optional fields are nulls, not errors
    assert(JsonlCorpusSource.valid(df).filter("doc_id = 2")
      .select("url").first().isNullAt(0))
  }

  test("malformed lines land in the reject stream, not the corpus") {
    val dir = writeLines(Seq(
      """{"doc_id": 1, "text": "good", "lang": "en"}""",
      """{doc_id: not json at all""",
      """{"doc_id": 3, "lang": "en"}""")) // parses but has no text
    val df = JsonlCorpusSource.read(spark, dir)
    assert(JsonlCorpusSource.valid(df).count() === 1)
    val rejects = JsonlCorpusSource.rejects(df).collect()
    assert(rejects.length === 2)
    // the raw broken line is preserved verbatim for quarantine (full-row
    // projection: Spark refuses a scan that projects ONLY the corrupt
    // column — see the rejects scaladoc)
    assert(rejects.count(r =>
      r.getAs[String]("_corrupt") != null) === 1)
    assert(rejects.exists(r =>
      Option(r.getAs[String]("_corrupt")).exists(_.contains("not json"))))
  }

  test("a type-mismatched field corrupts only its row") {
    val dir = writeLines(Seq(
      """{"doc_id": "not-a-number", "text": "bad id", "lang": "en"}""",
      """{"doc_id": 7, "text": "fine", "lang": "en"}"""))
    val df = JsonlCorpusSource.read(spark, dir)
    val valid = JsonlCorpusSource.valid(df)
      .select("doc_id").as[Long].collect().toSeq
    assert(valid === Seq(7L))
    assert(JsonlCorpusSource.rejects(df).count() === 1)
  }

  test("the corpus flows straight into the prep operators") {
    val dir = writeLines(Seq(
      """{"doc_id": 1, "text": "Alpha beta GAMMA delta!", "lang": "en"}""",
      """{"doc_id": 2, "text": "alpha beta gamma delta", "lang": "en"}"""))
    val docs = JsonlCorpusSource.valid(JsonlCorpusSource.read(spark, dir))
    // exact dedup by fingerprint groups the case/punct variants
    val grams = graft.operators.Decontaminate.ngrams(docs, n = 4)
      .as[(Long, String)].collect().toSet
    assert(grams === Set((1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta")))
  }
}
