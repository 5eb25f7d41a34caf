package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Byte-for-byte fidelity of the Vietnamese-aware normalizer against the
  * reference semantics (`spark_kafka_consumer_dag.py:104-108`): lower →
  * strip → non-[\w\s+VN] → space → \s+ collapse, including the quirks
  * (unicode \w keeps `_` and all letters; no final trim).
  */
class NormalizeViSpec extends SparkSpec {
  import spark.implicits._

  // reference algorithm transliterated for the oracle side of the test
  private val vn =
    "áàảãạăắằẳẵặâấầẩẫậéèẻẽẹêếềểễệíìỉĩịóòỏõọôốồổỗộơớờởỡợúùủũụưứừửữựýỳỷỹỵđ"
  private val re = ("[^\\w\\s" + vn + "]").r
  private def expected(text: String): String = {
    val t = text.toLowerCase.trim
    // Python \w with re.UNICODE = unicode letters, digits, underscore
    val masked = t.map { c =>
      val keep = c == '_' || Character.isLetterOrDigit(c) ||
        Character.isWhitespace(c) || vn.contains(c)
      if (keep) c else ' '
    }.mkString
    masked.replaceAll("\\s+", " ")
  }

  private def run(in: Seq[String]): Seq[String] =
    in.toDF("t").select(MockScorers.normalizeVi(col("t"))).as[String]
      .collect().toSeq

  test("fidelity on Vietnamese fixtures incl. edge quirks") {
    val inputs = Seq(
      "Hàng về đẹp lắm nha ship thân thiện đi giày vừa in",
      "Giày hơi có mùi nồng, đế THÂM nhưng chất ổn!!!",
      "  SHIP nhanh 10/10 điểm 🙂🙂  ",
      "!đầu câu có dấu chấm than",
      "under_score giữ nguyên",
      "", "   ", "123 + 456 = ?")
    assert(run(inputs) === inputs.map(expected))
  }

  test("quirk: leading punctuation leaves a leading space (no final trim)") {
    assert(run(Seq("!xin chào")) === Seq(" xin chào"))
  }

  test("unicode letters survive; emoji and punctuation do not") {
    val out = run(Seq("Tuyệt vời 🚀, rất ĐẸP!")).head
    assert(out === "tuyệt vời rất đẹp ")
  }
}
