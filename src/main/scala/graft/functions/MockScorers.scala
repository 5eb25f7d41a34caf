package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic mock scorers standing in for the reference's model UDFs.
  *
  * The reference itself ships a mock-training precedent
  * (`projects/absa_streaming/scripts/train_retrain.py:26-54`), and its real
  * models (PyTorch ABSA classifier, YOLO detector) can't run in a JVM —
  * so, per SURVEY.md §7.4, the scorer is a frozen deterministic function of
  * the normalized text. Everything here is a pure `Column` expression:
  * codegen-friendly, no UDF boundary, and exactly mirrorable in the DuckDB
  * oracle SQL (integer arithmetic only — no float hashing).
  */
object MockScorers {

  /** The 8 ABSA aspects, in the reference's order
    * (`models/saved_absa_model/absa_config.json` aspect_cols).
    */
  val aspects: Seq[String] = Seq("Price", "Shipping", "Outlook", "Quality",
    "Size", "Shop_Service", "General", "Others")

  /** 4-class decode used by the dashboard histogram: class 0 = aspect
    * absent, then NEG/NEU/POS (reference LABEL_MAP {-1:0, 0:1, 1:2, 2:3},
    * `train_retrain.py:149-153`; sentiment names
    * `consumer_postgres_streaming.py:96-112`).
    */
  val sentiments: Seq[String] = Seq("ABSENT", "NEG", "NEU", "POS")

  /** Text normalization for the oracle-checked corpus queries: lowercase,
    * strip non-alphanumerics to spaces, collapse whitespace, trim.
    * Explicit ASCII character classes so Java and DuckDB regex agree
    * byte-for-byte (SURVEY §7.4 charset risk).
    */
  def normalize(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", " "), " +", " "))

  /** Faithful reference normalization (`spark_kafka_consumer_dag.py:
    * 104-108`): lower + strip FIRST, then replace any char outside
    * `[\w\s` + Vietnamese letters`]` with a space, then collapse runs of
    * whitespace — reproducing two reference quirks exactly: Python's
    * unicode `\w` (Java needs the `(?U)` flag, SURVEY §7.4) and the
    * missing final trim (punctuation at the edges leaves one leading/
    * trailing space). Used by the ABSA pipeline; the oracle corpus is
    * ASCII-only where this coincides with [[normalize]] up to `_`.
    */
  def normalizeVi(text: Column): Column =
    regexp_replace(
      regexp_replace(trim(lower(text)),
        "(?U)[^\\w\\sáàảãạăắằẳẵặâấầẩẫậéèẻẽẹêếềểễệíìỉĩịóòỏõọôốồổỗộơớờởỡợúùủũụưứừửữựýỳỷỹỵđ]",
        " "),
      "\\s+", " ")

  /** Per-aspect 4-class prediction ∈ {0,1,2,3} (semantics of the
    * reference's per-aspect argmax, `spark_kafka_consumer_dag.py:127-134`):
    * a frozen integer hash of (normalized length, token count, codepoint
    * sum, aspect). The codepoint sum multiplies the aspect index so
    * aspects vary independently per document, not as rotations of one
    * scalar.
    */
  def aspectPred(norm: Column, aspectIdx: Int): Column = {
    val len = length(norm)
    val words = size(split(norm, " "))
    // native expression: the aggregate/transform fold is CodegenFallback
    // and would knock the scorer projection out of whole-stage codegen
    val charsum = graft.functions.expressions.CharSum(norm)
    pmod(len * 31 + words * 7 + charsum * (2 * aspectIdx + 1)
      + lit(aspectIdx * 13), lit(4))
  }

  /** Same prediction as DuckDB SQL over a normalized-text expression. */
  def aspectPredSql(normExpr: String, aspectIdx: Int): String =
    s"""CAST((length($normExpr) * 31 + len(string_split($normExpr, ' ')) * 7
       + CAST(list_sum(list_transform(string_split($normExpr, ''), c -> ascii(c))) AS INTEGER) * ${2 * aspectIdx + 1}
       + ${aspectIdx * 13}) % 4 AS INTEGER)""".linesIterator
      .map(_.trim).mkString(" ")

  /** Normalization as DuckDB SQL over a raw text expression. */
  def normalizeSql(textExpr: String): String =
    s"trim(regexp_replace(regexp_replace(lower($textExpr), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  /** Sentiment label decode (S21): class int → name. */
  def decodeSentiment(pred: Column): Column =
    element_at(
      array(sentiments.map(lit): _*), pred + 1)

  def decodeSentimentSql(predExpr: String): String =
    s"['ABSENT','NEG','NEU','POS'][($predExpr) + 1]"

  /** Mock vehicle detector (S23 semantics: per-frame count + class label),
    * as frozen integer arithmetic over the frame/event id. Classes are the
    * reference's kept set (`vehicle_consumer.py:94`).
    */
  val vehicleClasses: Seq[String] = Seq("car", "bus", "truck", "motorbike")

  def vehicleType(id: Column): Column =
    element_at(array(vehicleClasses.map(lit): _*),
      pmod(id, lit(4)).cast("int") + 1)

  def vehicleTypeSql(idExpr: String): String =
    s"['car','bus','truck','motorbike'][CAST(($idExpr) % 4 AS INTEGER) + 1]"

  def vehicleCount(id: Column): Column =
    pmod(id * 2654435761L + 101, lit(5)).cast("int") + 1

  def vehicleCountSql(idExpr: String): String =
    s"CAST((($idExpr) * 2654435761 + 101) % 5 AS INTEGER) + 1"
}
