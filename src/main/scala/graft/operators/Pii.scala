package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.regexp_replace

/** The PII definitions shared by the batch scrub query (q70) and the
  * streaming curation ingest — one source for the regexes and the
  * redaction order, in both Column and oracle-SQL use, so the two
  * paths cannot drift (the TextFeatures discipline). Engine-portable
  * ASCII classes (no \d/\w) so Java and RE2-style engines agree;
  * redaction order URL → email → phone so an address inside a URL is
  * not double-redacted.
  */
private[graft] object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[A-Za-z0-9./_-]+"
  val PhoneRe = "\\+[0-9]{7,}"

  /** Redact all three classes in the canonical order. Codegen'd. */
  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, UrlRe, "<URL>"),
        EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")
}
