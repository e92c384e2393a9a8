package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training corpora: emails, North-
  * American-style phone numbers, SSN-shaped ids, and IPv4 addresses.
  * Pure `regexp_extract_all` / `regexp_replace` expressions — codegen'd,
  * no UDFs — with patterns restricted to the regex subset Java and RE2
  * interpret identically (no lookarounds, ASCII `\d`, plain `\b`), so an
  * external engine can audit the redaction bit-for-bit.
  *
  * The four categories are mutually disjoint by construction (an SSN's
  * 3-2-4 digit grouping cannot match the phone's 3-3-4 and vice versa;
  * the replacement tags contain no digits or `@`, so redaction passes
  * cannot cascade into new matches). Counts are taken on the ORIGINAL
  * text; redaction applies the replacements in a fixed order.
  */
object Pii {

  val patterns: Seq[(String, String, String)] = Seq(
    // (category, pattern, replacement tag)
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("phone", "\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>"))

  /** Match count of one category in the raw text. */
  def count(text: Column, category: String): Column = {
    val p = patterns.find(_._1 == category)
      .getOrElse(throw new IllegalArgumentException(
        s"unknown PII category '$category'; known: ${patterns.map(_._1)}"))
    size(regexp_extract_all(text, lit(p._2), lit(0))).cast("long")
  }

  /** The text with every category replaced by its tag, applied in
    * [[patterns]] order.
    */
  def redact(text: Column): Column =
    patterns.foldLeft(text) { case (t, (_, pat, tag)) =>
      regexp_replace(t, pat, tag)
    }

  /** Per-category counts plus the redacted text, as (name, column) pairs
    * ready to splice into a projection.
    */
  def annotations(text: Column): Seq[(String, Column)] =
    patterns.map { case (cat, _, _) => s"n_$cat" -> count(text, cat) } :+
      ("redacted" -> redact(text))
}
