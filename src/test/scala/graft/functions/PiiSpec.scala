package graft.functions

import org.apache.spark.sql.functions.col
import graft.SparkSpec

/** PII detection/redaction: per-category counts, redaction tags, category
  * disjointness, cascade safety, and clean text passing through intact.
  */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def annotate(texts: String*) = {
    val df = texts.toSeq.toDF("t")
    df.select(Pii.annotations(col("t")).map { case (n, c) => c.as(n) }: _*)
      .collect()
  }

  test("counts and redacts every category") {
    val r = annotate(
      "mail a@b.org and c.d+x@e-f.co.uk call 555-123-4567 id 123-45-6789 at 192.168.0.1")(0)
    assert(r.getAs[Long]("n_email") == 2L)
    assert(r.getAs[Long]("n_phone") == 1L)
    assert(r.getAs[Long]("n_ssn") == 1L)
    assert(r.getAs[Long]("n_ip") == 1L)
    assert(r.getAs[String]("redacted") ==
      "mail <EMAIL> and <EMAIL> call <PHONE> id <SSN> at <IP>")
  }

  test("SSN and phone digit groupings do not cross-match") {
    val r = annotate("call 555-123-4567", "id 123-45-6789")
    assert(r(0).getAs[Long]("n_phone") == 1L && r(0).getAs[Long]("n_ssn") == 0L)
    assert(r(1).getAs[Long]("n_ssn") == 1L && r(1).getAs[Long]("n_phone") == 0L)
  }

  test("clean text passes through unchanged with zero counts") {
    val r = annotate("no sensitive content here at all")(0)
    assert(Seq("n_email", "n_ip", "n_ssn", "n_phone")
      .forall(r.getAs[Long](_) == 0L))
    assert(r.getAs[String]("redacted") == "no sensitive content here at all")
  }

  test("redaction does not cascade: existing tags and digits survive") {
    // a literal tag in the input stays; an IP inside a longer dotted run
    // is still matched per \b semantics, but plain integers are untouched
    val r = annotate("<EMAIL> stays and 12345 stays but 1.2.3.4 goes")(0)
    assert(r.getAs[String]("redacted") == "<EMAIL> stays and 12345 stays but <IP> goes")
  }

  test("unknown category is rejected clearly") {
    val e = intercept[IllegalArgumentException] {
      Pii.count(col("t"), "iban")
    }
    assert(e.getMessage.contains("iban"))
  }
}
