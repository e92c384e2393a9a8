package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Normalize: the native NFC expression and the cleanup chain —
  * hand-computed byte-level expectations, exercised through DataFrames so
  * the codegen path (doGenCode) is what runs.
  */
class NormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def clean(s: String): String =
    Seq(s).toDF("t").select(Normalize.cleaned(col("t"))).as[String].head()

  private def nfcOf(s: String): String =
    Seq(s).toDF("t").select(Normalize.nfc(col("t"))).as[String].head()

  test("nfc composes decomposed accents and is identity on composed text") {
    assert(nfcOf("Café") == "Café")
    assert(nfcOf("Café") == "Café")
    assert(nfcOf("plain ascii") == "plain ascii")
    // the canonical-ordering case: cedilla + acute on one base letter must
    // reorder+compose the same way java.text.Normalizer specifies
    assert(nfcOf("ḉ") ==
      java.text.Normalizer.normalize("ḉ", java.text.Normalizer.Form.NFC))
  }

  test("nfc null in, null out") {
    val r = Seq[(Integer, String)]((1, null)).toDF("i", "t")
      .select(Normalize.nfc(col("t"))).collect()
    assert(r.head.isNullAt(0))
  }

  test("cleaned strips controls, keeps newlines, maps CRLF to LF") {
    assert(clean("ab") == "ab")
    assert(clean("line one\r\nline two") == "line one\nline two")
    assert(clean("tab\there") == "tab here")
  }

  test("cleaned maps unicode spaces and collapses runs") {
    assert(clean("a b c") == "a b c")
    assert(clean("a  \t  b") == "a b")
  }

  test("cleaned trims spaces hugging newlines but keeps blank lines") {
    assert(clean("para one \n para two") == "para one\npara two")
    assert(clean("para one\n\npara two") == "para one\n\npara two")
  }

  test("cleaned trims edges and handles empty/degenerate input") {
    assert(clean("  x  ") == "x")
    assert(clean("") == "")
    assert(clean(" \t ") == "")
  }

  test("cleaned is idempotent") {
    val messy = Seq("Café du monde  \t\r\ntail  ",
      "a\r\nb", "  x　y  ")
    messy.foreach { m => assert(clean(clean(m)) == clean(m)) }
  }

  test("the full planted-mess trace (the t_normalize oracle shape)") {
    assert(clean("Café du monde  \t\r\ntail  ") ==
      "Café du monde\ntail")
  }
}
