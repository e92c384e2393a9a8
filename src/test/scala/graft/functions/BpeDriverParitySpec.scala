package graft.functions

import graft.SparkSpec

/** The r18 driver fast path of Text.bpeLoop must be BIT-IDENTICAL to the
  * distributed one-job-per-merge loop — t_bpe_train/t_bpe_train256's
  * oracles replay every merge DECISION, so a single drifted tie-break or
  * fold difference hash-mismatches. These fixtures are built to stress
  * exactly the divergence candidates: count ties (the (count DESC, l, r)
  * UTF-8 ordering), overlapping runs ("aaa" leftmost-greedy), merged
  * symbols re-entering later decisions, multi-byte characters (UTF-8 vs
  * UTF-16 ordering), and the dry-out stop (single-symbol vocabulary).
  */
class BpeDriverParitySpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def docs(texts: String*): DataFrame = {
    import spark.implicits._
    texts.toDF("text")
  }

  private def both(df: DataFrame, n: Int, bytes: Boolean = false)
      : (Seq[(Int, String, String, Long)], Seq[(Int, String, String, Long)],
         Seq[(String, Long, String)], Seq[(String, Long, String)]) = {
    def run(cap: Int) = {
      val (ms, words) = Text.bpeLoop(df, "text", n,
        symInit = if (bytes) Text.byteSymsForTest else Text.charSymsForTest,
        driverCap = cap)
      val segs = words.selectExpr("w", "wn", "array_join(syms, ' ')")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
        .toSeq.sortBy(_._1)
      (ms, segs)
    }
    val (dm, ds) = run(Text.BpeDriverVocabCap) // driver path (vocab fits)
    val (xm, xs) = run(0)                      // distributed path (cap off)
    (dm, xm, ds, xs)
  }

  test("tie-heavy corpus: identical merge decisions and segmentation") {
    // every pair count engineered to collide so the (l, r) tie-break
    // decides most merges
    val df = docs("ab ba ab ba cd dc cd dc", "ac ca ad da", "abab cdcd")
    val (dm, xm, ds, xs) = both(df, 12)
    assert(dm == xm, s"merge decisions drifted:\n driver=$dm\n dist=$xm")
    assert(ds == xs)
  }

  test("overlapping runs merge leftmost-greedy identically") {
    val df = docs("aaa aaaa aaaaa", "aaa aaa")
    val (dm, xm, ds, xs) = both(df, 6)
    assert(dm == xm)
    assert(ds == xs)
  }

  test("multi-byte characters order by UTF-8 bytes in both paths") {
    val df = docs("é ü é ü 品 品 ß ß", "éé üü 品品")
    val (dm, xm, ds, xs) = both(df, 8)
    assert(dm == xm)
    assert(ds == xs)
  }

  test("byte-grain symbols agree and dry-out stops both loops alike") {
    val df = docs("é ü ab", "é ab")
    val (dm, xm, ds, xs) = both(df, 20, bytes = true)
    assert(dm == xm)
    assert(ds == xs)
    // deep request on a tiny corpus dries out: both paths return the same
    // (shorter) merge list
    assert(dm.size < 20)
  }

  test("single-symbol vocabulary yields no merges on either path") {
    val df = docs("a b c a b")
    val (dm, xm, ds, xs) = both(df, 3)
    assert(dm.isEmpty && xm.isEmpty)
    assert(ds == xs)
  }
}
