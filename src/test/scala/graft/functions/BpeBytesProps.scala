package graft.functions

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.SparkSpec

/** The byte-level BPE zero-OOV contract on ARBITRARY Unicode: any word —
  * including characters never seen at training time — encodes into
  * pieces whose hex concatenation decodes back to the original word,
  * losslessly, under any learned merge table.
  */
object BpeBytesProps extends Properties("BpeBytes") {

  private lazy val spark = SparkSpec.session

  // words drawn well OUTSIDE the training corpus: Latin, accented,
  // Greek, CJK, emoji (surrogate pairs), mixed — no whitespace (words
  // are the unit) and lowercase-stable (the pipeline lowercases first,
  // so round-trip equality is stated against the lowercased word)
  private val wordGen: Gen[String] = Gen.nonEmptyListOf(Gen.oneOf(
    Gen.alphaLowerChar.map(_.toString), Gen.numChar.map(_.toString),
    Gen.oneOf("é", "ü", "ß", "λ", "Ω".toLowerCase, "中", "文", "🙂", "→", "¿")
  )).map(_.mkString).suchThat(_.nonEmpty)

  private val corpusGen: Gen[Seq[String]] =
    Gen.nonEmptyListOf(wordGen).map(_.take(8))

  // a small fixed training text — the merges themselves don't matter for
  // the round-trip law, only that SOME merges apply
  private lazy val merges: Seq[(String, String)] = {
    import spark.implicits._
    Text.bpeTrainMergesBytes(
      Seq("the quick brown fox über alles the the über",
        "pack my box with five dozen jugs über").toDF("text"),
      "text", nMerges = 4)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
  }

  property("encode → hex-concat → decode is the identity on any Unicode word") =
    forAll(corpusGen) { words =>
      import spark.implicits._
      val docs = Seq(words.mkString(" ")).toDF("text")
      val out = Text.bpeEncodeBytes(docs, "text", merges)
        .select(col("word"), col("pieces")).collect()
      out.nonEmpty && out.forall { r =>
        val decoded = new String(
          r.getString(1).split(" ").mkString("")
            .grouped(2).map(Integer.parseInt(_, 16).toByte).toArray, "UTF-8")
        decoded == r.getString(0)
      }
    }

  property("every piece is decodable hex and no word is ever OOV") =
    forAll(corpusGen) { words =>
      import spark.implicits._
      val docs = Seq(words.mkString(" ")).toDF("text")
      val out = Text.bpeEncodeBytes(docs, "text", merges).collect()
      out.forall { r =>
        val pieces = r.getAs[String]("pieces").split(" ")
        pieces.nonEmpty && pieces.forall(p =>
          p.nonEmpty && p.length % 2 == 0 && p.matches("[0-9A-F]+"))
      }
    }
}
