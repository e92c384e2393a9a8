package graft

import org.apache.spark.sql.{Column, GraftBridge, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, Text}
import graft.operators.Similarity

/** Session extension: exposes the engine's expressions to pure-SQL users
  * (`spark.sql.extensions=graft.GraftExtensions`, or
  * `.withExtensions(new GraftExtensions)` on the builder). The DataFrame
  * API reaches the same expressions directly (Similarity.dot, Text.tokens,
  * …), so the injections are SQL parity, not a separate code path — each
  * builder converts the SQL argument expressions to Columns, runs the ONE
  * shared Column-composition, and hands the composed expression tree back
  * (VERDICT r04 #8; recipes for the whole-operator surfaces live in
  * docs/SQL.md).
  *
  * Registered: graft_dot, graft_cosine, graft_norm, graft_tokens,
  * graft_shingles, graft_lang_id, graft_bpe_token_count,
  * graft_fingerprint, graft_minhash, graft_band_sigs,
  * graft_window_hashes, graft_delete_variants, graft_nfc,
  * graft_clean_text.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def inject(ext: SparkSessionExtensions, name: String, arity: Int,
                     build: Seq[Expression] => Expression): Unit =
    ext.injectFunction((
      new FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      (children: Seq[Expression]) => {
        if (children.size != arity)
          throw new IllegalArgumentException(
            s"$name expects exactly $arity argument(s), got ${children.size}")
        build(children)
      }))

  // resolvableExpression, not expression: the analyzer must be able to see
  // (and keep resolving) the composed tree — see GraftBridge's scaladoc
  private def col1(f: Column => Column): Seq[Expression] => Expression =
    es => GraftBridge.resolvableExpression(f(GraftBridge.column(es.head)))

  private def col2(f: (Column, Column) => Column): Seq[Expression] => Expression =
    es => GraftBridge.resolvableExpression(
      f(GraftBridge.column(es(0)), GraftBridge.column(es(1))))

  /** A literal-int argument (e.g. a shingle width): SQL-side it arrives as
    * an Expression, but the Column API takes a plain Int — require a
    * foldable integer and evaluate it at resolution time.
    */
  private def litInt(name: String, e: Expression): Int =
    if (e.foldable) e.eval() match {
      case i: Int => i
      case other => throw new IllegalArgumentException(
        s"$name: expected an INT literal, got $other")
    } else throw new IllegalArgumentException(
      s"$name: the width argument must be a literal")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // native codegen'd expressions — injected directly
    inject(ext, "graft_dot", 2, {
      case Seq(l, r) => DotProduct(l, r)
    })
    inject(ext, "graft_nfc", 1, {
      case Seq(c) => graft.functions.NfcNormalize(c)
    })
    // the full corpus-ingest cleanup chain (functions/Normalize.scala)
    inject(ext, "graft_clean_text", 1, col1(graft.functions.Normalize.cleaned))
    // Column-composed surfaces, shared verbatim with the DataFrame API
    inject(ext, "graft_cosine", 2, col2(Similarity.cosine))
    inject(ext, "graft_norm", 1, col1(Similarity.norm))
    inject(ext, "graft_tokens", 1, col1(Text.tokens))
    inject(ext, "graft_shingles", 2, es => GraftBridge.resolvableExpression(
      Text.shingles(GraftBridge.column(es(0)), litInt("graft_shingles", es(1)))))
    inject(ext, "graft_lang_id", 1, col1(Text.langId(_)))
    inject(ext, "graft_bpe_token_count", 1, col1(Text.bpeTokenCount))
    inject(ext, "graft_fingerprint", 1, col1(Text.fingerprint))
    // the streaming near-dup primitives (per-row MinHash / LSH banding,
    // Dedup.minhashExpr scaladoc): graft_minhash(toks, k, n) over an
    // ALREADY-projected token array, graft_band_sigs(mh, k, bands) →
    // array<struct<band,sig>> ready to explode
    inject(ext, "graft_minhash", 3, es => GraftBridge.resolvableExpression(
      operators.Dedup.minhashExpr(GraftBridge.column(es(0)),
        litInt("graft_minhash", es(1)), litInt("graft_minhash", es(2)))))
    inject(ext, "graft_band_sigs", 3, es => GraftBridge.resolvableExpression(
      operators.Dedup.bandStructsExpr(GraftBridge.column(es(0)),
        litInt("graft_band_sigs", es(1)), litInt("graft_band_sigs", es(2)))))
    // the exact-substring-dedup primitive (Passages.windowHashesExpr):
    // graft_window_hashes(toks, w) → one xxhash64 per w-token sliding
    // window, ready to posexplode into the duplicated-passage join
    inject(ext, "graft_window_hashes", 2, es => GraftBridge.resolvableExpression(
      operators.Passages.windowHashesExpr(GraftBridge.column(es(0)),
        litInt("graft_window_hashes", es(1)))))
    // the fuzzy-join blocking primitive (Dedup.deleteVariantsExpr):
    // graft_delete_variants(key, maxKeyLen) → the SymSpell depth-1
    // delete neighborhood, ready to explode into a candidate join
    inject(ext, "graft_delete_variants", 2, es => GraftBridge.resolvableExpression(
      operators.Dedup.deleteVariantsExpr(GraftBridge.column(es(0)),
        litInt("graft_delete_variants", es(1)))))
  }
}
