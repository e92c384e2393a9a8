package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression.
  *
  * Spark ships no Unicode-normalization function, and a Scala UDF would
  * break whole-stage codegen for every downstream expression in the
  * cleanup chain — so this is the preference ladder's tier (b): a native
  * `UnaryExpression` whose `doGenCode` emits a primitive
  * `java.text.Normalizer` call that fuses into the surrounding codegen
  * stage. The already-normalized fast path (`Normalizer.isNormalized`,
  * a scan without allocation) returns the input `UTF8String` untouched —
  * on real corpora the overwhelming majority of documents are already
  * NFC, so the common case is one validation scan, zero copies.
  *
  * Null in → null out (UnaryExpression's default null handling).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  // explicit check instead of ExpectsInputTypes (private[sql] in Spark 4),
  // same convention as DotProduct
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("str")
      s"""
         |java.lang.String $s = $c.toString();
         |if (java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Text normalization for corpus ingest — the cleanup every pretraining
  * pipeline runs before dedup/tokenization so that byte-level variants of
  * the same text (decomposed accents, NBSP vs space, CRLF vs LF, stray
  * control characters) hash and shingle identically. One composed
  * expression chain per document: the native NFC expression above followed
  * by codegen'd `regexp_replace` passes — no UDF, no shuffle, pure map,
  * which is exactly the shape that scales to 100 TB (normalization is
  * embarrassingly parallel and fuses into the scan's codegen stage).
  *
  * Every regex below is written in the Java-regex/RE2 common dialect
  * (`\\x`/`\\x{…}` escapes, explicit character classes, no `\\s`) so the
  * DuckDB oracle replays the identical automaton — Java's `\\s` and RE2's
  * `\\s` disagree on `\\x0B`, which is why the classes are spelled out.
  */
object Normalize {

  /** Unicode NFC via the native expression. */
  def nfc(c: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(c)))

  /** C0 control characters except `\t` (09) and `\n` (0A), plus DEL —
    * includes `\r` (0D), so CRLF line endings become LF.
    */
  val controlClass = "[\\x00-\\x08\\x0B-\\x1F\\x7F]"

  /** Unicode space separators that should read as a plain space: NBSP,
    * Ogham space mark, the en/em/figure/… quad range, narrow NBSP,
    * medium mathematical space, ideographic space.
    */
  val unicodeSpaceClass =
    "[\\x{00A0}\\x{1680}\\x{2000}-\\x{200A}\\x{202F}\\x{205F}\\x{3000}]"

  /** The full cleanup chain:
    *  1. NFC-normalize (é as e+combining-acute → é as one codepoint);
    *  2. strip control characters ([[controlClass]] — CRLF → LF);
    *  3. map Unicode space separators to ASCII space;
    *  4. collapse space/tab runs to one space;
    *  5. strip the (single, post-collapse) space hugging each newline —
    *     blank lines (`\n\n` paragraph breaks) survive;
    *  6. trim outer spaces.
    */
  def cleaned(text: Column): Column =
    trim(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(nfc(text), controlClass, ""),
            unicodeSpaceClass, " "),
          "[ \\t]+", " "),
        " ?\\n ?", "\n"))
}
