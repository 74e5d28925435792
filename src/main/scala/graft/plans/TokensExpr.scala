package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Tokenizer kernel for [[TokensOf]] — one static method so
  * interpreted eval and whole-stage codegen run the identical bytes
  * (the [[JaroWinkler]] pattern).
  *
  * Contract: EXACTLY `regexp_extract_all(lower(s), '[a-z0-9]+', 0)`
  * (the [[graft.functions.TextFunctions.tokens]] definition every
  * oracle dual replays):
  *
  *  - lowercasing is `UTF8String.toLowerCase()` — the same call
  *    Spark's `Lower` makes, so locale/Unicode edge cases ('İ' →
  *    "i̇", Kelvin 'K' → 'k') land identically;
  *  - a token is a MAXIMAL run of [a-z0-9] bytes in the lowercased
  *    string's UTF-8. Byte runs equal the regex's code-point runs:
  *    token chars are single ASCII bytes, and every non-token code
  *    point contributes only non-token bytes (multi-byte UTF-8 units
  *    are ≥ 0x80), so the boundaries coincide.
  *
  * Why it exists (optimization guide §4 "eliminate expensive
  * expressions in the hot path"): the regex formulation pays a
  * `java.util.regex` Matcher with per-match allocation on EVERY text
  * row of EVERY text operator — tokenize sits under shingling,
  * MinHash, tf-idf, BM25, stylometry, language-ID — and the r14
  * profile showed tokenize+shingle stages dominating the text
  * queries. A single byte scan does the same work allocation-free
  * except for the output strings themselves. */
object Tokens {
  private def isTok(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  def tokens(s: UTF8String): ArrayData = {
    // getBytes gives the raw UTF-8; all slicing below is BYTE-indexed
    // (UTF8String.substring is code-point-indexed — not what we want)
    val b = s.toLowerCase.getBytes
    val n = b.length
    // count runs first so the output array allocates exactly once
    var count = 0
    var i = 0
    var inRun = false
    while (i < n) {
      val t = isTok(b(i))
      if (t && !inRun) count += 1
      inRun = t
      i += 1
    }
    val out = new Array[Any](count)
    var k = 0
    i = 0
    var start = -1
    while (i < n) {
      if (isTok(b(i))) { if (start < 0) start = i }
      else if (start >= 0) {
        out(k) = UTF8String.fromBytes(b, start, i - start); k += 1; start = -1
      }
      i += 1
    }
    if (start >= 0) { out(k) = UTF8String.fromBytes(b, start, n - start) }
    new GenericArrayData(out)
  }
}

/** `graft_tokens(s)` — lowercased `[a-z0-9]+` word tokens as a native
  * codegen expression; NULL on NULL input. See [[Tokens.tokens]] for
  * the exact-equivalence contract with the regex formulation. */
case class TokensOf(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  // containsNull = true mirrors RegExpExtractAll.dataType exactly: a
  // stricter element nullability would ripple into derived array
  // types and drift the written parquet schemas the oracle pins
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_tokens"

  override protected def nullSafeEval(s: Any): Any =
    Tokens.tokens(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.Tokens.tokens($s)")

  override protected def withNewChildInternal(newChild: Expression): TokensOf =
    copy(child = newChild)
}
