package graft.plans

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined window fingerprints as one codegen'd pass
  * (winnowing / MOSS family): Rabin-Karp rolling hash of every
  * `w`-code-point window of the input, emitting ONLY the hashes with
  * `h % keepMod == 0` — a position-shift-invariant ~1/keepMod sample.
  *
  * Why an Expression and not `transform(sequence(...))` + md5: the HOF
  * chain materializes every window substring and pays a full crypto
  * digest per window — O(len · w) bytes and O(len) digests per
  * document (measured as 33% of the round-1 bench). The rolling form
  * is O(len) integer ops total, selection happens before anything is
  * exploded or shuffled, and the loop lives inside whole-stage
  * codegen.
  *
  * Determinism contract (oracle parity): hash of window j is the
  * Horner fold `h = (h * B + cp_i) mod M` over the window's Unicode
  * code points, `B = 131`, `M = 1e9+7`. The rolling update is exactly
  * equivalent, and the fold is reproducible in ANSI SQL / DuckDB via
  * `list_transform(generate_series(...), pos -> ((unicode(t[pos])*131
  * + unicode(t[pos+1])) % 1000000007) * 131 + ...)`. Code points (not
  * UTF-16 units, not bytes) are the iteration unit on both engines.
  *
  * All intermediates fit signed int64: h < M ≈ 2^30, cp ≤ 0x10FFFF,
  * so `(h + M) * B + cp < 2^39` and `cp * B^(w-1) mod M < 2^51`.
  */
case class RollingFingerprints(child: Expression, w: Int, keepMod: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(w >= 2, s"window must be >= 2, got $w")
  require(keepMod >= 1, s"keepMod must be >= 1, got $keepMod")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_rolling_fps"

  override protected def nullSafeEval(input: Any): Any =
    RollingFingerprints.compute(input.asInstanceOf[UTF8String], w, keepMod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.plans.RollingFingerprints.compute($in, $w, $keepMod);")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprints =
    copy(child = newChild)
}

object RollingFingerprints {
  /** Horner base / modulus — fixed, shared with every oracle dual. */
  final val B = 131L
  final val M = 1000000007L

  /** Shared by interpreted eval and codegen (the loop is identical
    * either way; codegen just avoids per-row virtual dispatch). */
  def compute(s: UTF8String, w: Int, keepMod: Int): ArrayData = {
    val cps = s.toString.codePoints().toArray()
    val n = cps.length
    val m = n - w + 1
    if (m <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    // B^(w-1) mod M for the roll-out term
    var bw = 1L
    var p = 1
    while (p < w) { bw = bw * B % M; p += 1 }
    val out = new Array[Long](m)
    var k = 0
    var h = 0L
    var i = 0
    while (i < w) { h = (h * B + cps(i)) % M; i += 1 }
    if (h % keepMod == 0) { out(k) = h; k += 1 }
    var j = 1
    while (j < m) {
      h = ((h + M - cps(j - 1) * bw % M) % M * B + cps(j + w - 1)) % M
      if (h % keepMod == 0) { out(k) = h; k += 1 }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, k))
  }
}
