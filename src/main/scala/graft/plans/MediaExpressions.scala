package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd PCM feature fold for the audio pipeline (optimization
  * round 17, same guide-§4 class as the round-16 text kernels): ONE
  * pass over a decoded `array<int>` sample column computing the three
  * features mm_audio previously derived from three interpreted
  * higher-order folds —
  *
  *   max_abs    = array_max(transform(d, abs)).cast(long)
  *   sum_abs    = aggregate(d, 0L, (acc, x) -> acc + abs(x))
  *   zero_cross = aggregate(sequence(1, n-1), 0L, (acc, i) ->
  *                  acc + when(d[i] * d[i+1] < 0, 1L).otherwise(0L))
  *
  * HOF lambdas never enter whole-stage codegen and re-evaluate an
  * interpreted expression tree per element; the zero-cross fold
  * additionally paid two element_at calls per position. Measured at
  * sf0.1/32 cores: the folds were ~3-4 process-CPU-s on top of the
  * ~5-6 CPU-s decode.
  *
  * Value contract, replicated bit-for-bit on the declared domain
  * (PCM16 samples, arrays of >= n elements):
  *  - null elements: skipped by max (array_max semantics), NULL the
  *    sum (the fold's null-accumulator), contribute 0 crossings (the
  *    when() is false on a null product);
  *  - a NULL input array yields (null, null, 0) — NOT a null struct:
  *    the zero-cross fold runs over the non-null `sequence`, so its
  *    accumulator stays 0 while the other two legs null out;
  *  - empty array: (null, 0, error-if-n>1) — matching array_max's
  *    null, the fold's zero, and ANSI element_at past the end;
  *  - an array shorter than `n` errors, mirroring ANSI element_at
  *    out-of-bounds (the fixtures carry exactly-n-sample PCM).
  * Documented deviations OUTSIDE the domain: abs/product compute in
  * long, so Int.MinValue and |x| > 2^15 products don't raise the
  * ANSI overflow error the int-typed built-ins would.
  */
case class AudioFeats(child: Expression, n: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(n >= 1, s"graft_audio_feats: n must be >= 1, got $n")

  override def dataType: DataType = StructType(Seq(
    StructField("max_abs", LongType, nullable = true),
    StructField("sum_abs", LongType, nullable = true),
    StructField("zero_cross", LongType, nullable = false)))
  // the struct itself is never null (a null input yields (null, null, 0))
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_audio_feats requires array<int>, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    AudioFeats.feats(
      if (v == null) null else v.asInstanceOf[ArrayData], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val row = classOf[InternalRow].getName
    ev.copy(code = code"""
      ${c.code}
      $row ${ev.value} = graft.plans.AudioFeats.feats(
        ${c.isNull} ? null : ${c.value}, $n);
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): AudioFeats =
    copy(child = newChild)
}

object AudioFeats {

  /** Shared hot loop of both eval paths (NOT named `eval` — the
    * suppressed-static-forwarder trap, see FloatLshBuckets). */
  def feats(d: ArrayData, n: Int): InternalRow = {
    if (d == null) return InternalRow(null, null, 0L)
    val sz = d.numElements()
    var maxAbs = 0L
    var seenMax = false
    var sumAbs = 0L
    var sumIsNull = false
    var i = 0
    while (i < sz) {
      if (d.isNullAt(i)) sumIsNull = true
      else {
        val a = math.abs(d.getInt(i).toLong)
        if (!seenMax || a > maxAbs) { maxAbs = a; seenMax = true }
        if (!sumIsNull) sumAbs += a
      }
      i += 1
    }
    var zc = 0L
    var j = 1
    while (j <= n - 1) {
      if (j + 1 > sz)
        throw new IllegalArgumentException(
          s"graft_audio_feats: array has $sz elements, fold needs >= $n" +
            " (mirrors element_at past the end)")
      if (!d.isNullAt(j - 1) && !d.isNullAt(j) &&
          d.getInt(j - 1).toLong * d.getInt(j) < 0) zc += 1
      j += 1
    }
    InternalRow(if (seenMax) maxAbs else null,
      if (sumIsNull) null else sumAbs, zc)
  }
}
