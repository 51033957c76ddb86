package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Char-distribution profile of a string in ONE pass: distinct
  * code-point count and Shannon entropy in e4 fixed-point nats —
  * replaces the two ScalaUDFs (`charEntropyUdf`, `charDistinctUdf`)
  * that each ran their own hash-counting pass per row and blocked
  * whole-stage codegen on the text_entropy corpus scan. Catalyst's
  * subexpression elimination computes one CharProfile per row when
  * both fields are projected.
  *
  * Arithmetic contract BIT-IDENTICAL to the UDFs (and therefore the
  * SQL replay): per-code-point counts, c·ln c folded left-to-right
  * over code-point-ASCENDING distinct chars (= UTF-8 byte order =
  * `array_sort` over 1-char strings), entropy =
  * floor((ln(n)·n − Σ c·ln c) · 10000 / n) so the
  * single-distinct-char case is exactly zero. Empty text profiles as
  * (0, 0); a null input nulls the struct (the Column wrappers
  * coalesce back to the UDFs' 0-on-null contract).
  */
case class CharProfile(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_uniq", LongType, nullable = false),
    StructField("entropy_e4", LongType, nullable = false)))
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_char_profile requires a string argument, got ${other.simpleString}")
  }

  override protected def nullSafeEval(a: Any): Any =
    CharProfile.profile(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.CharProfile.profile($a);")

  override protected def withNewChildInternal(newChild: Expression): CharProfile =
    copy(child = newChild)
}

/** Codegen'd hashed-bucket weight fold: Σ_w weights[h48(w) mod B]
  * over an `array<string>` column, where h48 is the audited
  * engine-portable 48-bit md5 key (first 12 hex digits of md5(w) as
  * BIGINT — `Packing.hash48`). Replaces the interpreted
  * `aggregate(words, 0L, (acc, w) -> acc + element_at(weightsLit,
  * bucket(w) + 1))` higher-order fold that every hashed-feature
  * linear scorer rode (perceptron/NB quality gates, DSIR votes):
  * HOF lambdas never enter whole-stage codegen and re-evaluate an
  * interpreted md5 expression tree per element — the fold dominated
  * every scoring scan AND the perceptron's per-epoch training scans
  * (optimization round 16, guide §4 "eliminate non-codegen
  * expressions in the hot path").
  *
  * Value contract BIT-IDENTICAL to the HOF fold and the SQL replay:
  * md5 over the word's UTF-8 bytes, first 6 digest bytes big-endian
  * as a nonnegative long (= `conv(substring(md5(w),1,12),16,10)`),
  * `% B` on a nonnegative operand, long addition of the bucket's
  * weight. Empty array → 0 (the fold's zero); null array → null; a
  * null ELEMENT nulls the whole sum (the fold's null-accumulator
  * semantics), never a silent skip.
  */
case class BucketWeightSum(child: Expression, weights: IndexedSeq[Long])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType
  // nullable even for non-null arrays: a null element nulls the sum
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bucket_sum requires array<string>, got ${other.simpleString}")
  }

  @transient private lazy val weightArr: Array[Long] = weights.toArray

  override protected def nullSafeEval(a: Any): Any =
    BucketWeightSum.sum(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], weightArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("bucketWeights", weightArr, "long[]")
    val r = ctx.freshName("graftBwsR")
    nullSafeCodeGen(ctx, ev, a => s"""
       |java.lang.Long $r = graft.plans.BucketWeightSum.sum($a, $w);
       |if ($r == null) { ${ev.isNull} = true; }
       |else { ${ev.value} = $r.longValue(); }
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): BucketWeightSum =
    copy(child = newChild)
}

object BucketWeightSum {

  private val digestLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** 48-bit md5 bucket key of one UTF8String — first 6 digest bytes
    * big-endian, exactly `conv(substring(md5(w),1,12),16,10)`. */
  def hash48(u: UTF8String): Long = {
    val md = digestLocal.get()
    md.reset()
    val d = md.digest(u.getBytes)
    ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
      ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
      ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
  }

  /** Shared hot loop of both eval paths; boxed Long so a null
    * element can null the whole fold (the HOF contract). */
  def sum(arr: org.apache.spark.sql.catalyst.util.ArrayData,
          weights: Array[Long]): java.lang.Long = {
    val n = arr.numElements()
    val b = weights.length
    var s = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      s += weights((hash48(arr.getUTF8String(i)) % b).toInt)
      i += 1
    }
    java.lang.Long.valueOf(s)
  }
}

object CharProfile {

  /** Shared hot loop of both eval paths (NOT named `eval` — see
    * FloatLshBuckets.evalBuckets on the static-forwarder trap). */
  def profile(u: UTF8String): InternalRow = {
    val t = u.toString
    if (t.isEmpty) return InternalRow(0L, 0L)
    val m = scala.collection.mutable.HashMap.empty[Int, Long]
    var i = 0
    while (i < t.length) {
      val cp = t.codePointAt(i)
      m.update(cp, m.getOrElse(cp, 0L) + 1L)
      i += Character.charCount(cp)
    }
    val counts = m.toArray.sortBy(_._1)
    var n = 0L
    var k = 0
    while (k < counts.length) { n += counts(k)._2; k += 1 }
    var s = 0.0
    k = 0
    while (k < counts.length) {
      val c = counts(k)._2.toDouble
      s += c * math.log(c)
      k += 1
    }
    val nd = n.toDouble
    InternalRow(counts.length.toLong,
      math.floor((math.log(nd) * nd - s) * 10000.0 / nd).toLong)
  }
}
