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
