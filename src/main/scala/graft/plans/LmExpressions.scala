package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** A trained stupid-backoff n-gram model embedded in an expression
  * tree behind a CONTENT DIGEST (the round-12 advice on
  * NearestCentroidLong's structural matrix, applied from the start
  * here): case-class equality on a Catalyst expression walks every
  * constructor param on every plan transform and sameResult check,
  * and a vocabulary-scale count table held structurally would make
  * each of those O(model). This wrapper compares a 128-bit MD5 over
  * the canonical content (order, total, per-table sorted key:count
  * entries) — computed once, lazily — so two INDEPENDENTLY TRAINED
  * equal models still compare equal (the PersistSlots plan-reuse
  * contract ccnetBuckets depends on) while plan comparison stays
  * O(1). The replaced per-model ScalaUDF cache achieved identity
  * reuse only for the SAME model instance; digest equality is
  * strictly stronger.
  *
  * `tables` is the scoring-ready mirror (java HashMaps, null-on-miss
  * instead of Option allocation), rebuilt per JVM after serialization.
  */
final class LmModelRef(val order: Int, val total: Long,
                       tableSeq: IndexedSeq[Map[String, Long]])
    extends Serializable {
  require(order >= 2 && tableSeq.length == order,
    s"LmModelRef: need tables for orders 1..$order, got ${tableSeq.length}")

  def totalD: Double = total.toDouble

  // Scoring-ready mirror built ONCE on the driver and shipped via a
  // broadcast handle (optimization round 17, see [[BcRef]]): the
  // previous shape serialized the vocabulary-scale Scala maps with
  // the expression — every TASK re-deserialized the whole model from
  // the task binary and then rebuilt this HashMap mirror
  // (transient-lazy per deserialized instance) — the fat-literal
  // per-task tax behind q_perplexity5_bcast's CPU inflation under
  // fan-out. Now the task binary carries an O(1) stub; executors
  // deserialize the prebuilt mirror at most once per JVM.
  private val bcTables: BcRef[Array[java.util.HashMap[String, java.lang.Long]]] =
    BcRef(tableSeq.map { m =>
      val h = new java.util.HashMap[String, java.lang.Long](
        math.max(8, (m.size / 0.75).toInt + 1))
      m.foreach { case (k, v) => h.put(k, java.lang.Long.valueOf(v)) }
      h
    }.toArray)

  def tables: Array[java.util.HashMap[String, java.lang.Long]] = bcTables.value

  // digest EAGER (round 17): computed on the driver at construction —
  // tableSeq is deliberately NOT a field anymore, so a lazy digest
  // could not be computed after shipping
  private val digest: (Long, Long) = ContentDigest.md5 { f =>
    f.int(order); f.long(total)
    tableSeq.foreach { m =>
      f.long(m.size.toLong)
      // sorted keys: Map iteration order is not canonical
      m.toArray.sortBy(_._1).foreach { case (k, v) =>
        f.string(k); f.long(v)
      }
    }
  }

  override def equals(other: Any): Boolean = other match {
    case that: LmModelRef =>
      (this eq that) ||
        (order == that.order && total == that.total && digest == that.digest)
    case _ => false
  }
  override def hashCode(): Int = digest._1.toInt
  // appears in plan/expression strings — keep it a short fingerprint,
  // never the table contents
  override def toString: String =
    f"lm(order=$order,total=$total,md5=${digest._1}%016x)"
}

/** The stupid-backoff scoring kernel — THE recursion, shared by the
  * summing scorer ([[NgramNllSum]]) and the per-position cost-array
  * scorer ([[NgramNllCosts]]), interpreted and codegen'd paths alike
  * (one recursion in source; arithmetic bit-identical to the
  * ScalaUDFs it replaced and therefore to the DuckDB replays):
  * level k scores MULT(N-k) * c(gram_k)/c(ctx_{k-1}) (a surviving
  * k-gram's context survives in the table below — the trainer's
  * lower-order consistency), the unigram level MULT(N-1) * c(cur)/
  * total, unknown MULT(N-1)/(total*10); each position's cost floors
  * to the integer micro-nat grid BEFORE any summing (no
  * float-accumulation-order dependence).
  */
object NgramNll {

  /** 0.4^k backoff multipliers as decimal LITERALS, indexed by the
    * number of backoff steps. Literals, not computed powers: IEEE
    * 0.4*0.4 = 0.16000000000000003 != the literal 0.16 that the
    * scorers have always used and the DuckDB oracles carry — the
    * multiplier at each level must be the same parsed constant in
    * both engines. Supports orders up to 8. */
  val BackoffMult: Array[Double] =
    Array(1.0, 0.4, 0.16, 0.064, 0.0256, 0.01024, 0.004096, 0.0016384)

  /** The space-joined key of w(lo..hi-1) — exactly the `a + " " + b`
    * concatenation the count-table keys use. */
  private def sliceKey(w: Array[String], lo: Int, hi: Int): String = {
    val sb = new java.lang.StringBuilder(w(lo))
    var j = lo + 1
    while (j < hi) { sb.append(' ').append(w(j)); j += 1 }
    sb.toString
  }

  /** Micro-nat cost of the position whose context window starts at
    * i (gram = w(i .. i+order-1)). */
  private def positionCost(tables: Array[java.util.HashMap[String, java.lang.Long]],
                           totalD: Double, order: Int,
                           w: Array[String], i: Int): Long = {
    val mult = BackoffMult
    var ratio = 0.0
    var found = false
    var k = order
    while (k >= 2 && !found) {
      val lo = i + order - k // gram = last k words of the window
      val c = tables(k - 1).get(sliceKey(w, lo, i + order))
      if (c != null) {
        ratio = mult(order - k) * (c.longValue.toDouble /
          tables(k - 2).get(sliceKey(w, lo, i + order - 1)).longValue.toDouble)
        found = true
      } else k -= 1
    }
    if (!found) {
      val c = tables(0).get(w(i + order - 1))
      ratio =
        if (c != null) mult(order - 1) * (c.longValue.toDouble / totalD)
        else mult(order - 1) / (totalD * 10.0)
    }
    math.floor(1000000.0 * -math.log(ratio)).toLong
  }

  /** One String per element, materialized once per row: the gram
    * keys concatenate multiple words, so per-position UTF8String
    * conversion would redo the same work order times. The production
    * tokenizer (split on whitespace) never emits null elements; a
    * null is mapped to "" defensively. */
  private def toWords(a: ArrayData): Array[String] = {
    val n = a.numElements()
    val w = new Array[String](n)
    var i = 0
    while (i < n) {
      w(i) = if (a.isNullAt(i)) "" else a.getUTF8String(i).toString
      i += 1
    }
    w
  }

  /** Sum of all position costs (positions order..n; 0 for shorter
    * docs — callers filter those out to preserve the dropout rule). */
  def sumCosts(a: ArrayData, tables: Array[java.util.HashMap[String, java.lang.Long]],
               totalD: Double, order: Int): Long = {
    val w = toWords(a)
    var nll = 0L
    var i = 0
    while (i <= w.length - order) {
      nll += positionCost(tables, totalD, order, w, i)
      i += 1
    }
    nll
  }

  /** Per-position cost array (length max(0, n-order+1)). */
  def costArray(a: ArrayData, tables: Array[java.util.HashMap[String, java.lang.Long]],
                totalD: Double, order: Int): ArrayData = {
    val w = toWords(a)
    val n = math.max(0, w.length - order + 1)
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = positionCost(tables, totalD, order, w, i)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Order-N stupid-backoff document NLL (micro-nats) of an
  * array<string> word column against a broadcast-in-plan model —
  * replaces the per-model ScalaUDF in
  * [[graft.operators.LanguageModel.ngramNllNarrowOfWords]]: the UDF
  * blocked whole-stage codegen and paid boxed Seq[String] ser/de on
  * every corpus-wide scoring pass (all four `_bcast` perplexity
  * queries + the CCNet bucketing scan). */
case class NgramNllSum(child: Expression, model: LmModelRef)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ngram_nll requires an array<string> argument, got ${other.simpleString}")
  }

  // interpreted path: resolve the broadcast once per (deserialized)
  // expression instance, not per row
  @transient private lazy val tbls = model.tables

  override protected def nullSafeEval(a: Any): Any =
    NgramNll.sumCosts(a.asInstanceOf[ArrayData], tbls,
      model.totalD, model.order)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // reference the REF (O(1) in the task binary), resolve the
      // broadcast payload once per task in the generated class init —
      // addReferenceObj on model.tables itself would re-embed the
      // resolved payload in the codegen references and ship it per
      // task again (the exact tax BcRef removes)
      val ref = ctx.addReferenceObj("lmModel", model,
        classOf[LmModelRef].getName)
      val tbl = ctx.addMutableState("java.util.HashMap[]", "lmTables",
        v => s"$v = $ref.tables();")
      s"${ev.value} = graft.plans.NgramNll.sumCosts($a, $tbl, " +
        s"${model.totalD}D, ${model.order});"
    })

  override protected def withNewChildInternal(newChild: Expression): NgramNllSum =
    copy(child = newChild)
}

/** Per-position micro-nat cost array — the min-K% prob scorer's
  * input ([[graft.operators.LanguageModel.minKProbNll]]); same
  * kernel, array output. */
case class NgramNllCosts(child: Expression, model: LmModelRef)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ngram_nll_costs requires an array<string> argument, got ${other.simpleString}")
  }

  @transient private lazy val tbls = model.tables

  override protected def nullSafeEval(a: Any): Any =
    NgramNll.costArray(a.asInstanceOf[ArrayData], tbls,
      model.totalD, model.order)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // see NgramNllSum.doGenCode on why the REF ships, not the tables
      val ref = ctx.addReferenceObj("lmModel", model,
        classOf[LmModelRef].getName)
      val tbl = ctx.addMutableState("java.util.HashMap[]", "lmTables",
        v => s"$v = $ref.tables();")
      s"${ev.value} = graft.plans.NgramNll.costArray($a, $tbl, " +
        s"${model.totalD}D, ${model.order});"
    })

  override protected def withNewChildInternal(newChild: Expression): NgramNllCosts =
    copy(child = newChild)
}

object LmExpressions {
  import org.apache.spark.sql.graftglue.Bridge

  /** Column API over the codegen'd scorers. */
  def nllSum(words: Column, model: LmModelRef): Column =
    Bridge.column(NgramNllSum(Bridge.expression(words), model))

  def nllCosts(words: Column, model: LmModelRef): Column =
    Bridge.column(NgramNllCosts(Bridge.expression(words), model))
}
