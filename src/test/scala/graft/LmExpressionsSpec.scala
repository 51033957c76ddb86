package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, BoundReference}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.{CentroidsLongRef, LmModelRef, NgramNllCosts, NgramNllSum}

/** The codegen'd stupid-backoff scorers that replaced the two LM
  * ScalaUDFs (round 13): generated code must force-compile and agree
  * with the interpreted eval; the arithmetic must reproduce the
  * recursion's hand-computed costs; and the content-digest equality
  * of the embedded refs (LmModelRef / CentroidsLongRef) must make two
  * INDEPENDENTLY built equal payloads compare equal — the
  * PersistSlots plan-reuse contract — while different payloads
  * differ.
  */
class LmExpressionsSpec extends SparkSpec {

  // tiny trigram model, hand-auditable: corpus "a b c a b d"
  private def model(): LmModelRef = new LmModelRef(3, 6L, Vector(
    Map("a" -> 2L, "b" -> 2L, "c" -> 1L, "d" -> 1L),
    Map("a b" -> 2L, "b c" -> 1L, "c a" -> 1L, "b d" -> 1L),
    Map("a b c" -> 1L, "b c a" -> 1L, "c a b" -> 1L, "a b d" -> 1L)))

  private def wordsRow(ws: String*): InternalRow =
    InternalRow(ArrayData.toArrayData(
      ws.toArray.map(UTF8String.fromString)))

  private def cost(ratio: Double): Long =
    math.floor(1000000.0 * -math.log(ratio)).toLong

  test("NgramNllSum reproduces the backoff recursion, level by level") {
    val e = NgramNllSum(
      BoundReference(0, ArrayType(StringType), nullable = false), model())
    // seen trigram: c("a b c")/c("a b") = 1/2
    assert(e.eval(wordsRow("a", "b", "c")) == cost(1.0 / 2.0))
    // trigram miss, seen bigram: 0.4 * c("b d")/c("b") = 0.4 * 1/2
    assert(e.eval(wordsRow("c", "b", "d")) == cost(0.4 * (1.0 / 2.0)))
    // bigram miss too, seen unigram: 0.16 * c("d")/total
    assert(e.eval(wordsRow("b", "a", "d")) ==
      cost(0.16 * (1.0 / 6.0)))
    // unknown word: 0.16 / (total * 10)
    assert(e.eval(wordsRow("a", "b", "zz")) == cost(0.16 / 60.0))
    // multi-position doc sums per-position FLOORED costs
    val twoPos = e.eval(wordsRow("a", "b", "c", "a")).asInstanceOf[Long]
    assert(twoPos == cost(1.0 / 2.0) + cost(1.0 / 1.0))
  }

  test("generated code force-compiles and agrees with interpreted eval") {
    val m = model()
    val sumE = NgramNllSum(
      BoundReference(0, ArrayType(StringType), nullable = false), m)
    val costE = NgramNllCosts(
      BoundReference(0, ArrayType(StringType), nullable = false), m)
    val rows = Seq(
      wordsRow("a", "b", "c", "a", "b", "d", "zz", "c"),
      wordsRow("a", "b"), // shorter than order: zero positions
      wordsRow())
    val sumProj = GenerateUnsafeProjection.generate(Seq(Alias(sumE, "s")()))
    val costProj = GenerateUnsafeProjection.generate(Seq(Alias(costE, "c")()))
    rows.foreach { r =>
      assert(sumProj(r).getLong(0) == sumE.eval(r).asInstanceOf[Long])
      val gen = costProj(r).getArray(0).toLongArray().toSeq
      val interp = costE.eval(r).asInstanceOf[ArrayData].toLongArray().toSeq
      assert(gen == interp)
      // the sum IS the cost array's sum (one recursion in source)
      assert(interp.sum == sumE.eval(r).asInstanceOf[Long])
    }
  }

  test("LmModelRef digest equality: independently built equal models " +
    "compare equal; different models differ; plan strings stay short") {
    val a = model()
    val b = model() // fresh maps, same content
    assert(a == b && a.hashCode == b.hashCode)
    val c = new LmModelRef(3, 6L, Vector(
      Map("a" -> 2L, "b" -> 2L, "c" -> 1L, "d" -> 2L), // one count off
      Map("a b" -> 2L, "b c" -> 1L, "c a" -> 1L, "b d" -> 1L),
      Map("a b c" -> 1L, "b c a" -> 1L, "c a b" -> 1L, "a b d" -> 1L)))
    assert(a != c)
    // expression-level: equal models -> canonically equal plans
    val ref = BoundReference(0, ArrayType(StringType), nullable = false)
    assert(NgramNllSum(ref, a).semanticEquals(NgramNllSum(ref, b)))
    assert(!NgramNllSum(ref, a).semanticEquals(NgramNllSum(ref, c)))
    assert(a.toString.length < 80, "model contents leaked into toString")
  }

  test("CentroidsLongRef digest equality mirrors the model ref's") {
    def cents() = Seq.tabulate(5)(i => (i, Seq.tabulate(8)(d => (i * 8 + d).toLong)))
    val a = new CentroidsLongRef(cents())
    val b = new CentroidsLongRef(cents())
    assert(a == b && a.hashCode == b.hashCode)
    val shifted = new CentroidsLongRef(
      cents().map { case (id, v) => (id, v.map(_ + 1)) })
    assert(a != shifted)
    assert(a.toString.length < 60)
  }

  test("CellsFloatRef digest equality (float cell matrix)") {
    def cents() = Seq.tabulate(4)(i =>
      (i.toLong, Seq.tabulate(8)(d => (math.sin(i * 8 + d + 1) * 0.5).toFloat)))
    val a = new graft.plans.CellsFloatRef(cents())
    val b = new graft.plans.CellsFloatRef(cents())
    assert(a == b && a.hashCode == b.hashCode)
    val shifted = new graft.plans.CellsFloatRef(
      cents().map { case (id, v) => (id, v.map(_ + 0.001f)) })
    assert(a != shifted)
    assert(a.toString.length < 60)
  }

  test("scorer survives a serialization round-trip (executor shipping)") {
    val m = model()
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(m); oos.close()
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[LmModelRef]
    assert(back == m)
    val e = NgramNllSum(
      BoundReference(0, ArrayType(StringType), nullable = false), back)
    assert(e.eval(wordsRow("a", "b", "c")) == cost(1.0 / 2.0))
  }
}
