package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

import graft.schema.SchemaInfo

/** DIFFERENTIAL schema-renderer fuzzing (the NameResolutionFuzzSpec
  * treatment for §2.5, the last reference-semantics surface pinned
  * only by transcribed goldens): random nested schemas rendered by
  * the production TextTree port (nodes.py:265-295) and compared
  * line-for-line against an INDEPENDENT flat walk that computes each
  * field's (indent, name, suffix) directly — suffix = the
  * concatenated `[]` per array level crossed before the chain
  * terminates, plus the numpy dtype at a primitive leaf, empty at a
  * struct (whose fields indent one step deeper regardless of how
  * many array levels wrapped it) or NullType. A transcription bug in
  * either side cannot hide in the other: the production renderer
  * builds a tree and folds suffixes upward with the reference's
  * stop-at-named-node rule; the oracle never builds a tree at all.
  *
  * Deterministic seed — failures reproduce.
  */
class SchemaInfoFuzzSpec extends AnyFunSuite {

  private val Cases = 220
  private val Seed = 20260814L
  private val Names = Vector("a", "b", "c", "d", "e", "f")

  // ---- random schema (structs, arrays, maps-as-leaves, NullType) ----

  private def genStruct(depth: Int, rnd: Random): StructType = {
    val n = 1 + rnd.nextInt(4)
    StructType(rnd.shuffle(Names).take(n).sorted.map { nm =>
      StructField(nm, genType(depth - 1, rnd), nullable = true)
    })
  }

  private def genType(depth: Int, rnd: Random): DataType = {
    val r = rnd.nextInt(12)
    if (depth <= 0 || r < 5)
      Seq(LongType, StringType, IntegerType, DoubleType, BooleanType,
        ShortType, ByteType, FloatType, BinaryType, TimestampType,
        DateType, NullType)(rnd.nextInt(12))
    else if (r < 8) genStruct(depth, rnd)
    else if (r < 11) ArrayType(genType(depth - 1, rnd), containsNull = true)
    else MapType(StringType, genType(depth - 1, rnd), valueContainsNull = true)
  }

  // ---- independent oracle: flat (indent, name, suffix) walk --------

  /** Chase a field's type chain to its terminator: `[]` per array
    * level, then the dtype (primitive), "" (struct — returned for
    * descent — or NullType, which renders nothing further). */
  private def chase(dt: DataType): (String, Option[StructType]) = dt match {
    case st: StructType  => ("", Some(st))
    case ArrayType(e, _) => val (s, inner) = chase(e); ("[]" + s, inner)
    case NullType        => ("", None)
    case other           => (SchemaInfo.dtypeName(other), None)
  }

  private def walk(st: StructType, indent: Int): Seq[(Int, String, String)] =
    st.fields.toSeq.flatMap { f =>
      val (suffix, inner) = chase(f.dataType)
      (indent, f.name, suffix) +: inner.toSeq.flatMap(walk(_, indent + 4))
    }

  private def parse(rendered: String): Seq[(Int, String, String)] =
    if (rendered.isEmpty) Seq.empty
    else rendered.split("\n", -1).toSeq.map { line =>
      val m = "^( *)- ([^ ]+) (.*)$".r
      line match {
        case m(pad, name, suffix) => (pad.length, name, suffix)
        case other => fail(s"unparseable rendered line: '$other'")
      }
    }

  test(s"render == independent flat walk on $Cases random nested schemas") {
    val rnd = new Random(Seed)
    var structDescents = 0
    (1 to Cases).foreach { i =>
      val st = genStruct(3, rnd)
      val got = parse(SchemaInfo.render(st))
      val want = walk(st, 0)
      assert(got == want, s"case $i schema ${st.simpleString}")
      structDescents += want.count(_._1 > 0)
    }
    // the generator must actually exercise nested descent — a fuzz of
    // flat schemas pins nothing about indentation or suffix folding
    assert(structDescents > 200,
      s"only $structDescents nested fields across all cases — generator drifted")
  }

  test("pin: array-wrapped struct keeps `[]` on the field line and " +
    "indents its subfields one step (reference list-of-record shape)") {
    val st = StructType(Seq(StructField("d",
      ArrayType(ArrayType(StructType(Seq(
        StructField("b", ArrayType(DoubleType, true), true))), true), true),
      true)))
    assert(SchemaInfo.render(st) ==
      "- d [][]\n    - b []float64")
  }
}
