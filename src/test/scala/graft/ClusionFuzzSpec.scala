package graft

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.{ClusionInput, Clusions}
import graft.sources.Sources

/** DIFFERENTIAL clusion fuzzing (the FlattenFuzzSpec treatment for
  * the source layer): random nested schemas, random include/exclude
  * PATH SETS rendered into random spec syntaxes (dotted strings,
  * lists, nested Tree maps with dotted keys, terminal-empty-Tree
  * leaves), run through the production pipeline —
  * `Clusions.convert` (parse + recursiveMerge + include∧exclude
  * error) then `Sources.pruneSchema` — and compared against an
  * INDEPENDENT evaluator that works on the raw path sets directly
  * (no Clusion tree, no ColumnFilter): a field is kept iff the
  * reference walk over (inherited, has-includes-under,
  * exclude-terminal, default) says so, with the map value/key
  * addressing rule applied positionally. Clusion parsing/merging was
  * the last reference-semantics surface pinned only by transcribed
  * clusion_tests.py cases (ClusionsSpec) — this property-checks it:
  * every syntactic rendering of the same path sets must prune
  * identically, the both-included-and-excluded error must fire
  * exactly when the path sets intersect, and pruned schemas must
  * stay readable (parquet reader round-trip on a sample).
  *
  * Deterministic seed — failures reproduce.
  */
class ClusionFuzzSpec extends SparkSpec {

  private val Cases = 220
  private val Seed = 20260913L
  private val NamePool = Vector("a", "b", "c", "d", "e")

  // ---- random schema ------------------------------------------------

  private def genFields(depth: Int, rnd: Random, minN: Int = 1): Seq[StructField] = {
    val n = minN + rnd.nextInt(3)
    rnd.shuffle(NamePool).take(n).sorted.map { nm =>
      StructField(nm, genType(depth - 1, rnd), nullable = true)
    }
  }

  private def genType(depth: Int, rnd: Random): DataType = {
    val r = rnd.nextInt(10)
    if (depth <= 0 || r < 4)
      Seq(LongType, StringType, IntegerType, DoubleType, BooleanType)(rnd.nextInt(5))
    else if (r < 7) StructType(genFields(depth, rnd))
    else if (r < 9) ArrayType(genType(depth - 1, rnd), containsNull = true)
    else MapType(StringType, genType(depth - 1, rnd), valueContainsNull = true)
  }

  // ---- clusion address space of a schema ----------------------------

  /** Every dotted path a clusion can name in `dt`: struct fields
    * consume a segment, arrays are transparent, map values are
    * addressable BOTH through the synthetic "value" segment and
    * bare (the production routing rule picks per-node); "key" is a
    * recognized (ignored-subtree) segment too. */
  private def addrs(dt: DataType, pre: List[String]): Seq[List[String]] = dt match {
    case st: StructType => st.fields.toSeq.flatMap { f =>
      val p = pre :+ f.name
      p +: addrs(f.dataType, p)
    }
    case ArrayType(e, _) => addrs(e, pre)
    case MapType(_, v, _) =>
      ((pre :+ "value") +: addrs(v, pre :+ "value")) ++
        Seq(pre :+ "key") ++ addrs(v, pre)
    case _ => Nil
  }

  // ---- random spec syntax over a path set ----------------------------

  private def renderPath(p: List[String], rnd: Random): ClusionInput =
    rnd.nextInt(4) match {
      case 0 => ClusionInput.Path(p.mkString("."))
      case 1 if p.length >= 2 =>
        val k = 1 + rnd.nextInt(p.length - 1)
        ClusionInput.Tree(Seq(
          p.take(k).mkString(".") -> renderPath(p.drop(k), rnd)))
      case 2 =>
        // Tree(dotted-key -> empty Tree) marks the key's deepest
        // segment TERMINAL (python {"a.b": {}} form)
        ClusionInput.Tree(Seq(p.mkString(".") -> ClusionInput.Tree(Nil)))
      case _ => ClusionInput.Path(p.mkString("."))
    }

  /** One random syntactic rendering of a path set (Empty when the
    * set is empty and not root-terminal; Many(Nil) IS root-terminal
    * — python `[]`, "include everything explicitly"). */
  private def render(paths: Set[List[String]], rnd: Random): ClusionInput = {
    val rootTerminal = paths.contains(Nil)
    val rest = (paths - Nil).toSeq.sortBy(_.mkString("."))
    val items = rest.map(renderPath(_, rnd)) ++
      (if (rootTerminal) Seq(ClusionInput.Many(Nil)) else Nil)
    if (items.isEmpty) ClusionInput.Empty
    else if (items.length == 1 && !rootTerminal) items.head
    else ClusionInput.Many(rnd.shuffle(items))
  }

  // ---- independent path-set evaluator --------------------------------

  /** Reference prune over raw path sets — the direct transcription
    * of the clusion semantics (clusions.py merge rules +
    * avro_direct.cpp reader-schema pruning), with no intermediate
    * Clusion/ColumnFilter structures. */
  private def refPrune(root: StructType, inc: Set[List[String]],
                       exc: Set[List[String]]): StructType = {
    val defaultInclude = inc.isEmpty
    def hasIncUnder(p: List[String]) = inc.exists(_.startsWith(p))
    def excTerm(p: List[String]) = exc.contains(p)
    def incTerm(p: List[String]) = inc.contains(p)

    def walkStruct(st: StructType, pre: List[String],
                   inherited: Boolean): Option[StructType] = {
      val kept = st.fields.flatMap { f =>
        val p = pre :+ f.name
        if (excTerm(p) && !hasIncUnder(p)) None
        else {
          val childInherited = !excTerm(p) && (inherited || incTerm(p))
          val selected = childInherited || hasIncUnder(p) ||
            (defaultInclude && !excTerm(p))
          if (!selected) None
          else walkType(f.dataType, p, childInherited)
            .map(t => f.copy(dataType = t))
        }
      }
      if (kept.isEmpty) None else Some(StructType(kept))
    }

    def walkType(dt: DataType, pre: List[String],
                 inherited: Boolean): Option[DataType] = dt match {
      case st: StructType => walkStruct(st, pre, inherited)
      case ArrayType(e, n) => walkType(e, pre, inherited).map(ArrayType(_, n))
      case MapType(k, v, n) =>
        // value/key routing: if ANY spec path addresses this map's
        // synthetic key/value children, the value prunes through the
        // "value" child (key subtrees are recognized but ignored);
        // otherwise bare paths apply to the value directly
        val usesKV = (inc ++ exc).exists(q =>
          q.length > pre.length && q.take(pre.length) == pre &&
            (q(pre.length) == "value" || q(pre.length) == "key"))
        val pv = if (usesKV) pre :+ "value" else pre
        val childInherited = !excTerm(pv) && (inherited || incTerm(pv))
        walkType(v, pv, childInherited).map(MapType(k, _, n))
      case other => Some(other)
    }

    walkStruct(root, Nil, inherited = incTerm(Nil))
      .getOrElse(StructType(Nil))
  }

  // ---- the differential ----------------------------------------------

  private def pickPaths(space: Seq[List[String]], rnd: Random): Set[List[String]] = {
    val n = rnd.nextInt(4)
    val fromSchema = Seq.fill(n)(
      if (space.nonEmpty) space(rnd.nextInt(space.length)) else Nil)
      .filter(_.nonEmpty)
    val junk = if (rnd.nextInt(5) == 0)
      Seq(List.fill(1 + rnd.nextInt(2))(
        (NamePool :+ "zz")(rnd.nextInt(NamePool.length + 1))))
    else Nil
    (fromSchema ++ junk).toSet
  }

  test(s"$Cases random schemas x path sets x syntax forms: " +
    "production pipeline == path-set evaluator; error iff sets intersect") {
    var errors = 0
    var nonTrivial = 0
    var roundTrips = 0
    for (i <- 0 until Cases) {
      val rnd = new Random(Seed + i)
      val schema = StructType(genFields(3, rnd, minN = 2))
      val space = addrs(schema, Nil)
      var inc = pickPaths(space, rnd)
      val exc = pickPaths(space, rnd)
      // occasional deliberate overlap (the include∧exclude error),
      // and occasional root-terminal include (python `[]`)
      if (rnd.nextInt(10) == 0 && exc.nonEmpty)
        inc = inc + exc.head
      if (rnd.nextInt(20) == 0) inc = inc + Nil
      val ctx = s"case $i schema=${schema.simpleString} inc=$inc exc=$exc"

      if (inc.intersect(exc).nonEmpty) {
        errors += 1
        val ex = intercept[IllegalArgumentException] {
          Clusions.convert(render(inc, rnd), render(exc, rnd))
        }
        assert(ex.getMessage.contains("include and exclude"), ctx)
      } else {
        val expected = refPrune(schema, inc, exc)
        // two INDEPENDENT renderings of the same sets must both
        // match (parse/merge/graft invariance across syntax forms)
        for (r <- 1 to 2) {
          val rr = new Random(Seed + i * 31 + r)
          val filter = Clusions.convert(render(inc, rr), render(exc, rr))
          val got = Sources.pruneSchema(schema, filter)
          assert(got == expected, s"$ctx rendering=$r\n got=$got\n exp=$expected")
        }
        if (expected != schema) nonTrivial += 1
        // reader round-trip on a sample: the pruned schema must be a
        // valid parquet read schema against data written full
        if (i % 20 == 0 && expected.nonEmpty) {
          roundTrips += 1
          val dir = s"tmp/clusion_fuzz/$i"
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[Row], schema)
            .write.mode("overwrite").parquet(dir)
          val back = spark.read.schema(expected).parquet(dir)
          assert(back.schema == expected, ctx)
          assert(back.count() == 0, ctx)
        }
      }
    }
    // the generator must actually exercise the interesting space
    assert(errors >= 5, s"only $errors error cases generated")
    assert(nonTrivial >= Cases / 4, s"only $nonTrivial non-trivial prunes")
    assert(roundTrips >= 5)
  }
}
