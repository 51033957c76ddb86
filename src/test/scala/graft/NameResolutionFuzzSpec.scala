package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{NameResolution, NameStrategy}

/** DIFFERENTIAL name-resolution fuzzing (the ClusionFuzzSpec
  * treatment for the §2.4 surface): random leaf-first path sets with
  * ENGINEERED collisions — small name pool, shared suffixes, shared
  * prefixes, duplicated full paths — run through the production
  * `NameResolution.columnNames` for every strategy and compared
  * against an INDEPENDENT re-implementation of the reference's
  * resolution fixpoint (nodes.py:218-241), written functionally (an
  * immutable-state step function folded to the fixpoint) rather than
  * as the production's in-place mutation, so a transcription bug in
  * either cannot hide in the other. Name resolution was the last
  * reference-semantics surface pinned only by transcribed goldens
  * (NameResolutionSpec) — this property-checks it: for every case
  * and strategy, production and oracle must either both throw the
  * not-unique degeneracy error or both produce the same names, and
  * the reference's two documented quirks must survive:
  *
  *  - `is_resolved` is OVERWRITTEN per conflicting group in
  *    encounter order (nodes.py:233), so a later already-drained
  *    group can end the loop while an earlier group still holds
  *    undrained segments;
  *  - a group whose next prefixes all agree consumes the segment
  *    WITHOUT appending it (non-verbose), which is what keeps
  *    whole-group-shared parents out of resolved names.
  *
  * Deterministic seed — failures reproduce.
  */
class NameResolutionFuzzSpec extends AnyFunSuite {

  private val Cases = 260
  private val Seed = 20260816L
  private val Pool = Vector("a", "b", "c", "x")

  // ---- independent oracle --------------------------------------------

  /** One resolution state: the name resolved so far and the segments
    * not yet consumed (leaf-first input had its head moved into
    * `resolved` up front, nodes.py:182-187). */
  private case class St(resolved: String, remaining: List[String])

  /** One fixpoint round over all states: group by current resolved
    * name in first-encounter order; every group of size > 1 pops one
    * segment per member and, when the popped segments differ (or
    * always, in verbose mode), prepends them; the round's resolved
    * flag is the LAST conflicting group's all-drained test — the
    * reference's overwrite quirk, reproduced deliberately. */
  private def step(sts: Vector[St], verbose: Boolean): (Vector[St], Boolean) = {
    val order = sts.map(_.resolved).distinct
    var flag = true
    val updated = scala.collection.mutable.Map.empty[Int, St]
    order.foreach { name =>
      val idxs = sts.indices.filter(sts(_).resolved == name)
      if (idxs.size > 1) {
        val popped = idxs.map { i =>
          sts(i).remaining match {
            case h :: t => (i, h, t)
            case Nil    => (i, "", List.empty[String])
          }
        }
        flag = popped.forall(_._3.isEmpty)
        val distinctPrefixes = popped.map(_._2).distinct.size > 1
        popped.foreach { case (i, p, t) =>
          val cur = sts(i).resolved
          val next =
            if (!(distinctPrefixes || verbose)) cur
            else if (cur.isEmpty) p
            else if (p.isEmpty) cur
            else p + NameResolution.separator + cur
          updated(i) = St(next, t)
        }
      }
    }
    (sts.indices.map(i => updated.getOrElse(i, sts(i))).toVector, flag)
  }

  private def oracleResolve(names: Seq[List[String]], verbose: Boolean): Seq[String] = {
    var sts = names.iterator.map {
      case h :: t => St(h, t)
      case Nil    => St("", Nil)
    }.toVector
    var done = false
    while (!done) {
      val (next, flag) = step(sts, verbose)
      sts = next
      done = flag
    }
    sts.map(_.resolved)
  }

  private def oracle(strategy: NameStrategy, names: Seq[List[String]]): Seq[String] = {
    val res = strategy match {
      case NameStrategy.ConcatenateAlways =>
        names.map(_.reverse.mkString(NameResolution.separator))
      case NameStrategy.MultiIndex =>
        // padded-with-"" tuples joined by '.' with empties dropped ==
        // the reversed path joined by '.'
        names.map(_.reverse.mkString("."))
      case NameStrategy.ConcatenateConflicts =>
        oracleResolve(names, verbose = false)
      case NameStrategy.ConcatenateConflictsVerbose =>
        oracleResolve(names, verbose = true)
    }
    if (res.distinct.size != res.size)
      throw new IllegalArgumentException("oracle: not unique")
    res
  }

  // ---- generators ----------------------------------------------------

  /** Random leaf-first path. Biased toward collisions: leaves drawn
    * from a 2-name subset so most cases have conflicting leaf names,
    * parents from the full pool. */
  private def genPath(rnd: Random): List[String] = {
    val depth = 1 + rnd.nextInt(4)
    val leaf = Pool(rnd.nextInt(2))
    leaf :: List.fill(depth - 1)(Pool(rnd.nextInt(Pool.size)))
  }

  private def genCase(rnd: Random): Seq[List[String]] = {
    val n = 2 + rnd.nextInt(6)
    val base = Seq.fill(n)(genPath(rnd))
    rnd.nextInt(4) match {
      case 0 => base :+ base(rnd.nextInt(base.size)) // exact duplicate -> degenerate
      case 1 =>
        // shared-suffix twins: same leaf+parent chain, one extra root
        val p = base(rnd.nextInt(base.size))
        base :+ (p :+ Pool(rnd.nextInt(Pool.size)))
      case _ => base
    }
  }

  private val strategies = Seq(
    NameStrategy.ConcatenateConflicts,
    NameStrategy.ConcatenateConflictsVerbose,
    NameStrategy.ConcatenateAlways,
    NameStrategy.MultiIndex)

  // ---- the differential property -------------------------------------

  test(s"production == independent fixpoint on $Cases random collision-" +
    "engineered path sets x 4 strategies (throws match too)") {
    val rnd = new Random(Seed)
    var degenerate = 0
    (1 to Cases).foreach { i =>
      val paths = genCase(rnd)
      strategies.foreach { st =>
        val expected =
          try Right(oracle(st, paths))
          catch { case _: IllegalArgumentException => Left("not unique") }
        val got =
          try Right(NameResolution.columnNames(st, paths))
          catch { case _: IllegalArgumentException => Left("not unique") }
        if (expected.isLeft) degenerate += 1
        assert(got == expected,
          s"case $i strategy $st paths=${paths.map(_.mkString("<", ",", ">"))}")
      }
    }
    // the generator must actually exercise the degeneracy arm — a
    // fuzz whose error path never fires pins nothing about it
    assert(degenerate > 20, s"only $degenerate degenerate cases — generator drifted")
  }

  test("quirk pin: whole-group-shared parent is consumed unappended and " +
    "a later unresolved group keeps the loop alive") {
    // group "a": <a,x> <a,y> — differs at first pop, drains in round
    // 1 (its all-drained test reads true). group "b": <b,p,q>
    // <b,p,r> — first pop agrees ("p", consumed WITHOUT appending,
    // the shared-parent rule), segments remain, and because "b" is
    // the LAST conflicting group its false overwrites "a"'s true —
    // round 2 runs and separates q/r. Pin: production and oracle
    // agree on the exact names, including the dropped shared "p".
    val paths = Seq(
      List("a", "x"), List("a", "y"),
      List("b", "p", "q"), List("b", "p", "r"))
    val got = NameResolution.columnNames(NameStrategy.ConcatenateConflicts, paths)
    assert(got == oracle(NameStrategy.ConcatenateConflicts, paths))
    assert(got == Seq("x_a", "y_a", "q_b", "r_b"))
  }

  test("quirk pin: a later drained group OVERWRITES an earlier group's " +
    "unresolved flag -> early exit -> not-unique throw (both sides)") {
    // group "a": <a,p,q> <a,p,s> — first pop agrees ("p", consumed
    // unappended), remaining non-empty, sets the flag false.
    // group "b": <b,x> <b,y> — pops differ, drains, sets the flag
    // TRUE — overwriting group a's false because it is processed
    // last. The loop exits with "a","a" still colliding, so the
    // uniqueness check throws even though one more round would have
    // separated them on q/s. Reference behavior (nodes.py:233),
    // pinned on both implementations.
    val paths = Seq(
      List("a", "p", "q"), List("a", "p", "s"),
      List("b", "x"), List("b", "y"))
    intercept[IllegalArgumentException] {
      NameResolution.columnNames(NameStrategy.ConcatenateConflicts, paths)
    }
    intercept[IllegalArgumentException] {
      oracle(NameStrategy.ConcatenateConflicts, paths)
    }
  }

  test("quirk pin: degenerate identical paths throw (both sides)") {
    val paths = Seq(List("a", "b"), List("a", "b"))
    intercept[IllegalArgumentException] {
      NameResolution.columnNames(NameStrategy.ConcatenateConflicts, paths)
    }
    intercept[IllegalArgumentException] {
      oracle(NameStrategy.ConcatenateConflicts, paths)
    }
  }
}
