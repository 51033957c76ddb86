package graft

import org.apache.spark.sql.functions._

import graft.operators.LabelProp

/** Label propagation (round 13): hand-computed beliefs on a planted
  * path graph, seed clamping, the isolated-node midpoint, duplicate/
  * reversed edge de-duplication, and the contradictory-seed guard.
  */
class LabelPropSpec extends SparkSpec {

  private val S = LabelProp.SCALE
  private val M = LabelProp.MID

  private def run(edges: Seq[(String, String)],
                  seeds: Seq[(String, Int)],
                  nodes: Seq[String],
                  iters: Int = 3): Map[String, Long] = {
    import spark.implicits._
    LabelProp.propagate(
        edges.toDF("src", "dst"), "src", "dst",
        seeds.toDF("node", "y"), "node", "y",
        nodes.toDF("node"), "node", iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("path graph A-B-C-D with A=+1, D=-1: hand-unrolled 3 rounds") {
    val got = run(
      edges = Seq("A" -> "B", "B" -> "C", "C" -> "D"),
      seeds = Seq("A" -> 1, "D" -> -1),
      nodes = Seq("A", "B", "C", "D", "E"))
    // r1: B=(S+M)/2, C=(M+0)/2 ; r2: B=(S+C1)/2, C=B1/2 ;
    // r3: B=(S+C2)/2, C=B2/2 — all exact integer halvings
    val b1 = (S + M) / 2; val c1 = M / 2
    val b2 = (S + c1) / 2; val c2 = b1 / 2
    val b3 = (S + c2) / 2; val c3 = b2 / 2
    assert(got == Map(
      "A" -> S, "B" -> b3, "C" -> c3, "D" -> 0L, "E" -> M))
    assert(b3 > M && c3 < M) // thresholded sides land as planted
  }

  test("duplicate and reversed edges collapse to one neighbor") {
    val base = run(
      edges = Seq("A" -> "B"),
      seeds = Seq("A" -> 1), nodes = Seq("A", "B"), iters = 1)
    val dup = run(
      edges = Seq("A" -> "B", "A" -> "B", "B" -> "A"),
      seeds = Seq("A" -> 1), nodes = Seq("A", "B"), iters = 1)
    assert(base == dup)
    assert(base("B") == S) // B's only neighbor is the clamped seed
  }

  test("edges to nodes outside the universe drop entirely — deg " +
    "counts only known neighbors") {
    val got = run(
      edges = Seq("A" -> "B", "A" -> "X", "X" -> "B"),
      seeds = Seq("B" -> 1), nodes = Seq("A", "B"), iters = 1)
    // were the ghost edge kept in deg, A would read (S + nothing)/2
    // = MID; with it dropped, A's one known neighbor is the seed
    assert(got == Map("A" -> S, "B" -> S))
  }

  test("contradictory seed rejected; label outside +1/-1 rejected") {
    intercept[IllegalArgumentException] {
      run(Seq("A" -> "B"), Seq("A" -> 1, "A" -> -1), Seq("A", "B"))
    }
    intercept[Exception] {
      run(Seq("A" -> "B"), Seq("A" -> 2), Seq("A", "B"))
    }
  }
}
