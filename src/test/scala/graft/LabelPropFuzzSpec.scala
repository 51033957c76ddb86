package graft

import scala.util.Random

import graft.operators.LabelProp

/** Differential fuzz for label propagation: random graphs, random
  * seed sets, random iteration counts, checked against an
  * independent dense-adjacency simulation (plain Scala maps — no
  * Spark, no shared code with the operator). Pins the full contract:
  * symmetrization, de-duplication, clamping, floor-mean arithmetic,
  * and the isolated-node midpoint.
  */
class LabelPropFuzzSpec extends SparkSpec {

  private val S = LabelProp.SCALE
  private val M = LabelProp.MID

  /** Reference implementation: dense adjacency, integer floor mean. */
  private def reference(nodes: Seq[String], edges: Seq[(String, String)],
                        seeds: Map[String, Int], iters: Int)
  : Map[String, Long] = {
    val adj: Map[String, Set[String]] = {
      val sym = edges.filter(e => e._1 != e._2)
        .flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1)).toSet
      nodes.map(n => n -> sym.collect { case (a, b) if a == n => b }).toMap
    }
    val seedVal = seeds.map { case (n, y) => n -> (if (y == 1) S else 0L) }
    var bel: Map[String, Long] =
      nodes.map(n => n -> seedVal.getOrElse(n, M)).toMap
    for (_ <- 1 to iters) {
      bel = nodes.map { n =>
        n -> seedVal.getOrElse(n, {
          val nb = adj(n)
          if (nb.isEmpty) M
          else Math.floorDiv(nb.toSeq.map(bel).sum, nb.size.toLong)
        })
      }.toMap
    }
    bel
  }

  test("80 random graphs match the dense-simulation reference") {
    import spark.implicits._
    val rnd = new Random(20260816L)
    for (trial <- 1 to 80) {
      val n = 2 + rnd.nextInt(12)
      val nodes = (0 until n).map(i => s"n$i")
      // random edge list WITH planted duplicates, reversals and
      // self-loops — the operator must drop/merge all of them
      val nEdges = rnd.nextInt(2 * n + 1)
      val edges = (0 until nEdges).map { _ =>
        (nodes(rnd.nextInt(n)), nodes(rnd.nextInt(n)))
      } ++ (if (rnd.nextBoolean() && nEdges > 0)
        Seq((nodes(0), nodes(0))) else Seq.empty)
      val nSeeds = 1 + rnd.nextInt(n)
      val seeds = rnd.shuffle(nodes).take(nSeeds)
        .map(nd => nd -> (if (rnd.nextBoolean()) 1 else -1)).toMap
      val iters = 1 + rnd.nextInt(4)

      val got = LabelProp.propagate(
          edges.toDF("src", "dst"), "src", "dst",
          seeds.toSeq.toDF("node", "y"), "node", "y",
          nodes.toDF("node"), "node", iters)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = reference(nodes, edges, seeds, iters)
      assert(got == want,
        s"trial $trial: n=$n edges=$edges seeds=$seeds iters=$iters")
    }
  }
}
