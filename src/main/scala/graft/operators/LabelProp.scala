package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semi-supervised label propagation over a host/source graph — the
  * classic web-curation move when only a handful of domains carry
  * trusted labels (known-good reference hosts, known-spam networks):
  * seed those few nodes, spread belief along graph edges (links, or
  * in a dedup-derived graph, shared-boilerplate edges), and read the
  * propagated score as a soft label for every unlabeled host. This
  * is Zhu & Ghahramani (2002) harmonic label propagation restricted
  * to a fixed iteration count — the budgeted form production
  * pipelines run, since the consumers threshold the belief rather
  * than demand a fixpoint certificate.
  *
  * Semantics (pinned):
  *  - the graph is treated as UNDIRECTED: edges are symmetrized,
  *    self-loops and duplicate edges dropped (a duplicate edge would
  *    double-count one neighbor's belief);
  *  - belief lives in integer fixed-point [0, SCALE]: a +1 seed is
  *    clamped to SCALE every round, a -1 seed to 0, and every
  *    unseeded node starts (and, if isolated, stays) at the
  *    uninformative midpoint SCALE/2;
  *  - one round replaces every UNSEEDED node's belief with the floor
  *    mean of its neighbors' beliefs: sum(neighbor belief) div deg —
  *    integer division AFTER the exact BIGINT sum, so the result is
  *    merge-order independent and replays bit-identically in a SQL
  *    oracle (the [[PageRank]] fixed-point discipline; beliefs are
  *    kept nonnegative precisely so floor division agrees between
  *    engines that floor vs truncate on negatives).
  *
  * Scale shape: each iteration is one equi-join of the belief frame
  * onto the symmetrized edge list (shuffle on src) plus one
  * map-combined sum on dst and a left join back to the node set —
  * iters * O(|E|) with no superlinear term, the same iterative-join
  * form as [[PageRank.ranks]]. The node/edge frames are host-level
  * (orders of magnitude below the document corpus), and each round's
  * frame is slot-persisted and materialized so lineage stays flat
  * instead of growing a join-per-iteration tree.
  *
  * Overflow: a node's neighbor sum is <= deg * SCALE and deg < |N|,
  * so |N| <= Long.MaxValue/SCALE (~9.2e6 nodes at SCALE=1e12) keeps
  * every intermediate in range — enforced below. A web-scale HOST
  * graph (1e8 nodes) would lower SCALE to 1e9; the document corpus
  * itself never enters the graph.
  */
object LabelProp {

  val SCALE: Long = 1000000000000L // 1e12 fixed-point belief
  val MID: Long = SCALE / 2
  private val MAX_NODES = Long.MaxValue / SCALE

  /** Propagate seed labels over an undirected graph.
    *
    * @param edges   edge list (symmetrized internally; self-loops and
    *                duplicates dropped)
    * @param seeds   (node, label) with label in {-1, +1}; a node
    *                appearing with BOTH labels is rejected (one
    *                contradictory host would silently bias the whole
    *                neighborhood)
    * @param nodes   the node universe (isolated unseeded nodes come
    *                back at the MID belief)
    * @param iters   fixed unrolled iteration count
    * @return (node, belief_e12) with belief in [0, SCALE]; threshold
    *         at MID for a good/bad call
    */
  def propagate(edges: DataFrame, srcCol: String, dstCol: String,
                seeds: DataFrame, seedNodeCol: String, labelCol: String,
                nodes: DataFrame, nodeCol: String,
                iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 100, s"iters in [1,100], got $iters")

    val nd = nodes.select(col(nodeCol).as("node")).distinct()
    val e0 = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
    val und = e0
      .union(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      // edges to nodes OUTSIDE the universe drop entirely — a host
      // link table naturally references hosts absent from the node
      // snapshot, and keeping such an edge in deg while its
      // neighbor's belief never joins would silently deflate every
      // unseeded neighbor toward 0 (deg counts only known neighbors)
      .join(nd.select(col("node").as("src")), Seq("src"), "left_semi")
      .join(nd.select(col("node").as("dst")), Seq("dst"), "left_semi")
    val sd = seeds
      .select(col(seedNodeCol).as("node"),
        col(labelCol).cast("long").as("__y"))
      .filter(col("__y").isNotNull)
      .distinct()
      .select(col("node"),
        when(col("__y") === 1L, lit(SCALE))
          .when(col("__y") === -1L, lit(0L))
          .otherwise(raise_error(
            concat(lit("labelProp: seed label must be +1/-1, got "),
              col("__y").cast("string"))).cast("long"))
          .as("seed_e12"))

    val undP = PersistSlots.swap("labelprop.edges", und)
    val ndP = PersistSlots.swap("labelprop.nodes", nd)
    val sdP = PersistSlots.swap("labelprop.seeds", sd)
    val n = ndP.count()
    require(n > 0, "labelProp over an empty node set")
    require(n <= MAX_NODES,
      s"labelProp overflow headroom: $n nodes > $MAX_NODES could push " +
        "a neighbor sum past Long range; lower SCALE for graphs this large")
    // distinct() above de-dups seeds exactly; a node left with two
    // DIFFERENT rows is a contradictory labeling
    require(sdP.groupBy(col("node")).count().filter(col("count") > 1).isEmpty,
      "labelProp: a seed node carries both +1 and -1")

    val deg = undP.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val r0 = ndP
      .join(sdP, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("seed_e12"), lit(MID)).as("belief_e12"))

    // flat lineage: slot-persist + materialize each round (the
    // PageRank discipline — a bench median-of-3 on the same graph
    // canonicalizes equal and rides the cached frames)
    var r = PersistSlots.swap("labelprop.r0", r0)
    r.count()
    for (it <- 1 to iters) {
      val neigh = undP
        .join(r.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst"))
        .agg(sum(col("belief_e12")).as("s"))
        .withColumnRenamed("dst", "node")
      val next = ndP
        .join(sdP, Seq("node"), "left")
        .join(neigh, Seq("node"), "left")
        .join(deg.withColumnRenamed("src", "node"), Seq("node"), "left")
        .select(col("node"),
          when(col("seed_e12").isNotNull, col("seed_e12"))
            .when(col("s").isNotNull, expr("s div deg"))
            .otherwise(lit(MID))
            .as("belief_e12"))
      val p = PersistSlots.swap(s"labelprop.r$it", next)
      p.count()
      r = p
    }
    r
  }
}
