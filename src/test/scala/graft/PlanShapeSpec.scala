package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Mechanical enforcement of the scale claims the round-5 operators
  * make in their scaladoc: the physical plans are asserted, not just
  * printed into PLANS.md.
  */
class PlanShapeSpec extends SparkSpec {

  private val SF = "/root/testdata/sf0.001"

  // AQE wraps plans in AdaptiveSparkPlanExec — a LEAF node, which
  // would make a collect{case ShuffleExchangeExec} vacuously zero.
  // Count on the non-adaptive physical plan instead.
  private def shuffles(mk: => org.apache.spark.sql.DataFrame): Int =
    withoutAqe { mk.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }.length }

  private def withoutAqe[T](f: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    try f finally spark.conf.set(key, prev)
  }

  test("the shuffle counter is NOT vacuous: a groupBy shows its exchange") {
    import spark.implicits._
    assert(shuffles(Seq(1, 2, 2).toDF("x").groupBy("x").count()) > 0)
  }

  test("PQ encode is a narrow projection: ZERO exchanges beyond the scan") {
    assert(shuffles(graft.SparkEntry.queries("q_pq")(spark, SF)) == 0)
  }

  test("ADC search adds no exchange before the TakeOrdered merge") {
    assert(shuffles(graft.SparkEntry.queries("knn_pq_adc")(spark, SF)) == 0)
    assert(graft.SparkEntry.queries("knn_pq_adc")(spark, SF)
      .queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
  }

  test("IVF+PQ probes via a filter, no join, no exchange before the merge") {
    assert(shuffles(graft.SparkEntry.queries("knn_ivfpq")(spark, SF)) == 0)
    val plan = graft.SparkEntry.queries("knn_ivfpq")(spark, SF)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(2000))
  }

  test("no curation stage degenerates to a nested-loop or cartesian product") {
    val plan = graft.SparkEntry.queries("q_curate_e2e")(spark, SF)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }

  test("broadcast-model LM scoring is one narrow pass: zero exchanges, zero joins") {
    def mk = graft.SparkEntry.queries("q_perplexity_bcast")(spark, SF)
    assert(shuffles(mk) == 0)
    val plan = withoutAqe { mk.queryExecution.executedPlan.toString }
    assert(!plan.contains("Join"), plan.take(2000))
  }

  test("broadcast trigram scoring keeps the same zero-exchange zero-join shape") {
    def mk = graft.SparkEntry.queries("q_perplexity3_bcast")(spark, SF)
    assert(shuffles(mk) == 0)
    val plan = withoutAqe { mk.queryExecution.executedPlan.toString }
    assert(!plan.contains("Join"), plan.take(2000))
  }

  test("incremental dedup never self-joins the corpus band keys") {
    // structural claim: every band-key candidate join has the BATCH
    // side (subtree filtered to doc_id % 10 = 7) on at least one
    // side — a corpus x corpus band join would have neither
    val df = graft.SparkEntry.queries("dedup_incremental")(spark, SF)
    // the batch filter ((doc_id % 10) = 7) may sit inside a persisted
    // InMemoryRelation's cached plan; the corpus side carries the
    // NEGATED form (NOT (... = 7)), excluded by the lookbehind
    val positiveBatch = """(?<!NOT )\(\(doc_id#\d+L? % 10\) = 7\)""".r
    def hasBatchFilter(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
      p.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if positiveBatch.findFirstIn(f.condition.toString).isDefined => true
        case im: org.apache.spark.sql.execution.columnar.InMemoryRelation
          if positiveBatch.findFirstIn(im.cachedPlan.toString).isDefined => true
      }.nonEmpty
    val bandJoins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.condition.exists(_.toString.contains("band_key")) => j
    }
    assert(bandJoins.nonEmpty)
    bandJoins.foreach { j =>
      assert(hasBatchFilter(j.left) || hasBatchFilter(j.right),
        s"corpus x corpus band join:\n$j")
    }
  }

  test("min-K% prob scoring is the same zero-exchange zero-join narrow " +
    "pass as the perplexity scorers") {
    def mk = graft.SparkEntry.queries("q_min_k_prob")(spark, SF)
    assert(shuffles(mk) == 0)
    val plan = withoutAqe { mk.queryExecution.executedPlan.toString }
    assert(!plan.contains("Join"), plan.take(2000))
  }

  test("decontamination scrub never shuffles document text: no exchange " +
    "output carries the word array") {
    val df = graft.SparkEntry.queries("text_decontaminate_scrub")(spark, SF)
    val exchanges = withoutAqe { df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    } }
    // the gram-distinct and start-aggregation exchanges are expected;
    // none of them may carry array<string> (the tokenized document)
    assert(exchanges.nonEmpty)
    exchanges.foreach { e =>
      val hasWords = e.output.exists(a =>
        a.dataType.simpleString.contains("array<string>"))
      assert(!hasWords, e.output.map(a => s"${a.name}:${a.dataType.simpleString}"))
    }
  }

  test("as-of forward is ONE exchange; nearest adds no second exchange") {
    assert(shuffles(graft.SparkEntry.queries("q_asof_fwd")(spark, SF)) == 1)
    // nearest computes BOTH window passes over the same partitioning:
    // still exactly one shuffle (two intra-partition sorts)
    assert(shuffles(
      graft.SparkEntry.queries("q_asof_nearest")(spark, SF)) == 1)
  }

  test("source-filter gates documents through a BROADCAST semi-join") {
    val plan = withoutAqe {
      graft.SparkEntry.queries("q_source_filter")(spark, SF)
        .queryExecution.executedPlan.toString }
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      plan.take(2000))
  }

  test("SCD2's two window passes reuse one key exchange (sort reused)") {
    assert(shuffles(graft.SparkEntry.queries("q_scd2")(spark, SF)) == 1)
    assert(shuffles(graft.SparkEntry.queries("q_cdc_merge")(spark, SF)) == 1)
    assert(shuffles(graft.SparkEntry.queries("q_rolling")(spark, SF)) == 1)
  }

  test("kNN graph carries no vectors through its band join") {
    val df = graft.operators.Similarity.knnGraphLSH(
      spark.read.parquet(s"$SF/embeddings.parquet"),
      "vec_id", "embedding", dim = 64, k = 3)
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    val bucketJoins = joins.filter(_.output.map(_.name).contains("b"))
    assert(bucketJoins.nonEmpty)
    bucketJoins.foreach { j =>
      val hasVec = j.output.exists(a =>
        a.dataType.simpleString.contains("array<float>"))
      assert(!hasVec, j.output.map(a => s"${a.name}:${a.dataType.simpleString}"))
    }
  }

  test("LSH embedding dedup carries no vectors through the bucket join") {
    // late materialization: the (t, b) self-join's own output columns
    // are ids + signatures; vectors appear only via the id join-backs
    val df = graft.operators.Similarity.embeddingNearDupPairsLSH(
      spark.read.parquet(s"$SF/embeddings.parquet"),
      "vec_id", "embedding", minCosine = 0.42, dim = 64)
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    // the bucket join is the one whose keys include t/b; its output
    // must not contain an array<float> column
    val bucketJoins = joins.filter(_.output.map(_.name).contains("b"))
    assert(bucketJoins.nonEmpty)
    bucketJoins.foreach { j =>
      val hasVec = j.output.exists(a =>
        a.dataType.simpleString.contains("array<float>"))
      assert(!hasVec, j.output.map(a => s"${a.name}:${a.dataType.simpleString}"))
    }
  }
}
