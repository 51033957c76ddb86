package graft

import org.apache.spark.sql.functions._

import graft.operators.{Decontaminate, Quality}

/** Round-13 curation additions: per-group percentile normalization,
  * the closed-form Naive Bayes filter, and the contamination matrix
  * — hand-computed expectations on planted frames plus the guards.
  */
class CurationOpsSpec extends SparkSpec {

  test("percentileNormalize: exact integer percent-ranks per group, " +
    "id tiebreak, single-doc group pins to 10000") {
    import spark.implicits._
    val scored = Seq(
      // group a: scores 5, 5, 9 — tie broken by id
      (1L, "a", 5L), (2L, "a", 5L), (3L, "a", 9L),
      // group b: one doc
      (4L, "b", 0L)
    ).toDF("doc_id", "source", "score")
    val got = Quality.percentileNormalize(scored, "source", "score", "doc_id")
      .select(col("doc_id"), col("pct_e4"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 5000L, 3L -> 10000L, 4L -> 10000L))
  }

  test("trainNaiveBayes: class-exclusive word gets a positive weight " +
    "at its bucket, bias follows the doc-count prior, single-class rejected") {
    import spark.implicits._
    val docs = Seq(
      (0L, "good words here", 1), (1L, "good stuff here", 1),
      (2L, "bad words there", -1)
    ).toDF("id", "text", "y")
    // 4096 buckets: the 7 planted words land collision-free (md5 is
    // fixed, so this is deterministic — checked by the run itself)
    val m = Quality.trainNaiveBayes(docs, "text", "y", buckets = 4096)
    // bias = floor(1e6 * ln((2+1)/(1+1))) — more positive docs
    assert(m.biasE6 == math.floor(1e6 * math.log(3.0 / 2.0)).toLong)
    val scored = Quality.scoreNaiveBayes(docs, "id", "text", m)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getInt(3)))
    // keep is exactly the sign of the score for every row
    assert(scored.forall { case (_, s, k) => (s > 0) == (k == 1) })
    // the two positive docs must outscore the negative one
    val byId = scored.map(t => t._1 -> t._2).toMap
    assert(math.min(byId(0L), byId(1L)) > byId(2L))
    intercept[IllegalArgumentException] {
      Quality.trainNaiveBayes(
        Seq(("only one class", 1)).toDF("text", "y"), "text", "y", 4096)
    }
  }

  test("trainNaiveBayes: weights are a pure function of the data, " +
    "not its partitioning") {
    import spark.implicits._
    val docs = Seq(
      ("alpha beta gamma", 1), ("alpha beta", 1), ("delta epsilon", -1),
      ("gamma delta", -1), ("alpha gamma", 1)
    ).toDF("text", "y")
    val m1 = Quality.trainNaiveBayes(docs, "text", "y", buckets = 32)
    val m2 = Quality.trainNaiveBayes(docs.repartition(7), "text", "y", 32)
    assert(m1 == m2)
  }

  test("KMeans.updateAssign: hand-computed mini-batch fold — sums " +
    "merge exactly, batch re-assigns against the moved centroids") {
    import spark.implicits._
    val base = Seq(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.1f, 0.0f)), (3L, Seq(0.9f, 0.0f))
    ).toDF("vec_id", "embedding")
    val batch = Seq(
      (10L, Seq(0.2f, 0.0f)), (11L, Seq(1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    // fit: c0=[50,0] (members 0,2), c1=[950,0] (members 1,3) in
    // milliunits; batch folds: c0=floor((100+200)/3)=[100,0],
    // c1=floor((1900+1000)/3)=[966,0]; re-assignment distances are
    // exact integer squares
    val got = graft.operators.KMeans.updateAssign(
        base, batch, "vec_id", "embedding", k = 2, steps = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == Set((10L, 0, 10000L), (11L, 1, 1156L)))
  }

  test("contaminationMatrix: dense group x set cells, distinct-doc " +
    "hit counting, e4 rates") {
    import spark.implicits._
    val train = Seq(
      // g1 doc 1 shares 'one two three' with eval_a (twice in text —
      // still ONE contaminated doc)
      (1L, "g1", "one two three and one two three"),
      (2L, "g1", "clean text entirely"),
      (3L, "g2", "four five six end")
    ).toDF("doc_id", "source", "text")
    val evals = Seq(
      ("eval_a", "one two three"),
      ("eval_b", "four five six")
    ).toDF("eval_set", "text")
    val got = Decontaminate.contaminationMatrix(
        train, "source", evals, "eval_set", "doc_id", "text", n = 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == Map(
      ("g1", "eval_a") -> (2L, 1L, 5000L),
      ("g1", "eval_b") -> (2L, 0L, 0L),
      ("g2", "eval_a") -> (1L, 0L, 0L),
      ("g2", "eval_b") -> (1L, 1L, 10000L)))
  }
}
