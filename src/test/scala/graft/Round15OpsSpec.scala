package graft

import org.apache.spark.sql.functions._

import graft.operators.{Expectations, LanguageModel, Quality}

/** Round-15 operators: the l-diversity privacy profile and the
  * excess-loss (RHO-style learnability) data-selection score.
  */
class Round15OpsSpec extends SparkSpec {

  import spark.implicits._

  test("lDiversityProfile: class histogram over distinct sensitive values, " +
    "at-risk below lMin") {
    val df = Seq(
      ("a", "s1"), ("a", "s2"), ("a", "s3"), // class a: l=3 (diverse)
      ("b", "s1"), ("b", "s1"), ("b", "s1"), // class b: l=1 — leaks s1
                                             //   at ANY k
      ("c", "s1"), ("c", "s2")               // class c: l=2
    ).toDF("g", "s")
    val out = Expectations.lDiversityProfile(df, Seq(col("g")), col("s"),
        lMin = 3)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3)))
      .toMap
    assert(out(3L) == (1L, 3L, 0))
    assert(out(1L) == (1L, 3L, 1), "the homogeneous class must flag")
    assert(out(2L) == (1L, 2L, 1))
    assert(out.size == 3)
  }

  test("lDiversityProfile rejects empty quasi-ids and lMin < 1") {
    val df = Seq(("a", "s")).toDF("g", "s")
    intercept[IllegalArgumentException] {
      Expectations.lDiversityProfile(df, Seq.empty, col("s"), 3)
    }
    intercept[IllegalArgumentException] {
      Expectations.lDiversityProfile(df, Seq(col("g")), col("s"), 0)
    }
  }

  test("readability: hand-computed ARI fixed point and clamped grades") {
    val df = Seq(
      (1L, "The quick brown fox. It jumps!"),
      (2L, ""),
      (3L, "supercalifragilistic expialidocious interdisciplinary")
    ).toDF("doc_id", "text")
    val out = Quality.readability(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    // doc 1: 25 non-ws chars / 6 words / 2 sentence runs:
    // floor(471*25/6)=1962 + floor(50*6/2)=150 - 2143 = -31 -> grade 1
    assert(out(1L) == (25L, 6L, 2L, -31L, 1L), s"got ${out(1L)}")
    // blank doc: one empty token, sentence floor 1 -> 0 + 50 - 2143
    assert(out(2L) == (0L, 1L, 1L, -2093L, 1L), s"got ${out(2L)}")
    // long technical words, no sentence marks: floor(471*51/3)=8007
    // + 150 - 2143 = 6014 -> grade clamps to 14
    assert(out(3L) == (51L, 3L, 1L, 6014L, 14L), s"got ${out(3L)}")
  }

  private val excessCorpus = Seq(
    (0L, "a b a b a b"),          // the reference doc: 'a b' bigram-tight
    (1L, "a x1 a x2 a x3"),       // dilutes p(.|a) in the CORPUS model
    (2L, "a y1 a y2 a y3"),
    (3L, "a w1 a w2 a w3"),
    (6L, "z z z z"),              // redundant: the corpus model knows z,
    (7L, "z z z z"),              //   the reference has never seen it
    (8L, "z z z z")
  ).toDF("doc_id", "text")

  test("excessLoss: fused one-pass result equals the two-model composition " +
    "of bigramNll (differential)") {
    val ref = excessCorpus.filter($"doc_id" === 0L)
    val fused = LanguageModel.excessLoss(excessCorpus, "doc_id", "text",
      ref, "text")
    val tr = LanguageModel.bigramNll(excessCorpus, "doc_id", "text",
        excessCorpus, "text")
      .select($"doc_id", $"n_scored", $"nll_e6".as("train_nll_e6"),
        $"avg_nll_e6".as("__ta"))
    val rf = LanguageModel.bigramNll(excessCorpus, "doc_id", "text",
        ref, "text")
      .select($"doc_id", $"nll_e6".as("ref_nll_e6"), $"avg_nll_e6".as("__ra"))
    val expected = tr.join(rf, Seq("doc_id"))
      .select($"doc_id", $"n_scored", $"train_nll_e6", $"ref_nll_e6",
        ($"__ta" - $"__ra").as("excess_e6"))
      .withColumn("selected", ($"excess_e6" > 0).cast("int"))
    assert(fused.columns.toSeq == expected.columns.toSeq)
    assert(fused.collect().map(_.toString).sorted.toSeq ==
      expected.collect().map(_.toString).sorted.toSeq)
  }

  test("excessLoss: reference-like-but-corpus-rare text is selected; " +
    "corpus-redundant text is not") {
    val ref = excessCorpus.filter($"doc_id" === 0L)
    val out = LanguageModel.excessLoss(excessCorpus, "doc_id", "text",
        ref, "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(4), r.getInt(5))).toMap
    // doc 0: the reference model scores its own bigrams at p('b'|'a')=1
    // (cost 0) while the corpus model's p(.|'a') is diluted by the
    // noise docs — positive excess, selected
    assert(out(0L)._1 > 0 && out(0L)._2 == 1, s"got ${out(0L)}")
    // docs 6-8: the corpus model has seen 'z z' nine times (cheap);
    // the reference never saw 'z' (expensive unknown-word backoff) —
    // negative excess, not selected
    Seq(6L, 7L, 8L).foreach { id =>
      assert(out(id)._1 < 0 && out(id)._2 == 0, s"doc $id: ${out(id)}")
    }
  }
}
