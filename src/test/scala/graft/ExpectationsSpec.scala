package graft

import graft.operators.Expectations

/** Planted-violation checks for the data-quality suite: null
  * predicates fail (not pass), duplicate keys count beyond-first,
  * null child keys are orphans.
  */
class ExpectationsSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("rowChecks: one pass, nulls fail, counts exact") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(5.0)), (2L, Some(-1.0)), (3L, None), (4L, Some(0.5))
    ).toDF("id", "v")
    val got = Expectations.rowChecks(df, Seq(
        "v_positive" -> (col("v") > 0),
        "v_not_null" -> col("v").isNotNull))
      .orderBy("check").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSeq
    // v_positive fails on -1 AND the null; v_not_null fails on the null
    assert(got == Seq(
      ("v_not_null", 4L, 1L, 0), ("v_positive", 4L, 2L, 0)))
  }

  test("rowChecks rejects non-identifier check names") {
    import spark.implicits._
    val df = Seq((1L, 2.0)).toDF("id", "v")
    for (bad <- Seq("has space", "quo'te", "dot.ted", "back`tick", "")) {
      intercept[IllegalArgumentException] {
        Expectations.rowChecks(df, Seq(bad -> (col("v") > 0)))
      }
    }
  }

  test("unique counts rows beyond the first per key tuple") {
    import spark.implicits._
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"))
      .toDF("k", "s")
    val g1 = Expectations.unique(df, Seq("k"), "k_unique").collect().head
    assert((g1.getLong(1), g1.getLong(2), g1.getInt(3)) == (4L, 2L, 0))
    val g2 = Expectations.unique(df, Seq("k", "s"), "ks_unique")
      .collect().head
    assert((g2.getLong(1), g2.getLong(2), g2.getInt(3)) == (4L, 1L, 0))
  }

  test("refIntegrity: orphans counted, null child keys are orphans") {
    import spark.implicits._
    val child = Seq(Some(1L), Some(2L), Some(9L), None)
      .toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = Expectations.refIntegrity(child, "fk", parent, "pk", "fk_ok")
      .collect().head
    assert((got.getLong(1), got.getLong(2), got.getInt(3)) == (4L, 2L, 0))
  }

  test("suite unions per-check reports; all-green suite passes") {
    import spark.implicits._
    val df = Seq((1L, 2.0), (2L, 3.0)).toDF("k", "v")
    val rep = Expectations.suite(Seq(
      Expectations.rowChecks(df, Seq("v_pos" -> (col("v") > 0))),
      Expectations.unique(df, Seq("k"), "k_unique")))
      .collect().map(r => (r.getString(0), r.getInt(3))).toSeq.sorted
    assert(rep == Seq(("k_unique", 1), ("v_pos", 1)))
  }

  test("tCloseness: skewed class flagged, corpus-like classes not") {
    import spark.implicits._
    // c1, c2: 10 A + 10 B each (mirror the corpus); c3: 9 A + 1 B.
    // Corpus = 29 A / 21 B over 50. Hand-worked exact distances:
    //   d(c1) = d(c2) = 1/2(|0.5-0.58| + |0.5-0.42|) = 0.08 -> bucket 0
    //   d(c3) = (|9*50-29*10| + |1*50-21*10|) * 5e5 / (10*50)
    //         = 320 * 500000 / 500 = 320000 -> bucket 300000, flagged
    val rows =
      (1 to 10).map(_ => ("c1", "A")) ++ (1 to 10).map(_ => ("c1", "B")) ++
      (1 to 10).map(_ => ("c2", "A")) ++ (1 to 10).map(_ => ("c2", "B")) ++
      (1 to 9).map(_ => ("c3", "A")) :+ (("c3", "B"))
    val got = Expectations.tClosenessProfile(rows.toDF("cls", "sv"),
        Seq(col("cls")), col("sv"), tMaxE6 = 200000L)
      .orderBy("d_bucket_e6").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSeq
    assert(got == Seq((0L, 2L, 40L, 0), (300000L, 1L, 10L, 1)), got.toString)
  }

  test("tCloseness: the absent-value tail is exact (closed form)") {
    import spark.implicits._
    // c1 holds only A (4 rows), c2 only B (4 rows): corpus 4/4, so
    // each class's distance is exactly 0.5 — the B term for c1 is
    // entirely the absent-tail (n - sv) * n_c = (8-4)*4 = 16, and
    // (16+16)*5e5/(4*8) = 500000
    val rows = (1 to 4).map(_ => ("c1", "A")) ++ (1 to 4).map(_ => ("c2", "B"))
    val got = Expectations.tClosenessProfile(rows.toDF("cls", "sv"),
        Seq(col("cls")), col("sv"), tMaxE6 = 200000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq
    assert(got == Seq((500000L, 2L, 1)), got.toString)
  }

  test("tCloseness: NULL sensitive values and NULL quasi-ids count") {
    import spark.implicits._
    // Identical shape to the absent-tail test but with NULL standing
    // in for "B", plus a NULL-keyed class mirroring c1: every row
    // must participate (null-safe self-joins) — equal distances, and
    // the null class appears in the histogram.
    val rows: Seq[(String, String)] =
      (1 to 4).map(_ => ("c1", "A")) ++
        (1 to 4).map(_ => ("c2", null: String)) ++
        (1 to 4).map(_ => (null: String, "A"))
    val got = Expectations.tClosenessProfile(rows.toDF("cls", "sv"),
        Seq(col("cls")), col("sv"), tMaxE6 = 200000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).toSeq
    // corpus 8 A / 4 null over 12; c1 and the null class (all A):
    //   d = (|4*12-8*4| + absent 4*4)*5e5/(4*12) = 32*5e5/48 = 333333
    // c2 (all null): d = (absent 8*4 + |4*12-4*4|)*5e5/48 = 666666
    assert(got.toSet === Set((300000L, 2L, 8L, 1), (600000L, 1L, 4L, 1)),
      got.toString)
  }

  test("tCloseness rejects a threshold off the bucket grid") {
    import spark.implicits._
    val df = Seq(("c", "A")).toDF("cls", "sv")
    intercept[IllegalArgumentException] {
      Expectations.tClosenessProfile(df, Seq(col("cls")), col("sv"),
        tMaxE6 = 150000L)
    }
  }
}
