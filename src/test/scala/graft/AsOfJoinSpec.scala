package graft

import graft.operators.AsOfJoin

/** As-of join semantics beyond the q_asof oracle: tolerance bounds
  * the lookback, ties at equal timestamps prefer the right row
  * (side-ordered window), and unmatched lefts survive with nulls.
  */
class AsOfJoinSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def frames = {
    import spark.implicits._
    val trades = Seq(
      (1L, 100L, 10.0), (1L, 250L, 11.0), (2L, 50L, 20.0)
    ).toDF("k", "t", "px")
    val quotes = Seq(
      (1L, 90L, 9.5), (1L, 240L, 10.5), (3L, 10L, 30.0)
    ).toDF("k", "qt", "bid")
    (trades, quotes)
  }

  test("backward picks latest right at or before left; unmatched -> null") {
    val (trades, quotes) = frames
    val got = AsOfJoin.backward(trades, quotes, Seq("k"), "t", "qt",
        Seq("bid" -> "bid"))
      .orderBy("k", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(3)))).toSeq
    assert(got == Seq(
      (1L, 100L, Some(9.5)), (1L, 250L, Some(10.5)), (2L, 50L, None)))
  }

  test("tolerance nulls out matches older than the lookback window") {
    val (trades, quotes) = frames
    val got = AsOfJoin.backward(trades, quotes, Seq("k"), "t", "qt",
        Seq("bid" -> "bid"), tolerance = Some(10L))
      .orderBy("k", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(3)))).toSeq
    // trade@100 matched quote@90: gap 10 <= 10 keeps it;
    // trade@250 matched quote@240: kept; k=2 never matched
    assert(got == Seq(
      (1L, 100L, Some(9.5)), (1L, 250L, Some(10.5)), (2L, 50L, None)))
    val tight = AsOfJoin.backward(trades, quotes, Seq("k"), "t", "qt",
        Seq("bid" -> "bid"), tolerance = Some(5L))
      .orderBy("k", "t").collect()
      .map(r => (r.getLong(0), Option(r.get(3)))).toSeq
    assert(tight == Seq((1L, None), (1L, None), (2L, None)))
  }

  test("equal timestamps: the right row at the same instant matches") {
    import spark.implicits._
    val l = Seq((1L, 100L)).toDF("k", "t")
    val r = Seq((1L, 100L, 42.0)).toDF("k", "qt", "v")
    val got = AsOfJoin.backward(l, r, Seq("k"), "t", "qt", Seq("v" -> "v"))
      .collect().map(x => Option(x.get(2))).toSeq
    assert(got == Seq(Some(42.0)))
  }

  test("forward picks earliest right at or after left; tolerance bounds it") {
    val (trades, quotes) = frames
    val got = AsOfJoin.forward(trades, quotes, Seq("k"), "t", "qt",
        Seq("bid" -> "bid"))
      .orderBy("k", "t").collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.get(3)))).toSeq
    // trade@100 -> quote@240 (the next one); trade@250 -> none after;
    // k=2 has no quotes
    assert(got == Seq(
      (1L, 100L, Some(10.5)), (1L, 250L, None), (2L, 50L, None)))
    val tight = AsOfJoin.forward(trades, quotes, Seq("k"), "t", "qt",
        Seq("bid" -> "bid"), tolerance = Some(100L))
      .orderBy("k", "t").collect()
      .map(r => (r.getLong(0), Option(r.get(3)))).toSeq
    // gap 140 > 100 nulls the trade@100 match
    assert(tight == Seq((1L, None), (1L, None), (2L, None)))
  }

  test("forward matches a right row at the exact same instant") {
    import spark.implicits._
    val l = Seq((1L, 100L)).toDF("k", "t")
    val r = Seq((1L, 100L, 42.0)).toDF("k", "qt", "v")
    val got = AsOfJoin.forward(l, r, Seq("k"), "t", "qt", Seq("v" -> "v"))
      .collect().map(x => Option(x.get(2))).toSeq
    assert(got == Seq(Some(42.0)))
  }

  test("nearest picks the closer side; equidistant ties go backward") {
    import spark.implicits._
    val l = Seq((1L, 100L), (1L, 200L), (1L, 151L)).toDF("k", "t")
    val r = Seq((1L, 90L, 1.0), (1L, 210L, 2.0)).toDF("k", "qt", "v")
    val got = AsOfJoin.nearest(l, r, Seq("k"), "t", "qt", Seq("v" -> "v"))
      .orderBy("t").collect()
      .map(x => (x.getLong(1), Option(x.get(2)))).toSeq
    // t=100: back gap 10 < fwd gap 110 -> 1.0
    // t=151: back gap 61, fwd gap 59 -> 2.0
    // t=200: back gap 110 > fwd gap 10 -> 2.0
    assert(got == Seq((100L, Some(1.0)), (151L, Some(2.0)), (200L, Some(2.0))))
    val tie = AsOfJoin.nearest(
        Seq((1L, 150L)).toDF("k", "t"), r, Seq("k"), "t", "qt",
        Seq("v" -> "v"))
      .collect().map(x => Option(x.get(2))).toSeq
    // 150 is 60 from both 90 and 210: backward wins, pandas-style
    assert(tie == Seq(Some(1.0)))
  }

  test("nearest tolerance drops candidates beyond the distance bound") {
    import spark.implicits._
    val l = Seq((1L, 100L), (1L, 200L)).toDF("k", "t")
    val r = Seq((1L, 90L, 1.0), (1L, 210L, 2.0)).toDF("k", "qt", "v")
    val got = AsOfJoin.nearest(l, r, Seq("k"), "t", "qt", Seq("v" -> "v"),
        tolerance = Some(5L))
      .orderBy("t").collect().map(x => Option(x.get(2))).toSeq
    assert(got == Seq(None, None))
  }
}
