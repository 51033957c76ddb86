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
}
