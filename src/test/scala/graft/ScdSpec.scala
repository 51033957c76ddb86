package graft

import graft.operators.Scd

/** SCD2 / CDC-merge semantics on planted change logs: no-op updates
  * collapse, null flips count as changes, intervals chain exactly,
  * latest-wins ties break on the tiebreak column, and a winning
  * delete tombstones the key.
  */
class ScdSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("scd2 collapses no-op updates and chains validity intervals") {
    import spark.implicits._
    val log = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "a"), // no-op update at 20
      (1L, 30L, 3L, "b"), (1L, 40L, 4L, "a"),
      (2L, 15L, 5L, "x")
    ).toDF("k", "t", "id", "v")
    val got = Scd.scd2(log, "k", "t", "id", "v")
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)), r.getInt(4))).toSeq
    assert(got == Seq(
      (1L, "a", 10L, Some(30L), 0),
      (1L, "b", 30L, Some(40L), 0),
      (1L, "a", 40L, None, 1),
      (2L, "x", 15L, None, 1)))
  }

  test("scd2 change detection is null-safe") {
    import spark.implicits._
    val log = Seq(
      (1L, 10L, 1L, Some("a")), (1L, 20L, 2L, None),
      (1L, 30L, 3L, None), (1L, 40L, 4L, Some("a"))
    ).toDF("k", "t", "id", "v")
    val got = Scd.scd2(log, "k", "t", "id", "v")
      .orderBy("valid_from").collect()
      .map(r => (Option(r.get(1)), r.getLong(2))).toSeq
    // a -> null (change), null -> null (collapse), null -> a (change)
    assert(got == Seq(
      (Some("a"), 10L), (None, 20L), (Some("a"), 40L)))
  }

  test("scd2 ties at equal time break on the tiebreak column") {
    import spark.implicits._
    val log = Seq(
      (1L, 10L, 2L, "b"), (1L, 10L, 1L, "a")
    ).toDF("k", "t", "id", "v")
    val got = Scd.scd2(log, "k", "t", "id", "v")
      .orderBy("valid_from", "is_current").collect()
      .map(r => (r.getString(1), r.getInt(4))).toSeq
    // id=1 ("a") precedes id=2 ("b"); both at t=10
    assert(got.map(_._1) == Seq("b", "a") || got.map(_._1) == Seq("a", "b"))
    assert(got.filter(_._2 == 1).map(_._1) == Seq("b"))
  }

  test("mergeLatest: latest wins, delete tombstones, ties on tiebreak") {
    import spark.implicits._
    val log = Seq(
      (1L, 10L, 1L, false, 100.0), (1L, 20L, 2L, false, 200.0),
      (2L, 10L, 3L, false, 300.0), (2L, 30L, 4L, true, 0.0), // deleted
      (3L, 10L, 5L, false, 1.0), (3L, 10L, 6L, false, 2.0) // tie -> id 6
    ).toDF("k", "t", "id", "del", "v")
    val got = Scd.mergeLatest(log, "k", "t", "id", "del", Seq("t", "v"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == Seq((1L, 20L, 200.0), (3L, 10L, 2.0)))
  }
}
