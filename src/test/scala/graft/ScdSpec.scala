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

  test("scd2 and mergeLatest match brute force on random change logs") {
    import spark.implicits._
    val rng = new scala.util.Random(20260815)
    for (round <- 0 until 6) {
      val log = Seq.fill(30 + rng.nextInt(30))(
        (1L + rng.nextInt(4), rng.nextLong(20), rng.nextLong(1000),
          rng.nextInt(3).toString, rng.nextInt(8) == 0))
        // unique tiebreak ids
        .zipWithIndex.map { case ((k, t, _, v, del), id) =>
          (k, t, id.toLong, v, del) }
      val df = log.toDF("k", "t", "id", "v", "del")

      // brute SCD2
      val wantScd = log.groupBy(_._1).toSeq.flatMap { case (k, rows) =>
        val ordered = rows.sortBy(r => (r._2, r._3))
        val surv = ordered.foldLeft(Vector.empty[(Long, Long, String)]) {
          case (acc, (_, t, id, v, _)) =>
            if (acc.nonEmpty && acc.last._3 == v) acc
            else acc :+ ((t, id, v))
        }
        surv.zipWithIndex.map { case ((t, _, v), i) =>
          val to = if (i + 1 < surv.length) Some(surv(i + 1)._1) else None
          (k, v, t, to, if (to.isEmpty) 1 else 0)
        }
      }.toSet
      val gotScd = Scd.scd2(df, "k", "t", "id", "v").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]), r.getInt(4))).toSet
      assert(gotScd == wantScd, s"scd2 round=$round")

      // brute mergeLatest
      val wantMerge = log.groupBy(_._1).toSeq.flatMap { case (k, rows) =>
        val last = rows.maxBy(r => (r._2, r._3))
        if (last._5) None else Some((k, last._2, last._4))
      }.toSet
      val gotMerge = Scd.mergeLatest(df, "k", "t", "id", "del",
          Seq("t", "v")).collect().map(r =>
          (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(gotMerge == wantMerge, s"merge round=$round")
    }
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
