package graft

import graft.operators.AsOfJoin
import scala.util.Random

/** Property check: every as-of direction agrees with an O(n*m)
  * brute-force reference on seeded random keyed logs — including
  * duplicate timestamps, keys missing on either side, and tolerance
  * cuts. Comparison is on the MATCHED TIME (shipped as the payload),
  * so duplicate right values at one (key, time) can't fake a
  * mismatch.
  */
class AsOfPropertySpec extends SparkSpec {

  private def brute(lefts: Seq[(Long, Long)],
                    rights: Seq[(Long, Long)],
                    dir: String, tol: Option[Long])
  : Map[(Long, Long, Int), Option[Long]] =
    lefts.zipWithIndex.map { case ((k, t), i) =>
      val cands = rights.filter(_._1 == k).map(_._2)
      val inTol = (rt: Long) => tol.forall(x => math.abs(rt - t) <= x)
      val pick = dir match {
        case "backward" =>
          val c = cands.filter(rt => rt <= t && inTol(rt))
          if (c.isEmpty) None else Some(c.max)
        case "forward" =>
          val c = cands.filter(rt => rt >= t && inTol(rt))
          if (c.isEmpty) None else Some(c.min)
        case "nearest" =>
          val back = cands.filter(rt => rt <= t && inTol(rt))
            .sorted.lastOption
          val fwd = cands.filter(rt => rt >= t && inTol(rt))
            .sorted.headOption
          (back, fwd) match {
            case (None, f) => f
            case (b, None) => b
            case (Some(b), Some(f)) =>
              if (t - b <= f - t) Some(b) else Some(f) // tie -> backward
          }
      }
      ((k, t, i), pick)
    }.toMap

  private def run(lefts: Seq[(Long, Long)], rights: Seq[(Long, Long)],
                  dir: String, tol: Option[Long])
  : Map[(Long, Long, Int), Option[Long]] = {
    import spark.implicits._
    // row index disambiguates duplicate (k, t) left rows
    val l = lefts.zipWithIndex.map { case ((k, t), i) => (k, t, i) }
      .toDF("k", "t", "i")
    val r = rights.toDF("k", "rt")
    val f = dir match {
      case "backward" => AsOfJoin.backward(l, r, Seq("k"), "t", "rt",
        Seq("rt" -> "mt"), tol)
      case "forward" => AsOfJoin.forward(l, r, Seq("k"), "t", "rt",
        Seq("rt" -> "mt"), tol)
      case "nearest" => AsOfJoin.nearest(l, r, Seq("k"), "t", "rt",
        Seq("rt" -> "mt"), tol)
    }
    f.collect().map { row =>
      ((row.getLong(0), row.getLong(1), row.getInt(2)),
        if (row.isNullAt(3)) None else Some(row.getLong(3)))
    }.toMap
  }

  test("all three directions match brute force on random keyed logs") {
    val rng = new Random(20260815)
    for (round <- 0 until 10) {
      val lefts = Seq.fill(rng.nextInt(26))(
        (1L + rng.nextInt(4), rng.nextLong(51)))
      val rights = Seq.fill(rng.nextInt(26))(
        (1L + rng.nextInt(4), rng.nextLong(51)))
      for (dir <- Seq("backward", "forward", "nearest");
           tol <- Seq(None, Some(7L))) {
        val got = run(lefts, rights, dir, tol)
        val want = brute(lefts, rights, dir, tol)
        assert(got == want,
          s"round=$round dir=$dir tol=$tol lefts=$lefts rights=$rights")
      }
    }
  }

  test("tied (key, time) right payloads resolve deterministically " +
    "across partitionings and directions") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // five right rows ALL at the same (key, time) with distinct
    // payloads: any of them is a semantically valid match, so the
    // xxhash64 tiebreak must make the CHOICE a pure function of the
    // data (backward and forward agree at the exact-tie instant, and
    // shuffling the input cannot move it)
    val l = Seq((1L, 100L)).toDF("k", "t")
    val rRows = Seq.tabulate(5)(i => (1L, 100L, s"payload_$i"))
    def pick(parts: Int, dir: String): String = {
      val r = rRows.toDF("k", "rt", "p").repartition(parts)
      val f = dir match {
        case "backward" => graft.operators.AsOfJoin.backward(
          l, r, Seq("k"), "t", "rt", Seq("p" -> "mp"))
        case "forward" => graft.operators.AsOfJoin.forward(
          l, r, Seq("k"), "t", "rt", Seq("p" -> "mp"))
      }
      f.select(col("mp")).collect().head.getString(0)
    }
    val choices = for (parts <- Seq(1, 3, 8);
                       dir <- Seq("backward", "forward"))
      yield pick(parts, dir)
    assert(choices.distinct.size == 1,
      s"tied-payload choice not deterministic: $choices")
  }
}
