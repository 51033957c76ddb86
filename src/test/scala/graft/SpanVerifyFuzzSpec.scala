package graft

import scala.util.Random

import graft.operators.Dedup

/** Differential fuzz for the collision-verified span operators.
  *
  * Gold model: an independent plain-Scala computation of exact
  * duplicated spans keyed on the span TEXT itself (the semantics the
  * verified operators claim). The fuzz runs the operators at hash
  * width 1 — sixteen buckets, so hash collisions are RAMPANT and the
  * verification join does all the work — and asserts the outputs
  * equal the gold model on every corpus. The unverified forms at the
  * production 48-bit key are asserted equal to the same gold model
  * (collisions are absent at 2^-48 on these corpora), pinning the
  * chain gold == verified@4bit == unverified@48bit.
  *
  * Corpora draw from a 6-word vocabulary over 6-12 docs of 0-20
  * words, so natural cross-doc and within-doc duplicate spans are
  * dense; occasional double spaces and mixed case exercise the
  * words() normalization (split of trim(lower(text)) on \s+).
  */
class SpanVerifyFuzzSpec extends SparkSpec {

  import spark.implicits._

  private val SpanLen = 4

  private def gold(docs: Seq[(Long, String)])
      : (Map[Long, (Long, Long)], Map[Long, String]) = {
    val words: Map[Long, Vector[String]] = docs.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").toVector
    }.toMap
    val spanTexts: Seq[(Long, Int, String)] = words.toSeq.flatMap {
      case (id, w) =>
        (0 to w.length - SpanLen).map(p =>
          (id, p, w.slice(p, p + SpanLen).mkString(" ")))
    }
    val occ: Map[String, Int] =
      spanTexts.groupBy(_._3).view.mapValues(_.size).toMap
    val dupStarts: Map[Long, Seq[Int]] = spanTexts
      .filter(s => occ(s._3) > 1)
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val stats = words.map { case (id, w) =>
      val nSpans = math.max(0, w.length - SpanLen + 1).toLong
      id -> (nSpans, dupStarts.getOrElse(id, Nil).size.toLong)
    }
    val removed = words.map { case (id, w) =>
      val st = dupStarts.getOrElse(id, Nil)
      val kept = w.zipWithIndex.collect {
        case (wd, i) if !st.exists(p => p <= i && i < p + SpanLen) => wd
      }
      id -> kept.mkString(" ")
    }
    (stats, removed)
  }

  test("verified@4bit == gold text-keyed semantics == unverified@48bit, " +
    "40 random heavily-duplicated corpora") {
    val rnd = new Random(1502)
    val vocab = Vector("ga", "gb", "gc", "gd", "ge", "gf")
    (1 to 40).foreach { trial =>
      val nDocs = 6 + rnd.nextInt(7)
      val docs: Seq[(Long, String)] = (0 until nDocs).map { i =>
        val n = rnd.nextInt(21)
        val ws = Vector.fill(n)(vocab(rnd.nextInt(vocab.length)))
        // exercise normalization: occasional double space / upper case
        val t = ws.map(w => if (rnd.nextInt(8) == 0) w.toUpperCase else w)
          .mkString(if (rnd.nextInt(5) == 0) "  " else " ")
        (i.toLong, t)
      }
      val df = docs.toDF("doc_id", "text")
      val (gStats, gClean) = gold(docs)

      def statsOf(d: org.apache.spark.sql.DataFrame) = d.collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      def cleanOf(d: org.apache.spark.sql.DataFrame) = d.collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap

      val v = statsOf(Dedup.dupSpanStatsVerifiedHashed(
        df, "doc_id", "text", SpanLen, 1))
      assert(v == gStats, s"trial $trial verified stats != gold:\n$v\n$gStats")
      val u = statsOf(Dedup.dupSpanStats(df, "doc_id", "text", SpanLen))
      assert(u == gStats, s"trial $trial unverified@48 stats != gold")

      val vc = cleanOf(Dedup.dupSpanRemoveVerifiedHashed(
        df, "doc_id", "text", SpanLen, 1))
      assert(vc == gClean, s"trial $trial verified remove != gold:\n$vc\n$gClean")
      val uc = cleanOf(Dedup.dupSpanRemove(df, "doc_id", "text", SpanLen))
      assert(uc == gClean, s"trial $trial unverified@48 remove != gold")
    }
  }
}
