package graft

import scala.util.Random
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.plans.GearCdc
import graft.operators.Dedup

/** The Gear rolling-hash CDC kernel: rolling == windowed (the
  * identity the DuckDB oracle replay rests on), boundary-set
  * structure, edit locality, chunk partition, and duplicate
  * detection on planted documents.
  */
class GearCdcSpec extends SparkSpec {

  private val MinPos = 16
  private val MaskBits = 4

  /** Independent slow-form reference: per position i, the windowed
    * low-bits sum over the last MaskBits code points — the exact
    * arithmetic the DuckDB oracle runs, reimplemented here without
    * any rolling state. */
  private def windowedBoundaries(s: String): Seq[Int] = {
    val cps = s.codePoints().toArray
    val mod = 1L << MaskBits
    val internal = (MinPos to cps.length - 1).filter { i =>
      val sum = (0 until MaskBits).map { j =>
        (1L << j) * (GearCdc.TABLE(cps(i - 1 - j) & 0xFF) & (mod - 1))
      }.sum
      sum % mod == 0
    }
    internal :+ cps.length
  }

  private def kernelBoundaries(s: String): Seq[Int] =
    GearCdc.boundaries(UTF8String.fromString(s), MinPos, MaskBits)
      .toIntArray().toSeq

  private def randomDoc(rng: Random, n: Int): String = {
    // whole code points only (indexing chars could split 😀 into a
    // lone surrogate, which UTF-8 cannot represent — not a valid doc)
    val alphabet = "abcdefghij XYZ.,é中".map(_.toString) :+ "😀"
    (0 until n).map(_ => alphabet(rng.nextInt(alphabet.size))).mkString
  }

  test("rolling kernel == windowed low-bits reference (property)") {
    val rng = new Random(1234)
    (1 to 200).foreach { _ =>
      val doc = randomDoc(rng, 1 + rng.nextInt(400))
      assert(kernelBoundaries(doc) == windowedBoundaries(doc), s"doc=$doc")
    }
  }

  test("boundaries are strictly increasing, internal in [minPos, len-1], last == len") {
    val rng = new Random(99)
    (1 to 100).foreach { _ =>
      val doc = randomDoc(rng, 1 + rng.nextInt(300))
      val b = kernelBoundaries(doc)
      val len = doc.codePointCount(0, doc.length)
      assert(b.last == len)
      assert(b == b.sorted && b.distinct == b)
      assert(b.init.forall(p => p >= MinPos && p <= len - 1))
    }
  }

  test("edit locality: inserting a char re-chunks only its neighborhood") {
    val rng = new Random(5)
    (1 to 50).foreach { _ =>
      val doc = randomDoc(rng, 120 + rng.nextInt(200))
      val pos = 20 + rng.nextInt(40) // char-index insertion point (ASCII-safe region not needed; we insert at a code-point boundary)
      val cpIdx = doc.offsetByCodePoints(0, math.min(pos, doc.codePointCount(0, doc.length)))
      val edited = doc.substring(0, cpIdx) + "Q" + doc.substring(cpIdx)
      val before = kernelBoundaries(doc)
      val after = kernelBoundaries(edited)
      // every boundary far past the edit survives, shifted by exactly
      // one position: the low-bits window is MaskBits wide, so any
      // position > pos + MaskBits sees an identical window
      val cut = pos + MaskBits + 1
      assert(before.filter(_ >= cut).map(_ + 1).toSet
        .subsetOf(after.toSet))
      // and every boundary strictly before the edit survives unmoved
      assert(before.filter(_ < pos).toSet.subsetOf(after.toSet))
    }
  }

  test("kernel column matches a per-position SQL replica on the documents fixture") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text").as("__t"))
      .filter(length(col("__t")) >= 1)
      // ascii() below is only well-defined on single-byte chars; the
      // unicode contract is pinned by the plain-Scala property test
      .filter(col("__t").rlike("^[\\x01-\\x7F]*$"))
      .limit(200)
    val mod = 1L << MaskBits
    // the windowed form as a Spark SQL expression over an inlined
    // low-bits gear array — the same shape the DuckDB oracle runs
    val g = GearCdc.TABLE.map(_ & (mod - 1)).mkString("array(", ",", ")")
    val terms = (0 until MaskBits).map { j =>
      val idx = if (j == 0) "i" else s"i - $j"
      s"${1L << j} * element_at($g, (ascii(substring(__t, $idx, 1)) % 256) + 1)"
    }.mkString(" + ")
    val sqlForm = docs.withColumn("__b", expr(
      s"""concat(
         |  CASE WHEN length(__t) >= ${MinPos + 1}
         |       THEN filter(sequence($MinPos, length(__t) - 1),
         |              i -> ($terms) % $mod = 0)
         |       ELSE array() END,
         |  array(length(__t)))""".stripMargin))
    val kernelForm = docs.withColumn("__b",
      GearCdc.boundariesCol(col("__t"), MinPos, MaskBits))
    val a = sqlForm.select("doc_id", "__b").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val b = kernelForm.select("doc_id", "__b").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (id, bs) => assert(b(id) == bs, s"doc_id=$id") }
  }

  test("gear chunks partition the document: remove on unique docs is identity") {
    import spark.implicits._
    val docs = (0 until 40)
      .map(i => (i.toLong, s"unique document number $i " + ("x" * i) +
        s" content that shares no sixteen-char chunk with any sibling $i"))
      .toDF("doc_id", "text")
    val out = Dedup.cdcChunkRemoveGear(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    val in = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    in.foreach { case (id, t) =>
      val (clean, nChunks, nKept) = out(id)
      assert(clean == t, s"doc $id was not reassembled to its original text")
      assert(nChunks == nKept)
    }
  }

  test("planted duplicate chunk is detected by the stats half") {
    import spark.implicits._
    val shared = "this long boilerplate wrapper sentence appears in every copy of the page " * 3
    val docs = Seq(
      (1L, "prefix one " + shared + " suffix alpha"),
      (2L, "prefix two " + shared + " suffix beta"),
      (3L, "a wholly unrelated document about something else entirely with no overlap"))
      .toDF("doc_id", "text")
    val stats = Dedup.cdcChunkStatsGear(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(stats(1L) > 0 && stats(2L) > 0,
      s"shared chunk not detected: $stats")
    assert(stats(3L) == 0)
  }

  test("binary kernel == windowed reference over random byte arrays") {
    val rng = new Random(77)
    val mod = 1L << MaskBits
    (1 to 200).foreach { _ =>
      val bytes = Array.fill(1 + rng.nextInt(400))(rng.nextInt(256).toByte)
      val got = GearCdc.binaryBoundaries(bytes, MinPos, MaskBits)
        .toIntArray().toSeq
      val internal = (MinPos to bytes.length - 1).filter { i =>
        val sum = (0 until MaskBits).map { j =>
          (1L << j) * (GearCdc.TABLE(bytes(i - 1 - j) & 0xFF) & (mod - 1))
        }.sum
        sum % mod == 0
      }
      assert(got == internal :+ bytes.length)
    }
  }

  test("binary and text kernels coincide on pure-ASCII input") {
    val rng = new Random(3)
    (1 to 100).foreach { _ =>
      val doc = (0 until 1 + rng.nextInt(300))
        .map(_ => ('a' + rng.nextInt(26)).toChar).mkString
      assert(GearCdc.binaryBoundaries(doc.getBytes("UTF-8"), MinPos, MaskBits)
        .toIntArray().toSeq == kernelBoundaries(doc))
    }
  }

  test("binary CDC stats detect a planted duplicated byte run") {
    import spark.implicits._
    val shared = Array.tabulate(120)(i => (i * 37 + 5).toByte)
    def payload(prefix: Byte*) = prefix.toArray ++ shared ++ prefix.toArray
    val docs = Seq(
      (1L, payload(1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12)),
      (2L, payload(99, 98, 97, 96, 95, 94, 93, 92, 91, 90, 89, 88)),
      (3L, Array.tabulate(150)(i => (i * 101 + 13).toByte)))
      .toDF("doc_id", "payload")
    val stats = Dedup.cdcChunkStatsBinary(docs, "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(stats(1L) > 0 && stats(2L) > 0, s"shared bytes not detected: $stats")
    assert(stats(3L) == 0)
  }

  test("gear boundary expression stays inside whole-stage codegen") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = docs.select(GearCdc.boundariesCol(col("text")))
      .queryExecution.executedPlan.toString
    assert(plan.startsWith("*("), s"no codegen in:\n$plan")
  }
}
