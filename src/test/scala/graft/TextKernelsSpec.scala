package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftglue.Bridge
import org.apache.spark.sql.catalyst.expressions.{Alias, BoundReference}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.{BucketWeightSum, Hash48Array, ShinglesOfWords, WinnowMins, WordCountOf, WordsOf}

/** Optimization-round 16 kernels: each codegen'd expression replaced
  * an interpreted higher-order-function form on a hot scan path, and
  * this suite pins the kernel VALUE-IDENTICAL to that exact HOF form
  * (reconstructed inline the way the operators used to build it) on
  * adversarial inputs — unicode, empties, nulls, null elements —
  * plus force-compiles the generated code so a codegen regression
  * can't hide behind interpreted fallback.
  */
class TextKernelsSpec extends SparkSpec {
  import spark.implicits._

  // ---- the OLD interpreted forms, verbatim from the pre-round code ----

  private def oldShingles(w: Column, n: Int): Column =
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n),
        i => concat_ws(" ", (0 until n).map(j => element_at(w, i + j + 1)): _*)))
      .otherwise(array().cast("array<string>"))

  private def oldHashes(arr: Column, hexDigits: Int): Column =
    transform(arr,
      s => conv(substring(md5(s), 1, hexDigits), 16, 10).cast("long"))

  private def oldWinnow(hashArr: Column, w: Int): Column =
    when(size(hashArr) === 0, array().cast("array<bigint>"))
      .otherwise(transform(
        sequence(lit(0), greatest(size(hashArr) - w, lit(0))),
        p => array_min(slice(hashArr, p + 1, lit(w)))))

  private def oldBucketSum(wordsCol: Column, weights: Seq[Long]): Column = {
    val wLit = typedlit(weights)
    val bucket = (c: Column) =>
      (conv(substring(md5(c.cast("string")), 1, 12), 16, 10).cast("long")
        % weights.length).cast("int")
    aggregate(wordsCol, lit(0L),
      (acc, wd) => acc + element_at(wLit, bucket(wd) + 1))
  }

  private def newShingles(w: Column, n: Int): Column =
    coalesce(Bridge.column(ShinglesOfWords(Bridge.expression(w), n)),
      array().cast("array<string>"))

  // word corpus with the nasty cases: unicode, empty strings,
  // whitespace, repeats, long tokens
  private val vocab = Seq("the", "a", "été", "naive",
    "", " ", "x" * 40, "word", "中文", "tok;en")

  private def randWords(seed: Int): Seq[Seq[String]] = {
    val rnd = new scala.util.Random(seed)
    (0 until 60).map { _ =>
      (0 until rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.length)))
    }
  }

  test("ShinglesOfWords == the interpreted transform/concat_ws form") {
    for (n <- Seq(1, 2, 3, 5)) {
      val df = randWords(17 * n).toDF("w")
      val got = df.select(
        newShingles(col("w"), n).as("k"),
        oldShingles(col("w"), n).as("h")).collect()
      got.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"n=$n row=$r")
      }
    }
  }

  test("ShinglesOfWords: null array and null-element word (concat_ws skip)") {
    val df = spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row(null),
        org.apache.spark.sql.Row(Seq("a", null, "b", "c"))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("w",
          ArrayType(StringType, containsNull = true)))))
    val got = df.select(newShingles(col("w"), 2).as("k"),
      oldShingles(col("w"), 2).as("h")).collect()
    got.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1), r))
    // the null word is SKIPPED by the join, not nulling the shingle
    assert(got(1).getSeq[String](0) == Seq("a", "b", "b c"))
  }

  test("Hash48Array == the interpreted conv(substring(md5)) form") {
    for (d <- Seq(1, 4, 12)) {
      val df = randWords(23 * d).toDF("w")
      val got = df.select(
        Bridge.column(Hash48Array(Bridge.expression(col("w")), d)).as("k"),
        oldHashes(col("w"), d).as("h")).collect()
      got.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"d=$d row=$r")
      }
    }
  }

  test("WinnowMins == the interpreted transform/slice/array_min form") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 80).map(_ =>
      (0 until rnd.nextInt(15)).map(_ => rnd.nextLong() & 0xffffffffffffL))
    for (w <- Seq(1, 3, 4, 7)) {
      val df = rows.toDF("h")
      val got = df.select(
        Bridge.column(WinnowMins(Bridge.expression(col("h")), w)).as("k"),
        oldWinnow(col("h"), w).as("o")).collect()
      got.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"w=$w row=$r")
      }
    }
  }

  test("BucketWeightSum == the interpreted aggregate fold") {
    val rnd = new scala.util.Random(11)
    for (b <- Seq(7, 4096)) {
      val weights = IndexedSeq.fill(b)(rnd.nextLong() % 1000)
      val df = randWords(100 + b).toDF("w")
      val got = df.select(
        Bridge.column(BucketWeightSum(Bridge.expression(col("w")), weights))
          .as("k"),
        oldBucketSum(col("w"), weights).as("o")).collect()
      got.foreach { r =>
        assert(r.getLong(0) == r.getLong(1), s"b=$b row=$r")
      }
    }
  }

  test("BucketWeightSum: null element nulls the sum (the fold contract)") {
    val df = spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row(Seq("a", null, "b")),
        org.apache.spark.sql.Row(null)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("w",
          ArrayType(StringType, containsNull = true)))))
    val weights = IndexedSeq.fill(16)(3L)
    val got = df.select(
      Bridge.column(BucketWeightSum(Bridge.expression(col("w")), weights))
        .as("k"),
      oldBucketSum(col("w"), weights).as("o")).collect()
    got.foreach { r => assert(r.isNullAt(0) && r.isNullAt(1), r) }
  }

  // ---- round-17 tokenizer kernels: the exact forms they replace ----

  private def oldWords(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  /** Whitespace-adversarial corpus: every Java \s char in runs,
    * leading/trailing (trim removes only 0x20), unicode incl. a char
    * whose FULL lowercase mapping grows (İ → i+U+0307), empties. */
  private val textCases: Seq[String] = Seq(
    null, "", " ", "  ", "\t", "\n\n", "", "\f\r", " \t ",
    "a", "A b", "a  b\tc", "\ta b\n", "  leading", "trailing  ",
    "\t\tx\t\t", "MiXeD CaSe WORDS", "中文 分词 测试", "İstanbul İ I ı",
    "été NAÏVE Ægir", "a b", "word " * 40 + "\tend",
    "\r\nab\fc\rd e\tf\ng", "ﬁ ﬂ ﬀ", "ΣΙΣΥΦΟΣ σίσυφος")

  test("WordsOf == split(trim(lower(text)), \\s+) on adversarial inputs") {
    val df = spark.createDataFrame(
      java.util.List.copyOf(scala.jdk.CollectionConverters
        .SeqHasAsJava(textCases.map(org.apache.spark.sql.Row(_))).asJava),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("t",
          org.apache.spark.sql.types.StringType, nullable = true))))
    val got = df.select(
      Bridge.column(WordsOf(Bridge.expression(col("t")))).as("k"),
      oldWords(col("t")).as("o")).collect()
    got.zip(textCases).foreach { case (r, in) =>
      if (r.isNullAt(1)) assert(r.isNullAt(0), s"input='$in'")
      else assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"input='$in': ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
    }
  }

  test("WordCountOf == size(split(trim(lower(text)), \\s+)) incl. null " +
       "under the session's size(null) semantics") {
    val df = spark.createDataFrame(
      java.util.List.copyOf(scala.jdk.CollectionConverters
        .SeqHasAsJava(textCases.map(org.apache.spark.sql.Row(_))).asJava),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("t",
          org.apache.spark.sql.types.StringType, nullable = true))))
    val got = df.select(
      Bridge.column(WordCountOf(Bridge.expression(col("t")))).as("k"),
      size(oldWords(col("t"))).as("o"),
      // tokenCount's no-lower twin: the count must be lower-invariant
      size(split(trim(col("t")), "\\s+")).as("o2")).collect()
    got.zip(textCases).foreach { case (r, in) =>
      if (r.isNullAt(1)) assert(r.isNullAt(0), s"input='$in'")
      else {
        assert(r.getInt(0) == r.getInt(1), s"input='$in'")
        assert(r.getInt(0) == r.getInt(2), s"lower-invariance: input='$in'")
      }
    }
  }

  // ---- round-17 audio feature kernel: the exact HOF forms it replaces ----

  test("AudioFeats == the interpreted max/sum/zero-cross folds") {
    import graft.plans.AudioFeats
    val rnd = new scala.util.Random(31)
    val n = 16
    // PCM16-domain arrays of >= n elements, incl. zeros, sign runs,
    // null elements, and a NULL array (the (null, null, 0) case)
    val rows: Seq[Seq[Integer]] =
      Seq(
        Seq.fill(n)(Integer.valueOf(0)),
        (0 until n).map(i => Integer.valueOf(if (i % 2 == 0) 32767 else -32768)),
        (0 until n + 5).map(_ => Integer.valueOf(rnd.nextInt(65536) - 32768)),
        (0 until n).map(i =>
          if (i == 3 || i == 9) null
          else Integer.valueOf(rnd.nextInt(65536) - 32768)),
        null) ++
        (0 until 40).map(_ => (0 until n + rnd.nextInt(8)).map(_ =>
          Integer.valueOf(rnd.nextInt(65536) - 32768)))
    val df = spark.createDataFrame(
      java.util.List.copyOf(scala.jdk.CollectionConverters
        .SeqHasAsJava(rows.map(r =>
          org.apache.spark.sql.Row(if (r == null) null else r))).asJava),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("d",
          ArrayType(org.apache.spark.sql.types.IntegerType,
            containsNull = true)))))
    val k = Bridge.column(AudioFeats(Bridge.expression(col("d")), n))
    val got = df.select(
      k.getField("max_abs").as("k_max"),
      k.getField("sum_abs").as("k_sum"),
      k.getField("zero_cross").as("k_zc"),
      array_max(transform(col("d"), x => abs(x))).cast("long").as("o_max"),
      aggregate(col("d"), lit(0L), (acc, x) => acc + abs(x)).as("o_sum"),
      aggregate(sequence(lit(1), lit(n - 1)), lit(0L), (acc, i) =>
        acc + when(element_at(col("d"), i) *
          element_at(col("d"), i + 1) < 0, 1L).otherwise(0L)).as("o_zc"))
      .collect()
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.isNullAt(0) == r.isNullAt(3) &&
        (r.isNullAt(0) || r.getLong(0) == r.getLong(3)), s"max row $i: $r")
      assert(r.isNullAt(1) == r.isNullAt(4) &&
        (r.isNullAt(1) || r.getLong(1) == r.getLong(4)), s"sum row $i: $r")
      assert(r.getLong(2) == r.getLong(5), s"zc row $i: $r")
    }
  }

  test("generated code force-compiles and agrees with eval") {
    val arrRef = BoundReference(0, ArrayType(StringType), nullable = true)
    val hashRef = BoundReference(0, ArrayType(LongType), nullable = true)
    def row(ws: Seq[String]): InternalRow = InternalRow(
      ArrayData.toArrayData(ws.toArray.map(UTF8String.fromString)))
    def hrow(hs: Seq[Long]): InternalRow =
      InternalRow(ArrayData.toArrayData(hs.toArray))

    val sh = ShinglesOfWords(arrRef, 3)
    val h48 = Hash48Array(arrRef, 12)
    val bws = BucketWeightSum(arrRef, IndexedSeq(5L, -2L, 9L, 0L))
    val wm = WinnowMins(hashRef, 4)
    val strRef = BoundReference(0, StringType, nullable = true)
    val wo = WordsOf(strRef)
    val wc = WordCountOf(strRef)
    val pTok = GenerateUnsafeProjection.generate(Seq(
      Alias(wo, "w")(), Alias(wc, "c")()))
    val trow = InternalRow(UTF8String.fromString("\tA b  C\n"))
    val tout = pTok.apply(trow)
    assert(tout.getArray(0).toSeq[UTF8String](StringType) ==
      wo.eval(trow).asInstanceOf[ArrayData].toSeq[UTF8String](StringType))
    assert(tout.getInt(1) == wc.eval(trow).asInstanceOf[Int])
    // leading-\t and trailing-\n empty tokens + a, b, c (trim strips
    // only 0x20; Pattern.split(-1) keeps both boundary empties)
    assert(tout.getInt(1) == 5)

    // GenerateUnsafeProjection force-compiles doGenCode — a janino
    // error throws here instead of silently falling back
    val pStr = GenerateUnsafeProjection.generate(Seq(
      Alias(sh, "a")(), Alias(h48, "b")(), Alias(bws, "c")()))
    val r = row(Seq("a", "b", "c", "d"))
    val out = pStr.apply(r)
    assert(out.getArray(0).numElements() == 2)
    assert(out.getArray(1).numElements() == 4)
    assert(!out.isNullAt(2))
    // eval parity
    assert(out.getArray(0).toSeq[UTF8String](StringType) ==
      sh.eval(r).asInstanceOf[ArrayData].toSeq[UTF8String](StringType))
    assert(out.getArray(1).toSeq[Long](LongType) ==
      h48.eval(r).asInstanceOf[ArrayData].toSeq[Long](LongType))
    assert(out.getLong(2) == bws.eval(r).asInstanceOf[Long])

    val pW = GenerateUnsafeProjection.generate(Seq(Alias(wm, "m")()))
    val hr = hrow(Seq(9L, 3L, 7L, 1L, 8L, 2L))
    assert(pW.apply(hr).getArray(0).toSeq[Long](LongType) ==
      wm.eval(hr).asInstanceOf[ArrayData].toSeq[Long](LongType))
  }
}
