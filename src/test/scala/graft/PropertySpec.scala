package graft

import scala.util.Random
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.operators.{Flatten, FlattenJoin, NameResolution, NameStrategy}

/** Property tests (SURVEY.md §5 plan) over seeded random cases:
  * flatten row counts follow the list-length algebra; name
  * resolution is total and unique on distinct paths.
  */
class PropertySpec extends SparkSpec {

  private def randomLists(rng: Random): List[Option[List[Double]]] =
    List.fill(8)(
      if (rng.nextDouble() < 0.25) None
      else Some(List.fill(rng.nextInt(6))(rng.nextDouble() * 20 - 10)))

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("xs", ArrayType(DoubleType))))

  private def toDf(rows: List[Option[List[Double]]]) = {
    val data = rows.zipWithIndex.map { case (xs, i) => Row(i, xs.map(_.toSeq).orNull) }
    spark.createDataFrame(spark.sparkContext.parallelize(data, 2), schema)
  }

  test("flatten row count = sum of non-null list lengths (inner)") {
    val rng = new Random(42)
    (1 to 20).foreach { _ =>
      val rows = randomLists(rng)
      assert(Flatten.flatten(toDf(rows)).count() ==
        rows.flatMap(_.toList).map(_.size).sum)
    }
  }

  test("outer flatten row count = inner + null-or-empty parents") {
    val rng = new Random(7)
    (1 to 20).foreach { _ =>
      val rows = randomLists(rng)
      val outer = Flatten.flatten(toDf(rows), join = FlattenJoin.Outer)
      val emptyish = rows.count(r => r.isEmpty || r.exists(_.isEmpty))
      assert(outer.count() == rows.flatMap(_.toList).map(_.size).sum + emptyish)
    }
  }

  private def randomPath(rng: Random): List[String] =
    List.fill(1 + rng.nextInt(4))(Seq("a", "b", "c", "d", "x")(rng.nextInt(5)))

  test("ConcatenateAlways yields unique names for distinct paths") {
    val rng = new Random(11)
    (1 to 200).foreach { _ =>
      val paths = List.fill(6)(randomPath(rng)).distinct
      val resolved = NameResolution.columnNames(NameStrategy.ConcatenateAlways, paths)
      assert(resolved.size == resolved.distinct.size)
    }
  }

  test("conflict strategies agree with ConcatenateAlways on singleton paths") {
    val rng = new Random(13)
    (1 to 100).foreach { _ =>
      val paths = List.fill(5)(Seq("a", "b", "c", "d", "x")(rng.nextInt(5)))
        .distinct.map(List(_))
      val a = NameResolution.columnNames(NameStrategy.ConcatenateConflicts, paths)
      val b = NameResolution.columnNames(NameStrategy.ConcatenateAlways, paths)
      assert(a == b)
    }
  }

  test("bucketed range join equals naive theta join on random intervals") {
    import org.apache.spark.sql.functions.{col, expr}
    val rng = new Random(23)
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    (1 to 5).foreach { _ =>
      // random points over ~40 days; random intervals 0-10 days long
      val pts = (0 until 200).map { i =>
        Row(i, new java.sql.Timestamp(base + (rng.nextDouble() * 40 * 86400000L).toLong))
      }
      val ivs = (0 until 30).map { i =>
        val s = base + (rng.nextDouble() * 35 * 86400000L).toLong
        val e = s + (rng.nextDouble() * 10 * 86400000L).toLong
        Row(i, new java.sql.Timestamp(s), new java.sql.Timestamp(e))
      }
      val ptDf = spark.createDataFrame(
        spark.sparkContext.parallelize(pts, 3),
        StructType(Seq(StructField("pid", IntegerType),
          StructField("ts", TimestampType))))
      val ivDf = spark.createDataFrame(
        spark.sparkContext.parallelize(ivs, 2),
        StructType(Seq(StructField("iid", IntegerType),
          StructField("s", TimestampType), StructField("e", TimestampType))))
      val bucketed = graft.operators.RangeJoin
        .pointInInterval(ptDf, ivDf, "ts", "s", "e")
        .select("pid", "iid").collect().map(_.toSeq).toSet
      val naive = ptDf.join(ivDf, col("ts") >= col("s") && col("ts") < col("e"))
        .select("pid", "iid").collect().map(_.toSeq).toSet
      assert(bucketed == naive)
    }
  }

  test("resolution never invents segments and stays unique when it returns") {
    val rng = new Random(17)
    (1 to 200).foreach { _ =>
      val paths = List.fill(5)(randomPath(rng)).distinct
      try {
        val resolved = NameResolution.columnNames(
          NameStrategy.ConcatenateConflicts, paths)
        assert(resolved.size == resolved.distinct.size)
        resolved.zip(paths).foreach { case (name, path) =>
          assert(name.split('_').forall(path.contains(_)))
        }
      } catch {
        // degenerate conflicts (exhausted differentiating segments)
        // legally throw per the reference (nodes.py:195-197)
        case _: IllegalArgumentException => ()
      }
    }
  }

  test("nest then flatten is the identity on random flat tables") {
    import spark.implicits._
    val rng = new Random(23)
    (1 to 5).foreach { _ =>
      val rows = List.fill(60)(
        (rng.nextInt(8).toLong, rng.nextInt(1000), rng.nextInt(50) / 2.0))
      val flat = rows.toDF("k", "line", "qty").repartition(3)
      val back = Flatten.flatten(
          graft.operators.Nest.nest(flat, Seq("k"), Seq("line", "qty"),
            "items", sortBy = Seq("line")))
        .as[(Long, Int, Double)].collect().toList
      // multiset equality: nest/flatten must not drop or duplicate rows
      assert(back.groupBy(identity).view.mapValues(_.size).toMap ==
        rows.groupBy(identity).view.mapValues(_.size).toMap)
    }
  }

  test("TopK.perKey equals the rank window on random data and k") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rng = new Random(31)
    (1 to 5).foreach { _ =>
      val k = 1 + rng.nextInt(7)
      val rows = List.fill(400)(
        (rng.nextInt(6).toLong, rng.nextInt(10000).toLong,
          // coarse grid forces 6-dp ties
          rng.nextInt(40) / 8.0))
      val df = rows.toDF("key", "id", "score").repartition(4)
      val got = graft.operators.TopK.perKey(df, "key", "id", "score", k)
        .orderBy("key", "rank").collect().toSeq
      val w = Window.partitionBy(col("key"))
        .orderBy(round(col("score"), 6).desc, col("id").asc)
      val want = df.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= k)
        .select(col("key"), col("id"), round(col("score"), 4).as("score"),
          col("rank"))
        .orderBy("key", "rank").collect().toSeq
      assert(got == want, s"k=$k")
    }
  }

  test("chunking covers every token, bounds every window, never emits a suffix-duplicate") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rng = new Random(58)
    val winSize = 50
    val stride = 25
    // doc lengths straddle every boundary case: < stride, == winSize,
    // winSize+1, multiples of stride, and long tails
    val lens = List(1, 24, 25, 26, 49, 50, 51, 74, 75, 76, 100, 101, 137) ++
      List.fill(7)(1 + rng.nextInt(300))
    val docs = lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, (1 to n).map(t => s"t$t").mkString(" "))
    }.toDF("doc_id", "text")
    // drive the REAL registered query: Tables reads $dir/documents.parquet
    val dir = java.nio.file.Files.createTempDirectory("graft_chunk_prop").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.queries.TextQueries.queries("text_chunk")(spark, dir)
      .collect().groupBy(_.getLong(0))
    lens.zipWithIndex.foreach { case (n, i) =>
      val rows = out(i.toLong).sortBy(_.getLong(1))
      val sizes = rows.map(_.getLong(2))
      // chunk ids dense from 0; every window non-empty and bounded
      assert(rows.map(_.getLong(1)).toSeq == rows.indices.map(_.toLong), s"n=$n")
      assert(sizes.forall(s => s >= 1 && s <= winSize), s"n=$n")
      // window count: the last window is the first to reach the end —
      // never a fully-contained duplicate suffix
      val wantChunks = math.max(1,
        math.ceil(math.max(n - winSize, 0) / stride.toDouble).toInt + 1)
      assert(rows.length == wantChunks, s"n=$n got=${rows.length}")
      // the closed-form token total q_curate_e2e uses in place of the
      // explode: sum over windows of min(winSize, n - j*stride)
      assert(sizes.sum ==
        (0 until wantChunks).map(j => math.min(winSize, n - j * stride)).sum,
        s"n=$n closed-form sum mismatch")
      // coverage: total distinct tokens = n means starts + sizes span
      // the doc (start of chunk j is j*stride, its size reaches at
      // least min(n, j*stride + winSize))
      val covered = rows.zipWithIndex.map { case (r, j) =>
        (j * stride + 1) to (j * stride + r.getLong(2).toInt)
      }.flatten.toSet
      assert(covered == (1 to n).toSet, s"n=$n coverage gap")
    }
  }

  test("RRF fusion: list-order invariant, equals the brute-force recomputation") {
    import spark.implicits._
    val rng = new Random(11)
    (1 to 10).foreach { _ =>
      // two random top-N lists over a small id space
      def list(): Seq[(Long, Long)] = {
        val ids = rng.shuffle((0L until 20L).toList).take(1 + rng.nextInt(10))
        ids.zipWithIndex.map { case (id, i) => (id, (i + 1).toLong) }
      }
      val (la, lb) = (list(), list())
      val (a, b) = (la.toDF("doc_id", "rank"), lb.toDF("doc_id", "rank"))
      def run(ls: Seq[org.apache.spark.sql.DataFrame]) =
        graft.operators.Retrieval
          .rrfFuse(ls, "doc_id", "rank", kRrf = 60, topK = 100)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val ab = run(Seq(a, b))
      assert(ab == run(Seq(b, a))) // fusion is symmetric in its lists
      // brute-force recomputation: integer division contributions
      val expected = (la ++ lb).groupBy(_._1).map { case (id, rs) =>
        (id, rs.size.toLong, rs.map(r => 1000000L / (60L + r._2)).sum)
      }.toSeq.sortBy(t => (-t._3, t._1))
      assert(ab == expected, s"la=$la lb=$lb")
    }
  }
}
