package graft

import org.apache.spark.sql.functions._
import graft.operators.{KMeans, PQ}

/** Product quantization: codebook fit, narrow encode, and ADC search
  * pinned against independently recomputed exact arithmetic.
  */
class PQSpec extends SparkSpec {

  private val SF = "/root/testdata/sf0.001"
  private val DIM = 64
  private val M = 4
  private val K = 8

  private def embeddings = spark.read.parquet(s"$SF/embeddings.parquet")

  private lazy val books = PQ.fit(embeddings, "vec_id", "embedding", DIM, M, K)
  private lazy val codes =
    PQ.encode(embeddings, "vec_id", "embedding", books).collect()

  private def quantized: Map[Long, Seq[Long]] =
    embeddings.select(col("vec_id"), KMeans.quantize(col("embedding")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap

  test("codebooks: m*k centroids of the right dimensionality") {
    assert(books.m == M && books.subDim == DIM / M)
    assert(books.centroids.size == M * K)
    assert(books.centroids.values.forall(_.length == DIM / M))
  }

  test("encode: every code is the exact per-subspace argmin, err is the sum") {
    val q = quantized
    assert(codes.length == q.size)
    for (row <- codes.take(200)) {
      val id = row.getLong(0)
      val v = q(id)
      var expectErr = 0L
      for (j <- 0 until M) {
        val sv = v.slice(j * books.subDim, (j + 1) * books.subDim)
        val dists = (0 until K).map { c =>
          val cent = books.centroids((j, c))
          sv.zip(cent).map { case (a, b) => (a - b) * (a - b) }.sum
        }
        val best = dists.zipWithIndex.min // ties -> smaller code
        assert(row.getInt(1 + j) == best._2, s"vec $id subspace $j")
        expectErr += best._1
      }
      assert(row.getLong(1 + M) == expectErr, s"vec $id err")
    }
  }

  test("adc search: distances equal exact query-to-reconstruction L2") {
    val query = embeddings.orderBy(col("vec_id"))
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val qq = query.map(x => math.floor(x * 1000).toLong)
    val got = PQ.adcTopK(
      PQ.encode(embeddings, "vec_id", "embedding", books),
      "vec_id", books, query, n = 12).collect()
    assert(got.length == 12)
    // expected: for each vector, dist(query, reconstruction(codes))
    val q = quantized
    val codeMap = codes.map(r =>
      r.getLong(0) -> (0 until M).map(j => r.getInt(1 + j))).toMap
    val exact = codeMap.map { case (id, cs) =>
      id -> cs.zipWithIndex.map { case (c, j) =>
        val cent = books.centroids((j, c))
        val qs = qq.slice(j * books.subDim, (j + 1) * books.subDim)
        qs.zip(cent).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sum
    }
    val expect = exact.toSeq.sortBy { case (id, d) => (d, id) }.take(12)
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq == expect)
    // adc distances are monotone non-decreasing in rank
    assert(got.map(_.getLong(1)).toSeq == got.map(_.getLong(1)).toSeq.sorted)
  }

  test("dead init centroid: codes stay original ids, encode and ADC survive") {
    import spark.implicits._
    // ids 1 and 2 share a vector -> centroid 1 never wins an
    // assignment (ties go to the smaller cluster), captures zero
    // points in the update, and drops out of the codebook
    val base = (0 until 8).map(_.toFloat)
    val rows = Seq(
      1L -> base, 2L -> base,
      3L -> base.map(x => x + 5f),
      4L -> base.map(x => 10f - x)) ++
      (5L to 40L).map(i => i -> base.map(x => x * (i % 7).toFloat))
    val df = rows.toDF("vec_id", "embedding")
    val books = PQ.fit(df, "vec_id", "embedding", dim = 8, m = 2, k = 3)
    // the premise: at least one subspace actually lost a cluster
    assert(books.centroids.size < 2 * 3,
      "expected a dead init centroid; test data no longer exercises the sparse path")
    val enc = PQ.encode(df, "vec_id", "embedding", books).collect()
    assert(enc.length == rows.length)
    for (j <- 0 until 2) {
      val surviving = books.centroids.keys.collect { case (`j`, c) => c }.toSet
      assert(enc.forall(r => surviving.contains(r.getInt(1 + j))))
    }
    val top = PQ.adcTopK(PQ.encode(df, "vec_id", "embedding", books),
      "vec_id", books, base.map(_.toDouble), n = 5).collect()
    assert(top.length == 5)
    assert(top.map(_.getLong(1)).toSeq == top.map(_.getLong(1)).toSeq.sorted)
  }

  test("ivfpq: results are the ADC top-n restricted to probed cells") {
    val query = embeddings.orderBy(col("vec_id"))
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val centroids = embeddings.filter(col("vec_id") < 16)
    val got = PQ.ivfpqTopK(embeddings, "vec_id", "embedding",
      centroids, "vec_id", books, query, nProbe = 4, n = 10).collect()
    assert(got.length == 10)
    // distances monotone; every result's cell is one of <= 4 cells
    assert(got.map(_.getLong(1)).toSeq == got.map(_.getLong(1)).toSeq.sorted)
    assert(got.map(_.getLong(2)).distinct.length <= 4)
    // full-corpus ADC with the same books can only be at least as
    // close: the ivfpq winner set is a subset of candidates, so its
    // best distance is >= the global ADC best
    val fullBest = PQ.adcTopK(
      PQ.encode(embeddings, "vec_id", "embedding", books),
      "vec_id", books, query, n = 1).collect().head.getLong(1)
    assert(got.head.getLong(1) >= fullBest)
    // and with all cells probed, ivfpq == global ADC exactly
    val allCells = PQ.ivfpqTopK(embeddings, "vec_id", "embedding",
      centroids, "vec_id", books, query, nProbe = 16, n = 10).collect()
    val globalTop = PQ.adcTopK(
      PQ.encode(embeddings, "vec_id", "embedding", books),
      "vec_id", books, query, n = 10).collect()
    assert(allCells.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      globalTop.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("code table written bucketed by cell: probe reads only probed partitions") {
    import graft.operators.Similarity
    val centroids = embeddings.filter(col("vec_id") < 16)
    val cents = Similarity.collectCentroids(centroids, "vec_id", "embedding")
    val bc = spark.sparkContext.broadcast(cents)
    val assignU = org.apache.spark.sql.functions.udf {
      (v: Seq[Float]) => Similarity.nearestCell(v, bc.value) }
    val path = java.nio.file.Files
      .createTempDirectory("graft_pq_codes").toString
    PQ.encode(embeddings.withColumn("cell", assignU(col("embedding"))),
        "vec_id", "embedding", books, keep = Seq("cell"))
      .write.partitionBy("cell").mode("overwrite").parquet(path)

    val query = embeddings.orderBy(col("vec_id"))
      .select(col("embedding")).head().getSeq[Float](0)
    val probed = Similarity.probeCells(query, cents, 4)
    val scan = spark.read.parquet(path).filter(col("cell").isin(probed: _*))
    // partition pruning: the physical scan selects only the <= 4
    // probed cell directories (inputFiles would list the whole
    // relation — pruning happens at planning, so assert on the
    // executed scan's selected partitions) — the disk-level form of
    // the "query touches nProbe/nlist of the corpus" claim
    val exec = scan.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val selected = exec.selectedPartitions.partitionCount
    assert(selected > 0 && selected <= probed.length)
    val allParts = spark.read.parquet(path).queryExecution.executedPlan
      .collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }.get.selectedPartitions.partitionCount
    assert(selected < allParts)
  }

  test("fit seeding: slicing the collected seed rows equals per-subspace seed scans") {
    // fit now collects the k seed rows ONCE and slices all m
    // subspaces driver-side; this pins that equal to the m-scan form
    // (one TakeOrdered per subspace). The iteration after init is
    // shared code, so init equality here + the q_pq DuckDB oracle
    // (whole fit+encode) pin codebook identity.
    val q = embeddings.select(col("vec_id"),
      KMeans.quantize(col("embedding")).as("qf"))
    val single = q.orderBy(col("vec_id").asc).limit(K).collect()
      .map(_.getSeq[Long](1).toSeq)
    for (j <- 0 until M) {
      val per = q.select(col("vec_id"),
          slice(col("qf"), j * books.subDim + 1, books.subDim).as("s"))
        .orderBy(col("vec_id").asc).limit(K).collect()
        .map(_.getSeq[Long](1).toSeq)
      assert(single.map(_.slice(j * books.subDim, (j + 1) * books.subDim)).toSeq
        == per.toSeq, s"subspace $j seed mismatch")
    }
  }

  test("residual PQ: smaller total quantization error than raw") {
    // the Jégou §V claim in its exact-integer form: the coarse
    // k-means centroids explain between-cell variance first (law of
    // total variance), so the same m*k codebook budget quantizes a
    // smaller residual spread
    val model = PQ.fitResidual(embeddings, "vec_id", "embedding",
      DIM, nlist = 16, m = M, k = K)
    val resErr = PQ.encodeResidual(embeddings, "vec_id", "embedding", model)
      .agg(sum("pq_err")).head.getLong(0)
    val rawErr = PQ.encode(embeddings, "vec_id", "embedding", books)
      .agg(sum("pq_err")).head.getLong(0)
    assert(resErr < rawErr, s"residual err $resErr !< raw err $rawErr")
  }

  test("residual IVF+PQ: recall@10 vs exact quantized L2 wins or ties raw") {
    val model = PQ.fitResidual(embeddings, "vec_id", "embedding",
      DIM, nlist = 16, m = M, k = K)
    val centroids = embeddings.filter(col("vec_id") < 16)
    val q = quantized
    val queries = embeddings.orderBy(col("vec_id")).limit(8)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq))
    def groundTruth(qv: Seq[Double]): Set[Long] = {
      val qq = qv.map(x => math.floor(x * 1000).toLong)
      q.toSeq.map { case (id, v) =>
        id -> qq.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
    }
    // full probe (nProbe = 16) isolates ENCODING quality from probe
    // selection: both variants score every vector, so recall differs
    // only through the codes
    def recall(topk: Array[org.apache.spark.sql.Row], gt: Set[Long]): Double =
      topk.map(_.getLong(0)).count(gt.contains).toDouble / gt.size
    val (resR, rawR) = queries.map { case (_, qv) =>
      val gt = groundTruth(qv)
      val res = recall(PQ.ivfpqResidualTopK(embeddings, "vec_id", "embedding",
        model, qv, nProbe = 16, n = 10).collect(), gt)
      val raw = recall(PQ.ivfpqTopK(embeddings, "vec_id", "embedding",
        centroids, "vec_id", books, qv, nProbe = 16, n = 10).collect(), gt)
      (res, raw)
    }.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    assert(resR >= rawR,
      s"mean recall@10 residual ${resR / 8} < raw ${rawR / 8}")
  }

  test("rerank: full shortlist recovers the exact integer-L2 top-k") {
    // shortlist = corpus size makes the refine stage a pure exact
    // search: ids AND distances must equal brute-force ground truth
    val query = embeddings.orderBy(col("vec_id"))
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val qq = query.map(x => math.floor(x * 1000).toLong)
    val n = embeddings.count().toInt
    val got = PQ.adcRerankTopK(embeddings, "vec_id", "embedding",
      PQ.encode(embeddings, "vec_id", "embedding", books),
      books, query, shortlist = n, n = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expect = quantized.toSeq.map { case (id, v) =>
      id -> qq.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum
    }.sortBy { case (id, d) => (d, id) }.take(10)
    assert(got.toSeq == expect)
  }

  test("rerank: shortlist refine beats or ties raw ADC recall, broadcast join") {
    val q = quantized
    val codesDf = PQ.encode(embeddings, "vec_id", "embedding", books)
    val queries = embeddings.orderBy(col("vec_id")).limit(8)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq)
    def gt(qv: Seq[Double]): Set[Long] = {
      val qq = qv.map(x => math.floor(x * 1000).toLong)
      q.toSeq.map { case (id, v) =>
        id -> qq.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum
      }.sortBy { case (id, d) => (d, id) }.take(10).map(_._1).toSet
    }
    val plan = PQ.adcRerankTopK(embeddings, "vec_id", "embedding",
      codesDf, books, queries.head, shortlist = 50, n = 10)
      .queryExecution.executedPlan.toString
    // the shortlist side must broadcast: the corpus never shuffles
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    val (rr, ar) = queries.map { qv =>
      val truth = gt(qv)
      def recall(ids: Array[Long]) =
        ids.count(truth.contains).toDouble / truth.size
      val re = recall(PQ.adcRerankTopK(embeddings, "vec_id", "embedding",
        codesDf, books, qv, shortlist = 50, n = 10)
        .collect().map(_.getLong(0)))
      val ad = recall(PQ.adcTopK(codesDf, "vec_id", books, qv, n = 10)
        .collect().map(_.getLong(0)))
      (re, ad)
    }.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    assert(rr >= ar, s"mean recall@10 rerank ${rr / 8} < adc ${ar / 8}")
  }

  test("compression: codes fit in a byte each at k<=256") {
    assert(codes.forall(r => (0 until M).forall { j =>
      val c = r.getInt(1 + j); c >= 0 && c < K
    }))
  }
}
