package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-14 behavior pins: the media-fixture decode parallelization
  * (r13 verdict "What's wrong #1") and the vocab-coverage
  * degenerate-corpus guard (r13 ADVICE).
  */
class Round14OpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("media payload fixtures read back at session parallelism, not as " +
    "one task (the serial-decode fix)") {
    val want = spark.sparkContext.defaultParallelism
    // every decode-bound corpus: the stage ABOVE the codec UDFs must
    // have one partition per core, or a 32-thread box decodes on 1
    val imgs = MultimodalQueries.structuredImages(spark, sf)
    assert(imgs.rdd.getNumPartitions == want,
      s"structuredImages partitions=${imgs.rdd.getNumPartitions}, want $want")
    val wavs = MultimodalQueries.structuredWavs(spark, sf)
    assert(wavs.rdd.getNumPartitions == want,
      s"structuredWavs partitions=${wavs.rdd.getNumPartitions}, want $want")
    val gifs = MultimodalQueries.structuredVideos(spark, sf)
    assert(gifs.rdd.getNumPartitions == want,
      s"structuredVideos partitions=${gifs.rdd.getNumPartitions}, want $want")
    // and the repartition changes no rows: fingerprints over the
    // parallel read still find the engineered near-dup pairs
    val pairs = MultimodalQueries.queries("mm_audio_fp")(spark, sf)
    assert(pairs.count() > 0, "near-dup pairs vanished after repartition")
  }

  test("q_vocab_coverage: a corpus with zero bigrams emits zero rows " +
    "(matches the oracle's empty legs)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vocab_degen")
    try {
      // single-word texts -> no word bigrams -> empty frequency frame
      spark.range(5).select(col("id").as("doc_id"), lit("solo").as("text"),
          lit("src0").as("source"), lit("en").as("lang"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val out = TextQueries.queries("q_vocab_coverage")(spark, dir.toString)
      assert(out.count() == 0,
        "degenerate corpus must not emit count=0/null coverage rows")
    } finally org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }
}
