package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-2 probe: time the six slowest bench queries at sf0.1 and dump
  * the pieces so optimization targets the real cost, not a guess. */
object Probe2 {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    println("sizes: " + Seq("documents", "embeddings", "events").map { t =>
      val d = if (t == "events") graft.queries.Tables.events(spark, dir)
              else graft.queries.Tables(spark, dir, t)
      s"$t=${d.count()}"
    }.mkString(" "))

    // --- flatten_map pieces ---
    val ev = graft.queries.Tables.events(spark, dir)
      .select(col("event_id"),
        from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.IntegerType)).as("props"))
    time("from_json map only")(ev.count())
    time("explode(map_entries) direct")(
      ev.select(col("event_id"), explode(map_entries(col("props"))).as("e"))
        .select(col("event_id"), col("e.key"), col("e.value")).count())
    val fm = graft.operators.Flatten.flatten(ev)
    time("flatten_map full (1st)")(fm.count())
    time("flatten_map full (2nd)")(graft.operators.Flatten.flatten(ev).count())
    println(fm.queryExecution.executedPlan.toString.take(3000))

    // --- ngram jaccard pieces ---
    import graft.functions.TextFunctions._
    val docs = graft.queries.Tables(spark, dir, "documents")
    val raw = docs.select(col("doc_id").as("id"), words(col("text")).as("__w"))
      .select(col("id"), explode(shinglesOfWords(col("__w"), 3)).as("tok"))
      .distinct()
    time("shingles distinct")(println("  shingle rows=" + raw.count()))
    val t = raw.persist()
    t.count()
    val inter = t.select(col("id").as("id_a"), col("tok"))
      .join(t.select(col("id").as("id_b"), col("tok")), Seq("tok"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("inter"))
    time("shingle self-join+agg")(println("  pair rows=" + inter.count()))
    t.unpersist()
    time("dedup_ngram_jaccard full")(
      graft.queries.DedupQueries.queries("dedup_ngram_jaccard")(spark, dir).count())

    // --- knn pieces ---
    time("knn_cosine full")(
      graft.queries.VectorQueries.queries("knn_cosine")(spark, dir).count())
    time("knn_lsh full")(
      graft.queries.VectorQueries.queries("knn_lsh")(spark, dir).count())
    time("knn_ivf full")(
      graft.queries.VectorQueries.queries("knn_ivf")(spark, dir).count())
    // how many candidate rows feed the window?
    val emb = graft.queries.Tables(spark, dir, "embeddings")
    val q = broadcast(emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("__qv")))
    val c = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("__cv"))
    time("brute pair count")(
      println("  brute pairs=" + q.join(c, col("query_id") =!= col("neighbor_id")).count()))

    // --- components pieces ---
    time("dedup_components full")(
      graft.queries.DedupQueries.queries("dedup_components")(spark, dir).count())
    val pairs = graft.operators.Dedup.winnowJaccardPairs(docs, "doc_id", "text",
      shingleLen = 3, window = 4, minJaccard = 0.3)
    time("winnow pairs alone")(println("  winnow pairs=" + pairs.count()))
    spark.stop()
  }
}
