package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer training (Sennrich et al. 2016): iterate the
  * pair-count step to a merge list. Textbook scale shape — all work
  * runs on the word-FREQUENCY table (vocabulary << corpus tokens),
  * exactly like the reference pair-count query `q_bpe_step`:
  *
  *   - pair counts: one map-combined aggregation on (l, r) per
  *     round, weighted by word frequency — the only shuffle, and it
  *     carries counts over the vocabulary, not the corpus;
  *   - top pair: TakeOrderedAndProject(1) with a deterministic
  *     (count desc, pair asc) tiebreak;
  *   - merge application: a narrow per-word fold — no shuffle;
  *   - the growing merge list lives on the driver (it IS the model,
  *     like k-means centroids: vocabSize rows, never data).
  *
  * Each round persists its rewritten symbol table and unpersists the
  * previous one, so lineage stays one fold deep and the block
  * manager holds exactly one copy — the same iterative-operator
  * discipline as connected components.
  */
object Bpe {

  /** One greedy left-to-right application of merge (l, r): fold the
    * symbol array, fusing an (l, r) adjacency into l+r. A token
    * merged in this pass never re-merges as the LEFT of another
    * fusion (l+r != l since r is non-empty), which makes the fold
    * equal to the standard single-pass greedy scan. try_element_at
    * returns null on the empty accumulator (never matches l). */
  private[operators] def applyMerge(syms: Column, l: String, r: String): Column =
    aggregate(syms, array().cast("array<string>"), (acc, x) =>
      when(try_element_at(acc, lit(-1)) === lit(l) && x === lit(r),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(x))))

  /** Initial symbol column: the word's characters (split("") can
    * emit empty edge tokens; they are filtered, not symbols). */
  private[operators] def charSymbols(word: Column): Column =
    filter(split(word, ""), x => x =!= "")

  /** Train `nMerges` BPE merges over a word-frequency table
    * (wordCol, freqCol). Returns the merge list
    * (rank, lhs, rhs, cnt) — rank 1 is the first merge learned.
    * Stops early when no adjacent pair remains.
    *
    * Routing: the word-frequency table is vocabulary-sized by
    * construction, and the merge loop is a MODEL FIT — so when the
    * vocabulary fits on the driver (`maxLocalVocab` rows), collect it
    * once and run the loop in memory: one Spark job total, against
    * 2 jobs per merge for the distributed loop (at a realistic 30 k
    * merges that is 60 k scheduler round-trips of pure fixed cost —
    * the r6 bench showed ~0.3 s/merge of overhead at 8 merges).
    * Vocabularies past the cap take [[trainDistributed]], which never
    * materializes the table. Both paths produce IDENTICAL merge
    * lists (same greedy fold, same (count desc, pair asc) tiebreak —
    * local compares strings as UTF-8 bytes to match Spark/DuckDB
    * binary collation); pinned by BpeSpec. */
  def train(wordFreq: DataFrame, wordCol: String, freqCol: String,
            nMerges: Int, maxLocalVocab: Long = 4000000L): DataFrame =
    if (wordFreq.count() <= maxLocalVocab)
      trainLocal(wordFreq, wordCol, freqCol, nMerges)
    else
      trainDistributed(wordFreq, wordCol, freqCol, nMerges)

  /** The in-memory merge loop over a collected vocabulary. */
  private[graft] def trainLocal(wordFreq: DataFrame, wordCol: String,
                                    freqCol: String, nMerges: Int): DataFrame = {
    val spark = wordFreq.sparkSession
    import spark.implicits._
    val rows = wordFreq
      .select(col(wordCol).cast("string"), col(freqCol).cast("long"))
      .collect()
    val freqs = rows.map(_.getLong(1))
    val syms: Array[Array[String]] =
      rows.map(_.getString(0).split("").filter(_.nonEmpty))
    // Spark's string sort is binary over UTF-8; Java String.compareTo
    // is UTF-16 code units — they diverge on supplementary planes, so
    // tiebreak on the raw bytes
    def byteLt(a: String, b: String): Boolean = {
      val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val d = (x(i) & 0xff) - (y(i) & 0xff)
        if (d != 0) return d < 0
        i += 1
      }
      x.length < y.length
    }
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var wi = 0
      while (wi < syms.length) {
        val s = syms(wi); val f = freqs(wi)
        var i = 0
        while (i < s.length - 1) {
          val k = (s(i), s(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
          i += 1
        }
        wi += 1
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.reduceLeft { (a, b) =>
          if (b._2 > a._2 ||
            (b._2 == a._2 && (byteLt(b._1._1, a._1._1) ||
              (b._1._1 == a._1._1 && byteLt(b._1._2, a._1._2))))) b else a
        }
        merges += ((rank, l, r, c))
        // same single-pass greedy scan as applyMerge's fold
        wi = 0
        while (wi < syms.length) {
          val s = syms(wi)
          var has = false
          var i = 0
          while (!has && i < s.length - 1) {
            has = s(i) == l && s(i + 1) == r; i += 1
          }
          if (has) {
            val out = Array.newBuilder[String]
            i = 0
            while (i < s.length) {
              if (i < s.length - 1 && s(i) == l && s(i + 1) == r) {
                out += l + r; i += 2
              } else { out += s(i); i += 1 }
            }
            syms(wi) = out.result()
          }
          wi += 1
        }
        rank += 1
      }
    }
    merges.result().toDF("rank", "lhs", "rhs", "cnt")
  }

  /** The distributed merge loop — every round on the cluster, for
    * vocabularies too large to collect. */
  def trainDistributed(wordFreq: DataFrame, wordCol: String, freqCol: String,
                       nMerges: Int): DataFrame = {
    val spark = wordFreq.sparkSession
    import spark.implicits._
    var cur = wordFreq.select(col(freqCol).cast("long").as("__f"),
      charSymbols(col(wordCol)).as("__s")).persist()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= nMerges && !done) {
      val top = cur.filter(size(col("__s")) >= 2)
        .select(col("__f"),
          explode(transform(sequence(lit(1), size(col("__s")) - 1),
            i => struct(element_at(col("__s"), i).as("l"),
              element_at(col("__s"), i + 1).as("r")))).as("__p"))
        .groupBy(col("__p").getField("l").as("l"),
          col("__p").getField("r").as("r"))
        .agg(sum(col("__f")).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, c) =
          (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        merges += ((rank, l, r, c))
        val next = cur.select(col("__f"),
          applyMerge(col("__s"), l, r).as("__s")).persist()
        next.count() // materialize before dropping the parent's cache
        cur.unpersist()
        cur = next
        rank += 1
      }
    }
    cur.unpersist()
    merges.result().toDF("rank", "lhs", "rhs", "cnt")
  }

  /** Tokenize a word table with a TRAINED merge list: start from
    * characters and apply each merge greedily in rank order — the
    * encode half of the tokenizer (what `train` learns, this
    * applies). Returns (wordCol, syms array<string>). The fold runs
    * per DISTINCT word, so corpus tokenization is this narrow
    * vocabulary-table projection plus one equi-join of corpus tokens
    * to it on the word (broadcastable while the vocabulary fits,
    * shuffle join beyond — either way the expensive per-word fold
    * runs |vocab| times, not |corpus| times). */
  def segmentWords(words: DataFrame, wordCol: String,
                   merges: Seq[(String, String)]): DataFrame =
    merges.foldLeft(
      words.select(col(wordCol), charSymbols(col(wordCol)).as("syms"))) {
      (acc, m) =>
        acc.select(col(wordCol), applyMerge(col("syms"), m._1, m._2).as("syms"))
    }
}
