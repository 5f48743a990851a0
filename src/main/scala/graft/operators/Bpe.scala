package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair encoding, trained and applied the way a corpus-scale
  * pipeline actually does it (Sennrich et al., ACL'16): training runs
  * on the WORD-FREQUENCY TABLE, not the corpus — one distributed
  * word-count collapses any corpus (100 TB included) to a vocabulary
  * whose size is bounded by `maxVocabWords`, the merge loop then runs
  * driver-side over that tiny table, and encoding broadcasts the
  * learned merge ranks back over the corpus with a per-executor word
  * memo (Zipf makes the memo hit rate ≈ 1).
  *
  * Determinism: pair selection breaks count ties lexicographically, so
  * the same corpus always learns the same merges — which is what lets
  * the gate replay the learned merges as SQL literals and verify the
  * ENCODER against an independent DuckDB implementation (unrolled
  * merge-order `replace` steps; SQL `replace`'s left-to-right
  * non-overlapping semantics is exactly BPE's leftmost-first
  * simultaneous merge).
  *
  * Scope: word-internal BPE over lowercase `[a-z]+` words (no
  * end-of-word marker) — the algorithmic core; byte-level alphabets
  * and markers change the pre-tokenizer, not the mechanics.
  */
object Bpe {

  /** A fixed, training-shaped English merge list (every pair's parts
    * are single characters or earlier merge results — the structural
    * property trained merge lists always have, which is what makes
    * rank-priority encoding equal sequential merge-order application).
    * The encoder gate replays this list as SQL literals; real
    * deployments pass [[trainOn]]'s corpus-learned merges instead.
    */
  val EnglishMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("a", "n"), ("an", "d"), ("i", "n"),
    ("in", "g"), ("e", "r"), ("o", "n"), ("r", "e"), ("a", "t"),
    ("e", "n"), ("o", "r"), ("e", "s"), ("s", "t"), ("t", "o"),
    ("o", "u"), ("i", "s"), ("o", "f"), ("a", "l"), ("e", "d"))

  /** One distributed pass: the (word, freq) table, capped to the
    * `maxVocabWords` most frequent (ties by word) — the training set.
    */
  def wordFrequencies(df: DataFrame, textCol: String = "text",
      maxVocabWords: Int = 50000): DataFrame =
    df.select(explode(split(lower(col(textCol)), "[^a-z]+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word"))
      .limit(maxVocabWords)

  /** Train `numMerges` merges on the word-frequency table (driver-side
    * loop — the table is bounded by `maxVocabWords`, so this is
    * O(merges × vocab), independent of corpus size). Returns merges in
    * rank order.
    */
  def train(wordFreq: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    // each word as its symbol sequence, weighted by frequency
    var vocab: Seq[(Array[String], Long)] =
      wordFreq.map { case (w, f) => (w.map(_.toString).toArray, f) }
    val merges = Seq.newBuilder[(String, String)]
    var step = 0
    var done = false
    while (step < numMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        // argmax by count, ties lexicographic — the determinism contract
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val merged = best._1 + best._2
        vocab = vocab.map { case (syms, f) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == best._1 && syms(i + 1) == best._2) {
              out += merged; i += 2 // leftmost-first, non-overlapping
            } else { out += syms(i); i += 1 }
          }
          (out.toArray, f)
        }
        step += 1
      }
    }
    merges.result()
  }

  /** Convenience: distributed word count → driver merge loop. */
  def trainOn(df: DataFrame, textCol: String = "text", numMerges: Int = 100,
      maxVocabWords: Int = 50000): Seq[(String, String)] =
    train(
      wordFrequencies(df, textCol, maxVocabWords)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq,
      numMerges)

  /** Encode one word with ranked merges (lowest rank first, leftmost
    * occurrence first) — the standard BPE apply loop.
    */
  def encodeWord(word: String, rank: Map[(String, String), Int]): Seq[String] = {
    var syms: Vector[String] = word.map(_.toString).toVector
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i + 1 < syms.length) {
        rank.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestIdx = i }
        }
        i += 1
      }
      if (bestIdx < 0) continue = false
      else {
        // merge EVERY occurrence of the best pair, leftmost-first
        val a = syms(bestIdx); val b = syms(bestIdx + 1); val m = a + b
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == a && syms(j + 1) == b) {
            out += m; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
        continue = syms.length > 1
      }
    }
    syms
  }

  /** Distributed encode: per-document BPE token count and token list
    * over the broadcast merge ranks, with a per-executor word memo
    * (Zipf: nearly every word is a repeat). One scan-stage projection —
    * no shuffle; only the small (doc_id, tokens) rows flow on.
    */
  def encode(spark: SparkSession, df: DataFrame,
      merges: Seq[(String, String)], textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val rankB = spark.sparkContext.broadcast(
      merges.zipWithIndex.map { case (p, i) => p -> i }.toMap)
    val memo = new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()
    val encodeUdf = udf { (text: String) =>
      val words = Option(text).getOrElse("").toLowerCase
        .split("[^a-z]+").filter(_.nonEmpty)
      words.flatMap { w =>
        var t = memo.get(w)
        if (t == null) {
          t = encodeWord(w, rankB.value)
          if (memo.size < 100000) memo.put(w, t)
        }
        t
      }.toSeq
    }
    df.select(col(idCol), encodeUdf(col(textCol)).as("tokens"))
      .select(col(idCol), col("tokens"),
        size(col("tokens")).as("n_tokens"))
  }
}
