package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** BPE trainer + encoder: textbook merge sequence on a hand corpus,
  * tie-break determinism, encoder/trainer agreement, memoized
  * distributed encode.
  */
class BpeSpec extends SparkTestBase {

  test("trainer learns the textbook merges on the classic corpus") {
    // Sennrich et al.'s running example (word frequencies)
    val freqs = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.train(freqs, numMerges = 4)
    // pair counts: (e,s)=9 ties (s,t)=9 → lexicographic (e,s); then
    // (es,t)=9; then (l,o)=7 beats (o,w)=7 lexicographically; then the
    // merged (lo,w)=7
    assert(merges.head == ("e", "s"))
    assert(merges(1) == ("es", "t"))
    assert(merges(2) == ("l", "o"))
    assert(merges(3) == ("lo", "w"))
  }

  test("encoder applies ranked merges exactly like the trainer did") {
    val freqs = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.train(freqs, numMerges = 10)
    val rank = merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    // encoding a training word reproduces its trained segmentation
    assert(Bpe.encodeWord("newest", rank).mkString("|") == "newest")
    assert(Bpe.encodeWord("lowest", rank).mkString("|") == "low|est")
    // unseen words fall back to partial merges ((w,est) was never
    // learned — the (e,w)/(ew,est) path beat it)
    assert(Bpe.encodeWord("west", rank) == Seq("w", "est"))
    assert(Bpe.encodeWord("zzz", rank) == Seq("z", "z", "z"))
  }

  test("training is deterministic and caps at exhausted pairs") {
    val freqs = Seq(("ab", 1L))
    val merges = Bpe.train(freqs, numMerges = 50)
    assert(merges == Seq(("a", "b"))) // one pair, then nothing left
    assert(Bpe.train(freqs, 50) == Bpe.train(freqs, 50))
  }

  test("distributed encode matches per-word encoding, end to end") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the lowest low"),
      (2L, "Newest, widest!"),
      (3L, ""),
      (4L, "THE THE the")).toDF("doc_id", "text")
    val merges = Bpe.trainOn(docs, numMerges = 8, maxVocabWords = 100)
    val rank = merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    val out = Bpe.encode(spark, docs, merges).orderBy("doc_id").collect()
    assert(out.length == 4)
    val row1 = out(0)
    val expected1 = Seq("the", "lowest", "low")
      .flatMap(w => Bpe.encodeWord(w, rank))
    assert(row1.getAs[scala.collection.Seq[String]]("tokens").toSeq == expected1)
    assert(row1.getAs[Int]("n_tokens") == expected1.length)
    // punctuation and case fold identically on both paths
    val row2 = out(1)
    assert(row2.getAs[scala.collection.Seq[String]]("tokens").toSeq ==
      Seq("newest", "widest").flatMap(w => Bpe.encodeWord(w, rank)))
    assert(out(2).getAs[Int]("n_tokens") == 0)
    assert(out(3).getAs[scala.collection.Seq[String]]("tokens").toSeq ==
      Seq("the", "the", "the").flatMap(w => Bpe.encodeWord(w, rank)))
  }
}
