package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for large-scale training-data pipelines: exact
  * (hash-groupBy), normalized-exact, n-gram Jaccard (exact pairwise on
  * LSH-pruned candidates), MinHash+LSH, and SimHash. Everything is pure
  * `functions._` (codegen'd, no UDFs) and shuffles only on short keys —
  * never on full document text — so plans survive a 100 TB corpus:
  *
  *  - exact: shuffle key is a 256-bit content hash (64 bytes/doc);
  *  - minhash/simhash: signatures are computed per-row (no shuffle), then
  *    the only shuffle is the band-bucket exchange of (band, hash64, id);
  *  - candidate verification joins texts back by id, touching only the
  *    tiny candidate set instead of all n² pairs.
  */
object Dedup {

  /** Whitespace tokens of the raw text. */
  private def words(text: Column): Column = split(text, "\\s+")

  /** Distinct word-n-gram shingles (n=1 → word set). */
  def shingles(text: Column, n: Int): Column =
    if (n == 1) array_distinct(words(text))
    else array_distinct(
      transform(
        sequence(lit(0), greatest(size(words(text)) - n, lit(0))),
        i => concat_ws(" ", slice(words(text), i + 1, lit(n)))))

  /** Exact dedup: one keeper (min id) per identical content. The groupBy
    * key is sha2-256 of the text, so the shuffle moves 64-byte digests,
    * not documents.
    */
  def exact(df: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    df.groupBy(sha2(col(textCol).cast("binary"), 256).as("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Case/punctuation/whitespace-insensitive exact dedup. */
  def normalized(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", ""), "\\s+", " "))

  def exactNormalized(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    df.groupBy(sha2(normalized(col(textCol)).cast("binary"), 256).as("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature: k minimums of per-shingle 64-bit hashes, the i-th
    * hash family being xxhash64(i, xxhash64(shingle)). Computed entirely
    * per-row.
    */
  def minhashSignature(text: Column, n: Int, k: Int): Column = {
    val hashes = transform(shingles(text, n), s => xxhash64(s))
    array((0 until k).map(i => array_min(transform(hashes, h => xxhash64(lit(i), h)))): _*)
  }

  /** LSH candidate pairs: split the k-wide signature into `bands` bands,
    * bucket by (band index, band hash), pair ids within a bucket. Returns
    * (idCol_a, idCol_b) with a < b, distinct. Two docs with Jaccard j
    * share a band with prob 1-(1-j^(k/bands))^bands — at k=64, bands=16
    * that is >0.9998 for j≥0.8 and exactly 1 for j=1.
    */
  def lshCandidates(df: DataFrame, textCol: String, idCol: String,
      n: Int, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    val sig = df.select(col(idCol), minhashSignature(col(textCol), n, k).as("sig"))
    val banded = sig.select(
      col(idCol),
      posexplode(array((0 until bands).map(j =>
        xxhash64(lit("band"), lit(j), slice(col("sig"), j * r + 1, r))): _*)))
      .toDF(idCol, "band", "bucket")
    val a = banded.toDF("id_a", "band", "bucket")
    val b = banded.toDF("id_b", "band", "bucket")
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** MinHash+LSH near-dup pairs with exact Jaccard verification on the
    * candidate set: output (id_a, id_b, jaccard) for word-n-gram Jaccard
    * ≥ threshold. The n² work is confined to LSH buckets; verification
    * joins shingle sets back by id.
    */
  def minhashDedupPairs(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", n: Int = 1, k: Int = 128, bands: Int = 32,
      threshold: Double = 0.8): DataFrame = {
    val cands = lshCandidates(df, textCol, idCol, n, k, bands)
    val sh = df.select(col(idCol), shingles(col(textCol), n).as("sh"))
    cands
      .join(sh.toDF("id_a", "sh_a"), "id_a")
      .join(sh.toDF("id_b", "sh_b"), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 64-bit SimHash over the distinct-word hash set (per-row, no shuffle):
    * bit j is 1 iff more word hashes have bit j set than not.
    */
  def simhash(text: Column): Column = {
    val hashes = transform(array_distinct(words(text)), w => xxhash64(w))
    val bitCols = (0 until 64).map { j =>
      val bal = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, j).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(bal > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bitCols.reduce((a, b) => a.bitwiseOR(b))
  }

  /** SimHash near-dup pairs: bucket by 4×16-bit bands (any pair within
    * Hamming distance 3 shares at least one intact band), verify with
    * bit_count(xor) ≤ maxHamming.
    */
  def simhashDedupPairs(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", maxHamming: Int = 3): DataFrame = {
    val sh = df.select(col(idCol), simhash(col(textCol)).as("sh"))
    val banded = sh.select(col(idCol), col("sh"),
      posexplode(array((0 until 4).map(j =>
        shiftright(col("sh"), j * 16).bitwiseAND(0xFFFF)): _*)))
      .toDF(idCol, "sh", "band", "bucket")
    val a = banded.toDF("id_a", "sh_a", "band", "bucket")
    val b = banded.toDF("id_b", "sh_b", "band", "bucket")
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact all-pairs n-gram Jaccard ≥ threshold via an inverted-index
    * join (explode shingles, join on shingle, count co-occurrences) —
    * the classic scalable exact algorithm: work is proportional to
    * posting-list sizes, not n². Common-shingle skew is the known
    * hazard at scale; pair with a document-frequency cut (`maxDf`).
    */
  def jaccardPairs(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", n: Int = 1, threshold: Double = 0.8,
      maxDf: Long = Long.MaxValue): DataFrame = {
    val sh = df.select(explode(shingles(col(textCol), n)).as("s"), col(idCol).as("id"))
    val pruned =
      if (maxDf == Long.MaxValue) sh
      else {
        val dfreq = sh.groupBy("s").agg(count(lit(1)).as("df")).filter(col("df") <= maxDf)
        sh.join(dfreq.select("s"), "s")
      }
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n_sh"))
    val common = pruned.toDF("s", "id_a").join(pruned.toDF("s", "id_b"), "s")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("common"))
    common
      .join(sizes.toDF("id_a", "na"), "id_a")
      .join(sizes.toDF("id_b", "nb"), "id_b")
      .withColumn("jaccard",
        col("common").cast("double") / (col("na") + col("nb") - col("common")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }
}
