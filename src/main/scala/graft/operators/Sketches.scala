package graft.operators

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Approximate frequency / heavy-hitters via Count–Min sketch — the
  * third sketch family next to HLL (distincts) and KLL-style quantiles
  * (percentile_approx), and the standard way to ask "which tokens /
  * users / domains dominate?" over a corpus too large to exact-count
  * per key everywhere.
  *
  * Scale story (100 TB): the sketch is a fixed `depth × width` counter
  * grid (~hundreds of KB at eps 5e-4), aggregated map-side like any
  * partial agg, so the only data movement is one sketch per partition —
  * never a per-key shuffle. Merge is counter-wise addition, hence
  * commutative/associative and exactly equal to a single-pass sketch
  * (asserted in SketchesSpec): per-day or per-partition sketches union
  * into the month with zero accuracy loss, the same mergeability
  * property the q_hll_union gate pins for distincts.
  *
  * Verdict design (like the HLL gates): CMS guarantees (a) estimate ≥
  * true count, always, and (b) estimate ≤ true count + eps·N with
  * probability ≥ confidence per query, deterministic here under the
  * fixed seed. Both are emitted as booleans the DuckDB oracle asserts
  * as TRUE, so a drifting sketch flips the hash match.
  */
object Sketches {

  /** Order-independent union of serialized Count–Min sketches. All
    * inputs must share eps/confidence/seed (⇒ same depth/width/hash
    * seeds); merge is counter-wise addition.
    */
  private object CmsUnionAgg extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = Array.emptyByteArray
    def reduce(b: Array[Byte], a: Array[Byte]): Array[Byte] = union(b, a)
    def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = union(b1, b2)
    def finish(r: Array[Byte]): Array[Byte] = r
    def bufferEncoder = Encoders.BINARY
    def outputEncoder = Encoders.BINARY
    private def union(x: Array[Byte], y: Array[Byte]): Array[Byte] =
      if (x.isEmpty) y
      else if (y.isEmpty) x
      else {
        val s = CountMinSketch.readFrom(new ByteArrayInputStream(x))
        s.mergeInPlace(CountMinSketch.readFrom(new ByteArrayInputStream(y)))
        s.toByteArray
      }
  }

  /** `cms_union(sketch_binary)` aggregate column. */
  def cmsUnion(sk: Column): Column = udaf(CmsUnionAgg, Encoders.BINARY)(sk)

  /** Point estimate for a long key. Deserializes per call — only ever
    * applied to the k-row top-k frame, never a corpus-sized one.
    */
  private val cmsEstimate =
    udf((sk: Array[Byte], key: Long) =>
      CountMinSketch.readFrom(new ByteArrayInputStream(sk)).estimateCount(key))

  private def cmsAgg(keyCol: String, eps: Double, confidence: Double, seed: Int): Column =
    expr(s"count_min_sketch($keyCol, CAST($eps AS DOUBLE), CAST($confidence AS DOUBLE), $seed)")

  /** Join the exact top-k (ground truth) against a 1-row sketch frame and
    * emit the two CMS verdict booleans.
    */
  private def verdict(
      df: DataFrame,
      keyCol: String,
      k: Int,
      eps: Double,
      sketch: DataFrame): DataFrame = {
    val exact = df
      .groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt_exact"))
      .orderBy(col("cnt_exact").desc, col("key"))
      .limit(k)
    exact
      .crossJoin(broadcast(sketch))
      .select(
        col("key").as(keyCol),
        col("cnt_exact"),
        cmsEstimate(col("sk"), col("key")).as("est"),
        col("n"))
      .select(
        col(keyCol),
        col("cnt_exact"),
        (col("est") >= col("cnt_exact")).as("est_ge_exact"),
        (col("est") <= col("cnt_exact") + ceil(col("n") * lit(eps))).as("est_within_bound"))
      .orderBy(col("cnt_exact").desc, col(keyCol))
  }

  /** Single-pass corpus sketch bytes (test hook for the mergeability
    * bit-equality assertion in SketchesSpec).
    */
  private[graft] def singleSketch(
      df: DataFrame, keyCol: String, eps: Double, confidence: Double, seed: Int): Array[Byte] =
    df.agg(cmsAgg(keyCol, eps, confidence, seed).as("sk"))
      .collect()(0).getAs[Array[Byte]]("sk")

  /** Union of per-slice sketches, as bytes (test hook). */
  private[graft] def mergedSketch(
      df: DataFrame, keyCol: String, sliceCol: Column,
      eps: Double, confidence: Double, seed: Int): Array[Byte] =
    df.groupBy(sliceCol.as("slice"))
      .agg(cmsAgg(keyCol, eps, confidence, seed).as("sk"))
      .agg(cmsUnion(col("sk")).as("sk"))
      .collect()(0).getAs[Array[Byte]]("sk")

  /** Heavy hitters: exact top-k keys by count (TakeOrderedAndProject, the
    * cheap part) with single-pass CMS estimates checked against them.
    */
  def heavyHitters(
      df: DataFrame,
      keyCol: String,
      k: Int = 10,
      eps: Double = 5e-4,
      confidence: Double = 0.999,
      seed: Int = 42): DataFrame = {
    val sk = df.agg(cmsAgg(keyCol, eps, confidence, seed).as("sk"), count(lit(1)).as("n"))
    verdict(df, keyCol, k, eps, sk)
  }

  /** Mergeability path: one sketch per `sliceCol` group (e.g. per day —
    * how a cluster actually builds it, partials near the scan), unioned
    * counter-wise into the corpus sketch. Estimates are bit-identical to
    * [[heavyHitters]]' single-pass sketch (SketchesSpec asserts equality),
    * so the same verdict bound applies.
    */
  def heavyHittersMerged(
      df: DataFrame,
      keyCol: String,
      sliceCol: Column,
      k: Int = 10,
      eps: Double = 5e-4,
      confidence: Double = 0.999,
      seed: Int = 42): DataFrame = {
    val daily = df
      .groupBy(sliceCol.as("slice"))
      .agg(cmsAgg(keyCol, eps, confidence, seed).as("sk"), count(lit(1)).as("n"))
    val merged = daily.agg(cmsUnion(col("sk")).as("sk"), sum("n").as("n"))
    verdict(df, keyCol, k, eps, merged)
  }
}
