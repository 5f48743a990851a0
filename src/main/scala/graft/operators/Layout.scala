package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout for multi-dimensional scan locality.
  *
  * At 100 TB the dominant query cost is the scan, and the dominant scan
  * win is skipping: parquet row-group min/max stats (and file-level
  * manifests like the compaction commit's) prune only when rows that are
  * close in *key space* are close in *file space*. A 1-D sort gives that
  * for one column and destroys it for every other; interleaving the bits
  * of two range-bucketed dimensions bounds the per-file span of BOTH, so
  * predicates on either dimension (or both) skip most of the data. This
  * is the layout trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`,
  * re-expressed here as plain Spark: one range shuffle on the computed
  * key, then a within-partition sort — no extra pass, no driver state
  * beyond a 4-long bounds row.
  *
  * Everything is engine-replayable integer/double arithmetic (no hash,
  * no partitioner internals), so the layout_zorder gate hash-checks the
  * key itself in DuckDB, and LayoutSpec measures the locality claim
  * directly (per-file spans vs a 1-D sorted baseline).
  */
object Layout {

  /** Equal-width bucket of an integral column into [0, 2^bits), given
    * inclusive lo/hi bounds. Pure IEEE-double arithmetic — `(v-lo)·2^bits`
    * is exact below 2^53 and the quotient is ≥1e-7 away from any integer
    * it doesn't exactly equal, so `floor` matches DuckDB bit-for-bit.
    */
  def rangeBucket(v: Column, lo: Column, hi: Column, bits: Int): Column =
    floor(
      (v.cast("long") - lo.cast("long")) * lit((1L << bits).toDouble) /
        (hi.cast("long") - lo.cast("long") + lit(1L)))

  /** Morton interleave of two bucket ids in [0, 2^bits): bit i of `a`
    * lands at 2i+1, bit i of `b` at 2i. Unrolled bitwise ops — stays in
    * whole-stage codegen.
    */
  def interleaveBits(a: Column, b: Column, bits: Int): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i))
    }

  /** Z-key of two integral columns bucketed to their [lo, hi] ranges. */
  def zorderKey(
      a: Column, alo: Column, ahi: Column,
      b: Column, blo: Column, bhi: Column,
      bits: Int): Column =
    interleaveBits(rangeBucket(a, alo, ahi, bits), rangeBucket(b, blo, bhi, bits), bits)

  /** Write `df` to parquet clustered by the z-order of two integral
    * columns: bounds agg (one O(1) driver row), range-partition on the
    * key into `targetFiles` equal-count files, sort within each so
    * row-group stats are tight on both dimensions.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      colA: String,
      colB: String,
      bits: Int = 8,
      targetFiles: Int = 16): Unit = {
    val b = df
      .agg(
        min(col(colA).cast("long")).as("alo"), max(col(colA).cast("long")).as("ahi"),
        min(col(colB).cast("long")).as("blo"), max(col(colB).cast("long")).as("bhi"))
      .collect()(0)
    if (b.isNullAt(0)) { // empty input: no bounds — write the empty set as-is
      df.write.mode("overwrite").parquet(path)
      return
    }
    val z = zorderKey(
      col(colA), lit(b.getLong(0)), lit(b.getLong(1)),
      col(colB), lit(b.getLong(2)), lit(b.getLong(3)), bits)
    df.withColumn("_zkey", z)
      .repartitionByRange(targetFiles, col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop("_zkey")
      .write.mode("overwrite").parquet(path)
  }

  /** Write `df` as a Spark bucketed (and optionally sort-clustered)
    * catalog table — the "user-bucketed lake" SCALE.md's co-location
    * claims assume. A scan of a table bucketed on `k` reports
    * `HashPartitioning(k, numBuckets)`, so every downstream
    * aggregate, window, or join keyed on `k` (against another table
    * with the SAME bucket count) satisfies its distribution without an
    * Exchange: the shuffle happens once at write time, then never
    * again. BucketingSpec proves the zero-exchange plans for the
    * aggregate, sessionize-window, and self-join shapes.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(numBuckets >= 1, "need at least one bucket")
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}
