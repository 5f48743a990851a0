package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) curve key over 2–4 quantized columns, built
  * ENTIRELY from codegen'd built-ins (casts, shifts, masks) — no UDF
  * anywhere in the rewrite path.
  *
  * This is the layout key behind Delta's `OPTIMIZE ... ZORDER BY` and
  * Iceberg's `rewrite_data_files(strategy => 'sort', sort_order =>
  * 'zorder(...)')` (public analogs; the reference delegates layout
  * maintenance to Athena OPTIMIZE —
  * web-analytics-iceberg/README.md:187): sorting files along the
  * Z-curve makes each file cover a small HYPER-RECTANGLE of the
  * multi-column domain, so a point/box predicate on ANY subset of the
  * z-columns intersects few files — and the table's stamped per-file
  * min/max bounds turn that into planning-time file skipping.
  */
object ZOrder {

  /** Rank-quantize a numeric column into [0, 2^bits) against the
    * [lo, hi] double bounds. NULLs and degenerate spans map to 0
    * (they sort first — harmless for layout, never for correctness:
    * the z-key orders rows, it is never stored or read back).
    */
  def quantize(c: Column, lo: Column, hi: Column, bits: Int): Column = {
    val maxQ = (1L << bits) - 1
    val span = hi - lo
    when(c.isNull || span <= lit(0.0), lit(0L))
      .otherwise(least(lit(maxQ), greatest(lit(0L),
        floor((c.cast("double") - lo) / span * maxQ).cast("long"))))
  }

  /** Interleave the low `bits` of each quantized column into one long:
    * output bit (b·n + i) = bit b of column i — the Morton code. The
    * expression is bits·n shift/mask terms OR-folded, all inside
    * whole-stage codegen.
    */
  def interleave(qs: Seq[Column], bits: Int): Column = {
    val n = qs.size
    require(n >= 2 && n <= 4, s"z-order interleaves 2-4 columns, got $n")
    require(bits >= 1 && bits * n <= 62, s"bits*cols must fit a long: $bits*$n")
    val terms = for {
      b <- 0 until bits
      (q, i) <- qs.zipWithIndex
    } yield shiftleft(shiftright(q, b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduce(_.bitwiseOR(_))
  }
}
