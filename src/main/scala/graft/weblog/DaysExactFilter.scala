package graft.weblog

import org.apache.spark.sql.sources

/** DAY-ALIGNED half-line filters on a `days()` transform's SOURCE
  * column — the pushed-filter shapes whose truth is CONSTANT across
  * every row of a day leaf, which is what lets the scan declare them
  * HANDLED (applied exactly by dropping whole leaves, no Spark
  * re-filter) and the aggregate pushdown answer
  * `count(*) … WHERE ts >= D1 AND ts < D2` — the universal dashboard
  * time slice — from the manifest alone.
  *
  * A leaf of `days(ts)` holds exactly the instants of one UTC day
  * `[d·86400e6, (d+1)·86400e6)` micros. A comparison against a literal
  * T decides whole leaves iff T sits ON a day boundary (`>=`/`<`) or
  * one micro before it (`>`/`<=`): then every row of every leaf falls
  * on one side. Unaligned literals translate to None and stay
  * residual — correctness never depends on alignment, only the
  * pushdown opportunity does. Timestamps compare as INSTANTS, so the
  * epoch-based day ordinal is timezone-free.
  */
private[graft] object DaysExactFilter {

  /** A predicate over the leaf's numeric value — the time ordinal
    * (days/hours) or the truncated value (truncate); None = the NULL
    * leaf (rows whose source is NULL, which no comparison keeps).
    */
  sealed trait Pred { def holds(ordinal: Option[Long]): Boolean }
  final case class Gte(d: Long) extends Pred {
    def holds(o: Option[Long]): Boolean = o.exists(_ >= d)
  }
  final case class Lt(d: Long) extends Pred {
    def holds(o: Option[Long]): Boolean = o.exists(_ < d)
  }
  case object NotNull extends Pred {
    def holds(o: Option[Long]): Boolean = o.isDefined
  }

  /** Micros-since-epoch of a pushed timestamp literal (both the legacy
    * and the Java-8 datetime API renderings Spark uses).
    */
  private def micros(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(t))
    case i: java.time.Instant =>
      Some(org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(i))
    case _ => None
  }

  /** An integral literal of a truncate() source. */
  private def integral(v: Any): Option[Long] = v match {
    case b: Byte => Some(b.toLong)
    case s: Short => Some(s.toLong)
    case i: Int => Some(i.toLong)
    case l: Long => Some(l)
    case _ => None
  }

  /** Half-line translation shared by every leaf-exact transform:
    * `value` extracts + validates the literal, `lower(m)` maps an
    * ALIGNED inclusive lower boundary to its leaf threshold and
    * `upper(m)` an aligned exclusive upper boundary; None from either
    * = unaligned/untranslatable (the filter stays residual — only the
    * pushdown opportunity depends on alignment, never correctness).
    * `>`/`<=` normalize onto `>=`/`<` one unit-of-least-count away
    * (micros for time transforms, 1 for integral truncation).
    */
  private def halfLines(f: sources.Filter, src: String,
      value: Any => Option[Long],
      lower: Long => Option[Long],
      upper: Long => Option[Long]): Option[Seq[Pred]] = f match {
    case sources.GreaterThanOrEqual(a, v) if a == src =>
      value(v).flatMap(lower).map(d => Seq(Gte(d)))
    case sources.GreaterThan(a, v) if a == src =>
      // x > T keeps whole leaves iff T+1 is an aligned lower boundary
      value(v).flatMap(m => lower(m + 1L)).map(d => Seq(Gte(d)))
    case sources.LessThan(a, v) if a == src =>
      value(v).flatMap(upper).map(d => Seq(Lt(d)))
    case sources.LessThanOrEqual(a, v) if a == src =>
      value(v).flatMap(m => upper(m + 1L)).map(d => Seq(Lt(d)))
    case sources.IsNotNull(a) if a == src =>
      // the NULL leaf holds exactly the NULL-source rows: leaf-exact
      Some(Seq(NotNull))
    case sources.AlwaysTrue() =>
      // no constraint: every leaf (incl. the NULL leaf) qualifies —
      // `DELETE FROM t` without a WHERE drops every leaf metadata-only
      Some(Seq.empty)
    case sources.And(l, r) =>
      for {
        a <- halfLines(l, src, value, lower, upper)
        b <- halfLines(r, src, value, lower, upper)
      } yield a ++ b
    case _ => None
  }

  /** Time transforms (days/hours — `unit` micros per leaf): the leaf
    * value is the UTC ordinal floor(micros / unit); a boundary decides
    * whole leaves iff it sits on a unit boundary.
    */
  def of(f: sources.Filter, src: String, unit: Long): Option[Seq[Pred]] = {
    def aligned(m: Long): Option[Long] =
      if (Math.floorMod(m, unit) == 0L) Some(Math.floorDiv(m, unit)) else None
    halfLines(f, src, micros, aligned, aligned)
  }

  /** `truncate(w, src)` over an integral source: the leaf value is the
    * truncated value floor(v / w)·w, covering `[leaf, leaf + w)` — a
    * width-aligned boundary compares directly against it.
    */
  def ofTruncate(f: sources.Filter, src: String, width: Long): Option[Seq[Pred]] = {
    def aligned(v: Long): Option[Long] =
      if (Math.floorMod(v, width) == 0L) Some(v) else None
    halfLines(f, src, integral, aligned, aligned)
  }

  /** CALENDAR-width time transforms (months/years, r13): the leaf
    * value is the Iceberg ordinal ((y−1970)·12+(mo−1), or y−1970); a
    * boundary decides whole leaves iff it is UTC midnight of the FIRST
    * of a month (respectively January 1st) — then the month/year
    * ordinals on either side split exactly, leap years included.
    */
  def ofCalendar(f: sources.Filter, src: String,
      yearsUnit: Boolean): Option[Seq[Pred]] = {
    def aligned(m: Long): Option[Long] = {
      if (Math.floorMod(m, PartitionTransforms.MicrosPerDay) != 0L) return None
      val d = java.time.LocalDate.ofEpochDay(
        Math.floorDiv(m, PartitionTransforms.MicrosPerDay))
      if (d.getDayOfMonth != 1) return None
      if (yearsUnit) {
        if (d.getMonthValue != 1) None else Some((d.getYear - 1970).toLong)
      } else Some((d.getYear - 1970).toLong * 12L + (d.getMonthValue - 1))
    }
    halfLines(f, src, micros, aligned, aligned)
  }
}
