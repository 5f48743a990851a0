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

  private val Day = PartitionTransforms.MicrosPerDay

  /** A predicate over the leaf's day ordinal (None = the NULL leaf —
    * rows whose source timestamp is NULL, which no comparison keeps).
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

  /** Translate one pushed filter into day-ordinal predicates; None =
    * not leaf-exact on `src` (another column, unaligned boundary,
    * unsupported shape).
    */
  def of(f: sources.Filter, src: String): Option[Seq[Pred]] = f match {
    case sources.GreaterThanOrEqual(a, v) if a == src =>
      micros(v).filter(m => Math.floorMod(m, Day) == 0L)
        .map(m => Seq(Gte(Math.floorDiv(m, Day))))
    case sources.GreaterThan(a, v) if a == src =>
      // ts > T keeps whole leaves iff T is the LAST micro of its day
      micros(v).filter(m => Math.floorMod(m + 1L, Day) == 0L)
        .map(m => Seq(Gte(Math.floorDiv(m + 1L, Day))))
    case sources.LessThan(a, v) if a == src =>
      micros(v).filter(m => Math.floorMod(m, Day) == 0L)
        .map(m => Seq(Lt(Math.floorDiv(m, Day))))
    case sources.LessThanOrEqual(a, v) if a == src =>
      micros(v).filter(m => Math.floorMod(m + 1L, Day) == 0L)
        .map(m => Seq(Lt(Math.floorDiv(m + 1L, Day))))
    case sources.IsNotNull(a) if a == src =>
      // the NULL leaf holds exactly the NULL-source rows: leaf-exact
      Some(Seq(NotNull))
    case sources.And(l, r) =>
      for { a <- of(l, src); b <- of(r, src) } yield a ++ b
    case _ => None
  }
}
