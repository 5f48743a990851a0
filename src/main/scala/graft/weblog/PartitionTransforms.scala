package graft.weblog

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Iceberg-style HIDDEN PARTITIONING: the table declares a partition
  * TRANSFORM over a source data column (`days(ts)`, `hours(ts)`,
  * `truncate(n, col)`), the engine derives the partition value at
  * write and prunes partitions from predicates on the SOURCE column at
  * read — users never materialize, name, or filter by the partition
  * column (the classic Hive failure mode where forgetting
  * `AND dt = '2024-01-05'` scans the whole table; the reference's
  * Athena DDLs partition by projected year/month/day/hour strings for
  * exactly this access pattern).
  *
  * Transform values are Iceberg's own integer encodings — ordinals
  * since the Unix epoch (UTC-aligned, time-zone-free: epoch
  * arithmetic, not calendar rendering, so a session-TZ change between
  * writer and reader cannot mis-bucket or mis-prune):
  *
  *  - `days(col)`  → floor(unixMicros / 86_400_000_000)
  *  - `hours(col)` → floor(unixMicros /  3_600_000_000)
  *  - `truncate(w, col)` → floor-div(col, w) * w over integral columns
  *
  * Pruning composes with the manifest stats machinery rather than a
  * separate projection pass: every data file's partition value (parsed
  * from its immutable leaf path) INVERTS to a [min, max] interval of
  * the source column — a day ordinal is exactly one day of
  * microseconds — and those synthesized per-file bounds feed the same
  * [[FileStats.mayMatch]] interval satisfiability that stamped stats
  * use. Arbitrary AND/OR/IN/comparison predicates on the source column
  * prune files with zero new predicate-walking code, and unsupported
  * shapes are conservatively satisfiable (never unsound).
  */
object PartitionTransforms {

  private val MicrosPerHour = 3600000000L
  private val MicrosPerDay = 86400000000L

  sealed trait Transform {
    /** The source data column the transform derives from. */
    def source: String
    /** The derived partition value (a LONG column), exact floor
      * semantics for pre-epoch values too.
      */
    def derive: Column
    /** The inverse image of one partition value: the [min, max] bounds
      * (rendered per [[FileStats]]'s comparison convention for the
      * source type) of source values that map to it. None when the
      * path value does not parse — absence never prunes.
      */
    def sourceBounds(partValue: String): Option[(String, String)]
    /** The spec string, stamped into the table layout. */
    def spec: String
  }

  /** Exact floor division in longs (integer `/` truncates toward zero,
    * which mis-buckets pre-epoch timestamps and negative values).
    */
  private def floorDiv(c: Column, d: Long): Column =
    (c - pmod(c, lit(d))) / lit(d)

  final case class Days(source: String) extends Transform {
    def derive: Column = floorDiv(unix_micros(col(source)), MicrosPerDay).cast("long")
    def sourceBounds(v: String): Option[(String, String)] =
      scala.util.Try(v.toLong).toOption.map { d =>
        ((d * MicrosPerDay).toString, (d * MicrosPerDay + MicrosPerDay - 1).toString)
      }
    def spec: String = s"days($source)"
  }

  final case class Hours(source: String) extends Transform {
    def derive: Column = floorDiv(unix_micros(col(source)), MicrosPerHour).cast("long")
    def sourceBounds(v: String): Option[(String, String)] =
      scala.util.Try(v.toLong).toOption.map { h =>
        ((h * MicrosPerHour).toString, (h * MicrosPerHour + MicrosPerHour - 1).toString)
      }
    def spec: String = s"hours($source)"
  }

  /** Width-`w` truncation of an integral column — Iceberg's
    * `truncate[w]`: value → floor(value / w) * w, so each partition
    * holds one aligned width-w interval.
    */
  final case class Truncate(source: String, width: Long) extends Transform {
    require(width > 0, s"truncate width must be positive, got $width")
    def derive: Column = (floorDiv(col(source).cast("long"), width) * lit(width)).cast("long")
    def sourceBounds(v: String): Option[(String, String)] =
      scala.util.Try(v.toLong).toOption.map { lo =>
        (lo.toString, (lo + width - 1).toString)
      }
    def spec: String = s"truncate($width, $source)"
  }

  /** Iceberg's `void` transform — every row maps to the single null
    * partition (the encoding of an UNPARTITIONED table in a format
    * whose layout always carries a partition column, and the target
    * of a spec evolution that un-partitions a table). Derivation
    * ignores the source values; no predicate ever prunes on it.
    */
  final case class Void(source: String) extends Transform {
    def derive: Column = lit(null).cast("long")
    def sourceBounds(v: String): Option[(String, String)] = None
    def spec: String = s"void($source)"
  }

  private val DaysRe = """days\(\s*([A-Za-z0-9_]+)\s*\)""".r
  private val HoursRe = """hours\(\s*([A-Za-z0-9_]+)\s*\)""".r
  private val TruncRe = """truncate\(\s*(\d+)\s*,\s*([A-Za-z0-9_]+)\s*\)""".r
  private val VoidRe = """void\(\s*([A-Za-z0-9_]+)\s*\)""".r

  /** Parse a transform spec: `days(col)`, `hours(col)`,
    * `truncate(w, col)`, `void(col)`.
    */
  def parse(spec: String): Transform = spec.trim match {
    case DaysRe(c) => Days(c)
    case HoursRe(c) => Hours(c)
    case TruncRe(w, c) => Truncate(c, w.toLong)
    case VoidRe(c) => Void(c)
    case other => throw new IllegalArgumentException(
      s"unsupported partition transform '$other' " +
        "(supported: days(col), hours(col), truncate(w, col), void(col))")
  }
}
