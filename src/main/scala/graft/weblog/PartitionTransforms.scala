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

  private[weblog] val MicrosPerHour = 3600000000L
  private[weblog] val MicrosPerDay = 86400000000L

  sealed trait Transform {
    /** The source data column the transform derives from. */
    def source: String
    /** ALL source data columns ([[Multi]] has several; every other
      * transform exactly one).
      */
    def sources: Seq[String] = Seq(source)
    /** The derived partition value (a LONG column for the single
      * transforms; a composite STRING for [[Multi]]), exact floor
      * semantics for pre-epoch values too.
      */
    def derive: Column
    /** The inverse image of one partition value: the [min, max] bounds
      * (rendered per [[FileStats]]'s comparison convention for the
      * source type) of source values that map to it. None when the
      * path value does not parse — absence never prunes.
      */
    def sourceBounds(partValue: String): Option[(String, String)]
    /** Per-SOURCE-column inverse bounds of one partition value — the
      * multi-leg generalization of [[sourceBounds]] ([[Multi]] emits
      * one interval per leg, so a predicate on ANY leg's source prunes
      * independently). Absence of a column never prunes it.
      */
    def allBounds(partValue: String): Map[String, (String, String)] =
      sourceBounds(partValue).map(source -> _).toMap
    /** Per-SOURCE-column MEMBERSHIP oracles of one partition value —
      * the point-predicate analogue of [[allBounds]] for transforms
      * whose inverse image is a hash class, not an interval
      * ([[Bucket]]): `(literal, columnType) => Some(false)` when the
      * literal provably cannot live in this partition (its bucket
      * differs), Some(true) when it can, None when undecidable. Feeds
      * [[FileStats.mayMatch]]'s `Membership` hook, so `=` / `IN`
      * point lookups prune files with zero new predicate-walking code.
      * Empty for interval transforms — absence never prunes.
      */
    def allMembers(partValue: String)
        : Map[String, (Any, org.apache.spark.sql.types.DataType) => Option[Boolean]] =
      Map.empty
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

  /** The UTC calendar DATE of a timestamp, derived TZ-FREE: epoch-day
    * arithmetic into a DateType (dates carry no zone), so a session-TZ
    * change between writer and reader cannot mis-bucket or mis-prune —
    * the same posture as the ordinal transforms. Foundation of the
    * calendar-width transforms ([[Months]], [[Years]]).
    */
  private def utcDate(c: Column): Column =
    date_add(lit(java.sql.Date.valueOf("1970-01-01")),
      floorDiv(unix_micros(c), MicrosPerDay).cast("int"))

  /** Iceberg's `month` transform: `(year − 1970) · 12 + (month − 1)`
    * of the UTC calendar instant — the standard archival layout
    * (`PARTITIONED BY (months(ts))`). Calendar-width partitions: the
    * inverse image of one ordinal is that month's [first, last]
    * microsecond via java.time, feeding the same interval pruning as
    * the fixed-width transforms.
    */
  final case class Months(source: String) extends Transform {
    def derive: Column = {
      val d = utcDate(col(source))
      ((year(d) - lit(1970)) * lit(12) + month(d) - lit(1)).cast("long")
    }
    def sourceBounds(v: String): Option[(String, String)] =
      scala.util.Try {
        val m = v.toLong
        val y = 1970L + java.lang.Math.floorDiv(m, 12L)
        val start = java.time.LocalDate.of(
          java.lang.Math.toIntExact(y),
          java.lang.Math.floorMod(m, 12L).toInt + 1, 1)
        ((start.toEpochDay * MicrosPerDay).toString,
          (start.plusMonths(1).toEpochDay * MicrosPerDay - 1).toString)
      }.toOption
    def spec: String = s"months($source)"
  }

  /** Iceberg's `year` transform: `year − 1970` of the UTC calendar
    * instant.
    */
  final case class Years(source: String) extends Transform {
    def derive: Column = (year(utcDate(col(source))) - lit(1970)).cast("long")
    def sourceBounds(v: String): Option[(String, String)] =
      scala.util.Try {
        val y = 1970L + v.toLong
        val start = java.time.LocalDate.of(java.lang.Math.toIntExact(y), 1, 1)
        ((start.toEpochDay * MicrosPerDay).toString,
          (start.plusYears(1).toEpochDay * MicrosPerDay - 1).toString)
      }.toOption
    def spec: String = s"years($source)"
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

  /** Iceberg's `bucket[n]` transform — `pmod(xxhash64(col), n)`, the
    * standard layout for KEYED tables (the reference's own
    * `unique_keys ["user_id","timestamp"]` table,
    * `web-analytics-iceberg/.example.cdk.context.json:22-24`, is
    * exactly the shape Iceberg buckets): a point lookup
    * `user_id = ?` hashes to exactly ONE leaf — the GDPR /
    * user-history access pattern at 100 TB, where pruning 15/16 of
    * the files IS the query cost.
    *
    * The hash is Spark's own `xxhash64` (seed 42), BIT-IDENTICAL to
    * the SPJ FunctionCatalog's `bucket(n, keys...)`
    * ([[graft.sources.GraftBucketFunction]]) and the
    * keyed upsert layout's `gbucket` routing — so storage buckets and
    * Spark's `KeyGroupedPartitioning` agree and a
    * `PARTITIONED BY (bucket(16, user_id))` table joins shuffle-free.
    * NULL sources derive NULL (Iceberg's null partition), which keeps
    * `IS NOT NULL` leaf decisions sound and never aliases NULL into a
    * real bucket.
    *
    * A bucket value is NOT interval-invertible: [[sourceBounds]] is
    * None (interval pruning never engages) and pruning rides
    * [[allMembers]] point-membership instead. Bucket predicates are
    * also never HANDLED (row-exact): a leaf holds every value of its
    * hash class, so the scan keeps them residual and Spark re-applies.
    */
  final case class Bucket(source: String, numBuckets: Int) extends Transform {
    require(numBuckets > 0, s"bucket count must be positive, got $numBuckets")
    def derive: Column =
      when(col(source).isNull, lit(null).cast("long"))
        .otherwise(pmod(xxhash64(col(source)), lit(numBuckets.toLong)))
    def sourceBounds(v: String): Option[(String, String)] = None
    override def allMembers(v: String)
        : Map[String, (Any, org.apache.spark.sql.types.DataType) => Option[Boolean]] =
      v.toLongOption match {
        case Some(b) if b >= 0 && b < numBuckets =>
          Map(source -> ((value: Any, dt: org.apache.spark.sql.types.DataType) =>
            try Some(Math.floorMod(BloomStats.hashOf(value, dt),
              numBuckets.toLong) == b)
            catch { case scala.util.control.NonFatal(_) => None }))
        case _ => Map.empty // foreign/null leaf value: never prunes
      }
    def spec: String = s"bucket($numBuckets, $source)"
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

  /** IDENTITY leg of a composite spec: the partition value is the
    * source value itself (Iceberg's identity transform). Only valid
    * inside [[Multi]] — a standalone identity partition is the
    * physical-partition-column layout (no hidden transform at all).
    * The rendering escapes `%` and the [[Multi]] separator `|` so the
    * composite value splits unambiguously; NULL renders as the
    * reserved token `%N` (unreachable otherwise, since `%` escapes).
    */
  final case class Identity(source: String) extends Transform {
    def derive: Column = Multi.escaped(col(source))
    def sourceBounds(v: String): Option[(String, String)] =
      if (v == Multi.NullToken) None
      else Some((Multi.unescape(v), Multi.unescape(v)))
    def spec: String = s"identity($source)"
  }

  /** COMPOSITE (multi-column) partition spec — Iceberg's
    * `PARTITIONED BY (days(ts), event)` / the reference's own 4-level
    * year/month/day/hour raw-zone layout
    * (`athena_named_query.py:33-37`) expressed in a format that
    * carries ONE partition dimension: the derived value is the legs'
    * renderings joined by `|` (each leg escaped, so the split is
    * injective), and the inverse image emits one interval PER LEG —
    * a predicate on any single leg's source column prunes files
    * independently, and multi-leg predicates compose by interval
    * intersection inside [[FileStats.mayMatch]].
    */
  final case class Multi(legs: Seq[Transform]) extends Transform {
    require(legs.size >= 2, "multi(...) needs at least two legs")
    require(legs.forall {
      case _: Multi | _: Void => false
      case _ => true
    }, "multi legs must be days/hours/months/years/truncate/bucket/" +
      "identity transforms")
    require(legs.flatMap(_.sources).distinct.size == legs.size,
      s"multi legs must use distinct source columns: ${spec}")
    def source: String = legs.head.source
    override def sources: Seq[String] = legs.map(_.source)
    def derive: Column =
      concat_ws(Multi.Sep, legs.map {
        case i: Identity => i.derive
        case t => coalesce(t.derive.cast("string"), lit(Multi.NullToken))
      }: _*)
    def sourceBounds(v: String): Option[(String, String)] =
      allBounds(v).get(source)
    override def allBounds(v: String): Map[String, (String, String)] = {
      // -1 keeps trailing empty parts; a part-count mismatch means the
      // value was not written by this spec — contribute nothing (sound)
      val parts = v.split(java.util.regex.Pattern.quote(Multi.Sep), -1)
      if (parts.length != legs.size) Map.empty
      else legs.zip(parts).flatMap { case (leg, part) =>
        if (part == Multi.NullToken) None
        else leg.sourceBounds(part).map(leg.source -> _)
      }.toMap
    }
    override def allMembers(v: String)
        : Map[String, (Any, org.apache.spark.sql.types.DataType) => Option[Boolean]] = {
      val parts = v.split(java.util.regex.Pattern.quote(Multi.Sep), -1)
      if (parts.length != legs.size) Map.empty
      else legs.zip(parts).flatMap { case (leg, part) =>
        if (part == Multi.NullToken) Map.empty
        else leg.allMembers(part)
      }.toMap
    }
    def spec: String = s"multi(${legs.map(_.spec).mkString(", ")})"
  }

  object Multi {
    /** Composite-value separator. Leg renderings escape it (and `%`),
      * so splitting on it is injective.
      */
    private[weblog] val Sep = "|"
    /** Reserved NULL rendering — unreachable from real values because
      * `%` itself escapes to `%25`.
      */
    private[weblog] val NullToken = "%N"
    /** Escape a leg value for composite rendering: `%`→`%25`,
      * `|`→`%7C`; NULL → the reserved token.
      */
    private[weblog] def escaped(c: Column): Column =
      coalesce(
        regexp_replace(regexp_replace(c.cast("string"),
          lit("%"), lit("%25")), lit("\\|"), lit("%7C")),
        lit(NullToken))
    private[weblog] def unescape(v: String): String =
      v.replace("%7C", "|").replace("%25", "%")
  }

  private val DaysRe = """days\(\s*([A-Za-z0-9_]+)\s*\)""".r
  private val HoursRe = """hours\(\s*([A-Za-z0-9_]+)\s*\)""".r
  private val MonthsRe = """months\(\s*([A-Za-z0-9_]+)\s*\)""".r
  private val YearsRe = """years\(\s*([A-Za-z0-9_]+)\s*\)""".r
  private val TruncRe = """truncate\(\s*(\d+)\s*,\s*([A-Za-z0-9_]+)\s*\)""".r
  private val BucketRe = """bucket\(\s*(\d+)\s*,\s*([A-Za-z0-9_]+)\s*\)""".r
  private val VoidRe = """void\(\s*([A-Za-z0-9_]+)\s*\)""".r
  private val IdentRe = """identity\(\s*([A-Za-z0-9_]+)\s*\)""".r

  /** Split a `multi(...)` body on TOP-LEVEL commas only (a truncate
    * leg carries its own comma).
    */
  private def splitLegs(body: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var start = 0
    body.zipWithIndex.foreach { case (ch, i) =>
      ch match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case ',' if depth == 0 => out += body.substring(start, i); start = i + 1
        case _ =>
      }
    }
    out += body.substring(start)
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  /** Parse a transform spec: `days(col)`, `hours(col)`,
    * `truncate(w, col)`, `void(col)`, or a composite
    * `multi(leg, leg, ...)` whose legs additionally allow
    * `identity(col)`.
    */
  def parse(spec: String): Transform = spec.trim match {
    case DaysRe(c) => Days(c)
    case HoursRe(c) => Hours(c)
    case MonthsRe(c) => Months(c)
    case YearsRe(c) => Years(c)
    case TruncRe(w, c) => Truncate(c, w.toLong)
    case BucketRe(n, c) => Bucket(c, n.toInt)
    case VoidRe(c) => Void(c)
    case s if s.startsWith("multi(") && s.endsWith(")") =>
      Multi(splitLegs(s.stripPrefix("multi(").stripSuffix(")")).map {
        case IdentRe(c) => Identity(c)
        case leg => parse(leg)
      })
    case other => throw new IllegalArgumentException(
      s"unsupported partition transform '$other' " +
        "(supported: days(col), hours(col), months(col), years(col), " +
        "truncate(w, col), bucket(n, col), void(col), " +
        "multi(leg, ...) with identity(col) legs)")
  }
}
