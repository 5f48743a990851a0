package graft.weblog

import org.apache.spark.sql.catalyst.expressions.{
  And, AttributeReference, BinaryComparison, EqualNullSafe, EqualTo, Expression,
  GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal, Or}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-file column min/max statistics stamped into the manifest at
  * commit, and the planning-time FILE SKIPPING they enable — the scan
  * planning half of Iceberg's manifest-entry stats (real Iceberg stores
  * lower/upper bounds per data file and prunes the file list before any
  * task is scheduled; Spark's own parquet row-group skipping still
  * schedules a task and opens a footer per file, so at millions of
  * files the planning-time prune is the one that matters).
  *
  * Format (manifest meta key `stats`, single JSON line):
  * `{"<relative/file>":{"<col>":["<min>","<max>"],…},…}` — bounds
  * rendered as strings, compared under the column's STAMPED schema type
  * (numeric / decimal / string; other types are never stamped). A file
  * or column with no entry is never pruned — absence is always sound.
  *
  * Pruning is interval satisfiability over the per-file box: a file
  * survives unless the predicate is provably false for EVERY row whose
  * stat columns lie inside [min, max]. Handled shapes: binary
  * comparisons and IN against literals, AND/OR. Anything else (casts
  * from type coercion, functions, NOT, null tests) is conservatively
  * satisfiable. String bounds compare as UTF-8 bytes — the same binary
  * ordering Spark's min/max aggregates use — so non-ASCII data cannot
  * make the prune unsound.
  */
object FileStats {

  /** Column types whose bounds are stamped and compared. Timestamps
    * stamp as MICROSECONDS since the epoch and dates as epoch DAYS
    * (r11) — Catalyst's own internal encodings, the same convention the
    * partition-transform SYNTHESIZED bounds already use — so the
    * freshness queries (`min/max(event_ts)`) answer from the manifest
    * and time-range predicates on non-partition timestamp columns
    * prune files. TimestampNTZ stays unstamped (its rendering is
    * session-zone-entangled).
    */
  def supported(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | StringType | TimestampType | DateType => true
    case _: DecimalType => true
    case _ => false
  }

  /** The manifest rendering of a bound under the column type: epoch
    * micros for timestamps, epoch days for dates (matching [[cmp]] and
    * the transform-synthesized bounds), plain string cast otherwise.
    */
  def boundRender(c: org.apache.spark.sql.Column,
      dt: DataType): org.apache.spark.sql.Column = dt match {
    case TimestampType => org.apache.spark.sql.functions.unix_micros(c)
      .cast(StringType)
    case DateType => org.apache.spark.sql.functions.datediff(c,
      org.apache.spark.sql.functions.lit(java.sql.Date.valueOf("1970-01-01")))
      .cast(StringType)
    case _ => c.cast(StringType)
  }

  type Stats = Map[String, Map[String, (String, String)]]

  private def mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m
  }

  /** One-line JSON rendering for the manifest meta value. */
  def toJson(stats: Stats): String = {
    val root = mapper.createObjectNode()
    stats.toSeq.sortBy(_._1).foreach { case (file, cols) =>
      val fnode = root.putObject(file)
      cols.toSeq.sortBy(_._1).foreach { case (c, (lo, hi)) =>
        val arr = fnode.putArray(c)
        arr.add(lo); arr.add(hi)
      }
    }
    mapper.writeValueAsString(root)
  }

  def fromJson(json: String): Stats = {
    val root = mapper.readTree(json)
    val files = Map.newBuilder[String, Map[String, (String, String)]]
    root.properties().forEach { e =>
      val cols = Map.newBuilder[String, (String, String)]
      e.getValue.properties().forEach { ce =>
        val arr = ce.getValue
        if (arr.isArray && arr.size == 2)
          cols += ce.getKey -> (arr.get(0).asText, arr.get(1).asText)
      }
      files += e.getKey -> cols.result()
    }
    files.result()
  }

  /** Typed comparison of a rendered bound against a literal value,
    * negative/zero/positive like compareTo; None when either side does
    * not parse under `dt` (never prune on a malformed bound).
    */
  private def cmp(bound: String, value: Any, dt: DataType): Option[Int] =
    try dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        val v = value match {
          case n: Number => n.longValue()
          case other => other.toString.toLong
        }
        Some(java.lang.Long.compare(bound.toLong, v))
      case FloatType =>
        // float bounds render as shortest-round-trip strings ("0.1"):
        // parsing them as DOUBLE yields a different real than the
        // stored float (0.1f != 0.1d) and could prune a file that
        // contains the value — parse back through Float, exact
        val v = value match {
          case n: Number => n.floatValue()
          case other => other.toString.toFloat
        }
        Some(java.lang.Float.compare(bound.toFloat, v))
      case DoubleType =>
        val v = value match {
          case n: Number => n.doubleValue()
          case other => other.toString.toDouble
        }
        Some(java.lang.Double.compare(bound.toDouble, v))
      case _: DecimalType =>
        Some(new java.math.BigDecimal(bound)
          .compareTo(new java.math.BigDecimal(value.toString)))
      case StringType =>
        val s = value match {
          case u: UTF8String => u.toString
          case other => other.toString
        }
        Some(java.util.Arrays.compareUnsigned(
          bound.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      case TimestampType | TimestampNTZType =>
        // bounds render as MICROSECONDS since the epoch (Catalyst's own
        // internal encoding, which is also what a timestamp Literal
        // evaluates to) — the shared convention of the
        // partition-transform SYNTHESIZED bounds
        // ([[PartitionTransforms]]) and, since r11, stamped
        // TimestampType stats ([[boundRender]])
        val v = value match {
          case n: Number => n.longValue()
          case other => other.toString.toLong
        }
        Some(java.lang.Long.compare(bound.toLong, v))
      case DateType =>
        // days since the epoch (Catalyst's internal date encoding)
        val v = value match {
          case n: Number => n.intValue()
          case other => other.toString.toInt
        }
        Some(java.lang.Integer.compare(bound.toInt, v))
      case _ => None
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Can `[lo, hi] op value` hold for some point of the interval? */
  private def intervalMayMatch(lo: String, hi: String, value: Any,
      dt: DataType, op: BinaryComparison): Boolean =
    (cmp(lo, value, dt), cmp(hi, value, dt)) match {
      case (Some(l), Some(h)) => op match {
        case _: EqualTo | _: EqualNullSafe => l <= 0 && h >= 0
        case _: LessThan => l < 0
        case _: LessThanOrEqual => l <= 0
        case _: GreaterThan => h > 0
        case _: GreaterThanOrEqual => h >= 0
        case _ => true
      }
      case _ => true
    }

  /** Flip a comparison so the attribute is on the left. */
  private def flip(op: BinaryComparison): BinaryComparison = op match {
    case EqualTo(l, r) => EqualTo(r, l)
    case EqualNullSafe(l, r) => EqualNullSafe(r, l)
    case LessThan(l, r) => GreaterThan(r, l)
    case LessThanOrEqual(l, r) => GreaterThanOrEqual(r, l)
    case GreaterThan(l, r) => LessThan(r, l)
    case GreaterThanOrEqual(l, r) => LessThanOrEqual(r, l)
    case other => other
  }

  /** Might any row of a file with bounds `cols` satisfy `e`? Sound:
    * returns true whenever it cannot prove otherwise. `schema` supplies
    * the stamped column types (bounds compare under the column type, so
    * a coerced literal of a DIFFERENT type falls back to satisfiable
    * via the cmp parse guard).
    */
  /** The constant value of a foldable operand (the analyzer wraps
    * literals in coercion Casts, so `Literal` alone never matches an
    * analyzed predicate); None for null constants or eval failures —
    * both keep the file.
    */
  private def constOf(e0: Expression): Option[Any] = {
    // RuntimeReplaceable wrappers (to_timestamp, to_date, …) report
    // foldable=false and refuse direct eval — fold through their
    // replacement FIRST, so `ts >= to_timestamp('2024-01-03')` prunes
    // exactly like a plain timestamp literal
    val e = e0.transformUp {
      case r: org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable =>
        r.replacement
    }
    if (!e.foldable) None
    else try Option(e.eval(org.apache.spark.sql.catalyst.InternalRow.empty))
    catch { case scala.util.control.NonFatal(_) => None }
  }

  /** The attribute under an operand, unwrapping the analyzer's NO-OP
    * coercion casts (`cast(n as bigint)` over a bigint column); a cast
    * that changes the type is not unwrapped — comparing under a changed
    * type could be unsound, so those predicates never prune.
    */
  private def attrOf(e: Expression): Option[AttributeReference] = e match {
    case a: AttributeReference => Some(a)
    case c: org.apache.spark.sql.catalyst.expressions.Cast =>
      c.child match {
        case a: AttributeReference if c.dataType == a.dataType => Some(a)
        case _ => None
      }
    case _ => None
  }

  /** Membership oracle for point predicates: `(column, value, type) =>
    * Some(false)` when the value is PROVABLY absent from the file (a
    * Bloom filter's no-false-negative direction); anything else keeps
    * the file. The default knows nothing.
    */
  type Membership = (String, Any, DataType) => Option[Boolean]
  val NoMembership: Membership = (_, _, _) => None

  def mayMatch(cols: Map[String, (String, String)], schema: StructType,
      e: Expression): Boolean = mayMatch(cols, schema, e, NoMembership)

  def mayMatch(cols: Map[String, (String, String)], schema: StructType,
      e: Expression, member: Membership): Boolean = e match {
    case And(l, r) =>
      mayMatch(cols, schema, l, member) && mayMatch(cols, schema, r, member)
    case Or(l, r) =>
      mayMatch(cols, schema, l, member) || mayMatch(cols, schema, r, member)
    case op: BinaryComparison => (attrOf(op.left), attrOf(op.right)) match {
      case (Some(a), None) if constOf(op.right).isDefined =>
        val intervalOk = (boundsOf(cols, schema, a.name), constOf(op.right)) match {
          case (Some((lo, hi, dt)), Some(c)) => intervalMayMatch(lo, hi, c, dt, op)
          case _ => true
        }
        val bloomOk = op match {
          case _: EqualTo | _: EqualNullSafe =>
            (constOf(op.right), schema.fields.find(_.name == a.name)) match {
              case (Some(c), Some(f)) => member(a.name, c, f.dataType).getOrElse(true)
              case _ => true
            }
          case _ => true
        }
        intervalOk && bloomOk
      case (None, Some(_)) if constOf(op.left).isDefined =>
        mayMatch(cols, schema, flip(op), member)
      case _ => true
    }
    case In(v, list) if attrOf(v).isDefined &&
        list.forall(l => constOf(l).isDefined) =>
      val a = attrOf(v).get
      val bounds = boundsOf(cols, schema, a.name)
      val field = schema.fields.find(_.name == a.name)
      list.exists { l =>
        constOf(l) match {
          case Some(c) =>
            val intervalOk = bounds match {
              case Some((lo, hi, dt)) =>
                intervalMayMatch(lo, hi, c, dt, EqualTo(v, Literal(null)))
              case None => true
            }
            val bloomOk = field match {
              case Some(f) => member(a.name, c, f.dataType).getOrElse(true)
              case None => true
            }
            intervalOk && bloomOk
          case None => true // a null in the IN list — undecidable, keep
        }
      }
    case _ => true
  }

  /** Types comparable by [[cmp]] — `supported` (stamped) plus the
    * timestamp/date encodings only partition-transform synthesized
    * bounds produce.
    */
  private def comparable(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType | DateType => true
    case other => supported(other)
  }

  private def boundsOf(cols: Map[String, (String, String)],
      schema: StructType, name: String): Option[(String, String, DataType)] =
    for {
      (lo, hi) <- cols.get(name)
      f <- schema.fields.find(_.name == name)
      if comparable(f.dataType)
    } yield (lo, hi, f.dataType)
}
