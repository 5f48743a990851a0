package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join shapes Spark SQL lacks as first-class operators, composed from
  * built-ins so Catalyst/Tungsten keep optimizing them (SURVEY.md §2.4
  * "implication": the engine owns the full analytics repertoire the
  * reference delegated to Athena/Trino).
  */
object Joins {

  /** Backward as-of join: for each left row, attach the single *latest*
    * right row with `right.timeCol <= left.timeCol` and equal `keys`
    * (nulls when none). The classic composition would be a range join +
    * per-left-row argmax; instead this is the single-shuffle formulation:
    * tag the two inputs, union them, and run one window per key ordered
    * by (time, side) propagating the last-seen right payload — so right
    * rows sort immediately before left rows at equal time (inclusive
    * semantics), and the operator costs ONE exchange on `keys` plus a
    * linear pass, with no join node, no range explosion, and no per-row
    * state beyond the running payload. At 100 TB this behaves like any
    * keyed window (sessionize): skew = hot key, mitigated upstream by
    * key salting if a single key's history exceeds a task.
    *
    * `rightCols` are the payload columns to carry (must not collide with
    * left column names); ties among right rows at equal (key, time) are
    * broken deterministically by the *largest* payload struct, so put an
    * ordering column (e.g. an event id) first in `rightCols`.
    */
  def asOfBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, rightCols: Seq[String]): DataFrame = {
    val l = left.withColumn("_t", col(leftTime)).withColumn("_side", lit(1))
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTime).as("_t"), lit(0).as("_side"),
        struct(rightCols.map(col): _*).as("_p")): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"), col("_p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_match", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(left.columns.map(col) ++ rightCols.map(c => col(s"_match.$c").as(c)): _*)
  }

  /** Bucketed range join: pairs every point (`points.valueCol`) with every
    * interval (`intervals.[loCol, hiCol]`, inclusive) containing it. The
    * naive plan is a broadcast-nested-loop theta join — quadratic and
    * only viable when one side is tiny. This is the scale path: intervals
    * explode to the fixed-width buckets they overlap, points hash to
    * their bucket, and the pairing becomes a shuffled *equi*-join on the
    * bucket key refined by the exact BETWEEN predicate. Cost is
    * proportional to true overlaps (plus interval_span/bucketWidth
    * replicas per interval), not |points| × |intervals|. Pick
    * `bucketWidth` near the median interval span so each interval lands
    * in ~2 buckets.
    */
  def rangeJoinBucketed(points: DataFrame, valueCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val iv = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("_bucket", explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    val pt = points.withColumn("_bucket", floor(col(valueCol) / bucketWidth).cast("long"))
    pt.join(iv, Seq("_bucket"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) <= col(hiCol))
      .drop("_bucket")
  }
}
