package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot keys (the 100 TB reality: one power
  * user / one viral page dominates a shuffle partition). AQE's skew-join
  * splitting covers sort-merge joins at runtime; these helpers cover the
  * two cases it doesn't: skewed *aggregations* and broadcast-side
  * replication joins.
  */
object Skew {

  /** Two-phase (salted) aggregation: count-like/sum-like partial
    * aggregates are computed per (key, salt) — spreading a hot key over
    * `saltBuckets` reducers — then combined per key. Correct for any
    * commutative-associative aggregate expressed as (partial, merge).
    *
    * Example:
    *   saltedAgg(events, Seq("user_id"), 16,
    *     partial = Seq(count(lit(1)).as("c")),
    *     merge   = Seq(sum("c").as("cnt")))
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int,
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    // the salt only needs DISPERSION, not stability: it is consumed
    // entirely inside this two-phase aggregate (the exact merge removes
    // it), so its layout-dependence (partition id + row position) is
    // harmless — do not reuse this salt for anything keyed across jobs.
    val salted = df.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    salted
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Salted equi-join for a skewed left side against a *small-ish* right
    * side: left keys get a random salt in [0, saltBuckets), the right
    * side is replicated once per salt value, and the join key becomes
    * (key, salt). Use when the right side is too big to broadcast whole
    * but its replication factor is affordable — the classic middle
    * ground between broadcast and AQE skew-split.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val replicatedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltBuckets - 1)).cast("array<long>")))
    saltedLeft.join(replicatedRight, Seq(key, "_salt")).drop("_salt")
  }
}
