package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided deterministic parquet tables
  * (`/root/testdata/sf*` — see TESTDATA.md / FIXTURES.md §4).
  *
  * Each table is a single parquet file; `spark.read.parquet` gives us
  * vectorized scans, predicate pushdown and column pruning for free.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` has shipped in two physical encodings across testdata
    * generations: parquet TIMESTAMP(NANOS) — which Spark's reader rejects
    * ([PARQUET_TYPE_ILLEGAL]) unless read as raw nanos via the legacy
    * flag, then converted with *integer* division (double division at
    * ~1.7e18 nanos would lose microsecond precision) — and plain
    * timestamp[us] (TIMESTAMP_NTZ). Both normalize to TimestampType
    * (micros, UTC session), matching DuckDB's read of the same file.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = apply(spark, dir, "events")
    val ts = df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("timestamp_micros(ts div 1000)")
      case _ => col("ts").cast("timestamp")
    }
    df.withColumn("ts", ts)
  }
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")

  /** The TPC-H `partsupp` table, derived deterministically because the
    * driver's testdata ships no partsupp parquet (a data limitation, not
    * an engine one — see COVERAGE.md). Rows are the fact table's
    * DISTINCT `(l_partkey, l_suppkey)` pairs — preserving TPC-H's
    * referential integrity, every lineitem row finds its partsupp row —
    * with `ps_availqty`/`ps_supplycost` as pure integer functions of the
    * key pair, replayed verbatim by the DuckDB oracles
    * (`TpchQueries.PartsuppCte`), so the partsupp gates stay hash-exact.
    * MATERIALIZED once per (JVM, sf dir) as scratch parquet (r14): the
    * derivation is a full lineitem scan + a distinct shuffle, and every
    * partsupp-consuming gate (Q2/Q9/Q11/Q20 shapes) was re-paying it —
    * a real deployment has this table on disk, and parquet (unlike a
    * checkpoint) keeps column pruning and filter pushdown working for
    * the downstream plans. The file carries the derivation's input path
    * in its name, so two scale factors never collide.
    */
  def partsupp(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val safe = dir.replaceAll("[^A-Za-z0-9]", "_")
    val epoch = java.lang.management.ManagementFactory.getRuntimeMXBean.getStartTime
    val out = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      "graft_tables", s"partsupp_${safe}_$epoch").toString
    val p = new org.apache.hadoop.fs.Path(out)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Tables.synchronized {
      if (!fs.exists(new org.apache.hadoop.fs.Path(out, "_SUCCESS"))) {
        lineitem(spark, dir)
          .select(col("l_partkey").as("ps_partkey"),
            col("l_suppkey").as("ps_suppkey"))
          .distinct()
          .select(col("ps_partkey"), col("ps_suppkey"),
            ((col("ps_partkey") * 7 + col("ps_suppkey") * 13) % 9999 + 1)
              .cast("int").as("ps_availqty"),
            ((col("ps_partkey") * 31 + col("ps_suppkey") * 7919) % 1000 + 1)
              .as("ps_supplycost"))
          .write.mode("overwrite").parquet(out)
      }
    }
    spark.read.parquet(out)
  }
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
}
