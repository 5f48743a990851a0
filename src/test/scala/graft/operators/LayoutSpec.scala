package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

/** Measures the claim behind `Layout.writeZOrdered`: z-order clustering
  * bounds the per-file span of BOTH dimensions, where a 1-D sort bounds
  * one and destroys the other — the property parquet row-group /
  * manifest min-max pruning needs to skip data on either predicate.
  */
class LayoutSpec extends SparkTestBase {

  private def withHour(df: DataFrame): DataFrame =
    df.withColumn("hour", expr("unix_micros(ts) div 3600000000"))

  private def spans(path: String): (Double, Double, Long) = {
    val r = withHour(spark.read.parquet(path))
      .groupBy(input_file_name().as("f"))
      .agg(
        (max("user_id") - min("user_id")).as("uspan"),
        (max("hour") - min("hour")).as("hspan"))
      .agg(avg("uspan"), avg("hspan"), count(lit(1)))
      .collect()(0)
    (r.getDouble(0), r.getDouble(1), r.getLong(2))
  }

  test("z-order bounds per-file spans on both dimensions; 1-D sort does not") {
    val events = Tables.events(spark, sf001)
    val dir = Files.createTempDirectory("graft_layout").toString
    try {
      Layout.writeZOrdered(
        withHour(events), s"$dir/z", "user_id", "hour", bits = 8, targetFiles = 16)
      // baseline: the natural time-sorted layout at the same file count
      withHour(events)
        .repartitionByRange(16, col("ts")).sortWithinPartitions("ts")
        .write.parquet(s"$dir/bytime")

      val (zU, zH, zFiles) = spans(s"$dir/z")
      val (tU, tH, tFiles) = spans(s"$dir/bytime")
      assert(zFiles == 16 && tFiles == 16)

      val b = withHour(events)
        .agg(
          (max("user_id") - min("user_id")).as("ud"),
          (max("hour") - min("hour")).as("hd"))
        .collect()(0)
      val (uDomain, hDomain) = (b.getLong(0).toDouble, b.getLong(1).toDouble)

      // time-sorted files are tight on hour but span ~the full user domain
      assert(tU > 0.9 * uDomain, s"baseline unexpectedly user-clustered: $tU / $uDomain")
      // z-order keeps BOTH average spans well under the domain...
      assert(zU < 0.6 * uDomain, s"z user span $zU vs domain $uDomain")
      assert(zH < 0.6 * hDomain, s"z hour span $zH vs domain $hDomain")
      // ...and beats the baseline on the dimension the 1-D sort ignores
      assert(zU < 0.5 * tU, s"z user span $zU not better than baseline $tU")
      assert(tH <= zH, "1-D time sort should be at least as tight on hour")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("z-ordered write is a multiset-preserving relayout") {
    val events = Tables.events(spark, sf0001)
    val dir = Files.createTempDirectory("graft_layout_rt").toString
    try {
      Layout.writeZOrdered(
        withHour(events), s"$dir/z", "user_id", "hour", bits = 8, targetFiles = 4)
      val back = spark.read.parquet(s"$dir/z").drop("hour")
      assert(back.count() == events.count())
      assert(back.exceptAll(events).count() == 0)
      assert(events.exceptAll(back).count() == 0)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("z-ordered write of an empty frame produces an empty dataset, not a crash") {
    val dir = Files.createTempDirectory("graft_layout_empty").toString
    try {
      val empty = withHour(Tables.events(spark, sf0001)).filter(lit(false))
      Layout.writeZOrdered(empty, s"$dir/z", "user_id", "hour")
      assert(spark.read.parquet(s"$dir/z").count() == 0)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("interleaved key de-interleaves back to its bucket inputs") {
    import spark.implicits._
    val pairs = (for (a <- 0 until 16; b <- 0 until 16) yield (a.toLong, b.toLong))
      .toDF("a", "b")
    val z = pairs.select(
      col("a"), col("b"), Layout.interleaveBits(col("a"), col("b"), 4).as("z"))
    val back = (0 until 4).foldLeft(z.withColumn("a2", lit(0L)).withColumn("b2", lit(0L))) {
      (df, i) =>
        df.withColumn("a2",
            col("a2").bitwiseOR(shiftleft(
              shiftright(col("z"), 2 * i + 1).bitwiseAND(lit(1L)), i)))
          .withColumn("b2",
            col("b2").bitwiseOR(shiftleft(
              shiftright(col("z"), 2 * i).bitwiseAND(lit(1L)), i)))
    }
    assert(back.filter(col("a") =!= col("a2") || col("b") =!= col("b2")).count() == 0)
    // distinct inputs -> distinct keys (bijection on the bucket grid)
    assert(z.select("z").distinct().count() == 256)
  }
}
