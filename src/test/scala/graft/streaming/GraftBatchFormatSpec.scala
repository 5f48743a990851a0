package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.weblog.IcebergLikeTable

/** Batch DataSource surface: `spark.read.format("graft")` /
  * `df.write.format("graft")` — the table as a plain batch
  * source/sink with SaveMode semantics and relation-level pruning
  * through the table's own planning stack.
  */
class GraftBatchFormatSpec extends SparkTestBase {

  private def tmp(name: String): String =
    Files.createTempDirectory(name).toString + "/t"

  private def rows(ids: Range, host: String, v: Long): DataFrame = {
    import spark.implicits._
    ids.map(i => (s"k$i", if (i % 2 == 0) "view" else "click", host, v))
      .toDF("k", "event", "hostname", "seq")
  }

  test("batch write + read round-trips; SaveMode semantics hold") {
    val root = tmp("bf_modes")
    rows(0 until 10, "orig", 1L).write.format("graft")
      .option("path", root).mode(SaveMode.Append).save()
    val back = spark.read.format("graft").option("path", root).load()
    assert(back.count() == 10)
    assert(back.columns.toSet == Set("k", "event", "hostname", "seq"))

    // ErrorIfExists refuses a second write
    intercept[IllegalStateException] {
      rows(0 until 2, "x", 2L).write.format("graft")
        .option("path", root).mode(SaveMode.ErrorIfExists).save()
    }
    // Ignore is a no-op on an existing table
    rows(0 until 2, "x", 2L).write.format("graft")
      .option("path", root).mode(SaveMode.Ignore).save()
    assert(spark.read.format("graft").option("path", root).load().count() == 10)
    // Append appends
    rows(10 until 15, "gen2", 2L).write.format("graft")
      .option("path", root).mode(SaveMode.Append).save()
    assert(spark.read.format("graft").option("path", root).load().count() == 15)
    // Overwrite replaces in one snapshot, history intact
    rows(0 until 3, "fresh", 3L).write.format("graft")
      .option("path", root).mode(SaveMode.Overwrite).save()
    val t = IcebergLikeTable(spark, root)
    assert(t.read.count() == 3)
    assert(t.readAt(t.currentVersion.get - 1).count() == 15,
      "overwrite keeps prior snapshots readable")
  }

  test("keyed batch append is an order-aware upsert") {
    val root = tmp("bf_keyed")
    def write(df: DataFrame): Unit = df.write.format("graft")
      .option("path", root).option("uniqueKeys", "k")
      .option("numBuckets", "4").option("orderCol", "seq")
      .mode(SaveMode.Append).save()
    write(rows(0 until 8, "orig", 2L))
    write(rows(0 until 4, "stale", 1L)) // older: must lose
    write(rows(4 until 8, "fresh", 3L)) // newer: must win
    val back = spark.read.format("graft").option("path", root)
      .option("uniqueKeys", "k").option("numBuckets", "4").load()
    assert(back.count() == 8)
    import spark.implicits._
    val hosts = back.select("k", "hostname").as[(String, String)].collect().toMap
    assert((0 until 4).forall(i => hosts(s"k$i") == "orig"))
    assert((4 until 8).forall(i => hosts(s"k$i") == "fresh"))
    // missing orderCol on a keyed table fails loudly
    intercept[Exception] {
      rows(0 until 1, "x", 9L).write.format("graft")
        .option("path", root).option("uniqueKeys", "k")
        .option("numBuckets", "4").mode(SaveMode.Append).save()
    }
  }

  test("relation pushes filters through the table's file pruning") {
    val root = tmp("bf_prune")
    val t = IcebergLikeTable(spark, root, "event",
      statsColumns = Seq("seq"))
    for (b <- 0 until 4)
      t.append(rows(b * 10 until (b + 1) * 10, "h", b.toLong).coalesce(1))
    assert(t.filesFor(col("seq") === 2L).size < t.filesFor(lit(true)).size)
    val back = spark.read.format("graft").option("path", root)
      .option("statsColumns", "seq").load()
    // correctness through arbitrary filters, translated or not
    assert(back.filter(col("seq") === 2L).count() == 10)
    assert(back.filter(col("seq") === 2L || col("seq") === 3L).count() == 20)
    assert(back.filter(!(col("seq") <= 1L)).count() == 20)
    assert(back.filter(col("hostname").startsWith("h")).count() == 40)
    assert(back.filter(length(col("k")) > 2).count() == 30) // untranslatable
    // column pruning + aggregates
    assert(back.select("k").distinct().count() == 40)
    assert(back.count() == 40)
  }

  test("hidden partitioning and MOR deletes compose with the batch relation") {
    import spark.implicits._
    val root = tmp("bf_hidden")
    val t = IcebergLikeTable(spark, root,
      partitionCol = "pday", partitionTransform = Some("days(ts)"))
    val day = (d: Int) => java.sql.Timestamp.valueOf(f"2024-03-$d%02d 10:00:00")
    t.append((1 to 4).map(d => (s"u$d", day(d))).toDF("user_id", "ts"))
    t.deletePositional(col("user_id") === "u2")
    val back = spark.read.format("graft").option("path", root)
      .option("partitionCol", "pday")
      .option("partitionTransform", "days(ts)").load()
    assert(back.columns.toSet == Set("user_id", "ts"), "partition col hidden")
    assert(back.count() == 3, "positional delete applied")
    assert(back.filter(col("ts") >= lit(day(3))).count() == 2)
  }
}
