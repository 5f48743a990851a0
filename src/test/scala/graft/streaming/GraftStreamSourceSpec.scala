package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.weblog.IcebergLikeTable

/** `readStream.format("graft")` — the table-as-stream SOURCE: standard
  * triggers and checkpoints over the change feed; a foreachBatch
  * consumer folding the windows into a replica converges to the batch
  * recompute across restarts, deletes included.
  */
class GraftStreamSourceSpec extends SparkTestBase {

  private def keyed(name: String): IcebergLikeTable =
    IcebergLikeTable(spark,
      Files.createTempDirectory(name).toString + "/t",
      "event", Seq("k"), numBuckets = 4)

  private def batchOf(ids: Range, host: String, v: Long): DataFrame = {
    import spark.implicits._
    ids.map(i => (s"k$i", "e", host, v)).toDF("k", "event", "hostname", "seq")
  }

  /** One AvailableNow run of the source folded into `tgt` (upserts +
    * delete tombstones through ONE merge per window, exactly-once on
    * the engine's batch id).
    */
  private def drain(src: IcebergLikeTable, tgt: IcebergLikeTable,
      checkpoint: String): Unit = {
    val stream = spark.readStream.format("graft")
      .option("path", src.path)
      .option("uniqueKeys", "k")
      .option("numBuckets", "4")
      .load()
    val fold: (Dataset[Row], Long) => Unit = { (batch, id) =>
      val upserts = batch
        .filter(col("_change_type").isin("insert", "update_postimage"))
        .drop("_change_type")
      val deletes = batch
        .filter(col("_change_type") === "delete")
        .select(col("k"), col("event"), col("_commit_version"))
        .distinct()
      tgt.merge(upserts, deletes, "_commit_version", Some(("srcstream", id)))
    }
    val q = stream.writeStream
      .foreachBatch(fold)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def sameRows(a: DataFrame, b: DataFrame): Unit =
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0,
      s"diverged: ${a.collect().toSeq.take(5)} vs ${b.collect().toSeq.take(5)}")

  test("checkpointed AvailableNow runs converge the replica across restarts") {
    val src = keyed("gss_src")
    val tgt = keyed("gss_tgt")
    val cp = Files.createTempDirectory("gss_cp").toString

    // run 1: initial load (the live snapshot as inserts)
    src.write(batchOf(0 until 30, "orig", 1L), "seq")
    drain(src, tgt, cp)
    sameRows(tgt.read.drop("_commit_version"), src.read)

    // run 2: restart from the checkpoint — update + delete arrive as
    // one incremental window, never a re-delivered initial load
    src.write(batchOf(0 until 5, "gen2", 2L), "seq")
    src.delete(col("k").isin("k10", "k11"))
    drain(src, tgt, cp)
    sameRows(tgt.read.drop("_commit_version"), src.read)
    assert(tgt.read.count() == 28)
    assert(tgt.read.filter(col("hostname") === "gen2").count() == 5)

    // run 3: caught up — a drain with no new commits changes nothing
    val v = tgt.currentVersion.get
    drain(src, tgt, cp)
    assert(tgt.currentVersion.contains(v))

    // run 4: merge-on-read delete flows through the same changelog
    src.deleteMergeOnRead(col("k") === "k3")
    drain(src, tgt, cp)
    sameRows(tgt.read.drop("_commit_version"), src.read)
    assert(tgt.read.count() == 27)
  }

  test("append-only tables stream their appends") {
    import spark.implicits._
    val src = IcebergLikeTable(spark,
      Files.createTempDirectory("gss_app").toString + "/t", "event", Nil)
    val cp = Files.createTempDirectory("gss_app_cp").toString
    src.append((0 until 10).map(i => (s"k$i", "e")).toDF("k", "event"))
    val got = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    def run(): Unit = {
      val fold: (Dataset[Row], Long) => Unit = { (batch, _) =>
        got ++= batch.select("k", "_commit_version").collect()
          .map(r => (r.getString(0), r.getLong(1)))
      }
      val q = spark.readStream.format("graft").option("path", src.path)
        .load()
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    assert(got.size == 10)
    src.append((10 until 13).map(i => (s"k$i", "e")).toDF("k", "event"))
    run()
    assert(got.size == 13, "the restart delivered only the appended window")
    assert(got.map(_._1).toSet == (0 until 13).map(i => s"k$i").toSet)
  }
}
