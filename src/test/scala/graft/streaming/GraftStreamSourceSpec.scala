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

  test("admission control: chunked initial load + maxVersionsPerTrigger") {
    import spark.implicits._
    // 5 leaf partitions (events a..e), then 3 more commits
    val src = IcebergLikeTable(spark,
      Files.createTempDirectory("gss_adm").toString + "/t", "event", Nil)
    val events = Seq("a", "b", "c", "d", "e")
    src.append(
      (0 until 50).map(i => (s"k$i", events(i % 5))).toDF("k", "event"))
    for (g <- 1 to 3)
      src.append(Seq((s"extra$g", "a")).toDF("k", "event"))

    val cp = Files.createTempDirectory("gss_adm_cp").toString
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val got = scala.collection.mutable.ArrayBuffer.empty[String]
    def run(): Unit = {
      val fold: (Dataset[Row], Long) => Unit = { (batch, _) =>
        val ks = batch.select("k").collect().map(_.getString(0))
        batches += ks.length.toLong
        got ++= ks
      }
      val q = spark.readStream.format("graft").option("path", src.path)
        .option("initialChunkLeaves", "2")     // 5 leaves -> 3 chunks
        .option("maxVersionsPerTrigger", "1")  // then 1 version per batch
        .load()
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    run()
    // one AvailableNow run drains everything that existed at its start:
    // 3 bounded initial chunks, then nothing (the pin covered v1..v4
    // but the initial snapshot was taken at the pinned version)
    assert(got.size == 53, s"initial load incomplete: ${got.size}")
    assert(got.toSet ==
      ((0 until 50).map(i => s"k$i") ++ (1 to 3).map(g => s"extra$g")).toSet)
    assert(batches.size >= 3, s"initial load was not chunked: $batches")
    assert(batches.max < 53, "one batch carried the whole snapshot")
    assert(!got.groupBy(identity).exists(_._2.size > 1), "duplicate rows")

    // lagging restart: 3 new commits arrive one version per batch
    batches.clear()
    for (g <- 4 to 6)
      src.append(Seq((s"extra$g", "b")).toDF("k", "event"))
    run()
    assert(got.size == 56)
    assert(batches.count(_ > 0) == 3,
      s"maxVersionsPerTrigger=1 should deliver 3 single-version batches: $batches")
  }

  test("admission control: maxBytesPerTrigger caps chunks and version advancement") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.SerializedOffset
    val src = IcebergLikeTable(spark,
      Files.createTempDirectory("gss_bytes").toString + "/t", "event", Nil)
    src.append((0 until 400).map(i => (s"k$i", s"e${i % 4}")).toDF("k", "event"))
    for (g <- 1 to 3)
      src.append((0 until 50).map(i => (s"x${g}_$i", "e0")).toDF("k", "event"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("event",
        org.apache.spark.sql.types.StringType)))
    def source(maxBytes: Long) = new GraftTableSource(spark.sqlContext, src,
      schema, maxVersionsPerTrigger = Int.MaxValue,
      initialChunkLeaves = Int.MaxValue, maxChunksPerTrigger = 1,
      maxBytesPerTrigger = maxBytes)

    // INITIAL LOAD: a budget of a quarter of the snapshot forces >= 4
    // byte-sized chunks even though the leaf-count knob allows one
    val quarter = math.max(1L, src.dataBytesAt(4) / 4)
    val o1 = source(quarter).latestOffset(null, null).json
    val re = """\{"v":4,"c":1,"k":(\d+)\}""".r
    o1 match {
      case re(k) => assert(k.toInt >= 4, s"byte budget ignored: $o1")
      case other => fail(s"expected a chunked offset, got $other")
    }
    // VERSION ADVANCEMENT from v1: a budget of exactly bytes(v1->v3)
    // admits v2+v3 and stops before v4
    val twoCommits = src.addedBytesBetween(1, 3)
    val oMid = source(twoCommits).latestOffset(SerializedOffset("1"), null)
    assert(oMid.json == "3", s"expected v3, got ${oMid.json}")
    // a 1-byte budget still drains one version per trigger (an
    // oversized commit must not stall the stream)
    val oStep = source(1L).latestOffset(SerializedOffset("1"), null)
    assert(oStep.json == "2", s"expected v2, got ${oStep.json}")
    // unlimited budget jumps straight to live
    val oAll = source(Long.MaxValue).latestOffset(SerializedOffset("1"), null)
    assert(oAll.json == "4")

    // end-to-end through the OPTION: a sub-snapshot byte budget splits
    // the AvailableNow drain into multiple micro-batches, losing nothing
    val cp = Files.createTempDirectory("gss_bytes_cp").toString
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val fold: (Dataset[Row], Long) => Unit = (b, _) => batches += b.count()
    val q = spark.readStream.format("graft").option("path", src.path)
      .option("maxBytesPerTrigger", (src.dataBytesAt(4) / 3).toString)
      .load().writeStream.foreachBatch(fold)
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(batches.sum == 550, s"lost rows: $batches")
    assert(batches.count(_ > 0) >= 2, s"byte budget did not split the drain: $batches")
  }

  test("a checkpoint resume mid-initial-load re-slices identical chunks") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.SerializedOffset
    val src = IcebergLikeTable(spark,
      Files.createTempDirectory("gss_resume").toString + "/t", "event", Nil)
    src.append(
      (0 until 40).map(i => (s"k$i", s"e${i % 4}")).toDF("k", "event"))
    def collectKs(df: DataFrame): Set[String] = {
      // getBatch returns a streaming-flagged LogicalRDD (the V1
      // contract); lift its computed rows back out as a batch frame
      val rdd = df.queryExecution.logical
        .collectFirst { case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd }.get
      org.apache.spark.sql.graftbridge.StreamingFrameBridge
        .batchFrame(spark, rdd, df.schema)
        .select("k").collect().map(_.getString(0)).toSet
    }
    def source() = new GraftTableSource(spark.sqlContext, src,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("event",
          org.apache.spark.sql.types.StringType))),
      maxVersionsPerTrigger = Int.MaxValue,
      initialChunkLeaves = 1, maxChunksPerTrigger = 1)

    // trigger 1 on a fresh source: first chunk of 4
    val s1 = source()
    val o1 = s1.latestOffset(null, null)
    assert(o1.json == """{"v":1,"c":1,"k":4}""")
    val b1 = s1.getBatch(None, o1.asInstanceOf[
      org.apache.spark.sql.execution.streaming.Offset])
    val ks1 = collectKs(b1)

    // crash; a NEW source resumes from the checkpointed json string
    val s2 = source()
    val o2 = s2.latestOffset(SerializedOffset(o1.json), null)
    assert(o2.json == """{"v":1,"c":2,"k":4}""")
    val b2 = s2.getBatch(Some(SerializedOffset(o1.json)), o2.asInstanceOf[
      org.apache.spark.sql.execution.streaming.Offset])
    val ks2 = collectKs(b2)
    assert(ks1.intersect(ks2).isEmpty, "resume re-delivered a chunk")

    // drain the rest through one more resume pair
    val o3 = s2.latestOffset(SerializedOffset(o2.json), null)
    val b3 = s2.getBatch(Some(SerializedOffset(o2.json)), o3.asInstanceOf[
      org.apache.spark.sql.execution.streaming.Offset])
    val o4 = s2.latestOffset(SerializedOffset(o3.json), null)
    assert(o4.json == "1", s"final offset should be the bare version: ${o4.json}")
    val b4 = s2.getBatch(Some(SerializedOffset(o3.json)), o4.asInstanceOf[
      org.apache.spark.sql.execution.streaming.Offset])
    val all = ks1 ++ ks2 ++ collectKs(b3) ++ collectKs(b4)
    assert(all == (0 until 40).map(i => s"k$i").toSet)

    // caught up: the offset stops moving
    val o5 = s2.latestOffset(SerializedOffset(o4.json), null)
    assert(o5.json == o4.json)
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
