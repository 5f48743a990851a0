package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}
import graft.operators.Sketches

/** Streaming frequency sketch: events arrive in micro-batches, each
  * batch contributes one Count–Min sketch, and the running sketch is the
  * counter-wise union — the ingest-side shape of the q_cms_union gate.
  * Because the union is exactly lossless (bit-identical to a single
  * pass, proven in SketchesSpec), the streamed sketch answers heavy-
  * hitter queries with the same guarantees as a batch scan — no
  * reprocessing, state = one sketch regardless of stream length.
  */
class StreamingSketchSpec extends SparkTestBase {

  test("foreachBatch CMS fold equals the one-pass batch sketch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val users = Tables.events(spark, sf0001).select("user_id")
    val b0 = users.filter(col("user_id") % 2 === 0)
    val b1 = users.filter(col("user_id") % 2 =!= 0)

    val source = MemoryStream[Long]
    var sketch: Array[Byte] = Array.emptyByteArray
    val q = source.toDF().toDF("user_id")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sk = Sketches.singleSketch(batch, "user_id", 5e-4, 0.999, 42)
        sketch =
          if (sketch.isEmpty) sk
          else {
            import spark.implicits._
            Seq(sketch, sk).toDF("sk").agg(Sketches.cmsUnion(col("sk")))
              .collect()(0).getAs[Array[Byte]](0)
          }
      }
      .start()
    try {
      source.addData(b0.as[Long].collect().toIndexedSeq: _*)
      q.processAllAvailable()
      source.addData(b1.as[Long].collect().toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    val onePass = Sketches.singleSketch(users, "user_id", 5e-4, 0.999, 42)
    assert(java.util.Arrays.equals(sketch, onePass),
      "streamed sketch fold diverged from the one-pass batch sketch")
  }

  test("per-day HLL state accumulates across batches; rolling readout within bound") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-03-$day%02d 10:00:00")
    val source = MemoryStream[(String, java.sql.Timestamp)]
    val parsed = source.toDF().toDF("user_id", "event_ts")
    val q = Ingest.streamingEngagementSketches(parsed)
      .writeStream.outputMode("complete")
      .format("memory").queryName("eng_sketches").start()
    try {
      // batch 1: 50 users day 1; batch 2 OVERLAPS day 1 (u26..u75) and
      // opens day 2 — the day-1 sketch in the state store must absorb
      // the second batch, not restart
      source.addData((1 to 50).map(i => (s"u$i", ts(1))): _*)
      q.processAllAvailable()
      source.addData(((26 to 75).map(i => (s"u$i", ts(1))) ++
        (1 to 10).map(i => (s"u$i", ts(2)))): _*)
      q.processAllAvailable()
    } finally q.stop()

    val out = Ingest.rollingFromDaySketches(spark.table("eng_sketches"), 7, 28)
      .collect().map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // exact: day1 dau=75, day2 dau=10, day2 wau/mau = |{u1..u75}| = 75
    val (d1, d2) = (out("2024-03-01"), out("2024-03-02"))
    def within(est: Long, exact: Int) = math.abs(est - exact) <= exact * 0.05
    assert(within(d1._1, 75), s"day1 dau: $d1")
    assert(within(d2._1, 10) && within(d2._2, 75) && within(d2._3, 75),
      s"day2 (dau,wau,mau): $d2")
  }
}
