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
}
