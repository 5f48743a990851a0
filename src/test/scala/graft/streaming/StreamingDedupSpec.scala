package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}
import graft.operators.Dedup

/** Streaming corpus dedup: documents arrive in micro-batches and each
  * batch is incrementally deduplicated against the accumulated keeper
  * set via `foreachBatch` + `Dedup.incrementalKeepers` — the continuous
  * version of the dedup_incremental_fold gate. The invariant proven
  * here: the streaming fold over N batches equals the batch replay of
  * the same fold (so the gate's DuckDB oracle transitively checks the
  * streaming composition too).
  */
class StreamingDedupSpec extends SparkTestBase {

  test("foreachBatch incremental dedup equals the batch fold replay") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = Tables.documents(spark, sf001).select("doc_id", "text")
    val b0 = docs.filter(col("doc_id") % 2 === 0)
    val b1 = docs.filter(col("doc_id") % 2 =!= 0)

    // streaming side: two micro-batches folded through foreachBatch
    val source = MemoryStream[(Long, String)]
    var keepers: Option[DataFrame] = None
    val q = source.toDF().toDF("doc_id", "text")
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val kept = keepers match {
          case None => Dedup.minhashKeepers(batch)
          case Some(st) => Dedup.incrementalKeepers(st, batch)
        }
        // localCheckpoint: the accumulated state must not re-execute
        // prior batches' (ephemeral) plans on the next fold step
        val next = keepers.map(_.unionAll(kept)).getOrElse(kept).localCheckpoint()
        keepers = Some(next)
      }
      .start()
    try {
      source.addData(b0.as[(Long, String)].collect().toIndexedSeq: _*)
      q.processAllAvailable()
      source.addData(b1.as[(Long, String)].collect().toIndexedSeq: _*)
      q.processAllAvailable()
    } finally q.stop()

    // batch replay (the dedup_incremental_fold gate shape)
    val k0 = Dedup.minhashKeepers(b0)
    val k1 = Dedup.incrementalKeepers(k0, b1)
    val expected = k0.unionAll(k1).select("doc_id")

    val got = keepers.get.select("doc_id")
    assert(got.exceptAll(expected).count() == 0 && expected.exceptAll(got).count() == 0,
      "streaming fold diverged from the batch replay")
  }
}
