package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** The reliable-checkpoint knob: with
  * `spark.graft.checkpoint.reliable=true` and a configured checkpoint
  * dir, the iterative operators cut lineage via durable `checkpoint()`
  * (executor-loss-safe on a real cluster) and must produce EXACTLY the
  * results of the default localCheckpoint path.
  */
class CheckpointSpec extends SparkTestBase {

  import spark.implicits._

  private def withReliable[A](body: => A): A = {
    val dir = Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set(Checkpoints.ReliableKey, "true")
    try body
    finally spark.conf.unset(Checkpoints.ReliableKey)
  }

  test("reliable=true without a checkpoint dir fails with a clear message") {
    val sc = spark.sparkContext
    // SparkContext has no unsetCheckpointDir; simulate via a fresh check
    if (sc.getCheckpointDir.isEmpty) {
      spark.conf.set(Checkpoints.ReliableKey, "true")
      try {
        val e = intercept[IllegalArgumentException](
          Checkpoints.cut(Seq(1).toDF("x")))
        assert(e.getMessage.contains("setCheckpointDir"))
      } finally spark.conf.unset(Checkpoints.ReliableKey)
    } else succeed
  }

  test("pageRank under reliable checkpointing matches localCheckpoint exactly") {
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 2L), (3L, 1L, 1L),
      (4L, 1L, 5L)).toDF("src", "dst", "weight")
    def run() = Graph.pageRank(edges, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val local = run()
    val reliable = withReliable(run())
    assert(reliable == local, s"reliable=$reliable local=$local")
  }

  test("clusters' distributed loop under reliable checkpointing matches") {
    // force the distributed min-label path with a tiny driver-solve bound
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L))
      .toDF("id_a", "id_b")
    def run() = Dedup.clusters(pairs, driverSolveMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = run()
    val reliable = withReliable(run())
    assert(reliable == local)
    assert(local(3L) == 1L && local(22L) == 20L && local(11L) == 10L)
  }

}
