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

  test("withIterationPlanning sizes loop shuffles from rows on an isolated session") {
    val aqeKey = "spark.sql.adaptive.enabled"
    val partsKey = "spark.sql.shuffle.partitions"
    val prevAqe = spark.conf.get(aqeKey)
    val prevParts = spark.conf.get(partsKey)
    // tiny loop frame → 1 partition, AQE off, on the LOOP session only;
    // the caller's session is untouched THROUGHOUT (not just restored
    // after — a concurrent query mid-loop plans under session confs)
    Checkpoints.withIterationPlanning(spark, loopRows = 100L) { loop =>
      assert(loop ne spark)
      assert(loop.conf.get(aqeKey) == "false")
      assert(loop.conf.get(partsKey) == "1")
      assert(spark.conf.get(aqeKey) == prevAqe)
      assert(spark.conf.get(partsKey) == prevParts)
      // a query planned on the CALLER's session mid-loop keeps the
      // session fan-out — the r15 shared-conf implementation gave it
      // the loop's 1-partition plan
      import spark.implicits._
      def exchangeParts(df: org.apache.spark.sql.DataFrame): Seq[Int] =
        ("hashpartitioning\\([^)]*, (\\d+)\\)").r
          .findAllMatchIn(df.queryExecution.executedPlan.toString)
          .map(_.group(1).toInt).toSeq
      val onCaller = Seq(1 -> "a", 2 -> "b").toDF("k", "v")
        .groupBy("k").count()
      assert(exchangeParts(onCaller) == Seq(prevParts.toInt),
        s"caller-session shuffle got ${exchangeParts(onCaller)}, want $prevParts")
      // while the SAME aggregate built on the loop session gets 1
      val onLoop = Checkpoints.rebind(Seq(1 -> "a", 2 -> "b").toDF("k", "v"), loop)
        .groupBy("k").count()
      assert(exchangeParts(onLoop) == Seq(1),
        s"loop-session shuffle got ${exchangeParts(onLoop)}, want 1")
    }
    assert(spark.conf.get(aqeKey) == prevAqe)
    assert(spark.conf.get(partsKey) == prevParts)
    // huge loop frame → clamped to the SESSION fan-out, never above it
    Checkpoints.withIterationPlanning(spark, loopRows = Long.MaxValue / 4) { loop =>
      assert(loop.conf.get(partsKey) == prevParts)
    }
    // escape hatch: iterate.aqe=true hands back the caller's session
    spark.conf.set(Checkpoints.IterateAqeKey, "true")
    try Checkpoints.withIterationPlanning(spark, 100L) { loop =>
      assert(loop eq spark)
      assert(loop.conf.get(aqeKey) == prevAqe)
      assert(loop.conf.get(partsKey) == prevParts)
    } finally spark.conf.unset(Checkpoints.IterateAqeKey)
    // a throwing body can't corrupt the caller's session (nothing on it
    // was ever mutated)
    intercept[RuntimeException](
      Checkpoints.withIterationPlanning(spark, 100L) { _ =>
        throw new RuntimeException("boom")
      })
    assert(spark.conf.get(aqeKey) == prevAqe)
    assert(spark.conf.get(partsKey) == prevParts)
  }

  test("rebind keeps results and checkpointed frames across sessions") {
    import spark.implicits._
    val cut = Checkpoints.cut(Seq(1L, 2L, 3L).toDF("x"))
    Checkpoints.withIterationPlanning(spark, 10L) { loop =>
      val onLoop = Checkpoints.rebind(cut, loop)
      assert(onLoop.sparkSession eq loop)
      assert(onLoop.agg(sum("x")).head.getLong(0) == 6L)
      val back = Checkpoints.rebind(onLoop, spark)
      assert(back.sparkSession eq spark)
      assert(back.agg(sum("x")).head.getLong(0) == 6L)
    }
  }

  test("pageRank under the iterate-AQE escape hatch matches the default exactly") {
    val edges = Seq((1L, 2L, 3L), (1L, 3L, 1L), (2L, 3L, 2L), (3L, 1L, 1L),
      (4L, 1L, 5L)).toDF("src", "dst", "weight")
    def run() = Graph.pageRank(edges, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sized = run()
    spark.conf.set(Checkpoints.IterateAqeKey, "true")
    val aqe = try run() finally spark.conf.unset(Checkpoints.IterateAqeKey)
    assert(aqe == sized)
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
