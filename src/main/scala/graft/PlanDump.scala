package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Local profiling harness (not part of the driver contract): writes
  * `df.explain("formatted")` for named `SparkEntry.queries` to
  * `plans/<tag>/<name>.txt` and prints the JOB/STAGE/TASK census of one
  * full execution — the structural evidence behind each optimization
  * claim (an iterative operator's cost is its per-iteration ACTIONS,
  * which the final explain cannot show).
  *
  * Usage: `sbt "runMain graft.PlanDump r15/before q_pagerank ..."`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.sameElements(Array("--list"))) {
      println("[plandump-headline] " + SparkEntry.headline.mkString(","))
      return
    }
    require(args.length >= 2, "usage: PlanDump <plans-subdir> <query>...")
    val tag = args.head
    val names = if (args.tail.sameElements(Array("--headline")))
      SparkEntry.headline else args.tail.toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        tasks += s.stageInfo.numTasks
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val outDir = Paths.get("plans", tag)
    Files.createDirectories(outDir)
    for (name <- names) {
      jobs = 0; stages = 0; tasks = 0
      val t0 = System.nanoTime()
      // building the frame executes any fixture/checkpoint jobs the
      // query's setup performs — counted, as they are part of its cost
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val buildS = (System.nanoTime() - t0) / 1e9
      val (bJobs, bStages, bTasks) = (jobs, stages, tasks)
      val t1 = System.nanoTime()
      val n = df.count()
      val execS = (System.nanoTime() - t1) / 1e9
      Thread.sleep(300) // let late listener events land before reading counters
      Files.writeString(outDir.resolve(s"$name.txt"), plan)
      println(f"[plandump] $name: build=$buildS%.2fs (jobs=$bJobs stages=$bStages tasks=$bTasks) " +
        f"exec=$execS%.2fs (total jobs=$jobs stages=$stages tasks=$tasks) rows=$n " +
        s"-> ${outDir.resolve(s"$name.txt")}")
    }
    spark.stop()
  }
}
