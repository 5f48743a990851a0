package graft

import org.apache.spark.sql.SparkSession

/** Local PROFILING harness (not part of the driver contract): times
  * individual `SparkEntry.queries` by name, three repetitions each, in
  * a fresh session configured exactly like [[Bench]] — the tool behind
  * the per-query optimization loop (`sbt "runMain graft.IsoBench
  * decon_pairs"`). rep1 carries JIT/codegen/fixture warmup; reps 2–3
  * are the steady state the in-suite min-of-two approximates.
  */
object IsoBench {
  def main(args: Array[String]): Unit = {
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
    // ad-hoc session confs for A/B profiling runs, e.g.
    // SPARK_GRAFT_CONF="spark.graft.iterate.aqe=true"
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(",").filter(_.nonEmpty)
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      })
    for (name <- args; rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[iso] $name rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
