package graft.streaming

import org.apache.spark.sql.SparkSession

/** State-store backend selection for stateful streaming queries
  * (sessionization, dropDuplicates, stream-stream joins).
  *
  * The default HDFS-backed provider keeps every live key on the executor
  * heap — fine for bounded test state, but a 100 TB clickstream carries
  * hundreds of millions of open sessions, and heap-resident state means
  * GC pauses and OOM-sized executors. RocksDB keeps state on local disk
  * with a bounded block cache (rocksdbjni ships on the Spark 4
  * classpath), which is the standard large-state deployment.
  *
  * Set before `.start()`; applies to queries started afterwards on the
  * session. Checkpoints are provider-specific — don't flip providers on
  * an existing checkpoint.
  */
object StateStores {
  val RocksDBProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  def useRocksDB(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", RocksDBProvider)

  def useDefault(spark: SparkSession): Unit =
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
}
