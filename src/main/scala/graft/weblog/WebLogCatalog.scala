package graft.weblog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog / partition-management DDL (reference operators C2/C4/C5/C6 —
  * `web-analytics-parquet/cdk_stacks/athena_named_query.py:19-111`).
  * All of it is native Spark SQL; this layer only renders the statements
  * so both dialect tables share one code path (SURVEY §7.4 risk 3).
  */
object WebLogCatalog {

  private def dataColsDdl(dialect: String): String =
    WebLogSchema.fields(dialect).map { case (n, _) => s"`$n` STRING" }.mkString(", ")

  private val partColsDdl =
    WebLogSchema.PartitionCols.map(c => s"$c INT").mkString(", ")

  /** C6: `CREATE DATABASE IF NOT EXISTS` (`athena_named_query.py:19`). */
  def createDatabase(spark: SparkSession, db: String): Unit =
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")

  /** C6: external JSON raw-zone table, partitioned by ingest hour
    * (`athena_named_query.py:23-45`). The payload columns are all STRING
    * plus the strict timestamp column kept as STRING (cast at query time)
    * — schema-on-read, nothing inferred.
    */
  def createRawJsonTable(spark: SparkSession, table: String, location: String,
      dialect: String = "B"): Unit =
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS $table (${dataColsDdl(dialect)})
         |USING JSON
         |PARTITIONED BY ($partColsDdl)
         |LOCATION '$location'""".stripMargin)

  /** C6: parquet analytics-zone table (`athena_named_query.py:70-92`). */
  def createParquetTable(spark: SparkSession, table: String, location: String,
      dialect: String = "B"): Unit =
    spark.sql(
      s"""CREATE TABLE IF NOT EXISTS $table
         |(${dataColsDdl(dialect)}, `event_ts` TIMESTAMP)
         |USING PARQUET
         |PARTITIONED BY ($partColsDdl)
         |LOCATION '$location'""".stripMargin)

  /** C2: `ALTER TABLE … ADD IF NOT EXISTS PARTITION … LOCATION …`
    * (`athena_ctas.py:41-76`).
    */
  def addPartition(spark: SparkSession, table: String,
      hp: Compaction.HourPartition, location: String): Unit =
    spark.sql(
      s"ALTER TABLE $table ADD IF NOT EXISTS PARTITION (${hp.spec}) LOCATION '$location'")

  /** C4: bulk partition discovery (`athena_named_query.py:48,95`). */
  def msckRepair(spark: SparkSession, table: String): Unit =
    spark.sql(s"MSCK REPAIR TABLE $table")

  /** C5: `SHOW PARTITIONS` (`athena_named_query.py:51,98`). */
  def showPartitions(spark: SparkSession, table: String): DataFrame =
    spark.sql(s"SHOW PARTITIONS $table")

  /** C1 as literal SQL — the reference's exact mechanism
    * (`athena_ctas.py:30-39`): partition-pruned CTAS of one raw hour into
    * a snappy-parquet external location. The programmatic
    * `Compaction.compactHour` is the production path (atomic swap); this
    * keeps the SQL surface for parity.
    */
  def ctasCompactHour(spark: SparkSession, tmpTable: String, location: String,
      srcTable: String, hp: Compaction.HourPartition,
      columns: String = "*"): Unit =
    spark.sql(
      s"""CREATE TABLE $tmpTable
         |USING PARQUET
         |OPTIONS (compression 'snappy')
         |LOCATION '$location'
         |AS SELECT $columns FROM $srcTable
         |WHERE year=${hp.year} AND month=${hp.month} AND day=${hp.day} AND hour=${hp.hour}""".stripMargin)

  /** C3: tmp-table cleanup for hour H−2 (`athena_ctas.py:79-103`). Our
    * compactor doesn't create tmp tables (atomic dir swap instead), but
    * the DDL surface is kept for parity.
    */
  def dropTableIfExists(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")

  /** S3-op analog: stream/table listing (`apigw.py:62-99`). */
  def listTables(spark: SparkSession, db: String): DataFrame =
    spark.sql(s"SHOW TABLES IN `$db`")
}
