package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.weblog.Validator

/** The interactive query surface (SURVEY.md §3.3): the reference gives
  * analysts "any SQL over the cataloged tables" through an Athena
  * workgroup plus a registry of named queries published as console
  * templates (`athena_named_query.py:56-64,103-111`). Here that is a thin
  * facade over Catalyst — `sql` hands the text to Spark and returns the
  * lazily-planned frame — plus a named-query registry seeded with the
  * reference's shipped queries (Q1/Q2 shapes) and open for user
  * registration.
  */
final class Engine(val spark: SparkSession,
    resultLocation: Option[String] = None) {

  Validator.register(spark) // expose validate_weblog_A/B in SQL too

  private val named = scala.collection.concurrent.TrieMap[String, String](
    // the reference's named queries, modulo table names
    // (`athena_named_query.py:53,100`)
    "count_raw" -> "SELECT COUNT(*) FROM web_log_json",
    "count_parquet" -> "SELECT COUNT(*) FROM web_log_parquet",
    "show_partitions_raw" -> "SHOW PARTITIONS web_log_json",
    "repair_raw" -> "MSCK REPAIR TABLE web_log_json")

  /** Full Spark SQL — parse/analyze/optimize/execute via Catalyst. */
  def sql(query: String): DataFrame = spark.sql(query)

  def registerNamedQuery(name: String, query: String): Unit = named.put(name, query)

  def namedQueries: Map[String, String] = named.toMap

  def runNamed(name: String): DataFrame =
    sql(named.getOrElse(name, throw new NoSuchElementException(s"no named query: $name")))

  /** Athena-workgroup semantics: the workgroup *enforces* a result
    * location and every query execution lands there as CSV
    * (`athena_workgroup.py:20-53`, result bucket
    * `s3://aws-athena-query-results-…`). Runs the SQL, writes the result
    * set as headered CSV under `<resultLocation>/<queryId>/`, returns
    * (queryId, frame).
    *
    * The single CSV object means ONE task serializes the whole result —
    * correct for Athena-sized result sets, a bottleneck for
    * table-exports. `maxResultRows` guards that: results above the cap
    * fail loudly with advice to write parquet directly, instead of
    * silently crawling through one task. The cap is enforced with a
    * LIMIT cap+1 probe, so the guard never scans more than the cap.
    */
  def execute(query: String, maxResultRows: Long = 1000000L): (String, DataFrame) = {
    val loc = resultLocation.getOrElse(
      throw new IllegalStateException("no result location configured for this workgroup"))
    val id = java.util.UUID.nameUUIDFromBytes(
      (query + loc).getBytes("UTF-8")).toString
    val df = sql(query)
    val cap = math.min(maxResultRows, Int.MaxValue - 1L).toInt
    val probe = df.limit(cap + 1).count()
    if (probe > maxResultRows)
      throw new IllegalStateException(
        s"result set exceeds $maxResultRows rows; a single-object CSV result " +
          "would serialize through one task — write the frame out as " +
          "partitioned parquet instead, or raise maxResultRows explicitly")
    df.coalesce(1).write.mode("overwrite")
      .option("header", "true")
      .csv(s"$loc/$id")
    (id, df)
  }
}

object Engine {
  def apply(spark: SparkSession): Engine = new Engine(spark)
  def apply(spark: SparkSession, resultLocation: String): Engine =
    new Engine(spark, Some(resultLocation))
}
