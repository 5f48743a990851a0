package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** The full verified query canon (SURVEY.md §2.4 + extensions). */
  def canon: Seq[Q] =
    EventQueries.all ++ TpchQueries.all ++ WebLogQueries.all ++
      AdvancedQueries.all ++ JourneyQueries.all ++ ExtensionQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_count_by_type")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    canon.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    canon.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap

  /** Subset benched per round (headline queries). */
  def headline: Seq[String] = canon.filter(_.headline).map(_.name)
}
