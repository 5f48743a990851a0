package graft.weblog

import org.apache.spark.sql.types._

/** Web-log event schemas — the reference's two dialects (SURVEY.md §1.2).
  *
  * Dialect A (parquet variant, camelCase, 9 cols): Avro schema
  * `web-analytics-parquet/src/main/python/SchemaValidator/schema_validator.py:23-67`,
  * Hive DDL `web-analytics-parquet/cdk_stacks/athena_named_query.py:23-45`.
  *
  * Dialect B (iceberg variants, snake_case + required `event`, 10 cols):
  * `web-analytics-iceberg/src/main/python/IcebergTransformer/firehose_to_iceberg_transformer.py:29-77`,
  * DDL `web-analytics-iceberg/README.md:169-189`.
  */
object WebLogSchema {

  /** (name, required). Order matters: it is the column order of the tables. */
  val dialectA: Seq[(String, Boolean)] = Seq(
    "userId" -> true, "sessionId" -> true, "referrer" -> false,
    "userAgent" -> false, "ip" -> true, "hostname" -> true,
    "os" -> false, "timestamp" -> true, "uri" -> true)

  val dialectB: Seq[(String, Boolean)] = Seq(
    "user_id" -> true, "session_id" -> true, "event" -> true,
    "referrer" -> false, "user_agent" -> false, "ip" -> true,
    "hostname" -> true, "os" -> false, "timestamp" -> true, "uri" -> true)

  def fields(dialect: String): Seq[(String, Boolean)] = dialect match {
    case "A" | "a" | "camel" => dialectA
    case "B" | "b" | "snake" => dialectB
    case other => throw new IllegalArgumentException(s"unknown dialect: $other")
  }

  /** String-typed struct for `from_json` over a validated payload; the
    * strict `timestamp` stays a string here and is cast by the caller
    * (`to_timestamp(col, TsPattern)`) — from_json's own permissive
    * timestamp parsing accepts formats the reference rejects.
    */
  def structType(dialect: String): StructType =
    StructType(fields(dialect).map { case (n, _) =>
      // Every field is nullable here on purpose: from_json needs to be able
      // to null out absent keys; required-ness is enforced by the validator
      // (ValidateWebLog), not by the parse struct.
      StructField(n, StringType, nullable = true)
    })

  /** Event-time parse pattern (`schema_validator.py:70-85`). */
  val TsPattern = "yyyy-MM-dd'T'HH:mm:ss'Z'"

  /** Iceberg-variant event types (`web-analytics-iceberg/src/utils/gen_fake_data.py:55`). */
  val EventTypes: Seq[String] = Seq("visit", "view", "list", "like", "cart", "purchase")

  /** Partition columns derived from ingest wall-clock time (SURVEY §1.2). */
  val PartitionCols: Seq[String] = Seq("year", "month", "day", "hour")
}
