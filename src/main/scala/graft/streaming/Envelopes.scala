package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingest-envelope shims (reference operators S1/S2/S12, SURVEY.md §2.1).
  *
  * The reference's API Gateway maps two HTTP PUT bodies onto Kinesis
  * calls via VTL templates:
  *  - single record `{"Data": {...}, "PartitionKey": "<userId>"}`
  *    (`web-analytics-parquet/cdk_stacks/apigw.py:146-152`), with the
  *    payload base64-encoded in transit;
  *  - batch `{"records": [{"data": "...", "partition-key": "..."}]}`
  *    (`apigw.py:193-205`, producer `gen_fake_data.py:74-80`).
  *
  * These operators unwrap either envelope into (payload, partition_key)
  * rows, and re-hash-partition the frame by the partition key — the
  * Spark analog of Kinesis sharding by `userId` (`gen_fake_data.py:72-73`),
  * so downstream per-user work (sessionization) is already co-located.
  */
object Envelopes {

  private val batchSchema = StructType(Seq(
    StructField("records", ArrayType(StructType(Seq(
      StructField("data", StringType),
      StructField("partition-key", StringType)))))))

  private val singleSchema = StructType(Seq(
    StructField("Data", StringType),
    StructField("PartitionKey", StringType)))

  /** S2: unwrap a batch `{"records": [...]}` body; one output row per
    * record, payload newline-trimmed (the validator's T2 normalization,
    * `schema_validator.py:126-127`).
    */
  def fromBatchEnvelope(df: DataFrame, bodyCol: String = "body",
      base64Encoded: Boolean = false): DataFrame = {
    val rec = explode(from_json(col(bodyCol), batchSchema).getField("records")).as("_rec")
    val raw = df.select(rec)
      .select(col("_rec.data").as("_data"), col("_rec.`partition-key`").as("partition_key"))
    decodePayload(raw, base64Encoded)
  }

  /** S1: unwrap a single-record `{Data, PartitionKey}` body. */
  def fromSingleEnvelope(df: DataFrame, bodyCol: String = "body",
      base64Encoded: Boolean = false): DataFrame = {
    val parsed = from_json(col(bodyCol), singleSchema)
    val raw = df.select(
      parsed.getField("Data").as("_data"),
      parsed.getField("PartitionKey").as("partition_key"))
    decodePayload(raw, base64Encoded)
  }

  private def decodePayload(df: DataFrame, base64Encoded: Boolean): DataFrame = {
    val data: Column =
      if (base64Encoded) unbase64(col("_data")).cast("string") else col("_data")
    df.select(rtrim(data, "\n").as("payload"), col("partition_key"))
  }

  /** Kinesis-shard analog: co-locate records by partition key. */
  def shardBy(df: DataFrame, partitions: Int, keyCol: String = "partition_key"): DataFrame =
    df.repartition(partitions, col(keyCol))

  /** S12: the debug shard consumer (`kds_consumer.py:38-51`) — print a
    * page of records; for streams use `writeStream.format("console")`.
    */
  def consoleDump(df: DataFrame, pageSize: Int = 123): Unit =
    df.show(pageSize, truncate = false)
}
