package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, XxHash64}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, Reducer, ReducibleFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, StructType}

/** The graft KEYED-TABLE layout hash as a catalog V2 FUNCTION —
  * `bucket(n, keys...)` = `pmod(xxhash64(keys...), n)`, bit-identical
  * to the write side's bucket routing ([[graft.weblog.IcebergLikeTable]]'s
  * `withBucket`; GraftBucketFunctionSpec pins the agreement). This is
  * what makes STORAGE-PARTITIONED JOINS possible: the native scan
  * reports its key-grouped layout as a `bucket(n, keys)` transform,
  * Spark resolves the transform through the catalog's FunctionCatalog,
  * and two co-bucketed graft tables joined on their keys skip the
  * shuffle entirely — Iceberg's SPJ, the join posture that matters at
  * 100 TB where the exchange IS the query cost.
  */
object GraftBucketFunction extends UnboundFunction {

  override def name(): String = "bucket"

  override def description(): String =
    "bucket(n, keys...): pmod(xxhash64(keys...), n) — the keyed graft " +
      "table's layout hash (storage-partitioned join transform)"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length >= 2,
      "bucket takes (numBuckets INT, key, ...)")
    require(inputType.fields.head.dataType == IntegerType,
      s"bucket's first argument is numBuckets INT, got " +
        s"${inputType.fields.head.dataType}")
    new GraftBucketBound(StructType(inputType.fields.drop(1)))
  }
}

/** Bound `bucket`: evaluates the SAME catalyst [[XxHash64]] (seed 42 —
  * the `xxhash64` SQL function) the write path hashes keys with, then
  * the positive modulus. Slot 0 of the input row is numBuckets; the
  * hash expression reads slots 1..k.
  */
final class GraftBucketBound(keys: StructType)
    extends ScalarFunction[Integer] with ReducibleFunction[Integer, Integer] {

  override def inputTypes(): Array[DataType] =
    IntegerType +: keys.fields.map(_.dataType)

  override def resultType(): DataType = IntegerType

  override def name(): String = "bucket"

  override def canonicalName(): String =
    s"graft.bucket(${keys.fields.map(_.dataType.simpleString).mkString(",")})"

  override def isResultNullable: Boolean = false

  @transient private lazy val hasher = XxHash64(
    keys.fields.toSeq.zipWithIndex.map { case (f, i) =>
      BoundReference(i + 1, f.dataType, nullable = true)
    }, 42L)

  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    val h = hasher.eval(input).asInstanceOf[Long]
    val m = h % n
    (if (m < 0) m + n else m).toInt
  }

  /** SPJ across DIFFERENT bucket counts (Spark's ReducibleFunction,
    * the Iceberg bucket-compatibility pattern): when the other side's
    * count divides ours, our bucket ids REDUCE into its space by plain
    * modulus — sound because the layout hash is modulus-based:
    * `pmod(h, N) % M == pmod(h, M)` whenever M | N. A table whose
    * bucket count was grown (rebucket 4→8) keeps shuffle-free joins
    * against its old-sized peers; the smaller side returns null here
    * (only the larger side reduces).
    */
  override def reducer(thisNumBuckets: Int,
      otherFunc: ReducibleFunction[_, _],
      otherNumBuckets: Int): Reducer[Integer, Integer] =
    otherFunc match {
      case _: GraftBucketBound
          if thisNumBuckets > otherNumBuckets && otherNumBuckets > 0 &&
            thisNumBuckets % otherNumBuckets == 0 =>
        new GraftBucketReducer(otherNumBuckets)
      case _ => null
    }
}

/** Reduces a bucket id from a larger modulus space into a dividing
  * smaller one (ids are already non-negative, so plain `%` is pmod).
  */
final class GraftBucketReducer(m: Int) extends Reducer[Integer, Integer]
    with Serializable {
  override def reduce(v: Integer): Integer = v % m
}
