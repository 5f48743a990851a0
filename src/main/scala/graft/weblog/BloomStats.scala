package graft.weblog

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.types.DataType
import org.apache.spark.util.sketch.BloomFilter

/** Per-file Bloom filters for POINT-LOOKUP file skipping — the
  * complement of [[FileStats]]' min/max bounds: hash-distributed key
  * columns give every file ~the full value range, so interval pruning
  * keeps them all, while a Bloom filter answers "is this exact value
  * possibly in this file?" with no false negatives — precisely
  * Iceberg's puffin/bloom sidecar story. A point lookup on the unique
  * key then scans the one file (plus fpp stragglers) that can hold it.
  *
  * Filters live in SIDECAR files (`_graft_bloom_v<version>_<token>`,
  * underscore-hidden from data listings), one per commit, holding the
  * filters of that commit's imported files only — NOT inline in the
  * manifest: at fpp 0.01 a filter is ~1.2 KB per 1k rows, which would
  * bloat the manifest read every commit; sidecars load lazily at
  * readWhere planning and carry over by name in the manifest metadata.
  * GC follows the manifests: a sidecar referenced by no retained
  * manifest is deleted with its snapshot.
  *
  * Hashing: values are hashed with Spark's own `xxhash64` expression
  * ON THE EXECUTORS (any column type, engine-deterministic) and the
  * driver replays the identical expression on the lookup literal, so
  * membership answers are exact w.r.t. the no-false-negative contract.
  */
object BloomStats {

  /** Driver-side twin of the executors' `xxhash64(col)` (seed 42). */
  def hashOf(value: Any, dt: DataType): Long =
    XxHash64(Seq(Literal(value, dt)), 42L).eval(InternalRow.empty).asInstanceOf[Long]

  /** Mutable per-file buffer; lives as a JVM object within a partition
    * (serialized only at shuffle/spill, java-serialization — the
    * sketch impl is `java.io.Serializable`).
    */
  final class BloomBuf(expectedItems: Long, fpp: Double) extends Serializable {
    val bf: BloomFilter = BloomFilter.create(expectedItems, fpp)
  }

  private final class BloomAgg(expectedItems: Long, fpp: Double)
    extends Aggregator[Long, BloomBuf, Array[Byte]] {
    def zero: BloomBuf = new BloomBuf(expectedItems, fpp)
    def reduce(b: BloomBuf, h: Long): BloomBuf = { b.bf.putLong(h); b }
    def merge(b1: BloomBuf, b2: BloomBuf): BloomBuf = {
      b1.bf.mergeInPlace(b2.bf); b1
    }
    def finish(b: BloomBuf): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      b.bf.writeTo(out)
      out.toByteArray
    }
    def bufferEncoder = Encoders.javaSerialization[BloomBuf]
    def outputEncoder = Encoders.BINARY
  }

  /** `bloom(xxhash64(col))` aggregate column over pre-hashed values. */
  def bloomAgg(hashed: Column, expectedItems: Long, fpp: Double): Column =
    udaf(new BloomAgg(expectedItems, fpp), Encoders.scalaLong)(hashed)

  type Sidecar = Map[String, Map[String, Array[Byte]]]

  /** Sidecar JSON: `{"<relative/file>":{"<col>":"<base64 filter>"}}`. */
  def write(fs: FileSystem, path: Path, blooms: Sidecar): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.createObjectNode()
    blooms.toSeq.sortBy(_._1).foreach { case (file, cols) =>
      val fnode = root.putObject(file)
      cols.toSeq.sortBy(_._1).foreach { case (c, bytes) =>
        fnode.put(c, java.util.Base64.getEncoder.encodeToString(bytes))
      }
    }
    val out = fs.create(path, false)
    try out.write(mapper.writeValueAsBytes(root)) finally out.close()
  }

  def read(fs: FileSystem, path: Path): Sidecar = {
    if (!fs.exists(path)) return Map.empty
    val in = fs.open(path)
    val bytes = try in.readAllBytes() finally in.close()
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(bytes)
    val files = Map.newBuilder[String, Map[String, Array[Byte]]]
    root.properties().forEach { e =>
      val cols = Map.newBuilder[String, Array[Byte]]
      e.getValue.properties().forEach { ce =>
        cols += ce.getKey -> java.util.Base64.getDecoder.decode(ce.getValue.asText)
      }
      files += e.getKey -> cols.result()
    }
    files.result()
  }

  /** Deserialize a filter once per (file, col) at planning. */
  def filterOf(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
}
