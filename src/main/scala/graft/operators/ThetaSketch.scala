package graft.operators

import org.apache.spark.sql.{Column, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct sketches with full SET ALGEBRA — the
  * theta-sketch capability HLL lacks: HLL unions cleanly but cannot
  * intersect or difference, while audience analytics lives on exactly
  * those questions ("users who viewed AND purchased", "users active in
  * January but NOT February"). The fourth sketch family next to HLL
  * (q_hll_*), CMS heavy hitters (Sketches) and KLL quantiles
  * (percentile_approx).
  *
  * Mechanics: keep the k smallest DISTINCT xxhash64 values of the key.
  * With fewer than k distincts the sketch is the exact hash set (all
  * estimates exact — the gate exploits this for a hash-checked oracle);
  * at k it is a uniform sample of the key space below the threshold
  * θ = (k-th smallest hash as a fraction of the hash space), giving the
  * classic estimators (Beyer et al., "On Synopses for Distinct-Value
  * Estimation Under Multiset Operations", SIGMOD'07):
  *
  *   distinct ≈ (k-1) / θ
  *   A∘B (∘ ∈ {∪, ∩, \}): clip both to θ = min(θ_A, θ_B), apply the
  *   set op to the clipped hash sets, estimate |result| / θ.
  *
  * Scale story: the aggregation buffer is a capped sorted long array
  * (8k bytes at k=1024), built map-side like any partial agg — one
  * sketch per partition moves, never a per-key shuffle; merge is
  * "k smallest of the union", associative/commutative, and
  * bit-identical to a single-pass sketch (ThetaSpec asserts equality —
  * the mergeability property that makes per-day sketches compose into
  * months). Set ops run on k-row frames, never data.
  */
object ThetaSketch {

  /** Mutable KMV buffer: sorted distinct hashes, capped at k. Lives as
    * a JVM object within a partition (ScalaAggregator only serializes
    * at shuffle/spill via the Kryo buffer encoder).
    */
  final class KmvBuf(val k: Int) extends Serializable {
    var hashes: java.util.TreeSet[java.lang.Long] = new java.util.TreeSet[java.lang.Long]()
    def add(h: Long): Unit = {
      if (hashes.size < k) { hashes.add(h); () }
      else if (h < hashes.last) {
        if (hashes.add(h)) { hashes.pollLast(); () }
      }
    }
    def addAll(other: KmvBuf): Unit = {
      val it = other.hashes.iterator()
      while (it.hasNext) add(it.next())
    }
  }

  private final class KmvAgg(k: Int) extends Aggregator[Long, KmvBuf, Array[Byte]] {
    def zero: KmvBuf = new KmvBuf(k)
    def reduce(b: KmvBuf, h: Long): KmvBuf = { b.add(h); b }
    def merge(b1: KmvBuf, b2: KmvBuf): KmvBuf = { b1.addAll(b2); b1 }
    def finish(b: KmvBuf): Array[Byte] = serialize(k, b)
    def bufferEncoder = Encoders.kryo[KmvBuf]
    def outputEncoder = Encoders.BINARY
  }

  /** Sketch binary format: [int k][int size][size × long, ascending]. */
  private def serialize(k: Int, b: KmvBuf): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(8 + 8 * b.hashes.size)
    buf.putInt(k).putInt(b.hashes.size)
    val it = b.hashes.iterator()
    while (it.hasNext) buf.putLong(it.next())
    buf.array()
  }

  private def parse(bytes: Array[Byte]): (Int, Array[Long]) = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val k = buf.getInt
    val n = buf.getInt
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = buf.getLong; i += 1 }
    (k, out)
  }

  /** Hash fraction of the unsigned hash space — hashes are signed
    * longs, so offset by Long.MinValue before normalizing.
    */
  private def frac(h: Long): Double =
    (h.toDouble - Long.MinValue.toDouble) / math.pow(2.0, 64)

  private def estimateOf(k: Int, hs: Array[Long]): Double =
    if (hs.isEmpty || hs.length < k) hs.length.toDouble
    else (k - 1).toDouble / frac(hs.last)

  /** Threshold θ as an exclusive hash bound: Long.MaxValue (everything
    * kept, sketch exact) below k, else the k-th smallest hash.
    */
  private def thetaOf(k: Int, hs: Array[Long]): Long =
    if (hs.isEmpty || hs.length < k) Long.MaxValue else hs.last

  private def setEstimate(a: Array[Byte], b: Array[Byte],
      op: (Set[Long], Set[Long]) => Set[Long]): Double = {
    val (ka, ha) = parse(a)
    val (kb, hb) = parse(b)
    val theta = math.min(thetaOf(ka, ha), thetaOf(kb, hb))
    val sa = ha.iterator.filter(_ < theta).toSet
    val sb = hb.iterator.filter(_ < theta).toSet
    val n = op(sa, sb).size
    if (theta == Long.MaxValue) n.toDouble else n.toDouble / frac(theta)
  }

  /** `kmv(key, k)` aggregate: the sketch bytes of a key column. The key
    * is hashed with xxhash64 INSIDE the aggregate expression, so any
    * key type works and the hash is engine-deterministic.
    */
  def kmv(key: Column, k: Int = 4096): Column =
    udaf(new KmvAgg(k), Encoders.scalaLong)(xxhash64(key))

  /** Distinct-count estimate of a sketch column. */
  val kmvEstimate: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((sk: Array[Byte]) => { val (k, hs) = parse(sk); estimateOf(k, hs) })

  /** Union / intersection / difference cardinality estimates of two
    * sketch columns (k-row frames only — one row per group).
    */
  val kmvUnionEstimate: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((a: Array[Byte], b: Array[Byte]) => setEstimate(a, b, _ union _))
  val kmvIntersectEstimate: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((a: Array[Byte], b: Array[Byte]) => setEstimate(a, b, _ intersect _))
  val kmvDifferenceEstimate: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((a: Array[Byte], b: Array[Byte]) => setEstimate(a, b, _ diff _))

  /** Merge two sketch BYTES into the union sketch (k smallest of both)
    * — the re-aggregation path for rollups over stored sketches.
    */
  val kmvMerge: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((a: Array[Byte], b: Array[Byte]) => {
      val (ka, ha) = parse(a)
      val (kb, hb) = parse(b)
      val k = math.min(ka, kb)
      val buf = new KmvBuf(k)
      ha.foreach(buf.add)
      hb.foreach(buf.add)
      serialize(k, buf)
    })

  /** Order-independent union AGGREGATE over a sketch column (the
    * `hll_union_agg` analog for stored per-slice sketches).
    */
  private final class KmvUnionAgg extends Aggregator[Array[Byte], KmvBuf, Array[Byte]] {
    def zero: KmvBuf = new KmvBuf(Int.MaxValue)
    def reduce(b: KmvBuf, a: Array[Byte]): KmvBuf = {
      val (k, hs) = parse(a)
      val target = if (b.k == Int.MaxValue) new KmvBuf(k) else b
      if (b.k != Int.MaxValue && k < b.k) {
        // smaller-k input: rebuild at the smaller k (min-k semantics)
        val nb = new KmvBuf(k)
        nb.addAll(b)
        hs.foreach(nb.add)
        return nb
      }
      hs.foreach(target.add)
      target
    }
    def merge(b1: KmvBuf, b2: KmvBuf): KmvBuf =
      if (b1.k == Int.MaxValue) b2
      else if (b2.k == Int.MaxValue) b1
      else if (b2.k < b1.k) { b2.addAll(b1); b2 }
      else { b1.addAll(b2); b1 }
    def finish(b: KmvBuf): Array[Byte] =
      serialize(if (b.k == Int.MaxValue) 0 else b.k, b)
    def bufferEncoder = Encoders.kryo[KmvBuf]
    def outputEncoder = Encoders.BINARY
  }

  /** `kmv_union(sketch)` aggregate column. */
  def kmvUnion(sk: Column): Column = udaf(new KmvUnionAgg, Encoders.BINARY)(sk)
}
