package graft.weblog

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, Expressions}
import org.apache.spark.sql.connector.expressions.filter.{Predicate => V2Predicate}
import org.apache.spark.sql.connector.read.SupportsRuntimeV2Filtering
import org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructType}

import graft.SparkTestBase

/** The two storage-partitioned-join hardening holes round 10 left
  * open, both reachable only through rare layouts but both silent:
  *
  *  - '''runtime filtering × key grouping''': a runtime (DPP) filter
  *    that prunes EVERY file of some bucket must not shrink the key
  *    groups Spark planned around — BatchScanExec throws "data source
  *    must preserve the original partitioning" — so the re-plan emits
  *    an empty partition for the emptied bucket;
  *  - '''unparseable bucket leaves''': a file on a keyed table whose
  *    leaf has no `gbucket=` segment (foreign import, legacy layout)
  *    must disable key grouping entirely — grouping it under an
  *    invented key would silently drop join matches.
  */
class NativeScanHardeningSpec extends SparkTestBase {

  private def withBucketing[T](body: => T): T = {
    val old = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try body
    finally old.fold(
      spark.conf.unset("spark.sql.sources.v2.bucketing.enabled"))(
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", _))
  }

  test("runtime filtering never shrinks the key groups: an emptied bucket planes as an empty partition") {
    import spark.implicits._
    val path = Files.createTempDirectory("spj_rt").toString + "/t"
    val t = IcebergLikeTable(spark, path, partitionCol = "day",
      uniqueKeys = Seq("id"), numBuckets = 2, statsColumns = Seq("v"))
    // ids chosen so bucket(2, id) correlates with the stats column v:
    // bucket-0 ids carry v in [0, 99], bucket-1 ids v in [1000, 1099] —
    // a runtime predicate on v then prunes EVERY file of bucket 1
    val byBucket = (0 until 400).map(i => s"k$i").toDF("id")
      .select(col("id"), pmod(xxhash64(col("id")), lit(2L)).cast("int").as("b"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(byBucket.map(_._2).distinct.sorted == Seq(0, 1))
    val rows = byBucket.zipWithIndex.map { case ((id, b), i) =>
      (id, if (b == 0) i % 100 else 1000 + i % 100, 1, 1L)
    }
    t.write(rows.toDF("id", "v", "day", "seq"), "seq")
    withBucketing {
      val required = new StructType()
        .add("id", "string").add("v", "int").add("day", "int")
      val scan = GraftNativeScan.forTable(spark, t, None, required,
        Array.empty).getOrElse(fail("snapshot must be native-eligible"))
        .asInstanceOf[GraftNativeScan]
      val part0 = scan.outputPartitioning()
      assert(part0.isInstanceOf[KeyGroupedPartitioning],
        s"keyed table under the bucketing conf must key-group, got $part0")
      val groups0 = scan.planInputPartitions()
      assert(groups0.length == 2)
      val files0 = groups0.collect {
        case g: GraftBucketedPartition => g.inner.files.length
      }.sum
      assert(files0 > 0)
      // runtime predicate only bucket-0's v range can satisfy
      scan.asInstanceOf[SupportsRuntimeV2Filtering].filter(Array(
        new V2Predicate("IN", Array[V2Expression](
          Expressions.column("v"), Expressions.literal[Integer](5)))))
      val groups1 = scan.planInputPartitions()
      assert(groups1.length == 2,
        "runtime filtering must preserve every planned key group")
      val byKey = groups1.collect {
        case g: GraftBucketedPartition => g.bucket -> g.inner.files.length
      }.toMap
      assert(byKey.keySet == Set(0, 1))
      assert(byKey(1) == 0, s"bucket 1 must be runtime-pruned empty: $byKey")
      assert(byKey(0) > 0, "bucket 0 still has its files")
      assert(byKey.values.sum < files0)
      // the reported partitioning is unchanged by the runtime filter
      assert(scan.outputPartitioning()
        .asInstanceOf[KeyGroupedPartitioning].numPartitions == 2)
    }
  }

  test("a keyed-table file without a parseable gbucket leaf disables key grouping — fallback, never a silent mis-join") {
    import spark.implicits._
    val path = Files.createTempDirectory("spj_doc").toString + "/t"
    val t = IcebergLikeTable(spark, path, partitionCol = "day",
      uniqueKeys = Seq("id"), numBuckets = 2)
    t.write((0 until 400).map(i => (s"k$i", i.toLong, 1, 1L))
      .toDF("id", "v", "day", "seq"), "seq")
    val required = new StructType().add("id", "string").add("v", "bigint")
    def planScan(): GraftNativeScan =
      GraftNativeScan.forTable(spark, t, None, required, Array.empty)
        .getOrElse(fail("snapshot must be native-eligible"))
        .asInstanceOf[GraftNativeScan]
    withBucketing {
      // contrast leg: the clean table DOES key-group under the conf
      assert(planScan().outputPartitioning()
        .isInstanceOf[KeyGroupedPartitioning])
    }
    // doctor: a parquet file lands in a leaf whose gbucket segment does
    // NOT parse as a bucket number, referenced by a hand-written
    // manifest — the foreign-import layout the write paths never
    // produce. Grouping it under an invented key would silently
    // mis-co-locate its rows away from their true join partners;
    // reporting UnknownPartitioning makes Spark shuffle as usual, which
    // can never mis-join.
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = Files.createTempDirectory("spj_doc_stage").toString
    spark.range(5).selectExpr("concat('z', id) AS id", "id AS v")
      .coalesce(1).write.mode("overwrite").parquet(staging)
    val part = fs.listStatus(new Path(staging))
      .map(_.getPath).filter(_.getName.startsWith("part-")).head
    val (v, snap) = Manifests.resolveSnapshot(fs, root)
      .getOrElse(fail("table never committed"))
    val foreignRel = "day=1/gbucket=foreign/part-v99-00000.snappy.parquet"
    val dest = new Path(root, foreignRel)
    fs.mkdirs(dest.getParent)
    org.apache.hadoop.fs.FileUtil.copy(fs, part, fs, dest, false,
      spark.sparkContext.hadoopConfiguration)
    val doctorLeafName = s"${Manifests.LeafPrefix}doctor_v99"
    Manifests.writeLeafManifest(fs, root, doctorLeafName, Seq(
      Manifests.FileEntry(foreignRel, fs.getFileStatus(dest).getLen, 5L, Map.empty)))
    Manifests.write(fs, root, v + 1,
      snap.files :+ (Manifests.RefMark + doctorLeafName), snap.meta)
    withBucketing {
      val scan = planScan()
      assert(!scan.outputPartitioning().isInstanceOf[KeyGroupedPartitioning],
        "an unparseable bucket leaf must turn key grouping OFF")
      val parts = scan.planInputPartitions()
      assert(!parts.exists(_.isInstanceOf[GraftBucketedPartition]),
        "fallback planning must not stamp partition keys")
      // full coverage: every manifest entry (including the foreign
      // file) is planned — nothing is dropped or hidden under a
      // phantom key
      val plannedFiles = parts.collect {
        case f: org.apache.spark.sql.execution.datasources.FilePartition =>
          f.files.map(_.filePath.toString).toSeq
      }.flatten.toSet
      assert(plannedFiles.exists(_.contains("gbucket=foreign")),
        "the foreign file must still be scanned")
      assert(plannedFiles.size >= 3)
    }
  }

  test("equality-delete native eligibility: float keys refuse, rename epochs compose (r12), unstamped tuples refuse") {
    import spark.implicits._
    // float/double keys: UnsafeRow byte equality is unsound for them
    // (NaN bit patterns, 0.0 vs -0.0) — the V1 bridge's null-safe
    // anti-join serves these snapshots
    val p1 = Files.createTempDirectory("eqd_float").toString + "/t"
    val tf = IcebergLikeTable(spark, p1, partitionCol = "day",
      uniqueKeys = Seq("fk"), numBuckets = 2)
    tf.write((0 until 10).map(i => (i.toFloat, i.toLong, 1, 1L))
      .toDF("fk", "v", "day", "seq"), "seq")
    tf.deleteMergeOnRead(col("v") >= 7)
    assert(tf.nativeScanSnapshot(None).isEmpty,
      "float keys must fall back to the V1 bridge under eq deletes")
    assert(tf.read.count() == 7L)
    // r12: a rename epoch no longer surrenders eq deletes to the V1
    // bridge — key columns are rename/widen-immutable by construction
    // (evolveSchema/widenColumn refuse them), so the mask's key names
    // resolve stably across every epoch, and the per-epoch reader
    // schemas serve the renamed DATA columns; eligibility holds with
    // delete generations on BOTH sides of the rename
    val p2 = Files.createTempDirectory("eqd_ren").toString + "/t"
    val tr = IcebergLikeTable(spark, p2, partitionCol = "day",
      uniqueKeys = Seq("id"), numBuckets = 2)
    tr.write((0 until 10).map(i => (s"k$i", i.toLong, 1, 1L))
      .toDF("id", "v", "day", "seq"), "seq")
    tr.deleteMergeOnRead(col("v") >= 8)
    assert(tr.nativeScanSnapshot(None).isDefined,
      "canonical string keys + stamped tuples must stay native-eligible")
    tr.renameColumn("v", "n")
    assert(tr.nativeScanSnapshot(None).isDefined,
      "rename epochs + eq deletes stay native-eligible (r12)")
    tr.deleteMergeOnRead(col("n") <= 1)
    assert(tr.nativeScanSnapshot(None).isDefined,
      "a post-rename delete generation keeps eligibility")
    // V1 semantic truth unchanged: only n in [2, 7] survive
    assert(tr.read.select("id", "n").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._2).toSeq ==
      (2 to 7).map(i => (s"k$i", i.toLong)))
    // an UNSTAMPED tuple count (doctored manifest — no write path
    // produces one) disables the native mask: the broadcast budget
    // check would be a guess
    val p3 = Files.createTempDirectory("eqd_unstamped").toString + "/t"
    val tu = IcebergLikeTable(spark, p3, partitionCol = "day",
      uniqueKeys = Seq("id"), numBuckets = 2)
    tu.write((0 until 10).map(i => (s"k$i", i.toLong, 1, 1L))
      .toDF("id", "v", "day", "seq"), "seq")
    tu.deleteMergeOnRead(col("v") >= 5)
    val (snapT, _) = tu.nativeScanSnapshot(None)
      .getOrElse(fail("stamped eq deletes must stay native-eligible"))
    val doctored = snapT.entries.map(e =>
      if (e.isDelete) e.copy(rowCount = -1L) else e)
    val root = new Path(p3)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (v, raw) = Manifests.resolveSnapshot(fs, root)
      .getOrElse(fail("table never committed"))
    val doctorLeaf = s"${Manifests.LeafPrefix}doctor_unstamped"
    Manifests.writeLeafManifest(fs, root, doctorLeaf, doctored)
    Manifests.write(fs, root, v + 1,
      Seq(Manifests.RefMark + doctorLeaf), raw.meta)
    assert(tu.nativeScanSnapshot(None).isEmpty,
      "unstamped delete tuple counts must fall back to the V1 bridge")
    assert(tu.read.count() == 5L)
    // byte budget (r12): delete files whose stamped sizes exceed the
    // broadcast byte cap refuse too — 4M tuples of wide string keys
    // would otherwise make an uncomfortable driver broadcast
    val p4 = Files.createTempDirectory("eqd_bytes").toString + "/t"
    val tb = IcebergLikeTable(spark, p4, partitionCol = "day",
      uniqueKeys = Seq("id"), numBuckets = 2)
    tb.write((0 until 10).map(i => (s"k$i", i.toLong, 1, 1L))
      .toDF("id", "v", "day", "seq"), "seq")
    tb.deleteMergeOnRead(col("v") >= 5)
    val (snapB, _) = tb.nativeScanSnapshot(None)
      .getOrElse(fail("in-budget eq deletes must stay native-eligible"))
    val fat = snapB.entries.map(e =>
      if (e.isDelete) e.copy(size = IcebergLikeTable.NativeDeleteBytesBudget + 1)
      else e)
    val rootB = new Path(p4)
    val fsB = rootB.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (vB, rawB) = Manifests.resolveSnapshot(fsB, rootB)
      .getOrElse(fail("table never committed"))
    val fatLeaf = s"${Manifests.LeafPrefix}doctor_fat"
    Manifests.writeLeafManifest(fsB, rootB, fatLeaf, fat)
    Manifests.write(fsB, rootB, vB + 1,
      Seq(Manifests.RefMark + fatLeaf), rawB.meta)
    assert(tb.nativeScanSnapshot(None).isEmpty,
      "over-byte-budget delete files must fall back to the V1 bridge")
    assert(tb.read.count() == 5L)
  }
}
