package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{NamespaceAlreadyExistsException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{Identifier, NamespaceChange, SupportsNamespaces, SupportsRead, SupportsWrite, Table, TableCapability, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.{Expressions, FieldReference, Literal => V2Literal, NamedReference, Transform}
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsDynamicOverwrite, SupportsOverwrite, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.{BaseRelation, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType

import graft.weblog.IcebergLikeTable

/** DataSource-V2 CATALOG over the graft table format — the surface
  * that makes the engine's tables plain SQL objects (the reference's
  * Glue-catalog role, `web-analytics-iceberg/README.md:183-188`, where
  * Athena DDL/DML addresses Iceberg tables by name):
  *
  * {{{
  *   spark.sql.catalog.g           = graft.sources.GraftCatalog
  *   spark.sql.catalog.g.warehouse = /data/warehouse
  *
  *   CREATE NAMESPACE g.web;
  *   CREATE TABLE g.web.events (user_id STRING, event STRING,
  *     ts TIMESTAMP) PARTITIONED BY (days(ts));
  *   INSERT INTO g.web.events SELECT ...;
  *   SELECT * FROM g.web.events WHERE ts >= ...;     -- file-pruned
  *   SELECT * FROM g.web.events VERSION AS OF 3;     -- time travel
  *   ALTER TABLE g.web.events RENAME COLUMN user_id TO uid;
  *   INSERT OVERWRITE g.web.events SELECT ...;
  * }}}
  *
  * Identity = filesystem layout: namespace `a.b` is directory
  * `<warehouse>/a/b`, a table is a directory holding a
  * `.graft_table.json` descriptor (partition spec, unique keys, order
  * column — everything `loadTable` needs so SQL never passes options)
  * beside the table-format data/manifests. `PARTITIONED BY (days(ts)
  * | hours(ts) | truncate(w, c) | c)` maps onto the format's hidden
  * partitioning; an unpartitioned table gets Iceberg's `void`
  * transform (single null partition). Keyed (upsert) tables declare
  * `TBLPROPERTIES (uniqueKeys '...', orderCol '...', numBuckets '...')`
  * and INSERT INTO becomes the order-aware merge.
  *
  * Reads go through [[V1Scan]]: column pruning and pushed filters
  * reach the table's OWN planning (manifest partition values,
  * transform inversion, stamped stats, bloom sidecars) and every
  * filter is re-applied post-scan, so pushdown stays an I/O-only
  * optimization. Writes go through [[V1Write]] to the table's real
  * commit protocol — INSERT INTO appends/upserts, INSERT OVERWRITE is
  * the one-snapshot overwrite. Time travel: `VERSION AS OF v` pins
  * [[IcebergLikeTable.readAt]]; `TIMESTAMP AS OF t` resolves the
  * newest commit at-or-before t ([[IcebergLikeTable.versionAsOf]]).
  */
final class GraftCatalog extends TableCatalog with SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {

  import GraftCatalog._

  private var catalogName: String = _
  private var warehouse: Path = _

  // ALTER TABLE ... ADD CONSTRAINT / column DEFAULT clauses parse to
  // catalog calls only when the catalog declares support
  override def capabilities():
      util.Set[org.apache.spark.sql.connector.catalog.TableCatalogCapability] =
    util.EnumSet.of(
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORT_TABLE_CONSTRAINT,
      org.apache.spark.sql.connector.catalog
        .TableCatalogCapability.SUPPORT_COLUMN_DEFAULT_VALUE)

  private def spark: SparkSession = SparkSession.active
  private def fs = warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def initialize(name: String,
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap): Unit = {
    catalogName = name
    val w = options.get("warehouse")
    require(w != null && w.nonEmpty,
      s"catalog '$name' needs spark.sql.catalog.$name.warehouse")
    warehouse = new Path(w)
  }

  override def name(): String = catalogName

  private def nsDir(namespace: Array[String]): Path =
    namespace.foldLeft(warehouse)((p, n) => new Path(p, n))

  private def tableDir(ident: Identifier): Path =
    new Path(nsDir(ident.namespace), ident.name)

  private def descPath(dir: Path): Path = new Path(dir, DescriptorFile)

  // ---- namespaces ------------------------------------------------------

  override def listNamespaces(): Array[Array[String]] = listNamespaces(Array.empty)

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] = {
    val dir = nsDir(namespace)
    if (namespace.nonEmpty && !fs.exists(dir))
      throw new NoSuchNamespaceException(namespace)
    if (!fs.exists(dir)) return Array.empty
    fs.listStatus(dir).filter(_.isDirectory)
      .map(_.getPath)
      .filterNot(p => fs.exists(descPath(p))) // table dirs are not namespaces
      .map(p => namespace :+ p.getName)
      .sortBy(_.mkString("."))
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty ||
      (fs.exists(nsDir(namespace)) && !fs.exists(descPath(nsDir(namespace))))

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    Map(SupportsNamespaces.PROP_LOCATION -> nsDir(namespace).toString).asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    if (namespaceExists(namespace) && fs.exists(nsDir(namespace)))
      throw new NamespaceAlreadyExistsException(namespace)
    fs.mkdirs(nsDir(namespace))
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val dir = nsDir(namespace)
    if (!namespaceExists(namespace) || !fs.exists(dir)) return false
    if (!cascade && fs.listStatus(dir).nonEmpty)
      throw new IllegalStateException(
        s"namespace ${namespace.mkString(".")} is not empty (use CASCADE)")
    fs.delete(dir, true)
  }

  // ---- tables ----------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = nsDir(namespace)
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(dir).filter(_.isDirectory).map(_.getPath)
      .filter(p => fs.exists(descPath(p)))
      .map(p => Identifier.of(namespace, p.getName))
      .sortBy(_.name)
  }

  override def tableExists(ident: Identifier): Boolean =
    fs.exists(descPath(tableDir(ident)))

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) {
      // Iceberg's metadata-table addressing: `SELECT * FROM g.ns.t.files`
      // resolves `t.files` as identifier (ns=[ns,t], name=files) — serve
      // the engine's metadata DataFrames as read-only tables
      return metaTableFor(ident).getOrElse(throw new NoSuchTableException(ident))
    }
    val desc = Descriptor.read(fs, descPath(tableDir(ident)))
    new GraftSqlTable(fullName(ident), tableFor(ident, desc), desc, None)
  }

  private def metaTableFor(ident: Identifier): Option[Table] = {
    if (ident.namespace.isEmpty) return None
    val parent = Identifier.of(ident.namespace.init, ident.namespace.last)
    if (!tableExists(parent)) return None
    val t = icebergFor(parent)
    val df: Option[() => org.apache.spark.sql.DataFrame] = ident.name match {
      case "snapshots" => Some(() => t.snapshots)
      case "files" => Some(() => t.files)
      case "partitions" => Some(() => t.partitions)
      case "tags" => Some(() =>
        spark.createDataFrame(t.tags.toSeq.sortBy(_._1))
          .toDF("tag", "version"))
      case "branches" => Some(() =>
        spark.createDataFrame(
          t.branches.map(b => (b, t.forBranch(b).currentVersion.getOrElse(0L))))
          .toDF("branch", "version"))
      // operational-inspection parity (r14): Iceberg also serves
      // .history / .manifests / .refs
      case "history" => Some(() => t.history)
      case "manifests" => Some(() => t.manifests)
      case "refs" => Some(() => t.namedRefs)
      case _ => None
    }
    df.map(f => new GraftMetaTable(s"${fullName(parent)}.${ident.name}", f))
  }

  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val desc = Descriptor.read(fs, descPath(tableDir(ident)))
    val t = tableFor(ident, desc)
    // Iceberg-style ref resolution: a numeric version pins directly; a
    // non-numeric one resolves as a TAG (tags pin snapshots past
    // retention, so `VERSION AS OF 'release-1'` stays valid after the
    // raw version number would have expired), then as a BRANCH — a
    // branch ref reads that chain's HEAD through the branch handle
    // (its manifests are a separate version chain; pinning the main
    // chain at the branch's number would read the wrong snapshot).
    // All-digit tag names are refused at creation, so numeric
    // resolution can never shadow a ref.
    version.toLongOption.orElse(t.tags.get(version)) match {
      case Some(v) =>
        require(t.versions.contains(v),
          s"version $v of ${fullName(ident)} is unknown or expired " +
            s"(retained: ${t.versions.mkString(", ")})")
        new GraftSqlTable(fullName(ident), t, desc, Some(v))
      case None if t.branches.contains(version) =>
        val b = t.forBranch(version)
        new GraftSqlTable(s"${fullName(ident)}@$version", b, desc,
          b.currentVersion)
      case None => throw new IllegalArgumentException(
        s"graft VERSION AS OF takes a numeric snapshot version, a tag " +
          s"or a branch name, got '$version' (tags: " +
          s"${t.tags.keys.toSeq.sorted.mkString(", ")}; branches: " +
          s"${t.branches.mkString(", ")})")
    }
  }

  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val desc = Descriptor.read(fs, descPath(tableDir(ident)))
    val t = tableFor(ident, desc)
    val v = t.versionAsOf(timestampMicros / 1000L).getOrElse(
      throw new IllegalArgumentException(
        s"no retained snapshot of ${fullName(ident)} at or before " +
          s"timestamp $timestampMicros"))
    new GraftSqlTable(fullName(ident), t, desc, Some(v))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    if (!namespaceExists(ident.namespace))
      throw new NoSuchNamespaceException(ident.namespace)
    require(schema.fields.nonEmpty, "graft tables need at least one column")
    val props = properties.asScala.toMap.map { case (k, v) =>
      k.stripPrefix(TableCatalog.OPTION_PREFIX) -> v
    }
    def cols(key: String): Seq[String] = props.get(key)
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty)).getOrElse(Nil)
    val uniqueKeys = cols("uniqueKeys")
    val (partitionCol, transformSpec) =
      parsePartitioning(ident, schema, partitions, props)
    val desc = Descriptor(
      schema = schema,
      partitionCol = partitionCol,
      transform = transformSpec,
      uniqueKeys = uniqueKeys,
      numBuckets = props.get("numBuckets").map(_.toInt).getOrElse(16),
      orderCol = props.get("orderCol"),
      statsColumns = cols("statsColumns"),
      bloomColumns = cols("bloomColumns"),
      retainVersions = props.get("retainVersions").map(_.toInt).getOrElse(8),
      // every remaining user property survives in the descriptor
      // (e.g. 'write.delete.mode' routing DELETE FROM to MOR files)
      props = props -- Seq("uniqueKeys", "orderCol", "numBuckets",
        "retainVersions", "statsColumns", "bloomColumns", "partitionCol",
        TableCatalog.PROP_PROVIDER, TableCatalog.PROP_LOCATION,
        TableCatalog.PROP_OWNER, TableCatalog.PROP_EXTERNAL,
        TableCatalog.PROP_COMMENT))
    require(desc.uniqueKeys.isEmpty || desc.orderCol.nonEmpty,
      "a keyed graft table needs TBLPROPERTIES orderCol " +
        "(last-write-wins ordering for INSERT INTO upserts)")
    desc.orderCol.foreach(o => require(schema.fieldNames.contains(o),
      s"orderCol '$o' is not a table column"))
    desc.uniqueKeys.foreach(k => require(schema.fieldNames.contains(k),
      s"unique key '$k' is not a table column"))
    val dir = tableDir(ident)
    fs.mkdirs(dir)
    Descriptor.write(fs, descPath(dir), desc)
    new GraftSqlTable(fullName(ident), tableFor(ident, desc), desc, None)
  }

  /** `PARTITIONED BY` → the format's layout: identity(c) = physical
    * partition column; days/hours/truncate = hidden partitioning (the
    * derived column is named Iceberg-style, `<src>_day` / `<src>_hour`
    * / `<src>_trunc`); no clause = the `void` transform (single null
    * partition — Iceberg's unpartitioned spec). SEVERAL transforms —
    * Iceberg's everyday `PARTITIONED BY (days(ts), event)`, or the
    * reference's 4-level year/month/day/hour raw-zone layout
    * (`athena_named_query.py:33-37`) — compose into ONE
    * [[graft.weblog.PartitionTransforms.Multi]] spec: the format's
    * single partition dimension carries the composite value, and
    * predicates on any leg's source column prune independently.
    */
  private def parsePartitioning(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      props: Map[String, String]): (String, Option[String]) = {
    def ref(t: Transform): String = t.arguments.collectFirst {
      case r: NamedReference => r.fieldNames.mkString(".")
    }.getOrElse(throw new IllegalArgumentException(
      s"partition transform ${t.describe} has no column argument"))
    def inSchema(c: String): String = {
      require(schema.fieldNames.contains(c),
        s"partition source column '$c' is not a table column")
      c
    }
    // (leg spec, default derived-column name segment)
    def leg(t: Transform): (String, String) = t.name match {
      case "identity" =>
        val src = inSchema(ref(t)); (s"identity($src)", src)
      case "days" =>
        val src = inSchema(ref(t)); (s"days($src)", s"${src}_day")
      case "hours" =>
        val src = inSchema(ref(t)); (s"hours($src)", s"${src}_hour")
      case "months" | "month" =>
        val src = inSchema(ref(t)); (s"months($src)", s"${src}_month")
      case "years" | "year" =>
        val src = inSchema(ref(t)); (s"years($src)", s"${src}_year")
      case "truncate" =>
        val src = inSchema(ref(t))
        val w = t.arguments.collectFirst {
          case l: V2Literal[_] => l.value.toString.toLong
        }.getOrElse(throw new IllegalArgumentException(
          s"truncate transform needs a width literal: ${t.describe}"))
        (s"truncate($w, $src)", s"${src}_trunc")
      case "bucket" =>
        // Iceberg's everyday keyed layout (`PARTITIONED BY
        // (bucket(16, user_id))`): hidden xxhash bucketing — point
        // lookups prune to one leaf, and the native scan reports the
        // layout as key-grouped so co-bucketed tables join
        // shuffle-free. (The TBLPROPERTIES uniqueKeys/numBuckets
        // keyed layout remains the UPSERT routing — this transform is
        // the append-table counterpart.)
        val src = inSchema(ref(t))
        val n = t.arguments.collectFirst {
          case l: V2Literal[_] => l.value.toString.toInt
        }.getOrElse(throw new IllegalArgumentException(
          s"bucket transform needs a count literal: ${t.describe}"))
        (s"bucket($n, $src)", s"${src}_bucket")
      case other => throw new IllegalArgumentException(
        s"unsupported partition transform '$other' " +
          "(supported: identity column, days, hours, months, years, " +
          "truncate, bucket)")
    }
    partitions.toSeq match {
      case Nil =>
        val src = schema.fields.head.name
        (props.getOrElse("partitionCol", "gpart"), Some(s"void($src)"))
      case Seq(t) if t.name == "identity" => (inSchema(ref(t)), None)
      case Seq(t) =>
        val (spec, name) = leg(t)
        (props.getOrElse("partitionCol", name), Some(spec))
      case ts =>
        val legs = ts.map(leg)
        val name = props.getOrElse("partitionCol", legs.map(_._2).mkString("_"))
        require(!schema.fieldNames.contains(name),
          s"derived partition column '$name' collides with a table " +
            "column — set TBLPROPERTIES (partitionCol '...') to rename it")
        (name, Some(s"multi(${legs.map(_._1).mkString(", ")})"))
    }
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val dir = tableDir(ident)
    var desc = Descriptor.read(fs, descPath(dir))
    val t = tableFor(ident, desc)
    // REFUSABLE conditions validate BEFORE any change applies — shape,
    // existence, duplicates, widenability — so a multi-change ALTER
    // does not half-apply on a statically-knowable late refusal.
    // (Engine commits are still sequential: a mid-loop I/O failure, or
    // a data-dependent refusal like a CHECK violation during
    // AddConstraint's validation scan, can leave earlier changes
    // applied — the same non-transactional DDL posture as Iceberg's.)
    val declared = scala.collection.mutable.Set(desc.schema.fieldNames: _*)
    changes.foreach {
      case r: TableChange.RenameColumn =>
        require(r.fieldNames.length == 1,
          "graft supports top-level column renames only")
        require(declared.contains(r.fieldNames.head),
          s"no column '${r.fieldNames.head}' to rename")
        require(!declared.contains(r.newName),
          s"column '${r.newName}' already exists")
        declared -= r.fieldNames.head; declared += r.newName
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames.length == 1,
          "graft supports top-level column drops only")
        require(declared.contains(d.fieldNames.head),
          s"no column '${d.fieldNames.head}' to drop")
        declared -= d.fieldNames.head
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1,
          "graft supports top-level column adds only")
        require(!declared.contains(a.fieldNames.head),
          s"column '${a.fieldNames.head}' already exists")
        require(a.defaultValue() == null,
          s"graft cannot ADD COLUMN '${a.fieldNames.head}' WITH a " +
            "DEFAULT (existing rows would read NULL, not the default); " +
            "add the column, then ALTER COLUMN ... SET DEFAULT")
        declared += a.fieldNames.head
      case w: TableChange.UpdateColumnType =>
        require(w.fieldNames.length == 1,
          "graft supports top-level column type changes only")
        val wName = w.fieldNames.head
        require(declared.contains(wName), s"no column '$wName' to widen")
        // replicate widenColumn's STATIC refusals here so a multi-change
        // ALTER cannot half-apply on a knowable late refusal: only
        // int->bigint / float->double widen, and layout/unique-key/
        // bloom-stamped columns never do (key bucketing and the sidecar
        // filters hash the binary type)
        desc.schema.fields.find(_.name == wName).foreach { f =>
          if (f.dataType != w.newDataType) {
            val ok = (f.dataType, w.newDataType) match {
              case (org.apache.spark.sql.types.IntegerType,
                org.apache.spark.sql.types.LongType) => true
              case (org.apache.spark.sql.types.FloatType,
                org.apache.spark.sql.types.DoubleType) => true
              case _ => false
            }
            require(ok, s"unsupported type widening ${f.dataType} -> " +
              s"${w.newDataType} for '$wName' (supported: int -> bigint, " +
              "float -> double)")
          }
        }
        require(wName != desc.partitionCol && !desc.uniqueKeys.contains(wName),
          s"cannot widen layout or unique-key column '$wName'")
        require(!desc.bloomColumns.contains(wName),
          s"cannot widen bloom-stamped column '$wName'")
      case u: TableChange.UpdateColumnDefaultValue =>
        require(u.fieldNames.length == 1,
          "graft supports top-level column defaults only")
        require(declared.contains(u.fieldNames.head),
          s"no column '${u.fieldNames.head}' to set a default on")
      case a: TableChange.AddConstraint =>
        require(a.constraint().isInstanceOf[
            org.apache.spark.sql.connector.catalog.constraints.Check],
          s"graft enforces CHECK constraints only, got " +
            s"${a.constraint().toDDL}")
      case _: TableChange.DropConstraint => ()
      case _: TableChange.SetProperty => ()
      case _: TableChange.RemoveProperty => ()
      case other => throw new UnsupportedOperationException(
        s"unsupported ALTER TABLE change for graft: $other")
    }
    changes.foreach {
      case r: TableChange.RenameColumn => // validated by the pre-pass
        val from = r.fieldNames.head
        if (t.currentVersion.isDefined) t.renameColumn(from, r.newName)
        desc = desc.copy(schema = StructType(desc.schema.fields.map(f =>
          if (f.name == from) f.copy(name = r.newName) else f)))
      case d: TableChange.DeleteColumn => // validated by the pre-pass
        val name = d.fieldNames.head
        if (t.currentVersion.isDefined) t.dropColumn(name)
        desc = desc.copy(schema =
          StructType(desc.schema.fields.filterNot(_.name == name)))
      case a: TableChange.AddColumn => // validated by the pre-pass
        val f = org.apache.spark.sql.types.StructField(
          a.fieldNames.head, a.dataType, a.isNullable)
        desc = desc.copy(schema = StructType(desc.schema.fields :+ f))
        // make the column visible to reads NOW, not at the next data
        // write: an empty append commits the widened schema stamp
        if (t.currentVersion.isDefined) {
          val widened = StructType(t.read.schema.fields :+ f)
          t.append(spark.createDataFrame(
            spark.sparkContext.emptyRDD[Row], widened))
        }
      case w: TableChange.UpdateColumnType => // validated by the pre-pass
        val name = w.fieldNames.head
        if (t.currentVersion.isDefined) t.widenColumn(name, w.newDataType)
        desc = desc.copy(schema = StructType(desc.schema.fields.map(f =>
          if (f.name == name) f.copy(dataType = w.newDataType) else f)))
      case p: TableChange.SetProperty =>
        desc = desc.copy(props = desc.props + (p.property -> p.value))
      case p: TableChange.RemoveProperty =>
        desc = desc.copy(props = desc.props - p.property)
      // ALTER COLUMN c SET/DROP DEFAULT: a CURRENT_DEFAULT only — it
      // governs FUTURE inserts (the analyzer materializes it into the
      // write plan from the schema metadata), never reads, so the
      // engine needs no awareness. Stored on the descriptor field.
      case u: TableChange.UpdateColumnDefaultValue => // validated by the pre-pass
        val name = u.fieldNames.head
        val newSql = Option(u.newDefaultValue()).map(_.trim).filter(_.nonEmpty)
        desc = desc.copy(schema = StructType(desc.schema.fields.map { f =>
          if (f.name != name) f
          else {
            val b = new org.apache.spark.sql.types.MetadataBuilder()
              .withMetadata(f.metadata)
            newSql match {
              case Some(sql) =>
                b.putString("CURRENT_DEFAULT", sql)
              case None =>
                b.remove("CURRENT_DEFAULT")
            }
            f.copy(metadata = b.build())
          }
        }))
      // ALTER TABLE t ADD CONSTRAINT n CHECK (expr): stored as table
      // state in the manifest meta (validated against existing rows
      // first), enforced per row at the engine's single commit point —
      // EVERY write path from then on, SQL or API
      case a: TableChange.AddConstraint =>
        a.constraint() match {
          case c: org.apache.spark.sql.connector.catalog.constraints.Check =>
            // a pre-first-INSERT ADD CONSTRAINT materializes the schema
            // stamp with an empty commit (same move as ADD COLUMN) —
            // the constraint meta needs a manifest to live in, and a
            // file-less, schema-less v1 would brick every read
            if (t.currentVersion.isEmpty)
              t.append(spark.createDataFrame(
                spark.sparkContext.emptyRDD[Row], desc.schema))
            t.addConstraint(c.name(), c.predicateSql())
          case other => throw new UnsupportedOperationException(
            s"graft enforces CHECK constraints only, got ${other.toDDL}")
        }
      case d: TableChange.DropConstraint =>
        if (!d.ifExists() || t.constraints.contains(d.name()))
          t.dropConstraint(d.name())
      case other => throw new UnsupportedOperationException(
        s"unsupported ALTER TABLE change for graft: $other")
    }
    Descriptor.write(fs, descPath(dir), desc)
    new GraftSqlTable(fullName(ident), tableFor(ident, desc), desc, None)
  }

  override def dropTable(ident: Identifier): Boolean = {
    if (!tableExists(ident)) return false
    fs.delete(tableDir(ident), true)
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent)) throw new TableAlreadyExistsException(newIdent)
    if (!namespaceExists(newIdent.namespace))
      throw new NoSuchNamespaceException(newIdent.namespace)
    if (!fs.rename(tableDir(oldIdent), tableDir(newIdent)))
      throw new java.io.IOException(
        s"rename failed: ${fullName(oldIdent)} -> ${fullName(newIdent)}")
  }

  // ---- functions (partition transforms) ----------------------------------

  /** The catalog's V2 functions: `bucket` — how Spark resolves the
    * key-grouped partitioning the native scan reports, enabling
    * storage-partitioned joins between co-bucketed graft tables.
    */
  override def loadFunction(ident: Identifier):
      org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if ((ident.namespace.isEmpty ||
        ident.namespace.sameElements(Array("system"))) &&
        ident.name == "bucket") GraftBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(Array("system")))
      Array(Identifier.of(Array.empty, "bucket"))
    else Array.empty

  // ---- procedures (SQL CALL) -------------------------------------------

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(this, ident)

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespace.sameElements(GraftProcedures.Namespace))
      GraftProcedures.list
    else Array.empty

  /** The engine handle of a catalog table (procedures resolve their
    * `table` argument through the descriptor like any read).
    */
  private[sources] def icebergFor(ident: Identifier): IcebergLikeTable = {
    if (!tableExists(ident))
      throw new NoSuchTableException(ident)
    tableFor(ident, Descriptor.read(fs, descPath(tableDir(ident))))
  }

  /** Partition-spec evolution through the catalog: the engine's
    * metadata-only commit PLUS the descriptor update that keeps
    * `loadTable` handing out the evolved handle.
    */
  private[sources] def evolveSpecFor(ident: Identifier,
      newSpec: String): IcebergLikeTable = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val dir = tableDir(ident)
    val desc = Descriptor.read(fs, descPath(dir))
    val evolved = tableFor(ident, desc).evolvePartitionSpec(newSpec)
    Descriptor.write(fs, descPath(dir), desc.copy(transform = Some(newSpec)))
    evolved
  }

  private def fullName(ident: Identifier): String =
    (Seq(catalogName) ++ ident.namespace :+ ident.name).mkString(".")

  private def tableFor(ident: Identifier, desc: Descriptor): IcebergLikeTable =
    IcebergLikeTable(
      spark,
      tableDir(ident).toString,
      partitionCol = desc.partitionCol,
      uniqueKeys = desc.uniqueKeys,
      numBuckets = desc.numBuckets,
      retainVersions = desc.retainVersions,
      statsColumns = desc.statsColumns,
      bloomColumns = desc.bloomColumns,
      partitionTransform = desc.transform)
}

object GraftCatalog {

  private[sources] val DescriptorFile = ".graft_table.json"

  /** The catalog-managed table descriptor: everything `loadTable`
    * needs to rebuild the table handle, so SQL statements never carry
    * options. Stored as one JSON object beside the table's manifests.
    */
  private[sources] final case class Descriptor(
      schema: StructType,
      partitionCol: String,
      transform: Option[String],
      uniqueKeys: Seq[String],
      numBuckets: Int,
      orderCol: Option[String],
      statsColumns: Seq[String],
      bloomColumns: Seq[String],
      retainVersions: Int,
      props: Map[String, String] = Map.empty)

  private[sources] object Descriptor {
    import com.fasterxml.jackson.databind.ObjectMapper

    def write(fs: org.apache.hadoop.fs.FileSystem, path: Path,
        d: Descriptor): Unit = {
      val m = new ObjectMapper()
      val node = m.createObjectNode()
      node.put("schema", d.schema.json)
      node.put("partitionCol", d.partitionCol)
      d.transform.foreach(node.put("transform", _))
      node.put("numBuckets", d.numBuckets)
      node.put("retainVersions", d.retainVersions)
      d.orderCol.foreach(node.put("orderCol", _))
      def arr(name: String, vs: Seq[String]): Unit = {
        val a = node.putArray(name); vs.foreach(a.add)
      }
      arr("uniqueKeys", d.uniqueKeys)
      arr("statsColumns", d.statsColumns)
      arr("bloomColumns", d.bloomColumns)
      val p = node.putObject("props")
      d.props.toSeq.sortBy(_._1).foreach { case (k, v) => p.put(k, v) }
      val tmp = new Path(path.getParent, s"$DescriptorFile.tmp")
      val out = fs.create(tmp, true)
      try out.write(m.writeValueAsString(node).getBytes("UTF-8"))
      finally out.close()
      fs.delete(path, false)
      if (!fs.rename(tmp, path))
        throw new java.io.IOException(s"descriptor publish failed: $path")
    }

    def read(fs: org.apache.hadoop.fs.FileSystem, path: Path): Descriptor = {
      val in = fs.open(path)
      val bytes = try in.readAllBytes() finally in.close()
      val node = new ObjectMapper().readTree(new String(bytes, "UTF-8"))
      def arr(name: String): Seq[String] =
        if (!node.has(name)) Nil
        else node.get(name).asScala.map(_.asText).toSeq
      Descriptor(
        schema = org.apache.spark.sql.types.DataType
          .fromJson(node.get("schema").asText).asInstanceOf[StructType],
        partitionCol = node.get("partitionCol").asText,
        transform = Option(node.get("transform")).map(_.asText),
        uniqueKeys = arr("uniqueKeys"),
        numBuckets = node.get("numBuckets").asInt,
        orderCol = Option(node.get("orderCol")).map(_.asText),
        statsColumns = arr("statsColumns"),
        bloomColumns = arr("bloomColumns"),
        retainVersions =
          if (node.has("retainVersions")) node.get("retainVersions").asInt else 8,
        props =
          if (!node.has("props")) Map.empty
          else node.get("props").properties().asScala
            .map(e => e.getKey -> e.getValue.asText).toMap)
    }
  }
}

/** A catalog table: reads through [[V1Scan]] (pruned + pushed into the
  * table's own planning), writes through [[V1Write]] (the real commit
  * protocol), optionally pinned to a snapshot for time travel.
  *
  * `DELETE FROM` ([[org.apache.spark.sql.connector.catalog.SupportsDelete]])
  * routes to the table's row-level delete — copy-on-write by default,
  * or the merge-on-read delete files when the table declares
  * `TBLPROPERTIES ('write.delete.mode' 'merge-on-read')` (equality
  * files on keyed tables, positional files on key-less ones — the
  * reference's Athena posture). The condition must translate EXACTLY
  * (`canDeleteWhere`): a DELETE is an effectful command, so unlike
  * scan pruning a superset predicate would destroy rows — an
  * untranslatable predicate is refused and Spark surfaces the error
  * instead of silently over-deleting. `DELETE FROM t` with no WHERE is
  * the one-snapshot truncate (history stays readable until retention).
  */
private[sources] final class GraftSqlTable(
    ident: String,
    table: IcebergLikeTable,
    desc: GraftCatalog.Descriptor,
    pinnedVersion: Option[Long]) extends Table
    with SupportsRead with SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsDelete {

  override def canDeleteWhere(filters: Array[sources.Filter]): Boolean =
    pinnedVersion.isEmpty &&
      filters.forall(f => GraftFilterBridge.toColumn(f, exact = true).isDefined)

  override def deleteWhere(filters: Array[sources.Filter]): Unit = {
    require(pinnedVersion.isEmpty, s"cannot DELETE from a time-travel read of $ident")
    val cond = filters.map(f =>
      GraftFilterBridge.toColumn(f, exact = true).getOrElse(
        throw new UnsupportedOperationException(
          s"DELETE condition not translatable exactly: $f")))
      .reduceOption(_ && _).getOrElse(lit(true))
    deleteRows(cond)
  }

  override def truncateTable(): Boolean = {
    require(pinnedVersion.isEmpty, s"cannot truncate a time-travel read of $ident")
    if (table.currentVersion.isDefined)
      table.overwrite(SparkSession.active.createDataFrame(
        SparkSession.active.sparkContext.emptyRDD[Row], schema()))
    true
  }

  override def name(): String = ident

  /** The engine's stamped CHECK constraints, surfaced through the
    * DSv2 constraints API: Spark's own `ResolveTableConstraints`
    * then ALSO injects per-row enforcement into catalog write plans
    * (belt), on top of the engine's commit-point guard (suspenders —
    * which additionally covers the DML bridge and direct API writes).
    */
  override def constraints():
      Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] = {
    import org.apache.spark.sql.connector.catalog.constraints.Constraint
    // CHECK constraints ARE write-enforced (every commit guards per
    // row) — but validation status is reported UNVALIDATED and rely
    // stays false: rollbackTo and branch fast-forward can restore rows
    // that predate the constraint without re-validating them, and a
    // RELY+VALID claim would license the optimizer to prune on a
    // predicate the data may no longer satisfy (wrong results beat a
    // lost optimization).
    val checks: Seq[Constraint] =
      if (table.currentVersion.isEmpty) Nil
      else table.constraints.toSeq.sortBy(_._1).map { case (n, sql) =>
        Constraint.check(n).predicateSql(sql).enforced(true)
          .validationStatus(Constraint.ValidationStatus.UNVALIDATED)
          .rely(false).build(): Constraint
      }
    // a keyed table's unique keys surface as an INFORMATIONAL primary
    // key: the upsert/merge paths enforce them, but the raw append
    // path does not, so neither enforced nor RELY may be claimed
    val pk: Seq[Constraint] =
      if (desc.uniqueKeys.isEmpty) Nil
      else Seq(Constraint.primaryKey(s"${ident.replace('.', '_')}_pk",
          desc.uniqueKeys.map(k =>
            org.apache.spark.sql.connector.expressions.Expressions.column(k))
            .toArray)
        .enforced(false)
        .validationStatus(Constraint.ValidationStatus.UNVALIDATED)
        .rely(false).build(): Constraint)
    (pk ++ checks).toArray
  }

  /** The underlying engine handle / time-travel pin (the SQL DML
    * bridge routes UPDATE/MERGE INTO through them).
    */
  private[sources] def iceberg: IcebergLikeTable = table
  private[sources] def pinned: Option[Long] = pinnedVersion
  private[sources] def descriptor: GraftCatalog.Descriptor = desc

  /** DELETE routing shared by [[deleteWhere]] and the DML bridge's
    * arbitrary-condition path.
    */
  private[sources] def deleteRows(cond: Column): Long =
    if (table.currentVersion.isEmpty) 0L
    else desc.props.get("write.delete.mode") match {
      case Some("merge-on-read") =>
        if (table.uniqueKeys.nonEmpty) table.deleteMergeOnRead(cond)
        else table.deletePositional(cond)
      case _ => table.delete(cond)
    }

  override def schema(): StructType =
    pinnedVersion match {
      case Some(v) => inDeclaredOrder(table.readAt(v).schema)
      case None =>
        // descriptor schema until the first commit (the table DIR holds
        // the descriptor before any snapshot exists), live stamp after
        if (table.currentVersion.isDefined) inDeclaredOrder(table.read.schema)
        else desc.schema
    }

  /** The live stamp reads the PHYSICAL partition column back last
    * (Hive layout), but positional INSERT resolves against declared
    * order — present descriptor order, keeping live types (widening)
    * and appending live-only columns (widened schema) at the end.
    */
  private def inDeclaredOrder(live: StructType): StructType = {
    val byName = live.fields.map(f => f.name -> f).toMap
    // live fields carry the engine's stamps; the DESCRIPTOR carries the
    // analyzer-facing column DEFAULT metadata — overlay it, or DEFAULT
    // resolution silently degrades to NULL after the first commit
    val declared = desc.schema.fields.flatMap { d =>
      byName.get(d.name).map { f =>
        val b = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata)
        Seq("CURRENT_DEFAULT", "EXISTS_DEFAULT").foreach { k =>
          if (d.metadata.contains(k)) b.putString(k, d.metadata.getString(k))
        }
        f.copy(metadata = b.build())
      }
    }
    val extra = live.fields.filterNot(f => desc.schema.fieldNames.contains(f.name))
    StructType(declared ++ extra)
  }

  override def partitioning(): Array[Transform] = {
    import graft.weblog.{PartitionTransforms => PT}
    def toV2(t: PT.Transform): Seq[Transform] =
      t match {
        case PT.Days(s) => Seq(Expressions.days(s))
        case PT.Hours(s) => Seq(Expressions.hours(s))
        case PT.Months(s) => Seq(Expressions.months(s))
        case PT.Years(s) => Seq(Expressions.years(s))
        case PT.Truncate(s, w) => Seq(Expressions.apply("truncate",
          Expressions.literal(w), Expressions.column(s)))
        case PT.Bucket(s, n) => Seq(Expressions.bucket(n, s))
        case PT.Identity(s) => Seq(Expressions.identity(s))
        case PT.Multi(legs) => legs.flatMap(toV2)
        case PT.Void(_) => Nil
      }
    desc.transform match {
      case None => Array(Expressions.identity(desc.partitionCol))
      case Some(spec) => toV2(PT.parse(spec)).toArray
    }
  }

  override def properties(): util.Map[String, String] =
    (desc.props ++
      Map(TableCatalog.PROP_PROVIDER -> "graft",
        TableCatalog.PROP_LOCATION -> table.path) ++
      (if (desc.uniqueKeys.nonEmpty)
        Map("uniqueKeys" -> desc.uniqueKeys.mkString(","),
          "numBuckets" -> desc.numBuckets.toString) ++
          desc.orderCol.map("orderCol" -> _)
      else Map.empty)).asJava

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_DYNAMIC, TableCapability.OVERWRITE_BY_FILTER)

  override def newScanBuilder(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(table, pinnedVersion, schema())

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    require(pinnedVersion.isEmpty,
      s"cannot write to a time-travel read of $ident")
    new GraftWriteBuilder(table, desc)
  }
}

/** Column pruning + filter pushdown into the table's own planning;
  * every filter is declared post-scan (Spark re-applies them all), so
  * the pushdown is purely an I/O optimization — same posture as the
  * path-based relation.
  *
  * AGGREGATE pushdown ([[SupportsPushDownAggregates]]) answers
  * whole-table `COUNT(*)` / `MIN(c)` / `MAX(c)` from the MANIFEST
  * alone — Iceberg's aggregate-to-metadata pushdown, the reason
  * `SELECT count(*)` on a 100 TB table is a driver-side lookup, not a
  * scan: row counts and column bounds are stamped per file at commit,
  * so the answer is one snapshot resolve, ZERO tasks, zero data I/O.
  * Only COMPLETE answers push (no grouping, no filters, no live
  * delete files, every live entry stamped for the column — otherwise
  * [[IcebergLikeTable.rowCount]]/[[IcebergLikeTable.columnMinMax]]
  * return None and the query falls back to a real scan).
  */
private[sources] final class GraftScanBuilder(table: IcebergLikeTable,
    pinned: Option[Long], fullSchema: StructType) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit {

  private var required: StructType = fullSchema
  private var filters: Array[sources.Filter] = Array.empty
  private var handled: Array[sources.Filter] = Array.empty
  private var aggResult: Option[(StructType, Seq[org.apache.spark.sql.catalyst.InternalRow])] = None
  private var limit: Option[Int] = None

  /** LIMIT pushdown as FILE-LIST truncation: the stamped row counts
    * let the native scan keep only enough files to cover the limit
    * (`SELECT * FROM t LIMIT 10` on a 100 TB table opens one file).
    * Declared PARTIALLY pushed — Spark keeps its own limit operator,
    * so whole-file delivery stays correct. Spark only offers the
    * pushdown when every filter above the scan was handled; handled
    * filters are partition-EXACT (every row of every kept file
    * matches), so the stamped row counts still cover the limit —
    * `WHERE day = 3 LIMIT 10` opens one file of day 3's leaf.
    */
  override def pushLimit(n: Int): Boolean = {
    if (!filters.forall(handled.contains)) return false
    limit = Some(n)
    true
  }

  override def isPartiallyPushed: Boolean = true

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** A filter the scan itself can honor row-for-row via whole-leaf
    * decisions: an identity-partition predicate, or a day-aligned
    * half-line on a days() transform's timestamp source. Handling
    * these (instead of declaring them residual) is what unlocks
    * aggregate and limit pushdown UNDER a WHERE clause — Spark only
    * offers those when no post-scan filter remains. Resolved once per
    * query; any probe failure means nothing is handled (sound).
    */
  private lazy val handledExact: sources.Filter => Boolean =
    // probed against the snapshot the scan will actually read — the
    // pinned one for time travel (r13): a pre-evolution snapshot's
    // leaves decide under THEIR spec, not the live handle's
    try table.exactFilterProbeAt(pinned)
    catch { case scala.util.control.NonFatal(_) => (_: sources.Filter) => false }

  override def pushFilters(fs: Array[sources.Filter]): Array[sources.Filter] = {
    filters = fs
    handled = fs.filter(handledExact)
    // the rest are post-scan: the engine re-applies them
    fs.filterNot(handled.contains)
  }

  override def pushedFilters(): Array[sources.Filter] = filters

  /** Memo for the supportCompletePushDown → pushAggregation pair:
    * Spark probes with the same Aggregation instance it then pushes, so
    * the manifest fold runs ONCE per query (and both calls see the same
    * resolved snapshot — a commit racing between them cannot flip the
    * answer).
    */
  private var aggMemo: Option[(org.apache.spark.sql.connector.expressions
    .aggregate.Aggregation,
    Option[(StructType, Seq[org.apache.spark.sql.catalyst.InternalRow])])] = None

  private def computeAggCached(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation):
      Option[(StructType, Seq[org.apache.spark.sql.catalyst.InternalRow])] =
    aggMemo match {
      case Some((a, res)) if a eq agg => res
      case _ =>
        val res = computeAgg(agg)
        aggMemo = Some((agg, res))
        res
    }

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    computeAggCached(agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    computeAggCached(agg) match {
      case Some(res) => aggResult = Some(res); true
      case None => false // no partial pushdown: complete answers only
    }

  /** Typed catalyst value of a stamped bound string under the column
    * type (bounds are stamped as exact `cast(string)` renderings of
    * [[graft.weblog.FileStats.supported]] types).
    */
  private def typedBound(dt: org.apache.spark.sql.types.DataType, s: String): Any =
    dt match {
      case org.apache.spark.sql.types.StringType =>
        org.apache.spark.unsafe.types.UTF8String.fromString(s)
      case org.apache.spark.sql.types.ByteType => s.toByte
      case org.apache.spark.sql.types.ShortType => s.toShort
      case org.apache.spark.sql.types.IntegerType => s.toInt
      case org.apache.spark.sql.types.LongType => s.toLong
      case org.apache.spark.sql.types.FloatType => s.toFloat
      case org.apache.spark.sql.types.DoubleType => s.toDouble
      case d: org.apache.spark.sql.types.DecimalType =>
        org.apache.spark.sql.types.Decimal(new java.math.BigDecimal(s),
          d.precision, d.scale)
      // stamped as Catalyst's own internal encodings (r11): epoch
      // micros / epoch days — the string parses straight to the value
      case org.apache.spark.sql.types.TimestampType => s.toLong
      case org.apache.spark.sql.types.DateType => s.toInt
      case other => throw new IllegalStateException(s"unstampable type $other")
    }

  /** The manifest-only answer to an aggregation — whole-table, or
    * grouped by ANY combination of partition-spec dimensions (r12):
    * identity legs (the physical partition column, or an identity leg
    * of a `multi(days(ts), event)` composite), `CAST(src AS DATE)`
    * over a days()/hours() leg, and constant datetime extracts
    * (`GROUP BY event`, `GROUP BY day, event`, `GROUP BY dayofweek(ts),
    * event` all answer from the manifest on the everyday Iceberg
    * layout). COUNT(*)/COUNT(col)/MIN/MAX/SUM resolve from the stamped
    * per-file counts/bounds/sums; AVG(col) is the exact
    * (sum stamp) / (rows − nulls) quotient; COUNT(DISTINCT dim) counts
    * distinct leaf leg values. None when any part is undecidable from
    * metadata — the caller then scans for real. EVERYTHING reads ONE
    * resolved snapshot ([[IcebergLikeTable.aggView]]): a commit racing
    * between probe and push cannot mix versions inside one answer.
    */
  private def computeAgg(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation):
      Option[(StructType, Seq[org.apache.spark.sql.catalyst.InternalRow])] = {
    import org.apache.spark.sql.connector.expressions.aggregate.{Avg, Count, CountStar, Max, Min, Sum}
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField}
    import graft.weblog.IcebergLikeTable.AggLeg
    // a RESIDUAL filter keeps a Filter node above the scan and Spark
    // never offers the aggregate; when it does offer, every pushed
    // filter was HANDLED (partition-exact) — the manifest answers from
    // the matching leaves alone (`count(*) WHERE day = 3` is a
    // zero-task lookup, like its unfiltered twin). Belt-and-braces: a
    // residual filter somehow reaching here refuses.
    if (!filters.forall(handled.contains)) return None
    val handledSeq: Seq[sources.Filter] = filters.toSeq
    // time travel answers from the PINNED snapshot's own manifests
    // (r12) — an unknown version throws into the refusal and the real
    // scan raises the proper error
    val view =
      try table.aggView(pinned).getOrElse(return None)
      catch { case scala.util.control.NonFatal(_) => return None }
    def boundCol(e: org.apache.spark.sql.connector.expressions.Expression):
        Option[StructField] = e match {
      case n: NamedReference if n.fieldNames.length == 1 =>
        fullSchema.fields.find(_.name == n.fieldNames.head)
      case _ => None
    }
    val aggExprs = agg.aggregateExpressions.toSeq
    val minMaxCols = aggExprs.flatMap {
      case m: Min => boundCol(m.column).map(_.name)
      case m: Max => boundCol(m.column).map(_.name)
      case _ => Nil
    }.distinct
    // COUNT(col) — the non-null count — answers from the stamped
    // per-file null counts (r11): rows − nulls per file, exact
    val countCols = aggExprs.flatMap {
      case c: Count if !c.isDistinct => boundCol(c.column).map(_.name)
      case _ => Nil
    }.distinct
    // SUM(col) — from the stamped exact per-file decimal sums (r11);
    // floating-point columns are never stamped (order-dependent
    // addition), so they fall back by absence. The same stamps answer
    // AVG(col) exactly: (sum) / (rows − nulls) (r12).
    val sumCols = aggExprs.flatMap {
      case s: Sum if !s.isDistinct => boundCol(s.column).map(_.name)
      case a: Avg if !a.isDistinct => boundCol(a.column).map(_.name)
      case _ => Nil
    }.distinct

    // ---- partition-DIMENSION resolution: a pushed V2 expression → the
    // spec LEG it reads and the (per-leg leaf values → typed value)
    // mapping. Grouping and COUNT(DISTINCT) both resolve through here.
    // UTC-only for the time legs: cast/extract semantics follow the
    // session timezone, and only UTC matches the transform's epoch
    // floor. Many-to-one mappings (every Monday, a date over hour
    // leaves) MERGE in the grouped fold — never duplicate group rows.
    val utc = org.apache.spark.sql.internal.SQLConf.get
      .sessionLocalTimeZone == "UTC"
    val legs = view.legs.map(_.zipWithIndex)
    // identity legs of a composite spec render as the column's own
    // string cast — groupable where that rendering round-trips exactly
    // through the typed parse (strings, integrals, booleans, dates; a
    // timestamp's session-zone calendar rendering does not)
    def identityLegType(dt: org.apache.spark.sql.types.DataType): Boolean =
      dt match {
        case org.apache.spark.sql.types.StringType |
             org.apache.spark.sql.types.ByteType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.BooleanType |
             org.apache.spark.sql.types.DateType => true
        case _ => false
      }
    // a LEG VALUE parses under its RENDERING (the writer's string cast
    // / the leaf path segment), not the stamped-bounds encoding
    // typedBound expects: dates are ISO local dates, booleans
    // true/false; everything else coincides with typedBound
    def legTyped(dt: org.apache.spark.sql.types.DataType, v: String): Any =
      dt match {
        case org.apache.spark.sql.types.DateType =>
          val d = java.time.LocalDate.parse(v).toEpochDay
          if (d >= Int.MinValue && d <= Int.MaxValue) d.toInt
          else throw new IllegalStateException(s"date out of range '$v'")
        case org.apache.spark.sql.types.BooleanType => v.toBoolean
        case _ => typedBound(dt, v)
      }
    def extractSource(e: org.apache.spark.sql.connector.expressions.Expression,
        casted: Boolean): Option[(String, Boolean)] = e match {
      case n: NamedReference if n.fieldNames.length == 1 =>
        Some((n.fieldNames.head, casted))
      case c: org.apache.spark.sql.connector.expressions.Cast
          if c.dataType == org.apache.spark.sql.types.DateType =>
        extractSource(c.expression(), casted = true)
      case _ => None
    }
    // an integer-arithmetic tree over ONE inner extract (Spark pushes
    // dayofweek() as `(EXTRACT(DAY_OF_WEEK …) % 7) + 1` and weekday()
    // as `… - 1`): recognized and COMPOSED onto the raw extract, so
    // the semantic conversion runs at planning on the group keys,
    // exactly as the scan would have run it per row. Literal must sit
    // right of the operator — the only shape the builder generates.
    def intLit(e: org.apache.spark.sql.connector.expressions.Expression):
        Option[Int] = e match {
      case l: V2Literal[_] if l.dataType ==
          org.apache.spark.sql.types.IntegerType =>
        Some(l.value.asInstanceOf[Int])
      case _ => None
    }
    def extractTree(e: org.apache.spark.sql.connector.expressions.Expression):
        Option[(String, String, Boolean, Int => Int)] = e match {
      case ex: org.apache.spark.sql.connector.expressions.Extract =>
        extractSource(ex.source(), casted = false).map { case (n, c) =>
          (ex.field(), n, c, identity[Int] _)
        }
      case ge: org.apache.spark.sql.connector.expressions
          .GeneralScalarExpression if ge.children().length == 2 =>
        for {
          (f, n, c, fn) <- extractTree(ge.children()(0))
          k <- intLit(ge.children()(1))
          op <- ge.name() match {
            case "+" => Some((v: Int) => fn(v) + k)
            case "-" => Some((v: Int) => fn(v) - k)
            case "*" => Some((v: Int) => fn(v) * k)
            // SQL % = remainder with the dividend's sign — Java's
            case "%" if k != 0 => Some((v: Int) => fn(v) % k)
            case _ => None
          }
        } yield (f, n, c, op)
      case _ => None
    }
    def resolveDim(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[(StructField, Seq[Option[String]] => Any, Int)] =
      legs.flatMap { ls =>
        e match {
          // identity dimensions: the leaf leg value IS the rows' value
          case n: NamedReference if n.fieldNames.length == 1 =>
            val nm = n.fieldNames.head
            ls.collectFirst {
              case (AggLeg.IdentityPhys(f), i) if f.name == nm =>
                (f, (lv: Seq[Option[String]]) =>
                  lv(i).map(v => legTyped(f.dataType, v)).orNull: Any, i)
              case (AggLeg.IdentityData(f), i)
                  if f.name == nm && identityLegType(f.dataType) =>
                (f, (lv: Seq[Option[String]]) =>
                  lv(i).map(v => legTyped(f.dataType, v)).orNull: Any, i)
            }
          // GROUP BY CAST(src AS DATE): a days() leaf ordinal IS the
          // DATE's internal epoch-day; hour leaves floor-divide (24
          // hours merge into one date group)
          case c: org.apache.spark.sql.connector.expressions.Cast
              if c.dataType == org.apache.spark.sql.types.DateType && utc =>
            c.expression() match {
              case n: NamedReference if n.fieldNames.length == 1 =>
                ls.collectFirst {
                  case (AggLeg.Time(src, hoursLeg), i)
                      if src == n.fieldNames.head =>
                    (StructField(s"cast($src as date)",
                      org.apache.spark.sql.types.DateType),
                      (lv: Seq[Option[String]]) => lv(i) match {
                        case None => null
                        case Some(v) => v.toLongOption match {
                          case Some(o) =>
                            val d = if (hoursLeg)
                              java.lang.Math.floorDiv(o, 24L) else o
                            if (d >= Int.MinValue && d <= Int.MaxValue)
                              d.toInt: Any
                            else throw new IllegalStateException(
                              s"day ordinal out of range '$v'")
                          case None => throw new IllegalStateException(
                            s"unparseable leaf ordinal '$v'")
                        }
                      }, i)
                }
              case _ => None
            }
          // constant datetime extracts over a time leg (HOUR through a
          // date cast would be the midnight hour — bare reference only)
          case _ if utc =>
            extractTree(e).flatMap { case (field, name, casted, post) =>
              if (casted && field == "HOUR") None
              else {
                def extractDim(i: Int, f: Long => Int)
                    : (StructField, Seq[Option[String]] => Any, Int) =
                  (StructField(
                    s"extract(${field.toLowerCase} from $name)",
                    org.apache.spark.sql.types.IntegerType),
                    (lv: Seq[Option[String]]) => lv(i) match {
                      case None => null // SQL: null input → null group
                      case Some(v) => v.toLongOption match {
                        case Some(o) => post(f(o)): Any
                        case None => throw new IllegalStateException(
                          s"unparseable leaf ordinal '$v'")
                      }
                    }, i)
                ls.collectFirst {
                  case (AggLeg.Time(src, hoursLeg), i) if src == name =>
                    graft.weblog.IcebergLikeTable.leafExtract(hoursLeg, field)
                      .map(extractDim(i, _))
                  // calendar-width legs (r13): YEAR/MONTH/QUARTER over a
                  // months() leaf, YEAR over a years() leaf
                  case (AggLeg.CalTime(src, yearsLeg), i) if src == name =>
                    graft.weblog.IcebergLikeTable.calLeafExtract(yearsLeg, field)
                      .map(extractDim(i, _))
                }.flatten
              }
            }
          case _ => None
        }
      }
    val groupResolved: Seq[(StructField, Seq[Option[String]] => Any, Int)] =
      agg.groupByExpressions.toSeq.map(g =>
        resolveDim(g).getOrElse(return None))
    // COUNT(DISTINCT dim): distinct MAPPED leg values over row-holding
    // leaves — exact, because an identity/time dimension's value occurs
    // in the data iff its leaf holds rows
    val distinctResolved: Seq[(StructField, Seq[Option[String]] => Any, Int)] =
      aggExprs.collect { case c: Count if c.isDistinct =>
        resolveDim(c.column()).getOrElse(return None) }
    // the LEG indices the computation actually consumes — on a
    // multi-epoch snapshot (r13) files of an epoch lacking a USED leg
    // refuse, while unused missing legs cost nothing
    val usedLegs: Set[Int] =
      (groupResolved.map(_._3) ++ distinctResolved.map(_._3)).toSet
    val distinctSlots: Map[Int, Int] = aggExprs.zipWithIndex
      .collect { case (c: Count, i) if c.isDistinct => i }
      .zipWithIndex.toMap

    // answers per group: one global fold, or one row per distinct key
    // tuple of the resolved dimensions
    val grouped: Seq[(Seq[(StructField, Any)], Long,
        Map[String, (String, String)], Map[String, Long],
        Map[String, (java.math.BigDecimal, Long)], Seq[Long])] =
      if (groupResolved.isEmpty && distinctResolved.isEmpty) {
        view.aggregates(minMaxCols, countCols, sumCols, handledSeq) match {
          case Some((count, bounds, counts, sums)) =>
            Seq((Nil, count, bounds, counts, sums, Nil))
          case None => return None
        }
      } else {
        val keyFns = groupResolved.map(_._2)
        val res = view.grouped(handledSeq, lv => keyFns.map(_(lv)),
          minMaxCols, countCols, sumCols, distinctResolved.map(_._2),
          usedLegs)
          .getOrElse(return None)
        if (res.isEmpty && groupResolved.isEmpty)
          // a GLOBAL aggregate over zero matching leaves still returns
          // ONE row: counts and distincts 0, sums NULL (SQL semantics);
          // bounds stay absent, so MIN/MAX correctly fall back
          Seq((Nil, 0L, Map.empty, countCols.map(_ -> 0L).toMap,
            sumCols.map(_ -> ((java.math.BigDecimal.ZERO, 0L))).toMap,
            distinctResolved.map(_ => 0L)))
        else res.map { case (k, count, bounds, counts, sums, dvals) =>
          (groupResolved.map(_._1).zip(k), count, bounds, counts, sums, dvals)
        }
      }
    // a (sum, non-null count) stamp as the TYPED result Spark expects
    // of SUM over the column type: LongType for integrals (refuse when
    // the exact sum exceeds the long range — Spark's own arithmetic
    // could not represent it), the widened decimal for decimals, NULL
    // when no non-null value contributed (SQL SUM semantics)
    def sumValue(f: StructField, sum: java.math.BigDecimal,
        nonNull: Long): Option[(StructField, Any)] = f.dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | LongType =>
        val field = StructField(s"sum(${f.name})", LongType)
        if (nonNull == 0L) Some((field, null))
        else try Some((field, sum.longValueExact(): Any))
        catch { case _: ArithmeticException => None }
      case d: org.apache.spark.sql.types.DecimalType =>
        val rt = org.apache.spark.sql.types.DecimalType(
          math.min(38, d.precision + 10), d.scale)
        val field = StructField(s"sum(${f.name})", rt)
        if (nonNull == 0L) Some((field, null))
        else {
          val dec = org.apache.spark.sql.types.Decimal(scala.math.BigDecimal(sum))
          if (dec.changePrecision(rt.precision, rt.scale)) Some((field, dec))
          else None
        }
      case _ => None
    }
    // AVG from the same stamps: the exact decimal sum over the exact
    // non-null count, emitted as the DoubleType Spark expects for
    // integral inputs. Refused unless the exact sum is itself exactly
    // a double — then the round-once quotient equals any correctly
    // accumulated execution (Spark's own double fold is order-dependent
    // anyway; DuckDB's exact-sum AVG matches this bit for bit). Decimal
    // AVG is refused: Spark's result scale/rounding contract differs.
    def avgValue(f: StructField, sum: java.math.BigDecimal,
        nonNull: Long): Option[(StructField, Any)] = f.dataType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | LongType =>
        val field = StructField(s"avg(${f.name})", DoubleType)
        if (nonNull == 0L) Some((field, null))
        else {
          val d = sum.doubleValue
          if (new java.math.BigDecimal(d).compareTo(sum) != 0) None
          else Some((field, d / nonNull: Any))
        }
      case _ => None
    }
    def rowOf(group: Seq[(StructField, Any)], count: Long,
        bounds: Map[String, (String, String)],
        counts: Map[String, Long],
        sums: Map[String, (java.math.BigDecimal, Long)],
        dvals: Seq[Long]):
        Option[Seq[(StructField, Any)]] = {
      val aggs = aggExprs.zipWithIndex.map {
        case (_: CountStar, _) =>
          Some((StructField("count(*)", LongType), count: Any))
        case (c: Count, i) if c.isDistinct =>
          for {
            slot <- distinctSlots.get(i)
            v <- dvals.lift(slot)
            (rf, _, _) <- distinctResolved.lift(slot)
          } yield (StructField(s"count(distinct ${rf.name})", LongType), v: Any)
        case (c: Count, _) => boundCol(c.column).flatMap(f =>
          counts.get(f.name).map(v =>
            (StructField(s"count(${f.name})", LongType), v: Any)))
        case (s: Sum, _) if !s.isDistinct => boundCol(s.column).flatMap(f =>
          sums.get(f.name).flatMap { case (bd, nn) => sumValue(f, bd, nn) })
        case (a: Avg, _) if !a.isDistinct => boundCol(a.column).flatMap(f =>
          sums.get(f.name).flatMap { case (bd, nn) => avgValue(f, bd, nn) })
        case (m: Min, _) => boundCol(m.column).flatMap(f =>
          try bounds.get(f.name).map(b =>
            (StructField(s"min(${f.name})", f.dataType),
              typedBound(f.dataType, b._1)))
          catch { case scala.util.control.NonFatal(_) => None })
        case (m: Max, _) => boundCol(m.column).flatMap(f =>
          try bounds.get(f.name).map(b =>
            (StructField(s"max(${f.name})", f.dataType),
              typedBound(f.dataType, b._2)))
          catch { case scala.util.control.NonFatal(_) => None })
        case _ => None // SUM(DISTINCT)/AVG(DISTINCT): not metadata-decidable
      }
      if (aggs.exists(_.isEmpty)) None
      else Some(group ++ aggs.flatten)
    }
    val answered = grouped.map { case (g, c, b, cc, sm, dv) =>
      rowOf(g, c, b, cc, sm, dv) }
    if (answered.isEmpty || answered.exists(_.isEmpty)) None
    else {
      val rows = answered.flatten
      Some((StructType(rows.head.map(_._1)),
        rows.map(r =>
          org.apache.spark.sql.catalyst.InternalRow.fromSeq(r.map(_._2)))))
    }
  }

  // Eligible snapshots (schema/size-stamped, no live delete files, no
  // rename/drop epochs) read through the NATIVE V2 batch scan
  // ([[graft.weblog.GraftNativeScan]]): manifest-pruned FilePartitions
  // into Spark's vectorized parquet reader, plan-time statistics
  // (SupportsReportStatistics — the initial plan broadcasts a small
  // graft table without waiting for AQE) and runtime join-driven file
  // pruning (SupportsRuntimeV2Filtering — Trino-style dynamic
  // filtering). Everything else falls back to the V1 bridge below,
  // which composes the full merge-on-read / column-history machinery
  // (where V1ScanWrapper hides stats and AQE closes the gap at
  // runtime).
  override def build(): Scan = aggResult match {
    // a pushed manifest aggregate IS the result: driver-local rows,
    // zero tasks, zero files opened (plans as LocalTableScan)
    case Some((aggSchema, aggRows)) =>
      new org.apache.spark.sql.connector.read.LocalScan {
        override def rows: Array[org.apache.spark.sql.catalyst.InternalRow] =
          aggRows.toArray
        override def readSchema(): StructType = aggSchema
        override def description(): String =
          s"GraftManifestAggregate ${table.path} " +
            s"[${aggSchema.fieldNames.mkString(", ")}]"
      }
    case None =>
      graft.weblog.GraftNativeScan.forTable(
        SparkSession.active, table, pinned, required, filters, limit, handled)
        .getOrElse(v1Fallback)
  }

  private def v1Fallback: Scan = new V1Scan {
    override def readSchema(): StructType = required

    override def toV1TableScan[T <: BaseRelation with TableScan](
        context: SQLContext): T = {
      val cond = filters
        .flatMap(GraftFilterBridge.toColumn(_, exact = false))
        .reduceOption(_ && _).getOrElse(lit(true))
      val req = required
      new BaseRelation with TableScan {
        override def sqlContext: SQLContext = context
        override def schema: StructType = req
        override def buildScan(): RDD[Row] = {
          // a freshly created, never-committed table is EMPTY, not an
          // error — Spark itself scans it (SELECT before first INSERT,
          // ADD CONSTRAINT's validation pass)
          if (pinned.isEmpty && table.currentVersion.isEmpty)
            return context.sparkContext.emptyRDD[Row]
          val pruned = pinned match {
            case Some(v) => table.readWhereAt(v, cond)
            case None => table.readWhere(cond)
          }
          if (req.isEmpty) pruned.select(lit(1)).rdd.map(_ => Row.empty)
          else pruned.select(req.fieldNames.toIndexedSeq.map(col): _*).rdd
        }
      }.asInstanceOf[T]
    }
  }
}

/** Shared V1-filter → Column translation (see the soundness note on
  * the path-based relation: a pushed predicate may only be a superset
  * of the original, so AND may narrow at positive positions but
  * everything under NOT must translate exactly).
  */
private[graft] object GraftFilterBridge {
  def toColumn(f: sources.Filter, exact: Boolean): Option[Column] = f match {
    case sources.EqualTo(a, v) => Some(col(a) === lit(v))
    case sources.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
    case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case sources.LessThan(a, v) => Some(col(a) < lit(v))
    case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case sources.In(a, vs) => Some(col(a).isin(vs.toIndexedSeq: _*))
    case sources.IsNull(a) => Some(col(a).isNull)
    case sources.IsNotNull(a) => Some(col(a).isNotNull)
    case sources.And(l, r) =>
      (toColumn(l, exact), toColumn(r, exact)) match {
        case (Some(a), Some(b)) => Some(a && b)
        case (one, other) if !exact => one.orElse(other)
        case _ => None
      }
    case sources.Or(l, r) =>
      for { a <- toColumn(l, exact); b <- toColumn(r, exact) } yield a || b
    case sources.Not(c) => toColumn(c, exact = true).map(!_)
    case sources.StringStartsWith(a, p) => Some(col(a).startsWith(p))
    case sources.StringEndsWith(a, p) => Some(col(a).endsWith(p))
    case sources.StringContains(a, p) => Some(col(a).contains(p))
    case sources.AlwaysTrue() => Some(lit(true))
    case sources.AlwaysFalse() => Some(lit(false))
    case _ => None
  }
}

private[sources] final class GraftWriteBuilder(table: IcebergLikeTable,
    desc: GraftCatalog.Descriptor) extends WriteBuilder
    with SupportsTruncate with SupportsDynamicOverwrite with SupportsOverwrite {

  private var overwriteAll = false
  private var overwriteDynamic = false
  private var overwriteFilters: Option[Array[sources.Filter]] = None

  override def truncate(): WriteBuilder = { overwriteAll = true; this }

  // partitionOverwriteMode=dynamic INSERT OVERWRITE: the analyzer sees
  // OVERWRITE_DYNAMIC in capabilities() and plans
  // OverwritePartitionsDynamic — without this hook write planning
  // fails instead of falling back to truncate
  override def overwriteDynamicPartitions(): WriteBuilder = {
    overwriteDynamic = true; this
  }

  // static-partition INSERT OVERWRITE (`INSERT OVERWRITE t PARTITION
  // (day=2) ...` in static mode) and DataFrameWriterV2's
  // `overwrite(condition)`: the analyzer plans OverwriteByExpression
  // with the filters — routed to [[IcebergLikeTable.replaceWhere]]
  // under the DataSourceV2 contract (delete the matching rows, append
  // the WHOLE batch — Iceberg's overwrite-by-filter; Delta's stricter
  // every-row-must-match mode stays available on the direct API). The
  // filter translation must be EXACT (a superset predicate would
  // over-delete), so an untranslatable filter refuses loudly instead
  // of truncating.
  override def overwrite(filters: Array[sources.Filter]): WriteBuilder = {
    if (filters.isEmpty || filters.forall(_ == sources.AlwaysTrue()))
      overwriteAll = true
    else overwriteFilters = Some(filters)
    this
  }

  override def build(): Write = new V1Write {
    override def toInsertableRelation: InsertableRelation =
      new InsertableRelation {
        override def insert(data: DataFrame, overwrite: Boolean): Unit = {
          // 'write.cluster-by' = range-clustered appends: each INSERT's
          // files cover narrow non-overlapping slices of the cluster
          // columns, so the manifest bounds stay sharp for point/range
          // pruning (declare the columns in statsColumns too)
          val clusterBy = desc.props.get("write.cluster-by")
            .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
            .filter(_.nonEmpty)
          val nFiles = desc.props.get("write.cluster-files")
            .map(_.toInt).getOrElse(16)
          if (overwriteDynamic) table.overwritePartitions(data)
          else if (overwriteFilters.isDefined) {
            val cond = overwriteFilters.get
              .map(f => GraftFilterBridge.toColumn(f, exact = true)
                .getOrElse(throw new UnsupportedOperationException(
                  s"cannot overwrite by filter $f — the " +
                    "predicate does not translate exactly")))
              .reduceOption(_ && _).getOrElse(lit(true))
            table.replaceWhere(cond, data, requireBatchInRegion = false)
          }
          else if (overwriteAll || overwrite) table.overwrite(data)
          else if (table.uniqueKeys.isEmpty) clusterBy match {
            case Some(cols) => table.appendClustered(data, cols, nFiles)
            case None => table.append(data)
          }
          else table.upsert(data, desc.orderCol.getOrElse(
            throw new IllegalStateException(
              "keyed graft table has no orderCol property")))
        }
      }
  }
}

/** A read-only metadata table (`g.ns.t.snapshots` / `.files` /
  * `.tags` / `.branches`): the engine's manifest-resolved DataFrame
  * served through the same V1Scan bridge — no data files are opened.
  */
private[sources] final class GraftMetaTable(ident: String,
    frame: () => DataFrame) extends Table with SupportsRead {

  override def name(): String = ident
  override def schema(): StructType = frame().schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new V1Scan {
        override def readSchema(): StructType = frame().schema
        override def toV1TableScan[T <: BaseRelation with TableScan](
            context: SQLContext): T =
          new BaseRelation with TableScan {
            override def sqlContext: SQLContext = context
            override def schema: StructType = frame().schema
            override def buildScan(): RDD[Row] = frame().rdd
          }.asInstanceOf[T]
      }
    }
}
