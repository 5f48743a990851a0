package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType, StructType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

import graft.weblog.IcebergLikeTable

/** The catalog's SQL maintenance PROCEDURES (Spark 4's `CALL`
  * statement over [[org.apache.spark.sql.connector.catalog.ProcedureCatalog]]
  * — the surface Iceberg ships as `CALL cat.system.rewrite_data_files`,
  * and the operational role the reference delegates to Athena OPTIMIZE
  * + its Step Functions maintenance flow):
  *
  * {{{
  *   CALL g.system.maintain(`table` => 'web.events', file_threshold => 0)
  *   CALL g.system.maintain_by_size('web.events', 134217728)
  *   CALL g.system.expire_snapshots('web.events', TIMESTAMP '2024-06-01')
  *   CALL g.system.vacuum('web.events')
  *   CALL g.system.rollback('web.events', 7)
  *   CALL g.system.evolve_partition_spec('web.events', 'hours(ts)')
  * }}}
  *
  * Each procedure resolves its `table` argument (a catalog-relative
  * `ns.tbl` name) through the table descriptor, runs the engine
  * operation, and returns a one-row [[LocalScan]] result the CALL
  * surfaces as a query result.
  */
private[sources] object GraftProcedures {

  val Namespace: Array[String] = Array("system")

  def list: Array[Identifier] =
    Array("maintain", "maintain_by_size", "maintain_where",
      "rewrite_clustered", "zorder", "expire_snapshots", "vacuum", "rollback",
      "evolve_partition_spec", "analyze")
      .map(Identifier.of(Namespace, _))

  /** One-row driver-local result. */
  private final case class RowScan(schema: StructType,
      values: Seq[Any]) extends LocalScan {
    override def readSchema(): StructType = schema
    override def rows(): Array[InternalRow] =
      Array(new GenericInternalRow(values.map {
        case s: String => UTF8String.fromString(s)
        case x => x
      }.toArray))
  }

  private def param(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()
  private def param(name: String, dt: DataType, dflt: String): ProcedureParameter =
    ProcedureParameter.in(name, dt).defaultValue(dflt).build()

  /** A procedure: parameters, result schema, and the engine call. */
  private final case class Proc(procName: String,
      params: Seq[ProcedureParameter],
      resultSchema: StructType,
      run: (GraftCatalog, InternalRow) => Seq[Any])
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = procName
    override def description(): String = s"graft $procName"
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = params.toArray
    override def isDeterministic: Boolean = false
    def callWith(catalog: GraftCatalog,
        input: InternalRow): java.util.Iterator[Scan] =
      java.util.List.of[Scan](
        RowScan(resultSchema, run(catalog, input))).iterator()
    override def call(input: InternalRow): java.util.Iterator[Scan] =
      throw new IllegalStateException("bound through GraftCatalog.loadProcedure")
  }

  /** Bind the catalog instance into the procedure (the API binds
    * argument TYPES; the owning catalog arrives at load time).
    */
  private final case class WithCatalog(p: Proc, catalog: GraftCatalog)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = p.name()
    override def description(): String = p.description()
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = p.parameters()
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): java.util.Iterator[Scan] =
      p.callWith(catalog, input)
  }

  private def tableOf(cat: GraftCatalog, input: InternalRow): IcebergLikeTable = {
    val name = input.getUTF8String(0).toString
    val parts = name.split('.')
    require(parts.nonEmpty && parts.forall(_.nonEmpty),
      s"bad table name '$name' (expect ns.tbl relative to the catalog)")
    cat.icebergFor(Identifier.of(parts.init, parts.last))
  }

  private val procs: Map[String, Proc] = Seq(
    Proc("maintain",
      Seq(param("table", StringType),
        param("file_threshold", IntegerType, "10"),
        param("target_files", IntegerType, "1"),
        param("delete_file_threshold", IntegerType, "10")),
      StructType(new StructType()
        .add("rewritten_leaves", IntegerType, nullable = false)),
      (cat, in) => {
        val t = tableOf(cat, in)
        Seq(t.maintain(in.getInt(1), in.getInt(2), in.getInt(3)).size)
      }),
    Proc("maintain_by_size",
      Seq(param("table", StringType),
        param("target_file_bytes", LongType),
        param("min_file_bytes", LongType, "0")),
      StructType(new StructType()
        .add("rewritten_leaves", IntegerType, nullable = false)),
      (cat, in) => {
        val t = tableOf(cat, in)
        Seq(t.maintainBySize(in.getLong(1), in.getLong(2)).size)
      }),
    Proc("expire_snapshots",
      Seq(param("table", StringType), param("older_than", TimestampType)),
      StructType(new StructType()
        .add("expired_versions", IntegerType, nullable = false)),
      (cat, in) => {
        val t = tableOf(cat, in)
        // CALL passes timestamps as micros; commit stamps are millis
        Seq(t.expireOlderThan(in.getLong(1) / 1000L).size)
      }),
    Proc("maintain_where",
      Seq(param("table", StringType),
        param("predicate", StringType),
        param("target_files", IntegerType, "1")),
      StructType(new StructType()
        .add("rewritten_leaves", IntegerType, nullable = false)),
      (cat, in) => {
        val t = tableOf(cat, in)
        Seq(t.maintainWhere(
          org.apache.spark.sql.functions.expr(in.getUTF8String(1).toString),
          in.getInt(2)).size)
      }),
    Proc("rewrite_clustered",
      Seq(param("table", StringType),
        param("cluster_by", StringType),
        param("file_threshold", IntegerType, "0"),
        param("target_files", IntegerType, "1")),
      StructType(new StructType()
        .add("rewritten_leaves", IntegerType, nullable = false)),
      (cat, in) => {
        val t = tableOf(cat, in)
        val cols = in.getUTF8String(1).toString.split(",")
          .toSeq.map(_.trim).filter(_.nonEmpty)
        Seq(t.maintainClustered(cols, in.getInt(2), in.getInt(3)).size)
      }),
    Proc("zorder",
      Seq(param("table", StringType),
        param("zorder_by", StringType),
        param("target_files", IntegerType, "16"),
        param("where", StringType, "''")),
      StructType(new StructType()
        .add("rewritten_leaves", IntegerType, nullable = false)),
      (cat, in) => {
        val t = tableOf(cat, in)
        val cols = in.getUTF8String(1).toString.split(",")
          .toSeq.map(_.trim).filter(_.nonEmpty)
        val where = Option(in.getUTF8String(3)).map(_.toString.trim)
          .filter(_.nonEmpty)
          .map(org.apache.spark.sql.functions.expr)
        Seq(t.maintainZOrder(cols, in.getInt(2), where).size)
      }),
    // ANALYZE (Iceberg compute-stats): one data pass, fresh per-file
    // row counts / bounds / null counts / NDV sketches committed as a
    // METADATA-only version — data files untouched. Backfills stats on
    // tables created before stamping existed (or without statsColumns).
    Proc("analyze",
      Seq(param("table", StringType),
        param("columns", StringType, "''")),
      StructType(new StructType()
        .add("new_version", LongType, nullable = false)),
      (cat, in) => {
        val t = tableOf(cat, in)
        val cols = Option(in.getUTF8String(1)).map(_.toString).getOrElse("")
          .split(",").toSeq.map(_.trim).filter(_.nonEmpty)
        Seq(t.analyze(cols))
      }),
    Proc("vacuum",
      Seq(param("table", StringType)),
      StructType(new StructType().add("ok", IntegerType, nullable = false)),
      (cat, in) => { tableOf(cat, in).vacuum(); Seq(1) }),
    Proc("rollback",
      Seq(param("table", StringType), param("version", LongType)),
      StructType(new StructType().add("new_version", LongType, nullable = false)),
      (cat, in) => Seq(tableOf(cat, in).rollbackTo(in.getLong(1)))),
    Proc("evolve_partition_spec",
      Seq(param("table", StringType), param("spec", StringType)),
      StructType(new StructType()
        .add("new_spec", StringType, nullable = false)
        .add("version", LongType, nullable = false)),
      (cat, in) => {
        val name = in.getUTF8String(0).toString
        val parts = name.split('.')
        val ident = Identifier.of(parts.init, parts.last)
        val spec = in.getUTF8String(1).toString
        val evolved = cat.evolveSpecFor(ident, spec)
        Seq(spec, evolved.currentVersion.getOrElse(0L))
      })
  ).map(p => p.procName -> p).toMap

  def load(catalog: GraftCatalog, ident: Identifier): UnboundProcedure = {
    require(ident.namespace.sameElements(Namespace),
      s"unknown procedure namespace ${ident.namespace.mkString(".")}")
    WithCatalog(procs.getOrElse(ident.name,
      throw new IllegalArgumentException(
        s"unknown procedure '${ident.name}' " +
          s"(have: ${procs.keys.toSeq.sorted.mkString(", ")})")), catalog)
  }
}
