package graft.connector

import java.util

import graft.table.{GraftCatalog, TableIdent}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expression => V2Expression, Literal => V2Literal, NamedReference, Transform}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** Spark DataSource V2 `TableCatalog` over the graft table format — the
  * same integration shape Apache Iceberg uses
  * (`spark.sql.catalog.<name> = <impl>`), so graft tables are
  * first-class SQL objects:
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.graft", "graft.connector.GraftSparkCatalog")
  * spark.conf.set("spark.sql.catalog.graft.warehouse", "/path/wh")
  * spark.sql("CREATE TABLE graft.ns.t (id BIGINT, ts TIMESTAMP_NTZ) PARTITIONED BY (month(ts))")
  * spark.sql("INSERT INTO graft.ns.t SELECT ...")
  * spark.sql("SELECT * FROM graft.ns.t WHERE ts >= '2024-01-01'")
  * }}}
  *
  * Reads go through the snapshot scan planner (partition + zone-map file
  * pruning from pushed-down filters); writes commit through the
  * optimistic metadata-log protocol. Partition transforms accepted in
  * `PARTITIONED BY` map onto the reference DSL (SURVEY §2.5):
  * identity / years / months / days / hours / bucket(n) / truncate(w) /
  * void — at most one transform (the format keeps a single partition
  * field, like the reference's spec builder).
  */
class GraftSparkCatalog extends TableCatalog with SupportsNamespaces
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog
    with FunctionCatalog with ViewCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse")).getOrElse(
      throw new IllegalArgumentException(
        s"spark.sql.catalog.$name.warehouse must be set"))
  }

  override def name(): String = catalogName

  // Cache the catalog handle per active session: GraftCatalog's
  // constructor snapshots the session Hadoop configuration (a full
  // SQLConf copy), and `cat` is consulted several times per planned
  // query — rebuilding that copy each time is measurable on the bench's
  // SQL-path table queries. Deliberate trade: `spark.hadoop.*` settings
  // changed AFTER the first query through this catalog are not seen
  // until a new session — filesystem credentials/tuning must be set
  // before first use, the usual Hadoop contract.
  @volatile @transient private var cachedCat: (SparkSession, GraftCatalog) = _

  private def cat: GraftCatalog = {
    val s = SparkSession.active
    val c = cachedCat
    if (c != null && (c._1 eq s)) c._2
    else {
      val nc = GraftCatalog(s, warehouse)
      cachedCat = (s, nc)
      nc
    }
  }

  private def toIdent(ident: Identifier): TableIdent = {
    require(ident.namespace().length == 1,
      s"graft supports single-level namespaces, got ${ident.namespace().mkString(".")}")
    TableIdent(ident.namespace()(0), ident.name())
  }

  // ---- tables --------------------------------------------------------

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    require(namespace.length == 1, "graft supports single-level namespaces")
    cat.listTables(namespace(0))
      .map(t => Identifier.of(Array(t.namespace), t.name)).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    // `graft.ns.t.history` parses as namespace [ns, t] + name "history":
    // a two-level namespace whose prefix is a real table selects a
    // METADATA table (Iceberg's metadata-table surface)
    if (ident.namespace().length == 2 &&
        GraftMetadataTable.Kinds.contains(ident.name().toLowerCase)) {
      val parent = TableIdent(ident.namespace()(0), ident.namespace()(1))
      if (cat.exists(parent))
        return new GraftMetadataTable(cat.load(parent),
          ident.name().toLowerCase, ident.toString)
    }
    // `graft.ns.t.changes` = the CDC relation (batch + streaming), the
    // Delta-CDF/Iceberg-changelog surface over scanChangesBetween
    if (ident.namespace().length == 2 && ident.name().equalsIgnoreCase("changes")) {
      val parent = TableIdent(ident.namespace()(0), ident.namespace()(1))
      if (cat.exists(parent))
        return new GraftChangesTable(cat.load(parent), ident)
    }
    // `graft.ns.t.branch_audit.changes` = the CDC relation over a
    // BRANCH's log — audit exactly what a WAP branch staged, commit by
    // commit, before publishing it
    if (ident.namespace().length == 3 && ident.name().equalsIgnoreCase("changes") &&
        ident.namespace()(2).toLowerCase.startsWith(BranchPrefix)) {
      val parent = TableIdent(ident.namespace()(0), ident.namespace()(1))
      val bname = ident.namespace()(2).substring(BranchPrefix.length)
      if (cat.exists(parent)) {
        val tbl = cat.load(parent)
        // resolve case-insensitively, like the prefix check above —
        // `BRANCH_AUDIT.changes` must find branch 'audit', not throw
        tbl.listBranches().find(_.equalsIgnoreCase(bname)).foreach { b =>
          return new GraftChangesTable(tbl.branch(b), ident)
        }
      }
    }
    // `graft.ns.t.branch_audit` = the table seen through branch
    // 'audit', READ-WRITE — the Iceberg branch-identifier surface that
    // makes the WAP loop reachable from pure SQL: INSERT INTO the
    // branch ident stages commits on the branch log only, audit
    // queries SELECT from it, and `CALL graft.system.fast_forward`
    // publishes.
    if (ident.namespace().length == 2 &&
        ident.name().toLowerCase.startsWith(BranchPrefix)) {
      val parent = TableIdent(ident.namespace()(0), ident.namespace()(1))
      val bname = ident.name().substring(BranchPrefix.length)
      if (cat.exists(parent)) {
        val tbl = cat.load(parent)
        // `graft.ns.t.BRANCH_AUDIT` resolves like `branch_audit`: the
        // prefix check is case-insensitive, so the name lookup is too
        tbl.listBranches().find(_.equalsIgnoreCase(bname)).foreach { b =>
          return new GraftV2Table(tbl.branch(b), ident)
        }
      }
    }
    if (ident.namespace().length != 1) throw new NoSuchTableException(ident)
    val ti = toIdent(ident)
    if (!cat.exists(ti)) throw new NoSuchTableException(ident)
    new GraftV2Table(cat.load(ti), ident)
  }

  private val BranchPrefix = "branch_"

  /** SQL `VERSION AS OF <v>` — a log version number, a TAG name
    * (`VERSION AS OF 'prod-2024-05'`), or a BRANCH name (the branch's
    * current head — a read-only view of staged WAP writes), resolved
    * through the table's named refs; tags win a (disallowed-by-
    * construction) name collision. Works on metadata tables too
    * (`t.files VERSION AS OF 3` = that snapshot's file inventory, the
    * Iceberg surface).
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    // Left(pin) = a main-log version; Right(view) = a branch's table
    // view (its own log — "latest of that log", not a frozen version)
    def resolve(tbl: graft.table.GraftTable): Either[Int, graft.table.GraftTable] =
      version.toIntOption.map(Left(_)).getOrElse {
        if (tbl.tags().contains(version)) Left(tbl.snapshotAtTag(version).version)
        else if (tbl.listBranches().contains(version)) Right(tbl.branch(version))
        else Left(tbl.snapshotAtTag(version).version) // throws the tag's not-found error
      }
    if (ident.namespace().length == 2 &&
        GraftMetadataTable.Kinds.contains(ident.name().toLowerCase)) {
      val parent = TableIdent(ident.namespace()(0), ident.namespace()(1))
      if (cat.exists(parent)) {
        val tbl = cat.load(parent)
        return resolve(tbl) match {
          case Left(v) => new GraftMetadataTable(tbl,
            ident.name().toLowerCase, ident.toString, Some(v))
          case Right(view) => new GraftMetadataTable(view,
            ident.name().toLowerCase, ident.toString)
        }
      }
    }
    if (ident.namespace().length != 1) throw new NoSuchTableException(ident)
    val ti = toIdent(ident)
    if (!cat.exists(ti)) throw new NoSuchTableException(ident)
    val tbl = cat.load(ti)
    resolve(tbl) match {
      case Left(v) => new GraftV2Table(tbl, ident, Some(Left(v)))
      // AS OF is a read surface: pin the branch view to its current
      // head so the result is a stable read-only snapshot, like every
      // other AS OF
      case Right(view) =>
        new GraftV2Table(view, ident, Some(Left(view.currentOrFail().version)))
    }
  }

  /** SQL `TIMESTAMP AS OF <ts>` — Spark passes MICROseconds. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    if (ident.namespace().length == 2 &&
        GraftMetadataTable.Kinds.contains(ident.name().toLowerCase)) {
      val parent = TableIdent(ident.namespace()(0), ident.namespace()(1))
      if (cat.exists(parent)) {
        val tbl = cat.load(parent)
        return new GraftMetadataTable(tbl, ident.name().toLowerCase,
          ident.toString,
          Some(tbl.snapshotAsOfTimestamp(timestamp / 1000L).version))
      }
    }
    if (ident.namespace().length != 1) throw new NoSuchTableException(ident)
    val ti = toIdent(ident)
    if (!cat.exists(ti)) throw new NoSuchTableException(ident)
    new GraftV2Table(cat.load(ti), ident, Some(Right(timestamp / 1000L)))
  }

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    val ti = toIdent(ident)
    if (cat.exists(ti)) throw new TableAlreadyExistsException(ident)
    require(!views.exists(ti.namespace, ti.name),
      s"cannot create table $ident: a view with that name exists")
    // multi-field specs compose in declaration order — `PARTITIONED BY
    // (days(ts), bucket(16, id))` is the canonical 100-TB layout
    val spec =
      if (partitions.isEmpty) None
      else Some(partitions.map(transformToSpec).mkString(", "))
    val tbl = cat.ensure(ti, spec)
    // materialize snapshot v0 with the declared schema (empty file group)
    val spark = SparkSession.active
    tbl.append(spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema))
    // TBLPROPERTIES: persist user properties (dropping the engine-
    // reserved keys Spark injects) so e.g. bloom-filter write options
    // take effect from the first INSERT
    val userProps = properties.asScala.toMap --
      Seq("provider", "location", "owner", "external", "comment")
    if (userProps.nonEmpty) tbl.updateProperties(userProps)
    new GraftV2Table(cat.load(ti), ident)
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val tbl = cat.load(toIdent(ident))
    val adds = changes.collect { case a: TableChange.AddColumn => a }
    val widens = changes.collect { case u: TableChange.UpdateColumnType => u }
    val renames = changes.collect { case r: TableChange.RenameColumn => r }
    val drops = changes.collect { case d: TableChange.DeleteColumn => d }
    val sets = changes.collect { case p: TableChange.SetProperty => p }
    val removes = changes.collect { case p: TableChange.RemoveProperty => p }
    require(adds.size + widens.size + renames.size + drops.size +
        sets.size + removes.size == changes.size,
      "graft supports additive column changes, type WIDENING " +
        "(int->long, float->double, decimal growth), RENAME/DROP COLUMN " +
        "(metadata-only, field-id mapped), and property changes " +
        "(reference C2 semantics + Iceberg evolution)")
    // MV dependency guard (round-16): a materialized view pins its
    // definition SQL in storage-table properties; renaming or dropping
    // a source column that SQL references would break the next refresh
    // with a raw analysis error (or silently empty a changelog slice).
    // Refuse by NAME with the remedy instead — the same protection
    // regular view DDL already gets from the mview marker. Metadata-
    // scale sweep, only on the rare rename/drop DDL path.
    if (renames.nonEmpty || drops.nonEmpty) {
      val ti = toIdent(ident)
      val rel = s"${ti.namespace}/${ti.name}"
      // MV STORAGE (and dedup-level aux) tables are managed by
      // create/refresh/drop_mview — column DDL aimed at one would
      // desync the stored shape spec from the schema (same family as
      // the renameTable guard below)
      val base = ti.name.replaceFirst("__dl\\d+$", "")
      if (base.endsWith(GraftMaterializedView.StorageSuffix)) {
        val mv = base.stripSuffix(GraftMaterializedView.StorageSuffix)
        require(!views.load(ti.namespace, mv)
            .exists(_.properties.get("graft.mview").contains("true")),
          s"cannot rename/drop columns of $ident: it is storage of " +
            s"materialized view ${ti.namespace}.$mv (managed by " +
            "create/drop_mview)")
      }
      val verbs =
        renames.map(r => (r.fieldNames().last,
          s"rename column '${r.fieldNames().last}' to '${r.newName()}'")) ++
        drops.map(d => (d.fieldNames().last, s"drop column '${d.fieldNames().last}'"))
      verbs.foreach { case (c, verb) =>
        val deps = GraftMaterializedView.mviewsReferencing(
          SparkSession.active, cat, rel, c)
        require(deps.isEmpty,
          s"cannot $verb on $ident: materialized view(s) " +
            s"${deps.mkString(", ")} pin definition SQL referencing '$c'. " +
            "CALL graft.system.drop_mview for each, evolve the column, and " +
            "recreate the view over the new name")
      }
    }
    renames.foreach { r =>
      require(r.fieldNames().length == 1, "top-level columns only")
      tbl.renameColumn(r.fieldNames()(0), r.newName())
    }
    drops.foreach { d =>
      require(d.fieldNames().length == 1, "top-level columns only")
      tbl.dropColumn(d.fieldNames()(0))
    }
    adds.foreach { a =>
      require(a.fieldNames().length == 1, "top-level columns only (reference C2)")
      tbl.evolveSchema(StructType(tbl.schema.fields :+
        org.apache.spark.sql.types.StructField(
          a.fieldNames()(0), a.dataType(), nullable = true)))
    }
    // ALTER TABLE ... ALTER COLUMN c TYPE t — legal widenings only;
    // old files read back through the widened schema (reader upcast)
    widens.foreach { u =>
      require(u.fieldNames().length == 1, "top-level columns only")
      val name = u.fieldNames()(0)
      val cur = tbl.schema.fields.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(s"unknown column '$name'"))
      require(graft.table.Projection.widens(cur.dataType, u.newDataType()),
        s"cannot change ${cur.name}: ${cur.dataType.catalogString} -> " +
          s"${u.newDataType().catalogString} is not a legal widening")
      tbl.evolveSchema(StructType(tbl.schema.fields.map(f =>
        if (f.name.equalsIgnoreCase(name)) f.copy(dataType = u.newDataType()) else f)))
    }
    if (sets.nonEmpty || removes.nonEmpty)
      tbl.updateProperties(
        sets.map(p => p.property -> p.value).toMap,
        removes.map(_.property))
    new GraftV2Table(cat.load(toIdent(ident)), ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val ti = toIdent(ident)
    if (!cat.exists(ti)) false
    else { cat.drop(ti); true }
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val ti = toIdent(oldIdent)
    // MV dependency guards (round-16, same family as the column guard):
    // an MV pins its sources by REL ("ns/table") in storage props —
    // renaming a source strands every pin; and an MV's own storage/aux
    // tables are name-derived (view name + __rows [+ __dl<i>]), so
    // renaming one desyncs the registered view. Refuse both by name.
    val deps = GraftMaterializedView.mviewsReading(cat, s"${ti.namespace}/${ti.name}")
    require(deps.isEmpty,
      s"cannot rename $oldIdent: materialized view(s) ${deps.mkString(", ")} " +
        "pin it as a source — CALL graft.system.drop_mview for each and " +
        "recreate over the new name")
    // managed MV tables are named exactly <view> + "__rows" (storage) or
    // <view> + "__rows__dl<i>" (dedup-level aux) — match those SUFFIX
    // shapes, not a mid-name substring, so a user table that merely
    // contains "__rows" (e.g. m1__rowsx) is not spuriously refused
    val base = ti.name.replaceFirst("__dl\\d+$", "")
    if (base.endsWith(GraftMaterializedView.StorageSuffix)) {
      val mv = base.stripSuffix(GraftMaterializedView.StorageSuffix)
      require(!views.load(ti.namespace, mv)
          .exists(_.properties.get("graft.mview").contains("true")),
        s"cannot rename $oldIdent: it is storage of materialized view " +
          s"${ti.namespace}.$mv (managed by create/drop_mview)")
    }
    cat.rename(ti, toIdent(newIdent))
  }

  // ---- namespaces ----------------------------------------------------

  /** Lists every namespace DIRECTORY (consistent with namespaceExists /
    * CREATE NAMESPACE), not just namespaces that already hold tables —
    * GraftCatalog.listNamespaces' table-bearing filter would hide a
    * namespace immediately after CREATE NAMESPACE.
    */
  override def listNamespaces(): Array[Array[String]] = {
    try cat.fs.listStatus(new org.apache.hadoop.fs.Path(warehouse))
      .filter(_.isDirectory)
      .map(st => Array(st.getPath.getName))
      .sortBy(_.head)
    catch { case _: java.io.FileNotFoundException => Array.empty }
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces()
    else throw new NoSuchNamespaceException(namespace)

  private def nsPath(ns: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(warehouse, ns)

  private def whFs: org.apache.hadoop.fs.FileSystem = cat.fs

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.length == 1 && {
      try whFs.getFileStatus(nsPath(namespace(0))).isDirectory
      catch { case _: java.io.FileNotFoundException => false }
    }

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace)) throw new NoSuchNamespaceException(namespace)
    util.Collections.emptyMap()
  }

  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    require(namespace.length == 1, "graft supports single-level namespaces")
    whFs.mkdirs(nsPath(namespace(0)))
    ()
  }

  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft namespaces carry no metadata")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    require(namespace.length == 1, "graft supports single-level namespaces")
    if (!namespaceExists(namespace)) false
    else if (!cascade && cat.listTables(namespace(0)).nonEmpty)
      throw new IllegalStateException(s"namespace ${namespace(0)} is not empty")
    else whFs.delete(nsPath(namespace(0)), true)
  }

  // ---- SQL views -----------------------------------------------------

  /** The warehouse's view store (one JSON file per view under
    * `<ns>/_views/`). Spark 4.1's engine never calls the [[ViewCatalog]]
    * face itself (ResolveSessionCatalog still rejects view DDL on
    * non-session catalogs), so graft routes the SQL surface through
    * [[GraftSqlParser]] + [[GraftViewSubstitution]] — but the face is
    * implemented fully so programmatic callers (and future Spark
    * versions that do wire it) get the standard contract.
    */
  private[connector] def views: GraftViewStore = new GraftViewStore(cat.fs, cat.warehouse)

  private[connector] def tableExists(ns: String, name: String): Boolean =
    cat.exists(TableIdent(ns, name))

  private def viewNs(ident: Identifier): String = {
    require(ident.namespace().length == 1,
      s"graft supports single-level namespaces, got ${ident.namespace().mkString(".")}")
    ident.namespace()(0)
  }

  override def listViews(namespace: String*): Array[Identifier] = {
    require(namespace.length == 1, "graft supports single-level namespaces")
    views.list(namespace.head)
      .map(n => Identifier.of(Array(namespace.head), n)).toArray
  }

  override def viewExists(ident: Identifier): Boolean =
    ident.namespace().length == 1 && views.exists(viewNs(ident), ident.name())

  override def loadView(ident: Identifier): View = {
    val sv = views.load(viewNs(ident), ident.name()).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident))
    new GraftView(ident, sv)
  }

  override def createView(info: ViewInfo): View = {
    val ns = viewNs(info.ident())
    require(!tableExists(ns, info.ident().name()),
      s"cannot create view ${info.ident()}: a table with that name exists")
    GraftViewSql.requireNoReservedProps(
      info.properties().asScala.keys, "createView")
    val sv = StoredView(
      sql = info.sql(),
      currentCatalog = info.currentCatalog(),
      currentNamespace = info.currentNamespace().toSeq,
      schema = info.schema(),
      queryColumnNames = info.queryColumnNames().toSeq,
      columnAliases = info.columnAliases().toSeq,
      columnComments = info.columnComments().toSeq.map(Option(_)),
      properties = info.properties().asScala.toMap,
      schemaMode = "SchemaCompensation")
    if (!views.create(ns, info.ident().name(), sv, replace = false))
      throw new org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException(info.ident())
    new GraftView(info.ident(), sv)
  }

  override def alterView(ident: Identifier, changes: ViewChange*): View = {
    val ns = viewNs(ident)
    GraftViewSql.requireNotMaterialized(this, ident, "alterView")
    val sv = views.load(ns, ident.name()).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchViewException(ident))
    val props = changes.foldLeft(sv.properties) {
      case (p, s: ViewChange.SetProperty) =>
        GraftViewSql.requireNoReservedProps(Seq(s.property()), "alterView")
        p + (s.property() -> s.value())
      case (p, r: ViewChange.RemoveProperty) =>
        GraftViewSql.requireNoReservedProps(Seq(r.property()), "alterView")
        p - r.property()
      case (_, other) => throw new IllegalArgumentException(
        s"unsupported view change: $other")
    }
    val updated = sv.copy(properties = props)
    views.create(ns, ident.name(), updated, replace = true)
    new GraftView(ident, updated)
  }

  override def dropView(ident: Identifier): Boolean = {
    if (ident.namespace().length == 1)
      GraftViewSql.requireNotMaterialized(this, ident, "dropView")
    ident.namespace().length == 1 && views.drop(viewNs(ident), ident.name())
  }

  override def renameView(oldIdent: Identifier, newIdent: Identifier): Unit = {
    GraftViewSql.requireNotMaterialized(this, oldIdent, "renameView")
    require(!tableExists(viewNs(newIdent), newIdent.name()),
      s"cannot rename view to $newIdent: a table with that name exists")
    views.rename(viewNs(oldIdent), oldIdent.name(), viewNs(newIdent), newIdent.name())
  }

  // ---- maintenance procedures (CALL graft.system.<proc>) ------------

  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure = {
    require(ident.namespace().sameElements(GraftProcedures.Namespace),
      s"procedures live in the 'system' namespace, got ${ident.namespace().mkString(".")}")
    GraftProcedures.load(() => cat, ident.name(), catalogName).getOrElse(
      throw new IllegalArgumentException(
        s"unknown procedure ${ident.name()}; available: ${GraftProcedures.Names.mkString(", ")}"))
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(GraftProcedures.Namespace))
      GraftProcedures.Names.map(n => Identifier.of(GraftProcedures.Namespace, n)).toArray
    else Array.empty

  // ---- V2 functions (storage-partitioned join resolution) -----------

  /** `bucket` and `days` V2 functions: Spark loads them (top-level
    * identifier, empty namespace) when resolving a reported
    * `bucket(n, col)` / `days(ts)` scan partitioning into the Catalyst
    * `TransformExpression` storage-partitioned joins compare.
    */
  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.namespace().nonEmpty) throw new NoSuchFunctionException(ident)
    else ident.name().toLowerCase match {
      case "bucket" => GraftBucketFunction
      case "days" => GraftDaysFunction
      case "years" => GraftYearsFunction
      case "months" => GraftMonthsFunction
      case "hours" => GraftHoursFunction
      case _ => throw new NoSuchFunctionException(ident)
    }

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty)
      Array("bucket", "days", "years", "months", "hours")
        .map(Identifier.of(Array.empty, _))
    else Array.empty

  // ---- partition-transform mapping ----------------------------------

  /** DSv2 `Transform` → the reference partition DSL (SURVEY §2.5). */
  private def transformToSpec(t: Transform): String = {
    def ref: String = {
      val refs = t.references()
      require(refs.length == 1 && refs(0).fieldNames().length == 1,
        s"single top-level partition source column required, got ${t.describe()}")
      refs(0).fieldNames()(0)
    }
    def intArg: String = t.arguments().collectFirst {
      case l: V2Literal[_] => l.value.toString
    }.getOrElse(throw new IllegalArgumentException(
      s"expected an integer argument in ${t.describe()}"))
    t.name() match {
      case "identity" => ref
      case "years" | "year" => s"year($ref)"
      case "months" | "month" => s"month($ref)"
      case "days" | "day" => s"day($ref)"
      case "hours" | "hour" => s"hour($ref)"
      case "bucket" => s"bucket($intArg, $ref)"
      case "truncate" => s"truncate($intArg, $ref)"
      case "void" => s"void($ref)"
      case other => throw new IllegalArgumentException(
        s"unsupported partition transform: $other")
    }
  }

  // silence unused-import warnings for types referenced in signatures
  private val _ = (classOf[NamedReference], classOf[V2Expression])
}

/** DSv2 [[View]] over a [[StoredView]]. */
final class GraftView(ident: Identifier, sv: StoredView) extends View {
  override def name(): String = ident.toString
  override def query(): String = sv.sql
  override def currentCatalog(): String = sv.currentCatalog
  override def currentNamespace(): Array[String] = sv.currentNamespace.toArray
  override def schema(): StructType = sv.schema
  override def queryColumnNames(): Array[String] = sv.queryColumnNames.toArray
  override def columnAliases(): Array[String] = sv.columnAliases.toArray
  override def columnComments(): Array[String] = sv.columnComments.map(_.orNull).toArray
  override def properties(): util.Map[String, String] = sv.properties.asJava
}
