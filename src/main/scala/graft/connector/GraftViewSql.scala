package graft.connector

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.{CTESubstitution, CurrentNamespace, NoSuchViewException, SchemaBinding, SchemaCompensation, SchemaEvolution, SchemaTypeEvolution, UnresolvedAttribute, UnresolvedIdentifier, UnresolvedNamespace, UnresolvedRelation, UnresolvedSubqueryColumnAliases, ViewSchemaMode}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, UpCast}
import org.apache.spark.sql.catalyst.parser.{ParserInterface, ParseException}
import org.apache.spark.sql.catalyst.plans.logical.{AlterViewAs, CreateView, DescribeRelation, DropView, LogicalPlan, Project, RenameTable, SetViewProperties, ShowCreateTable, ShowViews, SubqueryAlias, UnsetViewProperties}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** SQL views over graft catalogs — `CREATE [OR REPLACE] VIEW`,
  * `DROP VIEW`, `SHOW VIEWS`, and reads that resolve anywhere a table
  * can appear (joins, subqueries, CTEs, nested views).
  *
  * Spark 4.1 ships the DSv2 `ViewCatalog` interface but no engine
  * support: `ResolveSessionCatalog` unconditionally rejects view DDL on
  * non-session catalogs (`MISSING_CATALOG_ABILITY.VIEWS`) and nothing
  * resolves view reads, so — like Iceberg's view support — graft plugs
  * in at the two points the engine leaves open:
  *
  *  - [[GraftSqlParser]] (session extension `injectParser`): intercepts
  *    the three view-DDL plan shapes AT PARSE TIME, before the analyzer
  *    batch containing the rejection can run, and rewrites them to
  *    runnable commands when (and only when) the target catalog is a
  *    [[GraftSparkCatalog]]. Every other statement passes through
  *    verbatim.
  *  - [[GraftViewSubstitution]] (`injectResolutionRule`): expands an
  *    `UnresolvedRelation` naming a stored view into its parsed query
  *    during analysis. Relation names INSIDE the view are qualified
  *    against the view's stored creation context first (its
  *    catalog/namespace — `SELECT * FROM t` keeps meaning the t it
  *    meant when created), CTE names are substituted before that so a
  *    view's own WITH clauses are never misqualified, nested views
  *    expand recursively with cycle detection, and the stored schema is
  *    enforced per the view's schema mode: BINDING/COMPENSATION project
  *    the stored names with `UpCast` (type drift fails loudly instead
  *    of silently truncating), TYPE EVOLUTION re-derives types but pins
  *    names, EVOLUTION re-derives everything.
  *
  * Temporary-view hygiene matches the SQL standard and Spark's session
  * views: a persistent view may not reference a temporary view
  * (rejected at CREATE), and `DROP VIEW`/`CREATE VIEW` on a name that
  * is currently a temp view stays with the session-catalog path.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  @throws[ParseException]
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftViewSql.rewriteDdl(session, delegate.parsePlan(sqlText))

  override def parsePlanWithParameters(
      sqlText: String,
      ctx: org.apache.spark.sql.catalyst.parser.ParameterContext): LogicalPlan =
    GraftViewSql.rewriteDdl(session, delegate.parsePlanWithParameters(sqlText, ctx))

  @throws[ParseException]
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)

  @throws[ParseException]
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)

  @throws[ParseException]
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)

  @throws[ParseException]
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)

  @throws[ParseException]
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)

  @throws[ParseException]
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)

  @throws[ParseException]
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)

  @throws[ParseException]
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftViewSql {

  /** (catalog plugin, its name, single-level-namespace ident) when
    * `parts` targets a graft catalog — explicit (`graft.ns.v`) or via
    * the session's current catalog. Mirrors Spark's CatalogAndIdentifier
    * resolution: a first part naming a registered catalog wins,
    * otherwise the current catalog + current namespace apply.
    */
  def graftTarget(spark: SparkSession, parts: Seq[String])
      : Option[(GraftSparkCatalog, String, Identifier)] = {
    val cm = spark.sessionState.catalogManager
    val resolved: Option[(org.apache.spark.sql.connector.catalog.CatalogPlugin, Seq[String])] =
      if (parts.length > 1 && cm.isCatalogRegistered(parts.head))
        Some((cm.catalog(parts.head), parts.tail))
      else if (parts.length == 1) Some((cm.currentCatalog, cm.currentNamespace.toSeq ++ parts))
      else Some((cm.currentCatalog, parts))
    resolved.collect {
      case (g: GraftSparkCatalog, rest) if rest.length == 2 =>
        (g, g.name(), Identifier.of(Array(rest.head), rest.last))
    }
  }

  private def isTempView(spark: SparkSession, parts: Seq[String]): Boolean =
    try spark.sessionState.catalog.isTempView(parts)
    catch { case _: Exception => false }

  /** A materialized view's PUBLIC view is paired with its storage table
    * — redefining, renaming, or dropping it directly would desync the
    * pair. The MV procedures are the management surface.
    */
  private[connector] def requireNotMaterialized(catalog: GraftSparkCatalog,
                                                ident: Identifier,
                                                verb: String): Unit =
    if (catalog.views.load(ident.namespace()(0), ident.name())
        .exists(_.properties.contains("graft.mview")))
      throw new UnsupportedOperationException(
        s"$ident is the public view of a materialized view — $verb would " +
          "desync it from its storage. Use CALL graft.system.drop_mview " +
          "(or recreate via create_mview)")

  /** User-supplied view properties may not carry the reserved
    * materialized-view marker (or its namespace): a hand-marked view
    * would be refused by every regular DDL verb and removable only by
    * drop_mview. The MV procedure writes the marker through
    * [[GraftViewStore]] directly, bypassing this guard by design.
    */
  private[connector] def requireNoReservedProps(props: Iterable[String],
                                                what: String): Unit = {
    val bad = props.filter(k => k == "graft.mview" || k.startsWith("graft.mview."))
    require(bad.isEmpty,
      s"$what: ${bad.mkString(", ")} — reserved marker propert" +
        s"${if (bad.size == 1) "y" else "ies"} managed by the " +
        "materialized-view procedures")
  }

  /** Parse-time rewrite of the three view-DDL shapes; everything else
    * passes through untouched.
    */
  def rewriteDdl(session: SparkSession, plan: LogicalPlan): LogicalPlan = plan match {
    case c @ CreateView(UnresolvedIdentifier(parts, _), cols, comment, collation,
        props, originalText, query, allowExisting, replace, schemaMode)
        if !isTempView(session, parts) =>
      graftTarget(session, parts).map { case (_, catName, ident) =>
        require(collation.isEmpty,
          "graft views do not support DEFAULT COLLATION")
        val text = originalText.getOrElse(throw new IllegalArgumentException(
          "graft views require the original query text"))
        GraftCreateViewCommand(catName, ident, cols, comment, props, text,
          query, allowExisting, replace, schemaMode): LogicalPlan
      }.getOrElse(c)

    case d @ DropView(UnresolvedIdentifier(parts, _), ifExists)
        if !isTempView(session, parts) =>
      graftTarget(session, parts).map { case (_, catName, ident) =>
        GraftDropViewCommand(catName, ident, ifExists): LogicalPlan
      }.getOrElse(d)

    case a @ AlterViewAs(v: org.apache.spark.sql.catalyst.analysis.UnresolvedView,
        originalText, query) if !isTempView(session, v.multipartIdentifier) =>
      graftTarget(session, v.multipartIdentifier).map { case (_, catName, ident) =>
        GraftAlterViewAsCommand(catName, ident, originalText, query): LogicalPlan
      }.getOrElse(a)

    case p @ SetViewProperties(v: org.apache.spark.sql.catalyst.analysis.UnresolvedView,
        props) if !isTempView(session, v.multipartIdentifier) =>
      graftTarget(session, v.multipartIdentifier).map { case (_, catName, ident) =>
        GraftViewPropertiesCommand(catName, ident, set = props): LogicalPlan
      }.getOrElse(p)

    case p @ UnsetViewProperties(v: org.apache.spark.sql.catalyst.analysis.UnresolvedView,
        keys, ifExists) if !isTempView(session, v.multipartIdentifier) =>
      graftTarget(session, v.multipartIdentifier).map { case (_, catName, ident) =>
        GraftViewPropertiesCommand(catName, ident, unset = keys,
          unsetIfExists = ifExists): LogicalPlan
      }.getOrElse(p)

    case r @ RenameTable(t: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView,
        newName, true) if !isTempView(session, t.multipartIdentifier) =>
      graftTarget(session, t.multipartIdentifier).map { case (_, catName, ident) =>
        GraftRenameViewCommand(catName, ident, newName): LogicalPlan
      }.getOrElse(r)

    // SHOW CREATE TABLE on a stored view reproduces its DDL (the
    // session-catalog behavior); tables keep the V2 engine path
    case sc @ ShowCreateTable(
        t: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView,
        false, output) if !isTempView(session, t.multipartIdentifier) =>
      graftTarget(session, t.multipartIdentifier) match {
        case Some((g, catName, ident))
            if g.views.exists(ident.namespace()(0), ident.name()) =>
          GraftShowCreateViewCommand(catName, ident, output)
        case _ => sc
      }

    // DESCRIBE parses to one shape for tables and views; intercept only
    // when the target actually IS a stored graft view (a store lookup at
    // parse time) so table describes keep the engine path
    case d @ DescribeRelation(
        t: org.apache.spark.sql.catalyst.analysis.UnresolvedTableOrView,
        _, isExtended, output) if !isTempView(session, t.multipartIdentifier) =>
      graftTarget(session, t.multipartIdentifier) match {
        case Some((g, catName, ident))
            if g.views.exists(ident.namespace()(0), ident.name()) =>
          GraftDescribeViewCommand(catName, ident, isExtended, output)
        case _ => d
      }

    case s @ ShowViews(nsPlan, pattern, output) =>
      val cm = session.sessionState.catalogManager
      val target = nsPlan match {
        case UnresolvedNamespace(parts, _) if parts.nonEmpty =>
          if (cm.isCatalogRegistered(parts.head)) Some((cm.catalog(parts.head), parts.tail))
          else Some((cm.currentCatalog, parts))
        case UnresolvedNamespace(_, _) | CurrentNamespace =>
          Some((cm.currentCatalog, cm.currentNamespace.toSeq))
        case _ => None
      }
      target match {
        case Some((g: GraftSparkCatalog, Seq(ns))) =>
          GraftShowViewsCommand(g.name(), ns, pattern, output)
        case _ => s
      }

    case other => other
  }

  /** Expand a stored view into its (qualified, schema-enforced) parsed
    * query. `seen` carries the expansion path for cycle detection.
    */
  private[connector] def expand(spark: SparkSession, catalog: GraftSparkCatalog,
                                catName: String, ident: Identifier,
                                sv: StoredView, seen: Set[String]): LogicalPlan = {
    val path = seen +
      s"$catName.${ident.namespace().mkString(".")}.${ident.name()}".toLowerCase
    // parseQuery, not parsePlan: a stored view body must be a QUERY —
    // command text smuggled into a view file must fail at parse, not run
    val parsed = spark.sessionState.sqlParser.parseQuery(sv.sql)
    // substitute the view's own WITH-clause names BEFORE qualification,
    // so a CTE named like a table is never rewritten into one (the
    // analyzer's Substitution batch already ran on the OUTER plan and
    // never re-runs, so the fresh subtree pays it here; named WINDOW
    // clauses — analyzer-instance-scoped substitution — stay
    // unsupported in view bodies and fail loudly at CheckAnalysis)
    val withCtes = CTESubstitution(parsed)
    val qualified = withCtes.transformDownWithSubqueries {
      case UnresolvedRelation(parts, opts, false) =>
        val full: Seq[String] =
          if (parts.length == 1) (sv.currentCatalog +: sv.currentNamespace) :+ parts.head
          else if (parts.length == 2) sv.currentCatalog +: parts
          else parts
        graftTarget(spark, full) match {
          case Some((g, cn, vid)) =>
            val nestedKey = s"$cn.${vid.namespace().mkString(".")}.${vid.name()}".toLowerCase
            g.views.load(vid.namespace()(0), vid.name()) match {
              case Some(nested) =>
                if (path.contains(nestedKey))
                  throw new IllegalStateException(
                    s"cyclic view reference: ${(path + nestedKey).mkString(" -> ")}")
                expand(spark, g, cn, vid, nested, path)
              case None => new UnresolvedRelation(full, opts, false)
            }
          case None => new UnresolvedRelation(full, opts, false)
        }
    }
    val aliased =
      if (sv.columnAliases.nonEmpty) UnresolvedSubqueryColumnAliases(sv.columnAliases, qualified)
      else qualified
    // schema enforcement per mode: EVOLUTION re-derives everything,
    // TYPE EVOLUTION pins names, BINDING/COMPENSATION pin names AND
    // types (UpCast fails loudly on non-up-castable drift)
    val enforced = sv.schemaMode match {
      case "SchemaEvolution" => aliased
      case "SchemaTypeEvolution" =>
        Project(sv.schema.fields.toIndexedSeq.map(f =>
          Alias(UnresolvedAttribute.quoted(f.name), f.name)()), aliased)
      case _ =>
        Project(sv.schema.fields.toIndexedSeq.map(f =>
          Alias(UpCast(UnresolvedAttribute.quoted(f.name), f.dataType, Nil), f.name)()),
          aliased)
    }
    SubqueryAlias(Seq(catName) ++ ident.namespace() :+ ident.name(), enforced)
  }
}

/** Analyzer rule: an `UnresolvedRelation` naming a stored graft view
  * becomes the view's expanded query. Runs fixed-point with the rest of
  * resolution, so views work inside joins, subqueries (the analyzer
  * re-enters extension rules per subquery plan), CTE bodies, and other
  * views.
  */
case class GraftViewSubstitution(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    // table relations never reach this rule: Spark's own ResolveRelations
    // runs earlier in the Resolution batch and resolves them first, so
    // the view-store lookup (one directory listing) is paid only by
    // actual view references and by the error path of missing tables
    case u @ UnresolvedRelation(parts, _, false) =>
      GraftViewSql.graftTarget(spark, parts).flatMap { case (g, cn, ident) =>
        g.views.load(ident.namespace()(0), ident.name()).map(sv =>
          GraftViewSql.expand(spark, g, cn, ident, sv, Set.empty))
      }.getOrElse(u)
  }
}

/** `CREATE [OR REPLACE] VIEW [IF NOT EXISTS]` on a graft catalog. The
  * query is analyzed HERE (against the creating session's resolution
  * context) to capture the stored schema; the original text is what
  * persists and re-resolves on every read.
  */
case class GraftCreateViewCommand(catalogName: String, ident: Identifier,
                                  userColumns: Seq[(String, Option[String])],
                                  comment: Option[String],
                                  properties: Map[String, String],
                                  originalText: String,
                                  query: LogicalPlan,
                                  allowExisting: Boolean,
                                  replace: Boolean,
                                  schemaMode: ViewSchemaMode)
    extends LeafRunnableCommand {

  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(spark: SparkSession): Seq[Row] = {
    val catalog = spark.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[GraftSparkCatalog]
    val ns = ident.namespace()(0)

    // SQL-standard hygiene: a persistent view outlives the session, so
    // it may not capture session-scoped temp views
    val tempRefs = query.collectWithSubqueries {
      case r: UnresolvedRelation
          if spark.sessionState.catalog.isTempView(r.multipartIdentifier) =>
        r.multipartIdentifier.mkString(".")
    }
    require(tempRefs.isEmpty,
      s"cannot create persistent view $ident referencing temporary view(s): " +
        tempRefs.mkString(", "))

    val analyzed = spark.sessionState.executePlan(query).analyzed
    if (userColumns.nonEmpty)
      require(userColumns.length == analyzed.output.length,
        s"view column list has ${userColumns.length} names but the query " +
          s"produces ${analyzed.output.length} columns")
    val finalNames =
      if (userColumns.nonEmpty) userColumns.map(_._1)
      else analyzed.output.map(_.name)
    val dups = finalNames.groupBy(_.toLowerCase).collect { case (k, vs) if vs.size > 1 => k }
    require(dups.isEmpty,
      s"view $ident has duplicate column name(s): ${dups.mkString(", ")} — alias them")

    require(!catalog.tableExists(ns, ident.name()),
      s"cannot create view $catalogName.$ns.${ident.name()}: a table with that name exists")
    GraftViewSql.requireNoReservedProps(properties.keys, "CREATE VIEW")
    if (replace)
      GraftViewSql.requireNotMaterialized(catalog, ident, "CREATE OR REPLACE VIEW")

    val cm = spark.sessionState.catalogManager
    val sv = StoredView(
      sql = originalText,
      currentCatalog = cm.currentCatalog.name(),
      currentNamespace = cm.currentNamespace.toSeq,
      schema = StructType(finalNames.zip(analyzed.output).map { case (n, a) =>
        org.apache.spark.sql.types.StructField(n, a.dataType, a.nullable)
      }),
      queryColumnNames = analyzed.output.map(_.name),
      columnAliases = if (userColumns.nonEmpty) userColumns.map(_._1) else Nil,
      columnComments = if (userColumns.nonEmpty) userColumns.map(_._2) else Nil,
      properties = properties ++ comment.map("comment" -> _),
      schemaMode = schemaMode match {
        case SchemaEvolution => "SchemaEvolution"
        case SchemaTypeEvolution => "SchemaTypeEvolution"
        case SchemaBinding => "SchemaBinding"
        case SchemaCompensation => "SchemaCompensation"
        case _ => "SchemaCompensation"
      })
    if (!catalog.views.create(ns, ident.name(), sv, replace)) {
      if (!allowExisting)
        throw new org.apache.spark.sql.catalyst.analysis.ViewAlreadyExistsException(ident)
    }
    Nil
  }

  override def output: Seq[Attribute] = Nil
}

/** `ALTER VIEW ... AS query` — replace the definition, keep the
  * properties (the SQL-standard redefinition verb). The new query is
  * analyzed in the CURRENT session context, which also becomes the
  * view's new stored context.
  */
case class GraftAlterViewAsCommand(catalogName: String, ident: Identifier,
                                   originalText: String, query: LogicalPlan)
    extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)

  override def run(spark: SparkSession): Seq[Row] = {
    val catalog = spark.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[GraftSparkCatalog]
    val ns = ident.namespace()(0)
    GraftViewSql.requireNotMaterialized(catalog, ident, "ALTER VIEW ... AS")
    val existing = catalog.views.load(ns, ident.name()).getOrElse(
      throw new NoSuchViewException(ident))
    val tempRefs = query.collectWithSubqueries {
      case r: UnresolvedRelation
          if spark.sessionState.catalog.isTempView(r.multipartIdentifier) =>
        r.multipartIdentifier.mkString(".")
    }
    require(tempRefs.isEmpty,
      s"cannot redefine persistent view $ident over temporary view(s): " +
        tempRefs.mkString(", "))
    val analyzed = spark.sessionState.executePlan(query).analyzed
    val cm = spark.sessionState.catalogManager
    val updated = existing.copy(
      sql = originalText,
      currentCatalog = cm.currentCatalog.name(),
      currentNamespace = cm.currentNamespace.toSeq,
      schema = StructType(analyzed.output.map(a =>
        org.apache.spark.sql.types.StructField(a.name, a.dataType, a.nullable))),
      queryColumnNames = analyzed.output.map(_.name),
      columnAliases = Nil,
      columnComments = Nil)
    catalog.views.create(ns, ident.name(), updated, replace = true)
    Nil
  }
  override def output: Seq[Attribute] = Nil
}

/** `ALTER VIEW ... SET/UNSET TBLPROPERTIES`. */
case class GraftViewPropertiesCommand(catalogName: String, ident: Identifier,
                                      set: Map[String, String] = Map.empty,
                                      unset: Seq[String] = Nil,
                                      unsetIfExists: Boolean = true)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val catalog = spark.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[GraftSparkCatalog]
    val ns = ident.namespace()(0)
    GraftViewSql.requireNotMaterialized(catalog, ident,
      "ALTER VIEW ... SET/UNSET TBLPROPERTIES")
    GraftViewSql.requireNoReservedProps(set.keys ++ unset,
      "ALTER VIEW ... SET/UNSET TBLPROPERTIES")
    val existing = catalog.views.load(ns, ident.name()).getOrElse(
      throw new NoSuchViewException(ident))
    if (!unsetIfExists) {
      val missing = unset.filterNot(existing.properties.contains)
      require(missing.isEmpty,
        s"view $ident has no propert${if (missing.size == 1) "y" else "ies"}: " +
          missing.mkString(", "))
    }
    val updated = existing.copy(properties = existing.properties ++ set -- unset)
    catalog.views.create(ns, ident.name(), updated, replace = true)
    Nil
  }
  override def output: Seq[Attribute] = Nil
}

/** `ALTER VIEW ... RENAME TO ...` — within the same catalog; a bare new
  * name stays in the source namespace.
  */
case class GraftRenameViewCommand(catalogName: String, ident: Identifier,
                                  newName: Seq[String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val catalog = spark.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[GraftSparkCatalog]
    GraftViewSql.requireNotMaterialized(catalog, ident, "ALTER VIEW ... RENAME")
    val (toNs, toName) = newName match {
      case Seq(n) => (ident.namespace()(0), n)
      case Seq(ns, n) => (ns, n)
      case Seq(cat, ns, n) =>
        require(cat.equalsIgnoreCase(catalogName),
          s"cannot rename view across catalogs: $catalogName -> $cat")
        (ns, n)
      case other => throw new IllegalArgumentException(
        s"bad view name: ${other.mkString(".")}")
    }
    catalog.renameView(ident, Identifier.of(Array(toNs), toName))
    Nil
  }
  override def output: Seq[Attribute] = Nil
}

/** `DESCRIBE [EXTENDED] <view>` — the stored schema (with column
  * comments), plus the view text/context/properties under EXTENDED.
  */
case class GraftDescribeViewCommand(catalogName: String, ident: Identifier,
                                    isExtended: Boolean,
                                    override val output: Seq[Attribute])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val catalog = spark.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[GraftSparkCatalog]
    val sv = catalog.views.load(ident.namespace()(0), ident.name()).getOrElse(
      throw new NoSuchViewException(ident))
    val comments: Map[String, String] =
      sv.columnAliases.zip(sv.columnComments).collect {
        case (n, Some(c)) => n.toLowerCase -> c
      }.toMap
    val cols = sv.schema.fields.toIndexedSeq.map(f =>
      Row(f.name, f.dataType.simpleString, comments.get(f.name.toLowerCase).orNull))
    if (!isExtended) cols
    else cols ++ Seq(
      Row("", "", ""),
      Row("# View Information", "", ""),
      Row("Catalog", catalogName, ""),
      Row("Namespace", sv.currentNamespace.mkString("."), ""),
      Row("View Text", sv.sql, ""),
      Row("Schema Mode", sv.schemaMode.stripPrefix("Schema"), ""),
      Row("Properties", sv.properties.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k=$v" }.mkString(", "), ""))
  }
}

/** `SHOW CREATE TABLE <view>` — reproduce the view's DDL. */
case class GraftShowCreateViewCommand(catalogName: String, ident: Identifier,
                                      override val output: Seq[Attribute])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val catalog = spark.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[GraftSparkCatalog]
    val sv = catalog.views.load(ident.namespace()(0), ident.name()).getOrElse(
      throw new NoSuchViewException(ident))
    val cols =
      if (sv.columnAliases.isEmpty) ""
      else sv.columnAliases.zip(
        sv.columnComments.padTo(sv.columnAliases.size, None)).map {
          case (n, Some(c)) => s"`$n` COMMENT '${c.replace("'", "''")}'"
          case (n, None) => s"`$n`"
        }.mkString(" (", ", ", ")")
    val props = sv.properties -- Seq("comment")
    val tbl =
      if (props.isEmpty) ""
      else props.toSeq.sortBy(_._1).map { case (k, v) =>
        s"'${k.replace("'", "''")}' = '${v.replace("'", "''")}'"
      }.mkString("\nTBLPROPERTIES (", ", ", ")")
    val comment = sv.properties.get("comment")
      .map(c => s"\nCOMMENT '${c.replace("'", "''")}'").getOrElse("")
    Seq(Row(
      s"CREATE VIEW $catalogName.${ident.namespace().mkString(".")}.${ident.name()}" +
        s"$cols$comment$tbl AS\n${sv.sql}"))
  }
}

case class GraftDropViewCommand(catalogName: String, ident: Identifier,
                                ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val catalog = spark.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[GraftSparkCatalog]
    GraftViewSql.requireNotMaterialized(catalog, ident, "DROP VIEW")
    val dropped = catalog.views.drop(ident.namespace()(0), ident.name())
    if (!dropped && !ifExists) throw new NoSuchViewException(ident)
    Nil
  }
  override def output: Seq[Attribute] = Nil
}

/** `SHOW VIEWS [IN catalog.ns] [LIKE pattern]` — carries the parser's
  * own output attributes so the result schema matches the statement's
  * contract (namespace, viewName, isTemporary).
  */
case class GraftShowViewsCommand(catalogName: String, namespace: String,
                                 pattern: Option[String],
                                 override val output: Seq[Attribute])
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val catalog = spark.sessionState.catalogManager.catalog(catalogName)
      .asInstanceOf[GraftSparkCatalog]
    val names = catalog.views.list(namespace)
    val filtered = pattern.fold(names)(p =>
      org.apache.spark.sql.catalyst.util.StringUtils.filterPattern(names, p))
    filtered.map(n => Row(namespace, n, false))
  }
}
