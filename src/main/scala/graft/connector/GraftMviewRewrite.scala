package graft.connector

import graft.table.GraftCatalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeMap, AttributeSet, Cast, Coalesce, Divide, Expression, KnownNotNull, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, Average, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, GlobalLimit, LocalLimit, LogicalPlan, Offset, Project, Sample, Sort, Tail}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Transparent MV-based query rewrite (opt-in:
  * `SET graft.mview.rewrite = true`).
  *
  * A user's ad-hoc query that matches a registered materialized view's
  * defining shape re-scans the base tables even though the MV already
  * materializes that answer. This rule matches analyzed plan SUBTREES
  * against every registered MV's analyzed definition and substitutes
  * the MV's public view read when the MV is FRESH — every pinned source
  * version (fact, dims, union legs) equals that source's current
  * version, so the stored rows provably equal the defining query run
  * now. Stale MVs are never substituted; the query falls through to the
  * base tables.
  *
  * Two matching tiers:
  *  1. EXACT shape — canonicalized-plan comparison (`sameResult`;
  *     alias names and expression IDs normalize away, table leaves
  *     compare structurally by directory via [[GraftV2Table.equals]]).
  *  2. ROLLUP containment (round 19) — a COARSER aggregate over the
  *     MV's defining aggregate: grouping expressions computable from
  *     the stored group keys (a subset, or functions of them), an
  *     optional residual predicate over group keys (pushed onto the
  *     storage scan), and re-aggregable aggregates — SUM→SUM(sum),
  *     COUNT→SUM(count), MIN→MIN, MAX→MAX, AVG→SUM(sum)/SUM(count).
  *     DISTINCT / FILTERed aggregates refuse (COUNT(DISTINCT) over
  *     per-group values is not re-aggregable), so those queries fall
  *     through to the base tables.
  *
  * Order sensitivity (round-19 fix): a definition's outermost ORDER BY
  * is STRIPPED before matching — sorting never changes the stored
  * multiset, and subtree matching then puts the user's own Sort back on
  * top of the substituted read. A definition with any REMAINING
  * Sort/Limit/Offset/Sample below the root is refused as a candidate
  * outright: substituting an unordered storage scan there could
  * silently drop an ordering or cardinality guarantee.
  *
  * Scale: candidate enumeration is metadata-only (one view-store
  * listing per namespace + one snapshot-properties read per MV, plus
  * one current-version probe per source for freshness) — no job runs —
  * and is skipped entirely for plans that touch no graft table.
  * Analyzed definitions are cached per (warehouse, ns, name, sql);
  * matching itself is driver-side plan comparison. The payoff at
  * 100 TB is the whole point: a matched dashboard query reads O(groups)
  * storage rows instead of re-scanning the fact table — and with
  * rollup containment one MV at (region, day) grain answers the whole
  * family of coarser dashboards over it.
  *
  * Reference tie: the reference reads back via full scans
  * (`examples/advanced_scenarios.py:193`); every serious MV system
  * (Calcite, BigQuery, Snowflake) matches and rewrites, and rollup
  * containment is the textbook "aggregate rollup" case of
  * materialized-view matching.
  */
case class GraftMviewRewrite(spark: SparkSession) extends Rule[LogicalPlan] {
  import GraftMaterializedView.rewriteDisabled
  import GraftMviewRewrite._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (rewriteDisabled.get()) return plan
    if (!spark.sessionState.conf
          .getConfString("graft.mview.rewrite", "false")
          .equalsIgnoreCase("true")) return plan
    if (!plan.resolved || plan.isStreaming) return plan
    // cheap bail-out (ADVICE r18): candidate enumeration sweeps
    // warehouse metadata — but MV definitions read graft tables only,
    // so a plan with no graft leaf can never match one
    if (!plan.exists {
          case r: DataSourceV2Relation => r.table.isInstanceOf[GraftV2Table]
          case _ => false
        }) return plan
    val cands = candidates(spark)
    if (cands.isEmpty) return plan
    plan.transformUp {
      case p if p.resolved && !p.isInstanceOf[DataSourceV2Relation] &&
          p.output.nonEmpty =>
        cands.view.flatMap(c => rewriteWith(spark, p, c).toOption)
          .headOption.getOrElse(p)
    }
  }
}

object GraftMviewRewrite {
  import GraftMaterializedView._

  private[connector] case class Cand(catName: String, ns: String, name: String,
                                     defPlan: LogicalPlan)
  private val defCache =
    new java.util.concurrent.ConcurrentHashMap[
      (String, String, String, String), Option[LogicalPlan]]()

  /** Every graft catalog registered in this session, as
    * (catalogName, warehouse) pairs.
    */
  private[connector] def graftCatalogs(spark: SparkSession): Seq[(String, String)] =
    spark.conf.getAll.toSeq.collect {
      case (k, v) if k.startsWith("spark.sql.catalog.") &&
          !k.stripPrefix("spark.sql.catalog.").contains(".") &&
          v == classOf[GraftSparkCatalog].getName =>
        k.stripPrefix("spark.sql.catalog.")
    }.flatMap { catName =>
      spark.conf.getOption(s"spark.sql.catalog.$catName.warehouse")
        .map(wh => (catName, wh))
    }

  /** Fresh, analyzable, order-insensitive MVs across every graft
    * catalog in this session.
    */
  private def candidates(spark: SparkSession): Seq[Cand] =
    graftCatalogs(spark).flatMap { case (catName, wh) =>
      val cat = GraftCatalog(spark, wh)
      registeredMviews(cat)
        .filter { case (_, _, props) => isFresh(cat, props) }
        .flatMap { case (ns, name, props) =>
          props.get(SqlProp).flatMap(sql =>
            analyzedDef(spark, wh, ns, name, sql)
              .flatMap(dp => prepare(dp).toOption)
              .map(dp => Cand(catName, ns, name, dp)))
        }
    }

  /** The analyzed defining plan, cached — analysis runs with the
    * rewrite disabled so the cache can never hold an
    * already-substituted definition. An unanalyzable definition (base
    * schema evolved under it) caches as None and never matches.
    */
  private def analyzedDef(spark: SparkSession, wh: String, ns: String,
                          name: String, sql: String): Option[LogicalPlan] = {
    val key = (wh, ns, name, sql)
    val hit = defCache.get(key)
    if (hit != null) hit
    else {
      val computed: Option[LogicalPlan] = withRewriteDisabled {
        scala.util.Try {
          val parsed = spark.sessionState.sqlParser.parseQuery(sql)
          spark.sessionState.executePlan(parsed).analyzed
        }.toOption
      }
      if (defCache.size > 256) defCache.clear()
      defCache.putIfAbsent(key, computed)
      computed
    }
  }

  /** Order/limit screening (round-19 fix for the Sort-dropping bug): a
    * root ORDER BY is stripped — it never changes the stored multiset,
    * and subtree matching keeps the user's own Sort on top of the
    * substituted read. Anything order- or cardinality-sensitive
    * REMAINING (Sort below the root, any Limit/Offset/Tail/Sample, a
    * nondeterministic expression) refuses the candidate: replacing it
    * with an unordered storage scan would silently drop the guarantee.
    */
  private[connector] def prepare(defPlan: LogicalPlan): Either[String, LogicalPlan] = {
    val stripped = defPlan match {
      case s: Sort => s.child
      case p => p
    }
    if (stripped.exists {
          case _: Sort | _: GlobalLimit | _: LocalLimit | _: Offset |
              _: Tail | _: Sample => true
          case _ => false
        })
      Left("definition is order- or limit-sensitive below the root " +
        "(Sort/Limit/Offset/Sample) — substituting an unordered storage " +
        "scan would drop that guarantee")
    else if (stripped.exists(_.expressions.exists(e =>
        e.resolved && !e.deterministic)))
      Left("definition contains a nondeterministic expression")
    else Right(stripped)
  }

  /** Exact shape first (cheapest, covers every mode incl. window),
    * rollup containment second. Left = why this candidate refused.
    */
  private[connector] def rewriteWith(spark: SparkSession, p: LogicalPlan,
                                     c: Cand): Either[String, LogicalPlan] =
    if (matchesExact(p, c.defPlan)) substitute(spark, p, c)
    else rollup(spark, p, c)

  /** Exact-shape match: cheap screens (node class, output arity and
    * types) before the canonicalized comparison.
    */
  private def matchesExact(p: LogicalPlan, defPlan: LogicalPlan): Boolean =
    p.getClass == defPlan.getClass &&
      p.output.length == defPlan.output.length &&
      p.output.map(_.dataType) == defPlan.output.map(_.dataType) &&
      p.sameResult(defPlan)

  /** Replace the matched subtree with the MV's public view read,
    * aliased back onto the subtree's output names and expression IDs
    * so every parent reference stays resolved. sameResult guarantees
    * positional correspondence; a type drift between the view schema
    * and the subtree refuses the substitution.
    */
  private def substitute(spark: SparkSession, p: LogicalPlan,
                         c: Cand): Either[String, LogicalPlan] =
    viewRead(spark, c).flatMap { r =>
      if (r.output.length != p.output.length ||
          r.output.map(_.dataType) != p.output.map(_.dataType))
        Left("type drift: the view schema no longer matches the " +
          "definition's output")
      else Right {
        val aliases = p.output.zip(r.output).map { case (qa, ra) =>
          // the stored column can be declared nullable where the query
          // output is not (parquet storage) — values are provably
          // equal, so the nullability fact is safe to re-assert
          val base = if (!qa.nullable && ra.nullable) KnownNotNull(ra) else ra
          Alias(base, qa.name)(exprId = qa.exprId)
        }
        Project(aliases, r)
      }
    }

  /** The MV's public view read, analyzed with the rewrite disabled. */
  private def viewRead(spark: SparkSession, c: Cand): Either[String, LogicalPlan] =
    withRewriteDisabled {
      scala.util.Try {
        val parsed = spark.sessionState.sqlParser.parsePlan(
          s"SELECT * FROM `${c.catName}`.`${c.ns}`.`${c.name}`")
        spark.sessionState.executePlan(parsed).analyzed
      }.toEither.left.map(e =>
        s"view read unanalyzable: ${String.valueOf(e.getMessage)}")
    }

  // ---- rollup containment (round 19) --------------------------------

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  private def stripAlias(ne: NamedExpression): Expression = ne match {
    case Alias(c, _) => c
    case e => e
  }

  private def containsAgg(e: Expression): Boolean =
    e.exists(_.isInstanceOf[AggregateExpression])

  /** How the user's pre-aggregation body relates to the definition's:
    * `rebase` maps the user's attribute space onto the definition's
    * (sameResult guarantees positional output correspondence), and
    * `residual` is the extra predicate the user applies beyond the
    * definition's own WHERE (already rebased). Left = bodies differ.
    */
  private case class BodyMatch(rebase: Expression => Expression,
                               residual: Option[Expression])

  private def rebaser(from: LogicalPlan, to: LogicalPlan): Expression => Expression = {
    val m = AttributeMap(from.output.zip(to.output))
    e => e.transform { case a: Attribute => m.getOrElse(a, a) }
  }

  private def bodyMatch(uc: LogicalPlan, dc: LogicalPlan): Either[String, BodyMatch] =
    if (uc.sameResult(dc)) Right(BodyMatch(rebaser(uc, dc), None))
    else uc match {
      case Filter(cond, inner) if inner.sameResult(dc) =>
        val rb = rebaser(inner, dc)
        Right(BodyMatch(rb, Some(rb(cond))))
      case Filter(cond, inner) => dc match {
        case Filter(dcond, dinner) if inner.sameResult(dinner) =>
          val rb = rebaser(inner, dinner)
          val ucs = conjuncts(cond).map(rb)
          val dcs = conjuncts(dcond)
          val defUnmatched = dcs.filterNot(d => ucs.exists(_.semanticEquals(d)))
          if (defUnmatched.nonEmpty)
            Left("query body lacks the definition's predicate(s): " +
              defUnmatched.map(_.sql).mkString(" AND "))
          else Right(BodyMatch(rb,
            ucs.filterNot(u => dcs.exists(_.semanticEquals(u)))
              .reduceOption(And)))
        case _ => Left("query body does not match the definition's body")
      }
      case _ => Left("query body does not match the definition's body")
    }

  /** Rollup containment: a user aggregate COARSER than the MV's
    * defining aggregate answers from storage when (a) its body is the
    * definition's body modulo a residual predicate over group keys,
    * (b) every grouping expression is computable from stored group
    * keys, and (c) every aggregate re-aggregates. The rewritten plan is
    * a RE-AGGREGATION over the storage read — O(groups), not O(fact).
    */
  private def rollup(spark: SparkSession, p: LogicalPlan,
                     c: Cand): Either[String, LogicalPlan] = (p, c.defPlan) match {
    case (ua: Aggregate, da: Aggregate) =>
      for {
        bm <- bodyMatch(ua.child, da.child)
        read <- viewRead(spark, c)
        _ <- checkViewMirrorsDef(read, da)
        plan <- buildRollup(spark, ua, da, bm, read)
      } yield plan
    case (_: Aggregate, _) =>
      Left("definition is not a plain aggregate — rollup containment " +
        "applies only to aggregate-shaped definitions")
    case _ => Left("subtree is not an aggregate")
  }

  /** The view must mirror the definition's output positionally — name
    * and type per column — for stored col j to stand in for def output
    * j. (HAVING / grouping-sets views compute or filter at read time;
    * their definitions are not Aggregate-rooted, so they never reach
    * here, but the guard keeps any drift loud.)
    */
  private def checkViewMirrorsDef(read: LogicalPlan,
                                  da: Aggregate): Either[String, Unit] =
    if (read.output.length != da.output.length ||
        !read.output.zip(da.output).forall { case (r, d) =>
          r.dataType == d.dataType && r.name.equalsIgnoreCase(d.name) })
      Left("type drift: the view schema no longer mirrors the " +
        "definition's aggregate output")
    else Right(())

  private def buildRollup(spark: SparkSession, ua: Aggregate, da: Aggregate,
                          bm: BodyMatch,
                          read: LogicalPlan): Either[String, LogicalPlan] = {
    val tz = Option(spark.sessionState.conf.sessionLocalTimeZone)
    val baseRefs = AttributeSet(da.child.output)
    // stored group keys: def output positions free of aggregates hold
    // per-group-constant expressions (necessarily composed of grouping
    // expressions) — each maps to its storage column
    val defKeys: Seq[(Expression, Attribute)] =
      da.aggregateExpressions.zip(read.output).collect {
        case (ne, v) if !containsAgg(ne) => (stripAlias(ne), v)
      }
    val defAggs: Seq[(AggregateFunction, Attribute)] =
      da.aggregateExpressions.zip(read.output).flatMap { case (ne, v) =>
        stripAlias(ne) match {
          case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
            Some((ae.aggregateFunction, v))
          case _ => None
        }
      }
    val global = ua.groupingExpressions.isEmpty

    def findStored(pf: PartialFunction[AggregateFunction, Boolean],
                   what: String): Either[String, Attribute] =
      defAggs.collectFirst {
        case (f, v) if pf.isDefinedAt(f) && pf(f) => v
      }.toRight(s"the MV stores no re-aggregable $what")

    def sumOf(v: Attribute, outType: DataType): Expression = {
      val s = Sum(v).toAggregateExpression()
      if (s.dataType == outType) s else Cast(s, outType, tz)
    }

    /** SUM→SUM(sum), COUNT→SUM(count) (coalesced to 0 for a global
      * rollup over an empty MV, where a direct COUNT returns 0 but a
      * SUM over no rows returns NULL), MIN→MIN, MAX→MAX,
      * AVG→SUM(sum)/SUM(count). DISTINCT / FILTER refuse.
      */
    def reAgg(ae: AggregateExpression): Either[String, Expression] =
      if (ae.isDistinct)
        Left("DISTINCT aggregates do not re-aggregate from per-group " +
          "stored values")
      else if (ae.filter.isDefined)
        Left("FILTERed aggregates do not re-aggregate from per-group " +
          "stored values")
      else ae.aggregateFunction match {
        case Sum(x, _) =>
          findStored({ case Sum(x2, _) => x2.semanticEquals(x) },
            s"SUM(${x.sql})").map(v => sumOf(v, ae.dataType))
        case Count(xs) =>
          findStored({ case Count(ys) => ys.length == xs.length &&
              ys.zip(xs).forall(t => t._1.semanticEquals(t._2)) },
            s"COUNT(${xs.map(_.sql).mkString(", ")})").map { v =>
            val s = Sum(v).toAggregateExpression()
            val z = if (global) Coalesce(Seq(s, Literal(0L))) else s
            KnownNotNull(if (z.dataType == LongType) z else Cast(z, LongType, tz))
          }
        case Min(x) =>
          findStored({ case Min(x2) => x2.semanticEquals(x) },
            s"MIN(${x.sql})").map(v => Min(v).toAggregateExpression())
        case Max(x) =>
          findStored({ case Max(x2) => x2.semanticEquals(x) },
            s"MAX(${x.sql})").map(v => Max(v).toAggregateExpression())
        case Average(x, _) if ae.dataType == DoubleType =>
          for {
            sv <- findStored({ case Sum(x2, _) => x2.semanticEquals(x) },
              s"SUM(${x.sql}) (for AVG decomposition)")
            cv <- findStored({ case Count(Seq(y)) => y.semanticEquals(x) },
              s"COUNT(${x.sql}) (for AVG decomposition)")
              .orElse {
                // COUNT(*) counts the same rows as COUNT(x) only when
                // x can never be NULL
                if (!x.nullable)
                  findStored({ case Count(Seq(l: Literal)) => l.value == 1 },
                    "COUNT(*) (for AVG decomposition)")
                else Left(s"the MV stores no COUNT(${x.sql}) and " +
                  s"${x.sql} is nullable, so AVG cannot decompose")
              }
          } yield Divide(
            Cast(Sum(sv).toAggregateExpression(), DoubleType, tz),
            Cast(Sum(cv).toAggregateExpression(), DoubleType, tz))
        case other =>
          Left(s"${other.prettyName} does not re-aggregate from " +
            "per-group stored values")
      }

    /** Rewrite an expression (already rebased into the definition's
      * attribute space) onto the storage columns: group-key
      * subexpressions map to their stored column, aggregates re-
      * aggregate. Fails if any base-table reference survives.
      */
    def mapExpr(e: Expression, allowAggs: Boolean): Either[String, Expression] = {
      var err: Option[String] = None
      val out = e.transformDown {
        case sub if err.isEmpty && !sub.foldable && !containsAgg(sub) &&
            defKeys.exists(_._1.semanticEquals(sub)) =>
          defKeys.collectFirst { case (k, v) if k.semanticEquals(sub) => v }.get
        case ae: AggregateExpression
            if err.isEmpty && ae.references.subsetOf(baseRefs) =>
          if (!allowAggs) {
            err = Some("aggregate in a grouping or predicate position")
            ae
          } else reAgg(ae) match {
            case Right(r) => r
            case Left(m) => err = Some(m); ae
          }
      }
      err.toLeft(out).filterOrElse(
        _.references.intersect(baseRefs).isEmpty,
        s"`${e.sql}` is not computable from the MV's stored group keys")
    }

    def sequence[T](es: Seq[Either[String, T]]): Either[String, Seq[T]] =
      es.foldRight(Right(Nil): Either[String, List[T]]) {
        case (e, acc) => for (x <- e; xs <- acc) yield x :: xs
      }

    for {
      groups <- sequence(ua.groupingExpressions.map(g =>
        mapExpr(bm.rebase(g), allowAggs = false)))
      items <- sequence(ua.aggregateExpressions.map { ne =>
        mapExpr(bm.rebase(stripAlias(ne)), allowAggs = true).flatMap { e2 =>
          if (e2.dataType != ne.dataType)
            Left(s"rewritten ${ne.name} has type ${e2.dataType}, " +
              s"query expects ${ne.dataType}")
          else Right {
            val guarded =
              if (!ne.toAttribute.nullable && e2.nullable) KnownNotNull(e2)
              else e2
            Alias(guarded, ne.name)(exprId = ne.exprId)
          }
        }
      })
      residual <- bm.residual match {
        case None => Right(None)
        case Some(r) => mapExpr(r, allowAggs = false).map(Some(_))
      }
    } yield Aggregate(groups, items,
      residual.fold(read)(Filter(_, read)), None)
  }

  // ---- observability: CALL graft.system.explain_rewrite -------------

  /** Per-registered-MV diagnosis of why a query would (not) rewrite:
    * (mview, verdict, detail). Verdicts: `substituted`, `stale`,
    * `shape_mismatch`, `type_drift`, `unsupported_definition`,
    * `definition_unanalyzable`. Freshness is probed NOW, like the
    * rule's own probe — the answer describes this moment.
    */
  def explainRewrite(spark: SparkSession, sql: String): Seq[(String, String, String)] = {
    val planE = withRewriteDisabled {
      scala.util.Try {
        val parsed = spark.sessionState.sqlParser.parseQuery(sql)
        spark.sessionState.executePlan(parsed).analyzed
      }.toEither.left.map(e => String.valueOf(e.getMessage))
    }
    planE match {
      case Left(err) => Seq(("-", "query_unanalyzable", err))
      case Right(plan) =>
        graftCatalogs(spark).flatMap { case (catName, wh) =>
          val cat = GraftCatalog(spark, wh)
          registeredMviews(cat).map { case (ns, name, props) =>
            val mv = s"$catName.$ns.$name"
            val verdict = props.get(SqlProp) match {
              case None =>
                ("definition_unanalyzable", "storage carries no definition SQL")
              case Some(defSql) =>
                analyzedDef(spark, wh, ns, name, defSql) match {
                  case None =>
                    ("definition_unanalyzable",
                      "the stored definition no longer analyzes " +
                        "(base schema drift?)")
                  case Some(dp) => prepare(dp) match {
                    case Left(reason) => ("unsupported_definition", reason)
                    case Right(prepped) =>
                      diagnoseMatch(spark, plan,
                        Cand(catName, ns, name, prepped)) match {
                        case Right(_) => staleDetail(cat, props) match {
                          case None =>
                            ("substituted",
                              s"fresh — the query reads $ns.$name$StorageSuffix " +
                                "instead of the base tables")
                          case Some(d) => ("stale", d)
                        }
                        case Left(reason) =>
                          val v = if (reason.startsWith("type drift"))
                            "type_drift" else "shape_mismatch"
                          (v, reason)
                      }
                  }
                }
            }
            (mv, verdict._1, verdict._2)
          }
        }
    }
  }

  /** Try every subtree; Right on the first hit, else the most SPECIFIC
    * refusal seen — a near-miss ("the MV stores no re-aggregable X")
    * beats the generic "no subtree matches".
    */
  private def diagnoseMatch(spark: SparkSession, plan: LogicalPlan,
                            c: Cand): Either[String, LogicalPlan] = {
    val generic = Set(
      "subtree is not an aggregate",
      "query body does not match the definition's body",
      "definition is not a plain aggregate — rollup containment " +
        "applies only to aggregate-shaped definitions")
    var hit: Option[LogicalPlan] = None
    var specific: Option[String] = None
    plan.foreach { sub =>
      if (hit.isEmpty && sub.resolved &&
          !sub.isInstanceOf[DataSourceV2Relation] && sub.output.nonEmpty) {
        rewriteWith(spark, sub, c) match {
          case Right(r) => hit = Some(r)
          case Left(reason) =>
            if (specific.isEmpty && !generic.contains(reason))
              specific = Some(reason)
        }
      }
    }
    hit.toRight(specific.getOrElse(
      "no subtree of the query matches the definition's shape"))
  }
}
