package graft.connector

import graft.table.GraftCatalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, KnownNotNull}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Transparent MV-based query rewrite (opt-in:
  * `SET graft.mview.rewrite = true`).
  *
  * A user's ad-hoc aggregate/window query that matches a registered
  * materialized view's defining shape re-scans the base tables even
  * though the MV already materializes exactly that answer. This rule
  * matches analyzed plan SUBTREES against every registered MV's
  * analyzed definition (exact-shape matching via canonicalized-plan
  * comparison, `sameResult` — alias names and expression IDs are
  * normalized away, table leaves compare structurally by directory via
  * [[GraftV2Table.equals]]) and substitutes the MV's public view read
  * when the MV is FRESH — every pinned source version (fact, dims,
  * union legs) equals that source's current version, so the stored
  * rows provably equal the defining query run now. Stale MVs are never
  * substituted; the query falls through to the base tables.
  *
  * Matching subtrees (not just whole plans) gives shape containment
  * for free at the node level: `SELECT ... FROM (<mv shape>) WHERE ...`
  * rewrites its inner subtree and keeps the outer operators.
  *
  * Scale: candidate enumeration is metadata-only (one view-store
  * listing per namespace + one snapshot-properties read per MV, plus
  * one current-version probe per source for freshness) — no job runs.
  * Analyzed definitions are cached per (warehouse, ns, name, sql);
  * matching itself is driver-side plan comparison. The payoff at
  * 100 TB is the whole point: a matched dashboard query reads O(groups)
  * storage rows instead of re-scanning the fact table.
  *
  * Reference tie: the reference reads back via full scans
  * (`examples/advanced_scenarios.py:193`); every serious MV system
  * (Calcite, BigQuery, Snowflake) matches and rewrites.
  */
case class GraftMviewRewrite(spark: SparkSession) extends Rule[LogicalPlan] {
  import GraftMaterializedView._
  import GraftMviewRewrite._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (rewriteDisabled.get()) return plan
    if (!spark.sessionState.conf
          .getConfString("graft.mview.rewrite", "false")
          .equalsIgnoreCase("true")) return plan
    if (!plan.resolved || plan.isStreaming) return plan
    val cands = candidates()
    if (cands.isEmpty) return plan
    plan.transformUp {
      case p if p.resolved && !p.isInstanceOf[DataSourceV2Relation] &&
          p.output.nonEmpty =>
        cands.find(c => matches(p, c.defPlan))
          .flatMap(substitute(p, _)).getOrElse(p)
    }
  }

  /** Fresh, analyzable MVs across every graft catalog in this session. */
  private def candidates(): Seq[Cand] = {
    val catalogs = spark.conf.getAll.toSeq.collect {
      case (k, v) if k.startsWith("spark.sql.catalog.") &&
          !k.stripPrefix("spark.sql.catalog.").contains(".") &&
          v == classOf[GraftSparkCatalog].getName =>
        k.stripPrefix("spark.sql.catalog.")
    }
    catalogs.flatMap { catName =>
      spark.conf.getOption(s"spark.sql.catalog.$catName.warehouse").toSeq
        .flatMap { wh =>
          val cat = GraftCatalog(spark, wh)
          registeredMviews(cat)
            .filter { case (_, _, props) => isFresh(cat, props) }
            .flatMap { case (ns, name, props) =>
              props.get(SqlProp).flatMap(sql =>
                analyzedDef(wh, ns, name, sql).map(dp =>
                  Cand(catName, ns, name, dp)))
            }
        }
    }
  }

  /** The analyzed defining plan, cached — analysis runs with the
    * rewrite disabled so the cache can never hold an
    * already-substituted definition. An unanalyzable definition (base
    * schema evolved under it) caches as None and never matches.
    */
  private def analyzedDef(wh: String, ns: String, name: String,
                          sql: String): Option[LogicalPlan] = {
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

  /** Exact-shape match: cheap screens (node class, output arity and
    * types) before the canonicalized comparison.
    */
  private def matches(p: LogicalPlan, defPlan: LogicalPlan): Boolean =
    p.getClass == defPlan.getClass &&
      p.output.length == defPlan.output.length &&
      p.output.map(_.dataType) == defPlan.output.map(_.dataType) &&
      p.sameResult(defPlan)

  /** Replace the matched subtree with the MV's public view read,
    * aliased back onto the subtree's output names and expression IDs
    * so every parent reference stays resolved. sameResult guarantees
    * positional correspondence; a type drift between the view schema
    * and the subtree refuses the substitution (None → keep the
    * original subtree).
    */
  private def substitute(p: LogicalPlan, c: Cand): Option[LogicalPlan] = {
    val read: Option[LogicalPlan] = withRewriteDisabled {
      scala.util.Try {
        val parsed = spark.sessionState.sqlParser.parsePlan(
          s"SELECT * FROM `${c.catName}`.`${c.ns}`.`${c.name}`")
        spark.sessionState.executePlan(parsed).analyzed
      }.toOption
    }
    read.filter { r =>
      r.output.length == p.output.length &&
        r.output.map(_.dataType) == p.output.map(_.dataType)
    }.map { r =>
      val aliases = p.output.zip(r.output).map { case (qa, ra) =>
        // the stored column can be declared nullable where the query
        // output is not (parquet storage) — values are provably equal,
        // so the nullability fact is safe to re-assert
        val base = if (!qa.nullable && ra.nullable) KnownNotNull(ra) else ra
        Alias(base, qa.name)(exprId = qa.exprId)
      }
      Project(aliases, r)
    }
  }
}

object GraftMviewRewrite {
  private case class Cand(catName: String, ns: String, name: String,
                          defPlan: LogicalPlan)
  private val defCache =
    new java.util.concurrent.ConcurrentHashMap[
      (String, String, String, String), Option[LogicalPlan]]()
}
