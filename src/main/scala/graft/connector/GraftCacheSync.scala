package graft.connector

import org.apache.spark.sql.SparkSession

/** Spark-side cache invalidation for graft-internal write paths
  * (ADVICE r18, medium).
  *
  * [[GraftV2Table]] equality is deliberately version-blind (tableDir +
  * time-travel pin) so canonicalized-plan matching works across
  * analyses — exchange/subquery reuse and the MV rewrite depend on it.
  * The flip side: Spark's `CacheManager` also matches cached
  * `InMemoryRelation`s by canonicalized `sameResult`, so after a write
  * that bypasses Spark's DSv2 write-path cache refresh (`CALL
  * refresh_mview` / compaction / expire / loader commits — all of which
  * commit through [[graft.meta.MetadataLog]] directly) a cached query
  * would silently keep serving the PRE-commit snapshot.
  *
  * [[graft.table.GraftTable]] registers [[recacheByDir]] as the
  * metadata log's post-commit listener: after every successful commit,
  * any cached plan over this table is re-cached through the public
  * `spark.catalog.refreshTable` API (name resolution via the session's
  * registered graft catalogs). Fast path: when nothing is cached in the
  * session the call is a single `isEmpty` check. Caches held by OTHER
  * sessions/processes are out of reach — same contract as every
  * snapshot-based table format.
  */
object GraftCacheSync {

  private def normalize(p: String): String =
    p.stripPrefix("file:").stripSuffix("/")

  def recacheByDir(spark: SparkSession, tableDir: String): Unit = {
    val ss = try spark.sharedState catch { case _: Throwable => return }
    if (ss.cacheManager.isEmpty) return
    val dir = normalize(tableDir)
    GraftMviewRewrite.graftCatalogs(spark).foreach { case (catName, wh) =>
      val whN = normalize(wh)
      if (dir.startsWith(whN + "/")) {
        dir.stripPrefix(whN + "/").split("/") match {
          case Array(ns, name) =>
            // unresolvable name (dropped table, plain dir) = nothing
            // cached under it — nothing to refresh
            scala.util.Try(
              spark.catalog.refreshTable(s"`$catName`.`$ns`.`$name`"))
            ()
          case _ => ()
        }
      }
    }
  }
}
