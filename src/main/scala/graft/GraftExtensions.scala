package graft

import graft.functions.IcebergBucketExpr

import org.apache.spark.sql.SparkSessionExtensions

/** Session extension installer — the public plug-in point for graft's
  * native Catalyst expressions. Activate with
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`); `iceberg_bucket(col, n)`
  * then resolves in SQL and `expr(...)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(IcebergBucketExpr.functionDescriptor)
    ext.injectFunction(graft.functions.BloomMightContainExpr.functionDescriptor)
    // the text-pipeline library as graft_* SQL functions
    graft.functions.SqlFunctions.all.foreach(ext.injectFunction)
    // MERGE INTO over graft DSv2 tables → the reference upsert semantics
    ext.injectPostHocResolutionRule(graft.connector.GraftMergeRule)
    // merge-on-read delete application for SQL reads (no-op while a
    // table carries no delete groups)
    ext.injectResolutionRule(graft.connector.GraftMorScanRule)
    // SQL views over graft catalogs: DDL intercepted at parse time
    // (Spark 4.1's engine rejects view DDL on non-session catalogs),
    // reads expanded during resolution
    ext.injectParser((session, delegate) =>
      new graft.connector.GraftSqlParser(session, delegate))
    ext.injectResolutionRule(graft.connector.GraftViewSubstitution)
    // opt-in transparent MV rewrite (SET graft.mview.rewrite = true):
    // ad-hoc queries matching a FRESH registered MV's shape read its
    // storage instead of re-scanning base tables
    ext.injectPostHocResolutionRule(graft.connector.GraftMviewRewrite)
  }
}
