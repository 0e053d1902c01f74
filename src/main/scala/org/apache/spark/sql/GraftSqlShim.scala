package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal `private[sql]` access shim — the established extension
  * technique (Iceberg and Delta ship the same kind of shim) for the one
  * internal hop a command rewrite needs: turning an analyzed
  * `LogicalPlan` back into a `DataFrame` to reuse the public write
  * path. Nothing else from the internal surface is touched.
  */
object GraftSqlShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** Session-configured Hadoop conf (includes the session's
    * `spark.hadoop.*` and SQL-conf propagation) — what Spark's own
    * file-source scan builders receive; needed to construct a native
    * `ParquetScan` outside the `sql` package.
    */
  def newHadoopConf(spark: SparkSession): org.apache.hadoop.conf.Configuration =
    spark.asInstanceOf[classic.SparkSession].sessionState.newHadoopConf()

  /** Column ↔ Expression bridges — lets the Column-combinator function
    * library double as a SQL function surface (builders registered via
    * `SparkSessionExtensions.injectFunction` receive `Expression`s).
    */
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    // eager conversion — ExpressionUtils.expression returns a lazy
    // ColumnNodeExpression the analyzer won't unwrap when the tree is
    // produced by a FunctionRegistry builder
    classic.ColumnNodeToExpressionConverter(c.node)

  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
}
