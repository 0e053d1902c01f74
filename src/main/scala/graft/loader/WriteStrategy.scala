package graft.loader

import graft.config.{LoaderConfig, WriteMode}
import graft.meta.Snapshot
import graft.table.GraftTable

import org.apache.spark.sql.DataFrame

/** The four table-mutation strategies (W1–W4) and their factory (W5),
  * mirroring `src/iceberg_loader/core/strategies.py:28-99`.
  *
  * Each `write` call is one flush ⇒ one snapshot. `isFirstWrite` is the
  * stream-position flag the loader threads through
  * (`core/loader.py:171-175,203-208`): overwrite/idempotent behave
  * specially only on the FIRST flush of a stream and append afterwards,
  * so a multi-commit stream doesn't clobber its own earlier flushes.
  */
sealed trait WriteStrategy {
  def name: String
  def write(table: GraftTable, df: DataFrame, cfg: LoaderConfig, isFirstWrite: Boolean): Snapshot
}

object WriteStrategy {

  case object Append extends WriteStrategy {
    val name = "append"
    def write(t: GraftTable, df: DataFrame, cfg: LoaderConfig, first: Boolean): Snapshot =
      t.append(df, cfg.tableProperties)
  }

  /** First flush overwrites, later flushes append (W2,
    * `core/strategies.py:36-48`).
    */
  case object Overwrite extends WriteStrategy {
    val name = "overwrite"
    def write(t: GraftTable, df: DataFrame, cfg: LoaderConfig, first: Boolean): Snapshot =
      if (first) t.overwrite(df, cfg.tableProperties)
      else t.append(df, cfg.tableProperties)
  }

  /** First flush deletes `replace_filter` rows then appends; later
    * flushes append only (W3, `core/strategies.py:51-66`).
    */
  case object Idempotent extends WriteStrategy {
    val name = "idempotent"
    def write(t: GraftTable, df: DataFrame, cfg: LoaderConfig, first: Boolean): Snapshot = {
      if (first) {
        for (f <- cfg.replaceFilterSql if t.current().isDefined) t.deleteWhere(f)
      }
      t.append(df, cfg.tableProperties)
    }
  }

  /** Key-equi-join merge (W4, `core/strategies.py:69-81`). Default join
    * columns fall back per the reference: config `join_cols` or error.
    */
  case object Upsert extends WriteStrategy {
    val name = "upsert"
    def write(t: GraftTable, df: DataFrame, cfg: LoaderConfig, first: Boolean): Snapshot = {
      val keys = cfg.cleanedJoinCols.getOrElse(
        throw new IllegalArgumentException("write_mode='upsert' requires join_cols"))
      if (t.current().isEmpty) t.append(df, cfg.tableProperties)
      else t.upsert(df, keys, cfg.tableProperties)
    }
  }

  /** Factory precedence (W5, `core/strategies.py:84-99`): upsert mode →
    * Upsert; else a set replace_filter → Idempotent (NOTE: overrides
    * overwrite mode); else overwrite → Overwrite; else Append.
    */
  def forConfig(cfg: LoaderConfig): WriteStrategy =
    if (cfg.writeMode == WriteMode.Upsert) Upsert
    else if (cfg.replaceFilter.isDefined) Idempotent
    else if (cfg.writeMode == WriteMode.Overwrite) Overwrite
    else Append
}
