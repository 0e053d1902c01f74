package graft.config

import graft.partitioning.{PartitionExpr, Transform}

import org.apache.spark.sql.catalyst.parser.CatalystSqlParser

/** Write mode (reference `core/config.py:24`; default is overwrite). */
sealed trait WriteMode { def name: String }
object WriteMode {
  case object Append    extends WriteMode { val name = "append" }
  case object Overwrite extends WriteMode { val name = "overwrite" }
  case object Upsert    extends WriteMode { val name = "upsert" }
  def parse(s: String): WriteMode = s.trim.toLowerCase match {
    case "append"    => Append
    case "overwrite" => Overwrite
    case "upsert"    => Upsert
    case other => throw new IllegalArgumentException(s"Unknown write_mode: $other")
  }
}

/** Immutable, eagerly-validated loader configuration.
  *
  * Mirrors the reference's frozen pydantic model
  * (`src/iceberg_loader/core/config.py:21-92`) including every
  * cross-field rule its tests pin down
  * (`tests/test_config_validation.py:9-41`):
  *   - `commitInterval >= 0` (0 behaves as 1 — one transaction per
  *     batch, the reference's `max(1, interval)` guard at
  *     `core/loader.py:214`);
  *   - `partitionCol` must parse under the transform grammar;
  *   - `loadTsCol` must be a valid identifier;
  *   - `joinCols`, if given, must contain non-blank names;
  *   - upsert mode forbids `replaceFilter`;
  *   - identity-partitioning on the load-timestamp column is rejected
  *     (every load would land in its own partition).
  *
  * `replaceFilter` is additionally parsed with Spark's SQL expression
  * parser so malformed predicates fail at config time, not mid-write.
  * Python-style `==` is accepted and normalized to SQL `=` for parity
  * with reference examples (`examples/advanced_scenarios.py:102`).
  */
final case class LoaderConfig(
    writeMode: WriteMode = WriteMode.Overwrite,
    partitionCol: Option[String] = None,
    replaceFilter: Option[String] = None,
    schemaEvolution: Boolean = false,
    tableProperties: Map[String, String] = Map.empty,
    commitInterval: Int = 0,
    joinCols: Option[Seq[String]] = None,
    loadTimestamp: Option[java.time.Instant] = None,
    loadTsCol: String = "_load_dttm"
) {
  require(commitInterval >= 0, "commit_interval must be >= 0")
  require(
    loadTsCol.matches("^[A-Za-z_][A-Za-z0-9_]*$"),
    "load_ts_col must start with a letter/underscore and contain only alphanumerics/_")

  /** Parsed partition spec — one or more comma-separated transforms
    * (`day(ts), bucket(16, id)`); the reference surface is a single
    * expression, multi-field is the scale extension.
    */
  val partitionFields: Seq[graft.partitioning.PartitionField] =
    partitionCol.map { raw =>
      val cleaned = raw.trim
      require(cleaned.nonEmpty, "partition_col cannot be empty")
      PartitionExpr.parseSpec(cleaned)
    }.getOrElse(Nil)

  val partitionField: Option[graft.partitioning.PartitionField] =
    partitionFields.headOption

  val cleanedJoinCols: Option[Seq[String]] = joinCols.map { cols =>
    val cleaned = cols.map(_.trim).filter(_.nonEmpty)
    require(cleaned.nonEmpty, "join_cols cannot be empty if provided")
    cleaned
  }

  /** Normalized SQL form of the replace filter (`==` → `=`), validated.
    * The rewrite walks the string tracking quote state so a `==` inside a
    * string literal (e.g. `note = 'a==b'`) is left untouched.
    */
  val replaceFilterSql: Option[String] = replaceFilter.map { raw =>
    val sb = new StringBuilder
    var i = 0
    var inSingle = false
    var inDouble = false
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '\'' && !inDouble) { inSingle = !inSingle; sb += c; i += 1 }
      else if (c == '"' && !inSingle) { inDouble = !inDouble; sb += c; i += 1 }
      else if (!inSingle && !inDouble && c == '=' && i + 1 < raw.length &&
               raw.charAt(i + 1) == '=' &&
               (i == 0 || !"=!<>".contains(raw.charAt(i - 1))) &&
               (i + 2 >= raw.length || raw.charAt(i + 2) != '=')) {
        sb += '='; i += 2
      } else { sb += c; i += 1 }
    }
    val sql = sb.toString
    CatalystSqlParser.parseExpression(sql) // throws ParseException if bad
    sql
  }

  require(
    !(writeMode == WriteMode.Upsert && replaceFilter.isDefined),
    "replace_filter cannot be used with write_mode='upsert'")

  for (pf <- partitionFields if loadTimestamp.isDefined) {
    require(
      !(pf.transform == Transform.Identity && pf.sourceCol == loadTsCol),
      "partition_col uses identity on the load timestamp column; use day(...) or hour(...) instead.")
  }
}

object LoaderConfig {
  /** Default table properties (reference `core/config.py:11-18`). */
  val defaultTableProperties: Map[String, String] = Map(
    "write.format.default"        -> "parquet",
    "format-version"              -> "2",
    "write.parquet.compression-codec" -> "zstd",
    "commit.retry.num-retries"    -> "10",
    "commit.retry.min-wait-ms"    -> "100",
    "commit.retry.max-wait-ms"    -> "60000"
  )
}
