package graft.connector

import java.util

import graft.table.{GraftCatalog, TableIdent}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

/** Maintenance as SQL stored procedures (Spark 4 `ProcedureCatalog`),
  * the Iceberg `CALL catalog.system.<proc>(...)` surface:
  *
  * {{{
  * CALL graft.system.expire_snapshots('ns', 't', 3)     -- keep last 3
  * CALL graft.system.compact('ns', 't', 1)              -- target file count
  * CALL graft.system.remove_orphans('ns', 't', 86400000)
  * }}}
  *
  * Each returns a one-row result describing what it did, via a
  * `LocalScan` (driver-side metadata results — maintenance planning is
  * metadata-only; the compaction rewrite itself is a distributed job).
  */
object GraftProcedures {

  val Namespace: Array[String] = Array("system")

  val Names: Seq[String] =
    Seq("expire_snapshots", "compact", "remove_orphans",
      "remove_orphan_files", "cluster",
      "zorder", "rollback_to_version", "create_tag", "drop_tag",
      "create_branch", "fast_forward", "merge_branch", "drop_branch",
      "set_partition_spec", "verify_table", "replicate", "compact_deletes",
      "dedup_table", "rewrite_deletes",
      "create_mview", "refresh_mview", "drop_mview", "mviews", "maintain_mview",
      "explain_rewrite",
      "ann_indexes", "refresh_ann_index", "rebuild_ann_index")

  def load(cat: () => GraftCatalog, name: String,
           catalogName: String = "graft"): Option[UnboundProcedure] =
    name match {
      // ---- materialized views (see GraftMaterializedView) ------------
      case "create_mview" => Some(proc(name,
        Array(
          ProcedureParameter.in("namespace", StringType).build(),
          ProcedureParameter.in("name", StringType).build(),
          ProcedureParameter.in("sql", StringType).build(),
          // optional storage partition spec over the GROUP columns
          // (e.g. 'bucket(32, region)') for directory-level refresh
          // pruning at high group cardinality
          ProcedureParameter.in("spec", StringType).defaultValue("''").build()),
        StructType(Seq(
          StructField("mode", StringType),
          StructField("source_version", IntegerType),
          StructField("rows", LongType))),
        { in =>
          val spark = org.apache.spark.sql.SparkSession.active
          val spec = Option(in.getUTF8String(3)).map(_.toString.trim).filter(_.nonEmpty)
          val (mode, v, rows) = GraftMaterializedView.create(spark, cat(),
            catalogName, in.getUTF8String(0).toString,
            in.getUTF8String(1).toString, in.getUTF8String(2).toString, spec)
          new GenericInternalRow(Array[Any](
            org.apache.spark.unsafe.types.UTF8String.fromString(mode), v, rows))
        }))
      case "refresh_mview" => Some(proc(name,
        Array(
          ProcedureParameter.in("namespace", StringType).build(),
          ProcedureParameter.in("name", StringType).build(),
          ProcedureParameter.in("force_full", BooleanType).build()),
        StructType(Seq(
          StructField("from_version", IntegerType),
          StructField("to_version", IntegerType),
          StructField("action", StringType))),
        { in =>
          val spark = org.apache.spark.sql.SparkSession.active
          val (from, to, action) = GraftMaterializedView.refresh(spark, cat(),
            in.getUTF8String(0).toString, in.getUTF8String(1).toString,
            in.getBoolean(2))
          new GenericInternalRow(Array[Any](from, to,
            org.apache.spark.unsafe.types.UTF8String.fromString(action)))
        }))
      case "drop_mview" => Some(proc(name,
        Array(
          ProcedureParameter.in("namespace", StringType).build(),
          ProcedureParameter.in("name", StringType).build()),
        StructType(Seq(StructField("dropped", BooleanType))),
        { in =>
          new GenericInternalRow(Array[Any](GraftMaterializedView.drop(cat(),
            in.getUTF8String(0).toString, in.getUTF8String(1).toString)))
        }))
      // SQL spelling of [[GraftMaterializedView.maintainStream]]: one
      // CALL drains the current changelog backlog (fact + every dim /
      // union leg) through an AvailableNow stream with exactly-once
      // refresh semantics, then returns. The checkpoint directory makes
      // restarts resume from the recorded offsets; a fresh directory is
      // always lossless (the MV's own markers carry all refresh state).
      case "maintain_mview" => Some(proc(name,
        Array(
          ProcedureParameter.in("namespace", StringType).build(),
          ProcedureParameter.in("name", StringType).build(),
          ProcedureParameter.in("checkpoint", StringType).build()),
        StructType(Seq(
          StructField("applied_version", IntegerType),
          StructField("mode", StringType))),
        { in =>
          val spark = org.apache.spark.sql.SparkSession.active
          val c = cat()
          val ns = in.getUTF8String(0).toString
          val nm = in.getUTF8String(1).toString
          val q = GraftMaterializedView.maintainStream(spark, c, catalogName,
            ns, nm, in.getUTF8String(2).toString)
          try q.awaitTermination() finally q.stop() // AvailableNow: stops on drain
          val props = c.load(TableIdent(ns,
            nm + GraftMaterializedView.StorageSuffix)).currentOrFail().properties
          new GenericInternalRow(Array[Any](
            props(GraftMaterializedView.AppliedProp).toInt,
            org.apache.spark.unsafe.types.UTF8String.fromString(
              props(GraftMaterializedView.ModeProp))))
        }))
      // the "which views need a refresh" dashboard: one row per MV in
      // the namespace with its maintenance mode and staleness —
      // `dims_stale` flags a join MV whose pinned dimension moved: the
      // next refresh consumes the dim slices (telescoped incremental
      // for inner dims, a FULL re-pin for left) even at versions_behind 0
      // "why didn't my query hit the MV?" — one diagnostic row per
      // registered MV in the SESSION's graft catalogs: substituted /
      // stale (which source, pinned vs current version) /
      // shape_mismatch (with the most specific refusal, e.g. a
      // non-re-aggregable DISTINCT) / type_drift /
      // unsupported_definition / definition_unanalyzable. Freshness is
      // probed at CALL time, same contract as the rewrite rule itself.
      case "explain_rewrite" => Some(procMulti(name,
        Array(ProcedureParameter.in("sql", StringType).build()),
        StructType(Seq(
          StructField("mview", StringType),
          StructField("verdict", StringType),
          StructField("detail", StringType))),
        { in =>
          val spark = org.apache.spark.sql.SparkSession.active
          val sql = in.getUTF8String(0).toString
          def utf(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
          GraftMviewRewrite.explainRewrite(spark, sql).map {
            case (mv, verdict, detail) =>
              new GenericInternalRow(Array[Any](
                utf(mv), utf(verdict), utf(detail))): InternalRow
          }.toArray
        }))
      case "mviews" => Some(procMulti(name,
        Array(ProcedureParameter.in("namespace", StringType).build()),
        StructType(Seq(
          StructField("name", StringType),
          StructField("mode", StringType),
          StructField("source", StringType),
          StructField("applied_version", IntegerType),
          StructField("source_version", IntegerType),
          StructField("versions_behind", IntegerType),
          StructField("dims_stale", BooleanType))),
        { in =>
          val c = cat()
          val ns = in.getUTF8String(0).toString
          def utf(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
          c.listTables(ns)
            .filter(_.name.endsWith(GraftMaterializedView.StorageSuffix))
            .flatMap { ti =>
              val storage = c.load(ti)
              val props = storage.currentOrFail().properties
              props.get(GraftMaterializedView.SqlProp).map { _ =>
                val applied = props(GraftMaterializedView.AppliedProp).toInt
                val srcRel = props(GraftMaterializedView.SourceProp)
                val srcV = srcRel.split("/") match {
                  case Array(sns, st) if c.exists(TableIdent(sns, st)) =>
                    c.load(TableIdent(sns, st)).currentOrFail().version
                  case _ => -1
                }
                // pinned relations: join dims AND union legs — either
                // moving means the next refresh has slices to consume
                val dimVers: Map[String, Int] =
                  props.get(GraftMaterializedView.DimVersProp).map(
                    GraftMaterializedView.dimVersFromJson).getOrElse(Map.empty) ++
                    props.get(GraftMaterializedView.UFactsProp).map(
                      GraftMaterializedView.dimVersFromJson).getOrElse(Map.empty)
                val dimsStale = dimVers.exists { case (rel, v) =>
                  rel.split("/") match {
                    case Array(dns, dt) if c.exists(TableIdent(dns, dt)) =>
                      c.load(TableIdent(dns, dt)).currentOrFail().version != v
                    case _ => true
                  }
                }
                new GenericInternalRow(Array[Any](
                  utf(ti.name.stripSuffix(GraftMaterializedView.StorageSuffix)),
                  utf(props(GraftMaterializedView.ModeProp)),
                  utf(srcRel.replace("/", ".")),
                  applied, srcV,
                  math.max(0, srcV - applied),
                  dimsStale)): InternalRow
              }
            }.toArray
        }))
      // the "which ANN indexes need a rebuild" dashboard (the mviews
      // pattern): one row per persisted IVF index in the namespace,
      // cell occupancy from manifest metadata only — no job. Refresh
      // assigns to frozen centroids, so corpus drift concentrates rows
      // in hot cells; `skew` (max/mean over populated cells) crossing
      // 4 flags the O(corpus) retrain (`rebuild_ann_index`) that
      // restores balanced probes and recall.
      case "ann_indexes" => Some(procMulti(name,
        Array(ProcedureParameter.in("namespace", StringType).build()),
        StructType(Seq(
          StructField("name", StringType),
          StructField("source", StringType),
          StructField("applied_version", IntegerType),
          StructField("source_version", IntegerType),
          StructField("versions_behind", IntegerType),
          StructField("cells", IntegerType),
          StructField("populated_cells", IntegerType),
          StructField("rows", LongType),
          StructField("max_cell_rows", LongType),
          StructField("mean_cell_rows", DoubleType),
          StructField("skew", DoubleType),
          StructField("rebuild_recommended", BooleanType))),
        { in =>
          val c = cat()
          val ns = in.getUTF8String(0).toString
          def utf(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
          c.listTables(ns).flatMap { ti =>
            val props = c.load(ti).currentOrFail().properties
            props.get(graft.operators.Similarity.CentroidsProp).map { _ =>
              val st = graft.operators.Similarity.ivfIndexStats(c, ti)
              new GenericInternalRow(Array[Any](
                utf(ti.name),
                utf(props(graft.operators.Similarity.SourceProp).replace("/", ".")),
                st.appliedVersion, st.sourceVersion, st.versionsBehind,
                st.cells, st.populatedCells, st.rows, st.maxCellRows,
                st.meanCellRows, st.skew, st.rebuildRecommended)): InternalRow
            }
          }.toArray
        }))
      // O(changes) maintenance off the corpus changelog — assigns only
      // changed vectors to the FROZEN centroids; with auto_rebuild (or
      // the graft.ann.auto-rebuild table property) it escalates to the
      // O(corpus) retrain the moment the manifest-only skew flag fires,
      // so one CALL keeps a drifted index healthy
      case "refresh_ann_index" => Some(proc(name,
        Array(
          ProcedureParameter.in("namespace", StringType).build(),
          ProcedureParameter.in("table", StringType).build(),
          // optional — the natural CALL ...(ns, tbl) spelling gets the
          // safe default (no escalation), matching the Scala API
          ProcedureParameter.in("auto_rebuild", BooleanType)
            .defaultValue("false").build()),
        StructType(Seq(
          StructField("from_version", IntegerType),
          StructField("to_version", IntegerType),
          StructField("action", StringType),
          StructField("skew", DoubleType))),
        { in =>
          val c = cat()
          val ti = TableIdent(in.getUTF8String(0).toString,
            in.getUTF8String(1).toString)
          val (from, to, action) = graft.operators.Similarity
            .refreshIvfIndexTable(c, ti, autoRebuild = in.getBoolean(2))
          val st = graft.operators.Similarity.ivfIndexStats(c, ti)
          new GenericInternalRow(Array[Any](from, to,
            org.apache.spark.unsafe.types.UTF8String.fromString(action), st.skew))
        }))
      // O(corpus) centroid retrain + reassignment, swapped in ONE
      // overwrite commit (in-flight probes keep their snapshot)
      case "rebuild_ann_index" => Some(proc(name,
        Array(
          ProcedureParameter.in("namespace", StringType).build(),
          ProcedureParameter.in("table", StringType).build()),
        StructType(Seq(
          StructField("rows", LongType),
          StructField("skew", DoubleType))),
        { in =>
          val c = cat()
          val ti = TableIdent(in.getUTF8String(0).toString,
            in.getUTF8String(1).toString)
          graft.operators.Similarity.rebuildIvfIndexTable(c, ti)
          val st = graft.operators.Similarity.ivfIndexStats(c, ti)
          new GenericInternalRow(Array[Any](st.rows, st.skew))
        }))
      case "expire_snapshots" => Some(proc(name,
        Array(
          ProcedureParameter.in("namespace", StringType).build(),
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("keep_last", IntegerType).build()),
        StructType(Seq(StructField("expired", IntegerType))),
        { in =>
          val tbl = cat().load(TableIdent(in.getUTF8String(0).toString,
            in.getUTF8String(1).toString))
          new GenericInternalRow(Array[Any](tbl.expireSnapshots(in.getInt(2))))
        }))
      case "compact" => Some(proc(name,
        Array(
          ProcedureParameter.in("namespace", StringType).build(),
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("target_files", IntegerType).build()),
        StructType(Seq(StructField("files_after", IntegerType))),
        { in =>
          val tbl = cat().load(TableIdent(in.getUTF8String(0).toString,
            in.getUTF8String(1).toString))
          val snap = tbl.compact(in.getInt(2))
          new GenericInternalRow(Array[Any](snap.files.size))
        }))
      case "compact_deletes" => Some(proc(name,
        Array(
          ProcedureParameter.in("namespace", StringType).build(),
          ProcedureParameter.in("table", StringType).build()),
        StructType(Seq(StructField("delete_groups_after", IntegerType))),
        { in =>
          val tbl = cat().load(TableIdent(in.getUTF8String(0).toString,
            in.getUTF8String(1).toString))
          val snap = tbl.compactDeletes()
          new GenericInternalRow(Array[Any](snap.deleteGroups.size))
        }))
      case "rewrite_deletes" => Some(proc(name,
        Array(
          ProcedureParameter.in("namespace", StringType).build(),
          ProcedureParameter.in("table", StringType).build()),
        StructType(Seq(StructField("delete_groups_after", IntegerType))),
        { in =>
          val tbl = cat().load(TableIdent(in.getUTF8String(0).toString,
            in.getUTF8String(1).toString))
          val snap = tbl.rewriteDeletes()
          new GenericInternalRow(Array[Any](snap.deleteGroups.size))
        }))
      case "dedup_table" => Some(proc(name,
        Array(
          ProcedureParameter.in("namespace", StringType).build(),
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("columns", StringType).build()), // comma-separated; '' = whole row
        StructType(Seq(StructField("rows_removed", LongType))),
        { in =>
          val tbl = cat().load(TableIdent(in.getUTF8String(0).toString,
            in.getUTF8String(1).toString))
          val colsArg = in.getUTF8String(2).toString.trim
          val cols = if (colsArg.isEmpty) Nil
                     else colsArg.split(",").map(_.trim).filter(_.nonEmpty).toSeq
          val before = tbl.currentOrFail()
          val snap = tbl.dedupTable(cols)
          // the new position-delete manifest's row count IS the number
          // of removed occurrences — no re-scan needed
          val removed =
            if (snap.snapshotId == before.snapshotId) 0L
            else snap.deleteGroups
              .collect { case p: graft.meta.PositionDeleteGroup => p }
              .filter(_.seq == snap.lastSeq).map(_.group.rows).sum
          new GenericInternalRow(Array[Any](removed))
        }))
      case "cluster" => Some(proc(name,
        Array(
          ProcedureParameter.in("namespace", StringType).build(),
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("columns", StringType).build(), // comma-separated
          ProcedureParameter.in("target_files", IntegerType).build()),
        StructType(Seq(StructField("files_after", IntegerType))),
        { in =>
          val tbl = cat().load(TableIdent(in.getUTF8String(0).toString,
            in.getUTF8String(1).toString))
          val cols = in.getUTF8String(2).toString.split(",").map(_.trim).toSeq
          val snap = tbl.compactClustered(cols, in.getInt(3))
          new GenericInternalRow(Array[Any](snap.files.size))
        }))
      case "rollback_to_version" => Some(proc(name,
        Array(
          ProcedureParameter.in("namespace", StringType).build(),
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("version", IntegerType).build()),
        StructType(Seq(
          StructField("restored_version", IntegerType),
          StructField("new_version", IntegerType))),
        { in =>
          val tbl = cat().load(TableIdent(in.getUTF8String(0).toString,
            in.getUTF8String(1).toString))
          val snap = tbl.rollbackTo(in.getInt(2))
          new GenericInternalRow(Array[Any](in.getInt(2), snap.version))
        }))
      case "zorder" => Some(proc(name,
        Array(
          ProcedureParameter.in("namespace", StringType).build(),
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("columns", StringType).build(), // comma-separated, 2-4 numeric
          ProcedureParameter.in("target_files", IntegerType).build()),
        StructType(Seq(StructField("files_after", IntegerType))),
        { in =>
          val tbl = cat().load(TableIdent(in.getUTF8String(0).toString,
            in.getUTF8String(1).toString))
          val cols = in.getUTF8String(2).toString.split(",").map(_.trim).toSeq
          val snap = tbl.compactZOrder(cols, in.getInt(3))
          new GenericInternalRow(Array[Any](snap.files.size))
        }))
      case "verify_table" => Some(proc(name,
        Array(
          ProcedureParameter.in("namespace", StringType).build(),
          ProcedureParameter.in("table", StringType).build()),
        StructType(Seq(
          StructField("files", IntegerType),
          StructField("rows", LongType),
          StructField("ok", BooleanType),
          StructField("issues", StringType))),
        { in =>
          val tbl = cat().load(TableIdent(in.getUTF8String(0).toString,
            in.getUTF8String(1).toString))
          val (files, rows, issues) = tbl.verifyIntegrity()
          new GenericInternalRow(Array[Any](files, rows, issues.isEmpty,
            org.apache.spark.unsafe.types.UTF8String.fromString(
              issues.mkString("; "))))
        }))
      case "set_partition_spec" => Some(proc(name,
        Array(
          ProcedureParameter.in("namespace", StringType).build(),
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("spec", StringType).build()), // '' = unpartitioned
        StructType(Seq(StructField("spec", StringType))),
        { in =>
          val tbl = cat().load(TableIdent(in.getUTF8String(0).toString,
            in.getUTF8String(1).toString))
          val raw = in.getUTF8String(2).toString.trim
          val snap = tbl.setPartitionSpec(Some(raw).filter(_.nonEmpty))
          new GenericInternalRow(Array[Any](
            snap.partitionSpec.map(org.apache.spark.unsafe.types.UTF8String.fromString).orNull))
        }))
      case "create_tag" => Some(proc(name,
        Array(
          ProcedureParameter.in("namespace", StringType).build(),
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("tag", StringType).build(),
          ProcedureParameter.in("version", IntegerType).build()), // -1 = current
        StructType(Seq(
          StructField("tag", StringType),
          StructField("version", IntegerType))),
        { in =>
          val tbl = cat().load(TableIdent(in.getUTF8String(0).toString,
            in.getUTF8String(1).toString))
          val tag = in.getUTF8String(2).toString
          val v = tbl.createTag(tag, Some(in.getInt(3)).filter(_ >= 0))
          new GenericInternalRow(Array[Any](
            org.apache.spark.unsafe.types.UTF8String.fromString(tag), v))
        }))
      // WAP from SQL: CALL create_branch → INSERT INTO g.ns.t.branch_<b>
      // → audit SELECTs → CALL fast_forward (or drop_branch to abandon)
      case "create_branch" => Some(proc(name,
        Array(
          ProcedureParameter.in("namespace", StringType).build(),
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("branch", StringType).build(),
          ProcedureParameter.in("from_version", IntegerType).build()), // -1 = current
        StructType(Seq(
          StructField("branch", StringType),
          StructField("fork_version", IntegerType))),
        { in =>
          val tbl = cat().load(TableIdent(in.getUTF8String(0).toString,
            in.getUTF8String(1).toString))
          val b = in.getUTF8String(2).toString
          val snap = tbl.createBranch(b, Some(in.getInt(3)).filter(_ >= 0))
          new GenericInternalRow(Array[Any](
            org.apache.spark.unsafe.types.UTF8String.fromString(b),
            snap.properties(graft.table.GraftTable.ForkVersionProp).toInt))
        }))
      case "fast_forward" => Some(proc(name,
        Array(
          ProcedureParameter.in("namespace", StringType).build(),
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("branch", StringType).build()),
        StructType(Seq(
          StructField("published_version", IntegerType),
          StructField("row_count", LongType))),
        { in =>
          val tbl = cat().load(TableIdent(in.getUTF8String(0).toString,
            in.getUTF8String(1).toString))
          val snap = tbl.fastForward(in.getUTF8String(2).toString)
          new GenericInternalRow(Array[Any](snap.version, snap.rowCount))
        }))
      case "merge_branch" => Some(proc(name,
        Array(
          ProcedureParameter.in("namespace", StringType).build(),
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("branch", StringType).build()),
        StructType(Seq(
          StructField("published_version", IntegerType),
          StructField("row_count", LongType))),
        { in =>
          val tbl = cat().load(TableIdent(in.getUTF8String(0).toString,
            in.getUTF8String(1).toString))
          val snap = tbl.mergeBranch(in.getUTF8String(2).toString)
          new GenericInternalRow(Array[Any](snap.version, snap.rowCount))
        }))
      case "drop_branch" => Some(proc(name,
        Array(
          ProcedureParameter.in("namespace", StringType).build(),
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("branch", StringType).build()),
        StructType(Seq(StructField("dropped", BooleanType))),
        { in =>
          val tbl = cat().load(TableIdent(in.getUTF8String(0).toString,
            in.getUTF8String(1).toString))
          tbl.dropBranch(in.getUTF8String(2).toString)
          new GenericInternalRow(Array[Any](true))
        }))
      case "drop_tag" => Some(proc(name,
        Array(
          ProcedureParameter.in("namespace", StringType).build(),
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("tag", StringType).build()),
        StructType(Seq(StructField("dropped", BooleanType))),
        { in =>
          val tbl = cat().load(TableIdent(in.getUTF8String(0).toString,
            in.getUTF8String(1).toString))
          new GenericInternalRow(Array[Any](
            tbl.dropTag(in.getUTF8String(2).toString)))
        }))
      case "remove_orphans" => Some(proc(name,
        Array(
          ProcedureParameter.in("namespace", StringType).build(),
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("older_than_ms", LongType).build()),
        StructType(Seq(StructField("removed", IntegerType))),
        { in =>
          val tbl = cat().load(TableIdent(in.getUTF8String(0).toString,
            in.getUTF8String(1).toString))
          new GenericInternalRow(Array[Any](tbl.removeOrphanFiles(in.getLong(2))))
        }))
      // Iceberg-style surface with dry-run: plan-only when dry_run is
      // true, so operators can audit what GC would take before running it
      case "remove_orphan_files" => Some(proc(name,
        Array(
          ProcedureParameter.in("namespace", StringType).build(),
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("older_than_ms", LongType).build(),
          ProcedureParameter.in("dry_run", BooleanType).build()),
        StructType(Seq(
          StructField("orphans", IntegerType),
          StructField("dry_run", BooleanType))),
        { in =>
          val tbl = cat().load(TableIdent(in.getUTF8String(0).toString,
            in.getUTF8String(1).toString))
          val dry = in.getBoolean(3)
          val n = tbl.removeOrphanFiles(in.getLong(2), dryRun = dry)
          new GenericInternalRow(Array[Any](n, dry))
        }))
      // CDC-driven replica maintenance from pure SQL:
      //   CALL graft.system.replicate('src_ns','src_t','dst_ns','dst_t','id')
      // One-shot incremental replication — first call bootstraps the
      // replica from the source's current snapshot; every later call
      // reads the source changelog since the last applied version and
      // applies the NET effect in ONE commit. The applied source
      // version rides in the SAME commit as the data (a table
      // property), so a crash between apply and any external bookkeep
      // cannot double-apply: re-CALL resumes exactly where the marker
      // says — exactly-once without a checkpoint. Cost scales with
      // change volume, not table size (applyNetChanges).
      case "replicate" => Some(proc(name,
        Array(
          ProcedureParameter.in("src_namespace", StringType).build(),
          ProcedureParameter.in("src_table", StringType).build(),
          ProcedureParameter.in("dst_namespace", StringType).build(),
          ProcedureParameter.in("dst_table", StringType).build(),
          ProcedureParameter.in("keys", StringType).build()), // comma-separated
        StructType(Seq(
          StructField("from_version", IntegerType),
          StructField("to_version", IntegerType),
          StructField("action", StringType))),
        { in =>
          val c = cat()
          val src = c.load(TableIdent(in.getUTF8String(0).toString,
            in.getUTF8String(1).toString))
          val dstIdent = TableIdent(in.getUTF8String(2).toString,
            in.getUTF8String(3).toString)
          val keys = in.getUTF8String(4).toString.split(",").map(_.trim)
            .filter(_.nonEmpty).toSeq
          require(keys.nonEmpty, "replicate requires key columns")
          val dst = c.ensure(dstIdent)
          val markerKey = "graft.replicate." +
            s"${in.getUTF8String(0)}.${in.getUTF8String(1)}.last-version"
          val cur = src.currentOrFail().version
          def utf(s: String) = org.apache.spark.unsafe.types.UTF8String.fromString(s)
          val last = dst.current().flatMap(_.properties.get(markerKey)).map(_.toInt)
          val row = last match {
            case None if dst.current().exists(_.rowCount > 0) =>
              throw new IllegalStateException(
                s"replica $dstIdent has rows but no replication marker " +
                  s"($markerKey) — it was not built by replicate; use an " +
                  "empty/new table")
            case None =>
              // bootstrap: the source's whole current state, marker in
              // the same commit. Virgin-parent CAS: two replicates
              // racing the first call both read marker=None — without
              // the guard both appends land and the replica doubles
              // (the same race round 13 closed in applyChangesBatch).
              // The loser defers to the winner's marker and applies
              // only the remainder.
              try {
                dst.append(src.scanAsOfVersion(cur),
                  props = Map(markerKey -> cur.toString),
                  requireVirginParent = true)
                new GenericInternalRow(Array[Any](-1, cur, utf("bootstrap")))
              } catch {
                case _: java.util.ConcurrentModificationException =>
                  val l2 = dst.current().flatMap(_.properties.get(markerKey))
                    .map(_.toInt).getOrElse(throw new IllegalStateException(
                      s"replica $dstIdent was seeded concurrently but " +
                        s"carries no $markerKey marker — not a replicate seed"))
                  if (l2 >= cur)
                    new GenericInternalRow(Array[Any](l2, cur, utf("noop")))
                  else {
                    graft.streaming.GraftStream.applyChangesBatch(
                      src.scanDataChangesBetween(l2, cur), dst, keys,
                      props = Map(markerKey -> cur.toString),
                      requireParentProps = Map(markerKey -> l2.toString))
                    new GenericInternalRow(Array[Any](l2, cur, utf("applied")))
                  }
              }
            case Some(l) if l >= cur =>
              new GenericInternalRow(Array[Any](l, cur, utf("noop")))
            case Some(l) =>
              // marker-CAS: a racing replicate that already advanced the
              // marker makes this one abort instead of double-applying
              graft.streaming.GraftStream.applyChangesBatch(
                src.scanDataChangesBetween(l, cur), dst, keys,
                props = Map(markerKey -> cur.toString),
                requireParentProps = Map(markerKey -> l.toString))
              new GenericInternalRow(Array[Any](l, cur, utf("applied")))
          }
          row
        }))
      case _ => None
    }

  private def proc(procName: String, params: Array[ProcedureParameter],
                   resultSchema: StructType,
                   run: InternalRow => InternalRow): UnboundProcedure =
    procMulti(procName, params, resultSchema, in => Array(run(in)))

  private def procMulti(procName: String, params: Array[ProcedureParameter],
                        resultSchema: StructType,
                        run: InternalRow => Array[InternalRow]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = s"graft maintenance: $procName"
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = procName
          override def description(): String = s"graft maintenance: $procName"
          override def parameters(): Array[ProcedureParameter] = params
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): util.Iterator[Scan] = {
            val out = run(input)
            util.List.of[Scan](new LocalScan {
              override def rows(): Array[InternalRow] = out
              override def readSchema(): StructType = resultSchema
              override def description(): String = procName
            }).iterator()
          }
        }
    }
}
