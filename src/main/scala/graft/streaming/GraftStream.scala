package graft.streaming

import graft.config.LoaderConfig
import graft.loader.{Loader, WriteStrategy}
import graft.table.{GraftCatalog, TableIdent}

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

/** Structured Streaming sink into graft tables — the true-streaming
  * realization of the reference's micro-batch commit model
  * (`core/loader.py:210-235`): every micro-batch is one transaction ⇒
  * one snapshot, exactly the per-flush boundary of
  * `core/strategies.py:32,43,61`.
  *
  * The engine's own trigger cadence replaces the driver-side
  * `commit_interval` buffer (use `Trigger.ProcessingTime` to batch more
  * rows per commit). `isFirstWrite` threading maps onto `batchId == 0`,
  * which the checkpoint makes exactly-once across restarts: a resumed
  * query never re-runs the overwrite/delete first-flush special case
  * (W2/W3), matching the reference's single `is_first_write` transition
  * per logical stream.
  *
  * Scale: the foreachBatch body runs on the driver but every data
  * movement inside it is a distributed DataFrame write; state between
  * batches lives in the table's metadata log, not in driver memory.
  */
object GraftStream {

  /** Apply one batch of a CDC feed (rows shaped like
    * `graft.ns.t.changes`: data columns + `_change_type` +
    * `_commit_version`) to a keyed target table — the table-replication
    * / downstream-materialization loop:
    * {{{
    * spark.readStream.table("graft.ns.src.changes").writeStream
    *   .foreachBatch { (b, _) => GraftStream.applyChangesBatch(b, replica, Seq("id")) }
    * }}}
    *
    * A batch may span several commits, so the NET effect per key is
    * applied: the newest version wins, and within one version insert
    * beats delete (a rewrite's carried row is present after the
    * commit). The net applies through ONE
    * [[GraftTable.applyNetChanges]] commit — a partition-pruned keyed
    * rewrite, so replication cost scales with the change volume, not
    * the table, and each batch is ATOMIC: a reader never sees deletes
    * applied without the corresponding inserts. Net application is
    * IDEMPOTENT (re-deleting is a no-op, re-upserting the same rows
    * converges), which is exactly what foreachBatch's at-least-once
    * replay needs — no marker protocol required. Keys must be unique
    * non-null identifiers in the source table, same contract as upsert.
    */
  def applyChangesBatch(changes: DataFrame, target: graft.table.GraftTable,
                        keys: Seq[String],
                        props: Map[String, String] = Map.empty,
                        requireParentProps: Map[String, String] = Map.empty): Unit = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    require(keys.nonEmpty, "CDC application requires key columns")
    val w = Window.partitionBy(keys.map(k => col(s"`$k`")): _*)
      .orderBy(col("_commit_version").desc,
        when(col("_change_type") === "insert", 1).otherwise(0).desc)
    // materialized ONCE: the netting window shuffles the whole batch,
    // and everything downstream (emptiness probes, the delete/upsert
    // split, the rewrite) re-reads this frame — without the checkpoint
    // each consumer would re-run the window over the full batch
    val last = changes.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).localCheckpoint()
    val dels = last.where(col("_change_type") === "delete")
      .select(keys.map(k => col(s"`$k`")): _*)
    val ups = last.where(col("_change_type") === "insert")
      .drop("_change_type", "_commit_version", "_rn")
    if (target.current().isEmpty) {
      // virgin replica: the net effect of the first batch is pure
      // inserts (deletes of rows that never landed are no-ops). The
      // virgin-parent CAS closes the race where two appliers both pass
      // the is-empty probe: the loser re-nets against the snapshot the
      // winner seeded, where the marker CAS (when given) decides
      // whether this batch still applies and plain net-apply converges
      // idempotently when it isn't
      if (!ups.isEmpty) {
        try { target.append(ups, props, requireVirginParent = true); () }
        catch {
          case _: java.util.ConcurrentModificationException =>
            target.applyNetChanges(dels, ups, keys, props, requireParentProps); ()
        }
      }
    } else if (!last.isEmpty) {
      target.applyNetChanges(dels, ups, keys, props, requireParentProps); ()
    } else if (props.nonEmpty) {
      // net-empty batch (e.g. compaction-only range) still advances the
      // caller's marker properties — exactly-once bookkeeping must move
      // even when no rows do; the CAS keeps a stale empty-advance from
      // regressing a marker another applier already moved
      target.updateProperties(props, requireParentProps = requireParentProps); ()
    }
  }

  /** Attach a graft-table sink to a streaming DataFrame. Caller sets
    * trigger/checkpoint and calls `.start()`:
    * {{{
    * GraftStream.writer(stream, catalog, ident, cfg)
    *   .option("checkpointLocation", dir)
    *   .trigger(Trigger.ProcessingTime("30 seconds"))
    *   .start()
    * }}}
    */
  def writer(stream: DataFrame, catalog: GraftCatalog, ident: TableIdent,
             cfg: LoaderConfig = LoaderConfig(),
             streamId: String = "stream"): DataStreamWriter[Row] = {
    val strategy = WriteStrategy.forConfig(cfg)
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        commitBatch(batch.toDF(), batchId, catalog, ident, cfg, strategy, streamId)
      }
  }

  /** One micro-batch ⇒ one snapshot. Mirrors the Loader's flush pipeline
    * (`core/loader.py:109-176`): ensure table, inject load timestamp,
    * evolve schema if enabled, dispatch to the write strategy.
    *
    * Exactly-once across retries: `foreachBatch` is at-least-once (a
    * crash between the table commit and the checkpoint commit replays
    * the batch), so the committed batch id rides IN the snapshot
    * properties (`graft.stream.<streamId>.last-batch`) — the same
    * transaction as the data, the Delta `txnAppId`/`txnVersion`
    * pattern. A replayed batch id ≤ the recorded one is skipped whole.
    * `streamId` names the LOGICAL stream; when left at the default it
    * is derived from the query's own id (see below), so distinct
    * queries and fresh checkpoints get distinct markers without caller
    * effort. Give an explicit stable streamId only to tie several
    * successive queries into ONE logical stream. Every skip is logged
    * at warning level with both ids so a collision stays visible.
    */
  private[graft] def commitBatch(batch: DataFrame, batchId: Long,
                                     catalog: GraftCatalog, ident: TableIdent,
                                     cfg: LoaderConfig, strategy: WriteStrategy,
                                     streamId: String = "stream"): Unit = {
    val table = catalog.ensure(ident, cfg.partitionCol)
    // Derive the default stream identity from Structured Streaming's own
    // QUERY id ("sql.streaming.queryId", a local property on the thread
    // running the foreachBatch body): stable across restarts of one
    // checkpoint, fresh for a fresh checkpoint — exactly the logical-
    // stream identity the replay marker needs. Under the old shared
    // literal default, two concurrent queries (or a fresh-checkpoint
    // restart) made live batches look like replays and silently dropped
    // them. An explicit caller-chosen streamId still wins.
    val effectiveId =
      if (streamId != "stream") streamId
      else Option(batch.sparkSession.sparkContext
          .getLocalProperty("sql.streaming.queryId"))
        .map(q => s"q-$q").getOrElse(streamId)
    val key = s"graft.stream.$effectiveId.last-batch"
    val currentSnap = table.current()
    val props = currentSnap.map(_.properties).getOrElse(Map.empty)
    // Marker migration: a table written before query-id derivation
    // carries its marker only under the shared literal key. Until this
    // stream has written its own derived marker, the legacy value is
    // the floor — that reproduces the OLD skip behavior exactly (so an
    // upgrade-restart's crash-recovery replay is still deduplicated,
    // and a new query is treated no differently than the shared marker
    // always treated it), while every post-migration stream keeps a
    // private marker and can never collide again.
    val derivedLast = props.get(key).map(_.toLong)
    val legacyLast =
      if (effectiveId == streamId || derivedLast.isDefined) None
      else props.get(s"graft.stream.$streamId.last-batch").map(_.toLong)
    legacyLast.foreach { l =>
      graft.observability.Log.warn(
        s"stream '$effectiveId' adopting legacy shared marker (batch $l) on " +
          s"$ident; its own marker takes over from this commit",
        "table" -> ident, "stream" -> effectiveId, "legacy_last" -> l)
    }
    val last = derivedLast.orElse(legacyLast).getOrElse(-1L)
    if (batchId <= last) {
      graft.observability.Log.warn(
        s"skipping replayed micro-batch $batchId for $ident (stream " +
          s"'$effectiveId' already committed through $last) — if this is a " +
          "DIFFERENT query than the one that wrote that marker, give it " +
          "its own streamId or its data is being dropped",
        "table" -> ident, "stream" -> effectiveId,
        "batch" -> batchId, "committed_through" -> last)
      return
    }
    val stamped = Loader.injectLoadTs(batch, cfg)
    if (cfg.schemaEvolution && currentSnap.isDefined)
      table.evolveSchema(stamped.schema)
    val marked = cfg.copy(tableProperties =
      cfg.tableProperties + (key -> batchId.toString))
    strategy.write(table, stamped, marked, isFirstWrite = batchId == 0L)
    // Tombstone the legacy shared marker the moment a derived marker
    // has committed: left alive, it would make EVERY future
    // fresh-checkpoint query on this table adopt the old floor and
    // silently drop its early batches forever. The adoption above
    // already honored the floor once — the upgrade-restart's
    // crash-recovery replay stays deduplicated — and from here each
    // stream's private marker is the only state that matters. An O(1)
    // metadata commit; a crash between the two commits is benign (the
    // next batch adopts and tombstones again).
    legacyLast.foreach { _ =>
      table.updateProperties(Map.empty,
        remove = Seq(s"graft.stream.$streamId.last-batch"))
      ()
    }
  }
}
