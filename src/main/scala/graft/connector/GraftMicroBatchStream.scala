package graft.connector

import graft.meta.DataFile
import graft.table.GraftTable

import org.apache.spark.sql.GraftSqlShim
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.vectorized.ColumnarBatch
import org.apache.spark.sql.connector.read.streaming.{CompositeReadLimit, MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, ReadMaxRows, ReportsSourceMetrics, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Stream offset = metadata-log version: "every append up to and
  * including version N has been emitted". Versions are the table's own
  * durable, totally-ordered commit sequence, so offsets survive
  * restarts and re-planning a (start, end] range is deterministic —
  * exactly-once per version.
  */
final case class GraftStreamOffset(version: Int) extends Offset {
  override def json(): String = s"""{"version":$version}"""
}

object GraftStreamOffset {
  def fromJson(json: String): GraftStreamOffset = {
    val m = """"version"\s*:\s*(-?\d+)""".r
    m.findFirstMatchIn(json) match {
      case Some(g) => GraftStreamOffset(g.group(1).toInt)
      case None => throw new IllegalArgumentException(s"bad graft offset: $json")
    }
  }
}

object GraftMicroBatchStream {
  /** The admission walk as a pure function (property-tested): largest
    * end version in (from, latest] whose cumulative (files, rows) —
    * supplied per version by `sizeOf` — stays within the caps.
    * A version that would push the batch PAST a cap is deferred unless
    * it is the batch's first version, which is admitted whole (the
    * progress guarantee). `sizeOf` is called once per inspected
    * version, in ascending order.
    */
  private[graft] def admitWalk(from: Int, latest: Int,
                                   maxFiles: Option[Int], maxRows: Option[Long])(
                                   sizeOf: Int => (Long, Long)): Int = {
    var v = from + 1
    var files = 0L
    var rows = 0L
    while (v <= latest) {
      val (f, r) = sizeOf(v)
      files += f
      rows += r
      if ((maxFiles.exists(files > _) || maxRows.exists(rows > _)) && v > from + 1)
        return v - 1
      if (maxFiles.exists(files >= _) || maxRows.exists(rows >= _)) return v
      v += 1
    }
    latest
  }
}

/** Structured Streaming SOURCE over a graft table — the read-side
  * completion of [[graft.streaming.GraftStream]]'s sink (the reference
  * streams only INTO tables, `core/loader.py:210-235`; streaming OUT of
  * them is the natural pairing). Reached via
  * `spark.readStream.table("graft.ns.t")`.
  *
  * Micro-batch planning is pure metadata: a batch for (start, end]
  * walks the versions in the range and emits each append commit's NEW
  * files, computed by diffing manifest REFERENCES against the parent
  * snapshot — only manifests that changed are parsed, so per-batch
  * planning is O(new files), never O(table). Files are then read by the
  * same native columnar ParquetScan machinery as batch scans.
  *
  * Non-append commits in a range abort the stream by default — their
  * file churn rewrites EXISTING rows, and emitting it would duplicate
  * data. With `streamSkipRewrites=true`, PURE-rewrite commits
  * (delete/update/compact/cluster) are skipped instead: appends stay
  * exact, but rows deleted or modified after their append commit were
  * already emitted as-appended (at-least-once with respect to later
  * mutation — the Iceberg streaming-read trade, where it is spelled
  * streaming-skip-delete-snapshots). Upsert and overwrite commits still
  * abort even in skip mode: they INSERT new rows alongside their
  * rewrite churn, and skipping them would silently lose those rows —
  * no offset bookkeeping can recover data never emitted.
  *
  * Options: `streamStartVersion` (default: the version current when the
  * stream starts, i.e. only NEW appends; `-1` replays from genesis —
  * valid when the table history is append-only);
  * `streamStartTimestamp` (epoch millis — replay every commit after
  * that moment; a timestamp before the first commit replays from
  * genesis);
  * `maxFilesPerTrigger` / `maxRowsPerTrigger` rate-limit each
  * micro-batch via Spark's admission-control contract — a backlogged
  * stream catches up in bounded batches instead of planning one batch
  * over the entire pending history (the Delta/Iceberg streaming-read
  * pattern). Admission stays VERSION-granular so exactly-once-per-
  * version is preserved: at least one version is always admitted, and
  * a single commit larger than the cap is admitted whole.
  */
final class GraftMicroBatchStream(
    tbl: GraftTable,
    readDataSchema: StructType,
    pushed: Array[Filter],
    options: CaseInsensitiveStringMap,
    pinnedSchema: StructType)
    extends MicroBatchStream with SupportsTriggerAvailableNow with ReportsSourceMetrics {

  private val skipRewrites = options.getBoolean("streamSkipRewrites", false)

  /** Per-batch observability in `StreamingQueryProgress.sources[i]
    * .metrics`: how far the consumer lags the table's head, in
    * versions — the number an operator alarms on.
    */
  override def metrics(latestConsumed: java.util.Optional[Offset])
      : java.util.Map[String, String] = {
    val head = tbl.currentOrFail().version
    // After a checkpoint restart the progress reporter hands back the
    // offset rehydrated from the offset log (SerializedOffset), not
    // this source's offset class — same defense as Kafka's source.
    val consumed =
      if (latestConsumed.isPresent) latestConsumed.get match {
        case g: GraftStreamOffset => g.version
        case o => GraftStreamOffset.fromJson(o.json).version
      }
      else -1
    java.util.Map.of(
      "tableVersion", head.toString,
      "consumedVersion", consumed.toString,
      "versionsBehind", math.max(0, head - consumed).toString)
  }

  // Trigger.AvailableNow: pin the end version at preparation time so
  // the bounded run processes exactly the data available THEN (in
  // rate-limited batches) and stops, even while writers keep committing
  @volatile private var availableNowEnd: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(tbl.currentOrFail().version)

  override def initialOffset(): Offset = {
    // precedence: explicit version > timestamp > "now" (only NEW
    // appends). A timestamp resolves to the last version committed
    // STRICTLY BEFORE it (the offset is an exclusive lower bound), so a
    // commit stamped exactly at the requested timestamp IS replayed —
    // Iceberg's stream-from-timestamp includes snapshots with
    // timestamp >= ts.
    val v = Option(options.get("streamStartVersion")).map(_.toInt)
      .orElse(Option(options.get("streamStartTimestamp")).map { ts =>
        val tsMs = ts.toLong
        // only "timestamp predates the first commit" means genesis (-1);
        // a transient metadata-read failure must FAIL the query start,
        // not silently replay the whole table into the sink
        try tbl.snapshotAsOfTimestamp(tsMs - 1).version
        catch { case _: IllegalArgumentException => -1 }
      })
      .getOrElse(tbl.currentOrFail().version)
    GraftStreamOffset(v)
  }

  override def latestOffset(): Offset =
    GraftStreamOffset(availableNowEnd.getOrElse(tbl.currentOrFail().version))

  override def getDefaultReadLimit: ReadLimit = {
    val limits = Seq(
      Option(options.get("maxFilesPerTrigger")).map(s => ReadLimit.maxFiles(s.toInt)),
      Option(options.get("maxRowsPerTrigger")).map(s => ReadLimit.maxRows(s.toLong))).flatten
    limits match {
      case Seq()  => ReadLimit.allAvailable()
      case Seq(l) => l
      case ls     => ReadLimit.compositeLimit(ls.toArray)
    }
  }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[GraftStreamOffset].version
    val latest = availableNowEnd.getOrElse(tbl.currentOrFail().version)
    GraftStreamOffset(admitUpTo(from, latest, limit))
  }

  /** Largest end version in (from, latest] whose cumulative new
    * files/rows stay within `limit` — walking METADATA only (per-
    * version manifest diffs), never file contents. Rewrite commits
    * count zero (planning later aborts or skips them as configured).
    */
  private def admitUpTo(from: Int, latest: Int, limit: ReadLimit): Int = {
    def caps(l: ReadLimit): (Option[Int], Option[Long]) = l match {
      case f: ReadMaxFiles => (Some(f.maxFiles), None)
      case r: ReadMaxRows => (None, Some(r.maxRows))
      case c: CompositeReadLimit =>
        c.getReadLimits.map(caps).reduce { (a, b) =>
          (Seq(a._1, b._1).flatten.minOption, Seq(a._2, b._2).flatten.minOption)
        }
      case _ => (None, None)
    }
    val (maxFiles, maxRows) = caps(limit)
    if (maxFiles.isEmpty && maxRows.isEmpty) return latest
    val memo = scala.collection.mutable.HashMap.empty[Int, Option[Seq[(StructType, Seq[DataFile])]]]
    try {
      GraftMicroBatchStream.admitWalk(from, latest, maxFiles, maxRows) { v =>
        val step = computeAppendedAt(v)
        memo(v) = step
        val added = step.getOrElse(Nil).flatMap(_._2)
        (added.size.toLong, added.map(_.rows).sum)
      }
    } finally walkMemo = memo.toMap // planInputPartitions reuses this walk
  }

  override def deserializeOffset(json: String): Offset =
    GraftStreamOffset.fromJson(json)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[GraftStreamOffset].version
    val to = end.asInstanceOf[GraftStreamOffset].version
    val added = addedBetween(from, to)
    if (added.isEmpty) return Array.empty
    // one native scan per WRITE-ERA schema: files committed before a
    // rename read under their physical era names (mapped to the
    // stream's PINNED naming by field id), files after it under the new
    // ones — a rename no longer aborts the stream. Each partition
    // carries its era's reader factory; the top-level factory is a pure
    // dispatcher that preserves columnar reads.
    added.groupBy(_._1).toSeq.flatMap { case (writeSchema, eraFiles) =>
      val scan = scanFor(writeSchema, eraFiles.flatMap(_._2))
      val factory = scan.toBatch.createReaderFactory()
      scan.toBatch.planInputPartitions().map(p => EraPartition(p, factory))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // file identity AND era factory ride inside each partition; the
    // top factory only dispatches, so one instance serves every batch
    new EraDispatchReaderFactory

  override def commit(end: Offset): Unit = () // offsets live in the checkpoint
  override def stop(): Unit = ()

  /** New files of append-family version `v` (None for rewrite
    * commits), by manifest-set diff: files of manifests NEW in `v`,
    * minus paths of manifests it dropped (a concurrent manifest-merge
    * moves old files into a new manifest; the subtraction keeps them
    * out). Loads only changed manifests.
    */
  /** Memo of the most recent admission walk: `latestOffset(start,
    * limit)` and the `planInputPartitions(start, end]` that follows it
    * cover the same versions, so each version's manifest diff is
    * computed once per trigger, not twice. Replaced wholesale per walk
    * — bounded by one batch's version span, never the table's history.
    * Values are era-grouped: (write-time schema, new files under it).
    */
  @volatile private var walkMemo: Map[Int, Option[Seq[(StructType, Seq[DataFile])]]] = Map.empty

  private def appendedAt(v: Int): Option[Seq[(StructType, Seq[DataFile])]] =
    walkMemo.getOrElse(v, computeAppendedAt(v))

  private def computeAppendedAt(v: Int): Option[Seq[(StructType, Seq[DataFile])]] =
    try {
      val snap = tbl.snapshotAt(v)
      // rename/drop-column commits are metadata-only (zero new files):
      // they pass through as empty batches, and the era machinery in
      // planInputPartitions maps files committed AFTER them back to the
      // stream's pinned naming by field id
      val isAppend = snap.operation == "append" || snap.operation.startsWith("evolve") ||
        snap.operation == "set-properties" || snap.operation == "create" ||
        snap.operation == "rename-column" || snap.operation == "drop-column"
      def byEra(groups: Seq[graft.meta.FileGroup], files: Seq[DataFile] => Seq[DataFile]) =
        groups.map(g => snap.writeSchemaFor(g.seq) -> files(g.files))
          .filter(_._2.nonEmpty)
      if (v == 0) Some(byEra(snap.fileGroups, identity))
      else if (!isAppend) None
      else {
        val prev = tbl.snapshotAt(v - 1)
        val prevManifests = prev.manifestPaths
        val currManifests = snap.manifestPaths
        val droppedPaths = prev.fileGroups
          .filterNot(g => currManifests.contains(g.manifest))
          .flatMap(_.files).map(_.path).toSet
        Some(byEra(
          snap.fileGroups.filterNot(g => prevManifests.contains(g.manifest)),
          _.filterNot(f => droppedPaths.contains(f.path))))
      }
    } catch {
      case e @ (_: java.nio.file.NoSuchFileException | _: java.io.FileNotFoundException) =>
        // the checkpointed range was removed by expire_snapshots: the
        // data can never be replayed — say so instead of surfacing a
        // bare missing-file error from the metadata log (the parent
        // snapshot of the manifest diff can be the missing one, so the
        // guard covers the whole computation)
        throw new IllegalStateException(
          s"graft stream over ${tbl.tableDir} needs version $v, which has " +
            "been removed by expire_snapshots; the checkpointed range is " +
            "gone and cannot be replayed. Restart with a fresh checkpoint " +
            "(optionally pinning streamStartVersion to a live version).", e)
    }

  private def addedBetween(from: Int, to: Int): Seq[(StructType, Seq[DataFile])] = {
    val out = Seq.newBuilder[(StructType, Seq[DataFile])]
    var v = math.max(from + 1, 0)
    while (v <= to) {
      appendedAt(v) match {
        case Some(eraFiles) => out ++= eraFiles
        case None =>
          val snap = tbl.snapshotAt(v)
        // delete/update/compact/cluster only churn EXISTING rows, so
        // skipping them is the documented at-least-once trade. upsert and
        // overwrite also INSERT rows — skipping those is silent data
        // loss, so they abort regardless of streamSkipRewrites.
        val pureRewrite = Set("delete", "update", "compact", "cluster")(snap.operation)
        if (!skipRewrites || !pureRewrite) {
          val hint =
            if (pureRewrite)
              "set streamSkipRewrites=true to skip pure-rewrite commits " +
                "(appends stay exact; later deletes/updates are not replayed)"
            else
              s"'${snap.operation}' inserts new rows and cannot be skipped " +
                "(streamSkipRewrites only skips delete/update/compact/cluster); " +
                "restart the stream from a later streamStartVersion"
          throw new IllegalStateException(
            s"graft stream over ${tbl.tableDir} hit a non-append commit " +
              s"(v$v: ${snap.operation}); " + hint)
        }
      }
      v += 1
    }
    out.result()
  }

  /** Era-aware scan: the requested fields read under their PHYSICAL
    * names in `writeSchema` (matched by field id), so the emitted rows
    * stay positionally identical to the stream's pinned
    * `readDataSchema` across renames. A column dropped mid-stream
    * null-fills in post-drop files. Filters push into EVERY era with
    * their references translated to the era's physical names
    * ([[FilterRename]]) — row-group pruning is speedup only, Spark
    * re-applies every filter.
    */
  private def scanFor(writeSchema: StructType, files: Seq[DataFile]): ParquetScan = {
    val spark = tbl.spark
    val mapping = tbl.nameMapping(writeSchema, readDataSchema)
    val physSchema = mapping match {
      case None => readDataSchema
      case Some(m) => StructType(m.map { case (n, f) =>
        StructField(n, f.dataType, nullable = true) })
    }
    // filters may reference unprojected columns: translate through the
    // FULL pinned schema's era mapping, not the pruned one
    val filterMap = FilterRename.eraMap(writeSchema,
      tbl.nameMapping(writeSchema, pinnedSchema), pinnedSchema)
    val pushable = pushed.flatMap(FilterRename(_, filterMap))
    // FILE-level zone-map pruning from the translated conjunction (all
    // filters stay residual above, so skipping provably-empty files is
    // pure speedup) — a filtered stream over a clustered table then
    // reads only the new files that can match
    val pruned =
      if (pushable.isEmpty) files
      else {
        val preds = pushable.flatMap(FilterSql.toSql)
        if (preds.isEmpty) files
        else {
          val expr = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
            .parseExpression(preds.mkString("(", ") AND (", ")"))
          files.filter(f =>
            graft.table.StatsPruner.evaluate(f, writeSchema, expr).may)
        }
      }
    ParquetScan(
      sparkSession = spark,
      hadoopConf = GraftSqlShim.newHadoopConf(spark),
      fileIndex = new GraftFileIndex(spark, tbl.tableDir, pruned, writeSchema),
      dataSchema = writeSchema,
      readDataSchema = physSchema,
      readPartitionSchema = StructType(Nil),
      pushedFilters = pushable, // row-group pruning inside parquet
      options = CaseInsensitiveStringMap.empty())
  }
}

/** A file task tagged with the reader factory that knows its era's
  * physical read schema — what lets one micro-batch span files written
  * under different column namings.
  */
private[connector] final case class EraPartition(
    delegate: InputPartition,
    factory: PartitionReaderFactory) extends InputPartition {
  override def preferredLocations(): Array[String] = delegate.preferredLocations()
}

/** Pure dispatcher to each partition's embedded era factory —
  * preserves the vectorized columnar path (unlike the CDC wrapper,
  * nothing is appended per row here).
  */
private[connector] final class EraDispatchReaderFactory extends PartitionReaderFactory {
  private def era(p: InputPartition): EraPartition = p match {
    case e: EraPartition => e
    case other => throw new IllegalStateException(s"unexpected partition kind: $other")
  }
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val e = era(p); e.factory.createReader(e.delegate)
  }
  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] = {
    val e = era(p); e.factory.createColumnarReader(e.delegate)
  }
  override def supportColumnarReads(p: InputPartition): Boolean = {
    val e = era(p); e.factory.supportColumnarReads(e.delegate)
  }
}
