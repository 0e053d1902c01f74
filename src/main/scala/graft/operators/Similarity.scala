package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers:
  *   - [[bruteForceTopK]] — exact cosine top-k: one codegen'd pass over
  *     all vectors + a TakeOrdered (no shuffle of the vectors
  *     themselves). The correctness baseline and the right choice when
  *     the query set is small.
  *   - [[lshTopK]] — approximate: random-hyperplane buckets prune the
  *     candidate set before scoring; at 100 TB only the query's bucket
  *     (plus multiprobe neighbors) is read, and bucketing can be
  *     precomputed and partitioned on (an IVF-style layout).
  *
  * All math uses `zip_with`/`aggregate` higher-order functions —
  * codegen'd, no UDF, accumulation in double.
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x))

  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0, lit(0.0)).otherwise(d / nn)
  }

  /** Exact top-k by cosine against a literal query vector. */
  def bruteForceTopK(df: DataFrame, vecCol: String, idCol: String,
                     query: Seq[Float], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    df.select(col(idCol), cosine(col(vecCol), q).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Approximate top-k: score only vectors that share the query's
    * hyperplane bucket (or a `multiprobe` single-bit-flip neighbor
    * bucket) in at least one of `tables` independent hash tables.
    * Multiple tables are the standard LSH recall lever — a true
    * neighbor split from the query by one unlucky plane in table 0
    * still collides in table 1 — and cost stays
    * ~tables * (1+multiprobe) / 2^planes of the data, never widening
    * toward a full scan the way piling on probes does. All tables are
    * bucketed in ONE corpus pass ([[Dedup.hyperplaneTables]]); the
    * query's own buckets are plain driver math over the same hash
    * families — a scalar must never cost a Spark job on the ANN hot
    * path.
    */
  def lshTopK(df: DataFrame, vecCol: String, idCol: String,
              query: Seq[Float], k: Int, planes: Int = 6,
              multiprobe: Int = 2, tables: Int = 1): DataFrame = {
    val q = array(query.map(lit): _*)
    val bucketed = Dedup.hyperplaneTables(df, vecCol, idCol, planes, tables)
    val hitAnyTable: Column = (0 until tables).map { t =>
      val qBucket = hyperplaneBucketLocal(query, planes, planeOffset = t * planes)
      val probes: Seq[Long] =
        qBucket +: (0 until planes).take(multiprobe).map(b => qBucket ^ (1L << b))
      col(s"bucket_$t").isin(probes: _*)
    }.reduce(_ || _)
    val hits = bucketed.where(hitAnyTable).withColumnRenamed("id", "_hit_id")
    df.join(hits.select(col("_hit_id")), col(idCol) === col("_hit_id"), "left_semi")
      .select(col(idCol), cosine(col(vecCol), q).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Driver-side [[Dedup.hyperplaneBucket]] of a literal vector: the
    * identical xxhash64-derived plane components (evaluated through
    * Catalyst's own XxHash64, no Spark job) and the identical
    * ascending-dimension accumulation order.
    */
  private def hyperplaneBucketLocal(query: Seq[Float], planes: Int,
                                    planeOffset: Int = 0): Long = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var dotAcc = 0.0
      var d = 0
      while (d < query.length) {
        // seed 42L = the default of the SQL xxhash64 function the column
        // form uses
        val h = XxHash64(Seq(Literal(planeOffset + p), Literal(d)), 42L)
          .eval(null).asInstanceOf[Long]
        dotAcc += query(d).toDouble * ((((h % 1000L) + 1000L) % 1000L).toDouble / 1000.0 - 0.5)
        d += 1
      }
      bucket = bucket * 2 + (if (dotAcc >= 0) 1L else 0L)
      p += 1
    }
    bucket
  }

  /** IVF (inverted-file) index: a k-means coarse quantizer assigns each
    * vector to one of `nlist` cells. At query time only the `nprobe`
    * nearest cells are scanned — the classic large-scale ANN layout. At
    * 100 TB the assigned table would be written partitioned by `_cell`
    * so a probe reads nprobe partitions, not the corpus.
    *
    * Returns (assigned corpus with a `_cell` column, centroids).
    */
  def ivfIndex(df: DataFrame, vecCol: String, idCol: String,
               nlist: Int, seed: Long = 42L,
               trainFraction: Double = 1.0): (DataFrame, Array[Array[Double]]) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    require(trainFraction > 0 && trainFraction <= 1.0, "trainFraction in (0, 1]")
    val prepped = df.select(col(idCol), col(vecCol),
      array_to_vector(col(vecCol).cast("array<double>")).as("_features"))
    // quantizer training is the standard place to subsample (FAISS-style):
    // centroids from a deterministic hash sample of the corpus, then the
    // FULL corpus assigned below — at 10^9 vectors k-means never needs
    // more than a few hundred points per centroid to converge
    val trainSet =
      if (trainFraction >= 1.0) prepped
      else prepped.where(
        // never floor to an empty sample: any positive fraction keeps
        // at least the 1-per-mille bucket
        pmod(xxhash64(col(idCol)), lit(1000L)) <
          math.max(1L, math.round(trainFraction * 1000)))
    val model = new KMeans()
      .setK(nlist).setSeed(seed).setMaxIter(10).setFeaturesCol("_features")
      .fit(trainSet)
    val assigned = model.transform(prepped)
      .withColumnRenamed(model.getPredictionCol, "_cell")
      .drop("_features")
    (assigned, model.clusterCenters.map(_.toArray))
  }

  /** Probe an IVF index: scan the `nprobe` cells whose centroids are
    * closest (by cosine) to the query, then exact-score within them.
    */
  def ivfTopK(assigned: DataFrame, centroids: Array[Array[Double]],
              vecCol: String, idCol: String, query: Seq[Float],
              k: Int, nprobe: Int): DataFrame = {
    val q = query.map(_.toDouble).toArray
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
    }
    val probes = centroids.zipWithIndex
      .sortBy { case (c, _) => -cos(c, q) }.take(math.max(1, nprobe)).map(_._2)
    val qCol = array(query.map(lit): _*)
    assigned
      .where(col("_cell").isin(probes.map(Integer.valueOf): _*))
      .select(col(idCol), cosine(col(vecCol), qCol).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Persist an IVF index INTO a graft table partitioned by `_cell` —
    * the 100 TB layout [[ivfIndex]]'s doc promises, actually wired
    * through the engine's table format: the assigned corpus lands one
    * file per cell per commit (hash write distribution), centroids ride
    * in table properties, and a probe becomes a PARTITION-PRUNED scan
    * that reads `nprobe` cells' files, never the corpus. Index refresh
    * is a normal table write (append/overwrite); time travel and
    * maintenance apply like any other table.
    */
  def writeIvfIndexTable(cat: graft.table.GraftCatalog,
                         ident: graft.table.TableIdent,
                         df: DataFrame, vecCol: String, idCol: String,
                         nlist: Int, seed: Long = 42L,
                         trainFraction: Double = 1.0): graft.table.GraftTable = {
    val (assigned, centroids) = ivfIndex(df, vecCol, idCol, nlist, seed, trainFraction)
    val tbl = cat.ensure(ident, Some("_cell"))
    tbl.append(assigned, Map(
      CentroidsProp -> centroids.map(_.mkString(",")).mkString(";"),
      VecColProp -> vecCol,
      IdColProp -> idCol))
    tbl
  }

  // persisted-index table properties
  val CentroidsProp = "graft.ivf.centroids"
  val VecColProp = "graft.ivf.vec-col"
  val IdColProp = "graft.ivf.id-col"
  val SourceProp = "graft.ivf.source" // "<ns>/<table>" under the same warehouse
  val AppliedProp = "graft.ivf.applied-version"
  /** Opt-in auto-escalation: when "true", [[refreshIvfIndexTable]]
    * checks the manifest-only [[ivfIndexStats]] after applying its
    * slice and escalates to [[rebuildIvfIndexTable]] the moment
    * `rebuildRecommended` flags — no operator watching the dashboard
    * required. Set per index table (or pass autoRebuild = true).
    */
  val AutoRebuildProp = "graft.ann.auto-rebuild"

  /** Nearest-centroid cell id as a pure codegen'd expression — argmin
    * squared Euclidean distance, lowest index on ties (the same rule
    * KMeans assignment applies). `|x|²` is common to every candidate,
    * so each cell costs one dot product against a literal centroid:
    * `argmin_j (|c_j|² − 2·x·c_j)`. No ML model object is needed, so
    * REFRESH can assign new vectors from the stored centroid strings
    * alone — the property that makes the index maintainable without
    * retraining.
    */
  def cellExpr(vec: Column, centroids: Array[Array[Double]]): Column = {
    val cands = centroids.zipWithIndex.map { case (c, j) =>
      val cLit = array(c.map(lit): _*)
      val c2 = c.map(x => x * x).sum
      struct((lit(c2) - lit(2.0) * dot(vec, cLit)).as("d"), lit(j).as("i"))
    }
    (if (cands.length == 1) cands.head else least(cands.toIndexedSeq: _*))
      .getField("i")
  }

  /** Build a persisted IVF index ONCE over a graft corpus table: train
    * the coarse quantizer at the corpus's current version, assign every
    * vector through [[cellExpr]] (the SAME rule refresh uses — no
    * build/refresh assignment skew), and commit the assigned rows with
    * the centroids, source identity, and applied source version in the
    * table properties. From then on the index is maintained by
    * [[refreshIvfIndexTable]] — never rebuilt per query.
    */
  def buildIvfIndexTable(cat: graft.table.GraftCatalog,
                         srcIdent: graft.table.TableIdent,
                         indexIdent: graft.table.TableIdent,
                         vecCol: String, idCol: String,
                         nlist: Int, seed: Long = 42L,
                         trainFraction: Double = 1.0): graft.table.GraftTable = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val src = cat.load(srcIdent)
    val cur = src.currentOrFail().version
    val corpus = src.scanAsOfVersion(cur).select(col(idCol), col(vecCol))
    val prepped = corpus.select(col(idCol),
      array_to_vector(col(vecCol).cast("array<double>")).as("_features"))
    val trainSet =
      if (trainFraction >= 1.0) prepped
      else prepped.where(pmod(xxhash64(col(idCol)), lit(1000L)) <
        math.max(1L, math.round(trainFraction * 1000)))
    val model = new KMeans()
      .setK(nlist).setSeed(seed).setMaxIter(10).setFeaturesCol("_features")
      .fit(trainSet)
    val centroids = model.clusterCenters.map(_.toArray)
    val assigned = corpus.withColumn("_cell", cellExpr(col(vecCol), centroids))
    val tbl = cat.ensure(indexIdent, Some("_cell"))
    tbl.append(assigned, Map(
      CentroidsProp -> centroids.map(_.mkString(",")).mkString(";"),
      VecColProp -> vecCol,
      IdColProp -> idCol,
      SourceProp -> s"${srcIdent.namespace}/${srcIdent.name}",
      AppliedProp -> cur.toString))
    tbl
  }

  /** REFRESH a persisted IVF index from its corpus's changelog —
    * O(changes since last refresh), never O(corpus), and NO retraining:
    * the slice `(applied, head]` is netted per key (newest version
    * wins, insert beats delete), inserted vectors are assigned to the
    * EXISTING centroids via [[cellExpr]], and deletes + upserts land in
    * ONE [[graft.table.GraftTable.applyNetChanges]] commit that also
    * advances the applied-version marker under the CAS — exactly-once
    * under racing refreshers, the replicate/MV marker pattern. Returns
    * (from, to, action).
    *
    * With `autoRebuild` (or the [[AutoRebuildProp]] table property set
    * "true"), the refresh consults [[ivfIndexStats]] after its slice
    * lands and ESCALATES to [[rebuildIvfIndexTable]] when the skew flag
    * fires — action "rebuild", marker at the corpus head. One refresh
    * call then suffices to land a rebalanced index on a drifted corpus.
    */
  def refreshIvfIndexTable(cat: graft.table.GraftCatalog,
                           indexIdent: graft.table.TableIdent,
                           autoRebuild: Boolean = false): (Int, Int, String) = {
    import org.apache.spark.sql.expressions.Window
    val tbl = cat.load(indexIdent)
    val props = tbl.currentOrFail().properties
    val centroids = props(CentroidsProp).split(";").map(_.split(",").map(_.toDouble))
    val vecCol = props(VecColProp)
    val idCol = props(IdColProp)
    val applied = props.getOrElse(AppliedProp,
      throw new IllegalArgumentException(
        s"$indexIdent carries no applied-version marker — built by " +
          "writeIvfIndexTable? rebuild it with buildIvfIndexTable to make " +
          "it refreshable")).toInt
    val srcIdent = props(SourceProp).split("/") match {
      case Array(ns, t) => graft.table.TableIdent(ns, t)
      case other => sys.error(s"bad ivf source: ${other.mkString("/")}")
    }
    val src = cat.load(srcIdent)
    val to = src.currentOrFail().version
    // auto-escalation (opt-in per call or per table prop): AFTER the
    // slice lands — or immediately on an up-to-date index — consult the
    // manifest-only stats and retrain when the drift flag fires. The
    // frozen quantizer keeps assigning FIRST (the slice is O(changes)
    // either way and the rebuild derives from the head, so nothing is
    // applied twice), then the O(corpus) retrain swaps atomically.
    val autoOn = autoRebuild ||
      props.get(AutoRebuildProp).exists(_.equalsIgnoreCase("true"))
    def escalate(from: Int, action: String): (Int, Int, String) =
      if (autoOn && ivfIndexStats(cat, indexIdent).rebuildRecommended) {
        rebuildIvfIndexTable(cat, indexIdent)
        // a corpus whose intrinsic distribution keeps the skew flag up
        // even after retraining would otherwise pay a silent O(corpus)
        // rebuild on EVERY scheduled refresh — surface the loop so the
        // operator can raise the threshold or drop auto-rebuild
        val after = ivfIndexStats(cat, indexIdent)
        if (after.rebuildRecommended)
          graft.observability.Log.warn(
            "ivf auto-rebuild did not clear the skew flag — the corpus " +
              "distribution is intrinsically skewed; every auto-rebuild " +
              "refresh will retrain O(corpus) until auto_rebuild is " +
              "disabled or the skew threshold is raised",
            "index" -> indexIdent.toString, "skew" -> after.skew)
        (from, cat.load(indexIdent).currentOrFail()
          .properties(AppliedProp).toInt, "rebuild")
      } else (from, to, action)
    if (applied >= to) return escalate(applied, "noop")
    // data-only feed: a compaction of the corpus must not re-assign
    // every vector — maintenance commits change no visible row
    val changes = src.scanDataChangesBetween(applied, to)
      .select(col(idCol), col(vecCol), col("_change_type"), col("_commit_version"))
    val w = Window.partitionBy(col(s"`$idCol`"))
      .orderBy(col("_commit_version").desc,
        when(col("_change_type") === "insert", 1).otherwise(0).desc)
    val last = changes.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1).localCheckpoint()
    if (last.isEmpty) {
      tbl.updateProperties(Map(AppliedProp -> to.toString),
        requireParentProps = Map(AppliedProp -> applied.toString))
      return escalate(applied, "empty")
    }
    val dels = last.where(col("_change_type") === "delete")
      .select(col(s"`$idCol`"))
    val ups = last.where(col("_change_type") === "insert")
      .select(col(s"`$idCol`"), col(s"`$vecCol`"))
      .withColumn("_cell", cellExpr(col(s"`$vecCol`"), centroids))
    tbl.applyNetChanges(dels, ups, Seq(idCol),
      props = Map(AppliedProp -> to.toString),
      requireParentProps = Map(AppliedProp -> applied.toString))
    escalate(applied, "incremental")
  }

  /** Per-cell occupancy of a persisted IVF index, from MANIFEST
    * metadata only — the `_cell` partition tuples and per-file row
    * counts; no job runs. The lifecycle dashboard numbers: refresh
    * assigns to FROZEN centroids, so as the corpus drifts, hot cells
    * grow without bound (probe cost ∝ the probed cells' rows) and
    * recall decays; `skew` (max cell rows / mean over populated
    * cells) is the rebuild trigger a 100 TB operator watches.
    */
  final case class IvfIndexStats(cells: Int, populatedCells: Int,
                                 rows: Long, maxCellRows: Long,
                                 meanCellRows: Double, skew: Double,
                                 appliedVersion: Int, sourceVersion: Int) {
    def versionsBehind: Int = math.max(0, sourceVersion - appliedVersion)
    /** max/mean ≥ 4 means a probe of the hot cell reads ≥4× its fair
      * share — the drift signature (frozen centroids no longer tile
      * the corpus); rebuild to restore balanced probes and recall.
      */
    def rebuildRecommended: Boolean = skew >= 4.0
  }

  def ivfIndexStats(cat: graft.table.GraftCatalog,
                    indexIdent: graft.table.TableIdent): IvfIndexStats = {
    val tbl = cat.load(indexIdent)
    val snap = tbl.currentOrFail()
    val props = snap.properties
    val nlist = props(CentroidsProp).split(";").length
    val perCell: Map[String, Long] = snap.files
      .groupBy(_.partitionValues.flatMap(_.get("_cell")).flatten.getOrElse(""))
      .map { case (c, fs) => c -> fs.map(_.rows).sum }
    val rows = perCell.values.sum
    val maxRows = if (perCell.isEmpty) 0L else perCell.values.max
    val mean = if (perCell.isEmpty) 0.0 else rows.toDouble / perCell.size
    val srcV = props(SourceProp).split("/") match {
      case Array(ns, t) if cat.exists(graft.table.TableIdent(ns, t)) =>
        cat.load(graft.table.TableIdent(ns, t)).currentOrFail().version
      case _ => -1
    }
    IvfIndexStats(nlist, perCell.size, rows, maxRows, mean,
      if (mean == 0.0) 0.0 else maxRows / mean,
      props.getOrElse(AppliedProp, "-1").toInt, srcV)
  }

  /** REBUILD a persisted IVF index: retrain the coarse quantizer from
    * the corpus AS IT IS NOW, reassign every vector, and swap rows +
    * centroids + marker in ONE overwrite commit — probes running
    * against the old snapshot are unaffected mid-build, and the next
    * probe plans against the new tiling. This is the answer to
    * centroid drift: [[refreshIvfIndexTable]] keeps the index CURRENT
    * in O(changes) but never moves the centroids, so when
    * [[ivfIndexStats]] reports skew, this O(corpus) retrain restores
    * balanced cells and recall. A refresh racing the rebuild aborts at
    * its CAS (the overwrite rewrote the marker); a rebuild always
    * wins (it derives from the head, not the marker).
    */
  def rebuildIvfIndexTable(cat: graft.table.GraftCatalog,
                           indexIdent: graft.table.TableIdent,
                           nlist: Option[Int] = None, seed: Long = 42L,
                           trainFraction: Double = 1.0): graft.table.GraftTable = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val tbl = cat.load(indexIdent)
    val props = tbl.currentOrFail().properties
    val vecCol = props(VecColProp)
    val idCol = props(IdColProp)
    val k = nlist.getOrElse(props(CentroidsProp).split(";").length)
    val srcIdent = props(SourceProp).split("/") match {
      case Array(ns, t) => graft.table.TableIdent(ns, t)
      case other => sys.error(s"bad ivf source: ${other.mkString("/")}")
    }
    val src = cat.load(srcIdent)
    val cur = src.currentOrFail().version
    val corpus = src.scanAsOfVersion(cur).select(col(idCol), col(vecCol))
    val prepped = corpus.select(col(idCol),
      array_to_vector(col(vecCol).cast("array<double>")).as("_features"))
    val trainSet =
      if (trainFraction >= 1.0) prepped
      else prepped.where(pmod(xxhash64(col(idCol)), lit(1000L)) <
        math.max(1L, math.round(trainFraction * 1000)))
    val model = new KMeans()
      .setK(k).setSeed(seed).setMaxIter(10).setFeaturesCol("_features")
      .fit(trainSet)
    val centroids = model.clusterCenters.map(_.toArray)
    val assigned = corpus.withColumn("_cell", cellExpr(col(vecCol), centroids))
    tbl.overwrite(assigned, Map(
      CentroidsProp -> centroids.map(_.mkString(",")).mkString(";"),
      AppliedProp -> cur.toString))
    tbl
  }

  /** Probe a persisted IVF index table: nearest `nprobe` centroids from
    * the table's own properties, then a partition-pruned scan of just
    * those cells, exact-scored. The file-pruning work happens driver-
    * side in the table's metadata — no job touches non-probed cells.
    */
  def ivfTopKFromTable(tbl: graft.table.GraftTable, query: Seq[Float],
                       k: Int, nprobe: Int): DataFrame = {
    val props = tbl.currentOrFail().properties
    val centroids = props("graft.ivf.centroids")
      .split(";").map(_.split(",").map(_.toDouble))
    val vecCol = props("graft.ivf.vec-col")
    val idCol = props("graft.ivf.id-col")
    val q = query.map(_.toDouble).toArray
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
    }
    val probes = centroids.zipWithIndex
      .sortBy { case (c, _) => -cos(c, q) }.take(math.max(1, nprobe)).map(_._2)
    val qCol = array(query.map(lit): _*)
    tbl.scanWhere(s"_cell IN (${probes.mkString(", ")})")
      .select(col(idCol), cosine(col(vecCol), qCol).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Int8 scalar quantization of an embedding column — the 100 TB
    * memory/IO lever (FAISS SQ8 shape): per-vector symmetric scale
    * `max|x| / 127`, codes stored as `array<tinyint>` — 4× smaller
    * than float32 on disk and over the wire. Cosine is scale-invariant
    * under positive per-vector scaling, so the scoring path runs on
    * the RAW CODES with no dequantization at all; `scaleCol` is kept
    * for dot-product/L2 consumers that do need magnitudes. Zero
    * vectors quantize to zero codes with scale 1 (no division hazard).
    * All math is `transform`/`aggregate` higher-order functions —
    * codegen'd, no UDF.
    */
  def quantizeInt8(df: DataFrame, vecCol: String,
                   codesCol: String = "_q",
                   scaleCol: String = "_qscale"): DataFrame = {
    val maxAbs = aggregate(transform(col(vecCol), x => abs(x.cast("double"))),
      lit(0.0), (acc, x) => greatest(acc, x))
    df.withColumn(scaleCol,
        when(maxAbs === 0, lit(1.0)).otherwise(maxAbs / 127.0).cast("double"))
      .withColumn(codesCol,
        transform(col(vecCol),
          x => round(x.cast("double") / col(scaleCol)).cast("tinyint")))
  }

  /** Two-stage quantized top-k: rank ALL vectors by cosine over their
    * int8 codes (the cheap pass — reads a quarter of the bytes an
    * exact scan does when the codes are materialized columnar), keep
    * `refine * k` candidates, rescore those exactly on the float
    * vectors, emit k. With int8's ~1e-2 worst-case cosine error and a
    * refine factor of a few, the refined top-k equals the exact top-k
    * in practice — q86 gates that against the brute-force oracle. At
    * scale the codes column would be written alongside the vectors at
    * ingest (one [[quantizeInt8]] pass) so query time pays only the
    * code scan + a k·refine-row exact rescore.
    */
  def quantizedTopK(df: DataFrame, vecCol: String, idCol: String,
                    query: Seq[Float], k: Int, refine: Int = 4): DataFrame = {
    require(refine >= 1, "refine factor must be >= 1")
    // query codes computed driver-side with the same rule; the query's
    // own scale cancels in cosine like every other vector's
    val qmax = query.foldLeft(0.0)((m, v) => math.max(m, math.abs(v.toDouble)))
    val qscale = if (qmax == 0) 1.0 else qmax / 127.0
    val qCodes = array(query.map(v => lit(math.round(v / qscale).toByte)): _*)
    val candidates = quantizeInt8(df, vecCol)
      .select(col(idCol), col(vecCol), cosine(col("_q"), qCodes).as("_qscore"))
      .orderBy(col("_qscore").desc, col(idCol))
      .limit(k * refine)
    val qv = array(query.map(lit): _*)
    candidates.select(col(idCol), cosine(col(vecCol), qv).as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** All-pairs top-k neighbor join for a (small, broadcastable) query
    * set: each query row gets its k nearest corpus rows. The corpus
    * side streams; queries broadcast.
    */
  def knnJoin(corpus: DataFrame, queries: DataFrame, vecCol: String,
              idCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    import org.apache.spark.sql.expressions.Window
    val scored = c.crossJoin(broadcast(q))
      .select(col("query_id"), col("corpus_id"), cosine(col("cv"), col("qv")).as("score"))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
