package graft.queries

import java.nio.file.Files

import QueryHelpers._

import graft.config.{LoaderConfig, WriteMode}
import graft.loader.Loader
import graft.sources.JsonIngest
import graft.table.{GraftCatalog, TableIdent}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Write-path round-trips: every query builds a scratch graft table in
  * a temp warehouse, drives one table operation (append / overwrite /
  * upsert / delete-where / schema evolution / time travel / compaction
  * / snapshot expiry / commit-interval batching / messy-JSON ingest),
  * scans the result back, and aggregates it so the DuckDB oracle can
  * verify the END STATE purely from the source parquet. This is how
  * the reference's write strategies become oracle-checkable
  * (`core/strategies.py:28-99`, `examples/advanced_scenarios.py`).
  */
object TableQueries {

  private def freshCatalog(s: SparkSession): GraftCatalog =
    GraftCatalog(s, Files.createTempDirectory("graft-wh").toString)

  val queries: Map[String, Q] = Map(

    // W1 append across two batches == full source
    "q40_roundtrip_append" -> Q(
      (s, dir) => {
        val cat = freshCatalog(s)
        val ident = TableIdent("bench", "li_append")
        val li = t(s, dir, "lineitem")
        val tbl = cat.ensure(ident)
        tbl.append(li.where(col("l_orderkey") % 2 === 0))
        tbl.append(li.where(col("l_orderkey") % 2 =!= 0))
        tbl.scan()
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("l_returnflag"))
      },
      Some(s"""SELECT l_returnflag, COUNT(*) AS n, ${DSUM("l_quantity")} AS sum_qty
              |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // W2 overwrite: second write replaces the first entirely
    "q41_roundtrip_overwrite" -> Q(
      (s, dir) => {
        val cat = freshCatalog(s)
        val ident = TableIdent("bench", "ord_ow")
        val o = t(s, dir, "orders")
        val tbl = cat.ensure(ident)
        tbl.append(o.where(col("o_orderstatus") === "F"))
        tbl.overwrite(o.where(col("o_orderstatus") === "O"))
        tbl.scan()
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderstatus"))
      },
      Some(s"""SELECT o_orderstatus, COUNT(*) AS n, ${DSUM("o_totalprice")} AS total
              |FROM orders WHERE o_orderstatus = 'O'
              |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // W4/J1 upsert: matched keys updated, unmatched inserted
    "q42_roundtrip_upsert" -> Q(
      (s, dir) => {
        val cat = freshCatalog(s)
        val ident = TableIdent("bench", "ord_up")
        val o = t(s, dir, "orders")
        val tbl = cat.ensure(ident)
        tbl.append(o.where(col("o_orderkey") % 2 === 0))
        val source = o.where(col("o_orderkey") % 3 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
          .withColumn("o_orderpriority", lit("9-UPSERTED"))
        tbl.upsert(source, Seq("o_orderkey"))
        tbl.scan()
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderpriority"))
      },
      Some(s"""WITH source AS (
              |  SELECT o_orderkey, o_totalprice + 1000.0 AS o_totalprice,
              |         '9-UPSERTED' AS o_orderpriority
              |  FROM orders WHERE o_orderkey % 3 = 0),
              |target AS (SELECT o_orderkey, o_totalprice, o_orderpriority
              |  FROM orders WHERE o_orderkey % 2 = 0),
              |merged AS (
              |  SELECT * FROM source
              |  UNION ALL
              |  SELECT * FROM target WHERE o_orderkey NOT IN (SELECT o_orderkey FROM source))
              |SELECT o_orderpriority, COUNT(*) AS n, ${DSUM("o_totalprice")} AS total
              |FROM merged GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // W3 delete-where on a month-partitioned table: whole partitions
    // drop without a rewrite; the boundary partition rewrites
    "q43_roundtrip_delete" -> Q(
      (s, dir) => {
        val cat = freshCatalog(s)
        val ident = TableIdent("bench", "li_del")
        val li = t(s, dir, "lineitem")
        val tbl = cat.ensure(ident, Some("month(l_shipdate)"))
        tbl.append(li)
        tbl.deleteWhere("l_shipdate < '1997-06-01'")
        tbl.scan()
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("sum_price"))
          .orderBy(col("l_returnflag"))
      },
      Some(s"""SELECT l_returnflag, COUNT(*) AS n, ${DSUM("l_extendedprice")} AS sum_price
              |FROM lineitem WHERE NOT (l_shipdate < TIMESTAMP '1997-06-01')
              |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // CDC changelog over an append/append/delete history: per-commit
    // insert/delete row effects. The delete predicate is month-aligned
    // on a month-partitioned table, so commit 2 is whole-partition
    // drops — its delete side is exactly the predicate's rows and it
    // has no rewrite-insert side, which is what makes the changelog
    // SQL-expressible from the source parquet alone
    "q83_changelog" -> Q(
      (s, dir) => {
        val cat = freshCatalog(s)
        val ident = TableIdent("bench", "li_cdc")
        val li = t(s, dir, "lineitem")
        val tbl = cat.ensure(ident, Some("month(l_shipdate)"))
        tbl.append(li.where(col("l_shipdate") < "1997-01-01"))
        tbl.append(li.where(col("l_shipdate") >= "1997-01-01"))
        tbl.deleteWhere("l_shipdate < '1997-06-01'")
        tbl.scanChangesBetween(0, 2)
          .groupBy(col("_commit_version"), col("_change_type"))
          .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("total"))
          .orderBy(col("_commit_version"), col("_change_type"))
      },
      Some(s"""SELECT 1 AS _commit_version, 'insert' AS _change_type,
              |       COUNT(*) AS n, ${DSUM("l_extendedprice")} AS total
              |FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              |UNION ALL
              |SELECT 2, 'delete', COUNT(*), ${DSUM("l_extendedprice")}
              |FROM lineitem WHERE l_shipdate < TIMESTAMP '1997-06-01'
              |ORDER BY _commit_version, _change_type""".stripMargin)),

    // CDC replication capstone: bootstrap a replica from the source's
    // v0 snapshot, apply the whole changelog (append rewrite-upsert,
    // partial-file delete) as ONE net-effect batch, and verify the
    // replica's end state from the source parquet alone — gates the
    // changes-feed + net-apply + keyed-delete + upsert composition
    "q89_cdc_replication" -> Q(
      (s, dir) => {
        val cat = freshCatalog(s)
        val o = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
        val src = cat.ensure(TableIdent("bench", "ord_cdc_src"))
        src.append(o.where(col("o_orderkey") % 2 === 0))          // v0
        src.upsert(o.where(col("o_orderkey") % 3 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1000.0),
          Seq("o_orderkey"))                                       // v1
        src.deleteWhere("o_orderkey % 5 = 0")                      // v2
        val replica = cat.ensure(TableIdent("bench", "ord_cdc_rep"))
        replica.append(src.scanAsOfVersion(0))                     // bootstrap
        graft.streaming.GraftStream.applyChangesBatch(
          src.scanChangesBetween(0, src.currentOrFail().version),
          replica, Seq("o_orderkey"))
        replica.scan()
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      },
      Some(s"""WITH target AS (
              |  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0),
              |source AS (
              |  SELECT o_orderkey, o_totalprice + 1000.0 AS o_totalprice
              |  FROM orders WHERE o_orderkey % 3 = 0),
              |merged AS (
              |  SELECT * FROM source
              |  UNION ALL
              |  SELECT * FROM target
              |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM source)),
              |final AS (SELECT * FROM merged WHERE o_orderkey % 5 <> 0)
              |SELECT COUNT(*) AS n, ${DSUM("o_totalprice")} AS total FROM final""".stripMargin)),

    // Keyed bulk delete: a key-set frame (the opt-out-list shape)
    // removes exactly its matches via anti-join rewrite
    "q87_delete_by_keys" -> Q(
      (s, dir) => {
        val cat = freshCatalog(s)
        val ident = TableIdent("bench", "ord_delkeys")
        val o = t(s, dir, "orders")
        val tbl = cat.ensure(ident)
        tbl.append(o)
        tbl.deleteByKeys(
          o.where(col("o_orderkey") % 5 === 0).select(col("o_orderkey")),
          Seq("o_orderkey"))
        tbl.scan()
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderstatus"))
      },
      Some(s"""SELECT o_orderstatus, COUNT(*) AS n, ${DSUM("o_totalprice")} AS total
              |FROM orders WHERE o_orderkey % 5 <> 0
              |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // Merge-on-read keyed delete: the scattered GDPR-shape delete
    // commits a key-file delete group and rewrites ZERO data files
    // (asserted in-plan — a rewrite fails the row, not just a spec);
    // scans anti-join the keys, a post-delete re-insert survives
    // (sequence ordering), and compaction folds everything back to the
    // copy-on-write state. Oracle recomputes the end state from the
    // source parquet alone.
    "q90_mor_delete" -> Q(
      (s, dir) => {
        val cat = freshCatalog(s)
        val ident = TableIdent("bench", "ord_mor")
        val o = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        val tbl = cat.ensure(ident)
        tbl.append(o.where(col("o_orderkey") % 2 === 0))
        tbl.append(o.where(col("o_orderkey") % 2 =!= 0))
        tbl.updateProperties(Map(graft.table.GraftTable.DeleteModeProp -> "mor"))
        val before = tbl.currentOrFail().files.map(_.path).toSet
        tbl.deleteByKeys(
          o.where(col("o_orderkey") % 7 === 0).select(col("o_orderkey")),
          Seq("o_orderkey"))
        val after = tbl.currentOrFail()
        require(after.files.map(_.path).toSet == before,
          "merge-on-read delete rewrote data files")
        require(after.deleteGroups.nonEmpty, "no delete group recorded")
        // rows re-inserted AFTER the delete must survive the anti-join
        tbl.append(o.where(col("o_orderkey") % 14 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 500.0))
        val expected = tbl.scan()
        val agg = (d: DataFrame) => d
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderstatus"))
        val morResult = agg(expected).collect()
        // compact applies + purges the delete groups; the state converges
        tbl.compact(2)
        require(tbl.currentOrFail().deleteGroups.isEmpty,
          "compaction left delete groups behind")
        val cowResult = agg(tbl.scan())
        require(java.util.Arrays.deepEquals(
          morResult.map(_.toSeq.toArray[Any]).toArray[AnyRef],
          cowResult.collect().map(_.toSeq.toArray[Any]).toArray[AnyRef]),
          "merge-on-read scan diverged from the compacted copy-on-write state")
        cowResult
      },
      Some(s"""WITH state AS (
              |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
              |  WHERE o_orderkey % 7 <> 0
              |  UNION ALL
              |  SELECT o_orderkey, o_orderstatus, o_totalprice + 500.0 FROM orders
              |  WHERE o_orderkey % 14 = 0)
              |SELECT o_orderstatus, COUNT(*) AS n, ${DSUM("o_totalprice")} AS total
              |FROM state GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // Merge-on-read predicate delete through the pure-SQL surface:
    // DELETE FROM records a predicate delete group (zero data IO) and
    // SELECT applies it via the resolution rule — the end state is
    // oracle-checked from raw parquet
    "q91_mor_sql" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq91").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq91", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq91.warehouse",
            Files.createTempDirectory("graft-mor-sql").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq91.bench")
        s.sql("DROP TABLE IF EXISTS graftq91.bench.li")
        s.sql("""CREATE TABLE graftq91.bench.li
                |(l_orderkey BIGINT, l_returnflag STRING, l_quantity DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        t(s, dir, "lineitem").createOrReplaceTempView("q91_src")
        s.sql("""INSERT INTO graftq91.bench.li
                |SELECT l_orderkey, l_returnflag, l_quantity FROM q91_src""".stripMargin)
        val cat = GraftCatalog(s, s.conf.get("spark.sql.catalog.graftq91.warehouse"))
        val tbl = cat.load(TableIdent("bench", "li"))
        val before = tbl.currentOrFail().files.map(_.path).toSet
        s.sql("DELETE FROM graftq91.bench.li WHERE l_quantity < 10")
        require(tbl.currentOrFail().files.map(_.path).toSet == before,
          "SQL merge-on-read delete rewrote data files")
        require(tbl.currentOrFail().deleteGroups.nonEmpty,
          "SQL DELETE recorded no delete group")
        s.sql("""SELECT l_returnflag, COUNT(*) AS n,
                |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
                |FROM graftq91.bench.li
                |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem WHERE l_quantity >= 10
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Merge-on-read upsert (the Iceberg MoR MERGE shape): the upsert
    // commits one append group + one equality-delete group at the same
    // sequence — zero target files rewritten (asserted in-plan) — and
    // the merged end state is oracle-checked from the source parquet
    // with the SAME oracle shape as the CoW upsert (q42): the two
    // execution strategies must be observationally identical
    "q94_mor_upsert" -> Q(
      (s, dir) => {
        val cat = freshCatalog(s)
        val ident = TableIdent("bench", "ord_mor_up")
        val o = t(s, dir, "orders")
        val tbl = cat.ensure(ident)
        tbl.append(o.where(col("o_orderkey") % 2 === 0))
        tbl.updateProperties(Map(graft.table.GraftTable.DeleteModeProp -> "mor"))
        val before = tbl.currentOrFail().files.map(_.path).toSet
        val source = o.where(col("o_orderkey") % 3 === 0)
          .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
          .withColumn("o_orderpriority", lit("9-UPSERTED"))
        tbl.upsert(source, Seq("o_orderkey"))
        val snap = tbl.currentOrFail()
        require(before.subsetOf(snap.files.map(_.path).toSet),
          "merge-on-read upsert rewrote target files")
        require(snap.deleteGroups.nonEmpty, "MoR upsert recorded no delete group")
        tbl.scan()
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderpriority"))
      },
      Some(s"""WITH source AS (
              |  SELECT o_orderkey, o_totalprice + 1000.0 AS o_totalprice,
              |         '9-UPSERTED' AS o_orderpriority
              |  FROM orders WHERE o_orderkey % 3 = 0),
              |target AS (SELECT o_orderkey, o_totalprice, o_orderpriority
              |  FROM orders WHERE o_orderkey % 2 = 0),
              |merged AS (
              |  SELECT * FROM source
              |  UNION ALL
              |  SELECT * FROM target WHERE o_orderkey NOT IN (SELECT o_orderkey FROM source))
              |SELECT o_orderpriority, COUNT(*) AS n, ${DSUM("o_totalprice")} AS total
              |FROM merged GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Type-widening schema evolution (int->long here): the table starts
    // with a narrow key, evolves the column IN PLACE (metadata-only —
    // zero files rewritten and the field ID kept, both asserted
    // in-plan), takes beyond-int values, and the end state aggregates
    // old-narrow + new-wide files through one widened read — oracle
    // recomputed from raw parquet
    "q93_type_widening" -> Q(
      (s, dir) => {
        import org.apache.spark.sql.types.{IntegerType, LongType, StructType}
        val cat = freshCatalog(s)
        val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
        val tbl = cat.ensure(TableIdent("bench", "ord_widen"))
        tbl.append(o.where(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey").cast(IntegerType).as("o_orderkey"),
            col("o_totalprice")))
        val before = tbl.currentOrFail()
        require(before.schema("o_orderkey").dataType == IntegerType, "setup")
        val fid = graft.table.Projection.fieldId(before.schema("o_orderkey"))
        tbl.evolveSchema(StructType(before.schema.fields.map(f =>
          if (f.name == "o_orderkey") f.copy(dataType = LongType) else f)))
        val evolved = tbl.currentOrFail()
        require(evolved.schema("o_orderkey").dataType == LongType, "widening did not apply")
        require(evolved.files.map(_.path) == before.files.map(_.path),
          "type widening rewrote data files (must be metadata-only)")
        require(graft.table.Projection.fieldId(evolved.schema("o_orderkey")) == fid,
          "widening changed the field ID")
        tbl.append(o.where(col("o_orderkey") % 2 =!= 0)
          .select((col("o_orderkey") + 3000000000L).as("o_orderkey"),
            (col("o_totalprice") + 1000.0).as("o_totalprice")))
        tbl.scan().agg(
          count(lit(1)).as("n"),
          sum(col("o_orderkey")).cast("double").as("sum_k"),
          dsum(col("o_totalprice")).as("total"))
      },
      Some(s"""WITH state AS (
              |  SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, o_totalprice
              |  FROM orders WHERE o_orderkey % 2 = 0
              |  UNION ALL
              |  SELECT o_orderkey + 3000000000, o_totalprice + 1000.0
              |  FROM orders WHERE o_orderkey % 2 <> 0)
              |SELECT COUNT(*) AS n, CAST(SUM(o_orderkey) AS DOUBLE) AS sum_k,
              |  ${DSUM("o_totalprice")} AS total
              |FROM state""".stripMargin)),

    // Multi-field partition spec (month × bucket — the canonical 100-TB
    // layout): write under both transforms, then a conjunctive
    // predicate plans strictly fewer files than either dimension alone
    // (asserted in-plan) and the pruned scan's aggregate is
    // oracle-checked from the raw parquet
    "q92_multi_partition" -> Q(
      (s, dir) => {
        val cat = freshCatalog(s)
        val ident = TableIdent("bench", "li_mp")
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_shipdate"), col("l_quantity"),
            col("l_extendedprice"))
        val tbl = cat.ensure(ident, Some("month(l_shipdate), bucket(4, l_orderkey)"))
        tbl.append(li)
        val total = tbl.currentOrFail().files.size
        val pred = "l_shipdate >= '1996-03-02' AND " +
          "l_shipdate < '1996-03-28' AND l_orderkey = 1L"
        val both = tbl.prunedFiles(pred).size
        val byMonth = tbl.prunedFiles(
          "l_shipdate >= '1996-03-02' AND l_shipdate < '1996-03-28'").size
        require(byMonth < total, s"month field failed to prune ($byMonth/$total)")
        require(both < byMonth || byMonth <= 1,
          s"bucket field failed to prune further ($both vs $byMonth)")
        tbl.scanWhere(
          "l_shipdate >= '1996-03-01' AND l_shipdate < '1996-04-01'")
          .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("total"))
      },
      Some(s"""SELECT COUNT(*) AS n, ${DSUM("l_extendedprice")} AS total
              |FROM lineitem
              |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
              |  AND l_shipdate < TIMESTAMP '1996-04-01'""".stripMargin)),

    // Multi-field storage-partitioned join, pure SQL: both sides share
    // the (grp, bucket(4, okey)) layout, so under the v2-bucketing conf
    // a join on BOTH partition sources plans with zero Exchange
    // (asserted in-plan — the co-located-join shape that avoids
    // shuffling two 100-TB tables) while the end state stays
    // source-derivable for the oracle.
    "q95_spj_multi" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq95").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq95", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq95.warehouse",
            Files.createTempDirectory("graft-spj-multi").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq95.bench")
        s.sql("DROP TABLE IF EXISTS graftq95.bench.fact")
        s.sql("DROP TABLE IF EXISTS graftq95.bench.dim")
        s.sql("""CREATE TABLE graftq95.bench.fact (grp BIGINT, okey BIGINT, qty DOUBLE)
                |PARTITIONED BY (grp, bucket(4, okey))""".stripMargin)
        s.sql("""CREATE TABLE graftq95.bench.dim (grp BIGINT, okey BIGINT, price DOUBLE)
                |PARTITIONED BY (grp, bucket(4, okey))""".stripMargin)
        t(s, dir, "lineitem").createOrReplaceTempView("q95_li")
        t(s, dir, "orders").createOrReplaceTempView("q95_ord")
        s.sql("""INSERT INTO graftq95.bench.fact
                |SELECT l_orderkey % 3, l_orderkey, l_quantity FROM q95_li""".stripMargin)
        s.sql("""INSERT INTO graftq95.bench.dim
                |SELECT o_orderkey % 3, o_orderkey, o_totalprice FROM q95_ord""".stripMargin)
        val prevB = s.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
        val prevT = s.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
        s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try {
          val j = s.sql(
            """SELECT f.grp, f.qty, d.price
              |FROM graftq95.bench.fact f
              |JOIN graftq95.bench.dim d ON f.grp = d.grp AND f.okey = d.okey""".stripMargin)
          require(!j.queryExecution.executedPlan.toString.contains("Exchange"),
            "multi-field SPJ planned a shuffle")
          // materialize WHILE the SPJ confs are active — the session
          // confs are restored below for the rest of the harness
          j.groupBy(col("grp"))
            .agg(count(lit(1)).as("n"), dsum(col("qty")).as("sum_qty"),
              dsum(col("price")).as("sum_price"))
            .orderBy(col("grp"))
            .localCheckpoint()
        } finally {
          prevB.fold(s.conf.unset("spark.sql.sources.v2.bucketing.enabled"))(
            v => s.conf.set("spark.sql.sources.v2.bucketing.enabled", v))
          prevT.fold(s.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
            v => s.conf.set("spark.sql.autoBroadcastJoinThreshold", v))
        }
      },
      Some(s"""SELECT l_orderkey % 3 AS grp, COUNT(*) AS n,
              |  ${DSUM("l_quantity")} AS sum_qty, ${DSUM("o_totalprice")} AS sum_price
              |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Partial-key storage-partitioned join: the fact table carries the
    // canonical at-scale layout `months(ts), bucket(8, key)`, the dim
    // only `bucket(8, key)`, and the join is on the key ALONE. The
    // temporal field is outside the SPJ key domain and pruned from the
    // scan output, so the scan reports the surviving bucket subset and
    // groups files by it — the join co-locates by bucket with zero
    // Exchange (asserted in-plan) instead of shuffling the big side.
    "q103_spj_partial" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq103").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq103", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq103.warehouse",
            Files.createTempDirectory("graft-spjp").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq103.bench")
        s.sql("DROP TABLE IF EXISTS graftq103.bench.fact")
        s.sql("DROP TABLE IF EXISTS graftq103.bench.dim")
        s.sql("""CREATE TABLE graftq103.bench.fact
                |(l_orderkey BIGINT, l_shipdate TIMESTAMP_NTZ, l_quantity DOUBLE)
                |PARTITIONED BY (months(l_shipdate), bucket(4, l_orderkey))""".stripMargin)
        s.sql("""CREATE TABLE graftq103.bench.dim
                |(o_orderkey BIGINT, o_totalprice DOUBLE)
                |PARTITIONED BY (bucket(4, o_orderkey))""".stripMargin)
        t(s, dir, "lineitem").createOrReplaceTempView("q103_li")
        t(s, dir, "orders").createOrReplaceTempView("q103_ord")
        s.sql("""INSERT INTO graftq103.bench.fact
                |SELECT l_orderkey, l_shipdate, l_quantity FROM q103_li
                |WHERE l_shipdate >= TIMESTAMP '1998-01-01'""".stripMargin)
        s.sql("""INSERT INTO graftq103.bench.dim
                |SELECT o_orderkey, o_totalprice FROM q103_ord""".stripMargin)
        val prevB = s.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
        val prevP = s.conf.getOption("spark.sql.sources.v2.bucketing.pushPartValues.enabled")
        val prevT = s.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
        s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
        s.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
        s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try {
          val j = s.sql(
            """SELECT f.l_quantity, d.o_totalprice
              |FROM graftq103.bench.fact f
              |JOIN graftq103.bench.dim d ON f.l_orderkey = d.o_orderkey""".stripMargin)
          require(!j.queryExecution.executedPlan.toString.contains("Exchange"),
            "partial-key SPJ planned a shuffle")
          j.agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"),
              dsum(col("o_totalprice")).as("sum_price"))
            .localCheckpoint()
        } finally {
          prevB.fold(s.conf.unset("spark.sql.sources.v2.bucketing.enabled"))(
            v => s.conf.set("spark.sql.sources.v2.bucketing.enabled", v))
          prevP.fold(s.conf.unset("spark.sql.sources.v2.bucketing.pushPartValues.enabled"))(
            v => s.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", v))
          prevT.fold(s.conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
            v => s.conf.set("spark.sql.autoBroadcastJoinThreshold", v))
        }
      },
      Some(s"""SELECT COUNT(*) AS n, ${DSUM("l_quantity")} AS sum_qty,
              |  ${DSUM("o_totalprice")} AS sum_price
              |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              |WHERE l_shipdate >= TIMESTAMP '1998-01-01'""".stripMargin)),

    // In-place table dedup via position deletes: duplicate occurrences
    // are removed by a delete group addressing (file, row-index) pairs
    // — ZERO data files rewritten (asserted in-plan), the only delete
    // shape that can drop one copy while keeping another. The end
    // state equals the pre-duplication source, so the oracle derives
    // it from the raw parquet alone.
    "q96_dedup_table" -> Q(
      (s, dir) => {
        val cat = freshCatalog(s)
        val tbl = cat.ensure(TableIdent("bench", "li_dedup"))
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_returnflag"), col("l_quantity"))
        tbl.append(li)
        tbl.append(li.where(col("l_orderkey") % 7 === 0)) // re-ingest a slice
        val before = tbl.currentOrFail().files.map(_.path).toSet
        val snap = tbl.dedupTable()
        require(snap.operation == "dedup", "dedupTable committed nothing")
        require(snap.files.map(_.path).toSet == before,
          "dedupTable rewrote data files")
        tbl.scan()
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("l_returnflag"))
      },
      Some(s"""SELECT l_returnflag, COUNT(*) AS n, ${DSUM("l_quantity")} AS sum_qty
              |FROM (SELECT DISTINCT l_orderkey, l_linenumber, l_returnflag, l_quantity
              |      FROM lineitem)
              |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Dynamic partition overwrite: re-run ONE month of a
    // month-partitioned table with corrected rows — exactly that
    // month's files are replaced (asserted), every other month carries
    // over byte-for-byte, and the end state is a pure function of the
    // source parquet.
    "q101_dynamic_overwrite" -> Q(
      (s, dir) => {
        val cat = freshCatalog(s)
        val tbl = cat.ensure(TableIdent("bench", "li_dyn"),
          Some("month(l_shipdate)"))
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_shipdate"),
            col("l_returnflag"), col("l_quantity"))
        tbl.append(li)
        val march = col("l_shipdate") >= lit("1996-03-01").cast("timestamp_ntz") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp_ntz")
        val rerun = li.where(march)
          .withColumn("l_quantity", col("l_quantity") + 5.0)
        val before = tbl.currentOrFail().files.map(_.path).toSet
        tbl.overwriteDynamic(rerun)
        val after = tbl.currentOrFail().files.map(_.path).toSet
        require((before intersect after).nonEmpty,
          "dynamic overwrite carried no untouched partitions")
        require(!before.subsetOf(after),
          "dynamic overwrite replaced no files")
        tbl.scan()
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n,
             |  CAST(SUM(CAST(CASE WHEN l_shipdate >= TIMESTAMP '1996-03-01'
             |                       AND l_shipdate <  TIMESTAMP '1996-04-01'
             |                     THEN l_quantity + 5 ELSE l_quantity END
             |           AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // The SQL spelling of dynamic partition overwrite: INSERT OVERWRITE
    // under partitionOverwriteMode=dynamic routes through the
    // resolution rule (Spark has no V1 fallback exec for
    // OverwritePartitionsDynamic) to the same one-commit exact-tuple
    // replacement as q101 — March's files replaced (asserted), every
    // other month carried byte-for-byte.
    "q104_sql_dynamic_overwrite" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq104").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq104", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq104.warehouse",
            Files.createTempDirectory("graft-sqldyn").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq104.bench")
        s.sql("DROP TABLE IF EXISTS graftq104.bench.li")
        s.sql("""CREATE TABLE graftq104.bench.li
                |(l_orderkey BIGINT, l_shipdate TIMESTAMP_NTZ,
                | l_returnflag STRING, l_quantity DOUBLE)
                |PARTITIONED BY (month(l_shipdate))""".stripMargin)
        t(s, dir, "lineitem").createOrReplaceTempView("q104_li")
        s.sql("""INSERT INTO graftq104.bench.li
                |SELECT l_orderkey, l_shipdate, l_returnflag, l_quantity
                |FROM q104_li""".stripMargin)
        val cat = GraftCatalog(s, s.conf.get("spark.sql.catalog.graftq104.warehouse"))
        val tbl = cat.load(TableIdent("bench", "li"))
        val before = tbl.currentOrFail().files.map(_.path).toSet
        val prev = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
        s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try
          s.sql("""INSERT OVERWRITE graftq104.bench.li
                  |SELECT l_orderkey, l_shipdate, l_returnflag, l_quantity + 5.0
                  |FROM q104_li
                  |WHERE l_shipdate >= TIMESTAMP_NTZ '1996-03-01 00:00:00'
                  |  AND l_shipdate <  TIMESTAMP_NTZ '1996-04-01 00:00:00'""".stripMargin)
        finally prev.fold(s.conf.unset("spark.sql.sources.partitionOverwriteMode"))(
          v => s.conf.set("spark.sql.sources.partitionOverwriteMode", v))
        val after = tbl.currentOrFail().files.map(_.path).toSet
        require((before intersect after).nonEmpty,
          "SQL dynamic overwrite carried no untouched partitions")
        require(!before.subsetOf(after),
          "SQL dynamic overwrite replaced no files")
        s.sql("""SELECT l_returnflag, COUNT(*) AS n,
                |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
                |FROM graftq104.bench.li
                |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n,
             |  CAST(SUM(CAST(CASE WHEN l_shipdate >= TIMESTAMP '1996-03-01'
             |                       AND l_shipdate <  TIMESTAMP '1996-04-01'
             |                     THEN l_quantity + 5 ELSE l_quantity END
             |           AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // SQL views over the catalog: a view is a stored QUERY (original
    // text + creation-time resolution context + captured schema), so
    // reading it recomputes over the table's CURRENT data — asserted by
    // appending AFTER the view exists. The oracle replays the view body
    // over the raw parquet.
    "q105_sql_view" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq105").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq105", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq105.warehouse",
            Files.createTempDirectory("graft-views").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq105.bench")
        s.sql("DROP VIEW IF EXISTS graftq105.bench.pricing")
        s.sql("DROP TABLE IF EXISTS graftq105.bench.li")
        s.sql("""CREATE TABLE graftq105.bench.li
                |(l_orderkey BIGINT, l_returnflag STRING, l_linestatus STRING,
                | l_quantity DOUBLE, l_extendedprice DOUBLE)""".stripMargin)
        t(s, dir, "lineitem").createOrReplaceTempView("q105_li")
        s.sql("""INSERT INTO graftq105.bench.li
                |SELECT l_orderkey, l_returnflag, l_linestatus, l_quantity, l_extendedprice
                |FROM q105_li WHERE l_orderkey % 2 = 0""".stripMargin)
        s.sql("""CREATE VIEW graftq105.bench.pricing (flag, status, n, sum_qty) AS
                |SELECT l_returnflag, l_linestatus, COUNT(*),
                |       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                |FROM graftq105.bench.li
                |GROUP BY l_returnflag, l_linestatus""".stripMargin)
        // the view recomputes over data appended AFTER it was created
        s.sql("""INSERT INTO graftq105.bench.li
                |SELECT l_orderkey, l_returnflag, l_linestatus, l_quantity, l_extendedprice
                |FROM q105_li WHERE l_orderkey % 2 = 1""".stripMargin)
        s.sql("""SELECT flag, status, n, sum_qty FROM graftq105.bench.pricing
                |ORDER BY flag, status""".stripMargin)
      },
      Some(s"""SELECT l_returnflag AS flag, l_linestatus AS status, COUNT(*) AS n,
              |  ${DSUM("l_quantity")} AS sum_qty
              |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Incremental materialized view: create over half the source, then
    // append the rest and delete a key range — ONE refresh applies the
    // changelog delta (O(changes), zero source re-scan; asserted by
    // action == 'incremental') and the view must equal the oracle's
    // from-scratch recomputation over the end state.
    "q106_mview" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq106").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq106", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq106.warehouse",
            Files.createTempDirectory("graft-mview").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq106.bench")
        s.sql("CALL graftq106.system.drop_mview('bench', 'pricing')")
        s.sql("DROP TABLE IF EXISTS graftq106.bench.li")
        s.sql("""CREATE TABLE graftq106.bench.li
                |(l_orderkey BIGINT, l_returnflag STRING, l_quantity DOUBLE)""".stripMargin)
        t(s, dir, "lineitem").createOrReplaceTempView("q106_li")
        s.sql("""INSERT INTO graftq106.bench.li
                |SELECT l_orderkey, l_returnflag, l_quantity FROM q106_li
                |WHERE l_orderkey % 2 = 0""".stripMargin)
        val mode = s.sql(
          """CALL graftq106.system.create_mview('bench', 'pricing',
            |  'SELECT l_returnflag, SUM(l_quantity) AS sum_qty, COUNT(*) AS n
            |   FROM graftq106.bench.li WHERE l_quantity > 5.0
            |   GROUP BY l_returnflag')""".stripMargin).head.getString(0)
        require(mode == "incremental", s"expected incremental mode, got $mode")
        s.sql("""INSERT INTO graftq106.bench.li
                |SELECT l_orderkey, l_returnflag, l_quantity FROM q106_li
                |WHERE l_orderkey % 2 = 1""".stripMargin)
        s.sql("DELETE FROM graftq106.bench.li WHERE l_orderkey <= 10000")
        val action = s.sql(
          "CALL graftq106.system.refresh_mview('bench', 'pricing', false)")
          .head.getString(2)
        require(action == "incremental", s"expected incremental refresh, got $action")
        s.sql("""SELECT l_returnflag,
                |  CAST(CAST(sum_qty AS DECIMAL(12,2)) AS DOUBLE) AS sum_qty, n
                |FROM graftq106.bench.pricing ORDER BY l_returnflag""".stripMargin)
      },
      Some("""SELECT l_returnflag,
             |  CAST(CAST(SUM(l_quantity) AS DECIMAL(12,2)) AS DOUBLE) AS sum_qty,
             |  COUNT(*) AS n
             |FROM lineitem WHERE l_quantity > 5.0 AND l_orderkey > 10000
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Widened MV algebra: an AVG+MAX+SUM materialized view with a
    // NULL-producing group key, refreshed INCREMENTALLY across inserts
    // AND merge-on-read deletes — AVG rides the stored sum/count
    // bookkeeping, the MAX retraction (the delete removes high prices)
    // triggers the targeted per-group recompute, and the NULL-keyed
    // group exercises the null-safe keyed merge. The end state must
    // hash-match DuckDB's from-scratch recomputation.
    "q107_mview_avg_minmax" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq107").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq107", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq107.warehouse",
            Files.createTempDirectory("graft-mview-avg").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq107.bench")
        s.sql("CALL graftq107.system.drop_mview('bench', 'pricing')")
        s.sql("DROP TABLE IF EXISTS graftq107.bench.li")
        s.sql("""CREATE TABLE graftq107.bench.li
                |(l_orderkey BIGINT, l_returnflag STRING, l_quantity DOUBLE,
                | l_extendedprice DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        t(s, dir, "lineitem").createOrReplaceTempView("q107_li")
        s.sql("""INSERT INTO graftq107.bench.li
                |SELECT l_orderkey, l_returnflag, l_quantity, l_extendedprice
                |FROM q107_li WHERE l_orderkey % 2 = 0""".stripMargin)
        val mode = s.sql(
          """CALL graftq107.system.create_mview('bench', 'pricing',
            |  'SELECT CASE WHEN l_returnflag = ''N'' THEN NULL
            |            ELSE l_returnflag END AS flag,
            |     AVG(l_quantity) AS avg_qty, MAX(l_extendedprice) AS max_price,
            |     SUM(l_quantity) AS sum_qty, COUNT(*) AS n
            |   FROM graftq107.bench.li WHERE l_quantity > 2.0
            |   GROUP BY CASE WHEN l_returnflag = ''N'' THEN NULL
            |              ELSE l_returnflag END')""".stripMargin).head.getString(0)
        require(mode == "incremental", s"expected incremental mode, got $mode")
        s.sql("""INSERT INTO graftq107.bench.li
                |SELECT l_orderkey, l_returnflag, l_quantity, l_extendedprice
                |FROM q107_li WHERE l_orderkey % 2 = 1""".stripMargin)
        // merge-on-read deletes: one retracts stored maxes (forcing the
        // targeted recompute), one trims a key range
        s.sql("DELETE FROM graftq107.bench.li WHERE l_extendedprice >= 80000.0")
        s.sql("DELETE FROM graftq107.bench.li WHERE l_orderkey <= 10000")
        val action = s.sql(
          "CALL graftq107.system.refresh_mview('bench', 'pricing', false)")
          .head.getString(2)
        require(action == "incremental", s"expected incremental refresh, got $action")
        s.sql("""SELECT flag,
                |  CAST(CAST(avg_qty AS DECIMAL(18,6)) AS DOUBLE) AS avg_qty,
                |  max_price,
                |  CAST(CAST(sum_qty AS DECIMAL(14,2)) AS DOUBLE) AS sum_qty, n
                |FROM graftq107.bench.pricing
                |ORDER BY flag NULLS FIRST""".stripMargin)
      },
      Some("""SELECT CASE WHEN l_returnflag = 'N' THEN NULL
             |         ELSE l_returnflag END AS flag,
             |  CAST(CAST(AVG(l_quantity) AS DECIMAL(18,6)) AS DOUBLE) AS avg_qty,
             |  MAX(l_extendedprice) AS max_price,
             |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(14,2)) AS DOUBLE) AS sum_qty,
             |  COUNT(*) AS n
             |FROM lineitem
             |WHERE l_quantity > 2.0 AND l_extendedprice < 80000.0
             |  AND l_orderkey > 10000
             |GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin)),

    // Global-aggregate MV (no GROUP BY): ONE stored row — the live
    // dashboard counter shape — maintained incrementally across
    // inserts and merge-on-read deletes through the synthetic constant
    // merge key, hash-matched against DuckDB's global recompute.
    "q109_mview_global" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq109").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq109", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq109.warehouse",
            Files.createTempDirectory("graft-mview-global").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq109.bench")
        s.sql("CALL graftq109.system.drop_mview('bench', 'totals')")
        s.sql("DROP TABLE IF EXISTS graftq109.bench.li")
        s.sql("""CREATE TABLE graftq109.bench.li
                |(l_orderkey BIGINT, l_quantity DOUBLE, l_extendedprice DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        t(s, dir, "lineitem").createOrReplaceTempView("q109_li")
        s.sql("""INSERT INTO graftq109.bench.li
                |SELECT l_orderkey, l_quantity, l_extendedprice
                |FROM q109_li WHERE l_orderkey % 2 = 0""".stripMargin)
        val mode = s.sql(
          """CALL graftq109.system.create_mview('bench', 'totals',
            |  'SELECT COUNT(*) AS n, SUM(l_quantity) AS sq,
            |     AVG(l_quantity) AS aq, MAX(l_extendedprice) AS mp
            |   FROM graftq109.bench.li WHERE l_quantity > 2.0')""".stripMargin)
          .head.getString(0)
        require(mode == "incremental", s"expected incremental global MV, got $mode")
        s.sql("""INSERT INTO graftq109.bench.li
                |SELECT l_orderkey, l_quantity, l_extendedprice
                |FROM q109_li WHERE l_orderkey % 2 = 1""".stripMargin)
        s.sql("DELETE FROM graftq109.bench.li WHERE l_extendedprice >= 80000.0")
        val action = s.sql(
          "CALL graftq109.system.refresh_mview('bench', 'totals', false)")
          .head.getString(2)
        require(action == "incremental", s"expected incremental refresh, got $action")
        s.sql("""SELECT n,
                |  CAST(CAST(sq AS DECIMAL(14,2)) AS DOUBLE) AS sq,
                |  CAST(CAST(aq AS DECIMAL(18,6)) AS DOUBLE) AS aq, mp
                |FROM graftq109.bench.totals""".stripMargin)
      },
      Some("""SELECT COUNT(*) AS n,
             |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(14,2)) AS DOUBLE) AS sq,
             |  CAST(CAST(AVG(l_quantity) AS DECIMAL(18,6)) AS DOUBLE) AS aq,
             |  MAX(l_extendedprice) AS mp
             |FROM lineitem
             |WHERE l_quantity > 2.0 AND l_extendedprice < 80000.0""".stripMargin)),

    // COUNT(DISTINCT) MV: the counting-algorithm dedup-level pair
    // table (`<storage>__dl<i>`). Distinct suppliers per return flag —
    // suppliers recur across many rows, so the merge-on-read deletes
    // exercise real pair churn: some pairs lose carriers but survive
    // (distinct count unchanged), others die (count drops). Maintained
    // incrementally across inserts AND MoR deletes; end state
    // hash-matches DuckDB's from-scratch COUNT(DISTINCT).
    "q110_mview_count_distinct" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq110").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq110", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq110.warehouse",
            Files.createTempDirectory("graft-mview-cdist").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq110.bench")
        s.sql("CALL graftq110.system.drop_mview('bench', 'supp')")
        s.sql("DROP TABLE IF EXISTS graftq110.bench.li")
        s.sql("""CREATE TABLE graftq110.bench.li
                |(l_orderkey BIGINT, l_returnflag STRING, l_suppkey BIGINT,
                | l_quantity DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        t(s, dir, "lineitem").createOrReplaceTempView("q110_li")
        s.sql("""INSERT INTO graftq110.bench.li
                |SELECT l_orderkey, l_returnflag, l_suppkey, l_quantity
                |FROM q110_li WHERE l_orderkey % 2 = 0""".stripMargin)
        // COUNT + SUM + AVG over the same DISTINCT expression share one
        // pair table; suppkeys are integers so the sum/avg folds are
        // exact in both engines
        val mode = s.sql(
          """CALL graftq110.system.create_mview('bench', 'supp',
            |  'SELECT l_returnflag AS flag, COUNT(DISTINCT l_suppkey) AS ds,
            |     SUM(DISTINCT l_suppkey) AS ss, AVG(DISTINCT l_suppkey) AS avs,
            |     COUNT(l_suppkey) AS ns, COUNT(*) AS n
            |   FROM graftq110.bench.li WHERE l_quantity > 2.0
            |   GROUP BY l_returnflag')""".stripMargin).head.getString(0)
        require(mode == "incremental", s"expected incremental mode, got $mode")
        s.sql("""INSERT INTO graftq110.bench.li
                |SELECT l_orderkey, l_returnflag, l_suppkey, l_quantity
                |FROM q110_li WHERE l_orderkey % 2 = 1""".stripMargin)
        // pair churn: the quantity band kills every pair whose supplier
        // ships ONLY large quantities under that flag (pair deaths) and
        // merely thins the rest (their distinct counts must NOT move);
        // the key-range trim adds carrier churn on top
        s.sql("DELETE FROM graftq110.bench.li WHERE l_quantity >= 45.0")
        s.sql("DELETE FROM graftq110.bench.li WHERE l_orderkey <= 400")
        val action = s.sql(
          "CALL graftq110.system.refresh_mview('bench', 'supp', false)")
          .head.getString(2)
        require(action == "incremental", s"expected incremental refresh, got $action")
        s.sql("""SELECT flag, ds, ss, avs, ns, n FROM graftq110.bench.supp
                |ORDER BY flag""".stripMargin)
      },
      Some("""SELECT l_returnflag AS flag, COUNT(DISTINCT l_suppkey) AS ds,
             |  CAST(SUM(DISTINCT l_suppkey) AS BIGINT) AS ss,
             |  AVG(DISTINCT l_suppkey) AS avs,
             |  COUNT(l_suppkey) AS ns, COUNT(*) AS n
             |FROM lineitem
             |WHERE l_quantity > 2.0 AND l_quantity < 45.0
             |  AND l_orderkey > 400
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // HAVING MV: the predicate applies at VIEW read over the stored
    // aggregates — storage keeps every (flag, supplier) group so the
    // refresh stays O(changes) — and references a resolver-added hidden
    // COUNT(*) the SELECT never carried (stored as _mv_h0). The deletes
    // push groups across the HAVING bar in both directions: the view
    // must flicker them in/out while the storage merge never rescans.
    "q111_mview_having" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq111").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq111", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq111.warehouse",
            Files.createTempDirectory("graft-mview-having").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq111.bench")
        s.sql("CALL graftq111.system.drop_mview('bench', 'hot')")
        s.sql("DROP TABLE IF EXISTS graftq111.bench.li")
        s.sql("""CREATE TABLE graftq111.bench.li
                |(l_orderkey BIGINT, l_returnflag STRING, l_suppkey BIGINT,
                | l_quantity DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        t(s, dir, "lineitem").createOrReplaceTempView("q111_li")
        s.sql("""INSERT INTO graftq111.bench.li
                |SELECT l_orderkey, l_returnflag, l_suppkey, l_quantity
                |FROM q111_li WHERE l_orderkey % 2 = 0""".stripMargin)
        val mode = s.sql(
          """CALL graftq111.system.create_mview('bench', 'hot',
            |  'SELECT l_returnflag AS flag, l_suppkey AS supp,
            |     SUM(l_quantity) AS qty
            |   FROM graftq111.bench.li
            |   GROUP BY l_returnflag, l_suppkey
            |   HAVING COUNT(*) >= 8 AND SUM(l_quantity) > 50.0')""".stripMargin)
          .head.getString(0)
        require(mode == "incremental", s"expected incremental mode, got $mode")
        s.sql("""INSERT INTO graftq111.bench.li
                |SELECT l_orderkey, l_returnflag, l_suppkey, l_quantity
                |FROM q111_li WHERE l_orderkey % 2 = 1""".stripMargin)
        s.sql("DELETE FROM graftq111.bench.li WHERE l_quantity >= 42.0")
        s.sql("DELETE FROM graftq111.bench.li WHERE l_orderkey <= 300")
        val action = s.sql(
          "CALL graftq111.system.refresh_mview('bench', 'hot', false)")
          .head.getString(2)
        require(action == "incremental", s"expected incremental refresh, got $action")
        s.sql("""SELECT flag, supp, qty FROM graftq111.bench.hot
                |ORDER BY flag, supp""".stripMargin)
      },
      Some("""SELECT l_returnflag AS flag, l_suppkey AS supp,
             |  SUM(l_quantity) AS qty
             |FROM lineitem
             |WHERE l_quantity < 42.0 AND l_orderkey > 300
             |GROUP BY 1, 2
             |HAVING COUNT(*) >= 8 AND SUM(l_quantity) > 50.0
             |ORDER BY 1, 2""".stripMargin)),

    // ROLLUP MV: detail rows + per-flag subtotals + the grand total in
    // ONE stored table, each set's row getting its exact delta from the
    // signed slice re-aggregated through the same grouping sets; the
    // stored grouping id keys the merge (and surfaces through the
    // view-computed GROUPING() column). Incremental across inserts AND
    // MoR deletes; DuckDB recomputes the same ROLLUP from scratch.
    "q112_mview_rollup" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq112").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq112", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq112.warehouse",
            Files.createTempDirectory("graft-mview-rollup").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq112.bench")
        s.sql("CALL graftq112.system.drop_mview('bench', 'cube')")
        s.sql("DROP TABLE IF EXISTS graftq112.bench.li")
        s.sql("""CREATE TABLE graftq112.bench.li
                |(l_orderkey BIGINT, l_returnflag STRING, l_linestatus STRING,
                | l_quantity DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        t(s, dir, "lineitem").createOrReplaceTempView("q112_li")
        s.sql("""INSERT INTO graftq112.bench.li
                |SELECT l_orderkey, l_returnflag, l_linestatus, l_quantity
                |FROM q112_li WHERE l_orderkey % 2 = 0""".stripMargin)
        val mode = s.sql(
          """CALL graftq112.system.create_mview('bench', 'cube',
            |  'SELECT l_returnflag AS flag, l_linestatus AS status,
            |     SUM(l_quantity) AS qty, AVG(l_quantity) AS aq, COUNT(*) AS n,
            |     MAX(l_quantity) AS mq, GROUPING(l_returnflag) AS gf
            |   FROM graftq112.bench.li WHERE l_quantity > 1.0
            |   GROUP BY ROLLUP(l_returnflag, l_linestatus)')""".stripMargin)
          .head.getString(0)
        require(mode == "incremental", s"expected incremental mode, got $mode")
        s.sql("""INSERT INTO graftq112.bench.li
                |SELECT l_orderkey, l_returnflag, l_linestatus, l_quantity
                |FROM q112_li WHERE l_orderkey % 2 = 1""".stripMargin)
        s.sql("DELETE FROM graftq112.bench.li WHERE l_quantity >= 44.0")
        s.sql("DELETE FROM graftq112.bench.li WHERE l_orderkey <= 350")
        val action = s.sql(
          "CALL graftq112.system.refresh_mview('bench', 'cube', false)")
          .head.getString(2)
        require(action == "incremental", s"expected incremental refresh, got $action")
        s.sql("""SELECT flag, status, qty, aq, n, mq, gf FROM graftq112.bench.cube
                |ORDER BY flag, status, n""".stripMargin)
      },
      Some("""SELECT l_returnflag AS flag, l_linestatus AS status,
             |  SUM(l_quantity) AS qty, AVG(l_quantity) AS aq, COUNT(*) AS n,
             |  MAX(l_quantity) AS mq,
             |  CAST(GROUPING(l_returnflag) AS TINYINT) AS gf
             |FROM lineitem
             |WHERE l_quantity > 1.0 AND l_quantity < 44.0 AND l_orderkey > 350
             |GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 5""".stripMargin)),

    // Derived-output MV: expressions OVER aggregates (the classic
    // revenue-per-unit ratio) — each inner aggregate is stored (the
    // public revenue sum is REUSED by the ratio, the quantity sum
    // becomes a hidden _mv_h extra) and the expression is computed in
    // the public view over the stored columns, so the ratio is exact
    // after every incremental refresh without storing a non-additive
    // value.
    "q113_mview_derived" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq113").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq113", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq113.warehouse",
            Files.createTempDirectory("graft-mview-derived").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq113.bench")
        s.sql("CALL graftq113.system.drop_mview('bench', 'rev')")
        s.sql("DROP TABLE IF EXISTS graftq113.bench.li")
        s.sql("""CREATE TABLE graftq113.bench.li
                |(l_orderkey BIGINT, l_returnflag STRING, l_quantity DOUBLE,
                | l_extendedprice DOUBLE, l_discount DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        t(s, dir, "lineitem").createOrReplaceTempView("q113_li")
        s.sql("""INSERT INTO graftq113.bench.li
                |SELECT l_orderkey, l_returnflag, l_quantity, l_extendedprice,
                |       l_discount
                |FROM q113_li WHERE l_orderkey % 2 = 0""".stripMargin)
        val mode = s.sql(
          """CALL graftq113.system.create_mview('bench', 'rev',
            |  'SELECT l_returnflag AS flag,
            |     SUM(l_extendedprice * (1.0 - l_discount)) AS rev,
            |     SUM(l_extendedprice * (1.0 - l_discount)) / SUM(l_quantity)
            |       AS rev_per_unit,
            |     COUNT(*) + 0 AS n, concat(l_returnflag, ''!'') AS tag
            |   FROM graftq113.bench.li WHERE l_quantity > 3.0
            |   GROUP BY l_returnflag')""".stripMargin).head.getString(0)
        require(mode == "incremental", s"expected incremental mode, got $mode")
        s.sql("""INSERT INTO graftq113.bench.li
                |SELECT l_orderkey, l_returnflag, l_quantity, l_extendedprice,
                |       l_discount
                |FROM q113_li WHERE l_orderkey % 2 = 1""".stripMargin)
        s.sql("DELETE FROM graftq113.bench.li WHERE l_extendedprice >= 60000.0")
        s.sql("DELETE FROM graftq113.bench.li WHERE l_orderkey <= 250")
        val action = s.sql(
          "CALL graftq113.system.refresh_mview('bench', 'rev', false)")
          .head.getString(2)
        require(action == "incremental", s"expected incremental refresh, got $action")
        // Both double outputs quantize through DECIMAL (the q107/q108
        // idiom): incremental stored+delta addition order drifts from
        // the oracle's single full aggregation at ULP scale (measured
        // rel ~1e-15..1e-14 at sf0.01), which DECIMAL(18,4)/(18,6)
        // absorbs with 9+ digits of headroom.
        s.sql("""SELECT flag,
                |  CAST(CAST(rev AS DECIMAL(18,4)) AS DOUBLE) AS rev,
                |  CAST(CAST(rev_per_unit AS DECIMAL(18,6)) AS DOUBLE)
                |    AS rev_per_unit,
                |  n, tag FROM graftq113.bench.rev
                |ORDER BY flag""".stripMargin)
      },
      Some("""SELECT l_returnflag AS flag,
             |  CAST(CAST(SUM(l_extendedprice * (1.0 - l_discount)) AS DECIMAL(18,4)) AS DOUBLE) AS rev,
             |  CAST(CAST(SUM(l_extendedprice * (1.0 - l_discount)) / SUM(l_quantity) AS DECIMAL(18,6)) AS DOUBLE)
             |    AS rev_per_unit,
             |  COUNT(*) + 0 AS n, concat(l_returnflag, '!') AS tag
             |FROM lineitem
             |WHERE l_quantity > 3.0 AND l_extendedprice < 60000.0
             |  AND l_orderkey > 250
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // DISTINCT MV: SELECT DISTINCT is GROUP BY over every output with
    // no aggregates — maintained by the storage's per-group row count
    // (a tuple vanishes exactly when its multiplicity hits zero), so
    // set semantics survive inserts AND MoR deletes incrementally.
    "q114_mview_distinct" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq114").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq114", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq114.warehouse",
            Files.createTempDirectory("graft-mview-distinct").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq114.bench")
        s.sql("CALL graftq114.system.drop_mview('bench', 'ds')")
        s.sql("DROP TABLE IF EXISTS graftq114.bench.li")
        s.sql("""CREATE TABLE graftq114.bench.li
                |(l_orderkey BIGINT, l_returnflag STRING, l_linestatus STRING,
                | l_quantity DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        t(s, dir, "lineitem").createOrReplaceTempView("q114_li")
        s.sql("""INSERT INTO graftq114.bench.li
                |SELECT l_orderkey, l_returnflag, l_linestatus, l_quantity
                |FROM q114_li WHERE l_orderkey % 2 = 0""".stripMargin)
        val mode = s.sql(
          """CALL graftq114.system.create_mview('bench', 'ds',
            |  'SELECT DISTINCT l_returnflag AS flag, l_linestatus AS ls,
            |     CAST(l_quantity AS INT) % 7 AS qmod
            |   FROM graftq114.bench.li WHERE l_quantity > 2.0')""".stripMargin)
          .head.getString(0)
        require(mode == "incremental", s"expected incremental DISTINCT MV, got $mode")
        s.sql("""INSERT INTO graftq114.bench.li
                |SELECT l_orderkey, l_returnflag, l_linestatus, l_quantity
                |FROM q114_li WHERE l_orderkey % 2 = 1""".stripMargin)
        // MoR deletes empty out some (flag, ls, qmod) tuples entirely —
        // the set must shrink, not just the counts
        s.sql("DELETE FROM graftq114.bench.li WHERE l_quantity >= 44.0")
        s.sql("DELETE FROM graftq114.bench.li WHERE l_orderkey <= 500")
        val action = s.sql(
          "CALL graftq114.system.refresh_mview('bench', 'ds', false)")
          .head.getString(2)
        require(action == "incremental", s"expected incremental refresh, got $action")
        s.sql("""SELECT flag, ls, qmod FROM graftq114.bench.ds
                |ORDER BY flag, ls, qmod""".stripMargin)
      },
      Some("""SELECT DISTINCT l_returnflag AS flag, l_linestatus AS ls,
             |  CAST(l_quantity AS INT) % 7 AS qmod
             |FROM lineitem
             |WHERE l_quantity > 2.0 AND l_quantity < 44.0 AND l_orderkey > 500
             |ORDER BY 1, 2, 3""".stripMargin)),

    // UNION ALL MV: two shards of lineitem (orderkey parity) under one
    // MV — union is linear in every leg, so each shard maintains with
    // its own pin: shard-0 inserts, shard-1 MoR deletes, and a
    // shard-1-only window all refresh incrementally.
    "q115_mview_union" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq115").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq115", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq115.warehouse",
            Files.createTempDirectory("graft-mview-union").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq115.bench")
        s.sql("CALL graftq115.system.drop_mview('bench', 'u')")
        t(s, dir, "lineitem").createOrReplaceTempView("q115_li")
        for (i <- 0 to 1) {
          s.sql(s"DROP TABLE IF EXISTS graftq115.bench.li$i")
          s.sql(s"""CREATE TABLE graftq115.bench.li$i
                   |(l_orderkey BIGINT, l_returnflag STRING, l_quantity DOUBLE,
                   | l_extendedprice DOUBLE)
                   |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
          s.sql(s"""INSERT INTO graftq115.bench.li$i
                   |SELECT l_orderkey, l_returnflag, l_quantity, l_extendedprice
                   |FROM q115_li WHERE l_orderkey % 2 = $i
                   |  AND l_orderkey % 5 != 0""".stripMargin)
        }
        val mode = s.sql(
          """CALL graftq115.system.create_mview('bench', 'u',
            |  'SELECT l_returnflag AS flag, SUM(l_quantity) AS sq,
            |     COUNT(*) AS n, MAX(l_extendedprice) AS mp
            |   FROM (SELECT * FROM graftq115.bench.li0 UNION ALL
            |         SELECT * FROM graftq115.bench.li1)
            |   WHERE l_quantity > 2.0
            |   GROUP BY l_returnflag')""".stripMargin).head.getString(0)
        require(mode == "incremental", s"expected incremental union MV, got $mode")
        // shard 0: late arrivals; shard 1: MoR deletes — one refresh
        s.sql("""INSERT INTO graftq115.bench.li0
                |SELECT l_orderkey, l_returnflag, l_quantity, l_extendedprice
                |FROM q115_li WHERE l_orderkey % 2 = 0 AND l_orderkey % 5 = 0""".stripMargin)
        s.sql("DELETE FROM graftq115.bench.li1 WHERE l_extendedprice >= 70000.0")
        val a1 = s.sql("CALL graftq115.system.refresh_mview('bench', 'u', false)")
          .head.getString(2)
        require(a1 == "incremental", s"expected incremental union refresh, got $a1")
        // a shard-1-only window (the tracked first leg untouched)
        s.sql("""INSERT INTO graftq115.bench.li1
                |SELECT l_orderkey, l_returnflag, l_quantity, l_extendedprice
                |FROM q115_li WHERE l_orderkey % 2 = 1 AND l_orderkey % 5 = 0""".stripMargin)
        val a2 = s.sql("CALL graftq115.system.refresh_mview('bench', 'u', false)")
          .head.getString(2)
        require(a2 == "incremental", s"expected incremental leg-only refresh, got $a2")
        s.sql("""SELECT flag,
                |  CAST(CAST(sq AS DECIMAL(14,2)) AS DOUBLE) AS sq, n, mp
                |FROM graftq115.bench.u ORDER BY flag""".stripMargin)
      },
      Some("""SELECT l_returnflag AS flag,
             |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(14,2)) AS DOUBLE) AS sq,
             |  COUNT(*) AS n, MAX(l_extendedprice) AS mp
             |FROM lineitem
             |WHERE l_quantity > 2.0
             |  AND NOT (l_orderkey % 2 = 1 AND l_extendedprice >= 70000.0
             |           AND l_orderkey % 5 != 0)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // DISTINCT aggregates under ROLLUP: the pair table carries per-set
    // pair rows (the distinct value joins every grouping set, the
    // stored grouping id re-based onto the group columns via
    // shiftright), so COUNT/SUM(DISTINCT) subtotals maintain
    // incrementally across inserts AND MoR pair deaths — the shape
    // r14's analyzer still refused to full mode.
    "q116_mview_rollup_distinct" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq116").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq116", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq116.warehouse",
            Files.createTempDirectory("graft-mview-rdist").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq116.bench")
        s.sql("CALL graftq116.system.drop_mview('bench', 'rd')")
        s.sql("DROP TABLE IF EXISTS graftq116.bench.li")
        s.sql("""CREATE TABLE graftq116.bench.li
                |(l_orderkey BIGINT, l_returnflag STRING, l_linestatus STRING,
                | l_suppkey BIGINT, l_quantity DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        t(s, dir, "lineitem").createOrReplaceTempView("q116_li")
        s.sql("""INSERT INTO graftq116.bench.li
                |SELECT l_orderkey, l_returnflag, l_linestatus, l_suppkey,
                |       l_quantity
                |FROM q116_li WHERE l_orderkey % 2 = 0""".stripMargin)
        val mode = s.sql(
          """CALL graftq116.system.create_mview('bench', 'rd',
            |  'SELECT l_returnflag AS flag, l_linestatus AS status,
            |     COUNT(DISTINCT l_suppkey) AS ds, SUM(DISTINCT l_suppkey) AS ss,
            |     COUNT(*) AS n,
            |     CAST(GROUPING(l_returnflag) AS TINYINT) AS gf
            |   FROM graftq116.bench.li WHERE l_quantity > 2.0
            |   GROUP BY ROLLUP(l_returnflag, l_linestatus)')""".stripMargin)
          .head.getString(0)
        require(mode == "incremental", s"expected incremental mode, got $mode")
        s.sql("""INSERT INTO graftq116.bench.li
                |SELECT l_orderkey, l_returnflag, l_linestatus, l_suppkey,
                |       l_quantity
                |FROM q116_li WHERE l_orderkey % 2 = 1""".stripMargin)
        // the quantity band kills pairs whose supplier ships only large
        // quantities under a (flag, status) tuple — and DIFFERENT pairs
        // die at the subtotal levels; the key trim adds carrier churn
        s.sql("DELETE FROM graftq116.bench.li WHERE l_quantity >= 46.0")
        s.sql("DELETE FROM graftq116.bench.li WHERE l_orderkey <= 300")
        val action = s.sql(
          "CALL graftq116.system.refresh_mview('bench', 'rd', false)")
          .head.getString(2)
        require(action == "incremental", s"expected incremental refresh, got $action")
        s.sql("""SELECT flag, status, ds, ss, n, gf FROM graftq116.bench.rd
                |ORDER BY flag NULLS FIRST, status NULLS FIRST, n""".stripMargin)
      },
      Some("""SELECT l_returnflag AS flag, l_linestatus AS status,
             |  COUNT(DISTINCT l_suppkey) AS ds,
             |  CAST(SUM(DISTINCT l_suppkey) AS BIGINT) AS ss,
             |  COUNT(*) AS n,
             |  CAST(GROUPING(l_returnflag) AS TINYINT) AS gf
             |FROM lineitem
             |WHERE l_quantity > 2.0 AND l_quantity < 46.0 AND l_orderkey > 300
             |GROUP BY ROLLUP(l_returnflag, l_linestatus)
             |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 5""".stripMargin)),

    // Decimal DISTINCT aggregates: SUM(DISTINCT decimal) folds the
    // exact decimal pair values (NULL-means-empty vs overflow
    // disambiguated by the alive-pair count), AVG(DISTINCT decimal)
    // divides the exact pair sum inside the davg precision gate —
    // both shapes r14 refused to full mode. DuckDB recomputes from
    // scratch over the same money column.
    "q117_mview_decimal_distinct" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq117").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq117", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq117.warehouse",
            Files.createTempDirectory("graft-mview-ddist").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq117.bench")
        s.sql("CALL graftq117.system.drop_mview('bench', 'dd')")
        s.sql("DROP TABLE IF EXISTS graftq117.bench.li")
        s.sql("""CREATE TABLE graftq117.bench.li
                |(l_orderkey BIGINT, l_returnflag STRING, price DECIMAL(12,2),
                | l_quantity DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        t(s, dir, "lineitem").createOrReplaceTempView("q117_li")
        s.sql("""INSERT INTO graftq117.bench.li
                |SELECT l_orderkey, l_returnflag,
                |       CAST(l_extendedprice AS DECIMAL(12,2)), l_quantity
                |FROM q117_li WHERE l_orderkey % 2 = 0""".stripMargin)
        val mode = s.sql(
          """CALL graftq117.system.create_mview('bench', 'dd',
            |  'SELECT l_returnflag AS flag, SUM(DISTINCT price) AS sp,
            |     AVG(DISTINCT price) AS ap, COUNT(DISTINCT price) AS dp,
            |     COUNT(*) AS n
            |   FROM graftq117.bench.li WHERE l_quantity > 2.0
            |   GROUP BY l_returnflag')""".stripMargin).head.getString(0)
        require(mode == "incremental", s"expected incremental mode, got $mode")
        s.sql("""INSERT INTO graftq117.bench.li
                |SELECT l_orderkey, l_returnflag,
                |       CAST(l_extendedprice AS DECIMAL(12,2)), l_quantity
                |FROM q117_li WHERE l_orderkey % 2 = 1""".stripMargin)
        s.sql("DELETE FROM graftq117.bench.li WHERE l_quantity >= 44.0")
        s.sql("DELETE FROM graftq117.bench.li WHERE l_orderkey <= 350")
        val action = s.sql(
          "CALL graftq117.system.refresh_mview('bench', 'dd', false)")
          .head.getString(2)
        require(action == "incremental", s"expected incremental refresh, got $action")
        // the exact decimal pair sums convert ONCE to double on both
        // sides (the DSUM idiom — identical IEEE rounding); ap reads
        // the exact scale-6 decimal quotient as double (DuckDB's
        // distinct AVG is a float division quantized to 6 decimals)
        s.sql("""SELECT flag, CAST(sp AS DOUBLE) AS sp,
                |  CAST(ap AS DOUBLE) AS ap, dp, n
                |FROM graftq117.bench.dd ORDER BY flag""".stripMargin)
      },
      Some("""SELECT l_returnflag AS flag,
             |  CAST(SUM(DISTINCT CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sp,
             |  CAST(CAST(AVG(DISTINCT CAST(l_extendedprice AS DECIMAL(12,2))) AS DECIMAL(16,6)) AS DOUBLE) AS ap,
             |  COUNT(DISTINCT CAST(l_extendedprice AS DECIMAL(12,2))) AS dp,
             |  COUNT(*) AS n
             |FROM lineitem
             |WHERE l_quantity > 2.0 AND l_quantity < 44.0 AND l_orderkey > 350
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // WIDE-decimal AVG / AVG(DISTINCT) MV (round-15 verdict carry #3):
    // DECIMAL(30,10) — precision > 24 AND scale > 2, the class the old
    // probed gate refused to FULL mode — now maintains incrementally:
    // the running sum stays exact at the stored sum type
    // (DecimalAddNoOverflowCheck; the plain Column `+` re-rounds
    // DECIMAL(38,10) sums at scale 9) and the merge divides with the
    // identical DecimalDivideWithOverflowCheck expression Spark's
    // Average evaluates. The measure is built from strings so BOTH
    // engines hold the exact same scale-10 decimal; outputs quantize
    // to scale 4 once on each side (magnitude ~1e5 keeps DuckDB's
    // double AVG far inside the quantum).
    "q122_mview_wide_decimal_avg" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq122").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq122", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq122.warehouse",
            Files.createTempDirectory("graft-mview-wdavg").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq122.bench")
        s.sql("CALL graftq122.system.drop_mview('bench', 'wd')")
        s.sql("DROP TABLE IF EXISTS graftq122.bench.li")
        s.sql("""CREATE TABLE graftq122.bench.li
                |(l_orderkey BIGINT, l_returnflag STRING, v DECIMAL(30,10),
                | l_quantity DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        t(s, dir, "lineitem").createOrReplaceTempView("q122_li")
        // v = price's 2 decimals + 8 more digits from l_partkey — a
        // fully-populated scale-10 decimal, exact in both engines
        val vExpr = """CAST(CONCAT(CAST(l_extendedprice AS DECIMAL(12,2)),
                      |  LPAD(CAST(l_partkey % 100000000 AS STRING), 8, '0'))
                      |AS DECIMAL(30,10))""".stripMargin
        s.sql(s"""INSERT INTO graftq122.bench.li
                 |SELECT l_orderkey, l_returnflag, $vExpr, l_quantity
                 |FROM q122_li WHERE l_orderkey % 2 = 0""".stripMargin)
        val mode = s.sql(
          """CALL graftq122.system.create_mview('bench', 'wd',
            |  'SELECT l_returnflag AS flag, AVG(v) AS av,
            |     AVG(DISTINCT v) AS adv, SUM(v) AS sv, COUNT(*) AS n
            |   FROM graftq122.bench.li WHERE l_quantity > 2.0
            |   GROUP BY l_returnflag')""".stripMargin).head.getString(0)
        require(mode == "incremental",
          s"wide-decimal AVG must maintain incrementally now, got $mode")
        s.sql(s"""INSERT INTO graftq122.bench.li
                 |SELECT l_orderkey, l_returnflag, $vExpr, l_quantity
                 |FROM q122_li WHERE l_orderkey % 2 = 1""".stripMargin)
        s.sql("DELETE FROM graftq122.bench.li WHERE l_quantity >= 45.0")
        s.sql("DELETE FROM graftq122.bench.li WHERE l_orderkey <= 320")
        val action = s.sql(
          "CALL graftq122.system.refresh_mview('bench', 'wd', false)")
          .head.getString(2)
        require(action == "incremental", s"expected incremental refresh, got $action")
        // sv re-quantizes to scale 2 before the double conversion: the
        // scale-10 sum's unscaled value exceeds 2^53, where Spark's
        // (BigDecimal, correctly rounded) and DuckDB's (scaled int
        // division) decimal→double conversions can differ by one ulp
        s.sql("""SELECT flag, CAST(CAST(av AS DECIMAL(24,4)) AS DOUBLE) AS av,
                |  CAST(CAST(adv AS DECIMAL(24,4)) AS DOUBLE) AS adv,
                |  CAST(CAST(sv AS DECIMAL(30,2)) AS DOUBLE) AS sv, n
                |FROM graftq122.bench.wd ORDER BY flag""".stripMargin)
      },
      Some("""WITH src AS (
             |  SELECT l_returnflag AS flag,
             |    CAST(CONCAT(CAST(l_extendedprice AS DECIMAL(12,2)),
             |      LPAD(CAST(l_partkey % 100000000 AS VARCHAR), 8, '0'))
             |      AS DECIMAL(30,10)) AS v
             |  FROM lineitem
             |  WHERE l_quantity > 2.0 AND l_quantity < 45.0 AND l_orderkey > 320)
             |SELECT flag,
             |  CAST(CAST(AVG(v) AS DECIMAL(24,4)) AS DOUBLE) AS av,
             |  CAST(CAST(AVG(DISTINCT v) AS DECIMAL(24,4)) AS DOUBLE) AS adv,
             |  CAST(ROUND(SUM(v), 2) AS DOUBLE) AS sv, COUNT(*) AS n
             |FROM src GROUP BY flag ORDER BY flag""".stripMargin)),

    // Rank-per-group (top-N) WINDOW MV (round-15 verdict carry #4):
    // ROW_NUMBER() OVER (PARTITION BY flag ORDER BY price DESC, ...)
    // WHERE rn <= 5, maintained by AFFECTED-GROUP recompute — the
    // changelog's touched partition keys recompute from the source AS
    // OF the head (zone-pruned + semi-joined), untouched groups keep
    // their stored rows, and the replacement commits through ONE keyed
    // applyNetChanges with the marker CAS. The order is TOTAL
    // (price DESC, okey, ln), so both engines rank identically.
    "q123_mview_topn_window" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq123").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq123", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq123.warehouse",
            Files.createTempDirectory("graft-mview-topn").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq123.bench")
        s.sql("CALL graftq123.system.drop_mview('bench', 'top5')")
        s.sql("DROP TABLE IF EXISTS graftq123.bench.li")
        s.sql("""CREATE TABLE graftq123.bench.li
                |(okey BIGINT, ln INT, flag STRING, price DOUBLE, qty DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        t(s, dir, "lineitem").createOrReplaceTempView("q123_li")
        s.sql("""INSERT INTO graftq123.bench.li
                |SELECT l_orderkey, l_linenumber, l_returnflag,
                |       l_extendedprice, l_quantity
                |FROM q123_li WHERE l_orderkey % 2 = 0""".stripMargin)
        val mode = s.sql(
          """CALL graftq123.system.create_mview('bench', 'top5',
            |  'SELECT flag, okey, ln, price, rn FROM (
            |     SELECT flag, okey, ln, price,
            |       ROW_NUMBER() OVER (PARTITION BY flag
            |         ORDER BY price DESC, okey, ln) AS rn
            |     FROM graftq123.bench.li WHERE qty > 1.0) WHERE rn <= 5')""".stripMargin)
          .head.getString(0)
        require(mode == "window",
          s"rank-per-group MV must register in window mode, got $mode")
        // burst: the other half arrives, then two delete slices — one
        // retracts stored top rows of a single group
        s.sql("""INSERT INTO graftq123.bench.li
                |SELECT l_orderkey, l_linenumber, l_returnflag,
                |       l_extendedprice, l_quantity
                |FROM q123_li WHERE l_orderkey % 2 = 1""".stripMargin)
        s.sql("DELETE FROM graftq123.bench.li WHERE flag = 'A' AND qty >= 40.0")
        s.sql("DELETE FROM graftq123.bench.li WHERE okey <= 200")
        val action = s.sql(
          "CALL graftq123.system.refresh_mview('bench', 'top5', false)")
          .head.getString(2)
        require(action == "incremental", s"expected incremental refresh, got $action")
        s.sql("""SELECT flag, okey, ln, price, rn FROM graftq123.bench.top5
                |ORDER BY flag, rn""".stripMargin)
      },
      Some("""WITH src AS (
             |  SELECT l_returnflag AS flag, l_orderkey AS okey,
             |         l_linenumber AS ln, l_extendedprice AS price
             |  FROM lineitem
             |  WHERE l_quantity > 1.0 AND l_orderkey > 200
             |    AND NOT (l_returnflag = 'A' AND l_quantity >= 40.0))
             |SELECT flag, okey, ln, price, rn FROM (
             |  SELECT flag, okey, ln, price,
             |    ROW_NUMBER() OVER (PARTITION BY flag
             |      ORDER BY price DESC, okey, ln) AS rn
             |  FROM src) WHERE rn <= 5 ORDER BY flag, rn""".stripMargin)),

    // MV over MV (round-15 stretch #7): the second level's fact is the
    // first MV's STORAGE table (reached through its public view by the
    // shape analysis' projection inlining), and the storage table's own
    // changelog — written exactly-once by level-1's keyed refresh
    // merges — drives level-2's incremental maintenance. Refresh
    // cascades m1 → m2, each O(changes at its own level); both actions
    // asserted incremental after a MoR mutation burst on the base.
    "q124_mview_over_mview" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq124").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq124", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq124.warehouse",
            Files.createTempDirectory("graft-mview-nested").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq124.bench")
        s.sql("CALL graftq124.system.drop_mview('bench', 'm2')")
        s.sql("CALL graftq124.system.drop_mview('bench', 'm1')")
        s.sql("DROP TABLE IF EXISTS graftq124.bench.li")
        s.sql("""CREATE TABLE graftq124.bench.li
                |(okey BIGINT, flag STRING, status STRING, qty DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        t(s, dir, "lineitem").createOrReplaceTempView("q124_li")
        s.sql("""INSERT INTO graftq124.bench.li
                |SELECT l_orderkey, l_returnflag, l_linestatus, l_quantity
                |FROM q124_li WHERE l_orderkey % 2 = 0""".stripMargin)
        val m1 = s.sql(
          """CALL graftq124.system.create_mview('bench', 'm1',
            |  'SELECT flag, status, SUM(qty) AS sq, COUNT(*) AS n
            |   FROM graftq124.bench.li WHERE qty > 2.0
            |   GROUP BY flag, status')""".stripMargin).head.getString(0)
        require(m1 == "incremental", s"level-1 MV must be incremental, got $m1")
        val m2 = s.sql(
          """CALL graftq124.system.create_mview('bench', 'm2',
            |  'SELECT flag, SUM(sq) AS total, MAX(sq) AS mx,
            |          SUM(n) AS rows_total, COUNT(*) AS nst
            |   FROM graftq124.bench.m1 GROUP BY flag')""".stripMargin)
          .head.getString(0)
        require(m2 == "incremental", s"level-2 MV must be incremental, got $m2")
        s.sql("""INSERT INTO graftq124.bench.li
                |SELECT l_orderkey, l_returnflag, l_linestatus, l_quantity
                |FROM q124_li WHERE l_orderkey % 2 = 1""".stripMargin)
        s.sql("DELETE FROM graftq124.bench.li WHERE qty >= 47.0")
        s.sql("DELETE FROM graftq124.bench.li WHERE okey <= 280")
        val a1 = s.sql("CALL graftq124.system.refresh_mview('bench', 'm1', false)")
          .head.getString(2)
        require(a1 == "incremental", s"level-1 refresh expected incremental, got $a1")
        val a2 = s.sql("CALL graftq124.system.refresh_mview('bench', 'm2', false)")
          .head.getString(2)
        require(a2 == "incremental", s"level-2 refresh expected incremental, got $a2")
        s.sql("""SELECT flag, total, mx, rows_total, nst
                |FROM graftq124.bench.m2 ORDER BY flag""".stripMargin)
      },
      Some("""WITH m1 AS (
             |  SELECT l_returnflag AS flag, l_linestatus AS status,
             |         SUM(l_quantity) AS sq, COUNT(*) AS n
             |  FROM lineitem
             |  WHERE l_quantity > 2.0 AND l_quantity < 47.0 AND l_orderkey > 280
             |  GROUP BY 1, 2)
             |SELECT flag, SUM(sq) AS total, MAX(sq) AS mx,
             |       CAST(SUM(n) AS BIGINT) AS rows_total, COUNT(*) AS nst
             |FROM m1 GROUP BY flag ORDER BY flag""".stripMargin)),

    // RUNNING-AGGREGATE window MV (round-16 extension of window mode):
    // SUM OVER (PARTITION BY okey ORDER BY ln) + LAG maintain by the
    // same affected-group recompute as rank top-N — the function is
    // never decomposed, touched ORDER groups recompute wholesale, and
    // the per-order partition keeps the recompute surface small (a
    // burst touches O(changed orders), not the table). Output samples
    // a key range through the public view (pushdown applies).
    "q125_mview_running_window" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq125").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq125", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq125.warehouse",
            Files.createTempDirectory("graft-mview-running").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq125.bench")
        s.sql("CALL graftq125.system.drop_mview('bench', 'run')")
        s.sql("DROP TABLE IF EXISTS graftq125.bench.li")
        s.sql("""CREATE TABLE graftq125.bench.li
                |(okey BIGINT, ln INT, qty DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        t(s, dir, "lineitem").createOrReplaceTempView("q125_li")
        s.sql("""INSERT INTO graftq125.bench.li
                |SELECT l_orderkey, l_linenumber, l_quantity
                |FROM q125_li WHERE l_orderkey % 2 = 0""".stripMargin)
        val mode = s.sql(
          """CALL graftq125.system.create_mview('bench', 'run',
            |  'SELECT okey, ln, qty,
            |     SUM(qty) OVER (PARTITION BY okey ORDER BY ln) AS run,
            |     LAG(qty, 1) OVER (PARTITION BY okey ORDER BY ln) AS prev
            |   FROM graftq125.bench.li WHERE qty > 1.0')""".stripMargin)
          .head.getString(0)
        require(mode == "window",
          s"running-aggregate MV must register in window mode, got $mode")
        s.sql("""INSERT INTO graftq125.bench.li
                |SELECT l_orderkey, l_linenumber, l_quantity
                |FROM q125_li WHERE l_orderkey % 2 = 1""".stripMargin)
        s.sql("DELETE FROM graftq125.bench.li WHERE qty >= 48.0")
        s.sql("DELETE FROM graftq125.bench.li WHERE okey <= 260")
        val action = s.sql(
          "CALL graftq125.system.refresh_mview('bench', 'run', false)")
          .head.getString(2)
        require(action == "incremental", s"expected incremental refresh, got $action")
        s.sql("""SELECT okey, ln, qty, run, prev FROM graftq125.bench.run
                |WHERE okey <= 500 ORDER BY okey, ln""".stripMargin)
      },
      Some("""WITH src AS (
             |  SELECT l_orderkey AS okey, l_linenumber AS ln, l_quantity AS qty
             |  FROM lineitem
             |  WHERE l_quantity > 1.0 AND l_quantity < 48.0 AND l_orderkey > 260)
             |SELECT okey, ln, qty,
             |  SUM(qty) OVER (PARTITION BY okey ORDER BY ln) AS run,
             |  LAG(qty, 1) OVER (PARTITION BY okey ORDER BY ln) AS prev
             |FROM src WHERE okey <= 500 ORDER BY okey, ln""".stripMargin)),

    // WINDOW MV OVER A JOINED FACT (round-17 #1): the rank-over-join
    // dashboard shape — top-N per dim attribute. The dim pins AS OF
    // like agg mode; refresh derives touched partition keys from the
    // fact changelog joined to the pinned (and current) dims plus the
    // head fact rows matching a moved dim's slice, then recomputes only
    // those groups from the joined head. Asserted incremental through a
    // MoR fact burst AND a dim move.
    "q126_mview_window_join" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq126").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq126", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq126.warehouse",
            Files.createTempDirectory("graft-mview-wjoin").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq126.bench")
        s.sql("CALL graftq126.system.drop_mview('bench', 'wtop')")
        s.sql("DROP TABLE IF EXISTS graftq126.bench.fact")
        s.sql("DROP TABLE IF EXISTS graftq126.bench.dim")
        s.sql("""CREATE TABLE graftq126.bench.fact
                |(okey BIGINT, ln INT, dk BIGINT, price DOUBLE, qty DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        s.sql("CREATE TABLE graftq126.bench.dim (dkey BIGINT, region STRING)")
        t(s, dir, "lineitem").createOrReplaceTempView("q126_li")
        t(s, dir, "nation").createOrReplaceTempView("q126_na")
        s.sql("INSERT INTO graftq126.bench.dim SELECT n_nationkey, n_name FROM q126_na")
        s.sql("""INSERT INTO graftq126.bench.fact
                |SELECT l_orderkey, l_linenumber, l_suppkey % 25,
                |       l_extendedprice, l_quantity
                |FROM q126_li WHERE l_orderkey % 2 = 0""".stripMargin)
        val mode = s.sql(
          """CALL graftq126.system.create_mview('bench', 'wtop',
            |  'SELECT region, okey, ln, price, rn FROM (
            |     SELECT region, okey, ln, price,
            |       ROW_NUMBER() OVER (PARTITION BY region
            |         ORDER BY price DESC, okey, ln) AS rn
            |     FROM graftq126.bench.fact JOIN graftq126.bench.dim ON dk = dkey
            |     WHERE qty > 1.0) WHERE rn <= 3')""".stripMargin)
          .head.getString(0)
        require(mode == "window",
          s"rank-over-join MV must register in window mode, got $mode")
        // MoR fact burst: the other half arrives, then a band delete
        // that retracts stored top rows
        s.sql("""INSERT INTO graftq126.bench.fact
                |SELECT l_orderkey, l_linenumber, l_suppkey % 25,
                |       l_extendedprice, l_quantity
                |FROM q126_li WHERE l_orderkey % 2 = 1""".stripMargin)
        s.sql("DELETE FROM graftq126.bench.fact WHERE qty >= 45.0")
        val a1 = s.sql(
          "CALL graftq126.system.refresh_mview('bench', 'wtop', false)")
          .head.getString(2)
        require(a1 == "incremental", s"fact-burst refresh expected incremental, got $a1")
        // dim MOVE: five regions rename — their fact rows change groups
        s.sql("""UPDATE graftq126.bench.dim
                |SET region = concat(region, '_MOVED') WHERE dkey < 5""".stripMargin)
        val a2 = s.sql(
          "CALL graftq126.system.refresh_mview('bench', 'wtop', false)")
          .head.getString(2)
        require(a2 == "incremental", s"dim-move refresh expected incremental, got $a2")
        s.sql("""SELECT region, okey, ln, price, rn FROM graftq126.bench.wtop
                |ORDER BY region, rn""".stripMargin)
      },
      Some("""WITH fact AS (
             |  SELECT l_orderkey AS okey, l_linenumber AS ln,
             |         l_suppkey % 25 AS dk, l_extendedprice AS price,
             |         l_quantity AS qty
             |  FROM lineitem WHERE l_quantity < 45.0),
             |dim AS (
             |  SELECT n_nationkey AS dkey,
             |         CASE WHEN n_nationkey < 5 THEN n_name || '_MOVED'
             |              ELSE n_name END AS region
             |  FROM nation)
             |SELECT region, okey, ln, price, rn FROM (
             |  SELECT region, okey, ln, price,
             |    ROW_NUMBER() OVER (PARTITION BY region
             |      ORDER BY price DESC, okey, ln) AS rn
             |  FROM fact JOIN dim ON dk = dkey WHERE qty > 1.0)
             |WHERE rn <= 3 ORDER BY region, rn""".stripMargin)),

    // THE FULL WINDOW COMPOSITION (round 17): a sharded UNION ALL fact
    // — the legacy shard behind a per-leg SELECT — JOINED to a dim
    // carrying the window's partition key. Touched keys derive from
    // every leg's slice joined to the pinned (and moved) dim, the
    // recompute reads the union'd head through the join, and one
    // refresh maintains MoR shard deletes, leg bursts, AND a dim
    // rename that moves rows between groups.
    "q133_mview_union_window_join" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq133").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq133", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq133.warehouse",
            Files.createTempDirectory("graft-mview-uwj").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq133.bench")
        s.sql("CALL graftq133.system.drop_mview('bench', 'wtop')")
        t(s, dir, "lineitem").createOrReplaceTempView("q133_li")
        t(s, dir, "nation").createOrReplaceTempView("q133_na")
        s.sql("DROP TABLE IF EXISTS graftq133.bench.t0")
        s.sql("""CREATE TABLE graftq133.bench.t0
                |(okey BIGINT, ln INT, dk BIGINT, price DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        s.sql("""INSERT INTO graftq133.bench.t0
                |SELECT l_orderkey, l_linenumber, l_suppkey % 25, l_extendedprice
                |FROM q133_li WHERE l_partkey % 3 = 0 AND l_orderkey % 2 = 0
                |  AND l_orderkey % 5 != 0""".stripMargin)
        s.sql("DROP TABLE IF EXISTS graftq133.bench.t1")
        s.sql("""CREATE TABLE graftq133.bench.t1
                |(oid BIGINT, lnum INT, natk BIGINT, price2 DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        s.sql("""INSERT INTO graftq133.bench.t1
                |SELECT l_orderkey, l_linenumber, l_suppkey % 25, l_extendedprice
                |FROM q133_li WHERE l_partkey % 3 = 0 AND l_orderkey % 2 = 1
                |  AND l_orderkey % 5 != 0""".stripMargin)
        s.sql("DROP TABLE IF EXISTS graftq133.bench.dim")
        s.sql("CREATE TABLE graftq133.bench.dim (dkey BIGINT, region STRING)")
        s.sql("INSERT INTO graftq133.bench.dim SELECT n_nationkey, n_name FROM q133_na")
        val mode = s.sql(
          """CALL graftq133.system.create_mview('bench', 'wtop',
            |  'SELECT region, okey, ln, price, rn FROM (
            |     SELECT region, okey, ln, price,
            |       ROW_NUMBER() OVER (PARTITION BY region
            |         ORDER BY price DESC, okey, ln) AS rn
            |     FROM (SELECT okey, ln, dk, price FROM graftq133.bench.t0
            |           UNION ALL
            |           SELECT oid AS okey, lnum AS ln, natk AS dk,
            |                  price2 AS price FROM graftq133.bench.t1)
            |       JOIN graftq133.bench.dim ON dk = dkey)
            |   WHERE rn <= 3')""".stripMargin).head.getString(0)
        require(mode == "window",
          s"union-join window MV must register in window mode, got $mode")
        // late arrivals on the modern shard + a MoR delete on the
        // legacy one that retracts stored top rows
        s.sql("""INSERT INTO graftq133.bench.t0
                |SELECT l_orderkey, l_linenumber, l_suppkey % 25, l_extendedprice
                |FROM q133_li WHERE l_partkey % 3 = 0
                |  AND l_orderkey % 2 = 0 AND l_orderkey % 5 = 0""".stripMargin)
        s.sql("DELETE FROM graftq133.bench.t1 WHERE price2 >= 90000.0")
        val a1 = s.sql("CALL graftq133.system.refresh_mview('bench', 'wtop', false)")
          .head.getString(2)
        require(a1 == "incremental",
          s"expected incremental union-join window refresh, got $a1")
        // dim MOVE + legacy-leg-only burst in ONE refresh
        s.sql("""UPDATE graftq133.bench.dim
                |SET region = concat(region, '_MOVED') WHERE dkey < 5""".stripMargin)
        s.sql("""INSERT INTO graftq133.bench.t1
                |SELECT l_orderkey, l_linenumber, l_suppkey % 25, l_extendedprice
                |FROM q133_li WHERE l_partkey % 3 = 0
                |  AND l_orderkey % 2 = 1 AND l_orderkey % 5 = 0""".stripMargin)
        val a2 = s.sql("CALL graftq133.system.refresh_mview('bench', 'wtop', false)")
          .head.getString(2)
        require(a2 == "incremental",
          s"expected incremental dim-move + leg-move window refresh, got $a2")
        s.sql("""SELECT region, okey, ln, price, rn FROM graftq133.bench.wtop
                |ORDER BY region, rn""".stripMargin)
      },
      Some("""WITH fact AS (
             |  SELECT l_orderkey AS okey, l_linenumber AS ln,
             |         l_suppkey % 25 AS dk, l_extendedprice AS price
             |  FROM lineitem
             |  WHERE l_partkey % 3 = 0
             |    AND (l_orderkey % 2 = 0
             |      OR l_orderkey % 5 = 0 OR l_extendedprice < 90000.0)),
             |dim AS (
             |  SELECT n_nationkey AS dkey,
             |         CASE WHEN n_nationkey < 5 THEN n_name || '_MOVED'
             |              ELSE n_name END AS region
             |  FROM nation)
             |SELECT region, okey, ln, price, rn FROM (
             |  SELECT region, okey, ln, price,
             |    ROW_NUMBER() OVER (PARTITION BY region
             |      ORDER BY price DESC, okey, ln) AS rn
             |  FROM fact JOIN dim ON dk = dkey)
             |WHERE rn <= 3 ORDER BY region, rn""".stripMargin)),

    // WINDOW OVER AN AGGREGATE SUBQUERY (round 17): the DUAL of q127 —
    // the rank-over-rollup dashboard ("top-3 buckets per returnflag by
    // their total revenue"). One CREATE auto-cascades: the aggregate
    // registers as a hidden INCREMENTAL agg MV <name>__a and the
    // user's MV as a window over its storage changelog; ONE refresh
    // call maintains base → rollup → ranks, each level O(changes).
    "q134_mview_window_over_agg" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq134").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq134", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq134.warehouse",
            Files.createTempDirectory("graft-mview-woa").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq134.bench")
        s.sql("CALL graftq134.system.drop_mview('bench', 'woa')")
        s.sql("DROP TABLE IF EXISTS graftq134.bench.li")
        // price as exact DECIMAL so the rollup's SUM — the window's
        // rank ORDER — is bit-identical between the incrementally
        // maintained inner MV and DuckDB's recompute (a double SUM
        // could flip a rank on ulp drift)
        s.sql("""CREATE TABLE graftq134.bench.li
                |(okey BIGINT, ln INT, flag STRING, price DECIMAL(12,2), qty DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        t(s, dir, "lineitem").createOrReplaceTempView("q134_li")
        s.sql("""INSERT INTO graftq134.bench.li
                |SELECT l_orderkey, l_linenumber, l_returnflag,
                |       CAST(l_extendedprice AS DECIMAL(12,2)), l_quantity
                |FROM q134_li WHERE l_orderkey % 2 = 0""".stripMargin)
        val mode = s.sql(
          """CALL graftq134.system.create_mview('bench', 'woa',
            |  'SELECT flag, bkt, rev, rn FROM (
            |     SELECT flag, bkt, rev,
            |       ROW_NUMBER() OVER (PARTITION BY flag
            |         ORDER BY rev DESC, bkt) AS rn
            |     FROM (SELECT flag, okey % 50 AS bkt, SUM(price) AS rev
            |           FROM graftq134.bench.li WHERE qty > 1.0
            |           GROUP BY flag, okey % 50))
            |   WHERE rn <= 3')""".stripMargin).head.getString(0)
        require(mode == "window",
          s"window-over-aggregate MV must auto-cascade to window mode, got $mode")
        s.sql("""INSERT INTO graftq134.bench.li
                |SELECT l_orderkey, l_linenumber, l_returnflag,
                |       CAST(l_extendedprice AS DECIMAL(12,2)), l_quantity
                |FROM q134_li WHERE l_orderkey % 2 = 1""".stripMargin)
        s.sql("DELETE FROM graftq134.bench.li WHERE qty >= 46.0")
        s.sql("DELETE FROM graftq134.bench.li WHERE okey <= 300")
        val action = s.sql(
          "CALL graftq134.system.refresh_mview('bench', 'woa', false)")
          .head.getString(2)
        require(action == "incremental", s"expected incremental refresh, got $action")
        // the hidden aggregate level must have kept up (one-call cascade)
        val dash = s.sql("CALL graftq134.system.mviews('bench')").collect()
          .map(r => (r.getString(0), r.getInt(5))).toMap
        require(dash("woa__a") == 0,
          s"hidden aggregate level is ${dash("woa__a")} versions behind after cascade")
        s.sql("""SELECT flag, bkt, CAST(rev AS DOUBLE) AS rev, rn
                |FROM graftq134.bench.woa
                |ORDER BY flag, rn""".stripMargin)
      },
      Some("""WITH agg AS (
             |  SELECT l_returnflag AS flag, l_orderkey % 50 AS bkt,
             |         SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
             |  FROM lineitem
             |  WHERE l_quantity > 1.0 AND l_quantity < 46.0 AND l_orderkey > 300
             |  GROUP BY 1, 2),
             |w AS (
             |  SELECT flag, bkt, rev,
             |    ROW_NUMBER() OVER (PARTITION BY flag
             |      ORDER BY rev DESC, bkt) AS rn
             |  FROM agg)
             |SELECT flag, bkt, CAST(rev AS DOUBLE) AS rev, rn
             |FROM w WHERE rn <= 3
             |ORDER BY flag, rn""".stripMargin)),

    // AGGREGATE OVER A WINDOW SUBQUERY (round-17 #4): one CREATE
    // auto-cascades — the top-N subquery registers as a hidden window
    // MV and the aggregate as an MV over its storage; ONE refresh call
    // maintains both levels incrementally (window level by affected-
    // group recompute, aggregate level off the storage changelog).
    "q127_mview_agg_over_window" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq127").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq127", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq127.warehouse",
            Files.createTempDirectory("graft-mview-aow").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq127.bench")
        s.sql("CALL graftq127.system.drop_mview('bench', 'aow')")
        s.sql("DROP TABLE IF EXISTS graftq127.bench.li")
        s.sql("""CREATE TABLE graftq127.bench.li
                |(okey BIGINT, ln INT, flag STRING, price DOUBLE, qty DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        t(s, dir, "lineitem").createOrReplaceTempView("q127_li")
        s.sql("""INSERT INTO graftq127.bench.li
                |SELECT l_orderkey, l_linenumber, l_returnflag,
                |       l_extendedprice, l_quantity
                |FROM q127_li WHERE l_orderkey % 2 = 0""".stripMargin)
        val mode = s.sql(
          """CALL graftq127.system.create_mview('bench', 'aow',
            |  'SELECT flag, SUM(price) AS sp, COUNT(*) AS n FROM (
            |     SELECT flag, price,
            |       ROW_NUMBER() OVER (PARTITION BY flag
            |         ORDER BY price DESC, okey, ln) AS rn
            |     FROM graftq127.bench.li WHERE qty > 1.0)
            |   WHERE rn <= 10 GROUP BY flag')""".stripMargin).head.getString(0)
        require(mode == "incremental",
          s"agg-over-window MV must auto-cascade to incremental, got $mode")
        s.sql("""INSERT INTO graftq127.bench.li
                |SELECT l_orderkey, l_linenumber, l_returnflag,
                |       l_extendedprice, l_quantity
                |FROM q127_li WHERE l_orderkey % 2 = 1""".stripMargin)
        s.sql("DELETE FROM graftq127.bench.li WHERE qty >= 46.0")
        s.sql("DELETE FROM graftq127.bench.li WHERE okey <= 300")
        val action = s.sql(
          "CALL graftq127.system.refresh_mview('bench', 'aow', false)")
          .head.getString(2)
        require(action == "incremental", s"expected incremental refresh, got $action")
        // the hidden window level must have kept up (one-call cascade)
        val dash = s.sql("CALL graftq127.system.mviews('bench')").collect()
          .map(r => (r.getString(0), r.getInt(5))).toMap
        require(dash("aow__w") == 0,
          s"hidden window level is ${dash("aow__w")} versions behind after cascade")
        s.sql("SELECT flag, sp, n FROM graftq127.bench.aow ORDER BY flag")
      },
      Some("""WITH src AS (
             |  SELECT l_returnflag AS flag, l_orderkey AS okey,
             |         l_linenumber AS ln, l_extendedprice AS price
             |  FROM lineitem
             |  WHERE l_quantity > 1.0 AND l_quantity < 46.0 AND l_orderkey > 300),
             |w AS (
             |  SELECT flag, price,
             |    ROW_NUMBER() OVER (PARTITION BY flag
             |      ORDER BY price DESC, okey, ln) AS rn
             |  FROM src)
             |SELECT flag, SUM(price) AS sp, COUNT(*) AS n
             |FROM w WHERE rn <= 10 GROUP BY flag ORDER BY flag""".stripMargin)),

    // FULL OUTER over a SHARDED UNION ALL fact (round 18, r17 stretch
    // #7): union is linear leg by leg, so the FULL slice term unions
    // every leg's slice (per-leg WHERE/SELECT included) and the
    // dim-side NULL-extension flip probes read the union'd fact at the
    // per-leg FROM pins and at the head — incremental through churn on
    // both shards AND the FULL dim in one refresh window.
    "q139_mview_full_union" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq139").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq139", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq139.warehouse",
            Files.createTempDirectory("graft-mview-fu").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq139.bench")
        s.sql("CALL graftq139.system.drop_mview('bench', 'fu')")
        t(s, dir, "lineitem").createOrReplaceTempView("q139_li")
        t(s, dir, "orders").createOrReplaceTempView("q139_ord")
        s.sql("DROP TABLE IF EXISTS graftq139.bench.s0")
        s.sql("DROP TABLE IF EXISTS graftq139.bench.s1")
        s.sql("DROP TABLE IF EXISTS graftq139.bench.ord")
        s.sql("""CREATE TABLE graftq139.bench.s0
                |(okey BIGINT, qty DECIMAL(12,2))
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        // divergent shard schema: the per-leg SELECT renames both cols
        s.sql("""CREATE TABLE graftq139.bench.s1
                |(oid BIGINT, qty2 DECIMAL(12,2))
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        s.sql("""CREATE TABLE graftq139.bench.ord
                |(okeyd BIGINT, pri STRING)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        s.sql("""INSERT INTO graftq139.bench.s0
                |SELECT l_orderkey, l_quantity FROM q139_li
                |WHERE l_orderkey % 2 = 0 AND l_orderkey % 5 != 0""".stripMargin)
        s.sql("""INSERT INTO graftq139.bench.s1
                |SELECT l_orderkey, l_quantity FROM q139_li
                |WHERE l_orderkey % 2 = 1""".stripMargin)
        s.sql("""INSERT INTO graftq139.bench.ord
                |SELECT o_orderkey, o_orderpriority FROM q139_ord
                |WHERE o_orderkey % 3 != 0""".stripMargin)
        val mode = s.sql(
          """CALL graftq139.system.create_mview('bench', 'fu',
            |  'SELECT pri, CAST(SUM(qty) AS DOUBLE) AS sq, COUNT(*) AS n
            |   FROM (SELECT okey, qty FROM graftq139.bench.s0
            |         UNION ALL
            |         SELECT oid AS okey, qty2 AS qty FROM graftq139.bench.s1)
            |     FULL OUTER JOIN graftq139.bench.ord ON okey = okeyd
            |   GROUP BY pri')""".stripMargin).head.getString(0)
        require(mode == "incremental",
          s"FULL-over-union MV must register incremental, got $mode")
        // both shards AND the dim move before one refresh: late
        // arrivals on s0, a MoR band delete on s1 (partners re-extend),
        // missing orders arrive and a priority is wiped
        s.sql("""INSERT INTO graftq139.bench.s0
                |SELECT l_orderkey, l_quantity FROM q139_li
                |WHERE l_orderkey % 2 = 0 AND l_orderkey % 5 = 0""".stripMargin)
        s.sql("DELETE FROM graftq139.bench.s1 WHERE qty2 >= 40.0")
        s.sql("""INSERT INTO graftq139.bench.ord
                |SELECT o_orderkey, o_orderpriority FROM q139_ord
                |WHERE o_orderkey % 3 = 0""".stripMargin)
        s.sql("DELETE FROM graftq139.bench.ord WHERE pri = '2-HIGH'")
        val a1 = s.sql("CALL graftq139.system.refresh_mview('bench', 'fu', false)")
          .head.getString(2)
        require(a1 == "incremental",
          s"expected incremental FULL-over-union refresh, got $a1")
        s.sql("""SELECT pri, sq, n FROM graftq139.bench.fu
                |ORDER BY pri NULLS FIRST""".stripMargin)
      },
      Some("""WITH fact AS (
             |  SELECT l_orderkey AS okey,
             |         CAST(l_quantity AS DECIMAL(12,2)) AS qty
             |  FROM lineitem
             |  WHERE l_orderkey % 2 = 0
             |     OR (l_orderkey % 2 = 1 AND l_quantity < 40.0)),
             |ord AS (
             |  SELECT o_orderkey AS okeyd, o_orderpriority AS pri
             |  FROM orders WHERE o_orderpriority <> '2-HIGH')
             |SELECT pri, CAST(SUM(qty) AS DOUBLE) AS sq, COUNT(*) AS n
             |FROM fact FULL OUTER JOIN ord ON okey = okeyd
             |GROUP BY pri ORDER BY pri NULLS FIRST""".stripMargin)),

    // FULL OUTER join UNDER A WINDOW MV (round 18, closes r17 verdict
    // #5): both sides' NULL extensions participate in the ranked groups
    // — dim-side extensions own their dim-derived key (here: the
    // priority group ranks order rows with no lineitems), fact-side
    // extensions land in the NULL group — and refresh stays incremental
    // through BOTH-side MoR churn: the touched-key derivation adds
    // dedicated extension terms (slice-matched dim rows NULL-extended
    // on the fact side; the dim slice's own extension keys).
    "q137_mview_full_window" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq137").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq137", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq137.warehouse",
            Files.createTempDirectory("graft-mview-fw").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq137.bench")
        s.sql("CALL graftq137.system.drop_mview('bench', 'fw')")
        t(s, dir, "lineitem").createOrReplaceTempView("q137_li")
        t(s, dir, "orders").createOrReplaceTempView("q137_ord")
        s.sql("DROP TABLE IF EXISTS graftq137.bench.li")
        s.sql("DROP TABLE IF EXISTS graftq137.bench.ord")
        s.sql("""CREATE TABLE graftq137.bench.li
                |(okey BIGINT, ln INT, qty DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        s.sql("""CREATE TABLE graftq137.bench.ord
                |(okeyd BIGINT, pri STRING)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        s.sql("""INSERT INTO graftq137.bench.li
                |SELECT l_orderkey, l_linenumber, l_quantity
                |FROM q137_li WHERE l_quantity < 45.0 AND l_orderkey % 2 = 0""".stripMargin)
        s.sql("""INSERT INTO graftq137.bench.ord
                |SELECT o_orderkey, o_orderpriority FROM q137_ord
                |WHERE o_orderkey % 3 != 0""".stripMargin)
        val mode = s.sql(
          """CALL graftq137.system.create_mview('bench', 'fw',
            |  'SELECT pri, okey, ln, qty, rn FROM (
            |     SELECT pri, okey, ln, qty,
            |       ROW_NUMBER() OVER (PARTITION BY pri
            |         ORDER BY qty DESC NULLS LAST, okey, ln, okeyd) AS rn
            |     FROM graftq137.bench.li FULL JOIN graftq137.bench.ord
            |       ON okey = okeyd
            |   ) WHERE rn <= 2')""".stripMargin).head.getString(0)
        require(mode == "window",
          s"FULL-join window MV must register in window mode, got $mode")
        // fact side: late arrivals + a MoR band delete that re-extends
        // order partners with NULLs
        s.sql("""INSERT INTO graftq137.bench.li
                |SELECT l_orderkey, l_linenumber, l_quantity
                |FROM q137_li WHERE l_quantity < 45.0 AND l_orderkey % 2 = 1""".stripMargin)
        s.sql("DELETE FROM graftq137.bench.li WHERE qty >= 40.0")
        val a1 = s.sql("CALL graftq137.system.refresh_mview('bench', 'fw', false)")
          .head.getString(2)
        require(a1 == "incremental",
          s"expected incremental FULL-window refresh after fact churn, got $a1")
        // dim side: missing orders arrive (their extensions retract or
        // flip fact extensions to matched) + a MoR priority wipe whose
        // matched facts re-extend into the NULL group
        s.sql("""INSERT INTO graftq137.bench.ord
                |SELECT o_orderkey, o_orderpriority FROM q137_ord
                |WHERE o_orderkey % 3 = 0""".stripMargin)
        s.sql("DELETE FROM graftq137.bench.ord WHERE pri = '2-HIGH'")
        val a2 = s.sql("CALL graftq137.system.refresh_mview('bench', 'fw', false)")
          .head.getString(2)
        require(a2 == "incremental",
          s"expected incremental FULL-window refresh after dim churn, got $a2")
        s.sql("""SELECT pri, okey, ln, qty, rn FROM graftq137.bench.fw
                |ORDER BY pri NULLS FIRST, rn""".stripMargin)
      },
      Some("""WITH li AS (
             |  SELECT l_orderkey AS okey, l_linenumber AS ln, l_quantity AS qty
             |  FROM lineitem WHERE l_quantity < 40.0),
             |ord AS (
             |  SELECT o_orderkey AS okeyd, o_orderpriority AS pri
             |  FROM orders WHERE o_orderpriority <> '2-HIGH')
             |SELECT pri, okey, ln, qty, rn FROM (
             |  SELECT pri, okey, ln, qty,
             |    ROW_NUMBER() OVER (PARTITION BY pri
             |      ORDER BY qty DESC NULLS LAST, okey, ln, okeyd) AS rn
             |  FROM li FULL OUTER JOIN ord ON okey = okeyd
             |) WHERE rn <= 2 ORDER BY pri NULLS FIRST, rn""".stripMargin)),

    // FULL OUTER + SUFFIX DIMS under a window MV (round 19, closes r18
    // verdict #3): the FULL join composes with a further LEFT dim whose
    // condition references the FULL DIM's column and whose column IS
    // the partition key — extension rows thread through the suffix
    // chain (dim-side extensions carry real suffix matches; fact-side
    // extensions NULL-extend into the NULL band) and refresh stays
    // incremental through three-side churn: fact late-arrivals + MoR
    // band delete, FULL-dim arrivals + a priority wipe, and a suffix
    // relabel that moves a whole partition plus a suffix delete that
    // births a NULL-band group.
    "q141_mview_full_suffix" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq141").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq141", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq141.warehouse",
            Files.createTempDirectory("graft-mview-fsx").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq141.bench")
        s.sql("CALL graftq141.system.drop_mview('bench', 'fsx')")
        t(s, dir, "lineitem").createOrReplaceTempView("q141_li")
        t(s, dir, "orders").createOrReplaceTempView("q141_ord")
        s.sql("DROP TABLE IF EXISTS graftq141.bench.li")
        s.sql("DROP TABLE IF EXISTS graftq141.bench.ord")
        s.sql("DROP TABLE IF EXISTS graftq141.bench.bands")
        s.sql("""CREATE TABLE graftq141.bench.li
                |(okey BIGINT, ln INT, qty DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        s.sql("""CREATE TABLE graftq141.bench.ord
                |(okeyd BIGINT, pri STRING)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        s.sql("CREATE TABLE graftq141.bench.bands (pri2 STRING, band STRING)")
        s.sql("""INSERT INTO graftq141.bench.li
                |SELECT l_orderkey, l_linenumber, l_quantity
                |FROM q141_li WHERE l_quantity < 45.0 AND l_orderkey % 2 = 0""".stripMargin)
        s.sql("""INSERT INTO graftq141.bench.ord
                |SELECT o_orderkey, o_orderpriority FROM q141_ord
                |WHERE o_orderkey % 3 != 0""".stripMargin)
        s.sql("""INSERT INTO graftq141.bench.bands VALUES
                |('1-URGENT', 'hot'), ('2-HIGH', 'hot'), ('3-MEDIUM', 'warm'),
                |('4-NOT SPECIFIED', 'cold'), ('5-LOW', 'cold')""".stripMargin)
        val mode = s.sql(
          """CALL graftq141.system.create_mview('bench', 'fsx',
            |  'SELECT band, pri, okey, ln, qty, rn FROM (
            |     SELECT band, pri, okey, ln, qty,
            |       ROW_NUMBER() OVER (PARTITION BY band
            |         ORDER BY qty DESC NULLS LAST, okey, ln, okeyd) AS rn
            |     FROM graftq141.bench.li FULL JOIN graftq141.bench.ord
            |       ON okey = okeyd
            |     LEFT JOIN graftq141.bench.bands ON pri = pri2
            |   ) WHERE rn <= 3')""".stripMargin).head.getString(0)
        require(mode == "window",
          s"FULL+suffix window MV must register in window mode, got $mode")
        // fact churn
        s.sql("""INSERT INTO graftq141.bench.li
                |SELECT l_orderkey, l_linenumber, l_quantity
                |FROM q141_li WHERE l_quantity < 45.0 AND l_orderkey % 2 = 1""".stripMargin)
        s.sql("DELETE FROM graftq141.bench.li WHERE qty >= 40.0")
        val a1 = s.sql("CALL graftq141.system.refresh_mview('bench', 'fsx', false)")
          .head.getString(2)
        require(a1 == "incremental",
          s"expected incremental refresh after fact churn, got $a1")
        // FULL-dim churn
        s.sql("""INSERT INTO graftq141.bench.ord
                |SELECT o_orderkey, o_orderpriority FROM q141_ord
                |WHERE o_orderkey % 3 = 0""".stripMargin)
        s.sql("DELETE FROM graftq141.bench.ord WHERE pri = '2-HIGH'")
        val a2 = s.sql("CALL graftq141.system.refresh_mview('bench', 'fsx', false)")
          .head.getString(2)
        require(a2 == "incremental",
          s"expected incremental refresh after FULL-dim churn, got $a2")
        // suffix churn: a relabel moves the whole 5-LOW partition from
        // cold to warm; the delete drops 4-NOT SPECIFIED into NULL band
        s.sql("UPDATE graftq141.bench.bands SET band = 'warm' WHERE pri2 = '5-LOW'")
        s.sql("DELETE FROM graftq141.bench.bands WHERE pri2 = '4-NOT SPECIFIED'")
        val a3 = s.sql("CALL graftq141.system.refresh_mview('bench', 'fsx', false)")
          .head.getString(2)
        require(a3 == "incremental",
          s"expected incremental refresh after suffix churn, got $a3")
        s.sql("""SELECT band, pri, okey, ln, qty, rn FROM graftq141.bench.fsx
                |ORDER BY band NULLS FIRST, rn, okey""".stripMargin)
      },
      Some("""WITH li AS (
             |  SELECT l_orderkey AS okey, l_linenumber AS ln, l_quantity AS qty
             |  FROM lineitem WHERE l_quantity < 40.0),
             |ord AS (
             |  SELECT o_orderkey AS okeyd, o_orderpriority AS pri
             |  FROM orders WHERE o_orderpriority <> '2-HIGH'),
             |bands AS (
             |  SELECT '1-URGENT' AS pri2, 'hot' AS band
             |  UNION ALL SELECT '2-HIGH', 'hot'
             |  UNION ALL SELECT '3-MEDIUM', 'warm'
             |  UNION ALL SELECT '5-LOW', 'warm')
             |SELECT band, pri, okey, ln, qty, rn FROM (
             |  SELECT band, pri, okey, ln, qty,
             |    ROW_NUMBER() OVER (PARTITION BY band
             |      ORDER BY qty DESC NULLS LAST, okey, ln, okeyd) AS rn
             |  FROM li FULL OUTER JOIN ord ON okey = okeyd
             |  LEFT JOIN bands ON pri = pri2
             |) WHERE rn <= 3 ORDER BY band NULLS FIRST, rn, okey""".stripMargin)),

    // SPARSE-CHURN variant of the FULL-window shape (round 19, closes
    // r18 verdict #2b): a HIGH-cardinality dim-side partition key
    // (grp = okey div 64) and churn confined to a bounded key range
    // (okey < 20000 — CONSTANT across scale factors), so refresh cost
    // tracks O(touched groups), not O(all groups). The same shape is
    // measured per-phase at sf0.1 vs sf1 by graft.tools.SparseChurnBench.
    "q142_mview_full_window_sparse" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq142").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq142", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq142.warehouse",
            Files.createTempDirectory("graft-mview-fws").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq142.bench")
        s.sql("CALL graftq142.system.drop_mview('bench', 'fws')")
        t(s, dir, "lineitem").createOrReplaceTempView("q142_li")
        t(s, dir, "orders").createOrReplaceTempView("q142_ord")
        s.sql("DROP TABLE IF EXISTS graftq142.bench.li")
        s.sql("DROP TABLE IF EXISTS graftq142.bench.ord")
        s.sql("""CREATE TABLE graftq142.bench.li
                |(okey BIGINT, ln INT, qty DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        s.sql("""CREATE TABLE graftq142.bench.ord
                |(okeyd BIGINT, grp BIGINT)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        s.sql("""INSERT INTO graftq142.bench.li
                |SELECT l_orderkey, l_linenumber, l_quantity
                |FROM q142_li WHERE l_quantity < 45.0 AND l_orderkey % 2 = 0""".stripMargin)
        s.sql("""INSERT INTO graftq142.bench.ord
                |SELECT o_orderkey, o_orderkey DIV 64 FROM q142_ord
                |WHERE o_orderkey % 3 != 0""".stripMargin)
        val mode = s.sql(
          """CALL graftq142.system.create_mview('bench', 'fws',
            |  'SELECT grp, okey, ln, qty, rn FROM (
            |     SELECT grp, okey, ln, qty,
            |       ROW_NUMBER() OVER (PARTITION BY grp
            |         ORDER BY qty DESC NULLS LAST, okey, ln, okeyd) AS rn
            |     FROM graftq142.bench.li FULL JOIN graftq142.bench.ord
            |       ON okey = okeyd
            |   ) WHERE rn <= 2')""".stripMargin).head.getString(0)
        require(mode == "window",
          s"sparse FULL-window MV must register in window mode, got $mode")
        // sparse fact churn: a bounded key range, constant across SFs
        s.sql("""INSERT INTO graftq142.bench.li
                |SELECT l_orderkey, l_linenumber, l_quantity FROM q142_li
                |WHERE l_quantity < 45.0 AND l_orderkey % 2 = 1
                |  AND l_orderkey < 20000""".stripMargin)
        s.sql("DELETE FROM graftq142.bench.li WHERE qty >= 40.0 AND okey < 5000")
        val a1 = s.sql("CALL graftq142.system.refresh_mview('bench', 'fws', false)")
          .head.getString(2)
        require(a1 == "incremental",
          s"expected incremental sparse-fact refresh, got $a1")
        // sparse dim churn
        s.sql("""INSERT INTO graftq142.bench.ord
                |SELECT o_orderkey, o_orderkey DIV 64 FROM q142_ord
                |WHERE o_orderkey % 3 = 0 AND o_orderkey < 20000""".stripMargin)
        s.sql("DELETE FROM graftq142.bench.ord WHERE okeyd >= 1000 AND okeyd < 1300")
        val a2 = s.sql("CALL graftq142.system.refresh_mview('bench', 'fws', false)")
          .head.getString(2)
        require(a2 == "incremental",
          s"expected incremental sparse-dim refresh, got $a2")
        s.sql("""SELECT grp, okey, ln, qty, rn FROM graftq142.bench.fws
                |ORDER BY grp NULLS FIRST, rn, okey""".stripMargin)
      },
      Some("""WITH li AS (
             |  SELECT l_orderkey AS okey, l_linenumber AS ln, l_quantity AS qty
             |  FROM lineitem
             |  WHERE l_quantity < 45.0
             |    AND (l_orderkey % 2 = 0
             |         OR (l_orderkey % 2 = 1 AND l_orderkey < 20000))
             |    AND NOT (l_quantity >= 40.0 AND l_orderkey < 5000)),
             |ord AS (
             |  SELECT o_orderkey AS okeyd, o_orderkey // 64 AS grp
             |  FROM orders
             |  WHERE (o_orderkey % 3 != 0 OR o_orderkey < 20000)
             |    AND NOT (o_orderkey >= 1000 AND o_orderkey < 1300))
             |SELECT grp, okey, ln, qty, rn FROM (
             |  SELECT grp, okey, ln, qty,
             |    ROW_NUMBER() OVER (PARTITION BY grp
             |      ORDER BY qty DESC NULLS LAST, okey, ln, okeyd) AS rn
             |  FROM li FULL OUTER JOIN ord ON okey = okeyd
             |) WHERE rn <= 2 ORDER BY grp NULLS FIRST, rn, okey""".stripMargin)),

    // SPARSE-CHURN variant of the FULL-over-union agg shape (round 19,
    // closes r18 verdict #2b): high-cardinality group key, bounded-range
    // churn on both shards and the FULL dim before ONE incremental
    // refresh. Per-phase sf0.1-vs-sf1 ratios come from
    // graft.tools.SparseChurnBench.
    "q143_mview_full_union_sparse" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq143").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq143", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq143.warehouse",
            Files.createTempDirectory("graft-mview-fus").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq143.bench")
        s.sql("CALL graftq143.system.drop_mview('bench', 'fus')")
        t(s, dir, "lineitem").createOrReplaceTempView("q143_li")
        t(s, dir, "orders").createOrReplaceTempView("q143_ord")
        s.sql("DROP TABLE IF EXISTS graftq143.bench.s0")
        s.sql("DROP TABLE IF EXISTS graftq143.bench.s1")
        s.sql("DROP TABLE IF EXISTS graftq143.bench.ord")
        s.sql("""CREATE TABLE graftq143.bench.s0
                |(okey BIGINT, qty DECIMAL(12,2))
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        s.sql("""CREATE TABLE graftq143.bench.s1
                |(oid BIGINT, qty2 DECIMAL(12,2))
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        s.sql("""CREATE TABLE graftq143.bench.ord
                |(okeyd BIGINT, grp BIGINT)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        s.sql("""INSERT INTO graftq143.bench.s0
                |SELECT l_orderkey, l_quantity FROM q143_li
                |WHERE l_orderkey % 2 = 0 AND l_orderkey % 5 != 0""".stripMargin)
        s.sql("""INSERT INTO graftq143.bench.s1
                |SELECT l_orderkey, l_quantity FROM q143_li
                |WHERE l_orderkey % 2 = 1""".stripMargin)
        s.sql("""INSERT INTO graftq143.bench.ord
                |SELECT o_orderkey, o_orderkey DIV 64 FROM q143_ord
                |WHERE o_orderkey % 3 != 0""".stripMargin)
        val mode = s.sql(
          """CALL graftq143.system.create_mview('bench', 'fus',
            |  'SELECT grp, CAST(SUM(qty) AS DOUBLE) AS sq, COUNT(*) AS n
            |   FROM (SELECT okey, qty FROM graftq143.bench.s0
            |         UNION ALL
            |         SELECT oid AS okey, qty2 AS qty FROM graftq143.bench.s1)
            |     FULL OUTER JOIN graftq143.bench.ord ON okey = okeyd
            |   GROUP BY grp')""".stripMargin).head.getString(0)
        require(mode == "incremental",
          s"sparse FULL-over-union MV must register incremental, got $mode")
        // bounded-range churn on both shards and the dim, ONE refresh
        s.sql("""INSERT INTO graftq143.bench.s0
                |SELECT l_orderkey, l_quantity FROM q143_li
                |WHERE l_orderkey % 2 = 0 AND l_orderkey % 5 = 0
                |  AND l_orderkey < 20000""".stripMargin)
        s.sql("DELETE FROM graftq143.bench.s1 WHERE qty2 >= 45.0 AND oid < 5000")
        s.sql("""INSERT INTO graftq143.bench.ord
                |SELECT o_orderkey, o_orderkey DIV 64 FROM q143_ord
                |WHERE o_orderkey % 3 = 0 AND o_orderkey < 20000""".stripMargin)
        s.sql("DELETE FROM graftq143.bench.ord WHERE okeyd >= 1000 AND okeyd < 1300")
        val a1 = s.sql("CALL graftq143.system.refresh_mview('bench', 'fus', false)")
          .head.getString(2)
        require(a1 == "incremental",
          s"expected incremental sparse FULL-over-union refresh, got $a1")
        s.sql("""SELECT grp, sq, n FROM graftq143.bench.fus
                |ORDER BY grp NULLS FIRST""".stripMargin)
      },
      Some("""WITH fact AS (
             |  SELECT l_orderkey AS okey,
             |         CAST(l_quantity AS DECIMAL(12,2)) AS qty
             |  FROM lineitem
             |  WHERE (l_orderkey % 2 = 0
             |         AND (l_orderkey % 5 != 0 OR l_orderkey < 20000))
             |     OR (l_orderkey % 2 = 1
             |         AND NOT (l_quantity >= 45.0 AND l_orderkey < 5000))),
             |ord AS (
             |  SELECT o_orderkey AS okeyd, o_orderkey // 64 AS grp
             |  FROM orders
             |  WHERE (o_orderkey % 3 != 0 OR o_orderkey < 20000)
             |    AND NOT (o_orderkey >= 1000 AND o_orderkey < 1300))
             |SELECT grp, CAST(SUM(qty) AS DOUBLE) AS sq, COUNT(*) AS n
             |FROM fact FULL OUTER JOIN ord ON okey = okeyd
             |GROUP BY grp ORDER BY grp NULLS FIRST""".stripMargin)),

    // WINDOW-OVER-AGGREGATE CASCADE with a SHARDED UNION ALL inner fact
    // (round 18, closes r17 verdict #6): the cascade renderer now
    // renders union'd facts per leg, so the hidden inner aggregate
    // registers INCREMENTALLY over two MoR shard tables (per-leg pins)
    // and the user's rank-over-rollup window maintains over its storage
    // changelog — both levels O(changes) from one CREATE, through churn
    // on both shards in one refresh.
    "q138_mview_cascade_union" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq138").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq138", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq138.warehouse",
            Files.createTempDirectory("graft-mview-cu").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq138.bench")
        s.sql("CALL graftq138.system.drop_mview('bench', 'cu')")
        t(s, dir, "lineitem").createOrReplaceTempView("q138_li")
        s.sql("DROP TABLE IF EXISTS graftq138.bench.s0")
        s.sql("DROP TABLE IF EXISTS graftq138.bench.s1")
        // price lands as DECIMAL(12,2): the rank orders by a SUM, and
        // raw double sums differ across engines by addition order —
        // sum exact, convert once to double (the dsum idiom)
        s.sql("""CREATE TABLE graftq138.bench.s0
                |(flag STRING, bkt BIGINT, price DECIMAL(12,2))
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        s.sql("""CREATE TABLE graftq138.bench.s1
                |(flag STRING, bkt BIGINT, price DECIMAL(12,2))
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        s.sql("""INSERT INTO graftq138.bench.s0
                |SELECT l_returnflag, l_suppkey % 20, l_extendedprice
                |FROM q138_li WHERE l_orderkey % 2 = 0 AND l_orderkey % 7 != 0""".stripMargin)
        s.sql("""INSERT INTO graftq138.bench.s1
                |SELECT l_returnflag, l_suppkey % 20, l_extendedprice
                |FROM q138_li WHERE l_orderkey % 2 = 1 AND l_orderkey % 7 != 0""".stripMargin)
        val mode = s.sql(
          """CALL graftq138.system.create_mview('bench', 'cu',
            |  'SELECT flag, bkt, sp, rn FROM (
            |     SELECT flag, bkt, sp, ROW_NUMBER() OVER (PARTITION BY flag
            |       ORDER BY sp DESC, bkt) AS rn
            |     FROM (SELECT flag, bkt, CAST(SUM(price) AS DOUBLE) AS sp FROM (
            |             SELECT flag, bkt, price FROM graftq138.bench.s0
            |             UNION ALL
            |             SELECT flag, bkt, price FROM graftq138.bench.s1)
            |           GROUP BY flag, bkt)
            |   ) WHERE rn <= 3')""".stripMargin).head.getString(0)
        require(mode == "window",
          s"sharded window-over-agg cascade must register in window mode, got $mode")
        // the hidden inner registered INCREMENTALLY over the union
        val modes = s.sql("CALL graftq138.system.mviews('bench')").collect()
          .map(r => (r.getString(0), r.getString(1))).toMap
        require(modes("cu__a") == "incremental",
          s"hidden union aggregate must be incremental, got ${modes("cu__a")}")
        // late arrivals on shard 0 + a MoR band delete on shard 1 in
        // ONE cascaded refresh
        s.sql("""INSERT INTO graftq138.bench.s0
                |SELECT l_returnflag, l_suppkey % 20, l_extendedprice
                |FROM q138_li WHERE l_orderkey % 2 = 0 AND l_orderkey % 7 = 0""".stripMargin)
        s.sql("DELETE FROM graftq138.bench.s1 WHERE price >= 80000.0")
        val a1 = s.sql("CALL graftq138.system.refresh_mview('bench', 'cu', false)")
          .head.getString(2)
        require(a1 == "incremental", s"expected incremental cascade refresh, got $a1")
        s.sql("SELECT flag, bkt, sp, rn FROM graftq138.bench.cu ORDER BY flag, rn")
      },
      Some("""WITH src AS (
             |  SELECT l_returnflag AS flag, l_suppkey % 20 AS bkt,
             |         CAST(l_extendedprice AS DECIMAL(12,2)) AS price
             |  FROM lineitem
             |  WHERE l_orderkey % 2 = 0
             |     OR (l_orderkey % 7 != 0 AND l_extendedprice < 80000.0)),
             |agg AS (SELECT flag, bkt, CAST(SUM(price) AS DOUBLE) AS sp
             |        FROM src GROUP BY flag, bkt),
             |w AS (
             |  SELECT flag, bkt, sp, ROW_NUMBER() OVER (PARTITION BY flag
             |    ORDER BY sp DESC, bkt) AS rn
             |  FROM agg)
             |SELECT flag, bkt, sp, rn FROM w WHERE rn <= 3
             |ORDER BY flag, rn""".stripMargin)),

    // RIGHT OUTER join MV (round-17 #5): `l RIGHT JOIN r` rewrites to
    // `r LEFT JOIN l` at shape analysis — the preserved side (orders)
    // becomes the FACT whose changelog drives refresh, and the original
    // fact (lineitem) becomes a LEFT dim maintained by the telescoped
    // matched part + NULL-extension flip terms. Incremental through
    // mutations on BOTH sides.
    "q128_mview_right_join" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq128").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq128", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq128.warehouse",
            Files.createTempDirectory("graft-mview-rjoin").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq128.bench")
        s.sql("CALL graftq128.system.drop_mview('bench', 'rp')")
        s.sql("DROP TABLE IF EXISTS graftq128.bench.li")
        s.sql("DROP TABLE IF EXISTS graftq128.bench.ord")
        s.sql("""CREATE TABLE graftq128.bench.li
                |(l_orderkey BIGINT, qty DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        s.sql("""CREATE TABLE graftq128.bench.ord
                |(okey BIGINT, pri STRING)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        t(s, dir, "orders").createOrReplaceTempView("q128_ord")
        t(s, dir, "lineitem").createOrReplaceTempView("q128_li")
        s.sql("""INSERT INTO graftq128.bench.ord
                |SELECT o_orderkey, o_orderpriority FROM q128_ord
                |WHERE o_orderkey % 3 != 0""".stripMargin)
        s.sql("""INSERT INTO graftq128.bench.li
                |SELECT l_orderkey, l_quantity
                |FROM q128_li WHERE l_orderkey % 2 = 0""".stripMargin)
        val mode = s.sql(
          """CALL graftq128.system.create_mview('bench', 'rp',
            |  'SELECT pri, SUM(qty) AS sq, COUNT(*) AS n
            |   FROM graftq128.bench.li RIGHT JOIN graftq128.bench.ord
            |     ON l_orderkey = okey
            |   GROUP BY pri')""".stripMargin).head.getString(0)
        require(mode == "incremental",
          s"RIGHT-join MV must register incremental (LEFT rewrite), got $mode")
        // mutate the ORIGINAL fact — now the left dim: flip terms fire
        // (orders whose last lineitem vanishes re-extend with NULLs)
        s.sql("""INSERT INTO graftq128.bench.li
                |SELECT l_orderkey, l_quantity
                |FROM q128_li WHERE l_orderkey % 2 = 1""".stripMargin)
        s.sql("DELETE FROM graftq128.bench.li WHERE qty >= 45.0")
        val a1 = s.sql("CALL graftq128.system.refresh_mview('bench', 'rp', false)")
          .head.getString(2)
        require(a1 == "incremental", s"li-side refresh expected incremental, got $a1")
        // mutate the preserved side — the rewritten FACT's own changelog
        s.sql("""INSERT INTO graftq128.bench.ord
                |SELECT o_orderkey, o_orderpriority FROM q128_ord
                |WHERE o_orderkey % 3 = 0 AND o_orderkey <= 1000""".stripMargin)
        s.sql("DELETE FROM graftq128.bench.ord WHERE pri = '1-URGENT'")
        val a2 = s.sql("CALL graftq128.system.refresh_mview('bench', 'rp', false)")
          .head.getString(2)
        require(a2 == "incremental", s"ord-side refresh expected incremental, got $a2")
        s.sql("SELECT pri, sq, n FROM graftq128.bench.rp ORDER BY pri")
      },
      Some("""WITH li AS (
             |  SELECT l_orderkey, l_quantity AS qty FROM lineitem
             |  WHERE l_quantity < 45.0),
             |ord AS (
             |  SELECT o_orderkey AS okey, o_orderpriority AS pri FROM orders
             |  WHERE (o_orderkey % 3 != 0 OR o_orderkey <= 1000)
             |    AND o_orderpriority <> '1-URGENT')
             |SELECT pri, SUM(qty) AS sq, COUNT(*) AS n
             |FROM li RIGHT JOIN ord ON l_orderkey = okey
             |GROUP BY pri ORDER BY pri""".stripMargin)),

    // FULL OUTER join MV (round-17): maintained with TWO-SIDED flip
    // terms — unmatched lineitems aggregate under the NULL priority
    // group, orders with no lineitems contribute their own NULL-fact
    // rows, and BOTH sides mutate before refreshes that stay
    // incremental (each side's flips are slice-bounded semi/anti
    // probes, never O(F ⋈ D)).
    "q129_mview_full_join" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq129").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq129", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq129.warehouse",
            Files.createTempDirectory("graft-mview-fjoin").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq129.bench")
        s.sql("CALL graftq129.system.drop_mview('bench', 'fp')")
        s.sql("DROP TABLE IF EXISTS graftq129.bench.li")
        s.sql("DROP TABLE IF EXISTS graftq129.bench.ord")
        s.sql("""CREATE TABLE graftq129.bench.li
                |(l_orderkey BIGINT, qty DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        s.sql("""CREATE TABLE graftq129.bench.ord
                |(okey BIGINT, pri STRING)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        t(s, dir, "orders").createOrReplaceTempView("q129_ord")
        t(s, dir, "lineitem").createOrReplaceTempView("q129_li")
        s.sql("""INSERT INTO graftq129.bench.ord
                |SELECT o_orderkey, o_orderpriority FROM q129_ord
                |WHERE o_orderkey % 3 != 0""".stripMargin)
        s.sql("""INSERT INTO graftq129.bench.li
                |SELECT l_orderkey, l_quantity
                |FROM q129_li WHERE l_orderkey % 2 = 0""".stripMargin)
        val mode = s.sql(
          """CALL graftq129.system.create_mview('bench', 'fp',
            |  'SELECT pri, SUM(qty) AS sq, COUNT(*) AS n
            |   FROM graftq129.bench.li FULL OUTER JOIN graftq129.bench.ord
            |     ON l_orderkey = okey
            |   GROUP BY pri')""".stripMargin).head.getString(0)
        require(mode == "incremental",
          s"FULL-join MV must register incremental, got $mode")
        s.sql("""INSERT INTO graftq129.bench.li
                |SELECT l_orderkey, l_quantity
                |FROM q129_li WHERE l_orderkey % 2 = 1""".stripMargin)
        s.sql("DELETE FROM graftq129.bench.li WHERE qty >= 45.0")
        val a1 = s.sql("CALL graftq129.system.refresh_mview('bench', 'fp', false)")
          .head.getString(2)
        require(a1 == "incremental", s"li-side refresh expected incremental, got $a1")
        s.sql("""INSERT INTO graftq129.bench.ord
                |SELECT o_orderkey, o_orderpriority FROM q129_ord
                |WHERE o_orderkey % 3 = 0 AND o_orderkey <= 1000""".stripMargin)
        s.sql("DELETE FROM graftq129.bench.ord WHERE pri = '2-HIGH'")
        val a2 = s.sql("CALL graftq129.system.refresh_mview('bench', 'fp', false)")
          .head.getString(2)
        require(a2 == "incremental", s"ord-side refresh expected incremental, got $a2")
        s.sql("SELECT pri, sq, n FROM graftq129.bench.fp ORDER BY pri NULLS FIRST")
      },
      Some("""WITH li AS (
             |  SELECT l_orderkey, l_quantity AS qty FROM lineitem
             |  WHERE l_quantity < 45.0),
             |ord AS (
             |  SELECT o_orderkey AS okey, o_orderpriority AS pri FROM orders
             |  WHERE (o_orderkey % 3 != 0 OR o_orderkey <= 1000)
             |    AND o_orderpriority <> '2-HIGH')
             |SELECT pri, SUM(qty) AS sq, COUNT(*) AS n
             |FROM li FULL OUTER JOIN ord ON l_orderkey = okey
             |GROUP BY pri ORDER BY pri NULLS FIRST""".stripMargin)),

    // FULL OUTER COMPOSED WITH A SUFFIX DIM (round 17): the FULL head
    // join (li FULL ord) feeds an INNER dim keyed off the FULL dim's
    // column (priority -> class), so order-side NULL-extensions (orders
    // with no lineitems) thread through the suffix join exactly as the
    // defining query's rows do. Incremental through a MoR fact burst, a
    // suffix-dim relabel UNDER LIVE EXTENSIONS (the split-base path:
    // fact pruning must not invent extensions), and a FULL-dim move.
    "q135_mview_full_join_dims" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq135").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq135", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq135.warehouse",
            Files.createTempDirectory("graft-mview-fjdims").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq135.bench")
        s.sql("CALL graftq135.system.drop_mview('bench', 'fpc')")
        s.sql("DROP TABLE IF EXISTS graftq135.bench.li")
        s.sql("DROP TABLE IF EXISTS graftq135.bench.ord")
        s.sql("DROP TABLE IF EXISTS graftq135.bench.prd")
        s.sql("""CREATE TABLE graftq135.bench.li
                |(l_orderkey BIGINT, qty DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        s.sql("""CREATE TABLE graftq135.bench.ord
                |(okey BIGINT, pri STRING)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        s.sql("CREATE TABLE graftq135.bench.prd (pri2 STRING, cls STRING)")
        s.sql("""INSERT INTO graftq135.bench.prd VALUES
                |('1-URGENT','HOT'), ('2-HIGH','HOT'), ('3-MEDIUM','WARM'),
                |('4-NOT SPECIFIED','COLD'), ('5-LOW','COLD')""".stripMargin)
        t(s, dir, "orders").createOrReplaceTempView("q135_ord")
        t(s, dir, "lineitem").createOrReplaceTempView("q135_li")
        s.sql("""INSERT INTO graftq135.bench.ord
                |SELECT o_orderkey, o_orderpriority FROM q135_ord
                |WHERE o_orderkey % 3 != 0""".stripMargin)
        s.sql("""INSERT INTO graftq135.bench.li
                |SELECT l_orderkey, l_quantity
                |FROM q135_li WHERE l_orderkey % 2 = 0""".stripMargin)
        val mode = s.sql(
          """CALL graftq135.system.create_mview('bench', 'fpc',
            |  'SELECT cls, SUM(qty) AS sq, COUNT(*) AS n
            |   FROM graftq135.bench.li FULL OUTER JOIN graftq135.bench.ord
            |     ON l_orderkey = okey
            |   JOIN graftq135.bench.prd ON pri = pri2
            |   GROUP BY cls')""".stripMargin).head.getString(0)
        require(mode == "incremental",
          s"FULL-join MV with a suffix dim must register incremental, got $mode")
        // fact burst: odd-key lineitems flip thousands of order-side
        // extensions to matched; the MoR delete retracts through
        // changelog pre-images
        s.sql("""INSERT INTO graftq135.bench.li
                |SELECT l_orderkey, l_quantity
                |FROM q135_li WHERE l_orderkey % 2 = 1""".stripMargin)
        s.sql("DELETE FROM graftq135.bench.li WHERE qty >= 45.0")
        val a1 = s.sql("CALL graftq135.system.refresh_mview('bench', 'fpc', false)")
          .head.getString(2)
        require(a1 == "incremental", s"li-side refresh expected incremental, got $a1")
        // suffix-dim relabel while extensions are live
        s.sql("UPDATE graftq135.bench.prd SET cls = 'WARM2' WHERE pri2 = '3-MEDIUM'")
        val a2 = s.sql("CALL graftq135.system.refresh_mview('bench', 'fpc', false)")
          .head.getString(2)
        require(a2 == "incremental",
          s"suffix-dim refresh expected incremental, got $a2")
        // FULL-dim move: late orders arrive, one priority class leaves
        s.sql("""INSERT INTO graftq135.bench.ord
                |SELECT o_orderkey, o_orderpriority FROM q135_ord
                |WHERE o_orderkey % 3 = 0 AND o_orderkey <= 1000""".stripMargin)
        s.sql("DELETE FROM graftq135.bench.ord WHERE pri = '2-HIGH'")
        val a3 = s.sql("CALL graftq135.system.refresh_mview('bench', 'fpc', false)")
          .head.getString(2)
        require(a3 == "incremental", s"ord-side refresh expected incremental, got $a3")
        s.sql("SELECT cls, sq, n FROM graftq135.bench.fpc ORDER BY cls")
      },
      Some("""WITH li AS (
             |  SELECT l_orderkey, l_quantity AS qty FROM lineitem
             |  WHERE l_quantity < 45.0),
             |ord AS (
             |  SELECT o_orderkey AS okey, o_orderpriority AS pri FROM orders
             |  WHERE (o_orderkey % 3 != 0 OR o_orderkey <= 1000)
             |    AND o_orderpriority <> '2-HIGH'),
             |prd AS (
             |  SELECT * FROM (VALUES
             |    ('1-URGENT','HOT'), ('2-HIGH','HOT'), ('3-MEDIUM','WARM2'),
             |    ('4-NOT SPECIFIED','COLD'), ('5-LOW','COLD')) AS t(pri2, cls))
             |SELECT cls, SUM(qty) AS sq, COUNT(*) AS n
             |FROM li FULL OUTER JOIN ord ON l_orderkey = okey
             |JOIN prd ON pri = pri2
             |GROUP BY cls ORDER BY cls""".stripMargin)),

    // TRANSPARENT MV REWRITE (round 18): the same ad-hoc aggregate a
    // user would type — fact JOIN dim WHERE ... GROUP BY — is answered
    // from a registered FRESH MV's storage by the opt-in rewrite rule
    // (SET graft.mview.rewrite=true): the plan reads O(groups) stored
    // rows instead of re-scanning the fact. Staleness is respected and
    // require-gated in-plan: while the fact carries unapplied changes
    // the SAME query plans against the base tables; after refresh it
    // substitutes again.
    "q136_mview_rewrite" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq136").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq136", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq136.warehouse",
            Files.createTempDirectory("graft-mview-rw").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq136.bench")
        s.sql("CALL graftq136.system.drop_mview('bench', 'rollup')")
        t(s, dir, "lineitem").createOrReplaceTempView("q136_li")
        t(s, dir, "nation").createOrReplaceTempView("q136_na")
        s.sql("DROP TABLE IF EXISTS graftq136.bench.fact")
        // price lands as DECIMAL(12,2): raw double SUMs diverge across
        // engines by addition order — sum exact, convert once (dsum)
        s.sql("""CREATE TABLE graftq136.bench.fact
                |(okey BIGINT, dk BIGINT, qty DOUBLE, price DECIMAL(12,2))""".stripMargin)
        s.sql("""INSERT INTO graftq136.bench.fact
                |SELECT l_orderkey, l_suppkey % 25, l_quantity, l_extendedprice
                |FROM q136_li WHERE l_orderkey % 2 = 0""".stripMargin)
        s.sql("DROP TABLE IF EXISTS graftq136.bench.dim")
        s.sql("CREATE TABLE graftq136.bench.dim (dkey BIGINT, region STRING)")
        s.sql("INSERT INTO graftq136.bench.dim SELECT n_nationkey, n_name FROM q136_na")
        val userSql =
          """SELECT region, SUM(qty) AS sq, COUNT(*) AS n,
            |       CAST(SUM(price) AS DOUBLE) AS sp
            |FROM graftq136.bench.fact JOIN graftq136.bench.dim ON dk = dkey
            |WHERE qty < 45.0
            |GROUP BY region""".stripMargin
        val mode = s.sql(
          s"""CALL graftq136.system.create_mview('bench', 'rollup',
             |  '${userSql.replace("'", "''")}')""".stripMargin).head.getString(0)
        require(mode == "incremental", s"expected incremental MV, got $mode")
        val prev = s.conf.getOption("graft.mview.rewrite")
        try {
          s.conf.set("graft.mview.rewrite", "true")
          // fresh: the ad-hoc plan substitutes the MV storage
          require(s.sql(userSql).queryExecution.analyzed.toString
              .contains("rollup__rows"),
            "fresh MV was not substituted into the ad-hoc plan")
          // stale: unapplied fact changes must BLOCK the substitution
          s.sql("""INSERT INTO graftq136.bench.fact
                  |SELECT l_orderkey, l_suppkey % 25, l_quantity, l_extendedprice
                  |FROM q136_li WHERE l_orderkey % 2 = 1""".stripMargin)
          require(!s.sql(userSql).queryExecution.analyzed.toString
              .contains("rollup__rows"),
            "stale MV was substituted — the staleness check is broken")
          s.sql("CALL graftq136.system.refresh_mview('bench', 'rollup', false)")
          // refreshed: substitutes again, with an ORDER BY kept on top
          // of the rewritten subtree (subtree matching, not whole-plan)
          val rewritten = s.sql(userSql + " ORDER BY region")
          require(rewritten.queryExecution.analyzed.toString
              .contains("rollup__rows"),
            "refreshed MV was not substituted")
          rewritten
        } finally {
          prev match {
            case Some(v) => s.conf.set("graft.mview.rewrite", v)
            case None => s.conf.unset("graft.mview.rewrite")
          }
        }
      },
      Some("""WITH fact AS (
             |  SELECT l_orderkey AS okey, l_suppkey % 25 AS dk,
             |         l_quantity AS qty,
             |         CAST(l_extendedprice AS DECIMAL(12,2)) AS price
             |  FROM lineitem),
             |dim AS (SELECT n_nationkey AS dkey, n_name AS region FROM nation)
             |SELECT region, SUM(qty) AS sq, COUNT(*) AS n,
             |       CAST(SUM(price) AS DOUBLE) AS sp
             |FROM fact JOIN dim ON dk = dkey WHERE qty < 45.0
             |GROUP BY region ORDER BY region""".stripMargin)),

    // Rollup containment (round 19): ONE MV at (region, b) grain
    // answers the whole COARSER family — group-key subset, residual
    // key predicates, SUM/COUNT/MIN/MAX re-aggregation, AVG via its
    // SUM/COUNT decomposition — while COUNT(DISTINCT) falls through
    // (not re-aggregable from per-group values) and staleness still
    // gates. At 100 TB the matched dashboard reads O(groups) storage
    // plus an O(groups) re-aggregation instead of re-scanning the fact.
    "q140_mview_rollup" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq140").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq140", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq140.warehouse",
            Files.createTempDirectory("graft-mview-rollup").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq140.bench")
        s.sql("CALL graftq140.system.drop_mview('bench', 'fine')")
        t(s, dir, "lineitem").createOrReplaceTempView("q140_li")
        t(s, dir, "nation").createOrReplaceTempView("q140_na")
        s.sql("DROP TABLE IF EXISTS graftq140.bench.fact")
        s.sql("""CREATE TABLE graftq140.bench.fact
                |(okey BIGINT, dk BIGINT, b BIGINT, qty DOUBLE,
                | price DECIMAL(12,2))""".stripMargin)
        s.sql("""INSERT INTO graftq140.bench.fact
                |SELECT l_orderkey, l_suppkey % 25, (l_suppkey % 25) % 5,
                |       l_quantity, l_extendedprice
                |FROM q140_li WHERE l_orderkey % 2 = 0""".stripMargin)
        s.sql("DROP TABLE IF EXISTS graftq140.bench.dim")
        s.sql("CREATE TABLE graftq140.bench.dim (dkey BIGINT, region STRING)")
        s.sql("INSERT INTO graftq140.bench.dim SELECT n_nationkey, n_name FROM q140_na")
        // the FINE-grain MV: stores sums/counts/extrema per (region, b);
        // COUNT(qty) rides along so AVG(qty) can decompose at rollup
        val fineSql =
          """SELECT region, b, SUM(qty) AS sq, COUNT(*) AS n,
            |       COUNT(qty) AS nq, MIN(qty) AS mn, MAX(qty) AS mx,
            |       SUM(price) AS spd
            |FROM graftq140.bench.fact JOIN graftq140.bench.dim ON dk = dkey
            |WHERE qty < 45.0
            |GROUP BY region, b""".stripMargin
        val mode = s.sql(
          s"""CALL graftq140.system.create_mview('bench', 'fine',
             |  '${fineSql.replace("'", "''")}')""".stripMargin).head.getString(0)
        require(mode == "incremental", s"expected incremental MV, got $mode")
        // the COARSER dashboard: rolls (region, b) up to region
        val rollupQ =
          """SELECT region, SUM(qty) AS sq, COUNT(*) AS n, MIN(qty) AS mn,
            |       MAX(qty) AS mx, AVG(qty) AS aq,
            |       CAST(SUM(price) AS DOUBLE) AS sp
            |FROM graftq140.bench.fact JOIN graftq140.bench.dim ON dk = dkey
            |WHERE qty < 45.0
            |GROUP BY region""".stripMargin
        val prev = s.conf.getOption("graft.mview.rewrite")
        try {
          s.conf.set("graft.mview.rewrite", "true")
          def substituted(q: String): Boolean =
            s.sql(q).queryExecution.analyzed.toString.contains("fine__rows")
          // rollup substitutes, with a RE-AGGREGATION over the storage
          require(substituted(rollupQ), "rollup was not substituted")
          require(s.sql(rollupQ).queryExecution.analyzed.collectFirst {
            case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
                if a.collectLeaves().exists(_.toString.contains("fine__rows")) => a
          }.nonEmpty, "rollup plan lacks a re-aggregation over the MV storage")
          // residual key predicate pushes onto the storage read
          require(substituted(
            """SELECT region, SUM(qty) AS sq
              |FROM graftq140.bench.fact JOIN graftq140.bench.dim ON dk = dkey
              |WHERE qty < 45.0 AND region >= 'E'
              |GROUP BY region""".stripMargin),
            "key-filtered rollup was not substituted")
          // COUNT(DISTINCT) is NOT re-aggregable — the negative pin
          require(!substituted(
            """SELECT region, COUNT(DISTINCT okey) AS dok
              |FROM graftq140.bench.fact JOIN graftq140.bench.dim ON dk = dkey
              |WHERE qty < 45.0 GROUP BY region""".stripMargin),
            "COUNT(DISTINCT) rollup was substituted — it must fall through")
          // stale: unapplied fact changes block the rollup path too
          s.sql("""INSERT INTO graftq140.bench.fact
                  |SELECT l_orderkey, l_suppkey % 25, (l_suppkey % 25) % 5,
                  |       l_quantity, l_extendedprice
                  |FROM q140_li WHERE l_orderkey % 2 = 1""".stripMargin)
          require(!substituted(rollupQ),
            "stale MV was substituted — the staleness check is broken")
          s.sql("CALL graftq140.system.refresh_mview('bench', 'fine', false)")
          val rewritten = s.sql(rollupQ + " ORDER BY region")
          require(rewritten.queryExecution.analyzed.toString.contains("fine__rows"),
            "refreshed MV rollup was not substituted")
          rewritten
        } finally {
          prev match {
            case Some(v) => s.conf.set("graft.mview.rewrite", v)
            case None => s.conf.unset("graft.mview.rewrite")
          }
        }
      },
      Some("""WITH fact AS (
             |  SELECT l_orderkey AS okey, l_suppkey % 25 AS dk,
             |         l_quantity AS qty,
             |         CAST(l_extendedprice AS DECIMAL(12,2)) AS price
             |  FROM lineitem),
             |dim AS (SELECT n_nationkey AS dkey, n_name AS region FROM nation)
             |SELECT region, SUM(qty) AS sq, COUNT(*) AS n, MIN(qty) AS mn,
             |       MAX(qty) AS mx, AVG(qty) AS aq,
             |       CAST(SUM(price) AS DOUBLE) AS sp
             |FROM fact JOIN dim ON dk = dkey WHERE qty < 45.0
             |GROUP BY region ORDER BY region""".stripMargin)),

    // LEFT-join MV with a MOVED dimension: unmatched facts aggregate
    // under the NULL group; then the dim moves in BOTH flip directions
    // (missing orders arrive → NULL-extensions retract; urgent orders
    // vanish → facts re-extend with NULLs) and the refresh stays
    // INCREMENTAL — the telescoped matched part plus the semi/anti
    // flip terms, the shape r14 re-pinned with a full recompute.
    "q118_mview_left_join" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq118").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq118", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq118.warehouse",
            Files.createTempDirectory("graft-mview-ljoin").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq118.bench")
        s.sql("CALL graftq118.system.drop_mview('bench', 'lp')")
        s.sql("DROP TABLE IF EXISTS graftq118.bench.li")
        s.sql("DROP TABLE IF EXISTS graftq118.bench.ord")
        s.sql("""CREATE TABLE graftq118.bench.li
                |(l_orderkey BIGINT, l_quantity DOUBLE, l_extendedprice DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        s.sql("""CREATE TABLE graftq118.bench.ord
                |(o_orderkey BIGINT, o_orderpriority STRING)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        t(s, dir, "orders").createOrReplaceTempView("q118_ord")
        t(s, dir, "lineitem").createOrReplaceTempView("q118_li")
        // a third of the orders are MISSING: their lineitems land in
        // the NULL-priority group through the left join
        s.sql("""INSERT INTO graftq118.bench.ord
                |SELECT o_orderkey, o_orderpriority FROM q118_ord
                |WHERE o_orderkey % 3 != 0""".stripMargin)
        s.sql("""INSERT INTO graftq118.bench.li
                |SELECT l_orderkey, l_quantity, l_extendedprice
                |FROM q118_li WHERE l_orderkey % 2 = 0""".stripMargin)
        val mode = s.sql(
          """CALL graftq118.system.create_mview('bench', 'lp',
            |  'SELECT o_orderpriority AS pri, SUM(l_quantity) AS sq,
            |     COUNT(*) AS n, MAX(l_extendedprice) AS mp
            |   FROM graftq118.bench.li LEFT JOIN graftq118.bench.ord
            |     ON l_orderkey = o_orderkey
            |   WHERE l_quantity > 1.0
            |   GROUP BY o_orderpriority')""".stripMargin).head.getString(0)
        require(mode == "incremental", s"expected incremental left-join MV, got $mode")
        // the fact moves...
        s.sql("""INSERT INTO graftq118.bench.li
                |SELECT l_orderkey, l_quantity, l_extendedprice
                |FROM q118_li WHERE l_orderkey % 2 = 1""".stripMargin)
        // ...and the LEFT dim moves in both flip directions
        s.sql("""INSERT INTO graftq118.bench.ord
                |SELECT o_orderkey, o_orderpriority FROM q118_ord
                |WHERE o_orderkey % 3 = 0 AND o_orderkey % 5 != 0""".stripMargin)
        s.sql("""DELETE FROM graftq118.bench.ord
                |WHERE o_orderpriority = '1-URGENT' AND o_orderkey <= 3000""".stripMargin)
        val action = s.sql(
          "CALL graftq118.system.refresh_mview('bench', 'lp', false)")
          .head.getString(2)
        require(action == "incremental",
          s"expected incremental left-dim refresh, got $action")
        s.sql("""SELECT pri,
                |  CAST(CAST(sq AS DECIMAL(14,2)) AS DOUBLE) AS sq, n, mp
                |FROM graftq118.bench.lp ORDER BY pri NULLS FIRST""".stripMargin)
      },
      Some("""SELECT o.o_orderpriority AS pri,
             |  CAST(CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DECIMAL(14,2)) AS DOUBLE) AS sq,
             |  COUNT(*) AS n, MAX(l.l_extendedprice) AS mp
             |FROM lineitem l LEFT JOIN (
             |  SELECT o_orderkey, o_orderpriority FROM orders
             |  WHERE (o_orderkey % 3 != 0 OR o_orderkey % 5 != 0)
             |    AND NOT (o_orderpriority = '1-URGENT' AND o_orderkey <= 3000)
             |) o ON l.l_orderkey = o.o_orderkey
             |WHERE l.l_quantity > 1.0
             |GROUP BY 1 ORDER BY 1 NULLS FIRST""".stripMargin)),

    // UNION ALL MV with PER-LEG WHERE: two shard tables with different
    // retention predicates share one MV — each leg's changelog slice
    // runs through its own filter before the shared shape (union is
    // linear), so both legs keep their independent pins and refresh
    // incrementally. r14 refused this shape to full mode.
    "q120_mview_union_leg_where" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq120").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq120", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq120.warehouse",
            Files.createTempDirectory("graft-mview-legwhere").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq120.bench")
        s.sql("CALL graftq120.system.drop_mview('bench', 'u')")
        t(s, dir, "lineitem").createOrReplaceTempView("q120_li")
        for (i <- 0 to 1) {
          s.sql(s"DROP TABLE IF EXISTS graftq120.bench.li$i")
          s.sql(s"""CREATE TABLE graftq120.bench.li$i
                   |(l_orderkey BIGINT, l_returnflag STRING, l_quantity DOUBLE,
                   | l_extendedprice DOUBLE)
                   |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
          s.sql(s"""INSERT INTO graftq120.bench.li$i
                   |SELECT l_orderkey, l_returnflag, l_quantity, l_extendedprice
                   |FROM q120_li WHERE l_orderkey % 2 = $i
                   |  AND l_orderkey % 5 != 0""".stripMargin)
        }
        val mode = s.sql(
          """CALL graftq120.system.create_mview('bench', 'u',
            |  'SELECT l_returnflag AS flag, SUM(l_quantity) AS sq,
            |     COUNT(*) AS n, MAX(l_extendedprice) AS mp
            |   FROM (SELECT * FROM graftq120.bench.li0
            |           WHERE l_extendedprice < 80000.0 UNION ALL
            |         SELECT * FROM graftq120.bench.li1
            |           WHERE l_quantity < 47.0)
            |   WHERE l_quantity > 2.0
            |   GROUP BY l_returnflag')""".stripMargin).head.getString(0)
        require(mode == "incremental",
          s"expected incremental per-leg-WHERE union MV, got $mode")
        // each shard moves — late arrivals on 0, MoR deletes on 1
        s.sql("""INSERT INTO graftq120.bench.li0
                |SELECT l_orderkey, l_returnflag, l_quantity, l_extendedprice
                |FROM q120_li WHERE l_orderkey % 2 = 0 AND l_orderkey % 5 = 0""".stripMargin)
        s.sql("DELETE FROM graftq120.bench.li1 WHERE l_extendedprice >= 70000.0")
        val a1 = s.sql("CALL graftq120.system.refresh_mview('bench', 'u', false)")
          .head.getString(2)
        require(a1 == "incremental", s"expected incremental union refresh, got $a1")
        s.sql("""INSERT INTO graftq120.bench.li1
                |SELECT l_orderkey, l_returnflag, l_quantity, l_extendedprice
                |FROM q120_li WHERE l_orderkey % 2 = 1 AND l_orderkey % 5 = 0""".stripMargin)
        val a2 = s.sql("CALL graftq120.system.refresh_mview('bench', 'u', false)")
          .head.getString(2)
        require(a2 == "incremental", s"expected incremental leg-only refresh, got $a2")
        s.sql("""SELECT flag,
                |  CAST(CAST(sq AS DECIMAL(14,2)) AS DOUBLE) AS sq, n, mp
                |FROM graftq120.bench.u ORDER BY flag""".stripMargin)
      },
      Some("""SELECT l_returnflag AS flag,
             |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(14,2)) AS DOUBLE) AS sq,
             |  COUNT(*) AS n, MAX(l_extendedprice) AS mp
             |FROM lineitem
             |WHERE l_quantity > 2.0
             |  AND ((l_orderkey % 2 = 0 AND l_extendedprice < 80000.0)
             |    OR (l_orderkey % 2 = 1 AND l_quantity < 47.0
             |        AND NOT (l_extendedprice >= 70000.0 AND l_orderkey % 5 != 0)))
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // UNION ALL MV with PER-LEG SELECT (round 17): two shards with
    // DIVERGENT physical schemas — a legacy shard whose columns are
    // renamed and rescaled — share one MV. Each leg stores its own
    // projection SQL (scan → leg WHERE → leg SELECT onto the union's
    // output names) and every read, including the MoR delete
    // pre-image's changelog slice, runs through it; union linearity
    // keeps every leg's refresh incremental. r16 refused this shape.
    "q130_mview_union_leg_select" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq130").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq130", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq130.warehouse",
            Files.createTempDirectory("graft-mview-legselect").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq130.bench")
        s.sql("CALL graftq130.system.drop_mview('bench', 'u')")
        t(s, dir, "lineitem").createOrReplaceTempView("q130_li")
        s.sql("DROP TABLE IF EXISTS graftq130.bench.t0")
        s.sql("""CREATE TABLE graftq130.bench.t0
                |(flag STRING, qty DOUBLE, price DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        s.sql("""INSERT INTO graftq130.bench.t0
                |SELECT l_returnflag, l_quantity, l_extendedprice
                |FROM q130_li WHERE l_orderkey % 2 = 0
                |  AND l_orderkey % 5 != 0""".stripMargin)
        // the legacy shard: different names, quantity stored halved
        s.sql("DROP TABLE IF EXISTS graftq130.bench.t1")
        s.sql("""CREATE TABLE graftq130.bench.t1
                |(rflag STRING, half_qty DOUBLE, price DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        s.sql("""INSERT INTO graftq130.bench.t1
                |SELECT l_returnflag, l_quantity / 2, l_extendedprice
                |FROM q130_li WHERE l_orderkey % 2 = 1
                |  AND l_orderkey % 5 != 0""".stripMargin)
        val mode = s.sql(
          """CALL graftq130.system.create_mview('bench', 'u',
            |  'SELECT flag, SUM(qty) AS sq, COUNT(*) AS n, MAX(price) AS mp
            |   FROM (SELECT flag, qty, price FROM graftq130.bench.t0
            |         UNION ALL
            |         SELECT rflag AS flag, half_qty * 2.0 AS qty, price
            |           FROM graftq130.bench.t1)
            |   WHERE qty > 2.0
            |   GROUP BY flag')""".stripMargin).head.getString(0)
        require(mode == "incremental",
          s"expected incremental per-leg-SELECT union MV, got $mode")
        // late arrivals on the modern shard, a MoR delete on the legacy
        // one (its pre-image replays through the stored leg projection)
        s.sql("""INSERT INTO graftq130.bench.t0
                |SELECT l_returnflag, l_quantity, l_extendedprice
                |FROM q130_li WHERE l_orderkey % 2 = 0 AND l_orderkey % 5 = 0""".stripMargin)
        s.sql("DELETE FROM graftq130.bench.t1 WHERE price >= 70000.0")
        val a1 = s.sql("CALL graftq130.system.refresh_mview('bench', 'u', false)")
          .head.getString(2)
        require(a1 == "incremental", s"expected incremental union refresh, got $a1")
        // a legacy-leg-only move keeps its independent pin
        s.sql("""INSERT INTO graftq130.bench.t1
                |SELECT l_returnflag, l_quantity / 2, l_extendedprice
                |FROM q130_li WHERE l_orderkey % 2 = 1 AND l_orderkey % 5 = 0""".stripMargin)
        val a2 = s.sql("CALL graftq130.system.refresh_mview('bench', 'u', false)")
          .head.getString(2)
        require(a2 == "incremental", s"expected incremental leg-only refresh, got $a2")
        s.sql("""SELECT flag,
                |  CAST(CAST(sq AS DECIMAL(14,2)) AS DOUBLE) AS sq, n, mp
                |FROM graftq130.bench.u ORDER BY flag""".stripMargin)
      },
      Some("""SELECT l_returnflag AS flag,
             |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(14,2)) AS DOUBLE) AS sq,
             |  COUNT(*) AS n, MAX(l_extendedprice) AS mp
             |FROM lineitem
             |WHERE l_quantity > 2.0
             |  AND (l_orderkey % 2 = 0
             |    OR (l_orderkey % 5 = 0 OR l_extendedprice < 70000.0))
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // SHARDED fact star join MV (round 17): a UNION ALL of two shards
    // — one with a legacy schema behind a per-leg SELECT — JOINs a
    // dimension carrying the group key. The union is fact-preserving
    // leg by leg, so every telescope fact term is a per-leg changelog
    // slice joined to the pinned dim, and a moved dim's term runs
    // against the union'd head; one refresh maintains fact bursts on
    // BOTH shards, a MoR shard delete, AND a dim re-prioritization
    // incrementally. r16 refused joins over unions to full mode.
    "q131_mview_union_join" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq131").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq131", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq131.warehouse",
            Files.createTempDirectory("graft-mview-unionjoin").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq131.bench")
        s.sql("CALL graftq131.system.drop_mview('bench', 'sharded')")
        t(s, dir, "lineitem").createOrReplaceTempView("q131_li")
        t(s, dir, "orders").createOrReplaceTempView("q131_ord")
        s.sql("DROP TABLE IF EXISTS graftq131.bench.t0")
        s.sql("""CREATE TABLE graftq131.bench.t0
                |(ok BIGINT, qty DOUBLE, price DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        s.sql("""INSERT INTO graftq131.bench.t0
                |SELECT l_orderkey, l_quantity, l_extendedprice
                |FROM q131_li WHERE l_orderkey % 2 = 0
                |  AND l_orderkey % 5 != 0""".stripMargin)
        s.sql("DROP TABLE IF EXISTS graftq131.bench.t1")
        s.sql("""CREATE TABLE graftq131.bench.t1
                |(okey BIGINT, half_qty DOUBLE, price2 DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        s.sql("""INSERT INTO graftq131.bench.t1
                |SELECT l_orderkey, l_quantity / 2, l_extendedprice
                |FROM q131_li WHERE l_orderkey % 2 = 1
                |  AND l_orderkey % 5 != 0""".stripMargin)
        s.sql("DROP TABLE IF EXISTS graftq131.bench.ord")
        s.sql("CREATE TABLE graftq131.bench.ord (o_orderkey BIGINT, o_orderpriority STRING)")
        s.sql("""INSERT INTO graftq131.bench.ord
                |SELECT o_orderkey, o_orderpriority FROM q131_ord""".stripMargin)
        val mode = s.sql(
          """CALL graftq131.system.create_mview('bench', 'sharded',
            |  'SELECT o_orderpriority AS pri, SUM(qty) AS sq,
            |     COUNT(*) AS n, MAX(price) AS mp
            |   FROM (SELECT ok, qty, price FROM graftq131.bench.t0
            |         UNION ALL
            |         SELECT okey AS ok, half_qty * 2.0 AS qty, price2 AS price
            |           FROM graftq131.bench.t1)
            |     JOIN graftq131.bench.ord ON ok = o_orderkey
            |   WHERE qty > 2.0
            |   GROUP BY o_orderpriority')""".stripMargin).head.getString(0)
        require(mode == "incremental",
          s"expected incremental sharded-join MV, got $mode")
        // late arrivals on shard 0, a MoR delete on legacy shard 1
        s.sql("""INSERT INTO graftq131.bench.t0
                |SELECT l_orderkey, l_quantity, l_extendedprice
                |FROM q131_li WHERE l_orderkey % 2 = 0 AND l_orderkey % 5 = 0""".stripMargin)
        s.sql("DELETE FROM graftq131.bench.t1 WHERE price2 >= 70000.0")
        val a1 = s.sql("CALL graftq131.system.refresh_mview('bench', 'sharded', false)")
          .head.getString(2)
        require(a1 == "incremental",
          s"expected incremental sharded refresh, got $a1")
        // THEN the dim re-prioritizes, a dangling key appears, AND the
        // legacy shard takes late arrivals — one refresh, still
        // incremental (telescope + per-leg pins)
        s.sql("INSERT INTO graftq131.bench.ord VALUES (-1, 'X-NONE')")
        s.sql("""CREATE OR REPLACE TEMP VIEW q131_moved AS
                |SELECT o_orderkey FROM q131_ord WHERE o_orderkey <= 400""".stripMargin)
        s.sql("""DELETE FROM graftq131.bench.ord
                |WHERE o_orderkey <= 400 AND o_orderkey >= 0""".stripMargin)
        s.sql("""INSERT INTO graftq131.bench.ord
                |SELECT o_orderkey, 'X-MOVED' FROM q131_moved""".stripMargin)
        s.sql("""INSERT INTO graftq131.bench.t1
                |SELECT l_orderkey, l_quantity / 2, l_extendedprice
                |FROM q131_li WHERE l_orderkey % 2 = 1 AND l_orderkey % 5 = 0""".stripMargin)
        val a2 = s.sql("CALL graftq131.system.refresh_mview('bench', 'sharded', false)")
          .head.getString(2)
        require(a2 == "incremental",
          s"expected incremental dim-move + leg-move refresh, got $a2")
        s.sql("""SELECT pri,
                |  CAST(CAST(sq AS DECIMAL(14,2)) AS DOUBLE) AS sq, n, mp
                |FROM graftq131.bench.sharded ORDER BY pri""".stripMargin)
      },
      Some("""SELECT CASE WHEN o_orderkey <= 400 THEN 'X-MOVED'
             |       ELSE o_orderpriority END AS pri,
             |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(14,2)) AS DOUBLE) AS sq,
             |  COUNT(*) AS n, MAX(l_extendedprice) AS mp
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE l_quantity > 2.0
             |  AND (l_orderkey % 2 = 0
             |    OR (l_orderkey % 5 = 0 OR l_extendedprice < 70000.0))
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // SHARDED window dashboard MV (round 17): top-3 per flag by price
    // over a UNION ALL of two shards, the legacy one behind a per-leg
    // SELECT. Touched partition keys derive from EVERY leg's changelog
    // slice through its projection, affected groups recompute from the
    // union'd head (projection-free legs zone-pruned on the bare flag
    // column), and each leg keeps its own pin — a MoR delete on the
    // legacy shard retracts stored top rows incrementally. r16 refused
    // windows over unions to full mode.
    "q132_mview_union_window" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq132").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq132", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq132.warehouse",
            Files.createTempDirectory("graft-mview-unionwin").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq132.bench")
        s.sql("CALL graftq132.system.drop_mview('bench', 'wtop')")
        t(s, dir, "lineitem").createOrReplaceTempView("q132_li")
        s.sql("DROP TABLE IF EXISTS graftq132.bench.t0")
        s.sql("""CREATE TABLE graftq132.bench.t0
                |(ok BIGINT, flag STRING, qty DOUBLE, price DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        s.sql("""INSERT INTO graftq132.bench.t0
                |SELECT l_orderkey * 10 + l_linenumber, l_returnflag,
                |       l_quantity, l_extendedprice
                |FROM q132_li WHERE l_partkey % 3 = 0 AND l_orderkey % 2 = 0
                |  AND l_orderkey % 5 != 0""".stripMargin)
        s.sql("DROP TABLE IF EXISTS graftq132.bench.t1")
        s.sql("""CREATE TABLE graftq132.bench.t1
                |(okey BIGINT, rflag STRING, half_qty DOUBLE, price2 DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        s.sql("""INSERT INTO graftq132.bench.t1
                |SELECT l_orderkey * 10 + l_linenumber, l_returnflag,
                |       l_quantity / 2, l_extendedprice
                |FROM q132_li WHERE l_partkey % 3 = 0 AND l_orderkey % 2 = 1
                |  AND l_orderkey % 5 != 0""".stripMargin)
        val mode = s.sql(
          """CALL graftq132.system.create_mview('bench', 'wtop',
            |  'SELECT flag, ok, qty, price, rn FROM (
            |     SELECT flag, ok, qty, price,
            |       ROW_NUMBER() OVER (PARTITION BY flag
            |         ORDER BY price DESC, ok) AS rn
            |     FROM (SELECT ok, flag, qty, price FROM graftq132.bench.t0
            |           UNION ALL
            |           SELECT okey AS ok, rflag AS flag,
            |                  half_qty * 2.0 AS qty, price2 AS price
            |             FROM graftq132.bench.t1))
            |   WHERE rn <= 3')""".stripMargin).head.getString(0)
        require(mode == "window",
          s"expected window-mode sharded union MV, got $mode")
        // the legacy shard's MoR delete retracts stored top rows (high
        // prices live on both parities); the modern shard takes late
        // arrivals — one refresh, still incremental
        s.sql("""INSERT INTO graftq132.bench.t0
                |SELECT l_orderkey * 10 + l_linenumber, l_returnflag,
                |       l_quantity, l_extendedprice
                |FROM q132_li WHERE l_partkey % 3 = 0
                |  AND l_orderkey % 2 = 0 AND l_orderkey % 5 = 0""".stripMargin)
        s.sql("DELETE FROM graftq132.bench.t1 WHERE price2 >= 90000.0")
        val a1 = s.sql("CALL graftq132.system.refresh_mview('bench', 'wtop', false)")
          .head.getString(2)
        require(a1 == "incremental",
          s"expected incremental sharded-window refresh, got $a1")
        // a legacy-leg-only burst keeps its independent pin
        s.sql("""INSERT INTO graftq132.bench.t1
                |SELECT l_orderkey * 10 + l_linenumber, l_returnflag,
                |       l_quantity / 2, l_extendedprice
                |FROM q132_li WHERE l_partkey % 3 = 0
                |  AND l_orderkey % 2 = 1 AND l_orderkey % 5 = 0""".stripMargin)
        val a2 = s.sql("CALL graftq132.system.refresh_mview('bench', 'wtop', false)")
          .head.getString(2)
        require(a2 == "incremental",
          s"expected incremental leg-only window refresh, got $a2")
        s.sql("""SELECT flag, ok, qty, price, rn
                |FROM graftq132.bench.wtop ORDER BY flag, rn""".stripMargin)
      },
      Some("""SELECT flag, ok, qty, price, rn FROM (
             |  SELECT l_returnflag AS flag,
             |         l_orderkey * 10 + l_linenumber AS ok,
             |         l_quantity AS qty, l_extendedprice AS price,
             |         ROW_NUMBER() OVER (PARTITION BY l_returnflag
             |           ORDER BY l_extendedprice DESC,
             |                    l_orderkey * 10 + l_linenumber) AS rn
             |  FROM lineitem
             |  WHERE l_partkey % 3 = 0
             |    AND (l_orderkey % 2 = 0
             |      OR l_orderkey % 5 = 0 OR l_extendedprice < 90000.0)
             |) WHERE rn <= 3 ORDER BY flag, rn""".stripMargin)),

    // Tumbling-window MV: a time window as a GROUP BY over
    // date_trunc(day, ts) is just a deterministic group expression, so
    // the per-day rollup maintains incrementally like any keyed MV —
    // late events join their window's group, MoR deletes retract from
    // it. (ANALYTIC windows — OVER clauses — maintain too since r16 in
    // their own "window" mode, q123/q125/q126/q132; this row pins the
    // simpler TIME-window-as-group-key shape.)
    "q119_mview_tumbling_window" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq119").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq119", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq119.warehouse",
            Files.createTempDirectory("graft-mview-window").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq119.bench")
        s.sql("CALL graftq119.system.drop_mview('bench', 'daily')")
        s.sql("DROP TABLE IF EXISTS graftq119.bench.ev")
        s.sql("""CREATE TABLE graftq119.bench.ev
                |(event_id BIGINT, ts TIMESTAMP, event_type STRING, value DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        events(s, dir).createOrReplaceTempView("q119_ev")
        s.sql("""INSERT INTO graftq119.bench.ev
                |SELECT event_id, ts, event_type, value FROM q119_ev
                |WHERE event_id % 2 = 0""".stripMargin)
        val mode = s.sql(
          """CALL graftq119.system.create_mview('bench', 'daily',
            |  'SELECT date_trunc(''DAY'', ts) AS day, event_type AS kind,
            |     COUNT(*) AS n, SUM(value) AS sv, MAX(value) AS mxv
            |   FROM graftq119.bench.ev WHERE value > 0.5
            |   GROUP BY date_trunc(''DAY'', ts), event_type')""".stripMargin)
          .head.getString(0)
        require(mode == "incremental", s"expected incremental window MV, got $mode")
        // late events arrive into EXISTING windows; deletes retract
        s.sql("""INSERT INTO graftq119.bench.ev
                |SELECT event_id, ts, event_type, value FROM q119_ev
                |WHERE event_id % 2 = 1""".stripMargin)
        s.sql("DELETE FROM graftq119.bench.ev WHERE value >= 90.0")
        s.sql("DELETE FROM graftq119.bench.ev WHERE event_id <= 200")
        val action = s.sql(
          "CALL graftq119.system.refresh_mview('bench', 'daily', false)")
          .head.getString(2)
        require(action == "incremental", s"expected incremental refresh, got $action")
        s.sql("""SELECT date_format(day, 'yyyy-MM-dd') AS day, kind, n,
                |  CAST(CAST(sv AS DECIMAL(18,4)) AS DOUBLE) AS sv, mxv
                |FROM graftq119.bench.daily ORDER BY day, kind""".stripMargin)
      },
      Some("""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             |  event_type AS kind, COUNT(*) AS n,
             |  CAST(CAST(SUM(value) AS DECIMAL(18,4)) AS DOUBLE) AS sv,
             |  MAX(value) AS mxv
             |FROM events
             |WHERE value > 0.5 AND value < 90.0 AND event_id > 200
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // Join MV: fact (lineitem) joined to a static dimension (orders),
    // group key drawn from the DIM side, maintained incrementally from
    // the fact changelog — then the dim MOVES (400 orders re-prioritize
    // plus a dangling key) and the telescoped delta keeps maintenance
    // incremental. End state hash-matches DuckDB's from-scratch join
    // recomputation over the moved dim.
    "q108_mview_join" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq108").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq108", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq108.warehouse",
            Files.createTempDirectory("graft-mview-join").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq108.bench")
        s.sql("CALL graftq108.system.drop_mview('bench', 'by_pri')")
        s.sql("DROP TABLE IF EXISTS graftq108.bench.li")
        s.sql("DROP TABLE IF EXISTS graftq108.bench.ord")
        s.sql("""CREATE TABLE graftq108.bench.li
                |(l_orderkey BIGINT, l_quantity DOUBLE, l_extendedprice DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        s.sql("CREATE TABLE graftq108.bench.ord (o_orderkey BIGINT, o_orderpriority STRING)")
        t(s, dir, "orders").createOrReplaceTempView("q108_ord")
        t(s, dir, "lineitem").createOrReplaceTempView("q108_li")
        s.sql("""INSERT INTO graftq108.bench.ord
                |SELECT o_orderkey, o_orderpriority FROM q108_ord""".stripMargin)
        s.sql("""INSERT INTO graftq108.bench.li
                |SELECT l_orderkey, l_quantity, l_extendedprice
                |FROM q108_li WHERE l_orderkey % 2 = 0""".stripMargin)
        val mode = s.sql(
          """CALL graftq108.system.create_mview('bench', 'by_pri',
            |  'SELECT o_orderpriority AS pri, SUM(l_quantity) AS sq,
            |     AVG(l_quantity) AS aq, MAX(l_extendedprice) AS mp, COUNT(*) AS n
            |   FROM graftq108.bench.li JOIN graftq108.bench.ord
            |     ON l_orderkey = o_orderkey
            |   WHERE l_quantity > 2.0
            |   GROUP BY o_orderpriority')""".stripMargin).head.getString(0)
        require(mode == "incremental", s"expected incremental join-MV mode, got $mode")
        s.sql("""INSERT INTO graftq108.bench.li
                |SELECT l_orderkey, l_quantity, l_extendedprice
                |FROM q108_li WHERE l_orderkey % 2 = 1""".stripMargin)
        s.sql("DELETE FROM graftq108.bench.li WHERE l_extendedprice >= 80000.0")
        val a1 = s.sql(
          "CALL graftq108.system.refresh_mview('bench', 'by_pri', false)")
          .head.getString(2)
        require(a1 == "incremental", s"expected incremental join-MV refresh, got $a1")
        // the dim MOVES: low-key orders re-prioritize (delete + insert,
        // two commits) and a dangling key appears — the telescoped
        // delta maintains this INCREMENTALLY (inner join: fact@head
        // against the dim's signed slice), never a full re-pin
        s.sql("INSERT INTO graftq108.bench.ord VALUES (-1, 'X-NONE')")
        s.sql("""CREATE OR REPLACE TEMP VIEW q108_moved AS
                |SELECT o_orderkey FROM q108_ord WHERE o_orderkey <= 400""".stripMargin)
        s.sql("""DELETE FROM graftq108.bench.ord
                |WHERE o_orderkey <= 400 AND o_orderkey >= 0""".stripMargin)
        s.sql("""INSERT INTO graftq108.bench.ord
                |SELECT o_orderkey, 'X-MOVED' FROM q108_moved""".stripMargin)
        val a2 = s.sql(
          "CALL graftq108.system.refresh_mview('bench', 'by_pri', false)")
          .head.getString(2)
        require(a2 == "incremental",
          s"expected incremental dim-move refresh, got $a2")
        s.sql("""SELECT pri,
                |  CAST(CAST(sq AS DECIMAL(14,2)) AS DOUBLE) AS sq,
                |  CAST(CAST(aq AS DECIMAL(18,6)) AS DOUBLE) AS aq,
                |  mp, n
                |FROM graftq108.bench.by_pri ORDER BY pri""".stripMargin)
      },
      Some("""SELECT CASE WHEN o_orderkey <= 400 THEN 'X-MOVED'
             |       ELSE o_orderpriority END AS pri,
             |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(14,2)) AS DOUBLE) AS sq,
             |  CAST(CAST(AVG(l_quantity) AS DECIMAL(18,6)) AS DOUBLE) AS aq,
             |  MAX(l_extendedprice) AS mp,
             |  COUNT(*) AS n
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |WHERE l_quantity > 2.0 AND l_extendedprice < 80000.0
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // The general MERGE's merge-on-read path: same conditional clause
    // matrix as q97 minus NOT MATCHED BY SOURCE (which needs the whole
    // table by definition), on a mor-mode table — outcomes appended +
    // affected keys masked, ZERO target rewrites (asserted in-plan),
    // and the SAME oracle shape as the copy-on-write path: the two
    // execution strategies must be observationally identical.
    "q99_merge_mor" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq99").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq99", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq99.warehouse",
            Files.createTempDirectory("graft-merge-mor").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq99.bench")
        s.sql("DROP TABLE IF EXISTS graftq99.bench.ord")
        s.sql("""CREATE TABLE graftq99.bench.ord
                |(o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        t(s, dir, "orders").createOrReplaceTempView("q99_orders")
        s.sql("""INSERT INTO graftq99.bench.ord
                |SELECT o_orderkey, o_orderstatus, o_totalprice FROM q99_orders""".stripMargin)
        s.sql("""SELECT o_orderkey AS k, o_totalprice + 100 AS p
                |FROM q99_orders WHERE o_orderkey % 3 = 0
                |UNION ALL
                |SELECT o_orderkey + 100000000 AS k, o_totalprice AS p
                |FROM q99_orders WHERE o_orderkey % 5 = 0""".stripMargin)
          .createOrReplaceTempView("q99_src")
        val cat = GraftCatalog(s, s.conf.get("spark.sql.catalog.graftq99.warehouse"))
        val tbl = cat.load(TableIdent("bench", "ord"))
        val before = tbl.currentOrFail().files.map(_.path).toSet
        s.sql("""MERGE INTO graftq99.bench.ord t USING q99_src s
                |ON t.o_orderkey = s.k
                |WHEN MATCHED AND t.o_totalprice < 50000 THEN UPDATE SET o_totalprice = s.p
                |WHEN MATCHED AND t.o_totalprice >= 150000 THEN DELETE
                |WHEN NOT MATCHED AND s.p > 100000 THEN
                |  INSERT (o_orderkey, o_orderstatus) VALUES (s.k, 'N')""".stripMargin)
        val snap = tbl.currentOrFail()
        require(before.subsetOf(snap.files.map(_.path).toSet),
          "merge-on-read MERGE rewrote target files")
        require(snap.deleteGroups.nonEmpty, "MoR MERGE recorded no delete group")
        s.sql("""SELECT o_orderstatus, COUNT(*) AS n,
                |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
                |  COUNT(CASE WHEN o_totalprice IS NULL THEN 1 END) AS n_null
                |FROM graftq99.bench.ord
                |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
      },
      Some("""WITH upd AS (
             |  SELECT o_orderkey AS k, o_totalprice + 100 AS p
             |  FROM orders WHERE o_orderkey % 3 = 0
             |), kept AS (
             |  SELECT o.o_orderstatus AS st,
             |    CASE WHEN u.k IS NOT NULL AND o.o_totalprice < 50000 THEN u.p
             |         ELSE o.o_totalprice END AS p,
             |    (u.k IS NOT NULL AND NOT (o.o_totalprice < 50000)
             |       AND o.o_totalprice >= 150000) AS del
             |  FROM orders o LEFT JOIN upd u ON o.o_orderkey = u.k
             |), allrows AS (
             |  SELECT st, p FROM kept WHERE NOT del
             |  UNION ALL
             |  SELECT 'N' AS st, NULL AS p FROM orders
             |  WHERE o_orderkey % 5 = 0 AND o_totalprice > 100000
             |)
             |SELECT st AS o_orderstatus, COUNT(*) AS n,
             |  CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS total,
             |  COUNT(CASE WHEN p IS NULL THEN 1 END) AS n_null
             |FROM allrows GROUP BY st ORDER BY o_orderstatus""".stripMargin)),

    // Metadata-only column rename: era-1 files keep the old physical
    // name, era-2 files carry the new one, and the scan maps both by
    // field id — zero rewrites (asserted in-plan). Values are
    // rename-invariant, so the oracle reads the raw parquet.
    "q98_rename_evolution" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq98").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq98", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq98.warehouse",
            Files.createTempDirectory("graft-rename").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq98.bench")
        s.sql("DROP TABLE IF EXISTS graftq98.bench.li")
        s.sql("""CREATE TABLE graftq98.bench.li
                |(l_orderkey BIGINT, l_returnflag STRING, l_quantity DOUBLE)""".stripMargin)
        t(s, dir, "lineitem").createOrReplaceTempView("q98_src")
        s.sql("""INSERT INTO graftq98.bench.li
                |SELECT l_orderkey, l_returnflag, l_quantity
                |FROM q98_src WHERE l_orderkey % 2 = 0""".stripMargin)
        val cat = GraftCatalog(s, s.conf.get("spark.sql.catalog.graftq98.warehouse"))
        val tbl = cat.load(TableIdent("bench", "li"))
        val before = tbl.currentOrFail().files.map(_.path).toSet
        s.sql("ALTER TABLE graftq98.bench.li RENAME COLUMN l_quantity TO qty")
        require(tbl.currentOrFail().files.map(_.path).toSet == before,
          "RENAME COLUMN rewrote data files")
        require(tbl.currentOrFail().schemaLog.nonEmpty,
          "RENAME COLUMN recorded no naming history")
        s.sql("""INSERT INTO graftq98.bench.li
                |SELECT l_orderkey, l_returnflag, l_quantity AS qty
                |FROM q98_src WHERE l_orderkey % 2 = 1""".stripMargin)
        // filter + aggregate on the renamed column across BOTH eras
        s.sql("""SELECT l_returnflag, COUNT(*) AS n,
                |  CAST(SUM(CAST(qty AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
                |FROM graftq98.bench.li WHERE qty >= 5
                |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem WHERE l_quantity >= 5
             |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // General MERGE INTO — the full verb, not just the canonical
    // upsert: two conditional MATCHED clauses (first-match-wins), a
    // conditional INSERT with a partial column list (unassigned →
    // NULL), and NOT MATCHED BY SOURCE update. The end state is a
    // pure function of the source parquet, so the oracle rebuilds it
    // with a LEFT JOIN + CASE — engine-independent semantics of the
    // SQL-standard clause order.
    "q97_merge_general" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq97").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq97", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq97.warehouse",
            Files.createTempDirectory("graft-merge").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq97.bench")
        s.sql("DROP TABLE IF EXISTS graftq97.bench.ord")
        s.sql("""CREATE TABLE graftq97.bench.ord
                |(o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)""".stripMargin)
        t(s, dir, "orders").createOrReplaceTempView("q97_orders")
        s.sql("""INSERT INTO graftq97.bench.ord
                |SELECT o_orderkey, o_orderstatus, o_totalprice FROM q97_orders""".stripMargin)
        // source: an update slice (every 3rd key, shifted price) plus
        // an insert slice (offset keys that match nothing)
        s.sql("""SELECT o_orderkey AS k, o_totalprice + 100 AS p
                |FROM q97_orders WHERE o_orderkey % 3 = 0
                |UNION ALL
                |SELECT o_orderkey + 100000000 AS k, o_totalprice AS p
                |FROM q97_orders WHERE o_orderkey % 5 = 0""".stripMargin)
          .createOrReplaceTempView("q97_src")
        s.sql("""MERGE INTO graftq97.bench.ord t USING q97_src s
                |ON t.o_orderkey = s.k
                |WHEN MATCHED AND t.o_totalprice < 50000 THEN UPDATE SET o_totalprice = s.p
                |WHEN MATCHED AND t.o_totalprice >= 150000 THEN DELETE
                |WHEN NOT MATCHED AND s.p > 100000 THEN
                |  INSERT (o_orderkey, o_orderstatus) VALUES (s.k, 'N')
                |WHEN NOT MATCHED BY SOURCE AND t.o_orderstatus = 'F' THEN
                |  UPDATE SET o_totalprice = t.o_totalprice * 2""".stripMargin)
        s.sql("""SELECT o_orderstatus, COUNT(*) AS n,
                |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
                |  COUNT(CASE WHEN o_totalprice IS NULL THEN 1 END) AS n_null
                |FROM graftq97.bench.ord
                |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
      },
      Some("""WITH upd AS (
             |  SELECT o_orderkey AS k, o_totalprice + 100 AS p
             |  FROM orders WHERE o_orderkey % 3 = 0
             |), kept AS (
             |  SELECT o.o_orderstatus AS st,
             |    CASE WHEN u.k IS NOT NULL AND o.o_totalprice < 50000 THEN u.p
             |         WHEN u.k IS NULL AND o.o_orderstatus = 'F' THEN o.o_totalprice * 2
             |         ELSE o.o_totalprice END AS p,
             |    (u.k IS NOT NULL AND NOT (o.o_totalprice < 50000)
             |       AND o.o_totalprice >= 150000) AS del
             |  FROM orders o LEFT JOIN upd u ON o.o_orderkey = u.k
             |), allrows AS (
             |  SELECT st, p FROM kept WHERE NOT del
             |  UNION ALL
             |  SELECT 'N' AS st, NULL AS p FROM orders
             |  WHERE o_orderkey % 5 = 0 AND o_totalprice > 100000
             |)
             |SELECT st AS o_orderstatus, COUNT(*) AS n,
             |  CAST(SUM(CAST(p AS DECIMAL(18,2))) AS DOUBLE) AS total,
             |  COUNT(CASE WHEN p IS NULL THEN 1 END) AS n_null
             |FROM allrows GROUP BY st ORDER BY o_orderstatus""".stripMargin)),

    // Branch WAP + merge, pure SQL: fork, stage an insert on the branch
    // ident, let main advance past the fork (fast-forward now
    // impossible), then CALL merge_branch — the rebase path. The end
    // state is source-derivable: every order lands exactly once.
    "q84_branch_wap" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq84").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq84", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq84.warehouse",
            Files.createTempDirectory("graft-wap").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq84.bench")
        s.sql("DROP TABLE IF EXISTS graftq84.bench.ords")
        s.sql("""CREATE TABLE graftq84.bench.ords
                |(o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)""".stripMargin)
        t(s, dir, "orders").createOrReplaceTempView("q84_src")
        s.sql("""INSERT INTO graftq84.bench.ords
                |SELECT o_orderkey, o_orderstatus, o_totalprice
                |FROM q84_src WHERE o_orderstatus = 'O'""".stripMargin)
        s.sql("CALL graftq84.system.create_branch('bench', 'ords', 'audit', -1)")
        s.sql("""INSERT INTO graftq84.bench.ords.branch_audit
                |SELECT o_orderkey, o_orderstatus, o_totalprice
                |FROM q84_src WHERE o_orderstatus = 'F'""".stripMargin)
        s.sql("""INSERT INTO graftq84.bench.ords
                |SELECT o_orderkey, o_orderstatus, o_totalprice
                |FROM q84_src WHERE o_orderstatus = 'P'""".stripMargin)
        s.sql("CALL graftq84.system.merge_branch('bench', 'ords', 'audit')")
        s.sql("""SELECT o_orderstatus, COUNT(*) AS n,
                |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
                |FROM graftq84.bench.ords
                |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
      },
      Some(s"""SELECT o_orderstatus, COUNT(*) AS n, ${DSUM("o_totalprice")} AS total
              |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // The DSv2 CDC relation (`t.changes`, startingVersion option) over
    // the same append/append/month-aligned-delete history as q83 — the
    // SQL-reachable dual of scanChangesBetween, against the same
    // source-parquet oracle shape.
    "q85_changes_feed" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq85").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq85", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq85.warehouse",
            Files.createTempDirectory("graft-cdcq").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq85.bench")
        s.sql("DROP TABLE IF EXISTS graftq85.bench.li")
        s.sql("""CREATE TABLE graftq85.bench.li
                |(l_orderkey BIGINT, l_shipdate TIMESTAMP_NTZ, l_extendedprice DOUBLE)
                |PARTITIONED BY (months(l_shipdate))""".stripMargin)
        t(s, dir, "lineitem").createOrReplaceTempView("q85_src")
        s.sql("""INSERT INTO graftq85.bench.li
                |SELECT l_orderkey, l_shipdate, l_extendedprice
                |FROM q85_src WHERE l_shipdate < TIMESTAMP '1997-01-01'""".stripMargin)
        s.sql("""INSERT INTO graftq85.bench.li
                |SELECT l_orderkey, l_shipdate, l_extendedprice
                |FROM q85_src WHERE l_shipdate >= TIMESTAMP '1997-01-01'""".stripMargin)
        s.sql("DELETE FROM graftq85.bench.li WHERE l_shipdate < TIMESTAMP '1997-06-01'")
        s.read.option("startingVersion", "0")
          .table("graftq85.bench.li.changes")
          .groupBy(col("_commit_version"), col("_change_type"))
          .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("total"))
          .orderBy(col("_commit_version"), col("_change_type"))
      },
      Some(s"""SELECT 1 AS _commit_version, 'insert' AS _change_type,
              |       COUNT(*) AS n, ${DSUM("l_extendedprice")} AS total
              |FROM lineitem WHERE l_shipdate < TIMESTAMP '1997-01-01'
              |UNION ALL
              |SELECT 2, 'insert', COUNT(*), ${DSUM("l_extendedprice")}
              |FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              |UNION ALL
              |SELECT 3, 'delete', COUNT(*), ${DSUM("l_extendedprice")}
              |FROM lineitem WHERE l_shipdate < TIMESTAMP '1997-06-01'
              |ORDER BY _commit_version, _change_type""".stripMargin)),

    // The DSv2 CDC relation in the AT-SCALE configuration the round-11
    // feed refused: a mor-mode table (merge-on-read predicate delete —
    // zero file churn; the feed serves its exact pre-image from the
    // materialized `_cdc` cache) crossed with a metadata-only column
    // rename (pre-rename files read under physical era names, mapped
    // by field id). Commit version numbers depend on catalog
    // bookkeeping, so the oracle pins COUNT(DISTINCT version) per side
    // instead of literal versions.
    "q102_changes_feed_mor" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq102").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq102", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq102.warehouse",
            Files.createTempDirectory("graft-cdcmor").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq102.bench")
        s.sql("DROP TABLE IF EXISTS graftq102.bench.li")
        s.sql("""CREATE TABLE graftq102.bench.li
                |(l_orderkey BIGINT, l_shipdate TIMESTAMP_NTZ, l_extendedprice DOUBLE)
                |TBLPROPERTIES ('graft.delete.mode' = 'mor')""".stripMargin)
        t(s, dir, "lineitem").createOrReplaceTempView("q102_src")
        s.sql("""INSERT INTO graftq102.bench.li
                |SELECT l_orderkey, l_shipdate, l_extendedprice
                |FROM q102_src WHERE l_shipdate < TIMESTAMP '1997-01-01'""".stripMargin)
        s.sql("""INSERT INTO graftq102.bench.li
                |SELECT l_orderkey, l_shipdate, l_extendedprice
                |FROM q102_src WHERE l_shipdate >= TIMESTAMP '1997-01-01'""".stripMargin)
        s.sql("DELETE FROM graftq102.bench.li WHERE l_shipdate < TIMESTAMP '1996-03-01'")
        val cat = GraftCatalog(s, s.conf.get("spark.sql.catalog.graftq102.warehouse"))
        val tbl = cat.load(TableIdent("bench", "li"))
        require(tbl.currentOrFail().deleteGroups.nonEmpty,
          "delete was not recorded merge-on-read")
        val filesBefore = tbl.currentOrFail().files.map(_.path).toSet
        s.sql("ALTER TABLE graftq102.bench.li RENAME COLUMN l_extendedprice TO l_price")
        require(tbl.currentOrFail().files.map(_.path).toSet == filesBefore,
          "RENAME COLUMN rewrote data files")
        s.sql("""INSERT INTO graftq102.bench.li
                |SELECT l_orderkey, l_shipdate, l_extendedprice AS l_price
                |FROM q102_src WHERE l_shipdate >= TIMESTAMP '1998-06-01'""".stripMargin)
        s.read.option("startingVersion", "0")
          .table("graftq102.bench.li.changes")
          .groupBy(col("_change_type"))
          .agg(countDistinct(col("_commit_version")).as("ncommits"),
            count(lit(1)).as("n"), dsum(col("l_price")).as("total"))
          .orderBy(col("_change_type"))
      },
      Some(s"""SELECT 'delete' AS _change_type, CAST(1 AS BIGINT) AS ncommits,
              |       COUNT(*) AS n, ${DSUM("l_extendedprice")} AS total
              |FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-03-01'
              |UNION ALL
              |SELECT 'insert', CAST(3 AS BIGINT), COUNT(*), ${DSUM("l_extendedprice")}
              |FROM (SELECT l_extendedprice FROM lineitem
              |      UNION ALL
              |      SELECT l_extendedprice FROM lineitem
              |      WHERE l_shipdate >= TIMESTAMP '1998-06-01') u
              |ORDER BY _change_type""".stripMargin)),

    // S9 time travel: scan-as-of the first snapshot after a second append
    "q44_time_travel" -> Q(
      (s, dir) => {
        val cat = freshCatalog(s)
        val ident = TableIdent("bench", "ord_tt")
        val o = t(s, dir, "orders")
        val tbl = cat.ensure(ident)
        tbl.append(o.where(col("o_orderstatus") === "O"))
        tbl.append(o.where(col("o_orderstatus") =!= "O"))
        tbl.scanAsOfVersion(0)
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      },
      Some(s"""SELECT COUNT(*) AS n, ${DSUM("o_totalprice")} AS total
              |FROM orders WHERE o_orderstatus = 'O'""".stripMargin)),

    // C2/C3 additive schema evolution mid-stream
    "q45_schema_evolution" -> Q(
      (s, dir) => {
        val cat = freshCatalog(s)
        val ident = TableIdent("bench", "ord_evo")
        val o = t(s, dir, "orders")
        val batch1 = o.where(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), col("o_totalprice"))
        val batch2 = o.where(col("o_orderkey") % 2 =!= 0)
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
        val loader = new Loader(cat, LoaderConfig(
          writeMode = WriteMode.Append, schemaEvolution = true))
        loader.loadData(batch1, ident)
        loader.loadData(batch2, ident)
        cat.load(ident).scan()
          .groupBy(coalesce(col("o_orderpriority"), lit("none")).as("priority"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("priority"))
      },
      Some(s"""WITH unioned AS (
              |  SELECT o_totalprice, NULL AS o_orderpriority
              |  FROM orders WHERE o_orderkey % 2 = 0
              |  UNION ALL
              |  SELECT o_totalprice, o_orderpriority
              |  FROM orders WHERE o_orderkey % 2 <> 0)
              |SELECT COALESCE(o_orderpriority, 'none') AS priority, COUNT(*) AS n,
              |  ${DSUM("o_totalprice")} AS total
              |FROM unioned GROUP BY 1 ORDER BY priority""".stripMargin)),

    // M3 compaction: data identical afterwards, file count shrinks
    "q46_compaction" -> Q(
      (s, dir) => {
        val cat = freshCatalog(s)
        val ident = TableIdent("bench", "ord_cmp")
        val o = t(s, dir, "orders")
        val tbl = cat.ensure(ident)
        // several small appends ⇒ many small files
        (0 until 4).foreach(i => tbl.append(o.where(col("o_orderkey") % 4 === i)))
        val before = tbl.currentOrFail().files.size
        tbl.compact(targetFiles = 1)
        val after = tbl.currentOrFail().files.size
        require(after <= before, s"compaction grew files: $before -> $after")
        tbl.scan()
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderstatus"))
      },
      Some(s"""SELECT o_orderstatus, COUNT(*) AS n, ${DSUM("o_totalprice")} AS total
              |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // M1 snapshot expiry: history shrinks, current data unchanged
    "q47_expire_snapshots" -> Q(
      (s, dir) => {
        val cat = freshCatalog(s)
        val ident = TableIdent("bench", "ord_exp")
        val o = t(s, dir, "orders")
        val tbl = cat.ensure(ident)
        (0 until 3).foreach(i => tbl.append(o.where(col("o_orderkey") % 3 === i)))
        val expired = tbl.expireSnapshots(keepLast = 1)
        require(expired == 2, s"expected 2 expired, got $expired")
        require(tbl.snapshots().size == 1, "expected 1 surviving snapshot")
        tbl.scan().agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      },
      Some(s"""SELECT COUNT(*) AS n, ${DSUM("o_totalprice")} AS total FROM orders""".stripMargin)),

    // rollback_to_version: bad commits (wrong-status append + a delete)
    // rolled back metadata-only; the scan must read exactly snapshot
    // 0's content and history must stay append-only (5 commits)
    "q78_rollback" -> Q(
      (s, dir) => {
        val cat = freshCatalog(s)
        val ident = TableIdent("bench", "ord_rb")
        val o = t(s, dir, "orders")
        val tbl = cat.ensure(ident)
        tbl.append(o.where(col("o_orderstatus") === "O"))
        tbl.append(o.where(col("o_orderstatus") =!= "O")) // the mistake
        tbl.deleteWhere("o_totalprice < 50000.0")         // churn on top
        val snap = tbl.rollbackTo(0)
        require(snap.operation == "rollback" && snap.version == 3,
          s"unexpected rollback head: ${snap.operation} v${snap.version}")
        require(tbl.snapshots().size == 4, "history must stay append-only")
        tbl.scan().agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
      },
      Some(s"""SELECT COUNT(*) AS n, ${DSUM("o_totalprice")} AS total
              |FROM orders WHERE o_orderstatus = 'O'""".stripMargin)),

    // ST1 commit_interval micro-batching: 10 batches @ interval 3 ⇒ 4 txns
    "q48_commit_interval" -> Q(
      (s, dir) => {
        val cat = freshCatalog(s)
        val ident = TableIdent("bench", "ord_ci")
        val o = t(s, dir, "orders")
        val batches = (0 until 10).iterator
          .map(i => o.where(col("o_orderkey") % 10 === i))
        val loader = new Loader(cat, LoaderConfig(
          writeMode = WriteMode.Append, commitInterval = 3))
        val result = loader.loadBatches(batches, ident)
        val snaps = cat.load(ident).snapshots().size.toLong
        import s.implicits._
        Seq((snaps, result.rowsLoaded, result.batchesProcessed.toLong))
          .toDF("snapshots", "rows_loaded", "batches")
      },
      Some("""SELECT CAST(4 AS BIGINT) AS snapshots, COUNT(*) AS rows_loaded,
             |  CAST(10 AS BIGINT) AS batches FROM orders""".stripMargin)),

    // incremental read: only the rows appended between two snapshots
    "q58_incremental_read" -> Q(
      (s, dir) => {
        val cat = freshCatalog(s)
        val ident = TableIdent("bench", "ord_inc")
        val o = t(s, dir, "orders")
        val tbl = cat.ensure(ident)
        tbl.append(o.where(col("o_orderstatus") === "O"))
        tbl.append(o.where(col("o_orderstatus") === "F"))
        tbl.append(o.where(col("o_orderstatus") === "P"))
        // consume versions (0, 2]: the F and P batches only
        tbl.scanAppendedBetween(0, 2)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
          .orderBy(col("o_orderstatus"))
      },
      Some(s"""SELECT o_orderstatus, COUNT(*) AS n, ${DSUM("o_totalprice")} AS total
              |FROM orders WHERE o_orderstatus IN ('F', 'P')
              |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // DSv2 catalog round-trip: CREATE TABLE / INSERT INTO / SELECT with
    // a pushed-down filter, all through spark.sql against the
    // spark.sql.catalog.* integration (the Iceberg-shape surface)
    "q70_dsv2_sql" -> Q(
      (s, dir) => {
        // Spark caches the catalog instance after first initialize(), so
        // the warehouse conf must be set once per session — re-setting it
        // on warm re-runs would silently diverge from the active catalog
        if (s.conf.getOption("spark.sql.catalog.graftq70").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq70", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq70.warehouse",
            Files.createTempDirectory("graft-dsv2").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq70.bench")
        s.sql("DROP TABLE IF EXISTS graftq70.bench.ords")
        s.sql("""CREATE TABLE graftq70.bench.ords
                |(o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE)""".stripMargin)
        t(s, dir, "orders").createOrReplaceTempView("q70_src")
        s.sql("""INSERT INTO graftq70.bench.ords
                |SELECT o_orderkey, o_orderstatus, o_totalprice FROM q70_src""".stripMargin)
        s.sql("""SELECT o_orderstatus, COUNT(*) AS n,
                |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
                |FROM graftq70.bench.ords
                |WHERE o_totalprice > 100000
                |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
             |FROM orders WHERE o_totalprice > 100000
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // DSv2 runtime filtering (DPP) under the correctness gate: a
    // partitioned fact joined to a selectively-filtered dim table; the
    // broadcast key set re-prunes fact files mid-execution (plan shape
    // asserted), and the oracle recomputes the join from raw parquet
    "q76_dpp_join" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq76").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq76", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq76.warehouse",
            Files.createTempDirectory("graft-dpp").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq76.bench")
        s.sql("DROP TABLE IF EXISTS graftq76.bench.li")
        s.sql("DROP TABLE IF EXISTS graftq76.bench.sup")
        s.sql("""CREATE TABLE graftq76.bench.li
                |(l_suppkey BIGINT, l_quantity DOUBLE) PARTITIONED BY (bucket(8, l_suppkey))""".stripMargin)
        s.sql("""CREATE TABLE graftq76.bench.sup (s_suppkey BIGINT, s_nationkey BIGINT)""")
        t(s, dir, "lineitem").createOrReplaceTempView("q76_li_src")
        t(s, dir, "supplier").createOrReplaceTempView("q76_sup_src")
        s.sql("INSERT INTO graftq76.bench.li SELECT l_suppkey, l_quantity FROM q76_li_src")
        s.sql("INSERT INTO graftq76.bench.sup SELECT s_suppkey, s_nationkey FROM q76_sup_src")
        val out = s.sql(
          """SELECT f.l_suppkey, COUNT(*) AS n,
            |  CAST(SUM(CAST(f.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
            |FROM graftq76.bench.li f JOIN graftq76.bench.sup d ON f.l_suppkey = d.s_suppkey
            |WHERE d.s_nationkey = 3
            |GROUP BY f.l_suppkey ORDER BY f.l_suppkey""".stripMargin)
        val planned = out.queryExecution.executedPlan.toString
        require(planned.contains("dynamicpruningexpression"),
          "runtime filter missing from the DPP join plan")
        out
      },
      Some("""SELECT l_suppkey, COUNT(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |WHERE s_nationkey = 3
             |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin)),

    // Metadata-only aggregate pushdown: count/min/max answered from the
    // manifest-list summaries (plan asserted to be a LocalTableScan —
    // zero data files opened); the oracle recomputes from raw parquet
    "q79_agg_pushdown" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq79").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq79", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq79.warehouse",
            Files.createTempDirectory("graft-aggpd").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq79.bench")
        s.sql("DROP TABLE IF EXISTS graftq79.bench.ords")
        s.sql("""CREATE TABLE graftq79.bench.ords
                |(o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE,
                | o_orderdate TIMESTAMP_NTZ)""".stripMargin)
        t(s, dir, "orders").createOrReplaceTempView("q79_src")
        // two commits so the answer must merge several manifest summaries
        s.sql("""INSERT INTO graftq79.bench.ords
                |SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
                |FROM q79_src WHERE o_orderkey % 2 = 0""".stripMargin)
        s.sql("""INSERT INTO graftq79.bench.ords
                |SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
                |FROM q79_src WHERE o_orderkey % 2 <> 0""".stripMargin)
        val out = s.sql(
          """SELECT COUNT(*) AS n, COUNT(o_custkey) AS n_cust,
            |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
            |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
            |  MIN(o_orderdate) AS min_date, MAX(o_orderdate) AS max_date
            |FROM graftq79.bench.ords""".stripMargin)
        require(out.queryExecution.executedPlan.toString.contains("LocalTableScan"),
          "aggregate was not answered from metadata (expected LocalTableScan)")
        out
      },
      Some("""SELECT COUNT(*) AS n, COUNT(o_custkey) AS n_cust,
             |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
             |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
             |  MIN(o_orderdate) AS min_date, MAX(o_orderdate) AS max_date
             |FROM orders""".stripMargin)),

    // Grouped aggregate pushdown: GROUP BY the identity partition
    // column answered per partition value from per-file metadata (plan
    // asserted LocalTableScan); oracle recomputes from raw parquet
    "q79b_agg_groupby_pushdown" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq79").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq79", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq79.warehouse",
            Files.createTempDirectory("graft-aggpd").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq79.bench")
        s.sql("DROP TABLE IF EXISTS graftq79.bench.ordsp")
        s.sql("""CREATE TABLE graftq79.bench.ordsp
                |(o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING)
                |PARTITIONED BY (o_orderstatus)""".stripMargin)
        t(s, dir, "orders").createOrReplaceTempView("q79b_src")
        s.sql("""INSERT INTO graftq79.bench.ordsp
                |SELECT o_orderkey, o_custkey, o_orderstatus FROM q79b_src""".stripMargin)
        val out = s.sql(
          """SELECT o_orderstatus, COUNT(*) AS n, COUNT(o_custkey) AS n_cust,
            |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
            |FROM graftq79.bench.ordsp
            |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
        require(out.queryExecution.executedPlan.toString.contains("LocalTableScan"),
          "grouped aggregate was not answered from metadata (expected LocalTableScan)")
        out
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n, COUNT(o_custkey) AS n_cust,
             |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // Storage-partitioned join: two co-bucketed graft tables join and
    // aggregate with ZERO shuffle (plan asserted: no hash-partitioning
    // exchange); the oracle recomputes the join from raw parquet
    "q80_spj_join" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq80").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq80", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq80.warehouse",
            Files.createTempDirectory("graft-spj").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq80.bench")
        s.sql("DROP TABLE IF EXISTS graftq80.bench.li")
        s.sql("DROP TABLE IF EXISTS graftq80.bench.sup")
        s.sql("""CREATE TABLE graftq80.bench.li
                |(l_suppkey BIGINT, l_quantity DOUBLE)
                |PARTITIONED BY (bucket(8, l_suppkey))""".stripMargin)
        s.sql("""CREATE TABLE graftq80.bench.sup
                |(s_suppkey BIGINT, s_acctbal DOUBLE)
                |PARTITIONED BY (bucket(8, s_suppkey))""".stripMargin)
        t(s, dir, "lineitem").createOrReplaceTempView("q80_li_src")
        t(s, dir, "supplier").createOrReplaceTempView("q80_sup_src")
        s.sql("INSERT INTO graftq80.bench.li SELECT l_suppkey, l_quantity FROM q80_li_src")
        s.sql("INSERT INTO graftq80.bench.sup SELECT s_suppkey, s_acctbal FROM q80_sup_src")
        // plan with SPJ on and broadcast off so the zero-shuffle claim
        // is real; both are restored once the plan is materialized
        val conf = s.conf
        val prevB = conf.getOption("spark.sql.sources.v2.bucketing.enabled")
        val prevT = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
        conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try {
          val out = s.sql(
            """SELECT f.l_suppkey, COUNT(*) AS n,
              |  CAST(SUM(CAST(f.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
              |  MAX(d.s_acctbal) AS acctbal
              |FROM graftq80.bench.li f JOIN graftq80.bench.sup d
              |  ON f.l_suppkey = d.s_suppkey
              |GROUP BY f.l_suppkey ORDER BY f.l_suppkey""".stripMargin)
          val planned = out.queryExecution.executedPlan.toString
          require(!planned.contains("Exchange hashpartitioning"),
            "storage-partitioned join still shuffles (expected no hash exchange)")
          out
        } finally {
          prevB.fold(conf.unset("spark.sql.sources.v2.bucketing.enabled"))(
            conf.set("spark.sql.sources.v2.bucketing.enabled", _))
          prevT.fold(conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
            conf.set("spark.sql.autoBroadcastJoinThreshold", _))
        }
      },
      Some("""SELECT l_suppkey, COUNT(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
             |  MAX(s_acctbal) AS acctbal
             |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
             |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin)),

    // Z-order layout: rewrite on (l_orderkey, l_suppkey), then filter
    // on the SECOND column — file pruning asserted in-plan (z-order's
    // whole point; linear clustering can't prune a secondary column),
    // result oracle-checked against raw parquet
    "q81_zorder_scan" -> Q(
      (s, dir) => {
        val cat = freshCatalog(s)
        val ident = TableIdent("bench", "li_zorder")
        val tbl = cat.ensure(ident)
        tbl.append(t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey"), col("l_quantity")))
        tbl.compactZOrder(Seq("l_orderkey", "l_suppkey"), targetFiles = 16)
        val total = tbl.currentOrFail().files.count(_.rows > 0)
        val pred = "l_suppkey BETWEEN 3 AND 7"
        val hit = tbl.prunedFiles(pred).size
        require(hit < total,
          s"z-order did not prune on the secondary column ($hit of $total files)")
        tbl.scanWhere(pred)
          .groupBy("l_suppkey")
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy("l_suppkey")
      },
      Some("""SELECT l_suppkey, COUNT(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem WHERE l_suppkey BETWEEN 3 AND 7
             |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin)),

    // DSv2 DML round-trip: UPDATE + DELETE + MERGE through spark.sql,
    // then an aggregate the DuckDB oracle recomputes from the applied
    // semantics over the raw source
    "q70b_dsv2_dml" -> Q(
      (s, dir) => {
        if (s.conf.getOption("spark.sql.catalog.graftq70").isEmpty) {
          s.conf.set("spark.sql.catalog.graftq70", "graft.connector.GraftSparkCatalog")
          s.conf.set("spark.sql.catalog.graftq70.warehouse",
            Files.createTempDirectory("graft-dsv2").toString)
        }
        s.sql("CREATE NAMESPACE IF NOT EXISTS graftq70.bench")
        s.sql("DROP TABLE IF EXISTS graftq70.bench.cust")
        s.sql("""CREATE TABLE graftq70.bench.cust
                |(c_custkey BIGINT, c_mktsegment STRING, c_acctbal DOUBLE)""".stripMargin)
        t(s, dir, "customer").createOrReplaceTempView("q70b_src")
        s.sql("""INSERT INTO graftq70.bench.cust
                |SELECT c_custkey, c_mktsegment, c_acctbal FROM q70b_src""".stripMargin)
        s.sql("""UPDATE graftq70.bench.cust SET c_acctbal = c_acctbal + 1000
                |WHERE c_mktsegment = 'BUILDING'""".stripMargin)
        s.sql("DELETE FROM graftq70.bench.cust WHERE c_acctbal < 0")
        s.sql("""MERGE INTO graftq70.bench.cust AS t
                |USING (SELECT c_custkey, 'MERGED' AS c_mktsegment, 0.0 AS c_acctbal
                |       FROM q70b_src WHERE c_custkey <= 5) AS src
                |ON t.c_custkey = src.c_custkey
                |WHEN MATCHED THEN UPDATE SET *
                |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        s.sql("""SELECT c_mktsegment, COUNT(*) AS n,
                |  CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS bal
                |FROM graftq70.bench.cust
                |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)
      },
      Some("""WITH upd AS (
             |  SELECT c_custkey, c_mktsegment,
             |    CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal + 1000
             |         ELSE c_acctbal END AS c_acctbal
             |  FROM customer),
             |del AS (SELECT * FROM upd WHERE NOT (c_acctbal < 0)),
             |merged AS (
             |  SELECT c_custkey, 'MERGED' AS c_mktsegment, 0.0 AS c_acctbal
             |  FROM customer WHERE c_custkey <= 5
             |  UNION ALL
             |  SELECT * FROM del WHERE c_custkey NOT IN
             |    (SELECT c_custkey FROM customer WHERE c_custkey <= 5))
             |SELECT c_mktsegment, COUNT(*) AS n,
             |  CAST(SUM(CAST(c_acctbal AS DECIMAL(14,2))) AS DOUBLE) AS bal
             |FROM merged GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin)),

    // S9 snapshot history as a relation: operations + per-snapshot row
    // counts are deterministic, so the oracle pins the whole lineage
    "q52_history" -> Q(
      (s, dir) => {
        val cat = freshCatalog(s)
        val ident = TableIdent("bench", "ord_hist")
        val o = t(s, dir, "orders")
        val tbl = cat.ensure(ident)
        tbl.append(o.where(col("o_orderstatus") === "O"))
        tbl.append(o.where(col("o_orderstatus") =!= "O"))
        tbl.deleteWhere("o_orderstatus = 'F'")
        tbl.history()
          .select(col("version"), col("operation"), col("row_count"))
          .orderBy(col("version"))
      },
      Some("""SELECT * FROM (
             |  SELECT 0 AS version, 'append' AS operation,
             |    (SELECT COUNT(*) FROM orders WHERE o_orderstatus = 'O') AS row_count
             |  UNION ALL SELECT 1, 'append', (SELECT COUNT(*) FROM orders)
             |  UNION ALL SELECT 2, 'delete',
             |    (SELECT COUNT(*) FROM orders WHERE o_orderstatus <> 'F'))
             |ORDER BY version""".stripMargin)),

    // S4 messy-JSON ingest: nested → JSON strings, string fallback on
    // mixed types, union of keys, all-null ⇒ string
    "q49_messy_json" -> Q(
      (s, dir) => {
        val records: Seq[JsonIngest.Record] = Seq(
          Seq("id" -> 1, "name" -> "alpha", "score" -> 3.5,
            "meta" -> Map("k" -> "v", "n" -> 2), "mixed" -> 7, "ghost" -> null),
          Seq("id" -> 2, "name" -> "beta", "score" -> 4,
            "tags" -> Seq("x", "y"), "mixed" -> "seven"),
          Seq("id" -> 3, "name" -> "gamma"))
        JsonIngest.createDataFrame(s, records)
          .orderBy(col("id"))
      },
      Some("""SELECT * FROM (VALUES
             |  (CAST(1 AS BIGINT), 'alpha', 3.5, '{"k":"v","n":2}', '7', CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)),
             |  (CAST(2 AS BIGINT), 'beta', 4.0, CAST(NULL AS VARCHAR), 'seven', CAST(NULL AS VARCHAR), '["x","y"]'),
             |  (CAST(3 AS BIGINT), 'gamma', CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR))
             |) AS t(id, name, score, meta, mixed, ghost, tags)
             |ORDER BY id""".stripMargin)),

    // S6 REST source: loopback HTTP endpoint -> paginated JSON batches
    // -> messy-dict pipeline -> table; per-page commits pinned
    "q73_rest_ingest" -> Q(
      (s, dir) => {
        val server = com.sun.net.httpserver.HttpServer.create(
          new java.net.InetSocketAddress("127.0.0.1", 0), 0)
        server.createContext("/docs", (ex: com.sun.net.httpserver.HttpExchange) => {
          val page = ex.getRequestURI.getQuery.stripPrefix("page=").toInt
          val payload = page match {
            case 1 => """[{"id":1,"name":"ada","score":9.5},{"id":2,"name":"bob","score":7.25}]"""
            case 2 => """[{"id":3,"name":"cyd"}]"""
            case _ => "[]"
          }
          val bytes = payload.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          ex.sendResponseHeaders(200, bytes.length)
          ex.getResponseBody.write(bytes)
          ex.close()
        })
        server.start()
        try {
          val cat = freshCatalog(s)
          val ident = TableIdent("bench", "rest_docs")
          val res = new Loader(cat).loadRest(
            s"http://127.0.0.1:${server.getAddress.getPort}/docs",
            ident,
            Some(LoaderConfig(writeMode = WriteMode.Append, commitInterval = 1)),
            graft.sources.RestSource.RestConfig(pageParam = Some("page")))
          require(res.rowsLoaded == 3 && res.batchesProcessed == 2,
            s"rest ingest shape off: $res")
          cat.load(ident).scan()
            .select(col("id"), col("name"), col("score"))
            .orderBy(col("id"))
        } finally server.stop(0)
      },
      Some("""SELECT * FROM (VALUES
             |  (CAST(1 AS BIGINT), 'ada', 9.5),
             |  (CAST(2 AS BIGINT), 'bob', 7.25),
             |  (CAST(3 AS BIGINT), 'cyd', CAST(NULL AS DOUBLE))
             |) AS t(id, name, score) ORDER BY id""".stripMargin)),

    // S8 pruned scan: predicate on the partition source column touches
    // a strict subset of files (asserted), results still exact
    "q50_pruned_scan" -> Q(
      (s, dir) => {
        val cat = freshCatalog(s)
        val ident = TableIdent("bench", "li_prune")
        val li = t(s, dir, "lineitem")
        val tbl = cat.ensure(ident, Some("month(l_shipdate)"))
        tbl.append(li)
        val total = tbl.currentOrFail().files.size
        val pruned = tbl.prunedFiles("l_shipdate >= '1999-01-01'").size
        require(pruned < total, s"pruning ineffective: $pruned of $total files")
        tbl.scanWhere("l_shipdate >= '1999-01-01'")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("l_returnflag"))
      },
      Some(s"""SELECT l_returnflag, COUNT(*) AS n, ${DSUM("l_quantity")} AS sum_qty
              |FROM lineitem WHERE l_shipdate >= TIMESTAMP '1999-01-01'
              |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // M3 clustering rewrite → zone-map sharpening: hash-scattered
    // appends leave every file's l_orderkey range spanning the whole
    // domain (zone maps prune nothing); compactClustered range-sorts so
    // each rewritten file covers a narrow slice and the SAME predicate
    // then skips most files via StatsPruner — the skip is asserted, the
    // scan result oracle-checked
    "q50b_clustered_prune" -> Q(
      (s, dir) => {
        val cat = freshCatalog(s)
        val ident = TableIdent("bench", "li_cluster")
        val li = t(s, dir, "lineitem")
        val tbl = cat.ensure(ident)
        // scatter rows across files so pre-clustering zone maps are weak
        tbl.append(li.repartition(8, pmod(xxhash64(col("l_orderkey")), lit(8))))
        val pred = "l_orderkey < 1000"
        val before = tbl.prunedFiles(pred).size
        val total = tbl.currentOrFail().files.size
        require(before == total,
          s"setup broken: scattered files should all survive ($before of $total)")
        tbl.compactClustered(Seq("l_orderkey"), targetFiles = 8)
        val after = tbl.prunedFiles(pred).size
        val afterTotal = tbl.currentOrFail().files.size
        require(after < afterTotal,
          s"clustering did not sharpen zone maps: $after of $afterTotal files survive")
        tbl.scanWhere(pred)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
          .orderBy(col("l_returnflag"))
      },
      Some(s"""SELECT l_returnflag, COUNT(*) AS n, ${DSUM("l_quantity")} AS sum_qty
              |FROM lineitem WHERE l_orderkey < 1000
              |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)))
}
