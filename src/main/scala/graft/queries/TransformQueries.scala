package graft.queries

import QueryHelpers._

import graft.partitioning.{PartitionExpr, Transform}

import org.apache.spark.sql.functions._

/** The partition-transform DSL (SURVEY §2.5, T0–T8) exercised as
  * queries: each transform's derived column is computed by the SAME
  * `Transform.derive` code the write path uses, then aggregated so the
  * DuckDB oracle can pin the values. Bucket is murmur3-based and not
  * SQL-expressible in DuckDB → internal-consistency query without an
  * oracle (driver records rows-only).
  */
object TransformQueries {

  val queries: Map[String, Q] = Map(

    "q15_transform_day" -> Q(
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val pf = PartitionExpr.parse("day(l_shipdate)")
        li.select(pf.derive(col("l_shipdate"), li.schema("l_shipdate").dataType).as("day"))
          .groupBy(col("day")).agg(count(lit(1)).as("n"))
          .orderBy(col("day")).limit(500)
      },
      Some("""SELECT strftime(l_shipdate, '%Y-%m-%d') AS day, COUNT(*) AS n
             |FROM lineitem GROUP BY 1 ORDER BY day LIMIT 500""".stripMargin)),

    "q16_transform_month_year" -> Q(
      (s, dir) => {
        val o = t(s, dir, "orders")
        val m = PartitionExpr.parse("month(o_orderdate)")
        val y = PartitionExpr.parse("year(o_orderdate)")
        val dt = o.schema("o_orderdate").dataType
        o.select(
            m.derive(col("o_orderdate"), dt).as("month"),
            y.derive(col("o_orderdate"), dt).as("year"))
          .groupBy(col("year"), col("month")).agg(count(lit(1)).as("n"))
          .orderBy(col("year"), col("month"))
      },
      Some("""SELECT strftime(o_orderdate, '%Y-%m') AS month, strftime(o_orderdate, '%Y') AS year,
             |  COUNT(*) AS n
             |FROM orders GROUP BY 1, 2 ORDER BY year, month""".stripMargin)),

    "q17_transform_hour" -> Q(
      (s, dir) => {
        val e = events(s, dir)
        val pf = PartitionExpr.parse("hour(ts)")
        e.select(pf.derive(col("ts"), e.schema("ts").dataType).as("hour"))
          .groupBy(col("hour")).agg(count(lit(1)).as("n"))
          .orderBy(col("hour")).limit(200)
      },
      Some("""SELECT strftime(ts, '%Y-%m-%d-%H') AS hour, COUNT(*) AS n
             |FROM events GROUP BY 1 ORDER BY hour LIMIT 200""".stripMargin)),

    "q18_transform_truncate" -> Q(
      (s, dir) => {
        val c = t(s, dir, "customer")
        val name = PartitionExpr.parse("truncate(9, c_name)")
        val key = PartitionExpr.parse("truncate(1000, c_custkey)")
        c.select(
            name.derive(col("c_name"), c.schema("c_name").dataType).as("name_pfx"),
            key.derive(col("c_custkey"), c.schema("c_custkey").dataType).as("key_bin"))
          .groupBy(col("name_pfx"), col("key_bin")).agg(count(lit(1)).as("n"))
          .orderBy(col("name_pfx"), col("key_bin"))
      },
      Some("""SELECT substr(c_name, 1, 9) AS name_pfx,
             |  CAST(c_custkey - (c_custkey % 1000) AS VARCHAR) AS key_bin,
             |  COUNT(*) AS n
             |FROM customer GROUP BY 1, 2 ORDER BY name_pfx, key_bin""".stripMargin)),

    // bucket + void + identity: murmur3 buckets have no DuckDB dual —
    // assert internal consistency instead (each key hashes to exactly
    // one bucket; bucket count bounded) and let the driver record rows.
    "q19_transform_bucket" -> Q(
      (s, dir) => {
        val o = t(s, dir, "orders")
        val pf = PartitionExpr.parse("bucket(16, o_orderkey)")
        o.select(pf.derive(col("o_orderkey"), o.schema("o_orderkey").dataType).as("bucket"))
          .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
          .orderBy(col("bucket").cast("int"))
      },
      None),

    // Iceberg-spec-exact bucket (custom codegen Expression registered
    // via GraftExtensions): murmur3 over Iceberg byte encodings — no
    // DuckDB dual; spec vectors asserted inline, distribution returned
    "q19c_iceberg_bucket" -> Q(
      (s, dir) => {
        import graft.functions.IcebergBucketExpr
        require(IcebergBucketExpr.bucketLong(34L, 1 << 30) == 2017239379 % (1 << 30),
          "iceberg_bucket spec vector mismatch")
        val o = t(s, dir, "orders")
        val registered = s.catalog.functionExists("iceberg_bucket")
        val bucketed =
          if (registered) // codegen Expression via GraftExtensions
            o.select(expr("iceberg_bucket(o_orderkey, 16)").as("bucket"))
          else { // session without the extension: typed fallback
            import s.implicits._
            o.select(col("o_orderkey")).as[Long]
              .map(k => IcebergBucketExpr.bucketLong(k, 16)).toDF("bucket")
          }
        bucketed.groupBy(col("bucket")).agg(count(lit(1)).as("n"))
          .orderBy(col("bucket"))
      },
      None),

    // portable-hash bucketing: md5-derived buckets re-derivable in any
    // engine (the q64b trick applied to bucket partitioning) — the
    // murmur3/Iceberg buckets above stay rows-only, but this pins the
    // bucket ladder (hash → mod → group-count) with an exact oracle
    "q19d_bucket_portable" -> Q(
      (s, dir) => {
        val o = t(s, dir, "orders")
        val h = pmod(
          conv(substring(md5(col("o_orderkey").cast("string")), 1, 15), 16, 10)
            .cast("long"),
          lit(16L))
        o.select(h.as("bucket"))
          .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
          .orderBy(col("bucket"))
      },
      Some("""SELECT CAST(CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 15))
             |    AS UBIGINT) % 16 AS BIGINT) AS bucket, COUNT(*) AS n
             |FROM orders GROUP BY 1 ORDER BY bucket""".stripMargin)),

    "q19b_transform_void_identity" -> Q(
      (s, dir) => {
        val n = t(s, dir, "nation")
        val ident = PartitionExpr.parse("n_name")
        val void = PartitionExpr.parse("void(n_name)")
        require(ident.transform == Transform.Identity && void.transform == Transform.Void)
        n.select(
            ident.derive(col("n_name"), n.schema("n_name").dataType).as("name"),
            void.derive(col("n_name"), n.schema("n_name").dataType).as("voided"))
          .orderBy(col("name"))
      },
      Some("""SELECT n_name AS name, CAST(NULL AS VARCHAR) AS voided
             |FROM nation ORDER BY name""".stripMargin)))
}
