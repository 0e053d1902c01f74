package graft

import graft.meta.{ColumnStats, DataFile, Snapshot}
import graft.partitioning.{PartitionExpr, Transform}
import graft.table.StatsPruner
import graft.types.TypeRegistry

import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties — the upgrade over the reference's example-based
  * tests (SURVEY §5): parser totality/round-trip, type-mapping
  * idempotence, codec round-trips, and zone-map pruning soundness.
  */
object PartitioningProps extends Properties("PartitionExpr") {

  private val colGen: Gen[String] = for {
    h <- Gen.oneOf(('a' to 'z') ++ Seq('_'))
    t <- Gen.listOfN(5, Gen.oneOf(('a' to 'z') ++ ('0' to '9') ++ Seq('_')))
  } yield (h :: t).mkString

  private val unaryGen: Gen[String] = for {
    f <- Gen.oneOf("year", "month", "day", "hour", "void")
    c <- colGen
  } yield s"$f($c)"

  private val binaryGen: Gen[String] = for {
    f <- Gen.oneOf("bucket", "truncate")
    n <- Gen.choose(1, 4096)
    c <- colGen
  } yield s"$f($n, $c)"

  private val validExpr: Gen[String] = Gen.oneOf(colGen, unaryGen, binaryGen)

  property("parse is total over the grammar and toString round-trips") =
    forAll(validExpr) { e =>
      val pf = PartitionExpr.parse(e)
      PartitionExpr.parse(pf.toString) == pf
    }

  property("unknown transform names always raise") =
    forAll(Gen.alphaLowerStr.suchThat(s =>
      s.nonEmpty && !Seq("year", "month", "day", "hour", "void").contains(s)), colGen) {
      (f, c) =>
        Prop.throws(classOf[Exception])(PartitionExpr.parse(s"$f($c)"))
    }

  property("derived field names are deterministic and prefix on the source column") =
    forAll(validExpr) { e =>
      val pf = PartitionExpr.parse(e)
      pf.fieldName.startsWith(pf.sourceCol) && pf.derivedColName == s"_p_${pf.fieldName}"
    }
}

object TypeRegistryProps extends Properties("TypeRegistry") {
  private val supported: Gen[DataType] = Gen.oneOf(
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType,
    StringType, BooleanType, BinaryType, DateType, TimestampType,
    TimestampNTZType, NullType, DecimalType(12, 2), ArrayType(FloatType),
    ArrayType(ShortType))

  property("canonicalize is idempotent") = forAll(supported) { dt =>
    val once = TypeRegistry().canonicalize(dt)
    TypeRegistry().canonicalize(once) == once
  }

  property("canonical types are never narrower than Integer") = forAll(supported) { dt =>
    TypeRegistry().canonicalize(dt) match {
      case ByteType | ShortType | NullType => false
      case ArrayType(ByteType | ShortType | NullType, _) => false
      case _ => true
    }
  }
}

object CodecProps extends Properties("ManifestCodec") {
  private val statGen: Gen[ColumnStats] = for {
    min <- Gen.option(Gen.choose(-1000000L, 0L).map(_.toString))
    max <- Gen.option(Gen.choose(0L, 1000000L).map(_.toString))
    n <- Gen.option(Gen.choose(0L, 100L))
  } yield ColumnStats(min, max, n)

  private val fileGen: Gen[DataFile] = for {
    path <- Gen.identifier.map(s => s"data/$s.parquet")
    rows <- Gen.choose(0L, 1000000L)
    bytes <- Gen.choose(0L, Long.MaxValue / 2)
    pv <- Gen.option(Gen.mapOf(Gen.zip(Gen.identifier,
      Gen.option(Gen.oneOf("2024-01-01", "x=y", "a b", "", "__weird%2F")))))
    stats <- Gen.mapOf(Gen.zip(Gen.identifier, statGen))
  } yield DataFile(path, rows, bytes, pv, stats)

  property("manifest JSON round-trips arbitrary file lists") =
    forAll(Gen.listOf(fileGen)) { files =>
      Snapshot.manifestFromJson(Snapshot.manifestToJson(files)) == files
    }
}

object StatsPrunerProps extends Properties("StatsPruner") {
  private val schema = StructType(Seq(StructField("k", LongType)))

  /** Soundness: if the pruner says a file cannot match, no value inside
    * [min,max] satisfies the predicate; if it proves all-match, every
    * value does (given zero nulls).
    */
  property("may/all are sound for long ranges") =
    forAll(Gen.choose(-1000L, 1000L), Gen.choose(0L, 500L),
           Gen.choose(-1500L, 1500L), Gen.oneOf("=", "<", "<=", ">", ">=")) {
      (min, span, lit, op) =>
        val max = min + span
        val file = DataFile("f.parquet", 10, 10, None,
          Map("k" -> ColumnStats(Some(min.toString), Some(max.toString), Some(0))))
        val tri = StatsPruner.evaluate(file, schema,
          CatalystSqlParser.parseExpression(s"k $op $lit"))
        def sat(v: Long): Boolean = op match {
          case "="  => v == lit
          case "<"  => v < lit
          case "<=" => v <= lit
          case ">"  => v > lit
          case ">=" => v >= lit
        }
        val candidates = Seq(min, max, lit, lit - 1, lit + 1).filter(v => v >= min && v <= max)
        val anySat = candidates.exists(sat)
        val allSat = (min to max by math.max(1, span / 7)).forall(sat) &&
          sat(min) && sat(max)
        // pruned-away files must truly have no satisfying value; proven
        // all-match files must satisfy everywhere
        Prop(tri.may || !anySat) && Prop(!tri.all || allSat)
    }

  /** BETWEEN (an UnresolvedFunction in parsed predicate strings) must
    * evaluate exactly like its desugared conjunction — including under
    * NOT and with nulls present.
    */
  property("BETWEEN ≡ its two comparisons, plain and negated") =
    forAll(Gen.choose(-1000L, 1000L), Gen.choose(0L, 500L),
           Gen.choose(-1500L, 1500L), Gen.choose(-1500L, 1500L),
           Gen.choose(0L, 10L), Gen.oneOf(true, false)) {
      (min, span, a, b, nulls, negate) =>
        val (lo, hi) = (math.min(a, b), math.max(a, b))
        val file = DataFile("f.parquet", 10, 10, None,
          Map("k" -> ColumnStats(Some(min.toString), Some((min + span).toString), Some(nulls))))
        def tri(sql: String) = StatsPruner.evaluate(file, schema,
          CatalystSqlParser.parseExpression(sql))
        val not = if (negate) "NOT" else ""
        val sugar = tri(s"k $not BETWEEN $lo AND $hi")
        val desugared = tri(s"$not (k >= $lo AND k <= $hi)")
        Prop(sugar == desugared) :| s"sugar=$sugar desugared=$desugared"
    }
}

/** Properties of the Iceberg-spec bucket hash (pure functions — no
  * Spark session needed).
  */
object IcebergBucketProps extends Properties("IcebergBucket") {
  import graft.functions.IcebergBucketExpr._

  property("bucketBytes lands in [0, n) for any bytes and any n") =
    forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)), Gen.choose(1, 1 << 20)) {
      (bs, n) =>
        val b = bucketBytes(bs.toArray, n)
        b >= 0 && b < n
    }

  property("bucketLong equals bucketBytes over the spec's 8-byte LE encoding") =
    forAll(Gen.choose(Long.MinValue, Long.MaxValue), Gen.choose(1, 4096)) { (v, n) =>
      val le = new Array[Byte](8)
      var x = v
      var i = 0
      while (i < 8) { le(i) = (x & 0xFF).toByte; x >>>= 8; i += 1 }
      bucketLong(v, n) == bucketBytes(le, n)
    }

  property("negative zero hashes as positive zero (spec canonicalization)") =
    forAll(Gen.choose(1, 4096)) { n =>
      bucketDouble(-0.0, n) == bucketDouble(0.0, n)
    }

  property("hash distributes: 1000 sequential longs hit > n/2 of 64 buckets") =
    Prop {
      val hit = (0L until 1000L).map(bucketLong(_, 64)).toSet
      hit.size > 32
    }
}

/** FilterSql soundness: every produced predicate string must re-parse —
  * an unparseable translation would fail the scan at execution time
  * (file pruning feeds it to the SQL parser).
  */
object FilterSqlProps extends Properties("FilterSql") {
  import graft.connector.FilterSql
  import org.apache.spark.sql.sources._

  private val colGen: Gen[String] = Gen.oneOf("id", "k", "ts", "v")
  private val valueGen: Gen[Any] = Gen.oneOf(
    Gen.choose(Long.MinValue, Long.MaxValue).map(identity[Any]),
    Gen.choose(Double.MinValue, Double.MaxValue).map(identity[Any]),
    Gen.asciiPrintableStr.map(identity[Any]), // quotes/backslashes included
    Gen.oneOf(true, false).map(identity[Any]),
    Gen.choose(0L, 4102444800000L).map(ms => new java.sql.Timestamp(ms): Any),
    Gen.choose(0, 20000).map(d => java.time.LocalDate.ofEpochDay(d.toLong): Any))

  private def leafGen: Gen[Filter] = for {
    c <- colGen
    v <- valueGen
    f <- Gen.oneOf[Filter](
      EqualTo(c, v), GreaterThan(c, v), LessThan(c, v),
      GreaterThanOrEqual(c, v), LessThanOrEqual(c, v),
      IsNull(c), IsNotNull(c), In(c, Array(v, v)))
  } yield f

  private def filterGen(depth: Int): Gen[Filter] =
    if (depth <= 0) leafGen
    else Gen.frequency(
      3 -> leafGen,
      1 -> (for { l <- filterGen(depth - 1); r <- filterGen(depth - 1) } yield And(l, r)),
      1 -> (for { l <- filterGen(depth - 1); r <- filterGen(depth - 1) } yield Or(l, r)),
      1 -> filterGen(depth - 1).map(Not(_)))

  property("every translated predicate re-parses under the SQL parser") =
    forAll(filterGen(3)) { f =>
      FilterSql.toSql(f) match {
        case None => Prop.passed // untranslated filters never reach the parser
        case Some(sql) =>
          Prop(scala.util.Try(CatalystSqlParser.parseExpression(sql)).isSuccess) :|
            s"unparseable: $sql"
      }
    }
}

/** Streaming admission walk: rate-limit invariants over arbitrary
  * backlogs — the pure kernel behind maxFilesPerTrigger /
  * maxRowsPerTrigger (`GraftMicroBatchStream.admitWalk`).
  */
object AdmissionProps extends Properties("AdmissionWalk") {
  import graft.connector.GraftMicroBatchStream.admitWalk

  private val backlogGen: Gen[Vector[Long]] =
    Gen.chooseNum(1, 40).flatMap(n => Gen.containerOfN[Vector, Long](n, Gen.chooseNum(0L, 50L)))
  private val capGen: Gen[Long] = Gen.chooseNum(1L, 60L)

  private def walk(from: Int, latest: Int, cap: Long, sizes: Vector[Long]): Int =
    admitWalk(from, latest, None, Some(cap))(v => (0L, sizes(v - 1)))

  property("always makes progress when versions are pending") =
    forAll(backlogGen, capGen) { (sizes, cap) =>
      walk(0, sizes.size, cap, sizes) > 0
    }

  property("never exceeds the cap unless the batch is a single oversized version") =
    forAll(backlogGen, capGen) { (sizes, cap) =>
      val end = walk(0, sizes.size, cap, sizes)
      val total = sizes.slice(0, end).sum
      Prop(total <= cap || end == 1) :| s"end=$end total=$total cap=$cap"
    }

  property("maximal: stopping short of latest means the next version would overflow") =
    forAll(backlogGen, capGen) { (sizes, cap) =>
      val end = walk(0, sizes.size, cap, sizes)
      Prop(end == sizes.size ||
        sizes.slice(0, end).sum >= cap ||
        sizes.slice(0, end + 1).sum > cap) :| s"premature stop at $end"
    }

  property("chained batches cover the whole backlog exactly once") =
    forAll(backlogGen, capGen) { (sizes, cap) =>
      var from = 0
      var guard = 0
      while (from < sizes.size && guard < sizes.size + 1) {
        from = walk(from, sizes.size, cap, sizes)
        guard += 1
      }
      Prop(from == sizes.size) :| s"stalled at $from after $guard batches"
    }

  // ---- files cap: same kernel, other branch of the comparisons ----

  private def walkFiles(from: Int, latest: Int, cap: Long, sizes: Vector[Long]): Int =
    admitWalk(from, latest, Some(cap.toInt), None)(v => (sizes(v - 1), 0L))

  property("files cap: never exceeded unless the batch is a single oversized version") =
    forAll(backlogGen, capGen) { (sizes, cap) =>
      val end = walkFiles(0, sizes.size, cap, sizes)
      val total = sizes.slice(0, end).sum
      Prop(end > 0 && (total <= cap || end == 1)) :| s"end=$end total=$total cap=$cap"
    }

  property("files cap: chained batches cover the whole backlog") =
    forAll(backlogGen, capGen) { (sizes, cap) =>
      var from = 0
      var guard = 0
      while (from < sizes.size && guard < sizes.size + 1) {
        from = walkFiles(from, sizes.size, cap, sizes)
        guard += 1
      }
      Prop(from == sizes.size) :| s"stalled at $from after $guard batches"
    }

  // ---- composite caps (maxFiles AND maxRows set together) ----

  private val backlog2Gen: Gen[Vector[(Long, Long)]] =
    Gen.chooseNum(1, 40).flatMap(n => Gen.containerOfN[Vector, (Long, Long)](
      n, Gen.zip(Gen.chooseNum(0L, 50L), Gen.chooseNum(0L, 50L))))

  property("composite caps stop at the tighter of the two single-cap walks") =
    forAll(backlog2Gen, capGen, capGen) { (sizes, capF, capR) =>
      val both = admitWalk(0, sizes.size, Some(capF.toInt), Some(capR))(
        v => sizes(v - 1))
      val fOnly = admitWalk(0, sizes.size, Some(capF.toInt), None)(v => sizes(v - 1))
      val rOnly = admitWalk(0, sizes.size, None, Some(capR))(v => sizes(v - 1))
      Prop(both == math.min(fOnly, rOnly)) :|
        s"both=$both filesOnly=$fOnly rowsOnly=$rOnly"
    }
}

/** The bloom probe expression (`graft_bloom_might_contain`) must agree
  * with the sketch library it fronts — in particular it may NEVER
  * report a false negative, the property every bloom-pruned operator's
  * correctness rests on (the exact verify join only removes false
  * POSITIVES; a false negative would silently drop a contaminated doc
  * or resurrect a duplicate).
  */
object BloomProbeProps extends Properties("BloomMightContainExpr") {

  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.types.{BinaryType, LongType, StringType}
  import org.apache.spark.unsafe.types.UTF8String
  import org.apache.spark.util.sketch.BloomFilter
  import graft.functions.BloomMightContainExpr

  private def serialize(f: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    f.writeTo(bos)
    bos.toByteArray
  }

  private def probeStr(bytes: Array[Byte], s: String): Boolean =
    BloomMightContainExpr(Literal(bytes, BinaryType),
      Literal(UTF8String.fromString(s), StringType)).eval(null).asInstanceOf[Boolean]

  private def probeLong(bytes: Array[Byte], v: Long): Boolean =
    BloomMightContainExpr(Literal(bytes, BinaryType),
      Literal(v, LongType)).eval(null).asInstanceOf[Boolean]

  private val strsGen: Gen[List[String]] =
    Gen.nonEmptyListOf(Gen.listOfN(8, Gen.alphaNumChar).map(_.mkString))

  property("inserted strings are always found; misses agree with the sketch") =
    forAll(strsGen, Gen.alphaNumStr) { (inserted, probe) =>
      val f = BloomFilter.create(math.max(1, inserted.size).toLong, 0.01)
      inserted.foreach(f.putString)
      val bytes = serialize(f)
      Prop(inserted.forall(probeStr(bytes, _))) :| "false negative" &&
        Prop(probeStr(bytes, probe) == f.mightContainString(probe)) :| "probe disagrees"
    }

  property("inserted longs are always found; misses agree with the sketch") =
    forAll(Gen.nonEmptyListOf(Gen.choose(Long.MinValue, Long.MaxValue)),
           Gen.choose(Long.MinValue, Long.MaxValue)) { (inserted, probe) =>
      val f = BloomFilter.create(math.max(1, inserted.size).toLong, 0.01)
      inserted.foreach(f.putLong)
      val bytes = serialize(f)
      Prop(inserted.forall(probeLong(bytes, _))) :| "false negative" &&
        Prop(probeLong(bytes, probe) == f.mightContainLong(probe)) :| "probe disagrees"
    }

  property("null value probes false, never null") =
    forAll(strsGen) { inserted =>
      val f = BloomFilter.create(inserted.size.toLong, 0.01)
      inserted.foreach(f.putString)
      val out = BloomMightContainExpr(Literal(serialize(f), BinaryType),
        Literal(null, StringType)).eval(null)
      Prop(out == false)
    }
}

/** CDC plan-time pruning soundness: a (version, side) pair whose rows
  * can satisfy the pushed filter conjunction must never be pruned —
  * pruning may only drop work the residual filter would drop anyway.
  */
object CdcMetaPruningProps extends Properties("GraftCdc.MetaPruning") {
  import graft.connector.GraftCdc.MetaPruning
  import org.apache.spark.sql.sources._

  private val sideGen: Gen[String] = Gen.oneOf("insert", "delete")
  private val verGen: Gen[Int] = Gen.choose(0, 30)

  private val filterGen: Gen[Filter] = Gen.oneOf(
    sideGen.map(s => EqualTo("_change_type", s)),
    Gen.nonEmptyListOf(sideGen).map(ss => In("_change_type", ss.toArray[Any])),
    verGen.map(v => EqualTo("_commit_version", v)),
    verGen.map(v => GreaterThan("_commit_version", v)),
    verGen.map(v => GreaterThanOrEqual("_commit_version", v)),
    verGen.map(v => LessThan("_commit_version", v)),
    verGen.map(v => LessThanOrEqual("_commit_version", v)),
    Gen.nonEmptyListOf(verGen).map(vs => In("_commit_version", vs.toArray[Any])),
    // shapes the extractor must IGNORE (conservatively unprunable)
    sideGen.map(s => Not(EqualTo("_change_type", s))),
    verGen.map(v => Or(EqualTo("_commit_version", v), EqualTo("_commit_version", v + 1))))

  /** Reference semantics of one conjunct over a concrete row. */
  private def holds(f: Filter, side: String, v: Int): Boolean = f match {
    case EqualTo("_change_type", s) => side == s
    case In("_change_type", vs) => vs.contains(side)
    case EqualTo("_commit_version", x: Int) => v == x
    case GreaterThan("_commit_version", x: Int) => v > x
    case GreaterThanOrEqual("_commit_version", x: Int) => v >= x
    case LessThan("_commit_version", x: Int) => v < x
    case LessThanOrEqual("_commit_version", x: Int) => v <= x
    case In("_commit_version", vs) => vs.contains(v)
    case Not(inner) => !holds(inner, side, v)
    case Or(l, r) => holds(l, side, v) || holds(r, side, v)
    case _ => true
  }

  property("pruning never excludes a (version, side) that satisfies the conjunction") =
    forAll(Gen.listOf(filterGen), sideGen, verGen) { (filters, side, v) =>
      val mp = MetaPruning(filters.toArray)
      val qualifies = filters.forall(holds(_, side, v))
      Prop(!qualifies || (mp.versionAllowed(v) && mp.sideAllowed(side))) :|
        s"pruned a qualifying row: $mp vs ($side, v$v) under ${filters.mkString(" AND ")}"
    }
}
