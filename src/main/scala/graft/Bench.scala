package graft

import graft.core.Sessions
import graft.ingest.{Corpus, Edge, EdgeExtraction}
import graft.graph.{CsrPageRank, LocalOnly, PageRankConfig}
import org.apache.spark.sql.Encoders

/** Per-round benchmark. Prints ONE JSON line (and writes it to
  * BENCH/last_run.json):
  *   - the two-cluster-size scaling evidence: the same fixed-work job —
  *     CSR PageRank, fixed iterations, fixed shuffle-partition count,
  *     same edge parquet — at N and 4N cores, each leg in its own forked
  *     JVM pinned (taskset) to exactly that many host CPUs;
  *   - per-query seconds over SPARK_GRAFT_SF_DIR;
  *   - the north-rule metric: PageRank edges/sec per iteration to 1e-6
  *     convergence on a large corpus-derived edge table (CSR scale path);
  *   - edge-derivation throughput on the corpus contract table.
  *
  * == Contamination-proof scaling protocol (round 4) ==
  * This box is shared: co-tenant load arrives in MULTI-MINUTE REGIMES
  * that slow the bandwidth-hungry large leg ~20% while barely moving the
  * small leg, so a single back-to-back leg pair can read anything from
  * 0.75 to a (meaningless) superlinear >1. The protocol therefore:
  *   1. runs 3 time-separated windows PER LEG (symmetric — min-of-3 vs
  *      min-of-3, no sample-count bias), spread across the whole bench
  *      (before the sweep / after the sweep / after the north run), each
  *      window pinned to a DIFFERENT host-cpu range;
  *   2. runs a fixed-work single-thread memory-bandwidth calibration
  *      probe immediately before every window and records its time — a
  *      regime detector that makes interference visible in the artifact;
  *   3. if a leg's windows disagree by >25% or the calibration drifts
  *      by >25%, reruns the noisy leg once more and marks the JSON
  *      "contended":true so the gate value is read with context;
  *   4. emits EVERY window (cores, cpu_base, t, prepare, loop, calib)
  *      in scaling.legs — the artifact carries its own evidence.
  * Full narrative + baseline comparison in BENCH/BASELINE.md.
  */
object Bench {

  private implicit val edgeEnc: org.apache.spark.sql.Encoder[Edge] = Encoders.product[Edge]

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** JDK17 module opens Spark needs outside spark-submit — mirrors
    * build.sbt / org.apache.spark.launcher.JavaModuleOptions.
    */
  private val jdk17AddOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private case class Leg(cores: Int, total: Double, prepare: Double, loop: Double)
  private case class Window(cores: Int, cpuBase: Int, leg: Leg, isolation: String, calibSec: Double)

  // ---- regime-detector calibration probe ---------------------------------
  // Fixed single-thread work, deliberately MEMORY-BANDWIDTH bound (the
  // resource co-tenant regimes actually contend on): strided passes over a
  // 256 MB long array. ~0.5-1.5 s on an idle box; drifts up under the same
  // regimes that inflate the large leg. Allocated + initialized per probe
  // OUTSIDE the timed section and released right after — holding 256 MB
  // for the whole run would shrink the measured sweep/north heap.
  @volatile private var calibSink: Long = 0L

  private def calibrate(): Double = {
    val a = new Array[Long](32 * 1024 * 1024)
    var init = 0
    while (init < a.length) { a(init) = init * 0x9E3779B97F4A7C15L; init += 1 }
    var sink = 0L
    val t0 = System.nanoTime()
    var pass = 0
    while (pass < 6) {
      var i = (pass * 7) % 16 // vary start offset so passes don't trivially hit L1
      while (i < a.length) { sink += a(i); i += 16 } // 128-byte stride: defeats prefetch-friendly full reuse
      pass += 1
    }
    calibSink = sink // observable side effect: the JIT cannot elide the loop
    (System.nanoTime() - t0) / 1e9
  }

  /** Run one scaling leg in a fresh forked JVM, pinned to `cores` host
    * CPUs when taskset is available. Returns None when the fork fails AND
    * the in-process fallback is unsafe (a shared SparkSession is already
    * active — Sessions.local would getOrCreate-reuse it at the wrong core
    * count and stopping it would kill the rest of the bench).
    *
    * `maxSec` bounds the fork's wall clock: a co-tenant regime can
    * stretch a contended leg 3-4x (observed: a 128 s small leg taking
    * 420 s), and without a bound one leg blows the whole run's budget
    * (the round-5 shakedown overran 1700 s -> 2197 s inside legs_w56).
    * On timeout the fork is destroyed and the window simply doesn't
    * exist — min-of-windows selection never wanted the slow sample
    * anyway.
    */
  private def forkLeg(cores: Int, path: String, iters: Int, parts: Int, cpuBase: Int = 0,
      maxSec: Double = Double.MaxValue): Option[(Leg, String)] = {
    val javaBin = new java.io.File(new java.io.File(System.getProperty("java.home"), "bin"), "java").getPath
    val taskset = new java.io.File("/usr/bin/taskset")
    val maxCpu = Runtime.getRuntime.availableProcessors()
    val base = if (cpuBase + cores <= maxCpu) cpuBase else 0
    val pin =
      if (taskset.exists) Seq(taskset.getPath, "-c", (base until base + cores).mkString(","))
      else Seq.empty
    val heap = s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}"
    val cmd = pin ++ Seq(javaBin) ++ jdk17AddOpens ++ Seq(
      heap, "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
      "-cp", System.getProperty("java.class.path"),
      "graft.BenchLeg", cores.toString, path, iters.toString, parts.toString)
    try {
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(true)
      // output to a file, not a pipe: waitFor(timeout) must not deadlock
      // on a full pipe buffer, and a killed fork still leaves its tail
      val outFile = java.io.File.createTempFile("graft-leg-", ".log")
      outFile.deleteOnExit()
      pb.redirectOutput(outFile)
      val proc = pb.start()
      // ADVICE r5: never pass ~Long.MaxValue ms to the timed waitFor —
      // the Unix ProcessImpl computes deadline = nanoTime + toNanos(ms),
      // which overflows at that magnitude, and a spurious wakeup then
      // reads as a false timeout. Uncapped callers block indefinitely.
      val done =
        if (maxSec == Double.MaxValue) { proc.waitFor(); true }
        else proc.waitFor(math.max(1000L, (maxSec * 1000).toLong),
          java.util.concurrent.TimeUnit.MILLISECONDS)
      if (!done) {
        proc.destroyForcibly().waitFor()
        System.err.println(f"scaling leg (cores=$cores base=$cpuBase) exceeded its $maxSec%.0f s cap; window dropped")
        return None
      }
      val rc = proc.exitValue()
      val out = scala.io.Source.fromFile(outFile).getLines().toVector
      val line = out.reverse.find(l => l.startsWith("{\"cores\""))
      if (rc != 0 || line.isEmpty) throw new RuntimeException(s"leg rc=$rc, no JSON (tail: ${out.takeRight(3).mkString(" | ")})")
      def num(key: String): Double =
        s""""$key":([0-9.]+)""".r.findFirstMatchIn(line.get).get.group(1).toDouble
      Some((Leg(cores, num("t_sec"), num("prepare_sec"), num("loop_sec")),
        if (pin.nonEmpty) "forked_jvm_pinned" else "forked_jvm"))
    } catch {
      case e: Throwable =>
        val active = org.apache.spark.sql.SparkSession.getActiveSession
          .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
        if (active.nonEmpty) {
          // ADVICE r3: with a live shared session, Sessions.local would
          // getOrCreate THAT session (wrong core count) and the fallback's
          // stop() would crash the remaining bench. Record a failed leg.
          System.err.println(s"forked leg failed (${e.getMessage}); shared session active -> leg recorded as failed")
          None
        } else {
          System.err.println(s"forked leg failed (${e.getMessage}); falling back in-process")
          val s = Sessions.local(cores, s"graft-bench-scale-$cores")
          try {
            val edges = s.read.parquet(path).as[Edge]
            edges.count()
            val (r, secs) = timed(CsrPageRank.run(edges,
              PageRankConfig(tol = 0.0, maxIter = iters, checkpoint = LocalOnly())))
            Some((Leg(cores, secs, r.prepareSeconds, r.loopSeconds), "in_process"))
          } finally s.stop()
        }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // == Wall-clock budget (VERDICT r4 #1) ==
    // The driver kills an over-long bench (r4: rc 124, artifact lost), so
    // the run tracks its own elapsed time against SPARK_GRAFT_BENCH_BUDGET
    // and degrades DETERMINISTICALLY when behind: later leg-window pairs,
    // the contention retry, and the edge build are skipped (in that
    // priority order) before anything gate-critical. Every phase boundary
    // rewrites BENCH/last_run.json with the fields known so far, and a
    // shutdown hook writes once more on SIGTERM — a killed run still
    // leaves parseable evidence of everything it finished.
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET", "1700").toDouble
    val benchT0 = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - benchT0) / 1e9
    def remaining: Double = budgetSec - elapsed
    // Shuffle through tmpfs when available: local mode funnels every
    // shuffle byte through ONE device, a single-box artifact a cluster
    // doesn't have (per-executor disks); /dev/shm removes it.
    if (!sys.env.contains("SPARK_GRAFT_LOCAL_DIR") && new java.io.File("/dev/shm").isDirectory)
      sys.props("spark.graft.local.dir") = "/dev/shm/graft-spark"
    val shuffleDir = sys.env.get("SPARK_GRAFT_LOCAL_DIR")
      .orElse(sys.props.get("spark.graft.local.dir")).getOrElse("default")

    // ---- probe edge table (built once, reused across rounds) -------------
    val probeN = sys.env.getOrElse("SPARK_GRAFT_PROBE_N", "10000000").toLong
    val probePath = s"/tmp/graft_probe_edges_$probeN"
    if (!new java.io.File(probePath + "/_SUCCESS").exists()) {
      val s = Sessions.local(cpus, "graft-bench-probe-build")
      val st = Corpus.stamped(Corpus.synthetic(s, probeN, repos = 200, maxDegree = 12, seed = 42))
      EdgeExtraction.edges(st).write.mode("overwrite").parquet(probePath)
      s.stop()
    }

    // ---- scaling windows: fresh pinned JVMs, identical task graph --------
    val probeIters = 16
    val scaleParts = sys.env.getOrElse("SPARK_GRAFT_SCALE_PARTS", "32").toInt
    val coresSmall = math.max(1, sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "2").toInt)
    val coresLarge = coresSmall * 4
    calibrate() // page-in + JIT the probe outside any recorded window

    val windows = scala.collection.mutable.ArrayBuffer.empty[Window]
    // Each forked leg is capped at the budget headroom (minus a reserve
    // for the phases still owed) so one contended window can never sink
    // the run; a dropped window just thins that leg's min-of-N sample.
    // Absolute per-leg ceiling: a clean small leg runs ~130 s and the
    // worst observed contended one ~420 s — past that the sample is
    // garbage (min-selection would discard it) AND it eats the budget.
    val legCap = sys.env.getOrElse("SPARK_GRAFT_LEG_CAP", "480").toDouble
    def runLegs(pairs: (Int, Int)*): Unit = pairs.foreach { case (c, base) =>
      val calib = calibrate()
      // reserve 60 s for finalization (the artifact write is cheap and
      // the edge build degrades away on its own remaining>50 check)
      val cap = math.min(legCap, math.max(90.0, remaining - 60.0))
      forkLeg(c, probePath, probeIters, scaleParts, base, maxSec = cap).foreach { case (leg, iso) =>
        windows += Window(c, base, leg, iso, calib)
      }
    }
    def legWindows(c: Int) = windows.filter(_.cores == c).toVector
    def spreadOf(ws: Vector[Window]): Double =
      if (ws.size < 2) 0.0
      else {
        val ts = ws.map(_.leg.total)
        (ts.max - ts.min) / ts.min
      }
    // Contention handling: a leg whose windows disagree by >25%, or a
    // calibration probe that drifted >25% across the run, marks the run
    // contended; the noisy leg gets ONE extra window (at yet another cpu
    // range, budget permitting) so min-selection has a chance at a clean
    // sample. The fresh-base search is BOUNDED (ADVICE r4): only bases
    // that actually fit the machine are considered, else fall back to 0.
    def contentionPass(canRerun: Int => Boolean): (Boolean, Double) = {
      val calibs = windows.map(_.calibSec)
      val calibDrift = if (calibs.size < 2) 0.0 else (calibs.max - calibs.min) / calibs.min
      var contended = calibDrift > 0.25
      Seq(coresSmall, coresLarge).foreach { c =>
        if (spreadOf(legWindows(c)) > 0.25) {
          contended = true
          if (canRerun(c)) {
            val usedBases = legWindows(c).map(_.cpuBase).toSet
            val freshBase = Iterator.from(0, c)
              .takeWhile(_ + c <= Runtime.getRuntime.availableProcessors())
              .find(b => !usedBases.contains(b)).getOrElse(0)
            runLegs((c, freshBase))
          }
        }
      }
      (contended, calibDrift)
    }
    def currentEff: Option[(Double, Double, Double, Leg, Leg)] =
      (legWindows(coresSmall), legWindows(coresLarge)) match {
        case (s, l) if s.nonEmpty && l.nonEmpty =>
          val legSmall = s.map(_.leg).minBy(_.total)
          val legLarge = l.map(_.leg).minBy(_.total)
          val r = coresLarge.toDouble / coresSmall
          Some(((legSmall.total / legLarge.total) / r,
            (legSmall.loop / legLarge.loop) / r,
            (legSmall.prepare / legLarge.prepare) / r,
            legSmall, legLarge))
        case _ => None
      }
    def legsJson: String = windows.map { w =>
      s"""{"cores":${w.cores},"cpu_base":${w.cpuBase},"t":${"%.2f".format(w.leg.total)},""" +
      s""""prepare":${"%.2f".format(w.leg.prepare)},"loop":${"%.2f".format(w.leg.loop)},""" +
      s""""calib_sec":${"%.3f".format(w.calibSec)},"isolation":"${w.isolation}"}"""
    }.mkString("[", ",", "]")
    def forksJson: String =
      s"""{"small":${legWindows(coresSmall).size},"large":${legWindows(coresLarge).size}}"""

    // ---- incremental artifact + budget telemetry -------------------------
    // Every phase boundary rewrites BENCH/last_run.json from the state
    // below; the shutdown hook repeats that on SIGTERM. "partial":true
    // marks any write before normal completion.
    var queryTimes: Seq[(String, Double)] = Nil
    var sweepSkipped = 0
    var north: Option[graft.graph.PageRankResult] = None
    var edgeBuild: Option[(Long, Long, Double)] = None // (corpusRows, edges, secs)
    var contendedFlag = false
    var calibDriftV = 0.0
    val phaseLog = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val skippedPhases = scala.collection.mutable.ArrayBuffer.empty[String]
    def donePhase(name: String): Unit = { phaseLog(name) = elapsed; writeArtifact(partial = true) }
    def skipPhase(name: String): Unit = {
      skippedPhases += name
      System.err.println(f"bench budget: skipping $name (elapsed $elapsed%.0f s of $budgetSec%.0f s)")
    }

    def buildJson(partial: Boolean): String = {
      val probeIterCount = north.map(_.iterations).getOrElse(0)
      val edgesPerSecPerIter = north.map(r => r.edgeCount.toDouble * r.iterations / r.loopSeconds)
      val qs = queryTimes.map { case (k, v) => s""""$k":${"%.3f".format(v)}""" }.mkString("{", ",", "}")
      val totalQuerySecs = queryTimes.map(_._2).filter(_ >= 0).sum
      val budgetJson =
        s"""{"budget_sec":${"%.0f".format(budgetSec)},"elapsed_sec":${"%.1f".format(elapsed)},""" +
        s""""phases":${phaseLog.map { case (k, v) => s""""$k":${"%.1f".format(v)}""" }.mkString("{", ",", "}")},""" +
        s""""skipped":${skippedPhases.map(p => s""""$p"""").mkString("[", ",", "]")},""" +
        s""""sweep_queries_skipped":$sweepSkipped}"""
      val pagerankJson = north.map { r =>
        s"""{"edges":${r.edgeCount},"vertices":${r.vertexCount},"iterations":${r.iterations},""" +
        s""""loop_sec":${"%.2f".format(r.loopSeconds)},"prepare_sec":${"%.2f".format(r.prepareSeconds)},"converged":${r.converged}}"""
      }.getOrElse("null")
      val edgeJson = edgeBuild.map { case (rows, n, secs) =>
        s"""{"corpus_rows":$rows,"edges":$n,"seconds":${"%.2f".format(secs)},"edges_per_sec":${"%.1f".format(n / secs)}}"""
      }.getOrElse("null")
      val effJson = currentEff.map { case (e, el, ep, legSmall, legLarge) =>
        s""""t_small_sec":${"%.2f".format(legSmall.total)},"t_large_sec":${"%.2f".format(legLarge.total)},""" +
        s""""loop_small_sec":${"%.2f".format(legSmall.loop)},"loop_large_sec":${"%.2f".format(legLarge.loop)},""" +
        s""""prepare_small_sec":${"%.2f".format(legSmall.prepare)},"prepare_large_sec":${"%.2f".format(legLarge.prepare)},""" +
        s""""efficiency":${"%.3f".format(e)},"efficiency_loop":${"%.3f".format(el)},"efficiency_prepare":${"%.3f".format(ep)}"""
      }.getOrElse(""""efficiency":null""")
      val isolation = windows.map(_.isolation).distinct.mkString("+")
      s"""{"metric":"pagerank_edges_per_sec_per_iter","value":${edgesPerSecPerIter.map(v => "%.1f".format(v)).getOrElse("-1")},"unit":"edges/sec","partial":$partial,"queries":$qs,"sf":"$sfDir",""" +
      s""""query_total_sec":${"%.2f".format(totalQuerySecs)},""" +
      s""""shuffle_dir":"$shuffleDir","budget":$budgetJson,""" +
      s""""pagerank":$pagerankJson,""" +
      s""""edge_build":$edgeJson,""" +
      s""""scaling":{"cores_small":$coresSmall,"cores_large":$coresLarge,"probe_iters":$probeIters,""" +
      s""""fixed_shuffle_partitions":$scaleParts,"isolation":"$isolation","shuffle_dir":"$shuffleDir","forks_per_leg":$forksJson,"selection":"min",""" +
      s""""contended":$contendedFlag,"calib_drift":${"%.3f".format(calibDriftV)},"legs":$legsJson,""" +
      s"""$effJson}}"""
    }
    def writeArtifact(partial: Boolean): Unit = {
      new java.io.File("BENCH").mkdirs()
      java.nio.file.Files.write(
        java.nio.file.Paths.get("BENCH/last_run.json"),
        (buildJson(partial) + "\n").getBytes("UTF-8"))
    }
    val finished = new java.util.concurrent.atomic.AtomicBoolean(false)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      // SIGTERM (driver timeout): leave the best partial evidence we have,
      // on stdout AND in the artifact file.
      if (!finished.get()) {
        val j = buildJson(partial = true)
        System.out.println(j)
        System.out.flush()
        try writeArtifact(partial = true) catch { case _: Throwable => () }
      }
    }, "graft-bench-artifact-hook"))

    // windows 1+2 (before the sweep)
    runLegs((coresLarge, 0), (coresSmall, 0))
    donePhase("legs_w12")
    // measured cost of one more window pair (fork + run, calib ~2 s each)
    def pairCost: Double =
      currentEff.map { case (_, _, _, s, l) => s.total + l.total + 10.0 }.getOrElse(200.0)

    // dev escape hatch: legs only (skip sweep/north/edge build) — runs
    // the full symmetric window schedule back-to-back
    if (sys.env.get("SPARK_GRAFT_SCALE_ONLY").contains("1")) {
      runLegs((coresLarge, coresLarge), (coresSmall, coresSmall),
        (coresLarge, 2 * coresLarge), (coresSmall, 2 * coresSmall))
      val (contended, calibDrift) = contentionPass(_ => true)
      val effs = currentEff.map { case (e, el, ep, _, _) =>
        s""""efficiency":${"%.3f".format(e)},"efficiency_loop":${"%.3f".format(el)},"efficiency_prepare":${"%.3f".format(ep)}"""
      }.getOrElse(""""efficiency":null""")
      finished.set(true)
      println(s"""{"scale_only":true,$effs,"contended":$contended,"calib_drift":${"%.3f".format(calibDrift)},"forks_per_leg":$forksJson,"legs":$legsJson}""")
      return
    }

    // ---- session: query sweep + north convergence + edge build -----------
    val sparkBig = Sessions.local(cpus, "graft-bench")
    // Reserve time after the sweep for the north run + finalization; under
    // a heavily-contended regime the sweep itself may have to stop early
    // (remaining queries recorded as skipped, never silently absent).
    val sweepReserve = 150.0
    val sortedQueries = SparkEntry.queries.toSeq.sortBy(_._1)
    val measured = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    var sweepIdx = 0
    while (sweepIdx < sortedQueries.size && (remaining > sweepReserve || sweepIdx == 0)) {
      val (name, fn) = sortedQueries(sweepIdx)
      val (_, secs) = try timed(fn(sparkBig, sfDir).count()) catch { case _: Throwable => (0L, -1.0) }
      measured += (name -> secs)
      sweepIdx += 1
    }
    sweepSkipped = sortedQueries.size - sweepIdx
    if (sweepSkipped > 0) skipPhase(s"sweep_tail_$sweepSkipped")
    queryTimes = measured.toSeq
    donePhase("sweep")

    // windows 3+4, far from windows 1+2 in wall time (parent session is
    // idle while a forked leg runs — no CPU competition). Needs the
    // north-run + finalize reserve to still fit afterwards.
    if (remaining > pairCost * 1.3 + 150) {
      runLegs((coresLarge, coresLarge), (coresSmall, coresSmall))
      donePhase("legs_w34")
    } else skipPhase("legs_w34")

    // North metric: CSR PageRank to 1e-6 on a LARGE graph (per-iteration
    // fixed cost amortized; loopSeconds excludes the one-time graph build).
    // Gate-critical: runs unless the budget is essentially exhausted.
    if (remaining > 90) {
      val probeEdgesDs = sparkBig.read.parquet(probePath).as[Edge]
      north = Some(CsrPageRank.run(probeEdgesDs,
        PageRankConfig(tol = 1e-6, maxIter = 200, checkpoint = LocalOnly())))
      donePhase("north")
    } else skipPhase("north")

    // windows 5+6: each leg's third sample, after the north run
    if (remaining > pairCost * 1.3 + 60) {
      runLegs((coresLarge, 2 * coresLarge), (coresSmall, 2 * coresSmall))
      donePhase("legs_w56")
    } else skipPhase("legs_w56")
    // Retry affordability per leg: the small leg needs most of a pair's
    // cost; the LARGE leg is cheap (~35-95 s observed) and is exactly the
    // one contention poisons, so gate its retry on its own observed
    // minimum (+fork overhead), not the pair cost — a contended run's
    // last chance at a clean large window.
    def legMinCost(c: Int): Double =
      legWindows(c) match {
        case ws if ws.nonEmpty => ws.map(_.leg.total).min + 35.0
        case _ => pairCost * 0.4
      }
    val (contended, calibDrift) = contentionPass(c =>
      remaining > (if (c == coresSmall) pairCost * 0.8 + 60 else legMinCost(c) + 60))
    contendedFlag = contended
    calibDriftV = calibDrift
    writeArtifact(partial = true)

    // Edge-derivation throughput on the corpus contract table.
    if (remaining > 50) {
      val corpusN = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "400000").toLong
      val edgesPath = s"/tmp/graft_bench_edges_$corpusN"
      val stamped = Corpus.stamped(Corpus.synthetic(sparkBig, corpusN, repos = 200, maxDegree = 12, seed = 42))
      val (edgesCount, edgeBuildSecs) = timed {
        EdgeExtraction.edges(stamped).write.mode("overwrite").parquet(edgesPath)
        sparkBig.read.parquet(edgesPath).count()
      }
      edgeBuild = Some((corpusN, edgesCount, edgeBuildSecs))
      donePhase("edge_build")
    } else skipPhase("edge_build")

    val json = buildJson(partial = false)
    finished.set(true)
    println(json)
    // Machine-readable copy for the driver (stdout goes through sbt's
    // logger and is not reliably parseable — BENCH_r01 had parsed:null).
    writeArtifact(partial = false)
    sparkBig.stop()
  }
}
