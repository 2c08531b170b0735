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
    */
  private def forkLeg(cores: Int, path: String, iters: Int, parts: Int, cpuBase: Int = 0): Option[(Leg, String)] = {
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
      val proc = pb.start()
      val out = scala.io.Source.fromInputStream(proc.getInputStream).getLines().toVector
      val rc = proc.waitFor()
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
    def runLegs(pairs: (Int, Int)*): Unit = pairs.foreach { case (c, base) =>
      val calib = calibrate()
      forkLeg(c, probePath, probeIters, scaleParts, base).foreach { case (leg, iso) =>
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
    // range) so min-selection has a chance at a clean sample.
    def contentionPass(): (Boolean, Double) = {
      val calibs = windows.map(_.calibSec)
      val calibDrift = if (calibs.size < 2) 0.0 else (calibs.max - calibs.min) / calibs.min
      var contended = calibDrift > 0.25
      Seq(coresSmall, coresLarge).foreach { c =>
        if (spreadOf(legWindows(c)) > 0.25) {
          contended = true
          val usedBases = legWindows(c).map(_.cpuBase).toSet
          val freshBase = Iterator.from(0, c).find(b => !usedBases.contains(b) && b + c <= Runtime.getRuntime.availableProcessors()).getOrElse(0)
          runLegs((c, freshBase))
        }
      }
      (contended, calibDrift)
    }
    def currentEff: (Double, Double, Double, Leg, Leg) = {
      val legSmall = legWindows(coresSmall).map(_.leg).minBy(_.total)
      val legLarge = legWindows(coresLarge).map(_.leg).minBy(_.total)
      val r = coresLarge.toDouble / coresSmall
      ((legSmall.total / legLarge.total) / r,
        (legSmall.loop / legLarge.loop) / r,
        (legSmall.prepare / legLarge.prepare) / r,
        legSmall, legLarge)
    }
    def legsJson: String = windows.map { w =>
      s"""{"cores":${w.cores},"cpu_base":${w.cpuBase},"t":${"%.2f".format(w.leg.total)},""" +
      s""""prepare":${"%.2f".format(w.leg.prepare)},"loop":${"%.2f".format(w.leg.loop)},""" +
      s""""calib_sec":${"%.3f".format(w.calibSec)},"isolation":"${w.isolation}"}"""
    }.mkString("[", ",", "]")
    def forksJson: String =
      s"""{"small":${legWindows(coresSmall).size},"large":${legWindows(coresLarge).size}}"""

    // windows 1+2 (before the sweep)
    runLegs((coresSmall, 0), (coresLarge, 0))

    // dev escape hatch: legs only (skip sweep/north/edge build) — runs
    // the full symmetric window schedule back-to-back
    if (sys.env.get("SPARK_GRAFT_SCALE_ONLY").contains("1")) {
      runLegs((coresSmall, coresSmall), (coresLarge, coresLarge),
        (coresSmall, 2 * coresSmall), (coresLarge, 2 * coresLarge))
      val (contended, calibDrift) = contentionPass()
      val (e, el, ep, _, _) = currentEff
      println(s"""{"scale_only":true,"efficiency":${"%.3f".format(e)},"efficiency_loop":${"%.3f".format(el)},"efficiency_prepare":${"%.3f".format(ep)},"contended":$contended,"calib_drift":${"%.3f".format(calibDrift)},"forks_per_leg":$forksJson,"legs":$legsJson}""")
      return
    }

    // ---- session: query sweep + north convergence + edge build -----------
    val sparkBig = Sessions.local(cpus, "graft-bench")
    val queryTimes = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (_, secs) = try timed(fn(sparkBig, sfDir).count()) catch { case _: Throwable => (0L, -1.0) }
      name -> secs
    }
    val totalQuerySecs = queryTimes.map(_._2).filter(_ >= 0).sum

    // windows 3+4, far from windows 1+2 in wall time (parent session is
    // idle while a forked leg runs — no CPU competition)
    runLegs((coresSmall, coresSmall), (coresLarge, coresLarge))

    // North metric: CSR PageRank to 1e-6 on a LARGE graph (per-iteration
    // fixed cost amortized; loopSeconds excludes the one-time graph build).
    val probeEdgesDs = sparkBig.read.parquet(probePath).as[Edge]
    val convResult = CsrPageRank.run(probeEdgesDs,
      PageRankConfig(tol = 1e-6, maxIter = 200, checkpoint = LocalOnly()))
    val m = convResult.edgeCount
    val iters = convResult.iterations
    val edgesPerSecPerIter = m.toDouble * iters / convResult.loopSeconds

    // windows 5+6: each leg's third sample, after the north run
    runLegs((coresSmall, 2 * coresSmall), (coresLarge, 2 * coresLarge))
    val (contended, calibDrift) = contentionPass()

    // Edge-derivation throughput on the corpus contract table.
    val corpusN = sys.env.getOrElse("SPARK_GRAFT_BENCH_N", "400000").toLong
    val edgesPath = s"/tmp/graft_bench_edges_$corpusN"
    val stamped = Corpus.stamped(Corpus.synthetic(sparkBig, corpusN, repos = 200, maxDegree = 12, seed = 42))
    val (edgesCount, edgeBuildSecs) = timed {
      EdgeExtraction.edges(stamped).write.mode("overwrite").parquet(edgesPath)
      sparkBig.read.parquet(edgesPath).count()
    }
    val (effFull, effLoop, effPrep, legSmall, legLarge) = currentEff
    val isolation = windows.map(_.isolation).distinct.mkString("+")

    val qs = queryTimes.map { case (k, v) => s""""$k":${"%.3f".format(v)}""" }.mkString("{", ",", "}")
    val json =
      s"""{"metric":"pagerank_edges_per_sec_per_iter","value":${"%.1f".format(edgesPerSecPerIter)},"unit":"edges/sec","queries":$qs,"sf":"$sfDir",""" +
      s""""query_total_sec":${"%.2f".format(totalQuerySecs)},""" +
      s""""shuffle_dir":"$shuffleDir",""" +
      s""""pagerank":{"edges":$m,"vertices":${convResult.vertexCount},"iterations":$iters,"loop_sec":${"%.2f".format(convResult.loopSeconds)},"prepare_sec":${"%.2f".format(convResult.prepareSeconds)},"converged":${convResult.converged}},""" +
      s""""edge_build":{"corpus_rows":$corpusN,"edges":$edgesCount,"seconds":${"%.2f".format(edgeBuildSecs)},"edges_per_sec":${"%.1f".format(edgesCount / edgeBuildSecs)}},""" +
      s""""scaling":{"cores_small":$coresSmall,"cores_large":$coresLarge,"probe_edges":$m,"probe_iters":$probeIters,""" +
      s""""fixed_shuffle_partitions":$scaleParts,"isolation":"$isolation","shuffle_dir":"$shuffleDir","forks_per_leg":$forksJson,"selection":"min",""" +
      s""""contended":$contended,"calib_drift":${"%.3f".format(calibDrift)},"legs":$legsJson,""" +
      s""""t_small_sec":${"%.2f".format(legSmall.total)},"t_large_sec":${"%.2f".format(legLarge.total)},""" +
      s""""loop_small_sec":${"%.2f".format(legSmall.loop)},"loop_large_sec":${"%.2f".format(legLarge.loop)},""" +
      s""""prepare_small_sec":${"%.2f".format(legSmall.prepare)},"prepare_large_sec":${"%.2f".format(legLarge.prepare)},""" +
      s""""efficiency":${"%.3f".format(effFull)},"efficiency_loop":${"%.3f".format(effLoop)},"efficiency_prepare":${"%.3f".format(effPrep)}}}"""
    println(json)
    // Machine-readable copy for the driver (stdout goes through sbt's
    // logger and is not reliably parseable — BENCH_r01 had parsed:null).
    val outDir = new java.io.File("BENCH")
    outDir.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH/last_run.json"),
      (json + "\n").getBytes("UTF-8"))
    sparkBig.stop()
  }
}
