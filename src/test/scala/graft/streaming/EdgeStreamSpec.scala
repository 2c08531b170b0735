package graft.streaming

import graft.SparkSpec
import graft.ingest.Edge
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streamed file event — the corpus-contract columns the stateless
  * transforms touch, plus an event time.
  */
case class FileEvent(file_id: Long, path: String, lang: String, content: String,
                     ts: java.sql.Timestamp)

/** A resolved edge with its arrival event time. */
case class EdgeEvent(src: Long, dst: Long, ts: java.sql.Timestamp)

/** A per-destination score event (the other side of the interval join). */
case class ScoreEvent(score_dst: Long, score: Double, score_ts: java.sql.Timestamp)

class EdgeStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tsAt(minute: Int) =
    java.sql.Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  private val dim = Seq(("mod_1", 100L), ("mod_2", 200L)).toSeq

  test("stream-static resolution emits the same edges as the batch derivation, per batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[FileEvent]
    val moduleDim = dim.toDF("module", "dst")
    val q = EdgeStream.edges(mem.toDF(), moduleDim)
      .writeStream.format("memory").queryName("es_edges").outputMode("append").start()
    try {
      mem.addData(
        FileEvent(1L, "src/a/A.scala", "scala", "import graftmod.Mod_1", tsAt(0)),
        FileEvent(2L, "src/b/B.py", "py", "from graftmod import mod_2", tsAt(1)),
        FileEvent(100L, "src/m/Mod_1.scala", "scala", "import graftmod.Mod_1", tsAt(2)))
      q.processAllAvailable()
      val got = spark.table("es_edges").as[(Long, Long)].collect().toSet
      // file 100 references mod_1 which IT defines -> self-loop dropped
      assert(got == Set((1L, 100L), (2L, 200L)))
      // second micro-batch appends incrementally
      mem.addData(FileEvent(3L, "src/c/C.c", "c", "#include \"mod_2.h\"", tsAt(3)))
      q.processAllAvailable()
      assert(spark.table("es_edges").as[(Long, Long)].collect().toSet ==
        Set((1L, 100L), (2L, 200L), (3L, 200L)))
    } finally q.stop()
  }

  test("watermarked windowed in-degree counts per event-time window") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EdgeEvent]
    val q = EdgeStream.windowedInDegree(mem.toDF(), windowLength = "10 minutes", lateness = "5 minutes")
      .writeStream.format("memory").queryName("es_win").outputMode("update").start()
    try {
      mem.addData(
        EdgeEvent(1L, 100L, tsAt(0)),
        EdgeEvent(2L, 100L, tsAt(5)),
        EdgeEvent(3L, 200L, tsAt(12)))
      q.processAllAvailable()
      val got = spark.table("es_win")
        .select(col("window.start").cast("string"), col("dst"), col("n"))
        .as[(String, Long, Long)].collect().toSet
      assert(got.contains(("2026-01-01 10:00:00", 100L, 2L)), s"got $got")
      assert(got.contains(("2026-01-01 10:10:00", 200L, 1L)), s"got $got")
    } finally q.stop()
  }

  /** Poll until `cond` holds — processing-time timers run batches on
    * every trigger, so `processAllAvailable` never quiesces on the
    * TTL'd operator; deadline-polling the sink is the correct wait.
    */
  private def eventually(what: String, timeoutMs: Long = 60000)(cond: => Boolean): Unit = {
    val t0 = System.currentTimeMillis
    while (!cond && System.currentTimeMillis - t0 < timeoutMs) Thread.sleep(50)
    assert(cond, s"not observed within ${timeoutMs}ms: $what")
  }

  test("mapGroupsWithState: cumulative out-degree accumulates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Edge]
    val q = EdgeStream.cumulativeOutDegree(mem.toDS())
      .toDF("src", "total")
      .writeStream.format("memory").queryName("es_state").outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("25 milliseconds"))
      .start()
    try {
      def totals = spark.table("es_state").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      mem.addData(Edge(1L, 10L), Edge(1L, 11L), Edge(2L, 10L))
      eventually("first-batch totals")(totals == Map(1L -> 2L, 2L -> 1L))
      mem.addData(Edge(1L, 12L))
      // state carried, not recounted
      eventually("carried totals")(totals == Map(1L -> 3L, 2L -> 1L))
    } finally q.stop()
  }

  test("mapGroupsWithState TTL: idle source state expires and recounts from zero") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Edge]
    val q = EdgeStream.cumulativeOutDegree(mem.toDS(), ttl = Some("200 milliseconds"))
      .toDF("src", "total")
      .writeStream.format("memory").queryName("es_ttl").outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("25 milliseconds"))
      .start()
    try {
      def rows = spark.table("es_ttl").as[(Long, Long)].collect().toSeq
      mem.addData(Edge(1L, 10L), Edge(1L, 11L))
      eventually("pre-expiry total")(rows.contains((1L, 2L)))
      // The timed-out invocation re-emits the final total on a data-less
      // batch — wait for that SECOND (1,2) row so the removal is known to
      // have happened before the source returns.
      eventually("timeout re-emission")(rows.count(_ == (1L, 2L)) >= 2)
      mem.addData(Edge(1L, 12L)) // source 1 returns AFTER expiry: fresh epoch
      eventually("fresh-epoch count of 1 (state removed on timeout)")(rows.contains((1L, 1L)))
    } finally q.stop()
  }

  test("writeStream restart from a checkpoint: exactly-once edges across stop/restart") {
    val root = java.nio.file.Files.createTempDirectory("graft-es-restart").toString
    val landing = s"$root/landing"; val sink = s"$root/sink"; val ckpt = s"$root/ckpt"
    new java.io.File(landing).mkdirs()
    val moduleDim = dim.toDF("module", "dst")
    val schema = implicitly[org.apache.spark.sql.Encoder[FileEvent]].schema
    def startQ() =
      EdgeStream.edges(spark.readStream.schema(schema).parquet(landing), moduleDim)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .outputMode("append").start()

    // batch 1 lands, is processed, and the query STOPS
    Seq(
      FileEvent(1L, "src/a/A.scala", "scala", "import graftmod.Mod_1", tsAt(0)),
      FileEvent(2L, "src/b/B.py", "py", "from graftmod import mod_2", tsAt(1))
    ).toDF().write.mode("append").parquet(landing)
    val q1 = startQ()
    q1.processAllAvailable()
    q1.stop()

    // batch 2 lands while the query is DOWN; a restart from the same
    // checkpoint must pick it up without re-emitting batch 1
    Seq(FileEvent(3L, "src/c/C.c", "c", "#include \"mod_2.h\"", tsAt(3)))
      .toDF().write.mode("append").parquet(landing)
    val q2 = startQ()
    q2.processAllAvailable()
    q2.stop()

    // a third restart with NOTHING new must add nothing
    val q3 = startQ()
    q3.processAllAvailable()
    q3.stop()

    val got = spark.read.parquet(sink).as[(Long, Long)].collect()
    assert(got.length == 3, s"exactly-once violated: ${got.toSeq}")
    assert(got.toSet == Set((1L, 100L), (2L, 200L), (3L, 200L)))
  }

  test("dedupWithinWatermark drops in-horizon repeats, re-keeps past the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EdgeEvent]
    val q = EdgeStream.dedupWithinWatermark(mem.toDF(), Seq("src", "dst"), lateness = "10 minutes")
      .writeStream.format("memory").queryName("es_dedup").outputMode("append").start()
    try {
      mem.addData(
        EdgeEvent(1L, 100L, tsAt(0)),
        EdgeEvent(1L, 100L, tsAt(1)), // duplicate within the horizon
        EdgeEvent(2L, 200L, tsAt(2)))
      q.processAllAvailable()
      mem.addData(EdgeEvent(1L, 100L, tsAt(3))) // still within horizon -> dropped
      q.processAllAvailable()
      assert(spark.table("es_dedup").as[(Long, Long, java.sql.Timestamp)].collect()
        .map(e => (e._1, e._2)).toSeq.sorted == Seq((1L, 100L), (2L, 200L)))
      // advance event time far past the watermark horizon; the old key's
      // dedup state has expired, so the same (src, dst) is kept again
      mem.addData(EdgeEvent(9L, 900L, tsAt(59)))
      q.processAllAvailable()
      mem.addData(EdgeEvent(1L, 100L, tsAt(58)))
      q.processAllAvailable()
      val keys = spark.table("es_dedup").as[(Long, Long, java.sql.Timestamp)].collect()
        .map(e => (e._1, e._2)).toSeq
      assert(keys.count(_ == (1L, 100L)) == 2,
        s"expected the post-horizon repeat to be re-kept: $keys")
    } finally q.stop()
  }

  test("stream-stream interval join: scores pair with edges only inside the event-time bound") {
    implicit val sqlCtx = spark.sqlContext
    val eMem = MemoryStream[EdgeEvent]
    val sMem = MemoryStream[ScoreEvent]
    val q = EdgeStream.edgeScoreJoin(
      eMem.toDF(), sMem.toDF(), lateness = "10 minutes", bound = "5 minutes")
      .writeStream.format("memory").queryName("es_ssjoin").outputMode("append").start()
    try {
      eMem.addData(EdgeEvent(1L, 100L, tsAt(10)))
      sMem.addData(
        ScoreEvent(100L, 0.9, tsAt(12)), // same key, within 5 min -> joins
        ScoreEvent(100L, 0.1, tsAt(30)), // same key, outside the bound -> dropped
        ScoreEvent(200L, 0.5, tsAt(11))) // different key -> dropped
      q.processAllAvailable()
      val got = spark.table("es_ssjoin").select(col("src"), col("dst"), col("score"))
        .as[(Long, Long, Double)].collect().toSet
      assert(got == Set((1L, 100L, 0.9)), s"got $got")
      // a later edge joins a previously-buffered score still inside the bound
      eMem.addData(EdgeEvent(2L, 100L, tsAt(33)))
      q.processAllAvailable()
      val got2 = spark.table("es_ssjoin").select(col("src"), col("dst"), col("score"))
        .as[(Long, Long, Double)].collect().toSet
      assert(got2 == Set((1L, 100L, 0.9), (2L, 100L, 0.1)), s"got $got2")
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionization: sessions emit only once the watermark passes end+gap") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EdgeStream.TimedEdge]
    val q = EdgeStream.sourceSessions(mem.toDS(), gapMs = 5 * 60000L, lateness = "0 seconds")
      .writeStream.format("memory").queryName("es_sessions").outputMode("append").start()
    try {
      def rows = spark.table("es_sessions")
        .select(col("src"), col("start").cast("string"), col("end").cast("string"), col("n"))
        .as[(Long, String, String, Long)].collect().toSet
      // session A for source 1: three events with <=5 min gaps
      mem.addData(
        EdgeStream.TimedEdge(1L, 10L, tsAt(0)),
        EdgeStream.TimedEdge(1L, 11L, tsAt(2)),
        EdgeStream.TimedEdge(1L, 12L, tsAt(4)))
      q.processAllAvailable()
      assert(rows.isEmpty, s"session must stay open until the watermark passes end+gap: $rows")
      // a 26-minute gap opens session B; A finalizes once the watermark
      // (now 10:30) has passed A.end+gap = 10:09 — not in-line with the gap
      mem.addData(EdgeStream.TimedEdge(1L, 13L, tsAt(30)))
      q.processAllAvailable()
      // another key's far-future events push the watermark past B.end+gap;
      // the event-time timeout flushes B without any more key-1 data
      mem.addData(EdgeStream.TimedEdge(2L, 10L, tsAt(59)))
      q.processAllAvailable()
      mem.addData(EdgeStream.TimedEdge(2L, 11L, tsAt(59)))
      q.processAllAvailable()
      assert(rows == Set(
        (1L, "2026-01-01 10:00:00", "2026-01-01 10:04:00", 3L),
        (1L, "2026-01-01 10:30:00", "2026-01-01 10:30:00", 1L)), s"got $rows")
      // source 2's own session is still open (watermark not past its end+gap)
      assert(!rows.exists(_._1 == 2L), s"got $rows")
    } finally q.stop()
  }

  test("sessionization is order-insensitive: backward in-gap events extend start; stragglers join the session they belong to") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EdgeStream.TimedEdge]
    // generous lateness so out-of-order arrivals are admitted
    val q = EdgeStream.sourceSessions(mem.toDS(), gapMs = 5 * 60000L, lateness = "30 minutes")
      .writeStream.format("memory").queryName("es_sess_ooo").outputMode("append").start()
    try {
      def rows = spark.table("es_sess_ooo")
        .select(col("src"), col("start").cast("string"), col("end").cast("string"), col("n"))
        .as[(Long, String, String, Long)].collect().toSet
      mem.addData(EdgeStream.TimedEdge(1L, 10L, tsAt(20)))
      q.processAllAvailable()
      // a later batch delivers an IN-GAP event 2 min BEFORE the open start:
      // it must extend the session backward, not inflate n at the old start
      mem.addData(EdgeStream.TimedEdge(1L, 11L, tsAt(18)))
      q.processAllAvailable()
      // ...and a far-backward straggler (>gap before start) forms its own
      // session, which must STAY in state — the 30-min lateness still
      // admits events that could extend it, so nothing may emit yet
      mem.addData(EdgeStream.TimedEdge(1L, 12L, tsAt(2)))
      q.processAllAvailable()
      assert(rows.isEmpty, s"no session is final while in-lateness events can reach it: $rows")
      // the ADVICE r6 case: a later batch's in-lateness straggler within
      // gap of that OLDER session must merge into it, not be mis-attached
      // to the newest session (eager closure used to split it off)
      mem.addData(EdgeStream.TimedEdge(1L, 14L, tsAt(6)))
      q.processAllAvailable()
      assert(rows.isEmpty, s"straggler must extend the kept older session, not emit: $rows")
      // push the watermark past both ends+gap: both sessions flush, and the
      // straggler is inside the older one (10:02-10:06), not on its own
      mem.addData(EdgeStream.TimedEdge(1L, 13L, tsAt(60)))
      q.processAllAvailable()
      mem.addData(EdgeStream.TimedEdge(1L, 15L, tsAt(62)))
      q.processAllAvailable()
      assert(rows == Set(
        (1L, "2026-01-01 10:02:00", "2026-01-01 10:06:00", 2L),
        (1L, "2026-01-01 10:18:00", "2026-01-01 10:20:00", 2L)), s"got $rows")
    } finally q.stop()
  }
}
