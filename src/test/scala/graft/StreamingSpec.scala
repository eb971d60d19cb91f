package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStream
import graft.streaming.EventStream.Event
import graft.streaming.ResvRow

class StreamingSpec extends SparkFunSuite {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowedCounts aggregates a stream with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.windowedCounts(input.toDF())
      .writeStream.format("memory").queryName("wc").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:45:00"), 2, "click", 2.0),
        Event(3, ts("2024-01-01 11:10:00"), 1, "view", 3.0))
      q.processAllAvailable()
      // advance watermark far enough to close the 10:00 and 11:00 windows
      input.addData(Event(4, ts("2024-01-01 14:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("wc").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(rows.contains(("2024-01-01 10:00:00.0", "click", 2L, 3.0)))
      assert(rows.contains(("2024-01-01 11:00:00.0", "view", 1L, 3.0)))
    } finally q.stop()
  }

  test("sessionWindowCounts: closed stream sessions equal the oracle-checked batch plan") {
    import org.apache.spark.sql.{functions => sf}
    import graft.sources.Tables
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.load(spark, sf001, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value").as[Event]
    val rows = ev.collect().sortBy(_.ts.getTime)
    val (h1, h2) = rows.splitAt(rows.length / 2)
    val sentinel = Event(-1L,
      new Timestamp(rows.iterator.map(_.ts.getTime).max + 10L * 24 * 3600 * 1000),
      0L, "sentinel", 0.0)
    val input = MemoryStream[Event]
    val q = EventStream.sessionWindowCounts(input.toDF())
      .writeStream.format("memory").queryName("sw_eq")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(h1.toSeq); q.processAllAvailable()
      input.addData(h2.toSeq); q.processAllAvailable()
      input.addData(sentinel); q.processAllAvailable()
      def keyed(df: org.apache.spark.sql.DataFrame) =
        df.filter(sf.col("user_id") =!= 0L).collect()
          .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("session_start")) ->
            ((r.getAs[String]("session_end"), r.getAs[Long]("n_events"),
              r.getAs[Double]("sum_value")))).toMap
      val stream = keyed(spark.table("sw_eq"))
      // q124's oracle-checked batch plan on the same events
      val batch = keyed(graft.operators.EventOps.sessionWindowAgg(ev.toDF()))
      assert(stream == batch,
        s"stream/batch diverged: ${(stream.toSet diff batch.toSet).take(3)} vs ${(batch.toSet diff stream.toSet).take(3)}")
    } finally q.stop()
  }

  test("windowedCounts: stream output equals the batch plan and q19's oracle-checked aggregates") {
    import org.apache.spark.sql.{functions => sf}
    import graft.sources.Tables
    implicit val sqlCtx = spark.sqlContext
    // the real events table, in event-time order so the second batch
    // never falls behind the first batch's watermark
    val ev = Tables.load(spark, sf001, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value").as[Event]
    val rows = ev.collect().sortBy(_.ts.getTime)
    val (h1, h2) = rows.splitAt(rows.length / 2)
    // closes every real window once the watermark passes; its own
    // window stays open and is never emitted
    val sentinel = Event(-1L,
      new Timestamp(rows.iterator.map(_.ts.getTime).max + 10L * 24 * 3600 * 1000),
      0L, "sentinel", 0.0)
    val input = MemoryStream[Event]
    val q = EventStream.windowedCounts(input.toDF())
      .writeStream.format("memory").queryName("wc_eq")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(h1.toSeq); q.processAllAvailable()
      input.addData(h2.toSeq); q.processAllAvailable()
      input.addData(sentinel); q.processAllAvailable()
      def keyed(df: org.apache.spark.sql.DataFrame): Map[(String, String), (Long, Double)] =
        df.select(sf.date_format(sf.col("window_start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
            sf.col("event_type"), sf.col("n_events"), sf.col("sum_value"))
          .collect()
          .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
      val stream = keyed(spark.table("wc_eq"))
      // 1) the SAME transform run as a batch plan produces the same rows
      val batch = keyed(EventStream.windowedCounts(ev.toDF()))
      assert(stream == batch,
        s"stream/batch diverged: ${(stream.toSet diff batch.toSet).take(3)} vs ${(batch.toSet diff stream.toSet).take(3)}")
      // 2) and both agree with q19's windowedAgg — the query the driver
      // hash-verifies against DuckDB — on keys, counts, and (up to the
      // double-vs-decimal rounding) sums
      val q19 = graft.operators.EventOps.windowedAgg(ev.toDF()).collect()
        .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
      assert(stream.keySet == q19.keySet,
        s"window keys diverge from q19: ${(stream.keySet diff q19.keySet).take(3)} / ${(q19.keySet diff stream.keySet).take(3)}")
      stream.foreach { case (k, (n, s)) =>
        assert(q19(k)._1 == n, s"count mismatch at $k: stream=$n q19=${q19(k)._1}")
        assert(math.abs(q19(k)._2 - s) <= 0.011,
          s"sum mismatch at $k: stream=$s q19=${q19(k)._2}")
      }
    } finally q.stop()
  }

  test("dedupStream drops repeated ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.dedupStream(input.toDF(), Seq("event_id"))
      .writeStream.format("memory").queryName("dedup").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(1, ts("2024-01-01 10:00:01"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:00:02"), 2, "view", 2.0))
      q.processAllAvailable()
      input.addData(Event(1, ts("2024-01-01 10:30:00"), 1, "click", 9.0))
      q.processAllAvailable()
      val ids = spark.table("dedup").collect().map(_.getLong(0)).sorted
      assert(ids.sameElements(Array(1L, 2L)))
    } finally q.stop()
  }

  test("aggStateStream: state after each prefix equals batch aggState (parity)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.aggStateStream(spark, input.toDS())
      .writeStream.format("memory").queryName("aggstate")
      .outputMode(OutputMode.Update()).start()
    val b1 = Seq(
      Event(1, ts("2024-01-01 10:00:00"), 1, "a", 1.5),
      Event(2, ts("2024-01-01 11:00:00"), 1, "a", -2.25),
      Event(3, ts("2024-01-01 10:30:00"), 2, "b", 7.0))
    val b2 = Seq(
      Event(4, ts("2024-01-01 12:00:00"), 1, "a", 10.0),
      Event(5, ts("2024-01-01 12:30:00"), 2, "b", 0.0001))
    def streamState() = spark.table("aggstate").collect()
      .map(r => ((r.getLong(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
      .groupBy(_._1).map { case (k, v) => k -> v.last._2 }
    def batchState(rows: Seq[Event]) = {
      import spark.implicits._
      graft.operators.EventOps.aggState(spark.createDataset(rows).toDF())
        .collect().map(r => ((r.getLong(0), r.getString(1)),
          (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
        .toMap
    }
    try {
      input.addData(b1: _*); q.processAllAvailable()
      assert(streamState() == batchState(b1))
      input.addData(b2: _*); q.processAllAvailable()
      assert(streamState() == batchState(b1 ++ b2))
    } finally q.stop()
  }

  test("latestSnapshotStream emits only changed winners; final state equals batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStream.latestSnapshotStream(spark, input.toDS())
      .writeStream.format("memory").queryName("snap")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        Event(10, ts("2024-01-01 10:00:00"), 1, "a", 1.0),
        Event(11, ts("2024-01-01 11:00:00"), 1, "b", 2.0), // wins key 1
        Event(20, ts("2024-01-01 10:30:00"), 2, "c", 3.0))
      q.processAllAvailable()
      val b1 = spark.table("snap").collect().map(r => (r.getLong(0), r.getLong(2)))
      assert(b1.toSet == Set((1L, 11L), (2L, 20L)), s"batch1 emitted ${b1.toSeq}")
      // batch 2: a LATE event for key 1 (loses — no emission), a ts-tie
      // for key 2 with higher id (wins), a new key 3
      input.addData(
        Event(9, ts("2024-01-01 09:00:00"), 1, "x", 0.0),
        Event(21, ts("2024-01-01 10:30:00"), 2, "d", 4.0),
        Event(30, ts("2024-01-01 12:00:00"), 3, "e", 5.0))
      q.processAllAvailable()
      val all = spark.table("snap").collect().map(r => (r.getLong(0), r.getLong(2)))
      assert(all.length == 4, s"late loser must not emit: ${all.toSeq}")
      // per-key last emission == the batch operator on the union of all events
      val batch = graft.operators.EventOps.latestSnapshot(
        spark.createDataset(Seq(
          Event(10, ts("2024-01-01 10:00:00"), 1, "a", 1.0),
          Event(11, ts("2024-01-01 11:00:00"), 1, "b", 2.0),
          Event(20, ts("2024-01-01 10:30:00"), 2, "c", 3.0),
          Event(9, ts("2024-01-01 09:00:00"), 1, "x", 0.0),
          Event(21, ts("2024-01-01 10:30:00"), 2, "d", 4.0),
          Event(30, ts("2024-01-01 12:00:00"), 3, "e", 5.0))).toDF())
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val finalByKey = all.groupBy(_._1).map { case (k, v) => v.last }.toSet
      assert(finalByKey == batch, s"stream $finalByKey != batch $batch")
    } finally q.stop()
  }

  test("streaming near-dup detects a duplicate arriving in a later batch") {
    import graft.streaming.{StreamingDedup, StreamDoc}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamDoc]
    val pairs = StreamingDedup.nearDupPairs(spark, input.toDS(), threshold = 0.8)
    val q = pairs.writeStream.format("memory").queryName("sdedup")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        StreamDoc(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        StreamDoc(2, "one two three four five six seven eight nine ten"))
      q.processAllAvailable()
      assert(spark.table("sdedup").count() == 0) // nothing similar yet
      // near-copy of doc 1 arrives later (9/11 token overlap, j = 0.818)
      input.addData(
        StreamDoc(3, "alpha beta gamma delta epsilon zeta eta theta iota lambda"))
      q.processAllAvailable()
      val got = spark.table("sdedup").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got.contains((1L, 3L)), s"expected (1,3) in $got")
      assert(!got.exists(p => p._1 == 2L || p._2 == 2L))
    } finally q.stop()
  }

  test("streaming near-dup emits each pair exactly once across multi-band collisions") {
    import graft.streaming.{StreamingDedup, StreamDoc}
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamDoc]
    val pairs = StreamingDedup.nearDupPairs(spark, input.toDS(), threshold = 0.8)
    val q = pairs.writeStream.format("memory").queryName("sdedup_once")
      .outputMode(OutputMode.Append()).start()
    try {
      // identical texts share every band (16 bands at 48/3): without
      // the first-witness test each of the 16 buckets emits the pair
      input.addData(
        StreamDoc(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        StreamDoc(2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      q.processAllAvailable()
      // near-copy in a later batch: collides in several (not all) bands
      input.addData(
        StreamDoc(3, "alpha beta gamma delta epsilon zeta eta theta iota lambda"))
      q.processAllAvailable()
      val rows = spark.table("sdedup_once").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.length == rows.distinct.length,
        s"duplicate pair emissions: ${rows.groupBy(identity).filter(_._2.length > 1).keys}")
      val got = rows.toSet
      assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)), s"got $got")
    } finally q.stop()
  }

  test("curation funnel parity: streamed gate + dedup state equals the batch funnel survivors") {
    import graft.streaming.{StreamingCuration, StreamDoc}
    import graft.operators.Dedup
    implicit val sqlCtx = spark.sqlContext
    // gate failures, an exact duplicate, a near-dup clique (pairwise
    // j >= 0.8), and clean singletons — replayed in id order across
    // two micro-batches so the dedup state must carry over
    val corpus = Seq(
      StreamDoc(1, "the quick brown fox jumps over the lazy dog today"),
      StreamDoc(2, "short text"), // fails the 5-token gate
      StreamDoc(3, "the quick brown fox jumps over the lazy dog today"), // exact dup of 1
      StreamDoc(4, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      StreamDoc(5, "alpha beta gamma delta epsilon zeta eta theta iota lambda"), // near-dup of 4
      StreamDoc(6, "alpha beta gamma delta epsilon zeta eta theta iota mu"), // near-dup of 4 and 5
      StreamDoc(7, "one two three four five six seven eight nine ten"))
    // batch funnel: gate -> exact keep-min-id -> near-dup CC keep-min-id
    val batchDocs = corpus.toDF()
    val gated = batchDocs.filter(graft.functions.tokenCount($"text") >= 5)
    val exact = gated.join(
      Dedup.exact(gated, "doc_id", Seq("text")).select($"rep_id".as("doc_id")),
      Seq("doc_id"), "left_semi")
    val batchSurvivors = Dedup.dedupCorpus(exact, "doc_id", "text", threshold = 0.8)
      .select("doc_id").as[Long].collect().toSet
    // streaming funnel: same gate, near-dup state subsumes exact dedup
    // (identical pair verifies at j = 1.0); survivors = gated arrivals
    // minus the later member of every emitted pair
    val input = MemoryStream[StreamDoc]
    val pairs = StreamingCuration.gatedNearDupPairs(spark, input.toDS(),
      minTokens = 5, threshold = 0.8)
    val q = pairs.writeStream.format("memory").queryName("curation_parity")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(corpus.take(4): _*)
      q.processAllAvailable()
      input.addData(corpus.drop(4): _*)
      q.processAllAvailable()
      val emitted = spark.table("curation_parity").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val gatedIds = corpus.filter(_.text.split("\\s+").length >= 5).map(_.doc_id).toSet
      val dropped = emitted.map { case (a, b) => math.max(a, b) }.toSet
      val streamSurvivors = gatedIds -- dropped
      assert(streamSurvivors == batchSurvivors,
        s"stream $streamSurvivors != batch $batchSurvivors (pairs ${emitted.toSeq})")
      assert(batchSurvivors == Set(1L, 4L, 7L))
    } finally q.stop()
  }

  test("sessionize closes a session after the gap and aggregates it") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val sessions = EventStream.sessionize(spark, input.toDS(), gapMs = 30 * 60 * 1000)
    val q = sessions.writeStream.format("memory").queryName("sess")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
        Event(2, ts("2024-01-01 10:10:00"), 7, "view", 2.0))
      q.processAllAvailable()
      // next event for user 7 is beyond the 30-min gap -> first session closes
      input.addData(Event(3, ts("2024-01-01 12:00:00"), 7, "click", 5.0))
      q.processAllAvailable()
      input.addData(Event(4, ts("2024-01-01 15:00:00"), 8, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.table("sess").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getTimestamp(2).toString,
          r.getLong(3), r.getDouble(4)))
      assert(rows.contains((7L, "2024-01-01 10:00:00.0", "2024-01-01 10:10:00.0", 2L, 3.0)))
    } finally q.stop()
  }

  test("windowedCounts recovers aggregation state from a checkpoint across restart") {
    implicit val sqlCtx = spark.sqlContext
    // memory sink can't recover; the parquet FILE sink is the
    // recoverable one — same checkpoint + same path across restarts
    val base = java.nio.file.Files.createTempDirectory("graft_ckpt").toFile.getAbsolutePath
    val (ckpt, out) = (s"$base/ckpt", s"$base/out")
    val input = MemoryStream[Event]
    def start() = EventStream.windowedCounts(input.toDF())
      .writeStream.format("parquet")
      .outputMode(OutputMode.Append())
      .option("path", out)
      .option("checkpointLocation", ckpt).start()
    val q1 = start()
    try {
      input.addData(Event(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0))
      q1.processAllAvailable() // window open: nothing emitted yet
    } finally q1.stop()
    // restart: the 10:00 window's partial count lives ONLY in state
    val q2 = start()
    try {
      input.addData(Event(2, ts("2024-01-01 10:40:00"), 2, "click", 2.0))
      input.addData(Event(3, ts("2024-01-01 14:00:00"), 3, "view", 0.0)) // closes it
      q2.processAllAvailable()
      val rows = spark.read.parquet(out).collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      // both events in the closed window => pre-restart state survived
      assert(rows.contains(("2024-01-01 10:00:00.0", "click", 2L, 3.0)),
        s"recovered window missing/incomplete: ${rows.toSeq}")
    } finally q2.stop()
  }

  test("exactlyOnceParquetSink: replayed batches overwrite, not duplicate") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_eos").toFile.getAbsolutePath + "/out"
    val b0 = Seq(Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 10:01:00"), 2, "view", 2.0)).toDF()
    // first attempt, then a simulated post-failure REPLAY of the same batch
    EventStream.writeBatchIdempotent(b0, dir, 0L)
    EventStream.writeBatchIdempotent(b0, dir, 0L)
    assert(spark.read.parquet(dir).count() == 2, "replay must not duplicate")
    // the next batch appends under its own id
    EventStream.writeBatchIdempotent(
      Seq(Event(3, ts("2024-01-01 10:02:00"), 1, "click", 3.0)).toDF(), dir, 1L)
    val all = spark.read.parquet(dir)
    assert(all.count() == 3)
    assert(all.select("batch_id").distinct().count() == 2) // partition discovery
    // end-to-end wiring: the streaming sink drives the same writer
    val input = MemoryStream[Event]
    val dir2 = java.nio.file.Files.createTempDirectory("graft_eos2").toFile.getAbsolutePath + "/out"
    val q = EventStream.exactlyOnceParquetSink(input.toDF(), dir2).start()
    try {
      input.addData(Event(9, ts("2024-01-01 11:00:00"), 9, "click", 9.0))
      q.processAllAvailable()
      assert(spark.read.parquet(dir2).count() == 1)
    } finally q.stop()
  }

  test("intervalJoinStream pairs within the lag window; equals the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val views = MemoryStream[Event]
    val q = EventStream.intervalJoinStream(clicks.toDF(), views.toDF(),
        maxLagSec = 1800)
      .writeStream.format("memory").queryName("ij")
      .outputMode(OutputMode.Append()).start()
    val clickRows = Seq(
      Event(10, ts("2024-01-01 10:20:00"), 1, "click", 1.0), // 20m after view: in
      Event(11, ts("2024-01-01 11:00:00"), 1, "click", 2.0), // 60m after: out
      Event(12, ts("2024-01-01 10:00:00"), 2, "click", 3.0), // equal ts: in
      Event(13, ts("2024-01-01 10:10:00"), 3, "click", 4.0), // no view: out
      Event(14, ts("2024-01-01 09:50:00"), 2, "click", 5.0)) // BEFORE view: out
    val viewRows = Seq(
      Event(20, ts("2024-01-01 10:00:00"), 1, "view", 0.0),
      Event(21, ts("2024-01-01 10:00:00"), 2, "view", 0.0))
    try {
      clicks.addData(clickRows)
      views.addData(viewRows)
      q.processAllAvailable()
      val got = spark.table("ij").collect()
        .map(r => (r.getLong(1), r.getLong(4))).sorted
      assert(got.toSeq == Seq((10L, 20L), (12L, 21L)))
      // the same call on static frames produces the same pairs
      val batch = EventStream.intervalJoinStream(
        clickRows.toDF(), viewRows.toDF(), maxLagSec = 1800)
        .collect().map(r => (r.getLong(1), r.getLong(4))).sorted
      assert(batch.toSeq == got.toSeq)
    } finally q.stop()
  }

  test("intervalJoinLeftOuterStream emits unmatched lefts after watermark expiry") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val views = MemoryStream[Event]
    val q = EventStream.intervalJoinLeftOuterStream(clicks.toDF(), views.toDF(),
        maxLagSec = 1800, watermark = "1 hour")
      .writeStream.format("memory").queryName("ijlo")
      .outputMode(OutputMode.Append()).start()
    try {
      clicks.addData(
        Event(10, ts("2024-01-01 10:20:00"), 1, "click", 1.0), // matched
        Event(13, ts("2024-01-01 10:10:00"), 3, "click", 4.0)) // no view ever
      views.addData(Event(20, ts("2024-01-01 10:00:00"), 1, "view", 0.0))
      q.processAllAvailable()
      // matched row emits immediately; the unmatched one must NOT yet
      val before = spark.table("ijlo").collect()
      assert(before.map(r => (r.getLong(1), if (r.isNullAt(4)) -1L else r.getLong(4)))
        .toSet == Set((10L, 20L)), s"got ${before.toSeq}")
      // advance BOTH watermarks past click 13's join window
      clicks.addData(Event(90, ts("2024-01-01 15:00:00"), 9, "click", 0.0))
      views.addData(Event(91, ts("2024-01-01 15:00:00"), 9, "view", 0.0))
      q.processAllAvailable()
      val after = spark.table("ijlo").collect()
        .map(r => (r.getLong(1), if (r.isNullAt(4)) -1L else r.getLong(4))).toSet
      assert(after.contains((13L, -1L)),
        s"unmatched click must emit with null right after expiry: $after")
      assert(after.contains((10L, 20L)))
    } finally q.stop()
  }

  test("slidingCounts: overlapping windows, stream equals batch, width/slide coverage") {
    import org.apache.spark.sql.{functions => sf}
    import graft.sources.Tables
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.load(spark, sf001, "events")
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value").as[Event]
    val rows = ev.collect().sortBy(_.ts.getTime)
    val (h1, h2) = rows.splitAt(rows.length / 2)
    val sentinel = Event(-1L,
      new Timestamp(rows.iterator.map(_.ts.getTime).max + 10L * 24 * 3600 * 1000),
      0L, "sentinel", 0.0)
    val input = MemoryStream[Event]
    val q = EventStream.slidingCounts(input.toDF())
      .writeStream.format("memory").queryName("sc_eq")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(h1.toSeq); q.processAllAvailable()
      input.addData(h2.toSeq); q.processAllAvailable()
      input.addData(sentinel); q.processAllAvailable()
      def keyed(df: org.apache.spark.sql.DataFrame): Map[(String, String), (Long, Double)] =
        df.select(sf.date_format(sf.col("window_start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
            sf.col("event_type"), sf.col("n_events"), sf.col("sum_value"))
          .collect()
          .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
      val stream = keyed(spark.table("sc_eq"))
      val batch = keyed(EventStream.slidingCounts(ev.toDF()))
      assert(stream == batch,
        s"stream/batch diverged: ${(stream.toSet diff batch.toSet).take(3)} vs ${(batch.toSet diff stream.toSet).take(3)}")
      // 1h windows every 15 min: every event is counted exactly 4x
      assert(stream.values.map(_._1).sum == 4L * rows.length,
        "each event must land in width/slide = 4 overlapping windows")
      // and strictly more window keys than the tumbling plan
      assert(stream.keySet.size >
        keyed(EventStream.windowedCounts(ev.toDF())).keySet.size)
    } finally q.stop()
  }

  test("heavyHittersStream: sharded MG state persists across batches; hot term survives sweeps") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val q = EventStream.heavyHittersStream(spark, input.toDS(),
      capacity = 8, nShards = 4)
      .writeStream.format("memory").queryName("hh")
      .outputMode(OutputMode.Update()).start()
    try {
      // batch 1: hot x10 among 10 distinct noise terms
      input.addData(Seq.fill(10)("hot") ++ (1 to 10).map(i => s"a$i"): _*)
      q.processAllAvailable()
      val e1 = spark.table("hh").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      assert(e1.exists(_._2 == "hot"), s"hot must be nominated: ${e1.toList}")
      assert(e1.filter(_._2 == "hot").forall(_._3 <= 10))
      // batch 2: hot x10 more + fresh noise — an estimate above 10 can
      // only come from state carried across batches; MG undercount is
      // bounded by n_shard/capacity <= 40/8, so est >= 20 - 5
      input.addData(Seq.fill(10)("hot") ++ (1 to 10).map(i => s"b$i"): _*)
      q.processAllAvailable()
      val all = spark.table("hh").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      val hotMax = all.filter(_._2 == "hot").map(_._3).max
      assert(hotMax >= 15 && hotMax <= 20, s"hot estimate across batches: $hotMax")
      // a singleton noise term can never surface with a large estimate
      assert(all.filter(_._2.startsWith("a")).forall(_._3 <= 2))
      // all hot emissions came from ONE shard (term-hash routing)
      assert(all.filter(_._2 == "hot").map(_._1).distinct.length == 1)
    } finally q.stop()
  }

  test("weightedReservoirStream: batch-parity A-ES reservoir across batches, bounded state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ResvRow]
    val q = EventStream.weightedReservoirStream(spark, input.toDS(), k = 3)
      .writeStream.format("memory").queryName("resv")
      .outputMode(OutputMode.Update()).start()
    val b1 = (1L to 10L).map(i => ResvRow("g", i, i.toDouble))
    val b2 = (11L to 20L).map(i => ResvRow("g", i, 21.0 - i)) ++
      Seq(ResvRow("h", 99L, 1.0))
    import org.apache.spark.sql.{functions => sf}
    def batchTwin(rows: Seq[ResvRow]) =
      graft.operators.Sampling.weightedTopKPerGroup(spark,
        rows.toDF("group", "id", "weight"), "group", "id",
        sf.col("weight"), k = 3)
        .collect().map(r => (r.getLong(2), r.getLong(3))).toSet
    def emitted() = spark.table("resv").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSeq
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      // after batch 1 the g-reservoir equals the batch A-ES over b1
      val e1 = emitted().filter(_._1 == "g").map(t => (t._2, t._3))
      assert(e1.toSet == batchTwin(b1) && e1.size == 3)
      input.addData(b2: _*)
      q.processAllAvailable()
      // batch 2 re-publishes the UPDATED reservoir: sink now holds
      // batch-1 emissions plus the batch-twin of the full union
      val union = b1 ++ b2.filter(_.group == "g")
      val gAll = emitted().filter(_._1 == "g").map(t => (t._2, t._3))
      assert(gAll.size == 6 &&
        (gAll.diff(e1)).toSet == batchTwin(union),
        s"stream=${gAll.diff(e1)} batch=${batchTwin(union)}")
      // the isolated group h emits its own single-row reservoir
      assert(emitted().count(_._1 == "h") == 1)
    } finally q.stop()
  }

  test("anomalyStream: stream-static baseline join flags beyond-z values") {
    implicit val sqlCtx = spark.sqlContext
    // baseline: click@10h mu=2 sd=1; view@10h zero-variance slot
    val baseline = Seq(("click", 10, 2.0, 1.0), ("view", 10, 5.0, 0.0))
      .toDF("event_type", "hr", "mu", "sd")
    val input = MemoryStream[Event]
    val q = EventStream.anomalyStream(input.toDF(), baseline, z = 2.5)
      .writeStream.format("memory").queryName("anom")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 10:05:00"), 1, "click", 2.5),  // within z
        Event(2, ts("2024-01-01 10:06:00"), 1, "click", 9.0),  // |9-2| > 2.5
        Event(3, ts("2024-01-01 10:07:00"), 1, "view", 99.0),  // sd=0 slot
        Event(4, ts("2024-01-01 11:07:00"), 1, "click", 50.0)) // unknown slot
      q.processAllAvailable()
      val rows = spark.table("anom").collect()
        .map(r => r.getAs[Long]("event_id") ->
          (r.getAs[Boolean]("is_known"), r.getAs[Boolean]("is_anomaly"))).toMap
      assert(rows(1L) == (true, false))
      assert(rows(2L) == (true, true))
      assert(rows(3L) == (true, false)) // zero-variance routes to sd readout
      assert(rows(4L) == (false, false)) // unseen slot routes to is_known
      // parity: the same declaration over a BATCH frame agrees
      val batch = Seq(
        Event(1, ts("2024-01-01 10:05:00"), 1, "click", 2.5),
        Event(2, ts("2024-01-01 10:06:00"), 1, "click", 9.0)).toDF()
      val b = EventStream.anomalyStream(batch, baseline, z = 2.5).collect()
        .map(r => r.getAs[Long]("event_id") -> r.getAs[Boolean]("is_anomaly")).toMap
      assert(b == Map(1L -> false, 2L -> true))
    } finally q.stop()
  }
}
