package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.{functions => sf}

/** Structured Streaming surface over the events table. The batch
  * transform in operators.EventOps.windowedAgg and `windowedCounts`
  * here share the same groupBy(window(...)) plan — write once, run
  * batch or streaming.
  *
  * Scale notes: watermark bounds state; windowed aggregation state is
  * per (window, event_type); sessionization state is per user and
  * dropped on timeout — both safe under 1000-executor partitioned
  * state stores.
  */
/* Top-level (not object-nested) case classes: Catalyst's generated code
 * resolves nested companions unreliably under Janino (codegen compile
 * failure on the state encoder). */
case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                 event_type: String, value: Double)

case class SessionOut(user_id: Long, session_start: Timestamp,
                      session_end: Timestamp, n_events: Long, total_value: Double)

case class SessionState(start: Long, end: Long, n: Long, total: Double)

case class HeavyCand(shard: Int, term: String, est: Long)
case class ResvRow(group: String, id: Long, weight: Double)
case class ResvOut(group: String, id: Long, weight: Double, key_fx: Long)
case class SnapshotRow(user_id: Long, ts: Timestamp, event_id: Long,
                       event_type: String, value: Double)

case class AggStateRow(user_id: Long, event_type: String, n_rows: Long,
                       n_vals: Long, sum4: Long, min4: Long, max4: Long)

object EventStream {
  type Event = graft.streaming.Event
  val Event = graft.streaming.Event
  type SessionOut = graft.streaming.SessionOut

  /** Watermarked tumbling-window counts per event_type. Works on a
    * streaming or batch events DataFrame. */
  def windowedCounts(events: DataFrame, width: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(sf.window(sf.col("ts"), width).as("w"), sf.col("event_type"))
      .agg(sf.count(sf.lit(1)).as("n_events"), sf.round(sf.sum("value"), 2).as("sum_value"))
      .select(sf.col("w.start").as("window_start"), sf.col("event_type"),
        sf.col("n_events"), sf.col("sum_value"))

  /** SLIDING-window counts per event_type: each event lands in
    * width/slide overlapping windows (the smoothed rate monitor
    * behind dashboards and alert thresholds — tumbling windows
    * quantize a spike's timing; sliding windows see it at every
    * offset). Same declaration batch or stream; on a stream the
    * watermark closes windows `watermark` past their end, bounding
    * state to (width/slide) x live key groups. */
  def slidingCounts(events: DataFrame, width: String = "1 hour",
                    slide: String = "15 minutes",
                    watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(sf.window(sf.col("ts"), width, slide).as("w"), sf.col("event_type"))
      .agg(sf.count(sf.lit(1)).as("n_events"), sf.round(sf.sum("value"), 2).as("sum_value"))
      .select(sf.col("w.start").as("window_start"), sf.col("event_type"),
        sf.col("n_events"), sf.col("sum_value"))

  /** STREAM–STATIC anomaly flagging: every incoming event joins a
    * batch-computed per-(type, hour-of-day) baseline (the
    * q121 seasonal profile: mean/stddev per slot) and flags values
    * beyond `z` sigmas — the standard deployment split where the
    * BASELINE is retrained offline (a batch job over history) and the
    * DETECTOR runs on the live stream. A stream–static equi join is
    * stateless on the stream side: Spark broadcasts/rescans the static
    * side per micro-batch, no watermark or state store involved, so
    * throughput is map-speed and the baseline can be swapped by
    * rewriting its path between restarts.
    *
    * Output: the event row + its slot baseline + `is_known` (slot
    * present in the baseline) + `is_anomaly` (NULL-safe: unknown
    * slots and zero-variance slots are NOT anomalies — they route to
    * the `is_known`/`sd > 0` readouts instead, the q121 convention).
    *
    * The baseline frame must carry (event_type, hr, mu, sd). Works
    * identically on a batch frame (the parity spec feeds both). */
  def anomalyStream(events: DataFrame, baseline: DataFrame,
                    z: Double = 2.5): DataFrame = {
    require(z > 0, s"z must be > 0, got $z")
    events
      .withColumn("hr", sf.hour(sf.col("ts")))
      .join(sf.broadcast(baseline), Seq("event_type", "hr"), "left")
      .select(sf.col("event_id"), sf.col("ts"), sf.col("event_type"),
        sf.col("hr"), sf.col("value"), sf.col("mu"), sf.col("sd"),
        sf.col("mu").isNotNull.as("is_known"),
        sf.coalesce(
          sf.col("sd") > 0 &&
            sf.abs(sf.col("value") - sf.col("mu")) > sf.lit(z) * sf.col("sd"),
          sf.lit(false)).as("is_anomaly"))
  }

  /** Native session windows on a stream: the SAME
    * groupBy(session_window) as the batch operator
    * (operators.EventOps.sessionWindowAgg) with a watermark bounding
    * open-session state — sessions close and emit (append mode) once
    * the watermark passes their end. One definition, batch and
    * stream; the parity spec feeds identical events through both. */
  def sessionWindowCounts(events: DataFrame, gap: String = "30 minutes",
                          watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(sf.col("user_id"), sf.session_window(sf.col("ts"), gap).as("w"))
      .agg(sf.count(sf.lit(1)).as("n_events"),
        sf.sum(sf.col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(sf.col("user_id"),
        sf.date_format(sf.col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        sf.date_format(sf.col("w.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
        sf.col("n_events"), sf.col("sum_value"))

  /** Streaming deduplication: drop events whose id was already seen
    * within the watermark horizon (state expires with the watermark —
    * bounded even on an unbounded stream). */
  def dedupStream(events: DataFrame, idCols: Seq[String],
                  watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  /** Event-time sessionization with a gap timeout via
    * flatMapGroupsWithState — emits a session when the user goes quiet
    * for `gapMs` (or the watermark passes). */
  def sessionize(spark: SparkSession, events: Dataset[Event], gapMs: Long,
                 watermark: String = "2 hours"): Dataset[SessionOut] = {
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(userId, new Timestamp(s.start),
              new Timestamp(s.end), s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.end <= gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed += SessionOut(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.total)
                  cur = Some(SessionState(t, t, 1L, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Watermarked stream-stream interval join (the attribution /
    * enrichment shape: each LEFT event paired with the same key's
    * RIGHT events at most `maxLagSec` seconds EARLIER — click joined
    * to the views that preceded it). Inner semantics; equal
    * timestamps join.
    *
    * Spark's stream-stream join buffers both sides in state; the
    * watermarks plus the two-sided event-time range condition are
    * what let it EVICT: a buffered right row can only match left rows
    * with l_ts <= r_ts + maxLag, so once the left watermark passes
    * that bound the row is dropped from the store. Without the range
    * condition state grows forever — the condition is load-bearing,
    * not an optimization. Both sides shuffle once on the key, state
    * is per-key and horizon-bounded: safe on 1000 partitioned state
    * stores. The same call works on batch frames (the condition
    * becomes an ordinary range join). */
  def intervalJoinStream(left: DataFrame, right: DataFrame,
                         keyCol: String = "user_id",
                         maxLagSec: Long = 1800,
                         watermark: String = "2 hours"): DataFrame =
    intervalJoinImpl(left, right, keyCol, maxLagSec, watermark, "inner")

  /** LEFT OUTER watermarked stream-stream interval join — the
    * unattributed-conversion stream: matched pairs emit exactly like
    * [[intervalJoinStream]]; a left event with NO qualifying right row
    * emits once with null right columns, and only AFTER the watermark
    * has passed its join window (a batch left join nulls immediately;
    * a stream can only conclude "no match will ever arrive" at state
    * expiry — the emission delay IS the semantics). Same state-eviction
    * contract: the two-sided time-range condition bounds both buffers. */
  def intervalJoinLeftOuterStream(left: DataFrame, right: DataFrame,
                                  keyCol: String = "user_id",
                                  maxLagSec: Long = 1800,
                                  watermark: String = "2 hours"): DataFrame =
    intervalJoinImpl(left, right, keyCol, maxLagSec, watermark, "left_outer")

  private def intervalJoinImpl(left: DataFrame, right: DataFrame,
                               keyCol: String, maxLagSec: Long,
                               watermark: String, joinType: String): DataFrame = {
    val l = left.withWatermark("ts", watermark)
      .select(sf.col(keyCol).as("l_key"), sf.col("ts").as("l_ts"),
        sf.col("event_id").as("l_id"), sf.col("event_type").as("l_type"),
        sf.col("value").as("l_value"))
    val r = right.withWatermark("ts", watermark)
      .select(sf.col(keyCol).as("r_key"), sf.col("ts").as("r_ts"),
        sf.col("event_id").as("r_id"), sf.col("event_type").as("r_type"))
    l.join(r,
      sf.col("l_key") === sf.col("r_key") &&
        sf.col("l_ts") >= sf.col("r_ts") &&
        sf.col("l_ts") <= sf.col("r_ts") + sf.expr(s"INTERVAL $maxLagSec SECONDS"),
      joinType)
      .select(sf.col("l_key").as(keyCol), sf.col("l_id"), sf.col("l_ts"),
        sf.col("l_value"), sf.col("r_id"), sf.col("r_ts"))
  }

  /** Idempotent micro-batch write: batch `id` lands in its own
    * `batch_id=<id>` directory with overwrite semantics, so a batch
    * REPLAYED after a failure (Structured Streaming's at-least-once
    * foreachBatch contract) overwrites its own previous attempt
    * instead of appending duplicates — the standard recipe that turns
    * an at-least-once sink into an effectively-exactly-once one.
    * Readers get partition discovery on `batch_id` for free. */
  def writeBatchIdempotent(batch: DataFrame, path: String, batchId: Long): Unit =
    batch.write.mode("overwrite").parquet(s"$path/batch_id=$batchId")

  /** foreachBatch parquet sink built on [[writeBatchIdempotent]] —
    * attach with `.start()` to any streaming DataFrame. */
  def exactlyOnceParquetSink(df: DataFrame, path: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.foreachBatch(
      (batch: DataFrame, id: Long) => writeBatchIdempotent(batch, path, id))

  /** Streaming CDC snapshot maintenance: the streaming twin of
    * `EventOps.latestSnapshot` — per-key state holds the current winner
    * (lexicographic max of (ts, event_id)), and a batch emits a key's
    * row only when its winner CHANGED, so a downstream upsert sink
    * writes churn, not the whole table, every trigger. State is one row
    * per key — the snapshot itself, the minimum any CDC mirror needs —
    * with no watermark required (a later event can always win).
    * Update-mode output. */
  def latestSnapshotStream(spark: SparkSession, events: Dataset[Event]): Dataset[SnapshotRow] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SnapshotRow, SnapshotRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SnapshotRow]) =>
          def beats(a: Event, b: SnapshotRow): Boolean = {
            val (at, bt) = (a.ts.getTime, b.ts.getTime)
            at > bt || (at == bt && a.event_id > b.event_id)
          }
          var cur = state.getOption
          var changed = false
          rows.foreach { e =>
            if (cur.forall(beats(e, _))) {
              cur = Some(SnapshotRow(userId, e.ts, e.event_id, e.event_type, e.value))
              changed = true
            }
          }
          if (changed) {
            state.update(cur.get)
            Iterator.single(cur.get)
          } else Iterator.empty
      }
  }

  /** Streaming materialized-view maintenance: the stream twin of
    * [[graft.operators.EventOps.aggState]] — per (user, event_type),
    * the same ALGEBRAIC state (count, non-null count, 1e-4
    * fixed-point sum, min, max) folded under `flatMapGroupsWithState`
    * so after any stream prefix the state EQUALS the batch
    * `aggState` over the same rows (identical fixed-point floor, the
    * semigroup q188 proves mergeable). Update mode re-publishes only
    * groups that saw rows this trigger; downstream reads derive
    * presentation values exactly like `readAggState`.
    *
    * State is one 5-long row per live (user, type) group — bounded by
    * the key domain, independent of stream length. */
  def aggStateStream(spark: SparkSession,
                     events: Dataset[Event]): Dataset[AggStateRow] = {
    import spark.implicits._
    events.groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[AggStateRow, AggStateRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: (Long, String), rows: Iterator[Event], state: GroupState[AggStateRow]) =>
          var s = state.getOption.getOrElse(
            AggStateRow(key._1, key._2, 0L, 0L, 0L, Long.MaxValue, Long.MinValue))
          var changed = false
          rows.foreach { e =>
            val v4 = math.floor(e.value * 1e4 + 0.5).toLong
            s = s.copy(n_rows = s.n_rows + 1, n_vals = s.n_vals + 1,
              sum4 = s.sum4 + v4, min4 = math.min(s.min4, v4),
              max4 = math.max(s.max4, v4))
            changed = true
          }
          if (changed) { state.update(s); Iterator.single(s) } else Iterator.empty
      }
  }

  /** Streaming heavy hitters: a SHARDED Misra–Gries summary under
    * `flatMapGroupsWithState` — the stream twin of
    * [[graft.operators.CorpusStats.heavyHitterTerms]]'s pass 1.
    * Terms hash-partition across `nShards` state groups, each holding
    * one bounded MG map, so no single state store sees the whole
    * stream (the single-key formulation would). Because a term's
    * ENTIRE count lands in exactly one shard, the classic guarantee
    * survives sharding unchanged: any term with global frequency
    * > n_shard/capacity ≥ its-share-threshold is present in its
    * shard's summary — capacity ceil(2/phi) nominates every global
    * phi-heavy hitter. Each trigger emits the updated shard summary
    * (Update mode); a periodic batch recount (the q61/q168 pass 2)
    * turns nominations into exact counts.
    *
    * State is ≤ nShards·capacity entries TOTAL regardless of stream
    * length — heavy-hitter tracking with memory independent of
    * cardinality, where an exact streaming groupBy-count would grow
    * state with the distinct-term universe. */
  def heavyHittersStream(spark: SparkSession, terms: Dataset[String],
                         capacity: Int = 100,
                         nShards: Int = 32): Dataset[HeavyCand] = {
    import spark.implicits._
    require(capacity >= 1 && nShards >= 1, "capacity and nShards must be >= 1")
    val mg = new graft.operators.CorpusStats.MisraGriesAgg(capacity)
    terms.groupByKey(t => math.floorMod(t.hashCode, nShards))
      .flatMapGroupsWithState[Map[String, Long], HeavyCand](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (shard: Int, rows: Iterator[String], state: GroupState[Map[String, Long]]) =>
          var m = state.getOption.getOrElse(Map.empty[String, Long])
          rows.foreach { t => m = mg.reduce(m, t) }
          state.update(m)
          m.iterator.map { case (t, c) => HeavyCand(shard, t, c) }
      }
  }

  /** Streaming exact-k weighted reservoir per group — the streaming
    * twin of `Sampling.weightedTopKPerGroup` (Efraimidis–Spirakis
    * A-ES): each row's lottery key u^(1/w) is the IDENTICAL portable
    * Knuth-hash fixed-point the batch operator computes, so after any
    * prefix of the stream the reservoir equals the batch draw over
    * the same rows (batch ≡ stream parity, pinned by spec). The A-ES
    * property that makes a one-pass bounded-state reservoir correct:
    * the top-k lottery keys ARE an exact weighted sample without
    * replacement.
    *
    * State: ≤ k (key, id, weight) triples per group — independent of
    * stream length. Update-mode emissions re-publish a group's
    * current reservoir only when that group saw rows this batch.
    * Ids are assumed unique per group (event/doc ids); re-delivery
    * belongs upstream in `dedupStream`. */
  def weightedReservoirStream(spark: SparkSession, rows: Dataset[ResvRow],
                              k: Int): Dataset[ResvOut] = {
    import spark.implicits._
    require(k >= 1, s"k must be >= 1, got $k")
    def keyFx(id: Long, w: Double): Long = {
      // the weightedTopK expression, replayed in JVM scalars:
      // h32 = pmod(id, 2^31)·2654435761 mod 2^32; u = (h32+1)/2^32
      val h32 = math.floorMod(id, 2147483648L) * 2654435761L % 4294967296L
      val u = (h32 + 1L).toDouble / 4294967296.0
      math.floor(math.pow(u, 1.0 / w) * 1e12 + 0.5).toLong
    }
    rows.groupByKey(_.group)
      .flatMapGroupsWithState[List[(Long, Long, Double)], ResvOut](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (g: String, it: Iterator[ResvRow],
         state: GroupState[List[(Long, Long, Double)]]) =>
          var res = state.getOption.getOrElse(Nil) // (key_fx, id, weight)
          it.foreach { r =>
            if (r.weight > 0) {
              res = ((keyFx(r.id, r.weight), r.id, r.weight) :: res)
                .sortBy { case (f, i, _) => (-f, i) }.take(k)
            }
          }
          state.update(res)
          res.iterator.map { case (f, i, w) => ResvOut(g, i, w, f) }
      }
  }
}
