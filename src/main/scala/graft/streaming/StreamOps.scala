package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Parsed stedi risk event (FIXTURES.md A3 after StediOps.parseRiskEvent). */
case class RiskEvent(customer: String, score: Double, riskDate: String)

/** Running per-customer aggregate emitted by [[StreamOps.runningRiskTotals]].
  * `total_score_micro` is the merge-order-independent integer twin of the
  * double sum (per-event micro-quantize, long add) — the column the batch
  * replay hash-checks against DuckDB. */
case class CustomerRunning(customer: String, n_events: Long,
    total_score: Double, total_score_micro: Long)

/** Spike alert emitted by [[StreamOps.riskSpikeAlerts]] when a score
  * exceeds twice the customer's prior running mean. `prior_mean_micro` is
  * the exact integer mean (floor of micro-units); `prior_mean` is its
  * human-readable double shadow. */
case class RiskAlert(customer: String, score: Double, prior_mean: Double,
    prior_mean_micro: Long)

/** One observation of a user's value series, the streaming input to
  * [[StreamOps.ewmaStream]] (vm = value in micro-units, the q49 grid). */
case class EwmaPoint(user_id: Long, ts: java.sql.Timestamp, event_id: Long, vm: Long)

/** Running EWMA state emitted by [[StreamOps.ewmaStream]] per key per batch. */
case class EwmaRunning(user_id: Long, n_events: Long, ewma_micro: Long)

/** A closed session emitted by [[StreamOps.sessionCloseEvents]] when the
  * watermark passes the session's gap horizon (times in micros; the
  * score sum is the merge-order-independent integer twin). */
case class SessionClosed(customer: String, start_us: Long, last_us: Long,
    n_events: Long, sum_score_micro: Long)

/** One typed event on a user's timeline, the input to
  * [[StreamOps.patternMatches]] (us = event time in microseconds). */
case class TypedEvent(user_id: Long, us: Long, event_id: Long, event_type: String)

/** An A-then-B pattern hit emitted by [[StreamOps.patternMatches]]: the
  * B event plus the latest preceding A event and their gap. */
case class PatternMatch(user_id: Long, a_event_id: Long, b_event_id: Long,
    a_us: Long, b_us: Long, gap_us: Long)

/** One (doc, band) row of the streaming LSH band view — the input the
  * near-dup operator's keyed state consumes (shh = the doc's sorted
  * 64-bit shingle fingerprints, for in-state exact verification). */
case class BandRow(doc_id: Long, shh: Array[Long], bid: Int, bkey: String)
case class BandRowTs(doc_id: Long, shh: Array[Long], ts: java.sql.Timestamp,
  bid: Int, bkey: String)
case class EmbBandRow(vec_id: Long, embedding: Array[Float], bid: Int, bkey: Int)
case class EmbBandRowTs(vec_id: Long, embedding: Array[Float],
  ts: java.sql.Timestamp, bid: Int, bkey: Int)
/** [[EmbBandRowTs]] plus the `touch` marker consumed by
  * [[StreamOps.streamingAnnPairsEvictingFrom]] — a touch row re-arms
  * its bucket's EventTimeTimeout after an epoch migration without
  * enrolling or pairing (vec_id/embedding are sentinels). */
case class EmbBandRowTsT(vec_id: Long, embedding: Array[Float],
  ts: java.sql.Timestamp, bid: Int, bkey: Int, touch: Boolean)
case class AnnPair(vec_a: Long, vec_b: Long, cosine: Double)

/** A verified near-duplicate pair emitted by
  * [[StreamOps.streamingNearDupPairs]] — same schema and thresholds as
  * the batch d3 pair set. */
case class NearDupPair(doc_a: Long, doc_b: Long, jaccard: Double)

/** Stateful streaming operators the reference lacks (SURVEY §2.8): event-time
  * windows, watermarked dedup, and arbitrary keyed state. These are the
  * bounded-state building blocks for running the stedi pipelines at scale —
  * every one of them evicts state at the watermark instead of growing
  * forever like the reference's windowless join.
  */
object StreamOps {

  /** Tumbling event-time window aggregation over parsed risk events, with a
    * watermark so closed windows emit in append mode and their state is
    * evicted. */
  def windowedRiskStats(
      risk: DataFrame,
      windowLen: String = "10 minutes",
      watermark: String = "30 minutes"): DataFrame =
    risk
      .withColumn("riskTs", to_timestamp(col("riskDate")))
      .withWatermark("riskTs", watermark)
      .groupBy(window(col("riskTs"), windowLen), col("customer"))
      .agg(
        count(lit(1)).as("n_events"),
        round(avg(col("score")), 6).as("avg_score"),
        max(col("score")).as("max_score"),
        // Integer-exact twin of the score sum (per-row micro-quantize, then
        // a long sum): merge-order-independent, so the batch replay of this
        // exact plan can be hash-compared against a DuckDB oracle — the
        // double avg above is for human consumption only.
        sum(expr("cast(round(score * 1000000.0) as bigint)")).as("sum_score_micro"))
      .select(
        col("window.start").as("window_start"),
        col("customer"), col("n_events"), col("avg_score"), col("max_score"),
        col("sum_score_micro"))

  /** Sliding event-time windows: like [[windowedRiskStats]] but each event
    * contributes to every window whose span covers it (len/slide windows),
    * the moving-average shape. */
  def slidingRiskStats(
      risk: DataFrame,
      windowLen: String = "10 minutes",
      slide: String = "5 minutes",
      watermark: String = "30 minutes"): DataFrame =
    risk
      .withColumn("riskTs", to_timestamp(col("riskDate")))
      .withWatermark("riskTs", watermark)
      .groupBy(window(col("riskTs"), windowLen, slide), col("customer"))
      .agg(count(lit(1)).as("n_events"), round(avg(col("score")), 6).as("avg_score"),
        // Integer-exact sum twin — see windowedRiskStats.
        sum(expr("cast(round(score * 1000000.0) as bigint)")).as("sum_score_micro"))
      .select(col("window.start").as("window_start"),
        col("customer"), col("n_events"), col("avg_score"), col("sum_score_micro"))

  /** Streaming exact dedup on (customer, riskDate) with watermark-bounded
    * state — re-delivered Kafka records (the at-least-once sink's
    * duplicates) collapse to one row. */
  def dedupRiskEvents(risk: DataFrame, watermark: String = "30 minutes"): DataFrame = {
    val ts = risk.withColumn("riskTs", to_timestamp(col("riskDate")))
    // dropDuplicatesWithinWatermark is streaming-only (it needs an eviction
    // horizon); over a bounded frame the watermark is past every event, so
    // plain dropDuplicates on the same keys IS its batch semantics — one
    // operator, both execution modes.
    val deduped =
      if (risk.isStreaming)
        ts.withWatermark("riskTs", watermark)
          .dropDuplicatesWithinWatermark("customer", "riskDate")
      else ts.dropDuplicates("customer", "riskDate")
    deduped.select(col("customer"), col("score"), col("riskDate"))
  }

  /** Event-time session windows: per-customer activity bursts separated by
    * `gap` of silence, state evicted at the watermark — the streaming twin
    * of the batch sessionizer (TemporalQueries.q21Sessionize). */
  def sessionRiskStats(
      risk: DataFrame,
      gap: String = "5 minutes",
      watermark: String = "30 minutes"): DataFrame =
    risk
      .withColumn("riskTs", to_timestamp(col("riskDate")))
      .withWatermark("riskTs", watermark)
      .groupBy(session_window(col("riskTs"), gap), col("customer"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("score")), 6).as("total_score"),
        // Integer-exact sum twin — see windowedRiskStats.
        sum(expr("cast(round(score * 1000000.0) as bigint)")).as("total_score_micro"))
      .select(
        col("session_window.start").as("sess_start"),
        col("session_window.end").as("sess_end"),
        col("customer"), col("n_events"), col("total_score"),
        col("total_score_micro"))

  /** 0..n outputs per key per batch via flatMapGroupsWithState: alert rows
    * whenever a score exceeds 2x the customer's prior running mean (two
    * scalars of state per key — anomaly detection without a model).
    *
    * Within a micro-batch events sort by (riskDate, score) before the
    * fold: groupByKey delivers the shuffle's arbitrary order, and the
    * alert set depends on fold order (a spike seen before its
    * baseline fires differently than after). The sort makes the output a
    * pure function of the batch's event SET — ties on the full sort key
    * are identical values, interchangeable in the fold — same discipline
    * as [[ewmaStream]].
    *
    * The fold state and trigger are INTEGER (micro-units): the condition
    * `score_micro · n > 2 · sum_micro` is the exact cross-multiplied form
    * of `score > 2·mean` — no double division anywhere in the decision, so
    * stream, batch replay, and SQL oracle agree on every boundary case. */
  def riskSpikeAlerts(spark: SparkSession, risk: DataFrame): Dataset[RiskAlert] = {
    import spark.implicits._
    risk.as[RiskEvent]
      .groupByKey(_.customer)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (customer: String, events: Iterator[RiskEvent], state: GroupState[(Long, Long)]) =>
          var (n, sMicro) = state.getOption.getOrElse((0L, 0L))
          val alerts = scala.collection.mutable.Buffer.empty[RiskAlert]
          events.toSeq.sortBy(e => (e.riskDate, e.score)).foreach { e =>
            val eMicro = math.round(e.score * 1e6)
            if (n >= 2 && eMicro * n > 2 * sMicro)
              alerts += RiskAlert(customer, e.score,
                sMicro.toDouble / n / 1e6, sMicro / n)
            n += 1; sMicro += eMicro
          }
          state.update((n, sMicro))
          alerts.iterator
      }
  }

  /** Streaming EWMA (α = 0.15): the unbounded-history form of the batch
    * q49 smoother, exactly as its docstring promises — state per key is
    * ONE micro-unit BIGINT (plus a count), updated with the identical
    * integer recurrence `e' = (15·x + 85·e) div 100`, so a batch replay
    * and the stream agree bit-for-bit on any partitioning (all inputs are
    * positive, so truncating and floor division coincide). Within a
    * micro-batch events sort by (ts, event_id); across batches the
    * recurrence folds in arrival order, which equals event order for an
    * in-order source (pair with dropDuplicates/watermarking upstream for
    * at-least-once topics). */
  def ewmaStream(spark: SparkSession, pts: Dataset[EwmaPoint]): Dataset[EwmaRunning] = {
    import spark.implicits._
    pts.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (uid: Long, events: Iterator[EwmaPoint], state: GroupState[(Long, Long)]) =>
          var (n, e) = state.getOption.getOrElse((0L, 0L))
          // Full-microsecond sort key: Timestamp.getTime is millis-only and
          // would tie events inside the same millisecond, diverging from
          // the batch q49 fold's exact (ts, event_id) order.
          def micros(t: java.sql.Timestamp): Long =
            math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
          events.toSeq.sortBy(p => (micros(p.ts), p.event_id)).foreach { p =>
            e = if (n == 0) p.vm else (15 * p.vm + 85 * e) / 100
            n += 1
          }
          state.update((n, e))
          EwmaRunning(uid, n, e)
      }
  }

  /** Custom sessionization with EVENT-TIME TIMEOUT state eviction — the
    * arbitrary-stateful analogue of [[sessionRiskStats]], and the one
    * GroupStateTimeout pattern the built-in session_window cannot
    * express: a session summary is emitted ONLY once the WATERMARK has
    * passed that session's gap horizon (`last + gap`), never
    * incrementally and never early — an exactly-once "session closed"
    * event per burst. This holds even for bursts separated by an
    * intra-batch gap: the older burst is NOT emitted eagerly at the gap
    * (the watermark may still admit out-of-order events that belong to
    * it) — it is held in state as a PENDING burst and released only when
    * the watermark crosses its horizon, so a late event inside the
    * watermark tolerance merges into the correct pending burst instead
    * of contaminating the next one. State per key is the list of
    * not-yet-releasable bursts (4 longs each; bounded by
    * watermark-delay/gap, e.g. 30 min/5 min = ≤ 7 here), evicted by
    * `state.remove()` once the last burst closes — the TTL discipline
    * that keeps arbitrary-state jobs bounded at 100 TB of traffic.
    *
    * Batch semantics note: timeouts never fire in batch execution
    * (there is no watermark), so — unlike the other StreamOps operators
    * — this one has NO batch twin; its contract is pinned by the
    * MemoryStream spec (session closes exactly once, after the
    * watermark crosses `last + gap`; late-merge; state removed).
    *
    * STATE-SCHEMA COMPATIBILITY: the state type changed from a single
    * `(Long, Long, Long, Long)` tuple to `Seq[(Long, Long, Long, Long)]`
    * when pending-burst holding landed (round 7). flatMapGroupsWithState
    * checkpoints encode the state schema; a checkpoint written by the
    * old single-tuple version CANNOT be resumed by this code — an
    * in-place upgrade of a running query would fail or misdecode state.
    * Upgrading deployments must start from a NEW `checkpointLocation`
    * (replaying from earliest offsets, the K2/S3 discipline); the
    * MemoryStream spec pins the current contract only. */
  val SessionGapUs: Long = 300L * 1000000L  // 5 minutes, the q21 gap
  def sessionCloseEvents(spark: SparkSession, risk: DataFrame,
      watermark: String = "30 minutes"): Dataset[SessionClosed] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val ts = risk.withColumn("riskTs", to_timestamp(col("riskDate")))
      .withWatermark("riskTs", watermark)
      .select(col("customer"), col("score"), col("riskTs"))
      .as[(String, Double, java.sql.Timestamp)]
    val gapUs = SessionGapUs
    ts.groupByKey(_._1)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (customer: String,
            events: Iterator[(String, Double, java.sql.Timestamp)],
            state: GroupState[Seq[(Long, Long, Long, Long)]]) =>
          // a burst is (start_us, last_us, n_events, sum_score_micro)
          type Burst = (Long, Long, Long, Long)
          def micros(t: java.sql.Timestamp): Long =
            math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
          // releasable once the watermark passes this (the exact timestamp
          // registered with setTimeoutTimestamp — one comparison everywhere)
          def horizonMs(b: Burst): Long = (b._2 + gapUs) / 1000L + 1L
          def release(bursts: Seq[Burst], wmMs: Long): Iterator[SessionClosed] = {
            val (closed, open) = bursts.partition(horizonMs(_) <= wmMs)
            if (open.isEmpty) state.remove()
            else {
              state.update(open)
              // next close when the watermark passes the OLDEST open
              // horizon; clamp above the current watermark (Spark
              // rejects stale timeouts)
              state.setTimeoutTimestamp(math.max(open.map(horizonMs).min, wmMs + 1L))
            }
            closed.sortBy(_._1).iterator
              .map(b => SessionClosed(customer, b._1, b._2, b._3, b._4))
          }
          val wmMs = state.getCurrentWatermarkMs()
          if (state.hasTimedOut) {
            release(state.get, wmMs)
          } else {
            // fold each event into the burst set: merge every burst within
            // gap reach of the event (an event can BRIDGE two bursts)
            var bursts = state.getOption.getOrElse(Seq.empty[Burst])
            events.map(e => (micros(e._3), math.round(e._2 * 1e6)))
              .toSeq.sortBy(_._1)
              .foreach { case (us, sm) =>
                val (touch, rest) = bursts.partition(
                  b => us >= b._1 - gapUs && us <= b._2 + gapUs)
                bursts = ((us +: touch.map(_._1)).min, (us +: touch.map(_._2)).max,
                  touch.map(_._3).sum + 1L, touch.map(_._4).sum + sm) +: rest
              }
            release(bursts, wmMs)
          }
      }
  }

  /** CEP-style A-then-B pattern detection: emit a match for every
    * 'purchase' that follows a 'view' by the same user within
    * [[PatternWindowUs]], paired with the LATEST such view (the
    * non-consuming followed-by of CEP engines — one view can witness
    * several purchases; each purchase reports its nearest antecedent).
    *
    * State per key is TWO longs — the (us, event_id) of the latest view —
    * so state size is O(keys) regardless of traffic, and the decision
    * `b.us − a.us ≤ W` is pure integer time math: the stream, the batch
    * replay (`r_stream_pattern_replay`), and the DuckDB oracle agree on
    * every boundary (ties inside one timestamp break by event_id, the
    * same lexicographic order the fold processes). Within a micro-batch
    * events sort by (us, event_id); across batches arrival order must be
    * event order (in-order source — the ewmaStream discipline). */
  val PatternWindowUs: Long = 86400L * 1000000L  // 24 h
  def patternMatches(spark: SparkSession, events: Dataset[TypedEvent]): Dataset[PatternMatch] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (uid: Long, es: Iterator[TypedEvent], state: GroupState[(Long, Long)]) =>
          var last = state.getOption.getOrElse((-1L, -1L))
          val out = scala.collection.mutable.Buffer.empty[PatternMatch]
          es.toSeq.sortBy(e => (e.us, e.event_id)).foreach { e =>
            if (e.event_type == "purchase" && last._1 >= 0 &&
                e.us - last._1 <= PatternWindowUs)
              out += PatternMatch(uid, last._2, e.event_id,
                last._1, e.us, e.us - last._1)
            if (e.event_type == "view") last = (e.us, e.event_id)
          }
          state.update(last)
          out.iterator
      }
  }

  /** Streaming MinHash-LSH near-duplicate detection — the operator
    * [[graft.pipelines.StreamingCorpusPipeline]]'s design note deferred
    * to batch, expressed with BOUNDED keyed state: each arriving document
    * is checked against the corpus seen so far, in-flight.
    *
    * Shape: the batch d2/d3 signature+banding kernel runs as pure per-row
    * projections over the stream (`DedupQueries.bandedSignatures` — the
    * literally-shared code path is what makes stream/batch equality a
    * theorem, proven on fixtures by `StreamBatchEqualitySpec`), then
    * state keys on the LSH bucket (bid, bkey). A bucket's state is its
    * resident list [(doc_id, shh)]; a new arrival exact-Jaccard-verifies
    * against the residents (the batch `jaccardVerify` arithmetic: sorted
    * 64-bit fingerprint merge-count, exact double ratio vs
    * [[graft.ext.DedupQueries.JaccardThreshold]], HALF_UP 6-decimal
    * output) and enrolls. Re-deliveries of an enrolled doc_id are
    * ignored (at-least-once sources), and within a micro-batch rows fold
    * in doc_id order so the output is a pure function of the batch's row
    * SET.
    *
    * State bounding — the honest production contract: a bucket enrolls at
    * most `maxBucket` residents; hotter buckets verify new arrivals
    * against the enrolled residents but stop growing (the m16/df-cap
    * analog: a bucket hot enough to hit the cap is boilerplate that d27's
    * cut pass owns, not pairwise dedup). ONCE THE CAP BINDS, output
    * becomes arrival-order dependent: a verified-but-not-enrolled doc is
    * not remembered, so an at-least-once redelivery of it re-emits its
    * pairs (absorbed by the consumers' documented
    * `dropDuplicates(doc_a, doc_b)`), and WHICH residents hold the cap
    * slots depends on arrival order — the capped bucket trades
    * stream=batch equality for bounded memory, by contract (the
    * equality spec covers the uncapped path). Pair with an upstream
    * watermark dedup for replay safety; for recent-history-window
    * semantics use [[streamingNearDupPairsEvicting]].
    *
    * The same pair can collide in several bands: emissions are distinct
    * per (pair, bucket) — batch d3 dedupes candidates corpus-globally,
    * which a continuous query cannot; consumers take the pair STREAM
    * through `dropDuplicates("doc_a", "doc_b")` (bounded by the true
    * pair set) exactly like the equality spec does. */
  def streamingNearDupPairs(spark: SparkSession, docs: DataFrame,
      maxBucket: Int = 1024): Dataset[NearDupPair] = {
    import spark.implicits._
    def intersect(a: Array[Long], b: Array[Long]): Int = {
      var i = 0; var j = 0; var c = 0
      while (i < a.length && j < b.length) {
        if (a(i) == b(j)) { c += 1; i += 1; j += 1 }
        else if (a(i) < b(j)) i += 1 else j += 1
      }
      c
    }
    graft.ext.DedupQueries.bandedSignatures(docs).as[BandRow]
      .groupByKey(r => (r.bid, r.bkey))
      .flatMapGroupsWithState(
        OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (_: (Int, String), rows: Iterator[BandRow],
            state: GroupState[List[(Long, Array[Long])]]) =>
          var residents = state.getOption.getOrElse(Nil)
          val out = scala.collection.mutable.Buffer.empty[NearDupPair]
          rows.toSeq.sortBy(_.doc_id).foreach { r =>
            if (!residents.exists(_._1 == r.doc_id)) {
              residents.foreach { case (id, shh2) =>
                val inter = intersect(r.shh, shh2).toDouble
                val jac = inter / (r.shh.length + shh2.length - inter)
                if (jac >= graft.ext.DedupQueries.JaccardThreshold)
                  out += NearDupPair(math.min(id, r.doc_id), math.max(id, r.doc_id),
                    BigDecimal(jac).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
              }
              if (residents.size < maxBucket) residents = (r.doc_id, r.shh) :: residents
            }
          }
          state.update(residents)
          out.iterator
      }
  }

  /** [[streamingNearDupPairs]] with EVENT-TIME EVICTION — the
    * recent-history-window production form the unbounded variant's
    * Scaladoc names: a bucket's residents are dropped once the watermark
    * passes the bucket's LAST ARRIVAL, so a document only pairs against
    * the near-past (dedup-against-recent-history — the semantics of a
    * continuously-curated feed where month-old copies are someone
    * else's batch job) and total state is bounded by the event-time
    * window's arrival mass instead of the corpus.
    *
    * `docs` must carry an event-time column `ts`; the watermark is set
    * here (delay = `watermark`) BEFORE the per-row band projections.
    * Mechanics: FlatMapGroupsWithState with EventTimeTimeout — each
    * batch re-arms the bucket's timeout at its max arrival event time
    * (clamped above the current watermark, the API contract); when the
    * watermark passes with no new arrival, the callback fires with
    * hasTimedOut and the state is removed. Within-batch semantics
    * (doc_id-ordered fold, exact-Jaccard verify, maxBucket cap,
    * enrolled-redelivery skip) are byte-identical to the unbounded
    * operator — the eviction spec proves a pre-eviction near-dup IS
    * found and the same pair arriving after eviction is NOT. */
  def streamingNearDupPairsEvicting(spark: SparkSession, docs: DataFrame,
      watermark: String = "10 minutes", maxBucket: Int = 1024)
      : Dataset[NearDupPair] = {
    import spark.implicits._
    graft.ext.DedupQueries
      .bandedSignatures(docs.withWatermark("ts", watermark), Seq("ts"))
      .as[BandRowTs]
      .groupByKey(r => (r.bid, r.bkey))
      .flatMapGroupsWithState(
        OutputMode.Update(),
        GroupStateTimeout.EventTimeTimeout()) {
        (_: (Int, String), rows: Iterator[BandRowTs],
            state: GroupState[List[(Long, Array[Long])]]) =>
          // helpers INSIDE the closure (serialization discipline)
          def intersect(a: Array[Long], b: Array[Long]): Int = {
            var i = 0; var j = 0; var c = 0
            while (i < a.length && j < b.length) {
              if (a(i) == b(j)) { c += 1; i += 1; j += 1 }
              else if (a(i) < b(j)) i += 1 else j += 1
            }
            c
          }
          if (!rows.hasNext) {
            // watermark passed the bucket's last arrival: evict
            if (state.hasTimedOut) state.remove()
            Iterator.empty
          } else {
            var residents = state.getOption.getOrElse(Nil)
            val out = scala.collection.mutable.Buffer.empty[NearDupPair]
            val batch = rows.toSeq
            batch.sortBy(_.doc_id).foreach { r =>
              if (!residents.exists(_._1 == r.doc_id)) {
                residents.foreach { case (id, shh2) =>
                  val inter = intersect(r.shh, shh2).toDouble
                  val jac = inter / (r.shh.length + shh2.length - inter)
                  if (jac >= graft.ext.DedupQueries.JaccardThreshold)
                    out += NearDupPair(math.min(id, r.doc_id), math.max(id, r.doc_id),
                      BigDecimal(jac).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
                }
                if (residents.size < maxBucket) residents = (r.doc_id, r.shh) :: residents
              }
            }
            state.update(residents)
            val lastArrivalMs = batch.map(_.ts.getTime).max
            // the timeout timestamp must exceed the current watermark
            state.setTimeoutTimestamp(
              math.max(lastArrivalMs, state.getCurrentWatermarkMs() + 1L))
            out.iterator
          }
      }
  }

  /** Streaming ANN near-duplicate detection over an EMBEDDING stream —
    * the vector twin of [[streamingNearDupPairs]], and the in-flight
    * form of the batch d30 edge rule: each arriving embedding keys
    * itself into the L standing LSH tables at a FROZEN width `b` (the
    * build-time parameter a deployed index fixes — the s33 admission
    * contract), exact-cosine-verifies against the bucket's residents,
    * and enrolls. Emits every pair clearing `threshold`.
    *
    * The banding kernel is literally the batch
    * [[graft.ext.SimilarityQueries.bandRowsOf]] (pure per-row
    * projections: 8·b literal-plane dot products), so stream = batch is
    * a theorem, proven on fixtures by `StreamBatchEqualitySpec` against
    * the single-bucket corpus-grain edge set at the same width. Cosine
    * rounds HALF_UP to 6 decimals — the batch `round(cosine_sim, 6)`
    * arithmetic.
    *
    * State: residents `(vec_id, embedding)` per bucket, capped at
    * `maxBucket` with the near-dup operator's documented degradation
    * contract (capped buckets keep flagging against residents, stop
    * growing, and output becomes arrival-order dependent); re-delivered
    * enrolled ids are ignored; within a micro-batch rows fold in vec_id
    * order so output is a pure function of the batch's row set. A pair
    * colliding in several tables emits once per bucket — consumers
    * dedupe with `dropDuplicates("vec_a", "vec_b")` like the MinHash
    * twin. For recent-history-window semantics use
    * [[streamingAnnPairsEvicting]] — the built EventTimeTimeout twin. */
  /** The per-bucket admission fold shared by [[streamingAnnPairs]] and
    * [[streamingAnnPairsFrom]] — the returned closure captures only the
    * two primitive dials (serialization discipline). */
  private def annPairsFold(threshold: Double, maxBucket: Int)
      : ((Int, Int), Iterator[EmbBandRow],
         GroupState[List[(Long, Array[Float])]]) => Iterator[AnnPair] = {
    (_: (Int, Int), rows: Iterator[EmbBandRow],
        state: GroupState[List[(Long, Array[Float])]]) =>
      // helper INSIDE the closure (serialization discipline): the
      // fused dot + both-norms single pass is the literal
      // CosineSimilarity.nullSafeEval arithmetic (same accumulation
      // order, same final expression), so stream cosines are
      // bit-equal to the batch expression's
      def cosine(a: Array[Float], c: Array[Float]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) {
          val x = a(i).toDouble; val y = c(i).toDouble
          dot += x * y; na += x * x; nb += y * y
          i += 1
        }
        dot / (math.sqrt(na) * math.sqrt(nb))
      }
      var residents = state.getOption.getOrElse(Nil)
      val out = scala.collection.mutable.Buffer.empty[AnnPair]
      rows.toSeq.sortBy(_.vec_id).foreach { r =>
        if (!residents.exists(_._1 == r.vec_id)) {
          residents.foreach { case (id, v2) =>
            val cr = BigDecimal(cosine(r.embedding, v2))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            if (cr >= threshold)
              out += AnnPair(math.min(id, r.vec_id),
                math.max(id, r.vec_id), cr)
          }
          if (residents.size < maxBucket)
            residents = (r.vec_id, r.embedding) :: residents
        }
      }
      state.update(residents)
      out.iterator
  }

  def streamingAnnPairs(spark: SparkSession, vecs: DataFrame, b: Int,
      threshold: Double = graft.ext.SimilarityQueries.NearDupThreshold,
      maxBucket: Int = 1024): Dataset[AnnPair] = {
    import spark.implicits._
    graft.ext.SimilarityQueries.bandRowsOf(vecs, b).as[EmbBandRow]
      .groupByKey(r => (r.bid, r.bkey))
      .flatMapGroupsWithState(
        OutputMode.Update(),
        GroupStateTimeout.NoTimeout())(annPairsFold(threshold, maxBucket))
  }

  /** [[streamingAnnPairs]] RESUMED FROM AN EXPLICIT STATE SNAPSHOT — the
    * second half of the mid-stream epoch migration (r10 verdict #4):
    * when the s36 doubling-epoch breach fires, a deployed admission
    * query drains, its bucket state is re-keyed from width b−1 to b by
    * [[graft.ext.SimilarityQueries.migrateAnnResidents]] (each bucket's
    * residents split deterministically into ≤2 child buckets, low bits
    * preserved, NO re-scoring — the s36/s37 split property as a state
    * transform), and this operator resumes at the new width with the
    * migrated residents as its `initialState`. A pre-migration resident
    * still pairs with any post-migration arrival that lands in its
    * child bucket — the no-missed-pairs contract the spec pins.
    *
    * `initialResidents` is resident-grain (bid, bkey, vec_id,
    * embedding) AT WIDTH `b` (i.e. already migrated); residents sort by
    * vec_id into the bucket list, which only fixes an order the fold's
    * set semantics never observe.
    *
    * NoTimeout class only: resuming the EVICTING twin from
    * initialState alone would leak — Spark arms an EventTimeTimeout
    * only inside the fold, so a migrated bucket that never sees
    * traffic again would hold its residents forever (no arrival, no
    * re-arm, no timeout). The evicting composition is
    * [[streamingAnnPairsEvictingFrom]]: window-filter the snapshot at
    * the drain watermark
    * ([[graft.ext.SimilarityQueries.migrateAnnResidentsEvicting]]),
    * resume from the filtered initialState, and feed the
    * [[annTouchRows]] re-registration batch first so every migrated
    * bucket's timeout re-arms at its pre-drain schedule. */
  def streamingAnnPairsFrom(spark: SparkSession, vecs: DataFrame, b: Int,
      initialResidents: DataFrame,
      threshold: Double = graft.ext.SimilarityQueries.NearDupThreshold,
      maxBucket: Int = 1024): Dataset[AnnPair] = {
    import spark.implicits._
    val init = initialResidents
      .select(col("bid"), col("bkey"), col("vec_id"), col("embedding"))
      .as[(Int, Int, Long, Array[Float])]
      .groupByKey(r => (r._1, r._2))
      .mapGroups((k: (Int, Int), it: Iterator[(Int, Int, Long, Array[Float])]) =>
        (k, it.map(r => (r._3, r._4)).toList.sortBy(_._1)))
      .groupByKey(_._1)
      .mapValues(_._2)
    graft.ext.SimilarityQueries.bandRowsOf(vecs, b).as[EmbBandRow]
      .groupByKey(r => (r.bid, r.bkey))
      .flatMapGroupsWithState(
        OutputMode.Update(),
        GroupStateTimeout.NoTimeout(),
        init)(annPairsFold(threshold, maxBucket))
  }

  private val PlaneFamilyFile = "_graft_plane_family"

  /** Stamp a streaming-ANN checkpoint with the build's plane-family
    * version ([[graft.ext.SimilarityQueries.PlaneFamilyVersion]]).
    * Call when STARTING any query whose state is keyed on LSH band
    * buckets (the graft pipelines and benches do). Idempotent for a
    * matching stamp; FAILS FAST if the checkpoint was stamped under a
    * different family — resuming it with this build's planes would
    * re-key bits ≥ 16 of tables ≥ 1 to different hyperplanes and
    * silently generate wrong-bucket candidates (the r12 ADVICE
    * hazard). Mismatch means: re-index (replay the corpus into a fresh
    * checkpoint), not resume. */
  def stampPlaneFamily(spark: SparkSession, checkpoint: String): Unit = {
    val v = graft.ext.SimilarityQueries.PlaneFamilyVersion.toString
    val path = new org.apache.hadoop.fs.Path(checkpoint, PlaneFamilyFile)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    def readStamp(): String = new String(
      org.apache.commons.io.IOUtils.toByteArray(fs.open(path)), "UTF-8").trim
    def checkStamp(got: String): Unit = require(got == v,
      s"checkpoint $checkpoint is stamped plane-family version $got but " +
        s"this build is version $v: standing band state would silently " +
        "re-key under the new plane assignment — re-index into a fresh " +
        "checkpoint instead of resuming")
    // exists→create is not atomic (the r13 ADVICE race), and a direct
    // create exposes a second hazard the race spec caught: a concurrent
    // reader can observe the stamp file CREATED but not yet written and
    // read an empty version. Stamp via tmp + rename — rename is atomic
    // on local FS and HDFS, so once `path` exists its content is
    // complete — and ALWAYS verify the final content afterwards
    // (winner and loser alike), keeping the idempotent-on-match /
    // fail-on-mismatch contract.
    if (!fs.exists(path)) {
      val tmp = new org.apache.hadoop.fs.Path(checkpoint,
        s"$PlaneFamilyFile.tmp-${java.util.UUID.randomUUID()}")
      val out = fs.create(tmp, false)
      out.write(v.getBytes("UTF-8")); out.close()
      if (!fs.rename(tmp, path)) {
        fs.delete(tmp, false)
        // rename fails legitimately when a concurrent stamper won the
        // race (dest exists → fall through to the content check). Any
        // OTHER failure (permissions, checkpoint dir removed) must say
        // so, not surface later as a bare missing-file read.
        require(fs.exists(path),
          s"failed to write plane-family stamp under $checkpoint " +
            "(rename rejected and no concurrent stamp present) — check " +
            "checkpoint permissions/existence")
      }
    }
    checkStamp(readStamp())
  }

  /** Verify a checkpoint's plane-family stamp before DRAINING bucket
    * state out of it. An absent stamp is also a failure: unstamped
    * state has unknown plane lineage (e.g. a pre-version-2 build), and
    * migrating it would be exactly the silent wrong-bucket hazard the
    * stamp exists to catch — after verifying lineage out of band, stamp
    * the checkpoint explicitly and retry. */
  def verifyPlaneFamily(spark: SparkSession, checkpoint: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(checkpoint, PlaneFamilyFile)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(path),
      s"checkpoint $checkpoint carries no plane-family stamp; its band " +
        "state may have been built under a different hyperplane " +
        "assignment (pre-rank-major builds re-keyed ext bits on a width " +
        "bump). Verify the lineage, stampPlaneFamily it explicitly, and " +
        "retry — or re-index.")
    stampPlaneFamily(spark, checkpoint)
  }

  /** The streaming ANN operator's bucket-state SNAPSHOT, read straight
    * off a STOPPED query's checkpoint through Spark's state data source
    * and exploded to resident grain (bid, bkey, vec_id, embedding) —
    * the drain half of the epoch-migration protocol, and the input
    * [[graft.ext.SimilarityQueries.migrateAnnResidents]] re-keys.
    * Fails fast on a missing/mismatched plane-family stamp. */
  def annStateSnapshot(spark: SparkSession, checkpoint: String): DataFrame = {
    verifyPlaneFamily(spark, checkpoint)
    spark.read.format("statestore").load(checkpoint)
      .select(col("key._1").as("bid"), col("key._2").as("bkey"),
        explode(col("value.groupState.value")).as("res"))
      .select(col("bid"), col("bkey"),
        col("res._1").as("vec_id"), col("res._2").as("embedding"))
  }

  /** [[annStateSnapshot]] for the EVICTING operator's checkpoint: the
    * same resident-grain drain plus the bucket's armed
    * EventTimeTimeout (`timeout_ts`, epoch ms — the state format's
    * sibling field to the user state). The timeout is what makes the
    * evicting migration exact: it records both the bucket's eviction
    * schedule (for the drain-time window filter) and the re-arm
    * timestamp the resume path must restore (via [[annTouchRows]]). */
  def annStateSnapshotEvicting(spark: SparkSession, checkpoint: String): DataFrame = {
    verifyPlaneFamily(spark, checkpoint)
    spark.read.format("statestore").load(checkpoint)
      .select(col("key._1").as("bid"), col("key._2").as("bkey"),
        col("value.timeoutTimestamp").as("timeout_ts"),
        explode(col("value.groupState.value")).as("res"))
      .select(col("bid"), col("bkey"), col("timeout_ts"),
        col("res._1").as("vec_id"), col("res._2").as("embedding"))
  }

  /** [[streamingAnnPairs]] with EVENT-TIME EVICTION — the embedding twin
    * of [[streamingNearDupPairsEvicting]], closing the r10 verdict's gap
    * ("the EventTimeTimeout swap applies unchanged" was prose; this is
    * the operator). A bucket's (vec_id, embedding) residents are dropped
    * once the watermark passes the bucket's LAST ARRIVAL, so an
    * embedding only near-dup-checks against the recent-history window
    * and total state is bounded by the window's arrival mass × L tables
    * instead of the corpus — the contract that makes a standing
    * admission filter deployable on an unbounded feed.
    *
    * `vecs` must carry an event-time column `ts`; the watermark is set
    * BEFORE the per-row band projections (the kernel is still the batch
    * [[graft.ext.SimilarityQueries.bandRowsOf]], with `ts` carried
    * through). Within-batch semantics (vec_id-ordered fold, bit-equal
    * exact-cosine verify, maxBucket cap, enrolled-redelivery skip) are
    * byte-identical to the unbounded operator; the eviction mechanics
    * (re-arm at max arrival clamped above the watermark, remove on
    * hasTimedOut) are byte-identical to the MinHash evicting twin. */
  def streamingAnnPairsEvicting(spark: SparkSession, vecs: DataFrame, b: Int,
      threshold: Double = graft.ext.SimilarityQueries.NearDupThreshold,
      watermark: String = "10 minutes", maxBucket: Int = 1024)
      : Dataset[AnnPair] = {
    import spark.implicits._
    graft.ext.SimilarityQueries
      .bandRowsOf(vecs.withWatermark("ts", watermark), b, Seq("ts"))
      .as[EmbBandRowTs]
      .groupByKey(r => (r.bid, r.bkey))
      .flatMapGroupsWithState(
        OutputMode.Update(),
        GroupStateTimeout.EventTimeTimeout()) {
        (_: (Int, Int), rows: Iterator[EmbBandRowTs],
            state: GroupState[List[(Long, Array[Float])]]) =>
          // helper INSIDE the closure (serialization discipline): the
          // literal CosineSimilarity.nullSafeEval arithmetic
          def cosine(a: Array[Float], c: Array[Float]): Double = {
            var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
            while (i < a.length) {
              val x = a(i).toDouble; val y = c(i).toDouble
              dot += x * y; na += x * x; nb += y * y
              i += 1
            }
            dot / (math.sqrt(na) * math.sqrt(nb))
          }
          if (!rows.hasNext) {
            // watermark passed the bucket's last arrival: evict
            if (state.hasTimedOut) state.remove()
            Iterator.empty
          } else {
            var residents = state.getOption.getOrElse(Nil)
            val out = scala.collection.mutable.Buffer.empty[AnnPair]
            val batch = rows.toSeq
            batch.sortBy(_.vec_id).foreach { r =>
              if (!residents.exists(_._1 == r.vec_id)) {
                residents.foreach { case (id, v2) =>
                  val cr = BigDecimal(cosine(r.embedding, v2))
                    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
                  if (cr >= threshold)
                    out += AnnPair(math.min(id, r.vec_id),
                      math.max(id, r.vec_id), cr)
                }
                if (residents.size < maxBucket)
                  residents = (r.vec_id, r.embedding) :: residents
              }
            }
            state.update(residents)
            val lastArrivalMs = batch.map(_.ts.getTime).max
            // the timeout timestamp must exceed the current watermark
            state.setTimeoutTimestamp(
              math.max(lastArrivalMs, state.getCurrentWatermarkMs() + 1L))
            out.iterator
          }
      }
  }

  /** The re-registration batch for resuming the EVICTING ANN operator
    * after an epoch migration: one sentinel row per migrated bucket,
    * shaped for [[streamingAnnPairsEvictingFrom]]'s input contract
    * (`vec_id=-1`, empty embedding, `ts` = the bucket's pre-drain
    * timeout, explicit `touch_bid`/`touch_bkey` routing). Feed these as
    * the FIRST micro-batch of the resumed stream: each touch row makes
    * the fold fire once for its bucket, which re-arms the
    * EventTimeTimeout Spark cannot arm for initialState-only keys —
    * without it, a migrated bucket that never sees traffic again would
    * hold its residents forever. Input is
    * [[graft.ext.SimilarityQueries.migrateAnnResidentsEvicting]]'s
    * output (resident grain with `timeout_ts` carried through). */
  def annTouchRows(migratedResidents: DataFrame): DataFrame =
    migratedResidents.select(col("bid"), col("bkey"), col("timeout_ts"))
      .distinct()
      .select(lit(-1L).as("vec_id"),
        expr("cast(array() as array<float>)").as("embedding"),
        expr("timestamp_millis(timeout_ts)").as("ts"),
        col("bid").as("touch_bid"), col("bkey").as("touch_bkey"))

  /** [[streamingAnnPairsEvicting]] RESUMED FROM A MIGRATED STATE
    * SNAPSHOT — the composition of eviction and epoch migration (the
    * r11 verdict's remaining streaming hole). The unbounded resume
    * ([[streamingAnnPairsFrom]]) cannot carry the eviction contract
    * across the epoch because Spark arms EventTimeTimeouts only inside
    * the fold: an initialState-only bucket is written straight to the
    * store without invoking the function, so its timeout is never set
    * and its residents never evict. This operator closes that with a
    * two-part protocol:
    *
    *  1. `initialResidents` is the drained snapshot window-filtered at
    *     the drain watermark and re-keyed to width `b`
    *     ([[graft.ext.SimilarityQueries.migrateAnnResidentsEvicting]]) —
    *     out-of-window buckets are dropped at migration time,
    *     equivalent to the timeouts that would have fired;
    *  2. the caller feeds [[annTouchRows]] as the resumed stream's
    *     first micro-batch: a touch row routes to its bucket by the
    *     explicit (`touch_bid`,`touch_bkey`) columns (bypassing the
    *     banding projection), makes the fold fire once, and re-arms
    *     the timeout at the bucket's pre-drain schedule — it never
    *     enrolls, never pairs, and is a no-op for buckets with no
    *     migrated state.
    *
    * Input contract: `vec_id LONG, embedding ARRAY<FLOAT>,
    * ts TIMESTAMP, touch_bid INT, touch_bkey INT` — real arrivals
    * carry `touch_bid = -1` and flow through the same
    * [[graft.ext.SimilarityQueries.bandRowsOf]] kernel as every other
    * ANN stream; within-batch semantics (vec_id-ordered fold,
    * bit-equal cosine, maxBucket cap, enrolled-redelivery skip) and
    * the eviction mechanics are byte-identical to
    * [[streamingAnnPairsEvicting]], so post-resume the composed stream
    * behaves exactly as the unbroken evicting stream would at the new
    * width: in-window pre-migration residents still pair with
    * post-migration arrivals in their child buckets, and a migrated
    * bucket the new epoch never touches evicts once the watermark
    * passes its re-armed timeout instead of leaking. */
  def streamingAnnPairsEvictingFrom(spark: SparkSession, vecs: DataFrame,
      b: Int, initialResidents: DataFrame,
      threshold: Double = graft.ext.SimilarityQueries.NearDupThreshold,
      watermark: String = "10 minutes", maxBucket: Int = 1024)
      : Dataset[AnnPair] = {
    import spark.implicits._
    val wm = vecs.withWatermark("ts", watermark)
    val banded = graft.ext.SimilarityQueries
      .bandRowsOf(wm.filter(col("touch_bid") < 0)
        .select(col("vec_id"), col("embedding"), col("ts")), b, Seq("ts"))
      .select(col("vec_id"), col("embedding"), col("ts"),
        col("bid"), col("bkey"), lit(false).as("touch"))
    val touches = wm.filter(col("touch_bid") >= 0)
      .select(col("vec_id"), col("embedding"), col("ts"),
        col("touch_bid").as("bid"), col("touch_bkey").as("bkey"),
        lit(true).as("touch"))
    val init = initialResidents
      .select(col("bid"), col("bkey"), col("vec_id"), col("embedding"))
      .as[(Int, Int, Long, Array[Float])]
      .groupByKey(r => (r._1, r._2))
      .mapGroups((k: (Int, Int), it: Iterator[(Int, Int, Long, Array[Float])]) =>
        (k, it.map(r => (r._3, r._4)).toList.sortBy(_._1)))
      .groupByKey(_._1)
      .mapValues(_._2)
    banded.union(touches).as[EmbBandRowTsT]
      .groupByKey(r => (r.bid, r.bkey))
      .flatMapGroupsWithState(
        OutputMode.Update(),
        GroupStateTimeout.EventTimeTimeout(),
        init) {
        (_: (Int, Int), rows: Iterator[EmbBandRowTsT],
            state: GroupState[List[(Long, Array[Float])]]) =>
          // helper INSIDE the closure (serialization discipline): the
          // literal CosineSimilarity.nullSafeEval arithmetic
          def cosine(a: Array[Float], c: Array[Float]): Double = {
            var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
            while (i < a.length) {
              val x = a(i).toDouble; val y = c(i).toDouble
              dot += x * y; na += x * x; nb += y * y
              i += 1
            }
            dot / (math.sqrt(na) * math.sqrt(nb))
          }
          if (!rows.hasNext) {
            // watermark passed the bucket's (re-armed) last arrival
            if (state.hasTimedOut) state.remove()
            Iterator.empty
          } else {
            val batch = rows.toSeq
            val real = batch.filter(!_.touch)
            if (real.isEmpty && !state.exists) {
              // touch for a bucket with no migrated state (dropped by
              // the window filter, or never migrated): a strict no-op —
              // arming a timeout would require creating junk state
              Iterator.empty
            } else {
              var residents = state.getOption.getOrElse(Nil)
              val out = scala.collection.mutable.Buffer.empty[AnnPair]
              real.sortBy(_.vec_id).foreach { r =>
                if (!residents.exists(_._1 == r.vec_id)) {
                  residents.foreach { case (id, v2) =>
                    val cr = BigDecimal(cosine(r.embedding, v2))
                      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
                    if (cr >= threshold)
                      out += AnnPair(math.min(id, r.vec_id),
                        math.max(id, r.vec_id), cr)
                  }
                  if (residents.size < maxBucket)
                    residents = (r.vec_id, r.embedding) :: residents
                }
              }
              state.update(residents)
              // touch rows carry the bucket's pre-drain timeout as
              // their event time, so max over ALL rows restores the
              // unbroken stream's eviction schedule on re-arm
              val lastArrivalMs = batch.map(_.ts.getTime).max
              state.setTimeoutTimestamp(
                math.max(lastArrivalMs, state.getCurrentWatermarkMs() + 1L))
              out.iterator
            }
          }
      }
  }

  /** Stream-static join: enrich the risk stream with a batch dimension.
    * The static side is broadcast — a stateless per-batch hash lookup, the
    * scale-correct shape for dimension enrichment (no streaming state at
    * all, unlike a stream-stream join). */
  def enrichWithStaticCustomers(risk: DataFrame, customers: DataFrame): DataFrame =
    risk.join(broadcast(customers), risk("customer") === customers("email"), "inner")
      .select(col("customer"), col("score"), col("birthYear"))

  /** Arbitrary keyed state via mapGroupsWithState: running (count, sum of
    * score) per customer, updated each micro-batch (Update output mode).
    * The state is two scalars per key — the streaming analog of a
    * map-side-combined aggregate. */
  def runningRiskTotals(spark: SparkSession, risk: DataFrame): Dataset[CustomerRunning] = {
    import spark.implicits._
    risk.as[RiskEvent]
      .groupByKey(_.customer)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (customer: String, events: Iterator[RiskEvent], state: GroupState[(Long, Double, Long)]) =>
          val (n0, s0, m0) = state.getOption.getOrElse((0L, 0.0, 0L))
          val (n, s, m) = events.foldLeft((n0, s0, m0)) { case ((cn, cs, cm), e) =>
            (cn + 1, cs + e.score, cm + math.round(e.score * 1e6))
          }
          state.update((n, s, m))
          CustomerRunning(customer, n, s, m)
      }
  }

  /** [[runningRiskTotals]] on Spark 4's `transformWithState` API — the
    * GA arbitrary-state operator that supersedes mapGroupsWithState:
    * typed composite state handles (ValueState here; List/Map state and
    * timers on the same [[org.apache.spark.sql.streaming
    * .StatefulProcessorHandle]]), per-state TTL, and schema-evolvable
    * RocksDB-backed storage. Semantics are pinned identical to the
    * mapGroupsWithState twin by `StreamOpsSpec` (same totals per key per
    * micro-batch), so either operator can serve the pipeline.
    *
    * Requires `spark.sql.streaming.stateStore.providerClass =
    * ...RocksDBStateStoreProvider` on the running session —
    * transformWithState does not execute on the default HDFS-backed
    * store; callers (and the spec) set it per query via the session
    * conf. */
  class RunningTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, RiskEvent, CustomerRunning] {
    import org.apache.spark.sql.streaming.{TTLConfig, TimeMode, ValueState}
    @transient private var totals: ValueState[(Long, Double, Long)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Double, Long)](
        "totals", org.apache.spark.sql.Encoders.product[(Long, Double, Long)],
        TTLConfig.NONE)
    override def handleInputRows(customer: String, rows: Iterator[RiskEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[CustomerRunning] = {
      val (n0, s0, m0) = if (totals.exists()) totals.get() else (0L, 0.0, 0L)
      val (n, s, m) = rows.foldLeft((n0, s0, m0)) { case ((cn, cs, cm), e) =>
        (cn + 1, cs + e.score, cm + math.round(e.score * 1e6))
      }
      totals.update((n, s, m))
      Iterator.single(CustomerRunning(customer, n, s, m))
    }
  }

  def runningRiskTotalsTws(spark: SparkSession, risk: DataFrame): Dataset[CustomerRunning] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    risk.as[RiskEvent]
      .groupByKey(_.customer)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** [[sessionCloseEvents]] on transformWithState — the full Spark 4
    * state surface the FMGWS twin can't express: PENDING bursts in a
    * typed `ListState` (vs one serialized Seq blob), and the close
    * driven by an explicit EVENT-TIME TIMER (`registerTimer` /
    * `handleExpiredTimer`) instead of the single implicit
    * per-key timeout. Burst semantics are identical by construction and
    * pinned by `StreamOpsSpec`: emit only once the watermark passes the
    * burst's gap horizon; late in-tolerance events merge into the
    * pending burst; strict eviction when the last burst closes. */
  class SessionCloseProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        String, (String, Double, java.sql.Timestamp), SessionClosed] {
    import org.apache.spark.sql.streaming.{ListState, TTLConfig, TimeMode, TimerValues}
    type Burst = (Long, Long, Long, Long)
    @transient private var bursts: ListState[Burst] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      bursts = getHandle.getListState[Burst]("bursts",
        org.apache.spark.sql.Encoders.product[Burst], TTLConfig.NONE)
    private def horizonMs(b: Burst): Long = (b._2 + SessionGapUs) / 1000L + 1L
    private def release(customer: String, bs: Seq[Burst], wmMs: Long): Iterator[SessionClosed] = {
      val (closed, open) = bs.partition(horizonMs(_) <= wmMs)
      bursts.clear()
      // one live timer per key: re-arm at the oldest open horizon.
      // Materialize BEFORE deleting — mutating timer state while the
      // store iterator is live depends on unspecified provider snapshot
      // behavior (fine on RocksDB today, not contractual).
      getHandle.listTimers().toList
        .foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      if (open.nonEmpty) {
        open.foreach(bursts.appendValue)
        getHandle.registerTimer(math.max(open.map(horizonMs).min, wmMs + 1L))
      }
      closed.sortBy(_._1).iterator
        .map(b => SessionClosed(customer, b._1, b._2, b._3, b._4))
    }
    override def handleInputRows(customer: String,
        rows: Iterator[(String, Double, java.sql.Timestamp)],
        timerValues: TimerValues): Iterator[SessionClosed] = {
      def micros(t: java.sql.Timestamp): Long =
        math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
      var bs: Seq[Burst] = if (bursts.exists()) bursts.get().toSeq else Seq.empty
      rows.map(e => (micros(e._3), math.round(e._2 * 1e6)))
        .toSeq.sortBy(_._1)
        .foreach { case (us, sm) =>
          val (touch, rest) = bs.partition(
            b => us >= b._1 - SessionGapUs && us <= b._2 + SessionGapUs)
          bs = ((us +: touch.map(_._1)).min, (us +: touch.map(_._2)).max,
            touch.map(_._3).sum + 1L, touch.map(_._4).sum + sm) +: rest
        }
      release(customer, bs, timerValues.getCurrentWatermarkInMs())
    }
    override def handleExpiredTimer(customer: String,
        timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[SessionClosed] = {
      val bs: Seq[Burst] = if (bursts.exists()) bursts.get().toSeq else Seq.empty
      release(customer, bs, timerValues.getCurrentWatermarkInMs())
    }
  }

  /** Streaming UPSERT sink via `foreachBatch` — the production sink
    * pattern Structured Streaming itself cannot express (its file sinks
    * are append-only): each micro-batch MERGES into a keyed parquet
    * table, keeping the latest risk row per customer
    * (max (riskTs, score) — deterministic tiebreak), with two
    * idempotence guards a real deployment needs:
    *
    *  - per-batch MERGE is a read-union-argmax-rewrite into a temp dir
    *    followed by an atomic rename (never read+overwrite the same
    *    path — Spark deletes the input mid-job);
    *  - a `_last_batch` marker makes batch REPLAY a no-op: after a
    *    crash between sink commit and checkpoint commit, the restarted
    *    query re-delivers the same batchId and the sink skips it — the
    *    exactly-once recipe foreachBatch documentation prescribes.
    *
    * At cluster scale the same shape lands on a table format's real
    * MERGE INTO; the guards (batchId skip, atomic publish) are
    * format-independent. */
  def runUpsertSink(risk: DataFrame, table: String, ckpt: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    risk.writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        upsertBatch(batch, batchId, table)
      }
      .start()

  /** One foreachBatch merge (factored out so the spec can drive the
    * replay and crash-recovery guards directly).
    *
    * Publish protocol — every window is either atomic or lands in a
    * state the next run repairs, and the merge itself is IDEMPOTENT
    * (re-merging an already-applied batch reproduces the same table),
    * so "unknown" always degrades to "re-apply", never to data loss:
    *
    *  1. write the merged table to a fresh tmp dir;
    *  2. move the live table ASIDE (rename, atomic) — never delete it
    *     before the new one is in place;
    *  3. rename tmp → live (atomic; checked — a false return aborts the
    *     batch with the old table still recoverable);
    *  4. drop the aside copy;
    *  5. update the marker via write-tmp + delete + rename — a crash
    *     mid-update leaves the marker ABSENT (→ re-merge, idempotent),
    *     never half-written (the create-then-write of the naive version
    *     could truncate the marker and wedge every restart on
    *     `"".toLong`).
    *
    * The read path repairs step-3 crashes: live missing + aside present
    * → recover from the aside copy. */
  def upsertBatch(batch: DataFrame, batchId: Long, table: String): Unit = {
    import org.apache.hadoop.fs.Path
    val spark = batch.sparkSession
    val fs = new Path(table).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = new Path(table)
    val aside = new Path(table + "_prev")
    val marker = new Path(table + "_last_batch")
    val applied =
      if (fs.exists(marker)) {
        val in = fs.open(marker)
        val raw = try scala.io.Source.fromInputStream(in).mkString.trim
        finally in.close()
        // unreadable marker = unknown = re-apply (idempotent), never wedge
        try raw.toLong catch { case _: NumberFormatException => -1L }
      } else -1L
    if (batchId <= applied) return // replayed batch: already merged
    // crash repair: a previous run died between moving the live table
    // aside and publishing its replacement. The rename MUST be checked —
    // an unchecked false here would fall through to an empty `cur` and
    // the aside delete below would destroy the only surviving copy.
    if (!fs.exists(dst) && fs.exists(aside) && !fs.rename(aside, dst))
      throw new java.io.IOException(
        s"upsert sink: cannot recover $aside to $dst — refusing to merge from empty")
    val cur =
      if (fs.exists(dst)) spark.read.parquet(table)
      else batch.limit(0)
    val merged = cur.unionByName(batch)
      .withColumn("ts", to_timestamp(col("riskDate")))
      .groupBy(col("customer"))
      .agg(max(struct(col("ts"), col("score"), col("riskDate"))).as("m"))
      .select(col("customer"), col("m.score").as("score"),
        col("m.riskDate").as("riskDate"))
    val tmp = new Path(table + s"_tmp_$batchId")
    merged.write.mode("overwrite").parquet(tmp.toString)
    fs.delete(aside, true)
    if (fs.exists(dst) && !fs.rename(dst, aside))
      throw new java.io.IOException(s"upsert sink: cannot move $dst aside")
    if (!fs.rename(tmp, dst)) {
      // publish failed: put the old table back and fail the batch loudly
      if (fs.exists(aside)) fs.rename(aside, dst)
      throw new java.io.IOException(s"upsert sink: cannot publish $tmp to $dst")
    }
    fs.delete(aside, true)
    val markerTmp = new Path(table + s"_last_batch_tmp")
    val out = fs.create(markerTmp, true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
    fs.delete(marker, false)
    if (!fs.rename(markerTmp, marker))
      throw new java.io.IOException(s"upsert sink: cannot update $marker")
  }

  def sessionCloseEventsTws(spark: SparkSession, risk: DataFrame,
      watermark: String = "30 minutes"): Dataset[SessionClosed] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    risk.withColumn("riskTs", to_timestamp(col("riskDate")))
      .withWatermark("riskTs", watermark)
      .select(col("customer"), col("score"), col("riskTs"))
      .as[(String, Double, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new SessionCloseProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
