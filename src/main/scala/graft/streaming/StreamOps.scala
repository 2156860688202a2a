package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ml.PowerDirection
import graft.ops.Scoring

/** Structured Streaming rebind of the batch pipeline (SURVEY §2.10/§7.6).
  *
  * The reference is pure batch; its "time-evolving" semantics are integer
  * sliding windows (W1) with a trailing comparison frame (W2). These are
  * exactly Spark's event-time primitives:
  *
  *   - W1 → `window($"ts", size, slide)` + `withWatermark` (late data
  *     delays a window's finalization instead of corrupting it);
  *   - W2 (trailing sketch frame → SVD direction → cosine change score)
  *     → `flatMapGroupsWithState`, keeping the last `backWs` sketch
  *     vectors as keyed state.
  *
  * The batch stages (Features/Scoring) are pure column transforms by
  * design so they bind to either engine unchanged.
  */
object StreamOps {

  /** Event-time hourly (or any-duration) counts over a streaming events
    * table — the streaming twin of SparkEntry q30. `events` must be a
    * streaming DataFrame with a TIMESTAMP `ts` column.
    */
  def windowedEventCounts(events: DataFrame, size: String = "1 hour",
                          watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), size), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding-window per-account out-degree/weight over a streaming edge
    * table with TIMESTAMP `ts` — the streaming twin of W1 + the out-side
    * of A1-A8. (The full 12-feature set needs two aggregations + a join,
    * which streaming supports in append mode with watermarks on both
    * sides; out-side stats are the demonstration surface.)
    */
  def slidingOutFeatures(edges: DataFrame, size: String = "14 days",
                         slide: String = "7 days",
                         watermark: String = "14 days"): DataFrame =
    edges.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), size, slide), col("src").as("account"))
      .agg(count(lit(1)).as("multi_out_degree"),
        sum(col("weight")).as("total_out_weight"),
        avg(col("weight")).as("mean_out_weight"))
      .select(col("window.start").as("w_start"), col("account"),
        col("multi_out_degree"), col("total_out_weight"),
        col("mean_out_weight"))

  /** Streaming event-time sessionization — the q41 twin, and the one
    * windowing shape that is STREAMING-NATIVE in Spark: `session_window`
    * grows a per-key window while events keep arriving within `gap` of
    * each other and finalizes it when the watermark passes the session's
    * close (append mode — a session emits exactly once, merged across
    * whatever micro-batches its events straddled).
    *
    * State is watermark-bounded by construction: only OPEN sessions
    * (last event within `gap` of the watermark horizon) are retained;
    * a finalized session's state is dropped on emit. Same face as the
    * batch q41 (user_id, session_start, n_events, sum_value), with the
    * batch operator's round(sum, 6) applied here so equality is
    * byte-for-byte (the round-11 moving-avg advice, honored from the
    * start).
    */
  def streamingSessions(events: DataFrame, gap: String = "30 minutes",
                        watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 6).as("sum_value"))
      .select(col("user_id"),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss")
          .as("session_start"),
        col("n_events"), col("sum_value"))

  /** Streaming exact dedup: drop re-deliveries of the same (key) within
    * the watermark horizon — the streaming twin of Dedup.exact. State is
    * BOUNDED: dropDuplicatesWithinWatermark expires each key's entry once
    * the watermark passes it, so state size tracks the horizon, not the
    * stream's lifetime (the 100 TB/unbounded-stream requirement).
    */
  def streamingDedup(docs: DataFrame, keyCol: String = "text_hash",
                     watermark: String = "1 hour"): DataFrame =
    docs.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCol)

  /** One exploded (band, doc) row of a streaming document's MinHash LSH
    * banding — the unit the near-dup state is keyed on.
    */
  final case class BandEvent(bandId: Int, bandHash: String, docId: Long,
                             ts: java.sql.Timestamp)
  /** Per-bucket state: the first document that claimed this band bucket. */
  final case class BucketState(firstDoc: Long)
  /** A streaming near-dup candidate: `docId` shares LSH band `bandId`
    * with earlier-arrived `dupOf`.
    */
  final case class NearDupCand(docId: Long, dupOf: Long, bandId: Int)

  /** Streaming near-duplicate candidates: the streaming twin of
    * Dedup.minhashLshPairs (q23). Each document's text is shingled,
    * MinHash-signed and LSH-banded with the SAME column expressions as
    * the batch operator (identical band hashes, so stream output is
    * cross-checkable against the batch pairs); a document that lands in
    * a band bucket already claimed by an earlier document within the
    * watermark horizon is emitted as a candidate pair.
    *
    * State is BOUNDED: one (band, hash) → firstDoc entry per bucket,
    * expired by event-time timeout once the watermark passes the last
    * arrival + horizon — state tracks the horizon's distinct buckets,
    * not the stream's lifetime (the unbounded-stream requirement, same
    * contract as [[streamingDedup]]).
    *
    * `k` defaults lower than batch (8 vs 32): the HOF signature hashes
    * each shingle k times per row (no exploded agg in a stateful stream),
    * so k is the per-event CPU knob; 4 bands × 2 rows still catches
    * high-Jaccard rewordings with high probability.
    *
    * A pair that collides in several bands is emitted once per band —
    * `.dropDuplicates("docId","dupOf")` downstream if band identity is
    * irrelevant. Exact-duplicate re-deliveries of the SAME docId are not
    * pairs (self-dups are skipped); streamingDedup handles those.
    */
  def streamingNearDupCandidates(docs: DataFrame, textCol: String = "text",
                                 k: Int = 8, bands: Int = 4,
                                 watermark: String = "1 hour")
      : Dataset[NearDupCand] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(k % bands == 0, s"k=$k must be a multiple of bands=$bands")
    val rows = k / bands
    val sig = graft.ext.Dedup.minhashSignature(
      graft.ext.Dedup.shingles(col(textCol)), k)
    // band hash = md5 of "|"-joined signature slice + band id — the exact
    // string minhashLshPairs builds from its h$i columns (q23 oracle)
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band_id"),
        md5(concat_ws("|", ((b * rows) until ((b + 1) * rows))
          .map(i => element_at(col("sig"), i + 1)) :+ lit(b): _*))
          .as("band_hash"))
    }
    val banded = docs.withWatermark("ts", watermark)
      .select(col("doc_id"), col("ts"), sig.as("sig"))
      .select(col("doc_id"), col("ts"),
        explode(array(bandCols: _*)).as("band"))
      .select(col("band.band_id").as("bandId"),
        col("band.band_hash").as("bandHash"),
        col("doc_id").as("docId"), col("ts"))
      .as[BandEvent]
    bucketCandidates(banded, watermark)
  }

  /** The band-bucket candidate state machine shared by the text
    * (MinHash) and image (dHash) streaming near-dup twins: a doc
    * landing in a bucket claimed within the watermark horizon emits a
    * candidate against the bucket's first claimant; buckets expire by
    * event-time timeout.
    */
  private def bucketCandidates(banded: Dataset[BandEvent],
      watermark: String): Dataset[NearDupCand] = {
    val spark = banded.sparkSession
    import spark.implicits._
    banded.groupByKey(e => (e.bandId, e.bandHash))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (key: (Int, String), events: Iterator[BandEvent],
         state: GroupState[BucketState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // arrival order within a micro-batch = event time, docId ties
            // toward the smaller id — deterministic across retries
            val evs = events.toSeq.sortBy(e => (e.ts.getTime, e.docId))
            var first = state.getOption.map(_.firstDoc)
            val out = scala.collection.mutable.ArrayBuffer.empty[NearDupCand]
            evs.foreach { e =>
              first match {
                case None => first = Some(e.docId)
                case Some(f) if f != e.docId =>
                  out += NearDupCand(e.docId, f, key._1)
                case _ => () // re-delivery of the bucket owner itself
              }
            }
            state.update(BucketState(first.get))
            // expire once the watermark passes last arrival + horizon;
            // base clamped above the current watermark (Spark rejects
            // timeout timestamps at/behind it)
            val maxTs = evs.map(_.ts.getTime).max
            state.setTimeoutTimestamp(
              math.max(maxTs, state.getCurrentWatermarkMs() + 1), watermark)
            out.iterator
          }
      }
  }

  /** Streaming PERCEPTUAL near-dup candidates — q147's twin (the
    * fourteenth): media payloads are dHash-ed in-stream through the
    * same decode seam as the batch operator and banded into the exact
    * 4 × 16-bit blocks [[graft.ext.Dedup.bandPairs64]] joins on, so an
    * image landing in a block bucket claimed within the watermark
    * horizon emits a candidate pair against the bucket's first
    * claimant. Candidates carry ids only; the exact Hamming residual
    * is downstream's business (the batch contract). Same bounded-state
    * guarantee as [[streamingNearDupCandidates]]: one entry per live
    * bucket inside the horizon, expired by event-time timeout.
    */
  def streamingPhashCandidates(media: DataFrame,
      watermark: String = "1 hour"): Dataset[NearDupCand] =
    sig64Candidates(media, watermark, graft.ext.Multimodal.dHash64)

  /** Streaming AUDIO near-dup candidates — q154's twin (the
    * fifteenth): payloads fingerprint in-stream through the same
    * RIFF/PCM seam as the batch operator
    * ([[graft.ext.Multimodal.audioFingerprint64]] — container
    * re-encodes keep the fingerprint) and band into the exact 4×16-bit
    * blocks [[graft.ext.Dedup.bandPairs64]] joins on. Identical
    * bounded-state guarantee to [[streamingPhashCandidates]].
    */
  def streamingAfpCandidates(media: DataFrame,
      watermark: String = "1 hour"): Dataset[NearDupCand] =
    sig64Candidates(media, watermark,
      graft.ext.Multimodal.audioFingerprint64)

  /** Shared 64-bit-signature banding for the perceptual twins: hash
    * each payload with `sig64` inside the partition map, explode into
    * the 4 × 16-bit Manku blocks, bucket within the watermark horizon.
    */
  private def sig64Candidates(media: DataFrame, watermark: String,
      sig64: Array[Byte] => Long): Dataset[NearDupCand] = {
    val spark = media.sparkSession
    import spark.implicits._
    val hashed = media
      .select(col("doc_id"), col("ts"), col("media"))
      .as[(Long, java.sql.Timestamp, Array[Byte])]
      .map { case (id, ts, m) => (id, ts, sig64(m)) }
      .toDF("doc_id", "ts", "sig")
      .withWatermark("ts", watermark)
    val bandCols = (0 until 4).map { b =>
      struct(lit(b).as("band_id"),
        (shiftright(col("sig"), 16 * b) bitwiseAND lit(0xffffL))
          .cast("string").as("band_hash"))
    }
    val banded = hashed
      .select(col("doc_id"), col("ts"),
        explode(array(bandCols: _*)).as("band"))
      .select(col("band.band_id").as("bandId"),
        col("band.band_hash").as("bandHash"),
        col("doc_id").as("docId"), col("ts"))
      .as[BandEvent]
    bucketCandidates(banded, watermark)
  }

  /** Keyed sketch state for the W2/M1/M2 change score: one group per
    * stream (key), state = the trailing `backWs` sketch vectors.
    */
  final case class SketchEvent(key: Long, wid: Long, sketch: Array[Double])
  final case class SketchState(wids: List[Long],
                               sketches: List[Array[Double]])
  final case class ChangeScore(key: Long, wid: Long, changeScore: Double)

  /** The streaming change-score operator: consumes per-window sketch
    * vectors (in wid order within each key) and emits the cosine distance
    * between the current sketch and the |principal direction| of the
    * trailing frame [wid−backWs, wid−2] — the exact batch semantics of
    * AaAr.changeScores (`/root/reference/AA-AR.py:234-241`), as
    * incremental state instead of a window frame.
    */
  def changeScores(sketches: Dataset[SketchEvent], backWs: Int = 4)
      : Dataset[ChangeScore] = {
    val spark = sketches.sparkSession
    import spark.implicits._

    def scoreOne(frame: Seq[Array[Double]], cur: Array[Double]): Double = {
      // same fixed-fold power iteration as the batch twin (AaAr
      // .changeScores → PowerDirection) so a stream replay and the batch
      // job agree bit-for-bit on each window's direction
      val ev = graft.ml.PowerDirection.principalAbs(frame.toArray)
      val evSum = ev.sum
      val skSum = cur.sum
      if (evSum == 0.0 || skSum == 0.0) 0.0
      else {
        val evn = ev.map(_ / evSum)
        val skn = cur.map(_ / skSum)
        val dot = evn.zip(skn).map { case (a, b) => a * b }.sum
        val na = math.sqrt(evn.map(x => x * x).sum)
        val nb = math.sqrt(skn.map(x => x * x).sum)
        if (na == 0.0 || nb == 0.0) 0.0 else 1.0 - dot / (na * nb)
      }
    }

    sketches.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (key: Long, events: Iterator[SketchEvent],
         state: GroupState[SketchState]) =>
          val prev = state.getOption.getOrElse(SketchState(Nil, Nil))
          var wids = prev.wids
          var sks = prev.sketches
          val out = scala.collection.mutable.ArrayBuffer.empty[ChangeScore]
          events.toSeq.sortBy(_.wid).foreach { ev =>
            // frame = sketches at [wid−backWs, wid−2]: all buffered except
            // the immediately-previous window (the reference excludes i−1)
            val frame = wids.zip(sks)
              .filter { case (w, _) => w >= ev.wid - backWs && w <= ev.wid - 2 }
              .map(_._2)
            if (frame.size == backWs - 1)
              out += ChangeScore(key, ev.wid, scoreOne(frame, ev.sketch))
            wids = (wids :+ ev.wid).takeRight(backWs)
            sks = (sks :+ ev.sketch).takeRight(backWs)
          }
          state.update(SketchState(wids, sks))
          out.iterator
      }
  }

  /** Streaming interval (point-in-range) join — the streaming twin of
    * [[graft.ops.Relational.intervalJoin]]: a stream of points matched
    * against a stream of intervals whose closed `[startCol, endCol]`
    * contains each point's `pointTs` ("which open sessions cover this
    * event"), with out-of-order arrivals on both sides correct inside
    * the watermark horizon.
    *
    * Same distributed shape as batch — never a nested-loop range join:
    * each point maps to ONE `bucketSeconds` time bin, each interval
    * replicates to the bins it covers, and the stream-stream join is
    * EQUI on the bin with the exact range predicate as a residual. The
    * bin key also partitions the JOIN STATE, so per-key state stores
    * only intervals near that slice of time.
    *
    * State is BOUNDED, which is why `maxIntervalSeconds` is required:
    * Spark prunes stream-stream join state from time-range conditions
    * between the two WATERMARKED event-time columns, so the join carries
    * `point.ts ∈ [interval.start, interval.start + maxIntervalSeconds]`
    * alongside the exact `[start, end]` residual. Intervals are
    * effectively clamped to `maxIntervalSeconds` (a longer interval
    * stops matching points past start + max — the explicit contract that
    * keeps an unbounded stream's state finite; size it to the longest
    * session you accept to track).
    *
    * Both inputs need TIMESTAMP event-time columns (`pointTs`; `startCol`
    * — the interval's watermark anchor) and caller-distinct column names.
    * Inner-join semantics, Append-mode safe.
    */
  def streamingIntervalJoin(points: DataFrame, pointTs: String,
                            intervals: DataFrame, startCol: String,
                            endCol: String, maxIntervalSeconds: Long,
                            bucketSeconds: Long = 3600L,
                            watermark: String = "1 hour"): DataFrame = {
    import graft.ops.Relational.epochSeconds
    // loud contract, not a silent truncation: a non-divisible combination
    // would clamp the replication one bin off the stated start+max horizon
    // (round-8 advice — the repo's no-silent-caps discipline)
    require(maxIntervalSeconds % bucketSeconds == 0,
      s"maxIntervalSeconds ($maxIntervalSeconds) must be a multiple of " +
        s"bucketSeconds ($bucketSeconds)")
    val pw = points.withWatermark(pointTs, watermark)
    val pb = pw.withColumn("__pb",
      floor(epochSeconds(pw, pointTs) / bucketSeconds).cast("long"))
    val iw = intervals.withWatermark(startCol, watermark)
    val startB = floor(epochSeconds(iw, startCol) / bucketSeconds)
      .cast("long")
    val ib = iw.withColumn("__ib", explode(sequence(startB,
      // clamp replication to the state horizon: past start+max no point
      // can match anyway (the residual below drops it)
      least(floor(epochSeconds(iw, endCol) / bucketSeconds).cast("long"),
        startB + maxIntervalSeconds / bucketSeconds + 1L))))
    pb.join(ib,
        pb("__pb") === ib("__ib") &&
          pb(pointTs) >= ib(startCol) && pb(pointTs) <= ib(endCol) &&
          pb(pointTs) <= ib(startCol) +
            expr(s"INTERVAL $maxIntervalSeconds SECOND"))
      .drop("__pb", "__ib")
  }

  /** Streaming interval-OVERLAP join — the streaming twin of
    * [[graft.ops.Relational.overlapJoin]]: two interval streams, every
    * pair whose closed ranges intersect ("which sessions ran during this
    * outage", live), out-of-order arrivals on both sides correct inside
    * the watermark horizon.
    *
    * Same shape as [[streamingIntervalJoin]] — both sides replicate to
    * `bucketSeconds` bins, the stream-stream join is EQUI on the bin —
    * plus the batch operator's exactly-once residual: an overlapping
    * pair meets in every shared bin, so only the FIRST shared bin
    * (max of the two start bins) emits, with no dedup state beyond the
    * join's own.
    *
    * `maxIntervalSeconds` bounds state exactly as in the interval join,
    * but symmetrically: both `start` columns are watermark anchors and
    * the join carries `|l.start − r.start| ≤ max` (implied by overlap
    * under clamped lengths) as time-range conditions BETWEEN the two
    * watermarked columns, so Spark prunes both state stores; interval
    * replication also clamps to the same horizon. Intervals longer than
    * `max` stop matching partners past `start + max` — the finite-state
    * contract, size it to the longest interval you accept to track.
    *
    * Inputs need TIMESTAMP start/end columns and caller-distinct column
    * names. Inner-join semantics, Append-mode safe.
    */
  def streamingOverlapJoin(left: DataFrame, lStart: String, lEnd: String,
                           right: DataFrame, rStart: String, rEnd: String,
                           maxIntervalSeconds: Long,
                           bucketSeconds: Long = 3600L,
                           watermark: String = "1 hour"): DataFrame = {
    import graft.ops.Relational.epochSeconds
    // same divisibility contract as streamingIntervalJoin (see there)
    require(maxIntervalSeconds % bucketSeconds == 0,
      s"maxIntervalSeconds ($maxIntervalSeconds) must be a multiple of " +
        s"bucketSeconds ($bucketSeconds)")
    val maxBins = maxIntervalSeconds / bucketSeconds + 1L
    val lw = left.withWatermark(lStart, watermark)
    val lb = lw
      .withColumn("__b0l",
        floor(epochSeconds(lw, lStart) / bucketSeconds).cast("long"))
      .withColumn("__lb", explode(sequence(col("__b0l"),
        least(floor(epochSeconds(lw, lEnd) / bucketSeconds).cast("long"),
          col("__b0l") + maxBins))))
    val rw = right.withWatermark(rStart, watermark)
    val rb = rw
      .withColumn("__b0r",
        floor(epochSeconds(rw, rStart) / bucketSeconds).cast("long"))
      .withColumn("__rb", explode(sequence(col("__b0r"),
        least(floor(epochSeconds(rw, rEnd) / bucketSeconds).cast("long"),
          col("__b0r") + maxBins))))
    val horizon = expr(s"INTERVAL $maxIntervalSeconds SECOND")
    lb.join(rb,
        lb("__lb") === rb("__rb") &&
          lb("__lb") === greatest(lb("__b0l"), rb("__b0r")) &&
          lb(lStart) <= rb(rEnd) && rb(rStart) <= lb(lEnd) &&
          // state-pruning range conditions between the two WATERMARKED
          // event-time columns (both directions → both stores bounded)
          rb(rStart) <= lb(lStart) + horizon &&
          lb(lStart) <= rb(rStart) + horizon)
      .drop("__lb", "__rb", "__b0l", "__b0r")
  }

  final case class AsofIn(key: Long, ts: java.sql.Timestamp, side: Int,
                          value: Double)
  final case class AsofHist(ts: List[Long], values: List[Double])
  final case class AsofOut(key: Long, ts: java.sql.Timestamp,
                           asofTs: Option[Long], asofValue: Option[Double])

  /** Streaming as-of join — the streaming twin of
    * [[graft.ops.Relational.asofJoin]]: a stream of query points
    * matched against a stream of per-key updates ("latest quote as of
    * this trade", "config version as of this request"), both event-time
    * ordered. For each point, emit the update of the same key with the
    * largest update-ts ≤ point-ts, or none if no update precedes it.
    *
    * State per key is the update HISTORY inside the watermark horizon,
    * not just the latest value, so a point arriving out of order within
    * the horizon still matches the update that was current AT ITS event
    * time (the batch operator's semantics), never a newer one. History
    * is pruned at every batch: entries older than the watermark
    * collapse to the single newest among them (the floor any surviving
    * point could still need) — bounded state, exact within the horizon,
    * the same guarantee [[streamingDedup]] gives re-deliveries.
    *
    * `points` and `updates` need (key, ts[, value]) columns; both get
    * the same watermark. Output is Append-mode safe.
    */
  def streamingAsof(points: DataFrame, updates: DataFrame,
                    watermark: String = "1 hour"): Dataset[AsofOut] = {
    val spark = points.sparkSession
    import spark.implicits._
    val u = updates.withWatermark("ts", watermark)
      .select(col("key"), col("ts"), lit(0).as("side"),
        col("value").cast("double").as("value")).as[AsofIn]
    val p = points.withWatermark("ts", watermark)
      .select(col("key"), col("ts"), lit(1).as("side"),
        lit(0.0).as("value")).as[AsofIn]
    u.union(p).groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        (key: Long, events: Iterator[AsofIn],
         state: GroupState[AsofHist]) =>
          val prev = state.getOption.getOrElse(AsofHist(Nil, Nil))
          var hist = prev.ts.zip(prev.values)
          val out = scala.collection.mutable.ArrayBuffer.empty[AsofOut]
          // updates before points at equal (ts): inclusive ≤ boundary,
          // matching the batch operator's side ordering
          events.toSeq.sortBy(e => (e.ts.getTime, e.side)).foreach { e =>
            if (e.side == 0) {
              // insert in ts order (batches may interleave histories)
              hist = (hist :+ (e.ts.getTime -> e.value)).sortBy(_._1)
            } else {
              val m = hist.filter(_._1 <= e.ts.getTime).lastOption
              out += AsofOut(key, e.ts, m.map(_._1), m.map(_._2))
            }
          }
          // prune: everything older than the watermark collapses to its
          // newest member — the floor for any in-horizon late point
          val wm = state.getCurrentWatermarkMs()
          val (old, live) = hist.partition(_._1 < wm)
          hist = old.takeRight(1) ++ live
          state.update(AsofHist(hist.map(_._1), hist.map(_._2)))
          out.iterator
      }
  }

  /** One event of the streaming CDC-snapshot input. */
  final case class SnapEvent(userId: Long, eventId: Long,
                             ts: java.sql.Timestamp, eventType: String,
                             value: Double)
  /** Per-key winner state: the (ts, eventId)-max row seen so far. */
  final case class SnapState(tsMs: Long, eventId: Long,
                             eventType: String, value: Double)
  /** One emitted snapshot row (the key's new current version). */
  final case class SnapOut(userId: Long, lastTs: java.sql.Timestamp,
                           lastEventId: Long, lastEventType: String,
                           lastValue: Double)

  /** Streaming CDC latest-snapshot — the streaming twin of
    * [[graft.ops.TimeSeries.latestSnapshot]] (q104) and the read-side
    * pair of the q111 copy-on-write merge: an append-only event stream
    * compacted to one current row per key, emitted as an UPSERT stream
    * (a row appears exactly when its key's winner changes — the shape
    * that feeds a compacted topic or a MERGE sink).
    *
    * State is one row per live key — the compacted table itself, the
    * same by-construction bound a production materialized upsert view
    * pays (NOT windowed history; a watermark would be wrong here since
    * an arbitrarily late event can still lose to the current winner by
    * (ts, event_id) order, and winning late events are the point of
    * CDC). Update output mode; after draining, the latest emitted row
    * per key equals the batch snapshot row-for-row (StreamOpsSpec pins
    * it, including a late-arrival loser that must NOT re-emit).
    */
  def streamingSnapshot(events: DataFrame): Dataset[SnapOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").as("userId"), col("event_id").as("eventId"),
        col("ts"), col("event_type").as("eventType"),
        col("value").cast("double").as("value"))
      .as[SnapEvent]
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (uid: Long, evs: Iterator[SnapEvent],
         state: GroupState[SnapState]) =>
          val prev = state.getOption
          var best = prev
          evs.foreach { e =>
            val better = best.forall(b =>
              e.ts.getTime > b.tsMs ||
                (e.ts.getTime == b.tsMs && e.eventId > b.eventId))
            if (better)
              best = Some(SnapState(e.ts.getTime, e.eventId,
                e.eventType, e.value))
          }
          if (best != prev) {
            val b = best.get
            state.update(b)
            Iterator.single(SnapOut(uid,
              new java.sql.Timestamp(b.tsMs), b.eventId, b.eventType,
              b.value))
          } else Iterator.empty
      }
  }

  /** One event of the streaming moving-average input. */
  final case class MaEvent(userId: Long, eventId: Long,
                           ts: java.sql.Timestamp, value: Double)
  /** Per-key frame history: parallel (epoch-second, value) columns. */
  final case class MaHist(tss: Seq[Long], values: Seq[Double])
  /** One emitted moving-average row. */
  final case class MaOut(userId: Long, eventId: Long,
                         ts: java.sql.Timestamp, nFrame: Long,
                         avg1h: Double)

  /** Streaming trailing RANGE-frame moving average — the q108
    * operator's streaming twin: each event emits its mean value over
    * the preceding `frameSeconds` of its key's OWN timeline.
    *
    * State is BOUNDED by the watermark + frame horizon: per key only
    * events with ts ≥ (watermark − frame) are retained (an in-horizon
    * late event still finds its full frame), everything older is
    * dropped — state tracks the horizon, not the stream's lifetime.
    *
    * Contract (loud, like the interval twin's divisibility note): the
    * emit-on-arrival frame equals the batch q108 frame when events
    * arrive in event-time order per key (the common ingest shape; the
    * spec pins batch equality on it). An out-of-order event still gets
    * ITS OWN frame right (history is consulted by event time), but an
    * EARLIER-arrived later event has already emitted without it —
    * streaming append mode cannot retract.
    */
  def streamingMovingAvg(events: DataFrame, frameSeconds: Long = 3600L,
                         watermark: String = "1 hour")
      : Dataset[MaOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", watermark)
      .select(col("user_id").as("userId"), col("event_id").as("eventId"),
        col("ts"), col("value").cast("double").as("value"))
      .as[MaEvent]
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, evs: Iterator[MaEvent], state: GroupState[MaHist]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val prev = state.getOption.getOrElse(MaHist(Nil, Nil))
            // ts-sorted parallel arrays; frame bounds by binary search —
            // O(log n + frame) per event where a full-history filter is
            // O(batch) per event, O(batch²) per key per micro-batch
            // (measured 5× on StreamBench's 10k-events-per-key batches).
            // The frame SUM stays a fresh ascending-order pass over the
            // slice, so the arithmetic — set and order — is bit-identical
            // to the naive filter (and to the batch RANGE frame).
            val tss = scala.collection.mutable.ArrayBuffer(prev.tss: _*)
            val vals = scala.collection.mutable.ArrayBuffer(
              prev.values: _*)
            // first index with tss(i) >= t
            def lowerBound(t: Long): Int = {
              var lo = 0; var hi = tss.length
              while (lo < hi) {
                val mid = (lo + hi) >>> 1
                if (tss(mid) < t) lo = mid + 1 else hi = mid
              }
              lo
            }
            // first index with tss(i) > t
            def upperBound(t: Long): Int = {
              var lo = 0; var hi = tss.length
              while (lo < hi) {
                val mid = (lo + hi) >>> 1
                if (tss(mid) <= t) lo = mid + 1 else hi = mid
              }
              lo
            }
            val out = evs.toSeq.sortBy(e => (e.ts.getTime, e.eventId))
              .map { e =>
                val t = e.ts.getTime / 1000
                val ins = if (tss.isEmpty || t >= tss.last) tss.length
                  else upperBound(t)
                tss.insert(ins, t)
                vals.insert(ins, e.value)
                val lo = lowerBound(t - frameSeconds)
                val hi = upperBound(t)
                var sum = 0.0
                var i = lo
                while (i < hi) { sum += vals(i); i += 1 }
                // round exactly as the batch twin's round(avg, 6) —
                // BigDecimal HALF_UP is Spark's Round semantics for
                // doubles — so emitted rows match the q108 face
                // byte-for-byte, not just up to re-rounding
                val avg = BigDecimal.valueOf(sum / (hi - lo))
                  .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
                  .toDouble
                MaOut(uid, e.eventId, e.ts, hi - lo, avg)
              }
            // prune to the late-arrival horizon: an in-horizon event's
            // ts can be as old as the watermark, and its frame reaches
            // frameSeconds further back
            val wmSec = state.getCurrentWatermarkMs() / 1000
            val cut = lowerBound(wmSec - frameSeconds)
            val keptTs = tss.drop(cut).toSeq
            state.update(MaHist(keptTs, vals.drop(cut).toSeq))
            // expire the key once the watermark passes its newest event
            // + frame (clamped above the current watermark — Spark
            // rejects timeouts at/behind it)
            val maxMs = (keptTs.lastOption.getOrElse(wmSec) +
              frameSeconds) * 1000
            state.setTimeoutTimestamp(
              math.max(maxMs, state.getCurrentWatermarkMs() + 1))
            out.iterator
          }
      }
  }

  /** Streaming HyperLogLog registers: the streaming twin of
    * Sketches.hllDistinct (q93). The register table — (group, register)
    * → max rank — IS the streaming state, and it is bounded BY THE
    * SKETCH'S CONSTRUCTION at m=256 rows per group forever, no watermark
    * needed: this is the rare stateful aggregation whose state cannot
    * grow with the stream (a streaming `count(distinct)` would hold every
    * key). Registers use the IDENTICAL hash arithmetic as the batch
    * operator ([[graft.ext.Sketches.hllRegisterCols]]), so a streamed
    * register table equals the batch one on the same data row-for-row
    * (StreamOpsSpec pins it) and
    * [[graft.ext.Sketches.hllEstimateFromRegisters]] reads either.
    * Update output mode: each micro-batch emits only registers that
    * grew.
    */
  def streamingHllRegisters(rows: DataFrame, keyCol: String,
      groupCol: String, tag: String = "hll"): DataFrame = {
    val (j, rank) = graft.ext.Sketches.hllRegisterCols(col(keyCol), tag)
    rows.filter(col(keyCol).isNotNull) // the batch operator's null contract
      .select(col(groupCol).as("g0"), j.as("j"), rank.as("rank"))
      .groupBy(col("g0"), col("j"))
      .agg(max(col("rank")).as("mj"))
  }

  /** Streaming Count-Min grid: the q94 sketch's streaming rebind, same
    * contract as [[streamingHllRegisters]] — the d×w counter grid IS the
    * state, construction-bounded (≤ d·w cells forever) where a streaming
    * per-key count would hold every key. Cells use the batch operator's
    * exact bucket expressions ([[graft.ext.Sketches.cmGrid]]), so a
    * drained stream's latest cells equal the batch grid cell-for-cell
    * and any batch probe reads either (StreamOpsSpec pins it). Update
    * output mode.
    */
  def streamingCmGrid(rows: DataFrame, keyCol: String,
      width: Int = graft.ext.Sketches.CmWidth): DataFrame =
    graft.ext.Sketches.cmGrid(rows, keyCol, width)

  /** Streaming dyadic-CM grid: the q98 quantile sketch's streaming
    * rebind, same construction-bounded-state contract as
    * [[streamingCmGrid]] — ≤ L·d·w (4352) cells forever, where a
    * streaming percentile would otherwise hold the full value
    * distribution. Cells use the batch operator's exact level/bucket
    * expressions ([[graft.ext.Sketches.dcmGrid]]), so a drained
    * stream's cells equal the batch grid and the q98 probe side
    * (prefix decomposition + targets) reads either (StreamOpsSpec pins
    * equality). Update/complete output.
    */
  def streamingDcmGrid(values: DataFrame, valueCol: String,
      width: Int = graft.ext.Sketches.DcmWidth): DataFrame =
    graft.ext.Sketches.dcmGrid(
      graft.ext.Sketches.dcmClamp(values, valueCol), width)

  /** One changelog record (Debezium shape: op ∈ {I,U,D}, a per-key
    * sequence, the payload; D rows may carry a bare key).
    */
  final case class ClogEvent(eventId: Long, op: String, seq: Long,
      ts: Option[java.sql.Timestamp], userId: Option[Long],
      eventType: Option[String], value: Option[Double])
  /** Per-key winner state: the (seq, op)-max record seen so far. */
  final case class ClogState(seq: Long, op: String, tsMs: Option[Long],
      userId: Option[Long], eventType: Option[String],
      value: Option[Double])
  /** One emitted apply row: `op` is normalized to U (upsert the
    * payload) or D (tombstone the key).
    */
  final case class ClogOut(eventId: Long, op: String, seq: Long,
      ts: Option[java.sql.Timestamp], userId: Option[Long],
      eventType: Option[String], value: Option[Double])

  /** Streaming CDC changelog apply — the streaming twin of
    * [[graft.ops.Cow.applyChangelog]] (q139), completing the
    * batch/stream pairing for the write-side family: a Debezium-shaped
    * I/U/D stream reduced last-writer-wins per key, emitted as an
    * upsert/tombstone changelog. Applying the latest emitted row per
    * key to a base table gives exactly the batch apply of the
    * accumulated log (StreamOpsSpec pins it).
    *
    * Ordering contract is the batch operator's window verbatim
    * (`ORDER BY seq DESC, op DESC`): a record replaces the state iff
    * its (seq, op) is strictly greater lexicographically — a stale
    * late record (lower seq) neither emits nor disturbs the state,
    * and a D tombstone REMEMBERS its seq so an older upsert arriving
    * after it cannot resurrect the key. Records tying on (seq, op)
    * with different payloads are caller error in both engines (the
    * batch row_number breaks such ties arbitrarily).
    *
    * State is one record per live key plus one tombstone per deleted
    * key — the compacted changelog itself, the same bound a compacted
    * topic pays (a production deployment expires tombstones after a
    * retention horizon; no watermark is used here since arbitrarily
    * late WINNING records are the point of CDC). Update output mode.
    */
  /** One keyed snapshot row tagged with its side (`a` = the old
    * snapshot stream, `b` = the new).
    */
  final case class SnapRow(eventId: Long, side: String,
      ts: java.sql.Timestamp, userId: Option[Long],
      eventType: Option[String], value: Option[Double])
  final case class SnapSide(tsMs: Long, userId: Option[Long],
      eventType: Option[String], value: Option[Double])
  /** Half-join state: the side(s) of a key seen so far. */
  final case class CdcPairState(a: Option[SnapSide], b: Option[SnapSide])
  /** One minimal-feed row: I (new key, payload), U (changed key, new
    * payload), D (vanished key, bare).
    */
  final case class CdcOut(op: String, eventId: Long,
      userId: Option[Long], eventType: Option[String],
      value: Option[Double])

  /** Streaming CDC EXTRACT — the thirteenth twin, completing the
    * extract/apply streaming pair ([[streamingChangelog]] applies a
    * changelog; this PRODUCES one): two keyed snapshot streams diff
    * into the minimal I/U/D feed, the streaming rebind of
    * [[graft.ops.TimeSeries.cdcExtract]] (q142).
    *
    * A symmetric hand-rolled stream-stream join via
    * flatMapGroupsWithState: a key whose two sides meet emits its
    * verdict IMMEDIATELY (U on any payload change, nothing when equal —
    * unchanged keys never travel downstream, the q142 contract) and
    * clears its state; a key still half-joined when the event-time
    * horizon passes its row is finalized by state timeout — only-a ⇒ D
    * (vanished key, bare tombstone), only-b ⇒ I. State is therefore
    * bounded by the keys in flight inside the watermark horizon (the
    * snapshot DELTA, not the snapshot), and every entry expires —
    * exactly the discipline Spark's built-in outer stream-stream join
    * enforces, hand-rolled here because the verdict needs the
    * three-way I/U/D classification, not padded nulls.
    *
    * StreamOpsSpec pins drained-stream equality against the batch
    * `cdcExtract`. Append output mode.
    */
  def streamingCdcExtract(oldSnap: DataFrame, newSnap: DataFrame,
      horizonMs: Long = 600000L): Dataset[CdcOut] = {
    val spark = oldSnap.sparkSession
    import spark.implicits._
    val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
    def tagged(df: DataFrame, side: String) =
      df.select(cols.map(col): _*).withColumn("side", lit(side))
    tagged(oldSnap, "a").unionByName(tagged(newSnap, "b"))
      .withWatermark("ts", s"${horizonMs / 1000} seconds")
      .select(col("event_id").as("eventId"), col("side"), col("ts"),
        col("user_id").as("userId"), col("event_type").as("eventType"),
        col("value").cast("double").as("value"))
      .as[SnapRow]
      .groupByKey(_.eventId)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (key: Long, evs: Iterator[SnapRow],
         state: GroupState[CdcPairState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            (s.a, s.b) match {
              case (Some(_), None) =>
                Iterator.single(CdcOut("D", key, None, None, None))
              case (None, Some(b)) =>
                Iterator.single(CdcOut("I", key, b.userId, b.eventType,
                  b.value))
              case _ => Iterator.empty
            }
          } else {
            var s = state.getOption.getOrElse(CdcPairState(None, None))
            var maxTs = 0L
            evs.foreach { e =>
              val sd = SnapSide(e.ts.getTime, e.userId, e.eventType,
                e.value)
              maxTs = math.max(maxTs, sd.tsMs)
              s = if (e.side == "a") s.copy(a = Some(sd))
                else s.copy(b = Some(sd))
            }
            (s.a, s.b) match {
              case (Some(a), Some(b)) =>
                state.remove()
                if (a.userId == b.userId && a.eventType == b.eventType &&
                  a.value == b.value) Iterator.empty
                else Iterator.single(CdcOut("U", key, b.userId,
                  b.eventType, b.value))
              case _ =>
                state.update(s)
                // finalize once the horizon passes this key's newest
                // row; the max() keeps the timeout legal (strictly
                // beyond the current watermark) for late stragglers
                state.setTimeoutTimestamp(math.max(maxTs,
                  state.getCurrentWatermarkMs() + 1L) + horizonMs)
                Iterator.empty
            }
          }
      }
  }

  def streamingChangelog(changelog: DataFrame): Dataset[ClogOut] = {
    val spark = changelog.sparkSession
    import spark.implicits._
    changelog
      .select(col("event_id").as("eventId"), col("op"), col("seq"),
        col("ts"), col("user_id").as("userId"),
        col("event_type").as("eventType"),
        col("value").cast("double").as("value"))
      .as[ClogEvent]
      .groupByKey(_.eventId)
      .flatMapGroupsWithState(OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (key: Long, evs: Iterator[ClogEvent],
         state: GroupState[ClogState]) =>
          val prev = state.getOption
          var best = prev
          evs.foreach { e =>
            val wins = best.forall(b =>
              e.seq > b.seq || (e.seq == b.seq && e.op > b.op))
            if (wins)
              best = Some(ClogState(e.seq, e.op, e.ts.map(_.getTime),
                e.userId, e.eventType, e.value))
          }
          if (best != prev) {
            val b = best.get
            state.update(b)
            val outOp = if (b.op == "D") "D" else "U"
            Iterator.single(ClogOut(key, outOp, b.seq,
              b.tsMs.map(new java.sql.Timestamp(_)), b.userId,
              b.eventType, b.value))
          } else Iterator.empty
      }
  }
}
