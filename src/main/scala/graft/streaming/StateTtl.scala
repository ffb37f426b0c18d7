package graft.streaming

import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Shared TTL clock selection for the five flatMapGroupsWithState ops
  * (NearDedup / CdcUpsert / Crossings / Funnel / RateLimit).
  *
  * Two clocks, one at a time:
  *
  *  - `ttlMs` (r12): ProcessingTimeTimeout — evict state idle longer
  *    than the TTL in WALL-CLOCK terms. Fine for a live 24/7 ingest, but
  *    wall-clock-arbitrary under replay and backfill: reprocessing a day
  *    of events in ten minutes never fires a 1 h TTL, so the replayed
  *    run carries a different (larger) state bound than the live run —
  *    and a paused-then-resumed query can evict everything.
  *  - `eventTtlMs` (r13): EventTimeTimeout — evict a key when the query
  *    WATERMARK passes (the key's last event time + horizon). The state
  *    bound is a pure function of the DATA, so replay/backfill reproduce
  *    the live run's evictions exactly — the deployable semantics, the
  *    same clock `stream_dedup_within_wm` demonstrates engine-natively.
  *    Requires `withWatermark` on the streaming input (Spark's analyzer
  *    enforces this); each op's per-key consequence note (one-sided
  *    recall, LWW-within-horizon, …) applies with "idle > TTL" read as
  *    "watermark passed last activity + horizon".
  *
  * Both zero (the graded batch path) = NoTimeout, state kept forever,
  * outputs byte-identical to pre-TTL rounds. */
private[graft] object StateTtl {

  def conf(ttlMs: Long, eventTtlMs: Long): GroupStateTimeout = {
    require(ttlMs == 0L || eventTtlMs == 0L,
      "ttlMs (processing-time) and eventTtlMs (event-time) are exclusive")
    if (ttlMs > 0L) GroupStateTimeout.ProcessingTimeTimeout
    else if (eventTtlMs > 0L) GroupStateTimeout.EventTimeTimeout
    else GroupStateTimeout.NoTimeout
  }

  /** Arm the configured timeout after a state update. `maxTsUs` is the
    * key's max event time seen in this invocation (µs); event-time TTL
    * schedules eviction at that + horizon, clamped one past the current
    * watermark (Spark rejects a timeout at or before the watermark — a
    * key whose whole horizon is already behind the watermark is evicted
    * at the very next sweep, which is the semantics a TTL wants). The
    * watermark read throws in batch execution (no watermark exists);
    * there timeouts never fire, so the clamp is moot and skipped. */
  def arm(state: GroupState[_], ttlMs: Long, eventTtlMs: Long,
          maxTsUs: Long): Unit = {
    if (ttlMs > 0L) state.setTimeoutDuration(ttlMs)
    else if (eventTtlMs > 0L) {
      val wmFloor =
        try state.getCurrentWatermarkMs() + 1L
        catch { case _: UnsupportedOperationException => Long.MinValue }
      state.setTimeoutTimestamp(
        math.max(maxTsUs / 1000L + eventTtlMs, wmFloor))
    }
  }
}
