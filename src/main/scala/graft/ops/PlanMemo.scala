package graft.ops

import org.apache.spark.sql.DataFrame

/** Shared seam for session-scoped memos of PERSISTED frames keyed by the
  * input plan (Linalg's dims/moment frames, BlockWindow's block-assignment
  * frame). Two jobs a naive per-call persist gets wrong over a long-lived
  * session:
  *
  *  - entries for stopped sessions are dropped eagerly (their blocks died
  *    with the context);
  *  - at the cap, eviction is OLDEST-FIRST and ONE entry at a time — a
  *    full clear under churn degenerates to rebuilding every expensive
  *    frame (e.g. the O(n·d²) PCA moment matrix) repeatedly, and yanks
  *    cached blocks out from under concurrently executing queries.
  *
  * An evicted frame mid-use by a racer only recomputes (never wrong);
  * entries are pure functions of their key. */
private[graft] object PlanMemo {

  /** Insertion order across ALL memos routed through here — eviction only
    * needs "some oldest entry", not per-map precision. Each element is
    * (map, key) erased to AnyRef so one queue serves every key type. */
  private val order =
    new java.util.concurrent.ConcurrentLinkedQueue[(AnyRef, AnyRef)]

  def memoized[K <: Product](
      memo: scala.collection.concurrent.TrieMap[K, DataFrame], cap: Int,
      key: K)(build: => DataFrame): DataFrame = {
    if (memo.size >= cap) {
      // dead sessions first (free — their storage is already gone)
      memo.keys.filter(sessionStopped).foreach(memo.remove)
      var guard = order.size
      while (memo.size >= cap && guard > 0) {
        guard -= 1
        val head = order.poll()
        if (head != null && (head._1 eq memo)) {
          memo.remove(head._2.asInstanceOf[K]).foreach { df =>
            try df.unpersist(false) catch { case _: Throwable => () }
          }
        } else if (head != null) order.add(head) // other memo's entry — recycle
      }
    }
    memo.getOrElseUpdate(key, {
      order.add((memo, key.asInstanceOf[AnyRef]))
      build
    })
  }

  /** First tuple element is the owning SparkSession by convention. */
  private def sessionStopped(key: Product): Boolean = key.productElement(0) match {
    case s: org.apache.spark.sql.SparkSession => s.sparkContext.isStopped
    case _ => false
  }
}
