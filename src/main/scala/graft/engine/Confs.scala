package graft.engine

import org.apache.spark.sql.SparkSession

/** Scoped session-conf override: snapshot → set → body → restore (unset
  * keys that had no prior value). One definition for the pattern that
  * had been hand-rolled per site (r14 review: four copies, each a fresh
  * chance for a restore-ordering bug — the r13 review's tws-conf class).
  *
  * NOTE for lazy frames: the overrides apply only to work EXECUTED
  * inside `body`. A DataFrame built (but not run) inside the window
  * executes later under the restored confs — materialize inside the
  * window (cache + count, or an eager action) when the conf must govern
  * the read itself. */
object Confs {
  def withConfs[T](s: SparkSession)(kvs: (String, String)*)(body: => T): T = {
    val prev = kvs.map { case (k, _) => k -> s.conf.getOption(k) }
    kvs.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }
}
