package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Weighted-average UDAF over pre-scaled integer pairs (SURVEY §2.4/§2.11).
  *
  * Inputs are fixed-point longs (e.g. value in cents, weight in centi-units,
  * via [[graft.engine.Det.cents]]/`fix`), so the accumulation is exact
  * integer math — reassociation-proof and therefore identical to the
  * oracle's `SUM(v*w)/SUM(w)` regardless of partitioning. The caller divides
  * the returned cents-scale double by the weight scale and rounds.
  *
  * Scale note: the buffer is two longs; Spark plans this as an
  * ObjectHashAggregate with partial merge, so the shuffle carries one
  * 16-byte buffer per group per partition.
  */
class WAvgFix extends Aggregator[(Long, Long), (Long, Long), Double] {
  override def zero: (Long, Long) = (0L, 0L)
  override def reduce(b: (Long, Long), a: (Long, Long)): (Long, Long) =
    (b._1 + a._1 * a._2, b._2 + a._2)
  override def merge(b1: (Long, Long), b2: (Long, Long)): (Long, Long) =
    (b1._1 + b2._1, b1._2 + b2._2)
  override def finish(b: (Long, Long)): Double =
    if (b._2 == 0) Double.NaN else b._1.toDouble / b._2
  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
