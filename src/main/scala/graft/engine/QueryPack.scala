package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable

/** Registry a query category extends: each graded operator registers a
  * named DataFrame builder plus (usually) the equivalent DuckDB oracle SQL.
  * `SparkEntry` aggregates all packs into the driver contract.
  */
trait QueryPack {
  type Q = (SparkSession, String) => DataFrame

  private val reg = mutable.LinkedHashMap.empty[String, (Q, Option[String])]

  /** Register an oracle-backed graded query. */
  protected def q(name: String, oracle: String)(f: Q): Unit =
    reg(name) = (f, Some(oracle.stripMargin.trim))

  /** Register a declared query with no SQL-expressible oracle
    * (driver records a weaker rows-only check). */
  protected def qNo(name: String)(f: Q): Unit = reg(name) = (f, None)

  def queries: Map[String, Q] = reg.view.mapValues(_._1).toMap
  def oracles: Map[String, String] =
    reg.collect { case (k, (_, Some(o))) => k -> o }.toMap
  def names: Seq[String] = reg.keys.toSeq
}
