package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.pipelines.graph.{AllTables, GraphRegistrationContext, PipelineUpdateContextImpl, SqlGraphRegistrationContext}
import org.apache.spark.sql.pipelines.logging.PipelineEvent

/** Driver for Spark 4.1's DECLARATIVE PIPELINES engine
  * (`org.apache.spark.sql.pipelines`, the open-source SDP runtime that
  * ships in `/opt/spark/jars/spark-pipelines_2.13-4.1.2.jar`) — probed
  * r15 per the r14 verdict's ask #3: the engine is fully drivable
  * WITHOUT a Spark Connect server. Connect is only the transport for
  * the Python/CLI client; the whole execution stack — SQL registration
  * (`SqlGraphRegistrationContext.processSqlFile` parses `CREATE
  * MATERIALIZED VIEW` / `CREATE STREAMING TABLE` statements),
  * `DataflowGraph` resolution (dependency analysis across the
  * pipeline's datasets), and `PipelineExecution.runPipeline()`
  * (topological, triggered execution that materializes each dataset
  * into the session catalog) — is plain classpath code. The only
  * Connect-fenced member is `awaitCompletion` (a `private[connect]`
  * helper for the async `startPipeline` path); the synchronous
  * `runPipeline` used here blocks to completion on its own.
  *
  * Scale: each materialized view refresh is an ordinary batch write of
  * a declarative plan — everything Catalyst/AQE do for the equivalent
  * hand-run CTAS applies unchanged; the graph layer only adds
  * dependency ordering and per-flow retry, both driver-side and
  * O(|datasets|). The storage root (checkpoints for streaming tables,
  * pipeline metadata) must be a URI with a scheme (measured:
  * a bare `/tmp/...` path is rejected with PIPELINE_STORAGE_ROOT_INVALID).
  */
object Declarative {

  /** Drop `db` from the catalog AND delete its warehouse directory. The
    * session catalog is in-memory per JVM but managed-table LOCATIONS
    * persist on disk, so a `DROP DATABASE IF EXISTS` in a fresh JVM is a
    * no-op that leaves the old dirs behind and the next pipeline run
    * dies with LOCATION_ALREADY_EXISTS (measured — the exact
    * staleness class the keyed staging dirs elsewhere exist to avoid).
    * Callers run this before every pipeline so each run is a clean
    * full refresh. */
  def resetDatabase(spark: SparkSession, db: String): Unit = {
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    val wh = java.net.URI.create(spark.conf.get("spark.sql.warehouse.dir"))
    val whPath = if (wh.getScheme == null) wh.getPath
      else java.nio.file.Paths.get(wh).toString
    import scala.reflect.io.Directory
    new Directory(new java.io.File(s"$whPath/$db.db")).deleteRecursively()
    ()
  }

  /** Register the pipeline SQL, resolve the dataflow graph, and run it
    * to completion against `db` in the session catalog. Returns the
    * pipeline event-log messages (QUEUED/PLANNING/RUNNING/COMPLETED per
    * flow) for callers that pin execution structure. */
  def runSqlPipeline(spark: SparkSession, db: String, storageRoot: String,
                     sqlText: String): Seq[String] = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val reg = new GraphRegistrationContext("spark_catalog", db,
      Map.empty[String, String])
    new SqlGraphRegistrationContext(reg)
      .processSqlFile(sqlText, s"$db.sql", spark)
    val events = scala.collection.mutable.ArrayBuffer.empty[String]
    val ctx = new PipelineUpdateContextImpl(reg.toDataflowGraph,
      (e: PipelineEvent) =>
        events.synchronized { events += e.messageWithError; () },
      AllTables, AllTables, storageRoot)
    ctx.pipelineExecution.runPipeline()
    events.synchronized(events.toSeq)
  }
}
