package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed linear algebra over embedding columns — Lloyd k-means and
  * power-iteration PCA — in the cross-engine-deterministic fixed-point
  * style (SURVEY §5.4): every value that crosses an aggregation boundary
  * is an exact BIGINT; every per-row double expression is an identical
  * IEEE tree in the DuckDB oracles that grade the query-pack wrappers.
  *
  * Scale shapes (100 TB): both operators reduce the corpus once per round
  * to O(k·d) / O(d²) frames that BROADCAST — no round ever joins the
  * corpus against anything larger than those. k-means rounds are one
  * broadcast join + an id-partitioned argmin window + a (cid, dim) mean
  * shuffle; PCA pays one self-join on the vector id to build the d²
  * moment matrix (O(n·d²) work — the algorithm's own cost), after which
  * every round touches only d²-row frames, corpus-size-independent.
  */
object Linalg {

  /** Memo of the persisted frames, keyed by (session, input-plan
    * semantic hash, params) — the same seam as engine/Tables: emb_kmeans,
    * emb_pca_power, and emb_whiten all read the same corpus in one
    * Verify/Bench session, and without the memo each graded query would
    * re-explode and (for the PCA pair) re-build the O(n·d²) moment matrix
    * from scratch. Entries are pure functions of their key; worst-case
    * race cost is one redundant persist, never a wrong result. */
  private val memo = scala.collection.concurrent.TrieMap
    .empty[(org.apache.spark.sql.SparkSession, Int, String), DataFrame]
  private val memoCap = 64
  private def memoized(emb: DataFrame, tag: String)(build: => DataFrame): DataFrame =
    PlanMemo.memoized(memo, memoCap,
      (emb.sparkSession, emb.queryExecution.logical.semanticHash(), tag))(build)

  /** Per-dimension explode of a vector column: (id, dim (1-based, to
    * match DuckDB's generate_subscripts), e as double). Persisted — every
    * caller reads it at least twice. */
  def dims(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    memoized(emb, s"dims|$idCol|$vecCol") {
      emb.select(col(idCol).as("vec_id"),
          posexplode(col(vecCol)).as(Seq("dim", "e")))
        .select(col("vec_id"), (col("dim") + 1).as("dim"),
          col("e").cast("double").as("e"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    }

  /** Lloyd k-means assignment after `iters` rounds, seeded with the k
    * lowest ids (no RNG). Distances are Σ floor((e−m)²·10⁸) exact BIGINTs
    * (argmin with cid tiebreak is integer-deterministic); recomputed
    * centroids quantize to 6 dp via integer means so every round's inputs
    * are bit-identical cross-engine. Returns (vec_id, cid, d2) with d2 in
    * 1e-8 units against the LAST round's centroids. */
  def kmeansAssign(emb: DataFrame, idCol: String, vecCol: String,
                   k: Int, iters: Int): DataFrame =
    // memoized + persisted: the assignment is read by emb_kmeans AND the
    // centroid-outlier query in one session — the seam that already pays
    // for itself across the whiten/PCA trio
    memoized(emb, s"kmeans|$idCol|$vecCol|$k|$iters") {
      computeKmeans(emb, idCol, vecCol, k, iters)
        .persist(StorageLevel.MEMORY_AND_DISK)
    }

  private def computeKmeans(emb: DataFrame, idCol: String, vecCol: String,
                            k: Int, iters: Int): DataFrame = {
    val d = dims(emb, idCol, vecCol)
    val seeds = emb.select(col(idCol).as("cid")).orderBy("cid").limit(k)
    var cent = d.join(broadcast(seeds), d("vec_id") === seeds("cid"))
      .select(col("cid"), col("dim"), col("e").as("m"))
    var picked: DataFrame = null
    val wv = Window.partitionBy("vec_id").orderBy("d2", "cid")
    for (_ <- 1 to iters) {
      val a = d.join(broadcast(cent), "dim")
        .select(col("vec_id"), col("cid"),
          floor((col("e") - col("m")) * (col("e") - col("m")) * 100000000L
            + lit(0.5)).as("dd"))
        .groupBy("vec_id", "cid").agg(sum("dd").as("d2"))
      picked = a.withColumn("rn", row_number().over(wv))
        .filter(col("rn") === 1).select(col("vec_id"), col("cid"), col("d2"))
      cent = picked.join(d, "vec_id")
        .groupBy("cid", "dim")
        .agg((floor(sum(graft.engine.Det.fix(col("e"), 6)).cast("double")
          / count(lit(1)) + lit(0.5)) / 1000000).as("m"))
    }
    picked
  }

  /** Top principal component via `iters` power-iteration rounds over the
    * 8-dp quantized (uncentered) second-moment matrix. Matvec terms are
    * 12-dp fixed point (exact, order-independent); norm squares 14-dp
    * (|w|≲3 over 64 dims — no BIGINT overflow); the vector requantizes to
    * 6 dp per round; start = uniform 1/√d for d=64 (0.125, exactly
    * representable). Returns (loading (j, v), 1-row (nrm), dims) — dims
    * is the persisted explode, shared so projection passes reuse it. */
  def pcaTop(emb: DataFrame, idCol: String, vecCol: String, iters: Int)
  : (DataFrame, DataFrame, DataFrame) = {
    val d = dims(emb, idCol, vecCol)
    val moment = momentOf(emb, idCol, vecCol)
    val (v, lastNrm) = powerRounds(moment, d, iters)
    // the finished loading/norm are d- and 1-row frames whose lineage is
    // ~10 nested broadcast jobs; persist+memoize them so a second query
    // over the same corpus (emb_whiten after emb_pca_power) replays a
    // cache read instead of the whole round chain. Plan construction
    // above is lazy, so a memo hit costs nothing.
    val vM = memoized(emb, s"pcaV|$idCol|$vecCol|$iters")(
      v.persist(StorageLevel.MEMORY_AND_DISK))
    val nM = memoized(emb, s"pcaNrm|$idCol|$vecCol|$iters")(
      lastNrm.persist(StorageLevel.MEMORY_AND_DISK))
    (vM, nM, d)
  }

  /** 8-dp quantized (uncentered) second-moment matrix of the embedding
    * cloud as (i, j, c), memoized+persisted — the O(n·d²) pass every
    * power-iteration consumer shares. All d² products per vector come
    * from a GENERATOR CHAIN (explode i, keep the array, explode j) — a
    * narrow map with zero shuffle, where the equivalent dims⋈dims
    * self-join would shuffle the corpus twice before producing the
    * identical rows. NOT fanned: measured 9.0 s → 16.9 s with a
    * pre-explode repartition at sf0.1 — at these corpus sizes the cost is
    * the round-chain's JOB count, not single-task compute. At real corpus
    * sizes the parquet source arrives already split, so the narrow
    * explode inherits real parallelism without help. */
  private def momentOf(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    memoized(emb, s"moment|$idCol|$vecCol") {
      val nEmb = emb.groupBy().agg(count(lit(1)).as("n"))
      emb.select(col(idCol).as("vec_id"),
          posexplode(col(vecCol)).as(Seq("i0", "ei")), col(vecCol).as("arr"))
        .select((col("i0") + 1).as("i"), col("ei").cast("double").as("e"),
          posexplode(col("arr")).as(Seq("j0", "ej")))
        .select(col("i"), (col("j0") + 1).as("j"),
          floor(col("e") * col("ej").cast("double") * lit(100000000L)
            + lit(0.5)).as("p"))
        .groupBy("i", "j").agg(sum("p").as("sp"))
        .crossJoin(broadcast(nEmb))
        .select(col("i"), col("j"),
          (floor(col("sp").cast("double") / col("n") + lit(0.5))
            / lit(100000000L)).as("c"))
        .persist(StorageLevel.MEMORY_AND_DISK) // reused by every matvec round
    }

  /** The shared matvec+renormalize loop: `iters` rounds of w = C·v (12-dp
    * fixed-point terms, exact integer sums), |w| via 14-dp fixed squares,
    * v ← quantize₆(w/|w|), starting from the uniform 0.125 vector.
    * Returns (v as (j, v), last 1-row (nrm)). */
  private def powerRounds(moment: DataFrame, d: DataFrame, iters: Int)
  : (DataFrame, DataFrame) = {
    var v = d.select(col("dim").as("j")).distinct()
      .withColumn("v", lit(0.125))
    var lastNrm: DataFrame = null
    for (_ <- 1 to iters) {
      val w = moment.join(broadcast(v), "j")
        .select(col("i"),
          floor(col("c") * col("v") * lit(1000000000000L) + lit(0.5)).as("t"))
        .groupBy("i").agg(sum("t").as("sw"))
      val wi = col("sw").cast("double") / lit(1000000000000L)
      val nrm = w
        .select(floor(wi * wi * lit(100000000000000L) + lit(0.5)).as("q"))
        .groupBy()
        .agg(sqrt(sum("q").cast("double") / lit(100000000000000L)).as("nrm"))
      v = w.crossJoin(broadcast(nrm))
        .select(col("i").as("j"),
          (floor(wi / col("nrm") * lit(1000000L) + lit(0.5)) / lit(1000000L))
            .as("v"))
      lastNrm = nrm
    }
    (v, lastNrm)
  }

  /** Second principal component via Hotelling deflation: run [[pcaTop]]
    * (memo hit when the query pack already computed it this session),
    * subtract the rank-1 term λ₁·v₁v₁ᵀ from the moment matrix with λ₁
    * quantized to the same 6 dp the eigenvalue output uses and each
    * deflated cell re-quantized to the moment's 8 dp, then rerun the
    * identical power loop on the deflated matrix. Everything after the
    * memoized moment build touches only d²-row broadcast frames —
    * corpus-size-independent, like the first component. Returns
    * (loading (j, v), 1-row (nrm)). */
  def pcaSecond(emb: DataFrame, idCol: String, vecCol: String, iters: Int)
  : (DataFrame, DataFrame) = {
    val (v1, n1, d) = pcaTop(emb, idCol, vecCol, iters)
    // same memo seam as the moment matrix: the deflated build is pure in
    // (corpus, params)
    val lam = n1.select(
      (floor(col("nrm") * lit(1000000L) + lit(0.5)) / lit(1000000L)).as("l"))
    val moment = momentOf(emb, idCol, vecCol)
    val deflated = memoized(emb, s"moment2|$idCol|$vecCol|$iters") {
      moment
        .join(broadcast(v1.select(col("j").as("i"), col("v").as("vi"))), "i")
        .join(broadcast(v1.select(col("j"), col("v").as("vj"))), "j")
        .crossJoin(broadcast(lam))
        .select(col("i"), col("j"),
          (col("c") - floor(col("l") * col("vi") * col("vj") * lit(100000000L)
            + lit(0.5)) / lit(100000000L)).as("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    }
    val (v2, n2) = powerRounds(deflated, d, iters)
    (memoized(emb, s"pca2V|$idCol|$vecCol|$iters")(
        v2.persist(StorageLevel.MEMORY_AND_DISK)),
      memoized(emb, s"pca2Nrm|$idCol|$vecCol|$iters")(
        n2.persist(StorageLevel.MEMORY_AND_DISK)))
  }
}
