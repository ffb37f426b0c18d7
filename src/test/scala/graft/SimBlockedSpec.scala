package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the contracts the similarity family's scale paths depend on:
  *
  *  1. in the realistic near-dup regime (tau ≥ lshEffectiveTau, duplicate
  *     pairs well above the bulk) the banded-LSH blocked path loses NOTHING
  *     versus the exhaustive twin on planted duplicates — so routing the
  *     operator default through blocking is a plan change, not a semantics
  *     change;
  *  2. blocking actually PRUNES: banded candidates stay a small fraction of
  *     all pairs (the structural scale claim, asserted on counts instead of
  *     flaky wall-clock);
  *  3. the low-tau dispatcher branch equals the exact join bit-for-bit on
  *     the graded fixtures (keeps llm_dedup_embed's all-pairs DuckDB oracle
  *     valid);
  *  4. the ANN paths (band-OR LSH, IVF cells) keep recall@5 against the
  *     brute-force oracle above a floor — an LSH refactor that silently
  *     craters recall turns these tests red even though the rows-only
  *     driver gate would stay green.
  */
class SimBlockedSpec extends SparkSpec {

  private def pairSet(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  /** Fixture embeddings + an element-wise ±30% jittered twin per vector
    * (deterministic sign sequence): cosine(orig, twin) ≈ 1/sqrt(1.09) ≈
    * 0.958, while the near-isotropic originals stay below ≈ 0.51 — the
    * bimodal dup-over-bulk shape real embedding dedup runs on. */
  private def plantedCorpus(dir: String): DataFrame = {
    val emb = engine.Tables(spark, dir, "embeddings").select("vec_id", "embedding")
    emb.unionByName(
      emb.select((col("vec_id") + 5000000L).as("vec_id"),
        transform(col("embedding"),
          (x, i) => x * (lit(1.0f) + lit(0.3f)
            * signum(sin(col("vec_id") * 31 + i)))).as("embedding")))
  }

  test("blocked near-dup equals the exhaustive twin on planted duplicates") {
    val corpus = plantedCorpus(sf)
    val blocked = pairSet(ops.Sim.nearDupPairsBlocked(corpus, tau = 0.85))
    val exact = pairSet(ops.Sim.nearDupPairsExact(corpus, tau = 0.85))
    assert(exact.size >= 400, s"degenerate planted corpus: ${exact.size} dup pairs")
    val missed = exact -- blocked
    assert(missed.isEmpty,
      s"blocking dropped ${missed.size}/${exact.size} true pairs — band-OR " +
        "recall fell below 1.0 in the regime the dispatcher routes to " +
        "banding; re-tune (bands, rowsPerBand) before shipping")
    assert(blocked == exact, "blocked path emitted spurious pairs")
  }

  test("banded candidates prune the pair space") {
    val corpus = plantedCorpus(sf)
    val n = corpus.count()
    val allPairs = n * (n - 1) / 2
    val cands = ops.Sim.bandedCandidates(corpus, 32, 8, 64).count()
    info(f"candidates: $cands of $allPairs all-pairs (${cands * 100.0 / allPairs}%.1f%%)")
    assert(cands < allPairs / 2,
      s"banding admitted $cands of $allPairs pairs — no pruning, the " +
        "blocked path would be all-pairs with extra shuffles")
  }

  test("low-tau dispatch equals the exact join on both graded fixtures") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val emb = engine.Tables(spark, dir, "embeddings")
      val dispatched = pairSet(ops.Sim.nearDupPairs(emb, tau = 0.4))
      val exact = pairSet(ops.Sim.nearDupPairsExact(emb, tau = 0.4))
      assert(exact.nonEmpty, s"degenerate fixture at $dir: no pairs above tau")
      assert(dispatched == exact,
        s"dispatcher diverged from exact semantics at $dir — " +
          "llm_dedup_embed's all-pairs oracle no longer matches")
    }
  }

  test("ANN recall@5 vs the brute-force oracle stays above the floor") {
    val dir = "/root/testdata/sf0.01"
    val emb = engine.Tables(spark, dir, "embeddings")
    val probes = emb.filter(col("vec_id") < 10)
    def topkSet(df: DataFrame): Set[(Long, Long)] =
      df.select(col("probe_id").cast("long"), col("vec_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = topkSet(ops.Sim.cosineTopK(probes, emb, k = 5))
    assert(brute.size == 50, "oracle should yield 10 probes x 5 neighbors")
    val lsh = topkSet(ops.Sim.annTopK(probes, emb, k = 5))
    val ivf = topkSet(ops.Sim.ivfTopK(probes, emb, k = 5))
    val lshRecall = (lsh & brute).size.toDouble / brute.size
    val ivfRecall = (ivf & brute).size.toDouble / brute.size
    info(f"recall@5: lsh=$lshRecall%.2f ivf=$ivfRecall%.2f")
    // The fixtures are near-isotropic (true top-5 neighbors sit at cosine
    // ~0.3–0.5, barely above the bulk) — the hardest possible geometry for
    // partition-based ANN, so the floor is 0.6 here; clustered production
    // embeddings separate far more sharply.
    assert(lshRecall >= 0.6, f"LSH ANN recall@5 $lshRecall%.2f < 0.6")
    assert(ivfRecall >= 0.6, f"IVF ANN recall@5 $ivfRecall%.2f < 0.6")
  }
}
