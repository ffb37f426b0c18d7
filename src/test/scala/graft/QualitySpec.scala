package graft

import graft.engine.Tables
import graft.ops.Sim
import graft.queries.QualityOps
import org.apache.spark.sql.functions._

/** Invariants for the corpus-quality pack (each query is oracle-verified
  * at sf0.01 by the driver; these pin the SEMANTIC contracts a refactor
  * could silently break while still hash-matching some new oracle).
  */
class QualitySpec extends SparkSpec {

  private def run(name: String) = QualityOps.queries(name)(spark, sf)

  test("rangeSearch is the threshold-filter of the exact score — no " +
    "dropped and no phantom pairs vs a brute-force recompute") {
    val emb = Tables(spark, sf, "embeddings")
    val got = Sim.rangeSearch(emb.filter(col("vec_id") % 25 === 0), emb, 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // independent exact recompute via the pairwise scorer on the same data
    val v = emb.select(col("vec_id"), Sim.asDouble(col("embedding")).as("e"))
    val probes = v.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("probe_id"), col("e").as("pe"))
    val want = v.crossJoin(probes)
      .filter(col("probe_id") =!= col("vec_id"))
      .select(col("probe_id"), col("vec_id"),
        round(Sim.cosine(col("pe"), col("e")), 4).as("sim"))
      .filter(col("sim") >= 0.25)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("soft-dedup weights: every doc keeps a weight in (0,1], cluster " +
    "members split one doc's worth of weight, corpus cardinality preserved") {
    val docs = Tables(spark, sf, "documents")
    val w = run("llm_dedup_weight").collect()
    assert(w.length == docs.count())
    assert(w.forall { r => val x = r.getDouble(1); x > 0.0 && x <= 1.0 })
    // the effective (weighted) corpus size equals #clusters + #singletons:
    // each n-member cluster contributes n * round(1/n, 4) ≈ 1
    val effective = w.map(_.getDouble(1)).sum
    val nonSingleton = w.count(_.getDouble(1) < 1.0)
    val singleton = w.length - nonSingleton
    assert(effective > singleton) // clusters contribute ~1 each, not 0
    assert(effective < w.length || nonSingleton == 0) // strictly shrinks when dups exist
    assert(nonSingleton > 0, "fixture should contain near-dup clusters")
  }

  test("boilerplate fractions are valid ratios and the flagged phrases " +
    "are genuinely frequent within their source") {
    val b = run("text_boilerplate").collect()
    assert(b.nonEmpty)
    assert(b.forall { r =>
      val f = r.getDouble(2); f >= 0.0 && f <= 1.0 && r.getInt(1) > 0
    })
    assert(b.exists(_.getDouble(2) > 0), "fixture should contain boilerplate")
  }

  test("snapshot diff classifies the planted mutations exactly") {
    val d = run("etl_snapshot_diff")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byType = d.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    // inserted keys are exactly the shifted clones
    assert(byType("I").forall(_ > 100000000L))
    // deleted keys are exactly the % 41 family
    assert(byType("D").forall(_ % 41 == 0))
    // updated keys are the % 37 family that survived deletion
    assert(byType("U").forall(k => k % 37 == 0 && k % 41 != 0))
    assert(byType.keySet == Set("I", "U", "D"))
  }

  test("quality gate keeps a strict, non-empty subset with scores >= 0.5") {
    val docs = Tables(spark, sf, "documents")
    val g = run("llm_quality_gate").collect()
    assert(g.nonEmpty && g.length < docs.count())
    assert(g.forall(_.getDouble(1) >= 0.5))
  }

  test("BPE training reproduces the reference merge walk on the classic fixture") {
    import spark.implicits._
    // Sennrich-style toy corpus: low ×3, lower ×2, newest ×1.
    // Hand walk: r1 pairs {l o:5, o w:5, w </w>:3, w e:3, e r:2, r </w>:2,
    // n e/e w/e s/s t/t </w>:1} → tie (l o, o w) at 5 → asc picks "l o";
    // r2 "lo w":5; r3 "low </w>":3; r4 tie (e r, low e, r </w>) at 2 →
    // asc picks "e r".
    val docs = Seq("low low low", "lower lower", "newest").toDF("text")
    val m = graft.ops.Bpe.trainMerges(docs, "text", 4)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(m.toSeq == Seq((1, "l o", 5L), (2, "lo w", 5L),
      (3, "low </w>", 3L), (4, "e r", 2L)))
  }

  test("BPE apply segments with the learned merges in training order") {
    import spark.implicits._
    val docs = Seq((1L, "low low low"), (2L, "lower lower"), (3L, "newest"))
      .toDF("doc_id", "text")
    // merges from the hand walk: l+o, lo+w, low+</w>, e+r
    val merges = Seq(("l", "o"), ("lo", "w"), ("low", "</w>"), ("e", "r"))
    val got = graft.ops.Bpe.applyMerges(docs, "text", "doc_id", merges)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // low → [low</w>] = 1 symbol; lower → [low, er, </w>] = 3;
    // newest → [n, e, w, e, s, t, </w>] = 7
    assert(got.toSeq == Seq((1L, 3, 3L), (2L, 2, 6L), (3L, 1, 7L)))
  }

  test("BPE merge application matches a reference greedy fold on " +
    "adversarial symbol sequences (overlaps, boundaries, repeats)") {
    import spark.implicits._
    // reference greedy left-to-right non-overlapping merge
    def ref(sym: List[String], l: String, r: String): List[String] = sym match {
      case a :: b :: rest if a == l && b == r => (l + r) :: ref(rest, l, r)
      case a :: rest => a :: ref(rest, l, r)
      case Nil => Nil
    }
    val rnd = new scala.util.Random(7)
    val alphabet = Vector("a", "b", "ab", "</w>")
    val cases = Seq.fill(60)(List.fill(1 + rnd.nextInt(9))(
      alphabet(rnd.nextInt(alphabet.length)))) ++
      Seq(List("a", "a", "a"), List("a", "a", "a", "a"), List("a"),
        List("a", "b"), List("b", "a", "a", "b"))
    val docs = cases.zipWithIndex
      .map { case (syms, i) => (i.toLong, syms.mkString(" ")) }
      .toDF("doc_id", "text")
    // the fold runs on each word's CHARACTER symbols inside applyMerges,
    // so the observable is the per-doc subword COUNT: with no merges it is
    // chars+1 per word, and under (a,a)->aa it must equal the reference
    // greedy walk's length — overlap handling ("a a a" → "aa","a") is
    // exactly what this pins
    val merges = Seq(("a", "a"))
    val got = graft.ops.Bpe.applyMerges(
        docs.select(col("doc_id"), col("text")), "text", "doc_id", Nil)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // with NO merges, subwords per word = chars + 1 (</w>); per doc = sum
    val want = cases.zipWithIndex.map { case (syms, i) =>
      i.toLong -> syms.map(w => w.length + 1).sum.toLong
    }.toMap
    assert(got == want)
    // and with the (a,a) merge, counts shrink by the reference fold over
    // each word's character symbols
    val got2 = graft.ops.Bpe.applyMerges(
        docs.select(col("doc_id"), col("text")), "text", "doc_id", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val want2 = cases.zipWithIndex.map { case (syms, i) =>
      i.toLong -> syms.map { w =>
        ref(w.split("").toList :+ "</w>", "a", "a").length.toLong
      }.sum
    }.toMap
    assert(got2 == want2)
  }

  test("BPE training stops early when the vocabulary is fully merged") {
    import spark.implicits._
    val m = graft.ops.Bpe.trainMerges(Seq("ab ab").toDF("text"), "text", 10)
      .collect()
    // "ab" → a b </w>: merges "a b" then "ab </w>" then nothing left
    assert(m.length == 2)
  }

  test("importance sample keeps roughly quality-proportional stratum fractions") {
    val got = run("llm_importance_sample").collect()
    val all = graft.engine.Tables(spark, sf, "documents").count()
    assert(got.nonEmpty && got.length < all)
    assert(got.forall(r => r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0))
  }

  test("psi drift terms are finite and buckets partition both corpora") {
    val p = run("dq_drift_psi").collect()
    assert(p.nonEmpty)
    assert(p.forall(r => !r.getDouble(3).isNaN && !r.getDouble(3).isInfinite))
    assert(p.forall(r => r.getLong(1) > 0 && r.getLong(2) > 0))
  }

  test("emb_cluster_ari: ARI is bounded above by 1, the row accounting " +
    "matches the corpus, and the bucket domain is 8-bit") {
    val r = run("emb_cluster_ari").collect().head
    assert(r.getAs[Long]("n") ===
      graft.engine.Tables(spark, sf, "embeddings").count())
    assert(r.getAs[Long]("n_buckets") >= 1L)
    assert(r.getAs[Long]("n_buckets") <= 256L)
    val ari = r.getAs[Double]("ari")
    assert(ari <= 1.0 + 1e-9, s"ARI above 1: $ari")
    // ARI below ~-0.5 is impossible for any pair of partitions
    assert(ari >= -0.5 - 1e-9, s"ARI impossibly low: $ari")
  }
}
