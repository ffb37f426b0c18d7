package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the two NOVEL algorithm identities this library's
  * oracles depend on. The fixture-level oracle matches prove each identity
  * on one dataset; these drive both sides of each identity over hundreds
  * of random inputs in pure Scala (no Spark session — the identities are
  * about the algorithms, not the plans).
  *
  *  1. Isotonic regression: the closed-form minimax identity
  *     fit_i = max_{j≤i} min_{k≥i} wavg(j..k) (the relational form
  *     ml_isotonic_calibration evaluates) equals the sequential
  *     pool-adjacent-violators algorithm.
  *  2. BPE merge application: boundary-anchored string replace over
  *     DOUBLE-space-joined symbols (the BpeOracle device) equals the
  *     greedy left-to-right non-overlapping skip-flag fold
  *     (ops/Bpe.mergeFold's semantics).
  */
class IdentitySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  // --- identity 1: PAV == minimax -----------------------------------

  private def pavSequential(xs: Seq[(Long, Long)]): Seq[Double] = {
    // pools of (sum1, sumN) merged while the rate order is violated
    var pools = List.empty[(Int, Long, Long)] // (#buckets, s1, sn)
    for ((n1, nt) <- xs) {
      pools = (1, n1, nt) :: pools
      var merged = true
      while (merged && pools.lengthCompare(2) >= 0) {
        val (c2, s12, sn2) :: (c1, s11, sn1) :: rest = pools: @unchecked
        // prev rate >= next rate  ⟺  s11·sn2 >= s12·sn1 (exact integers)
        if (s11 * sn2 >= s12 * sn1)
          pools = (c1 + c2, s11 + s12, sn1 + sn2) :: rest
        else merged = false
      }
    }
    pools.reverse.flatMap { case (c, s1, sn) =>
      Seq.fill(c)(s1.toDouble / sn)
    }
  }

  private def pavMinimax(xs: Seq[(Long, Long)]): Seq[Double] = {
    val n = xs.length
    val c1 = xs.scanLeft(0L)(_ + _._1).tail
    val cn = xs.scanLeft(0L)(_ + _._2).tail
    def wavg(j: Int, k: Int): Double = {
      val s1 = c1(k) - (if (j == 0) 0L else c1(j - 1))
      val sn = cn(k) - (if (j == 0) 0L else cn(j - 1))
      s1.toDouble / sn
    }
    (0 until n).map { i =>
      (0 to i).map(j => (i until n).map(k => wavg(j, k)).min).max
    }
  }

  test("isotonic minimax identity == sequential PAV on random histograms") {
    val bucket = for {
      nt <- Gen.chooseNum(1L, 50L)
      n1 <- Gen.chooseNum(0L, nt)
    } yield (n1, nt)
    val histGen = Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, bucket))
    for (hist <- samples(histGen, 300)) {
      val seqFit = pavSequential(hist)
      val mmFit = pavMinimax(hist)
      seqFit.zip(mmFit).zipWithIndex.foreach { case ((a, b), i) =>
        assert(math.abs(a - b) < 1e-12, s"bucket $i of $hist: seq=$a minimax=$b")
      }
      assert(mmFit.sliding(2).forall(w => w.length < 2 || w(0) <= w(1) + 1e-12),
        s"minimax fit not monotone on $hist")
    }
  }

  // --- identity 2: BPE merge fold == double-space replace -----------

  private def mergeFoldRef(sym: Seq[String], l: String, r: String): Seq[String] = {
    // the skip-flag fold: greedy left-to-right, non-overlapping
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < sym.length) {
      if (i + 1 < sym.length && sym(i) == l && sym(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += sym(i); i += 1 }
    }
    out.result()
  }

  private def mergeReplace(sym: Seq[String], l: String, r: String): Seq[String] = {
    val joined = " " + sym.mkString("  ") + " "
    val replaced = joined.replace(s" $l  $r ", s" $l$r ")
    replaced.trim match {
      case "" => Seq.empty
      case t  => t.split("  ", -1).toSeq
    }
  }

  test("BPE greedy merge == double-space boundary replace on random sequences") {
    // alphabet chosen so symbols can be prefixes/suffixes of one another —
    // the mid-symbol false-match hazard the boundary spaces must prevent
    val alpha = Seq("a", "b", "ab", "ba", "aa", "a</w>", "xa")
    val seqGen = for {
      n <- Gen.chooseNum(0, 12)
      s <- Gen.listOfN(n, Gen.oneOf(alpha))
    } yield s
    val pairGen = for {
      l <- Gen.oneOf(alpha)
      r <- Gen.oneOf(alpha)
    } yield (l, r)
    val caseGen = for { s <- seqGen; p <- pairGen } yield (s, p)
    var checked = 0
    for ((sym, (l, r)) <- samples(caseGen, 500)) {
      val a = mergeFoldRef(sym, l, r)
      val b = mergeReplace(sym, l, r)
      assert(a == b, s"sym=$sym merge=($l,$r): fold=$a replace=$b")
      checked += 1
    }
    assert(checked >= 400)
    // the canonical adjacency cases
    assert(mergeReplace(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(mergeReplace(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
  }
}
