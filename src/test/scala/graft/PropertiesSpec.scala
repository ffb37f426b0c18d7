package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Algebraic invariants over the graded operators (SURVEY §5.2.3).
  * (scalatestplus bridge isn't on the classpath — Gen is sampled directly.) */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val customer = engine.Tables(spark, sf, "customer").cache()
  private lazy val orders = engine.Tables(spark, sf, "orders").cache()

  test("union all count additivity") {
    val a = customer.filter($"c_nationkey" < 10)
    val b = customer.filter($"c_nationkey" >= 10)
    assert(a.unionByName(b).count() == customer.count())
  }

  test("semi ∪ anti partitions the left table exactly") {
    val semi = customer.join(orders, $"o_custkey" === $"c_custkey", "left_semi")
    val anti = customer.join(orders, $"o_custkey" === $"c_custkey", "left_anti")
    assert(semi.count() + anti.count() == customer.count())
    assert(semi.select("c_custkey").intersect(anti.select("c_custkey")).count() == 0)
  }

  test("topk per group emits at most k per group, and rn is 1..k") {
    val out = SparkEntry.queries("topk_per_group")(spark, sf)
    val byGroup = out.groupBy("c_nationkey").agg(count(lit(1)).as("n"),
      min($"rn").as("lo"), max($"rn").as("hi"))
    assert(byGroup.filter($"n" > 3 || $"lo" =!= 1 || $"hi" =!= $"n").count() == 0)
  }

  test("row_number is a permutation of 1..n within every partition") {
    val out = SparkEntry.queries("win_row_number")(spark, sf)
    val bad = out.groupBy("user_id")
      .agg(count(lit(1)).as("n"), min($"rn").as("lo"), max($"rn").as("hi"),
        countDistinct($"rn").as("d"))
      .filter($"lo" =!= 1 || $"hi" =!= $"n" || $"d" =!= $"n")
    assert(bad.count() == 0)
  }

  test("asof join: every match has right ts <= left ts") {
    val out = SparkEntry.queries("join_asof")(spark, sf)
    // events are 2024+, orders end 2001 → all matched o_orderkey non-null
    // for users that are customers with orders; spot property: row count
    // equals events row count (left-outer preserved)
    assert(out.count() == engine.Tables(spark, sf, "events").count())
  }

  test("jaccard similarity is within [0,1] on random corpora") {
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val genDoc = Gen.listOfN(8, Gen.oneOf(vocab)).map(_.mkString(" "))
    val genCorpus = Gen.listOfN(12, genDoc)
    (0 until 3).foreach { i =>
      val texts = genCorpus(Gen.Parameters.default, Seed(42L + i)).get
      val df = texts.zipWithIndex.map { case (t, j) => (j.toLong, t) }.toDF("doc_id", "text")
      val sims = ops.Dedup.jaccardPairs(df, "text", "doc_id", 2, 0.0)
        .select("jaccard").as[Double].collect()
      assert(sims.forall(s => s >= 0.0 && s <= 1.0))
    }
  }

  test("connected components match a reference union-find on random graphs") {
    val genEdge = for {
      a <- Gen.choose(0L, 19L); b <- Gen.choose(0L, 19L) if a != b
    } yield (math.min(a, b), math.max(a, b))
    val genGraph = Gen.listOfN(15, genEdge)
    (0 until 3).foreach { i =>
      val edges = genGraph(Gen.Parameters.default, Seed(7L + i)).get.distinct
      // reference: driver-side union-find
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(n => n -> find(n)).toMap
      val got = ops.Dedup.connectedComponents(
        edges.toDF("id_a", "id_b"), "id_a", "id_b")
        .as[(Long, Long)].collect().toMap
      // min-label CC and union-find agree up to representative choice;
      // normalize both to min-of-component
      val canon = expected.groupBy(_._2).flatMap { case (_, m) =>
        val mn = m.keys.min; m.keys.map(_ -> mn)
      }
      assert(got == canon, s"graph $i: $edges")
    }
  }

  test("connected components converges on deep chains and trips the guard past maxIter") {
    import spark.implicits._
    // a path graph with ids increasing along the chain is the min-label
    // worst case: with pointer jumping the component min propagates
    // 2^round hops per round, so a depth-d chain needs ~log2(d) rounds
    val depth = 300
    val chain = (0L until depth).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // a maxIter below log2(depth) must fail LOUDLY (silently returning
    // partial labels would hand callers wrong clusters)
    val e = intercept[IllegalStateException] {
      ops.Dedup.connectedComponents(chain, "id_a", "id_b", maxIter = 4).count()
    }
    assert(e.getMessage.contains("did not converge"))
    // the default maxIter=25 covers diameters up to ~2^25 via doubling —
    // the 300-deep chain (16 rounds pre-doubling) converges comfortably
    val labels = ops.Dedup.connectedComponents(chain, "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    assert(labels.values.toSet == Set(0L), "chain did not collapse to one component")
    assert(labels.keySet == (0L to depth).toSet)
  }

  test("cosine self-similarity is 1 for every corpus vector") {
    val emb = engine.Tables(spark, sf, "embeddings")
    val selfSim = emb.select(
      round(ops.Sim.cosine(ops.Sim.asDouble($"embedding"), ops.Sim.asDouble($"embedding")), 6)
        .as("s"))
    assert(selfSim.filter($"s" =!= 1.0).count() == 0)
  }

  test("jaro-winkler: identity, symmetry, bounds on random strings") {
    val gen = Gen.listOfN(2, Gen.alphaStr.map(_.take(12)))
    var seed = Seed(42L)
    (1 to 200).foreach { _ =>
      val Some(List(a, b)) = gen.apply(Gen.Parameters.default, seed)
      seed = seed.next
      val ab = functions.JaroWinkler.similarity(a, b)
      val ba = functions.JaroWinkler.similarity(b, a)
      assert(ab == ba, s"asymmetric on ('$a','$b'): $ab vs $ba")
      assert(ab >= 0.0 && ab <= 1.0, s"out of bounds on ('$a','$b'): $ab")
      assert(functions.JaroWinkler.similarity(a, a) == 1.0)
    }
  }

  test("BlockWindow ntile/lag equal the Spark windows on random frames " +
    "at random block counts") {
    import org.apache.spark.sql.expressions.Window
    // random keyed frames with DUPLICATE order-tiebreak pressure: values
    // drawn from a small domain so ties exercise the ANSI bucket edges
    val genRow = for {
      k <- Gen.oneOf("x", "y", "z")
      v <- Gen.choose(0L, 9L)
    } yield (k, v)
    (0 until 3).foreach { i =>
      val seed = Seed(1000L + i)
      val rows = Gen.listOfN(60, genRow)(Gen.Parameters.default, seed).get
        .zipWithIndex.map { case ((k, v), id) => (id.toLong, k, v) }
      val df = rows.toDF("id", "k", "v")
      val buckets = 2 + i * 3 // 2, 5, 8
      val nBlocks = 1 + i * 2 // 1, 3, 5
      val naiveN = df.select($"id",
        ntile(buckets).over(
          Window.partitionBy("k").orderBy($"v", $"id")).as("b"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val blockN = ops.BlockWindow
        .ntile(df, buckets, Seq("k"), Seq("v", "id"), "b", nBlocks)
        .select($"id", $"b")
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(blockN == naiveN, s"round $i: ntile diverged")
      val naiveL = df.select($"id",
        lag($"v", 1).over(
          Window.partitionBy("k").orderBy($"v", $"id")).as("p"))
        .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
      val blockL = ops.BlockWindow
        .lag(df, Seq("k"), Seq("v", "id"), $"v", "p", nBlocks)
        .select($"id", $"p")
        .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
      assert(blockL == naiveL, s"round $i: lag diverged")
    }
  }

  test("cdcChunks partitions ANY unicode text exactly (codepoint " +
    "semantics hold through split/substr/length, incl. supplementary)") {
    // split(text, "") / length() / substr() must agree on what a
    // "character" is or chunk reconstruction breaks on real-world text;
    // Spark's UTF8String is codepoint-consistent — pinned here with BMP
    // CJK, combining marks, and supplementary-plane emoji in the mix
    val seed = Seed(42L)
    val alphabet = "ab XY9光景тестé́😀🎉𝄞"
    val gen = Gen.chooseNum(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(
        alphabet.codePoints().toArray.toIndexedSeq.map(
          cp => new String(Character.toChars(cp)))))
        .map(_.mkString))
    val texts = Iterator.iterate((gen.pureApply(Gen.Parameters.default, seed),
        seed.next)) { case (_, s0) =>
      (gen.pureApply(Gen.Parameters.default, s0), s0.next)
    }.take(60).map(_._1).toSeq
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val chunks = ops.TextOps.cdcChunks(df, "doc_id", "text")
      .collect().groupBy(_.getAs[Long]("doc_id"))
    val lens = df.select($"doc_id", length($"text").as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    lens.foreach { case (d, n) =>
      val cs = chunks.getOrElse(d, Array.empty).sortBy(_.getAs[Long]("chunk"))
      // an empty doc has NO chunks (not a phantom md5("") chunk)
      if (n == 0) assert(cs.isEmpty, s"doc $d: empty text grew chunks")
      assert(cs.map(_.getAs[Long]("len")).sum == n.toLong,
        s"doc $d: chunk lengths do not reconstruct length($n)")
      // chunks tile the text: starts are cumulative lengths
      var expectSt = 1L
      cs.foreach { c =>
        assert(c.getAs[Long]("st") == expectSt,
          s"doc $d chunk ${c.getAs[Long]("chunk")}: gap or overlap")
        expectSt += c.getAs[Long]("len")
      }
    }
  }
}
