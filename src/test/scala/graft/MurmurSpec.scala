package graft

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

import graft.queries.MurmurOracle

/** Pins the two MLlib determinism assumptions the llm_dedup_minhash_ml
  * ORACLE is built on, against MLlib's own public API — so an MLlib
  * upgrade that changes either draw fails `sbt test` instead of silently
  * diverging from the DuckDB replay:
  *
  *  1. HashingTF term indexing == nonNegativeMod(murmur3_hashUnsafeBytes2
  *     (utf8(term), seed=42), numFeatures) — and because 2^18 divides
  *     2^32, that equals the UNSIGNED 32-bit hash mod 2^18, which is
  *     exactly what the oracle's BIGINT algebra computes.
  *  2. MinHashLSH(seed).fit coefficients == MurmurOracle.coefs(seed, n):
  *     verified behaviorally (the model field is private[ml]) by checking
  *     model.transform hashes == min((1+idx)*a+b mod P) over the input's
  *     active indices for every table, on vectors with known indices.
  */
class MurmurSpec extends SparkSpec {

  test("HashingTF indexing is seed-42 murmur3 hashUnsafeBytes2 mod 2^18") {
    val tf = new HashingTF().setInputCol("in").setOutputCol("out")
      .setBinary(true).setNumFeatures(1 << 18)
    val terms = Seq("abc", "a", "the quick brown", "x y z", "",
      "lorem ipsum dolor", "0", "word1 word2 word3", "ABCD", "ABCDE")
    for (t <- terms) {
      val utf8 = UTF8String.fromString(t)
      val h = Murmur3_x86_32.hashUnsafeBytes2(
        utf8.getBaseObject, utf8.getBaseOffset, utf8.numBytes(), 42)
      val unsigned = h.toLong & 0xFFFFFFFFL
      assert(tf.indexOf(t) === (unsigned % (1 << 18)).toInt,
        s"HashingTF.indexOf('$t') != murmur3-mod-2^18 — the minhash_ml " +
          "oracle's murmur replay no longer matches MLlib")
    }
  }

  test("MinHashLSH(seed=42) hashes match the replicated coefficients") {
    val s = spark
    import s.implicits._
    val prime = 2038074743L
    val rows: Seq[(Long, Vector)] = Seq(
      1L -> Vectors.sparse(1 << 18, Array(3, 77, 262143), Array(1.0, 1.0, 1.0)),
      2L -> Vectors.sparse(1 << 18, Array(0, 5, 100000), Array(1.0, 1.0, 1.0)),
      3L -> Vectors.sparse(1 << 18, Array(42), Array(1.0)))
    val df = rows.toDF("id", "features")
    val model = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42).fit(df)
    val cs = MurmurOracle.coefs(seed = 42, numHashTables = 8)
    val out = model.transform(df).select("id", "hashes").collect()
    for (r <- out) {
      val id = r.getLong(0)
      val idxs = rows.find(_._1 == id).get._2.toSparse.indices
      val hashes = r.getSeq[Vector](1).map(_(0).toLong)
      val expected = cs.map { case (a, b) =>
        idxs.map(i => ((1L + i) * a + b) % prime).min
      }
      assert(hashes === expected.toSeq,
        "MinHashLSH seed-42 coefficient replication drifted from MLlib — " +
          "regenerate the llm_dedup_minhash_ml oracle")
    }
  }
}
