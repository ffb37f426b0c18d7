package graft.queries

/** DuckDB spelling of the hash chain inside MLlib's MinHashLSH pipeline,
  * so `llm_dedup_minhash_ml` can be graded cell-exact instead of golden.
  *
  * The "engine-specific" parts that kept the query rows-only through r9
  * are all deterministic integer algebra once written down:
  *
  *  1. `HashingTF` term indexing = Murmur3_x86_32.hashUnsafeBytes2 of the
  *     term's UTF-8 bytes with seed 42, taken nonNegativeMod 2^18. That
  *     murmur variant is plain 32-bit modular arithmetic (little-endian
  *     4-byte words through mixK1/mixH1, the <4-byte tail packed into one
  *     k1, then the fmix avalanche) — spelled here over DuckDB BIGINTs,
  *     with HUGEINT products masked back to 32 bits. `MurmurSpec` pins
  *     this reading against Spark's own public API on every build.
  *  2. `MinHashLSH(seed = 42)` draws its per-table (a, b) coefficients
  *     from scala.util.Random(42) — replicated in [[coefs]] at
  *     registration time and INLINED into the oracle string (the
  *     LshBands-signs device), never copied by hand. `MurmurSpec` pins
  *     the replication against a fitted model's transform output.
  *  3. Each table's hash = min over the distinct feature indices of
  *     ((1 + idx) * a + b) % 2038074743 — exact BIGINT math (idx < 2^18,
  *     a,b < 2^31: the product stays < 2^49).
  *  4. approxSimilarityJoin = bucket-join on (table, hash) equality,
  *     distinct pairs, Jaccard distance over the INDEX sets, STRICT
  *     `dist < threshold` filter — replayed as ordinary joins.
  *
  * All 32-bit state lives in [0, 2^32) inside BIGINTs; `xor`, `<<`, `>>`
  * and `& 4294967295` keep it there, and the only place 64 bits could
  * overflow (32×32-bit products) routes through HUGEINT then masks.
  */
object MurmurOracle {

  private def umul(a: String, b: Long) =
    s"CAST((CAST(($a) AS HUGEINT) * $b) % 4294967296 AS BIGINT)"
  private def rotl(x: String, r: Int) =
    s"(((($x) << $r) | (($x) >> ${32 - r})) & 4294967295)"
  private def mixK1(k: String) =
    umul(rotl(umul(k, 3432918353L), 15), 461845907L)
  private def mixH1(h: String, k: String) =
    s"((${umul(rotl(s"xor(($h), ${mixK1(k)})", 13), 5L)} + 3864292196) % 4294967296)"

  /** MLlib's seed-42 MinHash coefficients: `Array.fill(numHashTables)`
    * of (1 + nextInt(P-1), nextInt(P-1)) over scala.util.Random(seed),
    * P = 2038074743 (org.apache.spark.ml.feature.MinHashLSH.HASH_PRIME).
    * Replicated rather than reflected (the model field is private[ml]);
    * MurmurSpec fails the build if an MLlib upgrade changes the draw. */
  def coefs(seed: Long, numHashTables: Int): Array[(Int, Int)] = {
    val prime = 2038074743
    val rand = new scala.util.Random(seed)
    Array.fill(numHashTables)(
      (1 + rand.nextInt(prime - 1), rand.nextInt(prime - 1)))
  }

  /** CTE chain mapping an upstream `e(doc_id, sg)` shingle relation to
    * `fidx(doc_id, idx)` — the distinct HashingTF(2^18, binary) feature
    * indices per document. Each DISTINCT shingle string is hashed once
    * (`us`), then joined back. The fmix avalanche is staged through
    * single-column CTEs (`uf1..uf6`) because each step reads its input
    * twice (xor with its own shift) and SQL lambdas have no let-binding. */
  def featureIdxCtes(numFeatures: Int): String = {
    val byteAt = (i: String) =>
      s"(strpos('0123456789ABCDEF', substr(hx, 2*($i)+1, 1)) - 1) * 16" +
        s" + (strpos('0123456789ABCDEF', substr(hx, 2*($i)+2, 1)) - 1)"
    s"""us AS (SELECT DISTINCT sg FROM e),
       |ub AS (SELECT sg, hex(encode(sg)) AS hx,
       |         octet_length(encode(sg)) AS n FROM us),
       |ubl AS (
       |  SELECT sg, n,
       |    list_transform(range(0, n), i -> ${byteAt("CAST(i AS INT)")}) AS bs
       |  FROM ub
       |),
       |uw AS (
       |  SELECT sg, n,
       |    list_transform(range(0, n // 4), j ->
       |      bs[4*CAST(j AS INT)+1] + bs[4*CAST(j AS INT)+2]*256
       |      + bs[4*CAST(j AS INT)+3]*65536 + bs[4*CAST(j AS INT)+4]*16777216)
       |      AS ws,
       |    coalesce(list_sum(list_transform(range(4*(n // 4), n), i ->
       |      bs[CAST(i AS INT)+1] * (CASE CAST(i AS INT) - 4*(n // 4)
       |         WHEN 0 THEN 1 WHEN 1 THEN 256 ELSE 65536 END))), 0) AS k1t
       |  FROM ubl
       |),
       |uh AS (
       |  SELECT sg, n, k1t,
       |    list_reduce(list_prepend(CAST(42 AS BIGINT), ws),
       |      (h, wv) -> ${mixH1("h", "wv")}) AS h1
       |  FROM uw
       |),
       |ut AS (SELECT sg, n, xor(h1, ${mixK1("k1t")}) AS h FROM uh),
       |uf1 AS (SELECT sg, xor(h, CAST(n AS BIGINT)) AS h FROM ut),
       |uf2 AS (SELECT sg, xor(h, h >> 16) AS h FROM uf1),
       |uf3 AS (SELECT sg, ${umul("h", 2246822507L)} AS h FROM uf2),
       |uf4 AS (SELECT sg, xor(h, h >> 13) AS h FROM uf3),
       |uf5 AS (SELECT sg, ${umul("h", 3266489909L)} AS h FROM uf4),
       |uf6 AS (SELECT sg, xor(h, h >> 16) % $numFeatures AS idx FROM uf5),
       |fidx AS (
       |  SELECT DISTINCT e.doc_id, u.idx FROM e JOIN uf6 u ON e.sg = u.sg
       |)""".stripMargin
  }

  /** Full oracle for minhashPairsML: shingle CTEs are supplied by the
    * caller (must define `e(doc_id, sg)`); emits (id_a, id_b, jaccard). */
  def minhashMlSql(shingleCtes: String, seed: Long, numHashTables: Int,
                   numFeatures: Int, tau: Double): String = {
    val values = coefs(seed, numHashTables).zipWithIndex
      .map { case ((a, b), t) => s"($t, $a, $b)" }.mkString(", ")
    s"""WITH $shingleCtes,
       |${featureIdxCtes(numFeatures)},
       |ht(tb, a, b) AS (VALUES $values),
       |sig AS (
       |  SELECT doc_id, tb, min(((1 + idx) * a + b) % 2038074743) AS hv
       |  FROM fidx CROSS JOIN ht GROUP BY doc_id, tb
       |),
       |cand AS (
       |  SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
       |  FROM sig x JOIN sig y
       |    ON x.tb = y.tb AND x.hv = y.hv AND x.doc_id < y.doc_id
       |),
       |ns AS (SELECT doc_id, COUNT(*) AS n FROM fidx GROUP BY doc_id),
       |iv AS (
       |  SELECT c.id_a, c.id_b, COUNT(*) AS inter
       |  FROM cand c JOIN fidx fa ON fa.doc_id = c.id_a
       |              JOIN fidx fb ON fb.doc_id = c.id_b AND fa.idx = fb.idx
       |  GROUP BY 1, 2
       |),
       |res AS (
       |  SELECT iv.id_a, iv.id_b,
       |    1.0 - CAST(inter AS DOUBLE) / (na.n + nb.n - inter) AS dist
       |  FROM iv JOIN ns na ON iv.id_a = na.doc_id
       |          JOIN ns nb ON iv.id_b = nb.doc_id
       |)
       |SELECT id_a, id_b, round(1.0 - dist, 4) AS jaccard
       |FROM res WHERE dist < ${1.0 - tau}
       |ORDER BY id_a, id_b""".stripMargin
  }
}
