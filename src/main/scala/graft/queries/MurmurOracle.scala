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

  // ---------------------------------------------------------------------
  // XXH64 (Spark's xxhash64, seed 42) + CRC32 replay — promotes
  // fn_hash_native past "JVM-seeded, no cross-engine twin": both are
  // pure integer recurrences over the UTF-8 bytes. 64-bit wraparound has
  // no direct DuckDB spelling (BIGINT overflow throws; HUGEINT overflows
  // at 64x64-bit products), so state lives UNSIGNED in HUGEINT and every
  // product routes through a 32-bit limb split; xor drops to BIGINT
  // two's complement (== unsigned xor mod 2^64) and comes back.
  // ---------------------------------------------------------------------

  private val M64 = "18446744073709551616"
  private val XP1 = "11400714785074694791" // 0x9E3779B185EBCA87
  private val XP2 = "14029467366897019727" // 0xC2B2AE3D27D4EB4F
  private val XP3 = "1609587929392839161"  // 0x165667B19E3779F9
  private val XP4 = "9650029242287828579"  // 0x85EBCA77C2B2AE63
  private val XP5 = "2870177450012600261"  // 0x27D4EB2F165667C5

  /** (a*b) mod 2^64: lo*lo + ((lo*hi + hi*lo) mod 2^32)<<32 — every term
    * stays under 2^96, inside HUGEINT. */
  private def mul64(a: String, b: String) =
    s"((($a) % 4294967296) * (($b) % 4294967296)" +
      s" + (((($a) % 4294967296) * (($b) // 4294967296)" +
      s" + (($a) // 4294967296) * (($b) % 4294967296)) % 4294967296)" +
      s" * 4294967296) % $M64"
  private def add64(a: String, b: String) = s"((($a) + ($b)) % $M64)"
  private def rotl64(x: String, r: Int) = {
    val lo = BigInt(1) << (64 - r)
    s"(((($x) % $lo) * ${BigInt(1) << r}) + (($x) // $lo))"
  }
  private def xor64(a: String, b: String) = {
    def sgn(v: String) = s"CAST(CASE WHEN ($v) >= 9223372036854775808 " +
      s"THEN ($v) - $M64 ELSE ($v) END AS BIGINT)"
    val x = s"xor(${sgn(a)}, ${sgn(b)})"
    s"(CASE WHEN ($x) < 0 THEN CAST(($x) AS HUGEINT) + $M64 " +
      s"ELSE CAST(($x) AS HUGEINT) END)"
  }
  /** XXH64's round: rotl31(acc + input*P2) * P1. */
  private def xRound(acc: String, inp: String) =
    mul64(rotl64(add64(acc, mul64(inp, XP2)), 31), XP1)
  private def xRound0(inp: String) =
    mul64(rotl64(mul64(inp, XP2), 31), XP1)

  private def byteAt(i: String) =
    s"(strpos('0123456789ABCDEF', substr(hx, 2*($i)+1, 1)) - 1) * 16" +
      s" + (strpos('0123456789ABCDEF', substr(hx, 2*($i)+2, 1)) - 1)"
  /** Little-endian word of `nb` bytes at 0-based byte offset `off`. */
  private def wordLE(off: String, nb: Int) =
    (0 until nb).map(k =>
      s"CAST(bs[($off)+${k + 1}] AS HUGEINT) * ${BigInt(1) << (8 * k)}")
      .mkString("(", " + ", ")")

  /** java.util.zip.CRC32's IEEE-802.3 reflected table, computed here the
    * same way the JDK builds it (not hand-copied). */
  private def crcTable: IndexedSeq[Long] = (0 until 256).map { nn =>
    var c = nn.toLong
    var k = 0
    while (k < 8) {
      c = if ((c & 1) == 1) (c >>> 1) ^ 0xEDB88320L else c >>> 1
      k += 1
    }
    c
  }

  /** Full fn_hash_native oracle: (doc_id, h_xx64, h_crc32) per document,
    * exactly Spark's xxhash64(text) / crc32(text). Lane accumulators are
    * INDEPENDENT folds (lane j only ever consumes stripe word j), so the
    * 4-lane state needs no struct; the <=3-word / <=3-byte tails are
    * folds too; the merge + avalanche are staged single-column CTEs
    * because each step reads its own output twice. */
  def fnHashSql: String = {
    val tbl = crcTable.mkString("[", ", ", "]")
    def lane(init: String, woff: String) =
      s"""list_reduce(list_prepend(CAST($init AS HUGEINT) % $M64,
         |      list_transform(range(0, n // 32), t -> ${wordLE(woff, 8)})),
         |      (h, wv) -> ${xRound("h", "wv")})""".stripMargin
    def merge(prev: String, v: String) =
      s"CASE WHEN n >= 32 THEN ${add64(mul64(xor64(prev, xRound0(v)), XP1), XP4)} ELSE $prev END"
    s"""WITH b0 AS (
       |  SELECT doc_id, hex(encode(text)) AS hx,
       |    octet_length(encode(text)) AS n
       |  FROM documents
       |),
       |bl AS (
       |  SELECT doc_id, n,
       |    list_transform(range(0, n), i -> ${byteAt("CAST(i AS INT)")}) AS bs
       |  FROM b0
       |),
       |lanes AS (
       |  SELECT doc_id, n, bs,
       |    ${lane(s"(42 + $XP1) % $M64 + $XP2", "32*CAST(t AS INT)")} AS v1,
       |    ${lane(s"42 + $XP2", "32*CAST(t AS INT)+8")} AS v2,
       |    ${lane("42", "32*CAST(t AS INT)+16")} AS v3,
       |    ${lane(s"$M64 + 42 - $XP1", "32*CAST(t AS INT)+24")} AS v4
       |  FROM bl
       |),
       |m0 AS (
       |  SELECT doc_id, n, bs, v1, v2, v3, v4,
       |    CASE WHEN n >= 32 THEN
       |      (${rotl64("v1", 1)} + ${rotl64("v2", 7)} + ${rotl64("v3", 12)}
       |       + ${rotl64("v4", 18)}) % $M64
       |    ELSE CAST(42 + $XP5 AS HUGEINT) END AS h
       |  FROM lanes
       |),
       |m1 AS (SELECT doc_id, n, bs, v2, v3, v4, ${merge("h", "v1")} AS h FROM m0),
       |m2 AS (SELECT doc_id, n, bs, v3, v4, ${merge("h", "v2")} AS h FROM m1),
       |m3 AS (SELECT doc_id, n, bs, v4, ${merge("h", "v3")} AS h FROM m2),
       |m4 AS (SELECT doc_id, n, bs,
       |  ${add64(merge("h", "v4"), "n")} AS h FROM m3),
       |t8 AS (
       |  SELECT doc_id, n, bs,
       |    list_reduce(list_prepend(h,
       |      list_transform(range(0, (n % 32) // 8), t ->
       |        ${wordLE("32*(n // 32) + 8*CAST(t AS INT)", 8)})),
       |      (h, wv) -> ${add64(mul64(rotl64(xor64("h", xRound0("wv")), 27), XP1), XP4)}) AS h
       |  FROM m4
       |),
       |t4 AS (
       |  SELECT doc_id, n, bs,
       |    CASE WHEN n % 8 >= 4 THEN
       |      ${add64(mul64(rotl64(xor64("h", mul64(wordLE("(n // 8) * 8", 4), XP1)), 23), XP2), XP3)}
       |    ELSE h END AS h
       |  FROM t8
       |),
       |tb AS (
       |  SELECT doc_id, n,
       |    list_reduce(list_prepend(h,
       |      list_transform(range((n // 4) * 4, n), i ->
       |        CAST(bs[CAST(i AS INT)+1] AS HUGEINT))),
       |      (h, bv) -> ${mul64(rotl64(xor64("h", mul64("bv", XP5)), 11), XP1)}) AS h
       |  FROM t4
       |),
       |a1 AS (SELECT doc_id, n, ${xor64("h", "h // 8589934592")} AS h FROM tb),
       |a2 AS (SELECT doc_id, n, ${mul64("h", XP2)} AS h FROM a1),
       |a3 AS (SELECT doc_id, n, ${xor64("h", "h // 536870912")} AS h FROM a2),
       |a4 AS (SELECT doc_id, n, ${mul64("h", XP3)} AS h FROM a3),
       |a5 AS (SELECT doc_id, n, ${xor64("h", "h // 4294967296")} AS h FROM a4),
       |xx AS (
       |  SELECT doc_id, CAST(CASE WHEN h >= 9223372036854775808
       |    THEN h - $M64 ELSE h END AS BIGINT) AS h_xx64
       |  FROM a5
       |),
       |tblv AS (SELECT $tbl AS tbl),
       |crc AS (
       |  SELECT doc_id,
       |    CAST(xor(list_reduce(list_prepend(CAST(4294967295 AS BIGINT), bs),
       |      (c, b) -> xor(c // 256, tbl[xor(c % 256, b) + 1])),
       |      4294967295) AS BIGINT) AS h_crc32
       |  FROM bl CROSS JOIN tblv
       |)
       |SELECT xx.doc_id, h_xx64, h_crc32
       |FROM xx JOIN crc ON xx.doc_id = crc.doc_id
       |ORDER BY xx.doc_id""".stripMargin
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
