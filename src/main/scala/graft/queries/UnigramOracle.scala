package graft.queries

/** Generates the unrolled-CTE DuckDB oracle for the unigram-LM (
  * SentencePiece-style) tokenizer step — the same promote-an-iterative-op
  * device as BpeOracle: the per-word Viterbi DP over character positions
  * becomes `maxLen` CTE blocks (position i's best prefix segmentation
  * extends the best at i−l with the length-l piece ending at i), so the
  * oracle is plain ANSI SQL with no recursion.
  *
  * Determinism devices (identical in the Spark twin):
  *  - piece scores are 1e-6-fixed integers BEFORE the DP
  *    (s6 = floor(ln(c/T)·1e6 + 0.5)), so path costs are exact BIGINT
  *    sums — no float accumulation can reorder two paths;
  *  - argmax tiebreak is (s6 DESC, seg DESC): the segmentation string
  *    itself breaks exact-score ties, binary-collation-identical in both
  *    engines for these ASCII pieces.
  *
  * NOTE for maintainers: no generated line may begin with whitespace
  * followed by '|' — QueryPack.q applies stripMargin a SECOND time to the
  * assembled oracle SQL. Keep concatenation operators mid-line. */
private[queries] object UnigramOracle {

  def sql(maxLen: Int, maxPiece: Int, topK: Int): String = {
    val base = Seq(
      """tok AS (
        |  SELECT w FROM (
        |    SELECT unnest(string_split(lower(text), ' ')) AS w
        |    FROM documents
        |  ) WHERE length(w) > 0
        |)""".stripMargin,
      """w AS (
        |  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS wf FROM tok GROUP BY w
        |)""".stripMargin,
      s"""pc AS (
         |  SELECT substr(word, CAST(i AS INT), CAST(l AS INT)) AS piece,
         |    CAST(SUM(wf) AS BIGINT) AS c
         |  FROM w, UNNEST(range(1, length(word) + 1)) t(i),
         |       UNNEST(range(1, $maxPiece + 1)) u(l)
         |  WHERE i + l - 1 <= length(word)
         |  GROUP BY 1
         |)""".stripMargin,
      """tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS tt FROM pc)""",
      """ps AS (
        |  SELECT piece, c,
        |    CAST(floor(ln(CAST(c AS DOUBLE) / tt) * 1000000 + 0.5) AS BIGINT)
        |      AS s6
        |  FROM pc, tot
        |)""".stripMargin,
      """b0 AS (
        |  SELECT word, wf, CAST(0 AS BIGINT) AS s6, '' AS seg FROM w
        |)""".stripMargin)
    val dp = (1 to maxLen).flatMap { i =>
      val cands = (1 to math.min(maxPiece, i)).map { l =>
        s"""    SELECT word, wf, s6, seg,
           |      substr(word, ${i - l + 1}, $l) AS pp
           |    FROM b${i - l} WHERE length(word) >= $i""".stripMargin
      }.mkString("\n    UNION ALL\n")
      Seq(
        s"""c$i AS (
           |  SELECT x.word, x.wf, x.s6 + p.s6 AS s6,
           |    x.seg || '/' || p.piece AS seg
           |  FROM (
           |$cands
           |  ) x JOIN ps p ON p.piece = x.pp
           |)""".stripMargin,
        s"""b$i AS (
           |  SELECT word, wf, s6, seg FROM (
           |    SELECT word, wf, s6, seg, row_number() OVER (
           |      PARTITION BY word ORDER BY s6 DESC, seg DESC) AS rn
           |    FROM c$i
           |  ) WHERE rn = 1
           |)""".stripMargin)
    }
    val segUnion = (1 to maxLen)
      .map(i => s"  SELECT word, wf, seg FROM b$i WHERE length(word) = $i")
      .mkString("\n  UNION ALL\n")
    val tail = Seq(
      s"""sg AS (
         |$segUnion
         |)""".stripMargin,
      """em AS (
        |  SELECT piece, CAST(SUM(wf) AS BIGINT) AS c1 FROM (
        |    SELECT wf, unnest(string_split(substr(seg, 2), '/')) AS piece
        |    FROM sg
        |  ) GROUP BY 1
        |)""".stripMargin)
    s"""WITH ${(base ++ dp ++ tail).mkString(",\n")}
       |SELECT ps.piece, CAST(ps.c AS BIGINT) AS init_count,
       |  CAST(COALESCE(em.c1, 0) AS BIGINT) AS em_count,
       |  CAST(ps.s6 AS DOUBLE) / 1000000 AS logp
       |FROM ps LEFT JOIN em ON ps.piece = em.piece
       |ORDER BY em_count DESC, ps.piece LIMIT $topK""".stripMargin
  }
}
