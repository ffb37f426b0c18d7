package graft.queries

/** Generates the unrolled-CTE DuckDB oracles for the BPE queries — the
  * same promote-an-iterative-op device as the k-means / PCA / PageRank
  * oracles: `rounds` argmax iterations become `rounds` CTE blocks, so the
  * oracle is plain ANSI SQL with no recursion and a deterministic
  * (freq DESC, pair ASC) tiebreak identical to ops/Bpe.trainLoop.
  *
  * Merge application in SQL (the part with no obvious relational form):
  * greedy left-to-right NON-OVERLAPPING pair replacement equals a plain
  * string replace over the symbol list joined with DOUBLE spaces and
  * wrapped in single spaces — pattern ' l  r ' → ' lr '. The pattern's
  * single trailing space consumes the FIRST of the two separator spaces,
  * leaving the second as the next match's leading boundary, so adjacent
  * occurrences merge independently ('a a a a' → 'aa aa') while
  * overlapping ones are skipped ('a a a' → 'aa a') — exactly the
  * skip-flag fold semantics of Bpe.mergeFold. Symbols never contain
  * spaces (characters + '</w>' + their concatenations), so the
  * space-anchored pattern cannot match mid-symbol.
  *
  * NOTE for maintainers: no generated line may begin with whitespace
  * followed by '|' — QueryPack.q applies stripMargin a SECOND time to the
  * assembled oracle SQL, which would eat a line-leading '||'. Keep
  * concatenation operators mid-line.
  */
private[queries] object BpeOracle {

  /** CTE blocks shared by both oracles: word frequencies, the initial
    * character vocabulary, and `rounds` (pairs → argmax → merged vocab)
    * blocks. Exposes m1..m&lt;rounds&gt; with columns (p, c, l, r). */
  private def trainCtes(rounds: Int): Seq[String] = {
    val base = Seq(
      """tok AS (
        |  SELECT doc_id, w FROM (
        |    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
        |    FROM documents
        |  ) WHERE length(w) > 0
        |)""".stripMargin,
      """w AS (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS wf FROM tok GROUP BY w
        |)""".stripMargin,
      """v0 AS (
        |  SELECT wf, list_append(string_split(w, ''), '</w>') AS sym FROM w
        |)""".stripMargin)
    val loop = (1 to rounds).flatMap { k =>
      val pairs =
        s"""p$k AS (
           |  SELECT sym[i] || ' ' || sym[i+1] AS p,
           |    CAST(SUM(wf) AS BIGINT) AS c
           |  FROM v${k - 1}, UNNEST(range(1, len(sym))) AS t(i)
           |  GROUP BY 1
           |)""".stripMargin
      val argmax =
        s"""m$k AS (
           |  SELECT p, c, string_split(p, ' ')[1] AS l,
           |    string_split(p, ' ')[2] AS r
           |  FROM p$k ORDER BY c DESC, p LIMIT 1
           |)""".stripMargin
      val next =
        if (k == rounds) Nil
        else Seq(mergeCte(s"v$k", s"v${k - 1}", s"m$k", "wf"))
      Seq(pairs, argmax) ++ next
    }
    base ++ loop
  }

  /** One merge-application CTE: rows of `from` with `m`'s (l, r) merged
    * into the sym list via the double-space string device. LEFT JOIN, not
    * a cross join: if the vocabulary fully merges before `rounds`
    * iterations, the argmax CTE is EMPTY, and a cross join would empty
    * every downstream block (0 output rows) while Bpe.trainMerges
    * early-returns the shorter merge table and applyMerges still emits
    * full per-doc counts. With the pass-through guard an empty merge row
    * leaves sym unchanged — mirroring the Spark early-return exactly.
    * Unreachable at rounds=8 on the graded corpora; load-bearing for
    * tiny fixtures or a higher rounds setting. */
  private def mergeCte(name: String, from: String, m: String,
                       carry: String): String =
    s"""$name AS (
       |  SELECT $carry, CASE WHEN mm.l IS NULL THEN sym ELSE
       |    string_split(trim(replace(
       |    ' ' || array_to_string(sym, '  ') || ' ',
       |    ' ' || mm.l || '  ' || mm.r || ' ',
       |    ' ' || mm.l || mm.r || ' ')), '  ') END AS sym
       |  FROM $from LEFT JOIN $m mm ON TRUE
       |)""".stripMargin

  /** Oracle for llm_bpe_train: the (round, pair, freq) merge table. */
  def trainSql(rounds: Int): String = {
    val sel = (1 to rounds)
      .map(k => s"SELECT CAST($k AS INT) AS round, p AS pair, c AS freq FROM m$k")
      .mkString("\nUNION ALL ")
    "WITH " + trainCtes(rounds).mkString(",\n") + "\n" + sel + "\nORDER BY round"
  }

  /** Oracle for llm_bpe_tokenize: re-learn the merge table, then apply
    * m1..m&lt;rounds&gt; in training order to the distinct-word vocab and
    * count per-doc words/subwords. */
  def tokenizeSql(rounds: Int): String = {
    val apply0 =
      """tv0 AS (
        |  SELECT w, list_append(string_split(w, ''), '</w>') AS sym FROM w
        |)""".stripMargin
    val applyChain = (1 to rounds)
      .map(k => mergeCte(s"tv$k", s"tv${k - 1}", s"m$k", "w"))
    val counts =
      s"""wn AS (
         |  SELECT w, CAST(len(sym) AS BIGINT) AS ns FROM tv$rounds
         |)""".stripMargin
    "WITH " + (trainCtes(rounds) ++ Seq(apply0) ++ applyChain :+ counts)
      .mkString(",\n") +
      """
        |SELECT doc_id, CAST(COUNT(*) AS INT) AS n_words,
        |  CAST(SUM(ns) AS BIGINT) AS n_subwords
        |FROM tok JOIN wn USING (w) GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }
}
