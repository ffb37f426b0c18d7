package graft

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

/** Golden regression hashes for the NO-ORACLE queries (oracle-backed ones
  * are already guarded by the DuckDB rehearsal). Regenerate after an
  * intentional semantic change with GOLDEN_REGEN=1 sbt test (env vars DO
  * reach forked test JVMs; -D flags don't). A missing golden file FAILS —
  * silently regenerating would mask regressions when cwd is wrong.
  */
class GoldenSpec extends SparkSpec {

  private val goldenPath =
    Paths.get("src/test/resources/golden/no_oracle_sf0.001.tsv")

  private def resultHash(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    val rows = df.collect().map(_.toString).mkString("\n")
    MessageDigest.getInstance("MD5").digest(rows.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  test("no-oracle query results match golden hashes on sf0.001") {
    val noOracle = (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet)
      .toSeq.sorted
    val current = noOracle.map(n => n -> resultHash(n)).toMap
    if (sys.env.get("GOLDEN_REGEN").contains("1")) {
      Files.createDirectories(goldenPath.getParent)
      Files.writeString(goldenPath,
        current.toSeq.sorted.map { case (k, v) => s"$k\t$v" }.mkString("", "\n", "\n"))
      info(s"golden file (re)generated with ${current.size} entries")
    } else {
      assert(Files.exists(goldenPath),
        s"golden file missing at $goldenPath (cwd=${sys.props("user.dir")}); " +
          "regenerate intentionally with GOLDEN_REGEN=1 sbt test")
      val golden = Files.readAllLines(goldenPath).toArray.map(_.toString)
        .filter(_.nonEmpty)
        .map { l => val Array(k, v) = l.split("\t"); k -> v }.toMap
      val missing = golden.keySet -- current.keySet
      assert(missing.isEmpty, s"queries removed vs golden: $missing")
      val diffs = current.filter { case (k, v) => golden.get(k).exists(_ != v) }
      assert(diffs.isEmpty, s"golden hash mismatch for: ${diffs.keys.toSeq.sorted}")
      val added = current.keySet -- golden.keySet
      if (added.nonEmpty) info(s"new no-oracle queries without golden entries: $added " +
        "(regenerate with GOLDEN_REGEN=1 sbt test)")
    }
  }
}
