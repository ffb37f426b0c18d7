package graft

import java.nio.file.{Files, Paths}
import java.security.MessageDigest

/** Golden regression hashes for the NO-ORACLE queries (oracle-backed ones
  * are already guarded by the DuckDB rehearsal). Regenerate after an
  * intentional semantic change by deleting the golden file and re-running
  * (tests fork, so -D flags from the sbt command line don't reach them).
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
    if (sys.props.get("golden.regen").contains("true") || !Files.exists(goldenPath)) {
      Files.createDirectories(goldenPath.getParent)
      Files.writeString(goldenPath,
        current.toSeq.sorted.map { case (k, v) => s"$k\t$v" }.mkString("", "\n", "\n"))
      info(s"golden file (re)generated with ${current.size} entries")
    } else {
      val golden = Files.readAllLines(goldenPath).toArray.map(_.toString)
        .filter(_.nonEmpty)
        .map { l => val Array(k, v) = l.split("\t"); k -> v }.toMap
      val missing = golden.keySet -- current.keySet
      assert(missing.isEmpty, s"queries removed vs golden: $missing")
      val diffs = current.filter { case (k, v) => golden.get(k).exists(_ != v) }
      assert(diffs.isEmpty, s"golden hash mismatch for: ${diffs.keys.toSeq.sorted}")
      val added = current.keySet -- golden.keySet
      if (added.nonEmpty) info(s"new no-oracle queries without golden entries: $added " +
        "(regenerate with -Dgolden.regen=true)")
    }
  }
}
