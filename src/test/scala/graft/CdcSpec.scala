package graft

import org.apache.spark.sql.functions._

/** The property content-defined chunking exists for: an edit near the
  * START of a document perturbs only the chunks up to the first boundary
  * after the edit — every later chunk's CONTENT (hence md5) is
  * unchanged, so chunk-grain dedup still matches the untouched tail.
  * Fixed-size chunking shifts every boundary after an insertion and
  * loses all of it.
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  test("prefix insertion preserves the chunk signatures after the first " +
    "post-edit boundary; fixed-size chunking would lose them all") {
    val docs = engine.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).filter(col("doc_id") < 50)
    val edited = docs.select(col("doc_id"),
      concat(lit("EDIT! "), col("text")).as("text"))
    def sigs(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[String]] =
      ops.TextOps.cdcChunks(df, "doc_id", "text")
        .orderBy("doc_id", "chunk")
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("sig")))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val before = sigs(docs)
    val after = sigs(edited)
    assert(before.keySet == after.keySet)
    var preserved = 0L
    var totalTail = 0L
    before.keys.foreach { d =>
      val (b, a) = (before(d), after(d))
      // the tail chunks (all but each side's first ~2 chunks, which the
      // 6-char prefix may legitimately reshape) must be IDENTICAL —
      // CDC resynchronizes at the first boundary after the edit
      val bTail = b.drop(2)
      val aTail = a.drop(a.length - bTail.length)
      totalTail += bTail.length
      preserved += bTail.zip(aTail).count { case (x, y) => x == y }
      assert(bTail == aTail,
        s"doc $d: CDC failed to resynchronize after a prefix edit " +
          s"(${b.length} chunks before, ${a.length} after)")
    }
    info(s"tail chunks preserved across the edit: $preserved/$totalTail")
    assert(totalTail > 0)
  }
}
