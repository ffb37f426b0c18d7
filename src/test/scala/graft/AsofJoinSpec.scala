package graft

import graft.ops.AsofJoin
import org.scalatest.prop.TableDrivenPropertyChecks

class AsofJoinSpec extends SparkSpec with TableDrivenPropertyChecks {
  import spark.implicits._

  private def run(left: Seq[(Int, Long)], right: Seq[(Int, Long, String, Long)]) = {
    val l = left.toDF("k", "ts")
    val r = right.toDF("k", "rts", "v", "rid")
    AsofJoin(l, r, "k", "k", "ts", "rts", Seq("v", "rid"), "rid")
      .collect().map(row => (row.getInt(0), row.getLong(1),
        Option(row.getString(2)), if (row.isNullAt(3)) -1L else row.getLong(3)))
      .sortBy(t => (t._1, t._2))
  }

  test("basic at-or-before match") {
    val out = run(
      left = Seq((1, 10L), (1, 20L), (1, 5L)),
      right = Seq((1, 10L, "a", 1L), (1, 15L, "b", 2L)))
    assert(out === Seq(
      (1, 5L, None, -1L),        // before any right row
      (1, 10L, Some("a"), 1L),   // equal ts counts as at-or-before
      (1, 20L, Some("b"), 2L)))  // latest right wins
  }

  test("ties on right ts resolve to max tiebreak") {
    val out = run(
      left = Seq((1, 10L)),
      right = Seq((1, 10L, "lo", 1L), (1, 10L, "hi", 9L), (1, 10L, "mid", 5L)))
    assert(out === Seq((1, 10L, Some("hi"), 9L)))
  }

  private def runFwd(left: Seq[(Int, Long)], right: Seq[(Int, Long, String, Long)]) = {
    val l = left.toDF("k", "ts")
    val r = right.toDF("k", "rts", "v", "rid")
    AsofJoin(l, r, "k", "k", "ts", "rts", Seq("v", "rid"), "rid",
        direction = "forward")
      .collect().map(row => (row.getInt(0), row.getLong(1),
        Option(row.getString(2)), if (row.isNullAt(3)) -1L else row.getLong(3)))
      .sortBy(t => (t._1, t._2))
  }

  test("forward: earliest at-or-after match; ties resolve to min tiebreak") {
    val out = runFwd(
      left = Seq((1, 10L), (1, 20L), (1, 30L)),
      right = Seq((1, 10L, "a", 5L), (1, 10L, "a0", 1L), (1, 25L, "b", 2L)))
    assert(out === Seq(
      (1, 10L, Some("a0"), 1L),  // equal ts counts; tie → min rid
      (1, 20L, Some("b"), 2L),   // next future row
      (1, 30L, None, -1L)))      // nothing after → null
  }

  test("forward: null left ts matches nothing (rightTs >= NULL is never true)") {
    val l = Seq((1, Option(10L)), (1, Option.empty[Long])).toDF("k", "ts")
    val r = Seq((1, 5L, "early", 1L), (1, 20L, "late", 2L)).toDF("k", "rts", "v", "rid")
    val out = AsofJoin(l, r, "k", "k", "ts", "rts", Seq("v"), "rid",
        direction = "forward")
      .collect().map(row => (Option(row.get(1)).map(_.asInstanceOf[Long]),
        Option(row.getString(2))))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (None, None),              // null ts row must NOT match
      (Some(10L), Some("late")))) // 20 is the earliest rts >= 10
  }

  test("nearest: minimal |delta|, ties to the backward candidate") {
    val l = Seq((1L, 1, 10L), (2L, 1, 100L), (3L, 2, 50L))
      .toDF("lid", "k", "ts")
    val r = Seq((1, 7L, "back", 1L), (1, 12L, "fwd", 2L),
      (1, 98L, "b2", 3L), (1, 102L, "f2", 4L)).toDF("k", "rts", "v", "rid")
    val out = AsofJoin.nearest(l, r, "k", "k", "ts", "rts",
        Seq("v"), "rid", leftId = "lid")
      .collect().map(row => (row.getLong(0), Option(row.getString(3))))
      .sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, Some("fwd")),   // |12-10| = 2 < |10-7| = 3
      (2L, Some("b2")),    // |98-100| = 2 == |102-100| = 2 → backward wins
      (3L, None)))         // key 2 has no right rows
  }

  test("keys never mix; unmatched keys yield nulls") {
    val out = run(
      left = Seq((1, 10L), (2, 10L), (3, 10L)),
      right = Seq((1, 1L, "k1", 1L), (2, 2L, "k2", 2L)))
    assert(out === Seq(
      (1, 10L, Some("k1"), 1L), (2, 10L, Some("k2"), 2L), (3, 10L, None, -1L)))
  }

  test("null right timestamps never match") {
    val l = Seq((1, 5L)).toDF("k", "ts")
    val r = Seq((1, Option.empty[Long], "x", 1L), (1, Some(3L), "y", 2L))
      .toDF("k", "rts", "v", "rid")
    val out = AsofJoin(l, r, "k", "k", "ts", "rts", Seq("v", "rid"), "rid").collect()
    assert(out.length == 1 && out.head.getString(2) == "y") // null-ts row skipped
  }

  test("property: match ts <= probe ts and is the max such ts per key") {
    val rnd = new scala.util.Random(42)
    val left = Seq.fill(200)((rnd.nextInt(5), rnd.nextInt(100).toLong))
    val right = Seq.tabulate(100)(i =>
      (rnd.nextInt(5), rnd.nextInt(100).toLong, s"v$i", i.toLong))
    val byKey = right.groupBy(_._1)
    val out = run(left, right)
    val expected = left.map { case (k, ts) =>
      val cands = byKey.getOrElse(k, Nil).filter(_._2 <= ts)
      if (cands.isEmpty) (k, ts, None, -1L)
      else {
        val best = cands.maxBy(c => (c._2, c._4))
        (k, ts, Some(best._3), best._4)
      }
    }.sortBy(t => (t._1, t._2))
    // left rows may repeat (k,ts); compare as multisets of full tuples
    assert(out.toSeq.groupBy(identity).view.mapValues(_.size).toMap ===
      expected.groupBy(identity).view.mapValues(_.size).toMap)
  }
}
