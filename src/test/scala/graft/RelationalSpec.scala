package graft

import org.apache.spark.sql.functions._

import graft.ops.Relational

/** As-of join, sessionization, top-N — hand-computable goldens. */
class RelationalSpec extends SparkSpec {

  import spark.implicits._

  test("asof join matches latest right time <= left time per key") {
    val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (2L, 5L, "p3"))
      .toDF("k", "t", "payload")
    val right = Seq((1L, 8L), (1L, 15L), (1L, 25L), (2L, 9L)).toDF("k", "t")
    val out = Relational.asofJoinTime(left, right, "k", "t", "t")
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("t")) ->
        (if (r.isNullAt(r.fieldIndex("asof_time"))) None else Some(r.getAs[Long]("asof_time")))).toMap
    assert(out((1L, 10L)) == Some(8L))   // 8 <= 10 < 15
    assert(out((1L, 20L)) == Some(15L))  // 15 <= 20 < 25
    assert(out((2L, 5L)) == None)        // no right row at/before 5
  }

  test("asof join: equal timestamps match (right sorts before left on ties)") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 10L)).toDF("k", "t")
    val out = Relational.asofJoinTime(left, right, "k", "t", "t").collect().head
    assert(out.getAs[Long]("asof_time") == 10L)
  }

  test("sessionize splits on gap, 1-based ids, ordered") {
    val df = Seq(
      (1L, 100L, 1L), (1L, 150L, 2L), (1L, 500L, 3L), (1L, 520L, 4L),
      (2L, 10L, 5L)).toDF("k", "t", "id")
    val out = Relational.sessionize(df, "k", "t", "id", gap = 100L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("session_id")).toMap
    assert(out(1L) == 1L && out(2L) == 1L) // 150-100=50 <= 100: same session
    assert(out(3L) == 2L && out(4L) == 2L) // 500-150=350 > 100: new session
    assert(out(5L) == 1L)
  }

  test("salted join is row-identical to the plain join") {
    val fact = Seq((1L, 100L, 5.0), (1L, 101L, 6.0), (1L, 102L, 7.0), (2L, 103L, 8.0))
      .toDF("k", "row_id", "v")
    val dim = Seq((1L, "hot"), (2L, "cold"), (3L, "unused")).toDF("k", "name")
    val plain = fact.join(dim, "k").select("row_id", "name")
      .collect().map(_.toString).sorted.toSeq
    val salted = Relational.saltedJoin(fact, dim, "k", "row_id", nSalts = 4)
      .select("row_id", "name").collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
  }

  test("range join matches the naive BETWEEN join and plans an equi-join") {
    val points = Seq((1L, 5.0), (2L, 150.0), (3L, 250.0), (4L, -10.0), (5L, 99.999))
      .toDF("pid", "v")
    val intervals = Seq((10L, 0.0, 100.0), (11L, 90.0, 200.0), (12L, 240.0, 260.0))
      .toDF("iid", "lo", "hi")
    val binned = Relational.rangeJoin(points, "v", intervals, "lo", "hi", binWidth = 50.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(intervals, col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == naive)
    assert(naive == Set((1L, 10L), (2L, 11L), (3L, 12L), (5L, 10L), (5L, 11L)))
    // the whole point: an equi-join on the bin, not a nested loop
    val plan = Relational.rangeJoin(points, "v", intervals, "lo", "hi", 50.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("topN per group respects ordering and tie-break") {
    val df = Seq(
      ("a", 1L, 30.0), ("a", 2L, 30.0), ("a", 3L, 10.0), ("a", 4L, 40.0),
      ("b", 5L, 1.0)).toDF("g", "id", "v")
    val out = Relational.topNPerGroup(df, "g", col("v").desc, "id", 2)
      .select("g", "rn", "id").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out(("a", 1)) == 4L) // highest v
    assert(out(("a", 2)) == 1L) // tie at 30.0 -> lower id wins
    assert(out(("b", 1)) == 5L)
  }

  test("scd2 merge: closes changed rows, skips no-ops, keeps closed history") {
    // key 1: open A since t=0; updates B@10 (change), B@20 (no-op), C@30
    // key 2: open X since t=0; update X@15 is a no-op -> single open row
    // key 3: new key, first seen at t=5
    // key 9: already-closed history must pass through untouched
    val history = Seq(
      (1L, "A", 0L, Option.empty[Long], true),
      (2L, "X", 0L, Option.empty[Long], true),
      (9L, "old", 0L, Some(50L), false)
    ).toDF("key", "state", "valid_from", "valid_to", "is_current")
    val updates = Seq(
      (1L, "B", 10L, 1L), (1L, "B", 20L, 2L), (1L, "C", 30L, 3L),
      (2L, "X", 15L, 4L),
      (3L, "N", 5L, 5L)
    ).toDF("key", "state", "ts", "tie")
    val out = Relational.scd2Merge(history, updates, "key", Seq("state"), "ts", "tie")
      .collect().map(r => (r.getAs[Long]("key"), r.getAs[String]("state"),
        r.getAs[Long]("valid_from"),
        Option(r.getAs[Any]("valid_to")).map(_.asInstanceOf[Long]),
        r.getAs[Boolean]("is_current"))).toSet
    assert(out == Set(
      (1L, "A", 0L, Some(10L), false),
      (1L, "B", 10L, Some(30L), false), // B@20 no-op collapsed
      (1L, "C", 30L, None, true),
      (2L, "X", 0L, None, true),        // no-op update leaves the open row
      (3L, "N", 5L, None, true),
      (9L, "old", 0L, Some(50L), false)))
  }

  test("scd2 merge: multi-attribute change detection via struct equality") {
    val history = Seq((1L, "a", 10, 0L, Option.empty[Long], true))
      .toDF("key", "s1", "s2", "valid_from", "valid_to", "is_current")
    val updates = Seq(
      (1L, "a", 10, 5L, 1L),  // identical pair -> no-op
      (1L, "a", 11, 6L, 2L))  // second attr changes -> new version
      .toDF("key", "s1", "s2", "ts", "tie")
    val out = Relational.scd2Merge(history, updates, "key", Seq("s1", "s2"), "ts", "tie")
      .collect().map(r => (r.getAs[String]("s1"), r.getAs[Int]("s2"),
        r.getAs[Boolean]("is_current"))).toSet
    assert(out == Set(("a", 10, false), ("a", 11, true)))
  }

  test("resampleFill: gaps filled forward, last observation per period wins") {
    val df = Seq(
      (1L, 3L, 1L, 10.0),   // period 0
      (1L, 7L, 2L, 11.0),   // period 0, later -> wins
      (1L, 25L, 3L, 20.0),  // period 2; period 1 is a gap
      (2L, 42L, 4L, 5.0))   // single-period key
      .toDF("k", "t", "id", "v")
    val out = Relational.resampleFill(df, "k", "t", "id", "v", period = 10L)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Long]("period")) ->
        ((r.getAs[Double]("v"), r.getAs[Boolean]("is_observed")))).toMap
    assert(out == Map(
      (1L, 0L) -> ((11.0, true)),
      (1L, 1L) -> ((11.0, false)),  // gap carries period 0's last value
      (1L, 2L) -> ((20.0, true)),
      (2L, 4L) -> ((5.0, true))))
  }

  test("mergeUpsert: latest change wins, deletes drop, untouched base kept") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (1L, "a1", 1L, "upsert"),  // overwritten by seq 2
      (1L, "a2", 2L, "upsert"),
      (2L, "xx", 1L, "delete"),  // key 2 removed
      (4L, "d", 1L, "upsert"))   // pure insert
      .toDF("k", "v", "seq", "op")
    val out = Relational.mergeUpsert(base, changes, "k", "seq", "op")
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("v")).toMap
    assert(out == Map(1L -> "a2", 3L -> "c", 4L -> "d"))
  }

  test("mergeUpsert: delete then re-upsert at a later seq resurrects the key") {
    val base = Seq((1L, "a")).toDF("k", "v")
    val changes = Seq((1L, "x", 1L, "delete"), (1L, "b", 2L, "upsert"))
      .toDF("k", "v", "seq", "op")
    val out = Relational.mergeUpsert(base, changes, "k", "seq", "op")
      .collect().map(r => r.getAs[String]("v")).toSeq
    assert(out == Seq("b"))
  }
}
