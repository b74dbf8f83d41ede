package graft

import graft.quality.Expectations._

/** Data-quality expectations: golden violation counts, the pass/fail gate,
  * and the one-scan-per-suite plan property.
  */
class QualitySpec extends SparkSpec {

  import spark.implicits._

  private lazy val dirty = Seq(
    (1L, Option("a"), 5.0, Option("123-456"), "X"),
    (2L, Option.empty[String], 50.0, Option("abc"), "Y"),
    (2L, Option("c"), -5.0, Option.empty[String], "X")
  ).toDF("id", "name", "bal", "phone", "seg")

  test("violation counts per rule are exact") {
    val rep = report(dirty, Seq(
      NotNull("name"), Unique("id"), Between("bal", 0.0, 10.0),
      MatchesRegex("phone", "^[0-9-]+$"), InSet("seg", Seq("X"))))
      .collect().map(r => r.getAs[String]("rule") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_violations"), r.getAs[Boolean]("passed"))).toMap
    assert(rep("not_null") == (3L, 1L, false))
    assert(rep("unique") == (3L, 1L, false)) // one duplicate copy of id 2
    assert(rep("between") == (3L, 2L, false)) // 50.0 and -5.0
    assert(rep("matches_regex") == (3L, 1L, false)) // "abc"; null not counted
    assert(rep("in_set") == (3L, 1L, false)) // "Y"
  }

  test("validate gates a promotion: false on dirty, true on clean") {
    assert(!validate(dirty, Seq(NotNull("name"))))
    assert(validate(dirty.filter($"name".isNotNull), Seq(NotNull("name"))))
  }

  test("a whole suite evaluates in one scan of the table") {
    val scans = SparkEntry.queries("quality_report")(spark, "/root/testdata/sf0.001")
      .queryExecution.sparkPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
    assert(scans.size == 1, s"expected a single table scan for 5 rules, got $scans")
    // and only the checked columns are read
    assert(!scans.head.schema.fieldNames.contains("c_nationkey"))
  }

  test("drift: unmeasurable inputs yield NaN (gates must fail closed)") {
    import spark.implicits._
    val ref = (1L to 100L).map(i => Some(i % 10)).toDF("v")
    val allNull = Seq.fill(20)(Option.empty[Long]).toDF("v")
    assert(graft.quality.Drift.chiSquare(ref, allNull, "v").isNaN)
    assert(graft.quality.Drift.chiSquare(allNull, ref, "v").isNaN)
    // null rows in a measurable corpus are excluded from bins AND totals
    val mixed = ((1L to 50L).map(i => Some(i % 10)) ++ Seq.fill(50)(Option.empty[Long]))
      .toDF("v")
    val chi = graft.quality.Drift.chiSquare(ref, mixed, "v")
    assert(!chi.isNaN && chi < 1.0, s"same shape with nulls should be ~0, got $chi")
  }

  test("drift: identical distributions score ~0, a shift scores high") {
    import spark.implicits._
    val ref = (1L to 400L).map(i => i % 100).toDF("v")
    val same = (1L to 200L).map(i => i % 100).toDF("v")
    val shifted = (1L to 200L).map(i => 50 + i % 50).toDF("v")
    def chi2(cur: org.apache.spark.sql.DataFrame): Double =
      graft.quality.Drift.histogramDrift(ref, cur, "v", bits = 4)
        .orderBy(org.apache.spark.sql.functions.col("bin").desc)
        .select("chi2_running").collect().head.getDouble(0)
    val low = chi2(same)
    val high = chi2(shifted)
    assert(low < 1.0, s"identical-shape drift should be ~0, got $low")
    assert(high > 100.0, s"half-range shift should dominate, got $high")
    // all rows binned: counts conserve
    val rows = graft.quality.Drift.histogramDrift(ref, shifted, "v", bits = 4).collect()
    assert(rows.map(_.getAs[Long]("cnt_ref")).sum == 400L)
    assert(rows.map(_.getAs[Long]("cnt_cur")).sum == 200L)
  }
}
