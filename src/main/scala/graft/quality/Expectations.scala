package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations — the engine-native realization of the
  * reference's declared (but unimplemented) Great Expectations monitoring
  * plan (reference: docs/data_quality.md; its unit tests assert the same
  * properties ad hoc — schema columns, non-null ids, value domains).
  *
  * Design for scale: ALL expectations over a table evaluate in ONE
  * aggregate pass — each rule contributes a conditional-count slot to a
  * single `agg`, so a 100-rule suite costs exactly one scan + one 1-row
  * partial-aggregated reduction, not 100 jobs (the failure mode of
  * validate-per-rule frameworks at 100 TB). The report explodes from that
  * single row; nothing collects to the driver.
  */
object Expectations {

  sealed trait Expectation {
    def rule: String
    def column: String
    /** Aggregate expression counting violating rows (nulls violate only
      * `notNull` — matching GE's null-tolerant column expectations). */
    def violations: Column
  }

  final case class NotNull(column: String) extends Expectation {
    val rule = "not_null"
    def violations: Column =
      coalesce(sum(when(col(column).isNull, 1L)), lit(0L))
  }

  /** Violations = duplicate copies among non-null values
    * (`count(col) - count(DISTINCT col)`). */
  final case class Unique(column: String) extends Expectation {
    val rule = "unique"
    def violations: Column = count(col(column)) - countDistinct(col(column))
  }

  final case class Between(column: String, lo: Double, hi: Double) extends Expectation {
    val rule = "between"
    def violations: Column =
      coalesce(sum(when(col(column) < lo || col(column) > hi, 1L)), lit(0L))
  }

  /** Partial-match semantics (Spark `rlike` == DuckDB `regexp_matches`);
    * anchor the pattern for full-string checks. */
  final case class MatchesRegex(column: String, pattern: String) extends Expectation {
    val rule = "matches_regex"
    def violations: Column =
      coalesce(sum(when(col(column).isNotNull && !col(column).rlike(pattern), 1L)), lit(0L))
  }

  final case class InSet(column: String, values: Seq[String]) extends Expectation {
    val rule = "in_set"
    def violations: Column =
      coalesce(sum(when(col(column).isNotNull && !col(column).isin(values: _*), 1L)),
        lit(0L))
  }

  /** One report row per expectation: (rule, column, n_rows, n_violations,
    * passed) — computed in a single scan. */
  def report(df: DataFrame, expectations: Seq[Expectation]): DataFrame = {
    require(expectations.nonEmpty, "no expectations given")
    val aggs = count(lit(1)).alias("__n") +:
      expectations.zipWithIndex.map { case (e, i) => e.violations.alias(s"__v$i") }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = expectations.zipWithIndex.map { case (e, i) =>
      struct(
        lit(e.rule).alias("rule"),
        lit(e.column).alias("column"),
        col("__n").alias("n_rows"),
        col(s"__v$i").alias("n_violations"),
        (col(s"__v$i") === 0L).alias("passed"))
    }
    one.select(explode(array(rows: _*)).alias("r")).select(col("r.*"))
  }

  /** True iff every expectation holds — the gate a pipeline run checks
    * before promoting a layer (reference DAG semantics: fail the run, not
    * silently ship bad data). */
  def validate(df: DataFrame, expectations: Seq[Expectation]): Boolean =
    report(df, expectations).filter(!col("passed")).isEmpty
}
