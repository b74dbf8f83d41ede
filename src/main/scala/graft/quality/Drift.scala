package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two corpus slices (today's batch
  * vs yesterday's, or two table snapshots via `VERSION AS OF`): histogram
  * a numeric column on a shared integer grid and report per-bin
  * chi-square contributions — the standard data-quality gate for "the new
  * data doesn't look like the old data" before it reaches training.
  *
  * Built deterministic end to end so a cross-engine oracle can hash-check
  * it: bin boundaries come from the REFERENCE side's min/max with the
  * same divide-only integer binning as [[graft.ops.Layout]] (no
  * multiplication overflow), counts are exact, the expected count
  * `cntA · NB/NA` and contribution `(cntB − e)² / e` are per-bin double
  * arithmetic, and the chi-square total is a RUNNING sum over bins in bin
  * order (a window fold — sequential additions, not an unordered
  * aggregate, so the double result is reproducible anywhere). The final
  * bin's `chi2_running` is the statistic.
  *
  * Scale shape: one tiny stats aggregate on the reference, one
  * partial-aggregated groupBy per side on the bin id (≤ `2^bits` groups),
  * a broadcast-sized join of two histograms. The corpora stream through
  * once each.
  */
object Drift {

  def histogramDrift(
      reference: DataFrame,
      current: DataFrame,
      valueCol: String,
      bits: Int = 4): DataFrame = {
    val buckets = 1L << bits
    val stats = reference.agg(
      min(col(valueCol).cast("long")).alias("__lo"),
      max(col(valueCol).cast("long")).alias("__hi"))
    def binned(df: DataFrame) = df
      .crossJoin(broadcast(stats))
      .select(expr(
        s"least(greatest((CAST(`$valueCol` AS BIGINT) div " +
          s"((`__hi` div $buckets) - (`__lo` div $buckets) + 1)) - " +
          s"(`__lo` div ((`__hi` div $buckets) - (`__lo` div $buckets) + 1)), 0), " +
          s"${buckets - 1})").alias("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).alias("cnt"))
    val a = binned(reference).withColumnRenamed("cnt", "cnt_ref")
    val b = binned(current).withColumnRenamed("cnt", "cnt_cur")
    // corpus sizes stay in-plan (1-row aggregates, broadcast) — no driver
    // action inside the operator
    val sizes = broadcast(
      reference.agg(count(lit(1)).cast("double").alias("__na"))
        .crossJoin(current.agg(count(lit(1)).cast("double").alias("__nb"))))
    val grid = reference.sparkSession.range(buckets).select(col("id").alias("bin"))
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(a, Seq("bin"), "left").join(b, Seq("bin"), "left")
      .crossJoin(sizes)
      .select(col("bin"),
        coalesce(col("cnt_ref"), lit(0L)).alias("cnt_ref"),
        coalesce(col("cnt_cur"), lit(0L)).alias("cnt_cur"),
        col("__na"), col("__nb"))
      .withColumn("expected_cur", col("cnt_ref") * col("__nb") / col("__na"))
      .drop("__na", "__nb")
      .withColumn("contrib",
        when(col("expected_cur") > 0.0,
          (col("cnt_cur") - col("expected_cur")) *
            (col("cnt_cur") - col("expected_cur")) / col("expected_cur"))
          .otherwise(lit(0.0)))
      // sequential fold in bin order -> engine-reproducible double total
      .withColumn("chi2_running", sum(col("contrib")).over(w))
  }
}
