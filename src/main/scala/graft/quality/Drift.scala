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
  * Scale shape: one tiny stats aggregate plus one partial-aggregated
  * histogram groupBy over the reference (two scans — the grid must exist
  * before binning), one histogram scan over the current side; the
  * ≤ `2^bits`-row histograms are pinned and everything downstream
  * (sizes, grid join, window) works on them alone.
  */
object Drift {

  /** The chi-square statistic alone (the last bin's running total) —
    * the scalar a gate compares against a threshold. */
  def chiSquare(
      reference: DataFrame,
      current: DataFrame,
      valueCol: String,
      bits: Int = 4): Double = {
    val rows = histogramDrift(reference, current, valueCol, bits)
      .orderBy(col("bin").desc).select(col("chi2_running")).limit(1).collect()
    if (rows.isEmpty) 0.0 else rows.head.getDouble(0)
  }

  def histogramDrift(
      reference: DataFrame,
      current: DataFrame,
      valueCol: String,
      bits: Int = 4): DataFrame = {
    val buckets = 1L << bits
    // null metric values belong to neither histogram NOR the totals —
    // counting them in the sizes but not the bins would fabricate drift
    // on identical distributions
    val ref = reference.filter(col(valueCol).isNotNull)
    val cur = current.filter(col(valueCol).isNotNull)
    val stats = ref.agg(
      min(col(valueCol).cast("long")).alias("__lo"),
      max(col(valueCol).cast("long")).alias("__hi"))
    def binned(df: DataFrame) = df
      .crossJoin(broadcast(stats))
      .select(graft.ops.Layout.binExpr(valueCol, "__lo", "__hi", bits).alias("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).alias("cnt"))
    // localCheckpoint pins the ≤2^bits-row histograms so the size
    // aggregates and the grid join below reuse them instead of re-scanning
    // the corpora: reference is read twice total (stats, histogram),
    // current once
    val a = binned(ref).withColumnRenamed("cnt", "cnt_ref").localCheckpoint(true)
    val b = binned(cur).withColumnRenamed("cnt", "cnt_cur").localCheckpoint(true)
    // every non-null row lands in a (clamped) bin, so the corpus sizes
    // are the histogram totals — no extra scans, no driver action
    val sizes = broadcast(
      a.agg(sum(col("cnt_ref")).cast("double").alias("__na"))
        .crossJoin(b.agg(sum(col("cnt_cur")).cast("double").alias("__nb"))))
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
