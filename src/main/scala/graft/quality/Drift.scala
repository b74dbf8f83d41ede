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
  * Scale shape: the reference pays the stats aggregate plus its
  * histogram pass, the current side one histogram pass; the
  * ≤ `2^bits`-row histograms are cached on first materialization and
  * everything downstream (sizes, grid join, window) works on them alone.
  */
object Drift {

  /** The chi-square statistic alone (the last bin's running total) — the
    * scalar a gate compares against a threshold. Returns `Double.NaN`
    * when either side has NO measurable (non-null) rows: a statistic of 0
    * there would read as "no drift" and wave arbitrary data through a
    * gate, while NaN fails every `<=` comparison. */
  def chiSquare(
      reference: DataFrame,
      current: DataFrame,
      valueCol: String,
      bits: Int = 4): Double = {
    val rows = histogramDrift(reference, current, valueCol, bits).collect()
    if (rows.isEmpty) return Double.NaN
    val nRef = rows.map(_.getAs[Long]("cnt_ref")).sum
    val nCur = rows.map(_.getAs[Long]("cnt_cur")).sum
    if (nRef == 0L || nCur == 0L) Double.NaN
    else rows.maxBy(_.getAs[Long]("bin")).getAs[Double]("chi2_running")
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
    // lazily persist the ≤2^bits-row histograms so the size aggregates and
    // the grid join reuse one materialization instead of re-scanning the
    // corpora (persist keeps the operator lazy — constructing the frame
    // runs no jobs — and keeps lineage for fault recovery)
    val a = binned(ref).withColumnRenamed("cnt", "cnt_ref")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val b = binned(cur).withColumnRenamed("cnt", "cnt_cur")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // every non-null row lands in a (clamped) bin, so the corpus sizes
    // are the histogram totals — no extra scans, no driver action
    val sizes = broadcast(
      a.agg(sum(col("cnt_ref")).cast("double").alias("__na"))
        .crossJoin(b.agg(sum(col("cnt_cur")).cast("double").alias("__nb"))))
    val grid = reference.sparkSession.range(buckets).select(col("id").alias("bin"))
    val w = graft.ops.BoundedWindow.orderBy(col("bin"))
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
