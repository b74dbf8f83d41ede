package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.SketchArrayExpressions.zValue

/** Multi-dimensional data layout: Z-order (Morton-curve) clustering.
  *
  * Partition pruning handles ONE dimension (the partition column); sorting
  * within files handles one more. A table queried by several independent
  * predicates — `(user_id BETWEEN …)` AND `(value BETWEEN …)` — gets tight
  * file-level min/max statistics in ALL those columns at once only when
  * rows are laid out along a space-filling curve. That's this operator:
  * bin each clustering column into `2^bits` integer buckets (linear
  * min/max binning — one tiny stats aggregate, broadcast back), interleave
  * the bin bits into a z-value ([[graft.functions.ZValueArray]], a
  * codegen'd per-row expression), and range-partition + sort by it.
  *
  * At 100 TB the cost is one stats pass + one range shuffle — the same
  * price as any repartition — and the payoff is parquet row-group/file
  * skipping on every clustered dimension (the engine-side mechanics are
  * identical to Delta/Iceberg `ZORDER BY`). Bounding-box shrinkage is
  * measured in LayoutSpec: z-ordered partitions' per-dimension extent
  * product is a fraction of any single-column sort's.
  */
object Layout {

  /** Integer bin of column `c` into `[0, 2^bits)` given its min/max:
    * exact integer arithmetic (SQL `div`), engine-reproducible, monotone,
    * clamped into range. Overflow-proof for the FULL long domain — both
    * the multiply-first spelling ((v-lo)·2^bits) and even a plain (v-lo)
    * wrap when the observed range spans more than half the long domain
    * (xxhash64-valued columns, epoch-nanos), silently producing garbage
    * bins. So: width = hi div 2^bits - lo div 2^bits + 1 (each div
    * shrinks before subtracting), bin = v div width - lo div width —
    * truncated division is monotone, and when width = 1 the range is
    * necessarily < 2^bits so the subtraction is small. Boundary effects
    * can land a value one past the top bin; the least/greatest clamp
    * keeps [0, 2^bits) while preserving monotonicity. */
  private def bin(c: String, bits: Int): Column =
    binExpr(c, s"__lo_$c", s"__hi_$c", bits)

  /** The overflow-proof integer bin as a reusable expression over named
    * columns — shared with [[graft.quality.Drift]] so layout clustering
    * and drift histograms can never bin differently. */
  private[graft] def binExpr(
      valueCol: String, loCol: String, hiCol: String, bits: Int): Column = {
    val buckets = 1L << bits
    val w = s"((`$hiCol` div $buckets) - (`$loCol` div $buckets) + 1)"
    expr(s"least(greatest((CAST(`$valueCol` AS BIGINT) div $w) - (`$loCol` div $w), 0), " +
      s"${buckets - 1})")
  }

  /** Append `zCol`: the z-value over `cols` (each linearly binned into
    * `2^bits` buckets from its observed min/max). One stats aggregate
    * (1 row, broadcast) + one narrow projection. */
  def withZValue(
      df: DataFrame,
      cols: Seq[String],
      bits: Int,
      zCol: String = "__z"): DataFrame = {
    require(cols.nonEmpty && cols.size * bits <= 63,
      s"z-order: ${cols.size} cols × $bits bits must fit in 63 bits")
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("long")).alias(s"__lo_$c"),
      max(col(c).cast("long")).alias(s"__hi_$c")))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    val bins = array(cols.map(c => bin(c, bits)): _*)
    df.crossJoin(broadcast(stats))
      .withColumn(zCol, zValue(bins, bits))
      .drop(cols.flatMap(c => Seq(s"__lo_$c", s"__hi_$c")): _*)
  }

  /** Cluster `df` for multi-dimensional locality: range-partition into
    * `numPartitions` by z-value and sort within partitions — each output
    * partition (→ file, when written) covers a compact hyper-rectangle of
    * the clustered space. The z column is dropped; layout is the output. */
  def cluster(
      df: DataFrame,
      cols: Seq[String],
      bits: Int,
      numPartitions: Int): DataFrame =
    withZValue(df, cols, bits)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
}
