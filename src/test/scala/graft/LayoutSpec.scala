package graft

import org.apache.spark.sql.functions._

import graft.functions.SketchArrayExpressions.zValue
import graft.ops.Layout

/** Z-order layout: Morton-curve goldens, binning edges, and the measurable
  * payoff — per-partition bounding boxes shrink vs any single-column sort.
  */
class LayoutSpec extends SparkSpec {

  import spark.implicits._

  test("z_value interleaves bits (Morton goldens)") {
    // (x=0b11, y=0b01), 2 bits: x bits land at even positions, y at odd:
    // out = x0<<0 | y0<<1 | x1<<2 | y1<<3 = 1 + 2 + 4 + 0 = 7
    val rows = Seq(
      (Array(3L, 1L), 2, 7L),
      (Array(0L, 0L), 4, 0L),
      (Array(1L, 0L), 1, 1L),
      (Array(0L, 1L), 1, 2L),
      (Array(5L, 6L), 3, 0x39L) // x=101,y=110 -> bits 1,0,0,1,1,1 -> 0b111001
    ).toDF("bins", "bits", "want")
    rows.collect() // force-plan once
    Seq(2, 4, 1, 3).foreach { b =>
      val got = rows.filter($"bits" === b)
        .select(zValue($"bins", b).alias("z"), $"want").collect()
      got.foreach(r => assert(r.getLong(0) == r.getLong(1), s"bits=$b"))
    }
  }

  test("z-ordering is locality-preserving: each z-quartile is one quadrant") {
    // Morton property on an 8x8 grid: z < 16 ⇔ both coords < 4, i.e. each
    // consecutive group of 16 z-sorted points covers exactly one 4x4
    // quadrant — the box-tightness that makes min/max stats selective
    val grid = spark.range(64).select(
      (col("id") / 8).cast("long").alias("x"), pmod(col("id"), lit(8)).alias("y"))
    val z = grid.select(zValue(array($"x", $"y"), 3).alias("z"), $"x", $"y")
      .orderBy("z").collect()
    assert(z.map(_.getLong(0)).distinct.length == 64) // bijection on the grid
    for (k <- 0 until 4) {
      val quad = z.slice(k * 16, (k + 1) * 16)
      val xs = quad.map(_.getLong(1)); val ys = quad.map(_.getLong(2))
      assert(xs.max - xs.min == 3 && ys.max - ys.min == 3,
        s"quartile $k spans x ${xs.min}-${xs.max}, y ${ys.min}-${ys.max}")
    }
  }

  test("withZValue bins via min/max and keeps all rows") {
    val df = Seq((0L, 100L), (10L, 200L), (20L, 300L), (30L, 400L))
      .toDF("a", "b")
    val out = Layout.withZValue(df, Seq("a", "b"), bits = 2)
    assert(out.count() == 4)
    assert(out.columns.contains("__z"))
    // min rows bin to 0 -> z 0; max rows bin to 3,3 -> z = 0b1111
    val zs = out.orderBy("a").select("__z").collect().map(_.getLong(0))
    assert(zs.head == 0L && zs.last == 15L)
  }

  test("binning survives full-range (hash-valued) columns without overflow") {
    // a column spanning nearly the whole long domain: any (v-lo) or
    // (v-lo)*2^bits spelling wraps; bins must stay in range and monotone
    val df = Seq(Long.MinValue + 1, Long.MinValue / 2, -1L, 0L, 1L,
        Long.MaxValue / 2, Long.MaxValue)
      .map((_, 0L)).toDF("h", "y")
    val out = Layout.withZValue(df, Seq("h", "y"), bits = 8)
      .orderBy("h").select("__z").collect().map(_.getLong(0))
    assert(out.forall(z => z >= 0L && z < (1L << 16)), out.toSeq)
    assert(out.zip(out.tail).forall { case (a, b) => a <= b },
      s"z not monotone in h: ${out.toSeq}")
    assert(out.distinct.length >= 5, s"wide range collapsed: ${out.toSeq}")
  }

  test("cluster shrinks per-partition bounding boxes vs single-column sort") {
    // 4096 points on a 64x64 grid, queried by BOTH dims: z-order should
    // give each range partition a compact square-ish box; sorting by x
    // alone gives thin full-height stripes (tight x, useless y)
    val pts = spark.range(4096).select(
      (col("id") / 64).cast("long").alias("x"), pmod(col("id"), lit(64)).alias("y"))
      .withColumn("r", pmod(xxhash64(col("x"), col("y")), lit(97))) // decorrelate row order
      .orderBy("r").drop("r")
    def boxArea(df: org.apache.spark.sql.DataFrame): Long =
      df.withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg(((max("x") - min("x") + 1) * (max("y") - min("y") + 1)).alias("area"))
        .agg(sum("area")).collect().head.getLong(0)
    val zArea = boxArea(Layout.cluster(pts, Seq("x", "y"), bits = 6, numPartitions = 16))
    val xArea = boxArea(pts.repartitionByRange(16, col("x")).sortWithinPartitions("x"))
    // x-sort: 16 stripes × (4-wide × 64-tall) = 4096; z-order: 16 boxes of
    // ~256 each = 4096 area in 2-d boxes of extent 16x16 = 256 -> equal
    // total? No: stripes are 4x64=256 too. The win shows on the MAX
    // per-dim extent: z boxes are ~16x16, stripes are 4x64.
    val zExtents = Layout.cluster(pts, Seq("x", "y"), bits = 6, numPartitions = 16)
      .withColumn("p", spark_partition_id())
      .groupBy("p").agg((max("y") - min("y")).alias("ey"))
      .agg(max("ey")).collect().head.getLong(0)
    val xExtents = pts.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .withColumn("p", spark_partition_id())
      .groupBy("p").agg((max("y") - min("y")).alias("ey"))
      .agg(max("ey")).collect().head.getLong(0)
    // a y-predicate can skip z-ordered partitions (each covers ~1/4 of y)
    // but never an x-stripe (each spans ALL of y)
    assert(xExtents == 63L, s"x-sort stripes should span full y, got $xExtents")
    assert(zExtents <= 31L, s"z-order partitions should cover <=half of y, got $zExtents")
    assert(zArea <= xArea * 2, s"z total box area $zArea vs stripes $xArea")
  }
}
