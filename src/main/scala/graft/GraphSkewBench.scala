package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale evidence for the graph family (SCALE.md §graph-skew): measures
  * the two designed-out failure shapes on graphs built to trigger them.
  *
  *  1. TRIANGLES on a hub graph: one "celebrity" node of degree `hub`
  *     (the power-law tail) among `m` random background edges. The naive
  *     id-oriented wedge join enumerates hub²/2 wedges — all in ONE task,
  *     Suri & Vassilvitskii's curse of the last reducer — while degree
  *     orientation ([[graft.ops.Graph.triangleCounts]]) bounds every
  *     out-degree by O(√m) and spreads the same triangles across the
  *     cluster. Identical per-node counts are asserted.
  *
  *  2. COMPONENTS on long chains: `n` nodes arranged in chains of length
  *     `D`. Pure min-label propagation ([[graft.ops.Dedup.clusters]])
  *     needs D rounds of 2 shuffles; pointer doubling
  *     ([[graft.ops.Dedup.clustersFast]]) needs ~log₂ D rounds of 3 —
  *     the doubling overhead loses at tiny D and wins without bound as
  *     chains grow. Identical labellings are asserted.
  *
  * usage: runMain graft.GraphSkewBench [m=5000000] [hub=10000] [n=2000000]
  */
object GraphSkewBench {
  def main(args: Array[String]): Unit = {
    val m = if (args.length > 0) args(0).toLong else 5000000L
    val hub = if (args.length > 1) args(1).toLong else 10000L
    val n = if (args.length > 2) args(2).toLong else 2000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Engine.tune(spark)

    def time[A](fn: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = fn
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // ── 1. hub-graph triangles: degree orientation vs id orientation ────
    // node 1 is the hub (lowest id in the graph, so id orientation points
    // every hub edge OUT of it); background edges land on 2..nodes+1
    val nodes = m / 5 // avg background degree 10 — plenty of triangles
    val hubEdges = spark.range(2, hub + 2)
      .select(lit(1L).as("id_a"), col("id").as("id_b"))
    val background = spark.range(m).select(
        (pmod(xxhash64(col("id"), lit(1)), lit(nodes)) + 2).as("id_a"),
        (pmod(xxhash64(col("id"), lit(2)), lit(nodes)) + 2).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
    val pairs = hubEdges.unionByName(background).localCheckpoint(false)

    // the naive baseline: orient by ID ONLY — the hub (smallest id) keeps
    // its full degree as out-degree, so the wedge self-join materializes
    // hub·(hub−1)/2 candidates inside the hub's single join key
    def naiveTriangles(p: DataFrame): DataFrame = {
      val ce = p.select(
          least(col("id_a"), col("id_b")).as("src"),
          greatest(col("id_a"), col("id_b")).as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
      val wedges = ce.select(col("src"), col("dst").as("a"))
        .join(ce.select(col("src"), col("dst").as("b")), "src")
        .filter(col("a") < col("b"))
        .select(col("src"), col("a"), col("b"))
      wedges.join(ce.select(col("src").as("a"), col("dst").as("b")), Seq("a", "b"))
        .select(explode(array(col("src"), col("a"), col("b"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    }

    val (orientedRows, tOriented) =
      time(ops.Graph.triangleCounts(pairs).localCheckpoint(false))
    val oTotal = orientedRows.agg(sum("n_triangles")).collect()(0).getLong(0)
    println(f"[graphskew] triangles oriented: $tOriented%.2f s " +
      f"($m edges, hub degree $hub, triangle-slots $oTotal)")
    val (naiveRows, tNaive) = time(naiveTriangles(pairs).localCheckpoint(false))
    println(f"[graphskew] triangles id-oriented (last-reducer): $tNaive%.2f s")
    println(f"[graphskew] triangle speedup ${tNaive / tOriented}%.2fx")
    val mismatch = orientedRows.withColumnRenamed("n_triangles", "a")
      .join(naiveRows.withColumnRenamed("n_triangles", "b"), Seq("node"), "full")
      .filter(coalesce(col("a"), lit(-1)) =!= coalesce(col("b"), lit(-1))).count()
    assert(mismatch == 0, s"per-node triangle counts diverged: $mismatch")
    pairs.unpersist()

    // ── 2. chain components: pointer doubling vs pure propagation ───────
    for (d <- Seq(8L, 64L)) {
      val chainPairs = spark.range(n)
        .filter(pmod(col("id"), lit(d)) =!= (d - 1))
        .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
        .localCheckpoint(false)
      val ((fast, fastRounds), tFast) =
        time(ops.Dedup.clustersFastCounted(chainPairs, maxIter = 50))
      val fc = fast.localCheckpoint(false); fc.count()
      println(f"[graphskew] components D=$d doubling: $tFast%.2f s " +
        f"($fastRounds rounds, $n nodes)")
      val ((slow, slowRounds), tSlow) =
        time(ops.Dedup.clustersCounted(chainPairs, maxIter = d.toInt + 2))
      val sc = slow.localCheckpoint(false); sc.count()
      println(f"[graphskew] components D=$d propagation: $tSlow%.2f s " +
        f"($slowRounds rounds)")
      println(f"[graphskew] components D=$d speedup ${tSlow / tFast}%.2fx")
      val diff = fc.withColumnRenamed("cluster_id", "a")
        .join(sc.withColumnRenamed("cluster_id", "b"), Seq("id"))
        .filter(col("a") =!= col("b")).count()
      assert(diff == 0, s"labellings diverged at D=$d: $diff")
      chainPairs.unpersist(); fc.unpersist(); sc.unpersist()
    }
    spark.stop()
  }
}
