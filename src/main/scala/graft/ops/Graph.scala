package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed graph operators over edge tables.
  *
  * Design for 100 TB:
  *  - the edge list is the big table; it is aggregated ONCE into a
  *    deduplicated (src, dst, out-degree) form, persisted, and co-partitioned
  *    on `src` so every rank iteration reuses the same shuffle layout;
  *  - each PageRank iteration is one join (ranks ⋈ edges on src — ranks
  *    arrives already hash-partitioned on the key from the previous
  *    iteration's groupBy, so only the small rank table moves) plus one
  *    aggregation on dst — no driver-side adjacency, no collect;
  *  - rank arithmetic is *integer-exact*: ranks are bigints in units of
  *    1e-12, per-edge contributions use floor division (`div`), and the
  *    damping step is `base + 85 * sum div 100`. Sums of bigints are
  *    order-independent, so results are bit-identical across partitionings,
  *    retries, and engines — a floating PageRank would drift per run.
  */
object Graph {

  /** Undirected part↔supplier bipartite edges from lineitem: each distinct
    * (partkey, suppkey) pair yields both directed edges. Node ids are
    * prefixed (`p:` / `s:`) so the two key spaces cannot collide. */
  def partSupplierEdges(lineitem: DataFrame): DataFrame = {
    val pairs = lineitem
      .select(col("l_partkey").cast("long").as("p"),
        col("l_suppkey").cast("long").as("s"))
      .distinct()
    val fwd = pairs.select(concat(lit("p:"), col("p")).as("src"),
      concat(lit("s:"), col("s")).as("dst"))
    val rev = pairs.select(concat(lit("s:"), col("s")).as("src"),
      concat(lit("p:"), col("p")).as("dst"))
    fwd.unionByName(rev)
  }

  /** Fixed-iteration damped PageRank over a directed edge list.
    *
    * rank_0 = 1.0 (1e12 units) for every node with an outgoing edge;
    * rank_{t+1}(v) = 0.15 + 0.85 * Σ_{(u,v)∈E} rank_t(u) / deg(u),
    * all in exact 1e-12-unit bigint arithmetic (see object doc).
    *
    * Returns (node, rank_units) for all nodes, rank in 1e-12 units.
    */
  def pageRank(edges: DataFrame, iterations: Int): DataFrame = {
    val spark = edges.sparkSession
    // One pass over the (huge) edge table: dedup + out-degree, persisted and
    // partitioned on src — the loop below never re-reads the raw edges.
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val adj = edges.select("src", "dst").distinct()
      .join(deg, "src")
      .persist()
    adj.count() // materialize once, before the loop
    val unit = 1000000000000L // 1e12 units == rank 1.0
    val base = 150000000000L  // 0.15
    var ranks = adj.select(col("src").as("node")).distinct()
      .withColumn("r", lit(unit))
    for (_ <- 1 to iterations) {
      val contrib = adj.join(ranks, adj("src") === ranks("node"))
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy("dst").agg(sum("c").as("in_mass"))
      // Every node keeps a base rank even with no in-edges this round.
      ranks = ranks.select("node")
        .join(contrib, ranks("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit(base) +
            expr("(85 * coalesce(in_mass, cast(0 as bigint))) div 100")).as("r"))
    }
    ranks.select(col("node"), col("r").as("rank_units"))
  }

  /** Headline query: 3-iteration PageRank over the part↔supplier graph,
    * top 20 nodes. `rank_units` is exact (1e-12 units) — hash-comparable. */
  def pageRankTop(spark: SparkSession, sfDir: String, k: Int = 20): DataFrame = {
    val li = graft.queries.Parity.t(spark, sfDir, "lineitem")
    pageRank(partSupplierEdges(li), iterations = 3)
      .orderBy(col("rank_units").desc, col("node").asc)
      .limit(k)
  }
}
