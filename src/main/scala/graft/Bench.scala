package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main (driver contract): runs the headline queries on
  * SPARK_GRAFT_SF_DIR at local[32] and prints one JSON line.
  *
  * Each query is executed once cold, then WARM_ITERS (3) more times, and
  * the MEDIAN warm time is reported per query and in the headline total —
  * the cold first run is dominated by one-time codegen/compilation cost
  * (measured ~2.4 s extra on the heaviest LSH stage at sf0.1) and any
  * single run can catch a GC pause or compile storm, so a lone sample
  * cannot distinguish machine noise from a real planner cost (the round-4
  * lesson: an unexplained one-run +18 % drift). The cold first-run total
  * stays visible as `cold_total`; `core19_total` sums the queries that
  * made up the round-3/4 headline set so round-over-round drift on the
  * original surface stays directly comparable.
  *
  * Queries are forced with a count() action (full execution, no result
  * materialization cost on the driver).
  */
object Bench {

  /** The round-3/4 headline set, kept intact for round-over-round
    * comparability: scan-heavy aggregate, shuffles/joins, one
    * representative of each extension family. */
  val core19: Seq[String] = Seq(
    "q_pricing_summary", "q_gold_agg", "q_gold_agg_orders",
    "q_join_broadcast", "q_join_multi", "q_tpch3", "q_tpch5", "q_silver_extract",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "sim_topk_bruteforce", "sim_topk_lsh", "sim_topk_int8",
    "text_quality", "text_langid", "text_fingerprint",
    "text_tf_rarity", "prep_corpus")

  /** Headline = core19 + the heavy round-4 shapes (the most expensive
    * TPC-H plans: multi-fact joins, outer-join histogram, correlated
    * scalar subquery, multi-way EXISTS) + the round-4/5 prep and analysis
    * operators, so the bench measures the surface CORRECTNESS added. */
  val headline: Seq[String] = core19 ++ Seq(
    "q_tpch8", "q_tpch9", "q_tpch13", "q_tpch17", "q_tpch21",
    "prep_chunk", "prep_bigram_lm",
    "prep_corpus_chunked", "text_source_overlap", "sim_cluster_sample",
    "dedup_span", "prep_dsir", "text_bm25", "q_merge_upsert",
    "text_pmi", "q_resample_ffill",
    "dedup_source_sketch", "q_funnel", "prep_token_ids", "q_cohort_retention",
    // the multimodal family's cost profile (byte-array mapPartitions over
    // binary columns) is unlike every other headline shape — watch its two
    // heaviest members
    "multimodal_decode_bands", "multimodal_audio_neardup",
    // round-6 operators: blocked Levenshtein, rare-term posting lists,
    // Matryoshka prefix funnel, hash-ring negatives, BPE pair counts
    "dedup_editdistance", "text_inverted_index", "sim_topk_matryoshka",
    "prep_negatives", "prep_bpe_pairs",
    // round-6 graph/classifier/ordering operators: the iterative PageRank
    // (multi-job loop — a cost profile nothing else in the set has), the
    // fixed-point centroid aggregate, and the two-pass global enumeration
    "q_pagerank", "sim_label_confusion", "prep_shuffle_order",
    // the mergeable count-min sketch, the capped posting-list self-join,
    // and the two-tower sparse+dense fusion
    "text_heavy_hitters", "text_sparse_cosine", "text_hybrid_rrf")

  /** Warm iterations per query; the median is reported. */
  val WarmIters = 3

  /** SparkEntry runs the sketch pipelines with the reproducible polynomial
    * hash so DuckDB can check them; the bench measures the PRODUCTION
    * default (xxhash64 — codegen'd, no per-char fold). Same code path,
    * production hash. */
  private def productionVariants: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_minhash_lsh" -> ((s, dir) =>
      ops.Dedup.minhashLsh(queries.Parity.t(s, dir, "documents"), "doc_id", "text",
        k = 3, numHashes = 32, bands = 16, minJaccard = 0.2)),
    "dedup_simhash" -> ((s, dir) =>
      ops.Dedup.simhashDups(queries.Parity.t(s, dir, "documents"), "doc_id", "text",
        maxHamming = 3)),
    "prep_corpus" -> ((s, dir) =>
      ops.TrainPrep.prepareCorpus(queries.Parity.t(s, dir, "documents"),
        "doc_id", "text", "lang"))) // default xxhash64 text fingerprint

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Engine.tune(spark)

    // warm-up: JVM/parquet-footer caches shared by every query
    try SparkEntry.queries("q_gold_agg")(spark, sfDir).count()
    catch { case _: Throwable => () }

    def time(fn: (SparkSession, String) => DataFrame): Double = {
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      (System.nanoTime() - t0) / 1e9
    }

    val results = headline.flatMap { name =>
      productionVariants.get(name).orElse(SparkEntry.queries.get(name)).map { fn =>
        val cold = time(fn)
        // the sketch pipelines persist() their signature table; drop it so
        // each warm run re-executes the full pipeline, not a cache read
        spark.catalog.clearCache()
        val warms = (1 to WarmIters).map { _ =>
          val t = time(fn); spark.catalog.clearCache(); t
        }
        val median = warms.sorted.apply(warms.size / 2)
        (name, cold, median, warms)
      }
    }
    def fmt(xs: Seq[(String, Double)]): String =
      xs.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }.mkString("{", ",", "}")
    val warmQs = fmt(results.map { case (n, _, w, _) => n -> w })
    val coldQs = fmt(results.map { case (n, c, _, _) => n -> c })
    // every warm iteration, in run order — so a median that disagrees with
    // the cold run is attributable to a specific outlier iteration instead
    // of being an unexplainable aggregate (the round-5 warm>cold lesson)
    val runsQs = results.map { case (n, _, _, ws) =>
      "\"" + n + "\":[" + ws.map(w => f"$w%.3f").mkString(",") + "]"
    }.mkString("{", ",", "}")
    val warmTotal = results.map(_._3).sum
    val coldTotal = results.map(_._2).sum
    val core19Total = results.collect { case (n, _, w, _) if core19.contains(n) => w }.sum
    println(f"""{"metric":"total","value":$warmTotal%.3f,"unit":"sec","queries":$warmQs,"cold_total":$coldTotal%.3f,"cold_queries":$coldQs,"warm_runs":$runsQs,"core19_total":$core19Total%.3f,"warm_iters":$WarmIters,"sf":"$sfDir"}""")
    spark.stop()
  }
}
