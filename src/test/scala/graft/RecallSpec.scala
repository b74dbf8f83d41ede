package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** ANN quality gates: recall@10 of the approximate searches against the
  * exact brute force on the sf0.01 embeddings (500 corpus vectors, 50
  * queries). The fixture embeddings are near-random (max pairwise cosine
  * ≈ 0.5) — the WORST case for ANN, so these floors are conservative lower
  * bounds for real clustered embeddings. Every pipeline here is
  * deterministic (murmur-mixed planes, lowest-id kmeans seeds), so the
  * measured recalls are stable across runs; floors sit just under the
  * measured values (COVERAGE.md records the full knob sweep).
  */
class RecallSpec extends SparkSpec {

  private lazy val e =
    queries.Parity.t(spark, "/root/testdata/sf0.01", "embeddings").cache()
  private lazy val q = e.filter(col("vec_id") < 50)
  private lazy val bf = {
    val x = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 10).cache()
    x.count(); x
  }

  test("srp-lsh recall: bits=3/tables=16 >= 0.95 on random embeddings") {
    val lsh = Similarity.lshTopK(e, q, "vec_id", "embedding",
      dim = 64, k = 10, bits = 3, tables = 16)
    val r = Similarity.recallAtK(lsh, bf)
    assert(r >= 0.95, f"lsh recall $r%.3f (measured 0.986 at these knobs)")
  }

  test("srp-lsh recall scales with tables: 8 tables still >= 0.8") {
    val lsh = Similarity.lshTopK(e, q, "vec_id", "embedding",
      dim = 64, k = 10, bits = 3, tables = 8)
    val r = Similarity.recallAtK(lsh, bf)
    assert(r >= 0.80, f"lsh recall $r%.3f (measured 0.864 at these knobs)")
  }

  test("ivf + kmeans-refined centroids: recall >= 0.9 probing half the cells") {
    val km = Similarity.kmeansCentroids(e, "vec_id", "embedding", 32, iters = 3)
      .cache()
    km.count()
    val ivf = Similarity.ivfTopK(e, q, "vec_id", "embedding", k = 10,
      numCentroids = 32, nprobe = 16, fitCentroids = Some(km))
    val r = Similarity.recallAtK(ivf, bf)
    assert(r >= 0.90, f"ivf_km recall $r%.3f (measured 0.908 at these knobs)")
    // kmeans refinement beats the raw lowest-id seeds at equal cost
    val raw = Similarity.ivfTopK(e, q, "vec_id", "embedding", k = 10,
      numCentroids = 32, nprobe = 16)
    assert(r >= Similarity.recallAtK(raw, bf) - 0.02)
  }

  test("int8-quantized top-k: recall >= 0.98 at refine=4 (near-exact path)") {
    val q8 = Similarity.quantizedTopK(e, q, "vec_id", "embedding", k = 10, refine = 4)
    val r = Similarity.recallAtK(q8, bf)
    assert(r >= 0.98, f"int8 recall $r%.3f — quantization noise should be ~1%%")
    // the rescored scores themselves are EXACT (same vec_cosine as brute
    // force), so every hit carries the true score
    val joined = q8.select(col("query_id"), col("corpus_id"), col("score"))
      .join(bf.select(col("query_id"), col("corpus_id"),
        col("score").alias("bf_score")), Seq("query_id", "corpus_id"))
    assert(joined.filter(col("score") =!= col("bf_score")).count() == 0)
  }

  test("matryoshka prefix funnel: 16-of-64-dim candidates, recall measured; " +
    "rescored hits carry exact scores") {
    val mr = Similarity.matryoshkaTopK(e, q, "vec_id", "embedding", k = 10,
      prefixDim = 16, refine = 4)
    val r = Similarity.recallAtK(mr, bf)
    // fixture embeddings are near-RANDOM: a 16-dim prefix carries only 1/4
    // of the signal (no MRL training concentrated it), so this floor is the
    // honest worst case — MRL-trained embeddings recall far higher
    info(f"matryoshka recall@10 = $r%.3f (prefixDim=16, refine=4)")
    assert(r >= 0.45, f"matryoshka recall $r%.3f below the random-embedding floor")
    // wider funnel monotonically recovers recall even on random embeddings
    val wide = Similarity.matryoshkaTopK(e, q, "vec_id", "embedding", k = 10,
      prefixDim = 32, refine = 8)
    assert(Similarity.recallAtK(wide, bf) >= r,
      "wider prefix + refine must not lose recall")
    // rescore uses the same exact cosine as brute force
    val joined = mr.select(col("query_id"), col("corpus_id"), col("score"))
      .join(bf.select(col("query_id"), col("corpus_id"),
        col("score").alias("bf_score")), Seq("query_id", "corpus_id"))
    assert(joined.filter(col("score") =!= col("bf_score")).count() == 0)
    // the composed int8+prefix funnel loses at most quantization noise
    // (~1 %) relative to the float prefix funnel
    val composed = Similarity.matryoshkaQuantizedTopK(e, q, "vec_id",
      "embedding", k = 10, prefixDim = 16, refine = 4)
    val rc = Similarity.recallAtK(composed, bf)
    info(f"int8+matryoshka recall@10 = $rc%.3f")
    assert(rc >= r - 0.05, f"composed funnel recall $rc%.3f fell past " +
      f"quantization noise below the float prefix funnel's $r%.3f")
  }

  test("bucketed matryoshka (ivf-on-prefix) funnel: recall measured; " +
    "probing ALL cells recovers the plain prefix funnel exactly") {
    val mr = Similarity.matryoshkaTopK(e, q, "vec_id", "embedding", k = 10,
      prefixDim = 16, refine = 4)
    val bucketed = Similarity.matryoshkaIvfTopK(e, q, "vec_id", "embedding",
      k = 10, prefixDim = 16, refine = 4, numCentroids = 16, nprobe = 4)
    val r = Similarity.recallAtK(bucketed, bf)
    val rPlain = Similarity.recallAtK(mr, bf)
    // candidate stage touches nprobe/numCentroids = 1/4 of the corpus rows
    // (× 1/4 of the bytes via the prefix) — recall gives up ground on
    // RANDOM embeddings where cells carry no structure; floor just under
    // the measured value
    info(f"ivf+matryoshka recall@10 = $r%.3f (vs plain prefix $rPlain%.3f)")
    assert(r >= 0.25, f"bucketed matryoshka recall $r%.3f below floor")
    // probing every cell = the full prefix scan: the funnel must then be
    // IDENTICAL to the plain matryoshka result, not merely close
    val allCells = Similarity.matryoshkaIvfTopK(e, q, "vec_id", "embedding",
      k = 10, prefixDim = 16, refine = 4, numCentroids = 16, nprobe = 16)
    assert(allCells.exceptAll(mr).isEmpty && mr.exceptAll(allCells).isEmpty,
      "nprobe = numCentroids must recover the unbucketed funnel exactly")
    // rescored hits carry exact scores (same vec_cosine as brute force)
    val joined = bucketed.select(col("query_id"), col("corpus_id"), col("score"))
      .join(bf.select(col("query_id"), col("corpus_id"),
        col("score").alias("bf_score")), Seq("query_id", "corpus_id"))
    assert(joined.filter(col("score") =!= col("bf_score")).count() == 0)
  }

  test("full funnel (ivf × matryoshka × int8): recall measured; probing " +
    "all cells recovers the int8 prefix funnel exactly") {
    val full = Similarity.matryoshkaIvfQuantizedTopK(e, q, "vec_id",
      "embedding", k = 10, prefixDim = 16, refine = 4,
      numCentroids = 16, nprobe = 4)
    val r = Similarity.recallAtK(full, bf)
    // the candidate scan reads 1/4 rows × 1/4 elements × 1/4 bytes = 1/64
    // of the float corpus volume (1/256 at dim-adjusted byte count); on
    // these near-random fixtures the bucketed float funnel measures ~0.29
    // and int8 costs only quantization noise — floor just under that
    val bucketedFloat = Similarity.matryoshkaIvfTopK(e, q, "vec_id",
      "embedding", k = 10, prefixDim = 16, refine = 4,
      numCentroids = 16, nprobe = 4)
    val rFloat = Similarity.recallAtK(bucketedFloat, bf)
    info(f"ivf×mrl×int8 recall@10 = $r%.3f (float-prefix bucketed $rFloat%.3f)")
    assert(r >= 0.25, f"full funnel recall $r%.3f below the random-embedding floor")
    assert(r >= rFloat - 0.05,
      f"int8 codes cost $r%.3f vs $rFloat%.3f — more than quantization noise")
    // nprobe = numCentroids must recover the UNBUCKETED int8 prefix funnel
    // exactly: same candidates, same rescore
    val allCells = Similarity.matryoshkaIvfQuantizedTopK(e, q, "vec_id",
      "embedding", k = 10, prefixDim = 16, refine = 4,
      numCentroids = 16, nprobe = 16)
    val unbucketed = Similarity.matryoshkaQuantizedTopK(e, q, "vec_id",
      "embedding", k = 10, prefixDim = 16, refine = 4)
    assert(allCells.exceptAll(unbucketed).isEmpty &&
      unbucketed.exceptAll(allCells).isEmpty,
      "nprobe = numCentroids must recover the unbucketed int8 funnel exactly")
    // rescored hits carry exact scores (same vec_cosine as brute force)
    val joined = full.select(col("query_id"), col("corpus_id"), col("score"))
      .join(bf.select(col("query_id"), col("corpus_id"),
        col("score").alias("bf_score")), Seq("query_id", "corpus_id"))
    assert(joined.filter(col("score") =!= col("bf_score")).count() == 0)
  }

  test("product quantization: recall measured; full-corpus refine recovers " +
    "brute force exactly; rescored hits carry exact scores") {
    val pq = Similarity.pqTopK(e, q, "vec_id", "embedding", k = 10,
      numSub = 4, numCodes = 16, refine = 4)
    val r = Similarity.recallAtK(pq, bf)
    // 16 untrained (lowest-id-seed) codes per subspace on near-RANDOM
    // embeddings is PQ's worst case — trained sub-codebooks on clustered
    // embeddings recall far higher; the floor documents the honest bound
    info(f"pq recall@10 = $r%.3f (4 sub × 16 codes, refine=4)")
    assert(r >= 0.40, f"pq recall $r%.3f below the random-embedding floor " +
      "(measured 0.450 at these knobs)")
    // a refine window covering the whole corpus makes the candidate set
    // total, so the exact rescore IS brute force — bit-identical
    val full = Similarity.pqTopK(e, q, "vec_id", "embedding", k = 10,
      numSub = 4, numCodes = 16, refine = 50)
    assert(Similarity.recallAtK(full, bf) == 1.0,
      "full-corpus refine must recover the exact top-k")
    // rescore uses the same exact cosine as brute force
    val joined = pq.select(col("query_id"), col("corpus_id"), col("score"))
      .join(bf.select(col("query_id"), col("corpus_id"),
        col("score").alias("bf_score")), Seq("query_id", "corpus_id"))
    assert(joined.filter(col("score") =!= col("bf_score")).count() == 0)
  }

  test("multi-probe lsh: numProbes=0 IS lshTopK; probing lifts recall " +
    "monotonically without touching the corpus-side index") {
    val base = Similarity.lshTopK(e, q, "vec_id", "embedding",
      dim = 64, k = 10, bits = 5, tables = 8)
    val zero = Similarity.lshTopKMultiProbe(e, q, "vec_id", "embedding",
      dim = 64, k = 10, bits = 5, tables = 8, numProbes = 0)
    assert(zero.exceptAll(base).isEmpty && base.exceptAll(zero).isEmpty,
      "numProbes=0 must equal plain lshTopK bit-for-bit")
    val r0 = Similarity.recallAtK(base, bf)
    val r2 = Similarity.recallAtK(Similarity.lshTopKMultiProbe(e, q,
      "vec_id", "embedding", dim = 64, k = 10, bits = 5, tables = 8,
      numProbes = 2), bf)
    val r4 = Similarity.recallAtK(Similarity.lshTopKMultiProbe(e, q,
      "vec_id", "embedding", dim = 64, k = 10, bits = 5, tables = 8,
      numProbes = 4), bf)
    info(f"lsh recall@10: probes 0 → $r0%.3f, 2 → $r2%.3f, 4 → $r4%.3f " +
      "(bits=5, tables=8)")
    // candidates are supersets of the base candidates → recall can only rise
    assert(r2 >= r0 && r4 >= r2, f"recall must be monotone: $r0 $r2 $r4")
    assert(r4 > r0, "probing 4 flip buckets must recover some misses at " +
      "bits=5/tables=8 (base recall 0.736 leaves room)")
  }

  test("ivf × pq (IVFADC): recall measured; nprobe = numCentroids " +
    "recovers the unbucketed PQ search bit-for-bit") {
    val ivfpq = Similarity.ivfPqTopK(e, q, "vec_id", "embedding", k = 10,
      numCentroids = 16, nprobe = 4, numSub = 4, numCodes = 16, refine = 4)
    val r = Similarity.recallAtK(ivfpq, bf)
    info(f"ivf-pq recall@10 = $r%.3f (16 cells/nprobe=4, 4 sub × 16 codes)")
    assert(r >= 0.40, f"ivf-pq recall $r%.3f below the random-embedding " +
      "floor (measured 0.468 at these knobs)")
    // probing every cell removes the coarse pruning entirely: the pair
    // stream equals pqTopK's and the outputs must match bit-for-bit
    val full = Similarity.ivfPqTopK(e, q, "vec_id", "embedding", k = 10,
      numCentroids = 16, nprobe = 16, numSub = 4, numCodes = 16, refine = 4)
    val pq = Similarity.pqTopK(e, q, "vec_id", "embedding", k = 10,
      numSub = 4, numCodes = 16, refine = 4)
    assert(full.exceptAll(pq).isEmpty && pq.exceptAll(full).isEmpty,
      "full-probe ivf-pq must equal the flat pq search exactly")
  }

  test("int8 quantization error is bounded by scale/2 per element") {
    val q8 = Similarity.quantize(e, "vec_id", "embedding")
    val err = q8.join(e, "vec_id")
      .select(array_max(zip_with(col("q8_codes"), col("embedding"),
        (c, x) => abs(c.cast("double") * col("q8_scale") - x.cast("double"))))
        .alias("maxerr"), col("q8_scale"))
      .filter(col("maxerr") > col("q8_scale") * 0.5000001)
    assert(err.count() == 0, "reconstruction error exceeded half a quantization step")
    // codes stay in int8 range
    val outOfRange = q8.select(explode(col("q8_codes")).alias("c"))
      .filter(col("c") > 127 || col("c") < -127)
    assert(outOfRange.count() == 0)
  }

  test("recallAtK sanity: exact-vs-exact is 1.0, disjoint is 0.0") {
    assert(Similarity.recallAtK(bf, bf) == 1.0)
    val shifted = bf.withColumn("corpus_id", col("corpus_id") + 100000)
    assert(Similarity.recallAtK(shifted, bf) == 0.0)
  }

  test("approx_count_distinct (HLL) stays inside 5% of the exact count") {
    val d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(col("doc_id"), explode(split(col("text"), " ")).alias("w"))
      .withColumn("k", concat(col("w"), lit("-"), col("doc_id")))
    val exact = d.select(countDistinct(col("k"))).collect().head.getLong(0)
    val approx = d.select(approx_count_distinct(col("k"), 0.02)).collect().head.getLong(0)
    val err = math.abs(approx - exact).toDouble / exact
    assert(err <= 0.05, s"HLL err $err (exact=$exact approx=$approx)")
  }

  test("approx_percentile stays inside its rank-error bound vs exact") {
    // the 100 TB single-pass percentile (Greenwald-Khanna, accuracy 1/eps
    // = 1000 -> rank error <= n/1000); the exact sort-based percentile is
    // the oracle-checked variant (q_percentiles) — this gates the scale
    // path's accuracy against it
    val o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
      .select(col("o_totalprice").alias("v"))
    val n = o.count()
    val sorted = o.orderBy("v").collect().map(_.getDouble(0))
    val row = o.agg(
      expr("approx_percentile(v, 0.5, 1000)").alias("p50"),
      expr("approx_percentile(v, 0.9, 1000)").alias("p90")).collect().head
    for ((q, got) <- Seq(0.5 -> row.getDouble(0), 0.9 -> row.getDouble(1))) {
      val rank = sorted.indexWhere(_ >= got)
      val err = math.abs(rank - q * n) / n.toDouble
      assert(err <= 0.002, s"approx p$q rank error $err exceeds 2x eps")
    }
  }
}
