package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers:
  *  - [[bruteForceTopK]]: exact cosine top-k via broadcast of the (small)
  *    query set — the baseline, and the right answer whenever the query set
  *    fits in an executor (queries × corpus is embarrassingly parallel, no
  *    corpus shuffle at all);
  *  - [[lshTopK]]: random-hyperplane (SRP) LSH bucketing — candidate
  *    generation becomes an equi-join on bucket keys, so the corpus is only
  *    ever shuffled by bucket, never crossed. The 100 TB path: bucket sizes
  *    are tunable via `bits`, and re-scoring within buckets is exact.
  *
  * All arithmetic is double-precision left-to-right folds over the float
  * values — deterministic, and reproducible by any engine that evaluates
  * the same fold (see SparkEntry.oracleSql).
  */
object Similarity {

  /** Dot product — native codegen'd expression ([[graft.functions.VecDot]]);
    * left-to-right double accumulation, same result as the HOF fold below. */
  def dot(a: Column, b: Column): Column = graft.functions.VectorFunctions.dot(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine — one-pass native expression ([[graft.functions.VecCosine]]). */
  def cosine(a: Column, b: Column): Column = graft.functions.VectorFunctions.cosine(a, b)

  /** Reference implementations via composable higher-order functions — used
    * in tests to cross-check the native expressions; 3 interpreted array
    * passes per row vs the native single codegen'd loop. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def cosineHof(a: Column, b: Column): Column =
    dotHof(a, b) / (sqrt(dotHof(a, a)) * sqrt(dotHof(b, b)))

  /** Exact top-k neighbors for each query row, by cosine similarity.
    *
    * `queries` (small — broadcast) × `corpus` (huge — never shuffled until
    * the final per-query top-k, which is a rank over ~k×|queries| rows after
    * per-partition pruning by the window's rank filter).
    * Ties broken by corpus id for full determinism.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).alias("corpus_id"), col(vecCol).alias("cvec"))
    val q = queries.select(col(idCol).alias("query_id"), col(vecCol).alias("qvec"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("corpus_id"))
      .select(
        col("query_id"), col("corpus_id"),
        cosine(col("qvec"), col("cvec")).alias("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("corpus_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("score"))
  }

  /** Deterministic ±1 hyperplane component for (plane, dim): MurmurHash3
    * mixing, not a linear congruence — the low bit of `a·p + b·d + c` is
    * just the parity of p+d (all planes become ± copies of one
    * checkerboard and every LSH table degenerates to 2 buckets; caught by
    * an attempted cross-engine oracle and a bucket-spread test). */
  private def planeSign(p: Int, d: Int): Double = {
    import scala.util.hashing.MurmurHash3
    val h = MurmurHash3.finalizeHash(
      MurmurHash3.mix(MurmurHash3.mix(0x9747b28c, p), d), 2)
    if ((h & 1) == 1) 1.0 else -1.0
  }

  /** The ±1 component vector of hyperplane `p` over `dim` dims. Public so
    * the correctness harness can emit the exact plane matrix as literals
    * into cross-engine oracle SQL (the murmur mixing itself is not
    * reproducible in SQL; its 24×64 output is). */
  def planeSignVector(p: Int, dim: Int): Seq[Double] =
    (0 until dim).map(d => planeSign(p, d))

  /** Signed-random-projection bucket key: `bits` hyperplanes with
    * deterministic murmur-mixed ±1 component signs — no RNG, reproducible
    * across runs and JVMs. Returns a long in [0, 2^bits). */
  def srpKey(vec: Column, dim: Int, bits: Int): Column = {
    val planes = (0 until bits).map { p =>
      val signs = (0 until dim).map(d => planeSign(p, d))
      val proj = dot(vec, typedLit(signs))
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    planes.reduce(_.bitwiseOR(_))
  }

  /** ANN top-k: SRP-bucket both sides, equi-join on the bucket key, exact
    * re-score within buckets, per-query top-k. Recall < 1 by construction;
    * raise recall with multiple independent tables (`tables`), each with its
    * own plane set, unioned before the final rank. */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int,
      bits: Int = 8,
      tables: Int = 2): DataFrame = {
    val c = corpus.select(col(idCol).alias("corpus_id"), col(vecCol).alias("cvec"))
    val q = queries.select(col(idCol).alias("query_id"), col(vecCol).alias("qvec"))
    // Candidate ids only: the cross-table distinct must never carry the
    // embedding payload — (query_id, corpus_id) determines the pair, so the
    // dedup exchange moves 16 bytes/row instead of 2×dim×4. Vectors are
    // re-attached once, after dedup: the query side by broadcast, the
    // corpus side by a single id equi-join.
    // All `tables` bucket keys are computed in one pass and exploded, so
    // candidate generation is ONE equi-join on (table, key) rather than
    // `tables` separate join+union branches — one exchange per side.
    val candidates =
      explodeKeys(c, col("corpus_id"), col("cvec"), dim, bits, tables)
        .join(explodeKeys(q, col("query_id"), col("qvec"), dim, bits, tables),
          Seq("tbl", "bkey"))
        .filter(col("query_id") =!= col("corpus_id"))
        .select(col("query_id"), col("corpus_id"))
        .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("corpus_id").asc)
    candidates
      .join(broadcast(q), Seq("query_id"))
      .join(c, Seq("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("qvec"), col("cvec")).alias("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("score"))
  }

  /** Multi-probe SRP-LSH top-k (Lv, Josephson, Wang, Charikar & Li,
    * "Multi-Probe LSH", VLDB 2007, in its standard single-bit-flip form):
    * each query probes its base bucket PLUS the `numProbes` buckets
    * reached by flipping the hyperplane bits whose projections sit
    * closest to the boundary — the buckets a near-miss neighbor most
    * likely fell into. Same recall lever as adding tables, WITHOUT
    * growing the corpus-side index: the corpus still stores/joins ONE key
    * per table; only the (tiny) query side fans out ×(1+numProbes).
    * At 100 TB that asymmetry is the whole point — index size and the
    * corpus shuffle are fixed by `tables`, and recall tunes per-query.
    *
    * Determinism: flip order sorts by (|projection| asc, plane asc) — an
    * `array_sort` over (abs, p) structs any engine reproduces (the
    * projections are the same fixed-order dot folds as the keys
    * themselves). `numProbes = 0` is exactly [[lshTopK]] (spec-asserted);
    * candidates are a superset of it for any `numProbes`, so recall is
    * monotone in the knob. */
  def lshTopKMultiProbe(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      k: Int,
      bits: Int = 8,
      tables: Int = 2,
      numProbes: Int = 2): DataFrame = {
    val c = corpus.select(col(idCol).alias("corpus_id"), col(vecCol).alias("cvec"))
    val q = queries.select(col(idCol).alias("query_id"), col(vecCol).alias("qvec"))
    val corpusKeys = explodeKeys(c, col("corpus_id"), col("cvec"), dim, bits, tables)
      .select(col("corpus_id"), col("tbl"), col("bkey"))
    // query-side probe fan-out: per table, the base key then the
    // numProbes nearest-boundary single-bit flips
    val allKeys = graft.functions.SketchArrayExpressions
      .srpKeys(col("qvec"), dim, bits, tables)
    val probeRows = (0 until tables).map { t =>
      val base = element_at(allKeys, t + 1)
      val flips = array((0 until bits).map { p =>
        val proj = dot(col("qvec"),
          typedLit(planeSignVector(t * bits + p, dim)))
        // the flip MASK rides in the struct (shift amounts must be
        // literals); sort order is decided by (a, p) alone
        struct(abs(proj).alias("a"), lit(p).alias("p"),
          lit(1L << p).alias("m"))
      }: _*)
      val probeKeys = concat(
        array(base),
        transform(slice(array_sort(flips), 1, numProbes),
          s => base.bitwiseXOR(s.getField("m"))))
      q.select(col("query_id"), col("qvec"), lit(t).alias("tbl"),
        explode(probeKeys).alias("bkey"))
    }.reduce(_.unionByName(_))
    val candidates = corpusKeys
      .join(probeRows.select(col("query_id"), col("tbl"), col("bkey")),
        Seq("tbl", "bkey"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"))
      .distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("corpus_id").asc)
    candidates
      .join(broadcast(q), Seq("query_id"))
      .join(c, Seq("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("qvec"), col("cvec")).alias("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("score"))
  }

  /** One row per (id, table, bucket-key): all tables' SRP keys computed in
    * a single pass over the embedding ([[graft.functions.SrpKeys]] — the
    * per-plane `vec_dot` spelling re-traverses the array `tables × bits`
    * times for identical keys) and exploded — the join side of candidate
    * generation. Only (id, tbl, bkey) travel into the exchange. */
  private def explodeKeys(
      df: DataFrame, id: Column, vec: Column,
      dim: Int, bits: Int, tables: Int): DataFrame =
    df.select(id, posexplode(
        graft.functions.SketchArrayExpressions.srpKeys(vec, dim, bits, tables)))
      .withColumnRenamed("pos", "tbl")
      .withColumnRenamed("col", "bkey")

  /** IVF-style ANN top-k: inverted-file search with exact re-scoring.
    *
    *  1. centroids = a deterministic subset of the corpus (lowest
    *     `numCentroids` ids — a kmeans fit would slot in here; centroid
    *     *choice* only affects recall, never correctness of re-scoring);
    *  2. every corpus vector is assigned to its nearest centroid
    *     (broadcast centroids, one-pass argmax via max(struct(score,id)) —
    *     deterministic tie-break);
    *  3. each query probes its `nprobe` nearest cells;
    *  4. exact cosine re-scoring only inside probed cells, then top-k.
    *
    * The 100 TB path: the corpus is partitioned by cell once (equi-join on
    * cell id), each query touches nprobe/numCentroids of the corpus, and
    * recall is tuned by nprobe without touching the stored assignment.
    */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numCentroids: Int = 16,
      nprobe: Int = 4,
      fitCentroids: Option[DataFrame] = None): DataFrame = {
    val c = corpus.select(col(idCol).alias("corpus_id"), col(vecCol).alias("cvec"))
    val q = queries.select(col(idCol).alias("query_id"), col(vecCol).alias("qvec"))
    // default: deterministic lowest-id subset (oracle-reproducible); pass
    // [[kmeansCentroids]] output for higher recall at the same nprobe
    val centroids = fitCentroids.getOrElse(
      c.orderBy(col("corpus_id").asc).limit(numCentroids)
        .select(col("corpus_id").alias("centroid_id"), col("cvec").alias("centvec")))
    // nearest centroid per corpus vector (argmax with deterministic ties)
    val assigned = c.crossJoin(broadcast(centroids))
      .select(col("corpus_id"), col("cvec"),
        struct(cosine(col("cvec"), col("centvec")).alias("s"),
          col("centroid_id").alias("cid")).alias("sc"))
      .groupBy(col("corpus_id"))
      .agg(first(col("cvec")).alias("cvec"), max(col("sc")).alias("best"))
      .select(col("corpus_id"), col("cvec"), col("best.cid").alias("cell"))
    // nprobe nearest cells per query
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("ps").desc, col("cell").asc)
    val probed = q.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("qvec"),
        cosine(col("qvec"), col("centvec")).alias("ps"),
        col("centroid_id").alias("cell"))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("qvec"), col("cell"))
    // exact re-score inside probed cells only
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("corpus_id").asc)
    assigned.join(probed, Seq("cell"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("qvec"), col("cvec")).alias("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("score"))
  }

  /** SemDeDup-shaped semantic diversity downsampling: assign every vector
    * to its nearest centroid, then keep at most `cap` vectors per cell,
    * preferring the LEAST-centroid-similar ones — near-centroid points in
    * a dense cell are the semantically redundant mass; the kept set
    * maximizes intra-cell spread (deterministic: similarity then id ties).
    * The cluster-then-prune shape of SemDeDup (Abbas et al. 2023) with a
    * cap-per-cell keeper rule instead of a pairwise threshold, which
    * keeps the whole operator two broadcast joins + one bounded window —
    * no pairwise comparisons at any scale.
    *
    * Centroids default to the deterministic lowest-id subset (the same
    * oracle-reproducible choice as [[ivfTopK]]); pass [[kmeansCentroids]]
    * output for better cells. Scale shape: centroids broadcast (argmax in
    * one pass, no shuffle of the corpus), the only exchange is the
    * per-cell window keyed on `cell`, and the window prunes with
    * WindowGroupLimit — each task holds top-`cap` rows per cell, never a
    * cell's full membership.
    */
  def clusterCapSample(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      numCentroids: Int = 16,
      cap: Int = 20,
      fitCentroids: Option[DataFrame] = None): DataFrame = {
    val c = corpus.select(col(idCol).alias("vec_id"), col(vecCol).alias("cvec"))
    val centroids = fitCentroids.getOrElse(
      c.orderBy(col("vec_id").asc).limit(numCentroids)
        .select(col("vec_id").alias("centroid_id"), col("cvec").alias("centvec")))
    // nearest centroid per vector (argmax with deterministic ties — the
    // same max(struct) idiom ivfTopK's oracle reproduces)
    val assigned = c.crossJoin(broadcast(centroids))
      .select(col("vec_id"),
        struct(cosine(col("cvec"), col("centvec")).alias("s"),
          col("centroid_id").alias("cid")).alias("sc"))
      .groupBy(col("vec_id"))
      .agg(max(col("sc")).alias("best"))
      .select(col("vec_id"), col("best.cid").alias("cell"),
        col("best.s").alias("cscore"))
    val w = Window.partitionBy(col("cell"))
      .orderBy(col("cscore").asc, col("vec_id").asc)
    assigned
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= cap)
      .select(col("vec_id"), col("cell"), col("cscore"), col("rank"))
  }

  /** Product-quantized ANN top-k with exact re-scoring (Jégou, Douze &
    * Schmid, "Product Quantization for Nearest Neighbor Search", TPAMI
    * 2011; the IVFADC + refine shape of FAISS). The corpus representation
    * is `numSub` sub-codebook CODES per vector — at the 4-of-64 × 16-code
    * defaults that is 4 bytes per vector against 256 float bytes, a 64×
    * compression, which at 100 TB is the difference between an in-memory
    * code scan and a disk-bound float scan.
    *
    * Stages, all engine-exact:
    *  1. Sub-codebooks: each of the `numSub` contiguous `dim/numSub` slices
    *     of the `numCodes` lowest-id corpus vectors (the family's
    *     deterministic oracle-reproducible seeding; compose with
    *     [[kmeansCentroids]] per subspace for trained codebooks).
    *  2. Encode: per (vector, subspace), the argmax-cosine code —
    *     `max(struct(s, code))` ties to the larger code, the idiom every
    *     oracle in this family reproduces with `ORDER BY s DESC, code DESC`.
    *  3. ADC candidate scan: the approximate score is
    *     `Σ_j lut[j][code_j] / (‖q‖ · √Σ_j ‖cb[j][code_j]‖²)` where
    *     `lut[j][code] = q_j · cb[j][code]` — the asymmetric-distance
    *     lookup table, `numSub × numCodes` sub-dots per query. Both sums
    *     fold in ascending-j order (sorted struct array → `aggregate`),
    *     because float addition is order-sensitive and the oracle's
    *     `list(x ORDER BY j)` fold must see the same grouping — this is
    *     deliberately NOT spelled as a flat dot over the reconstruction,
    *     whose single 64-term fold parenthesizes differently.
    *  4. Exact re-score: the top `k × refine` candidates (approx-score
    *     ties to the smaller id) re-join the float corpus; emitted scores
    *     are exact cosines, PQ only chose the candidate set.
    *
    * Scale shape: codebook and queries broadcast; the code table (the only
    * corpus-sized artifact) is scanned once per query batch and never
    * shuffled; the per-query candidate cap bounds the rescore join; the
    * top-k windows prune with WindowGroupLimit. */
  def pqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numSub: Int = 4,
      numCodes: Int = 16,
      refine: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).alias("corpus_id"), col(vecCol).alias("cvec"))
    val q = queries.select(col(idCol).alias("query_id"), col(vecCol).alias("qvec"))
    val (cb, codes, subDim) = pqArtifacts(c, numSub, numCodes)
    // ADC over the FULL code table: every (query, corpus) pair scanned
    val pairsIn = codes
      .join(broadcast(cb.select(col("j"), col("code_id"), col("csub"),
        col("cnorm2"))), Seq("j", "code_id"))
      .crossJoin(broadcast(q))
    pqScore(pairsIn, c, k, refine, subDim)
  }

  /** Sub-codebooks + code table for [[pqTopK]]/[[ivfPqTopK]]: returns
    * `(cb(j, code_id, csub, cnorm2), codes(corpus_id, j, code_id), subDim)`.
    * Codebooks are the `numCodes` lowest-id corpus vectors' slices (the
    * family's deterministic seeding); encoding is argmax-cosine with ties
    * to the larger code — the `max(struct)` idiom the oracles reproduce. */
  private[ops] def pqArtifacts(
      c: DataFrame, numSub: Int, numCodes: Int): (DataFrame, DataFrame, Int) = {
    val subs = explode(sequence(lit(0), lit(numSub - 1))).alias("j")
    // dim from the codebook seeds — driver-side scalar, codebook-sized
    val seeds = c.orderBy(col("corpus_id").asc).limit(numCodes)
      .select(col("corpus_id").alias("code_id"), col("cvec"))
    val dim = seeds.select(size(col("cvec"))).head().getInt(0)
    require(dim % numSub == 0, s"dim $dim not divisible by numSub $numSub")
    val subDim = dim / numSub
    val cb = seeds.select(col("code_id"), col("cvec"), subs)
      .select(col("code_id"), col("j"),
        pqSub(col("cvec"), col("j"), subDim).alias("csub"))
      .withColumn("cnorm2", dot(col("csub"), col("csub")))
    (cb, pqEncode(c, cb, numSub, subDim), subDim)
  }

  /** Encode (corpus_id, cvec) rows against a GIVEN sub-codebook — the
    * argmax-cosine code per (vector, subspace), ties to the larger code.
    * Shared by [[pqArtifacts]] (fresh codebook) and
    * [[VectorIndex.appendPqCodes]] (the STORED frozen codebook). */
  private[ops] def pqEncode(
      c: DataFrame, cb: DataFrame, numSub: Int, subDim: Int): DataFrame =
    c.select(col("corpus_id"), col("cvec"),
        explode(sequence(lit(0), lit(numSub - 1))).alias("j"))
      .select(col("corpus_id"), col("j"),
        pqSub(col("cvec"), col("j"), subDim).alias("xsub"))
      .join(broadcast(cb), Seq("j"))
      .select(col("corpus_id"), col("j"),
        struct(cosine(col("xsub"), col("csub")).alias("s"),
          col("code_id").alias("code")).alias("sc"))
      .groupBy(col("corpus_id"), col("j"))
      .agg(max(col("sc")).alias("best"))
      .select(col("corpus_id"), col("j"), col("best.code").alias("code_id"))

  private[ops] def pqSub(v: Column, j: Column, subDim: Int): Column =
    slice(v, j * subDim + 1, lit(subDim))

  /** ADC scoring + exact rescore shared by the PQ searches. `pairsIn` is
    * the (query_id, qvec, corpus_id, j, csub, cnorm2) pair stream — the
    * caller decides which (query, corpus) pairs exist (full scan for
    * [[pqTopK]], probed-cells-only for [[ivfPqTopK]]). Partials fold in
    * ascending-j order (sorted struct array → `aggregate`) so the oracle's
    * `list(x ORDER BY j)` fold sees the same float-addition grouping. */
  private[ops] def pqScore(
      pairsIn: DataFrame, c: DataFrame, k: Int, refine: Int,
      subDim: Int): DataFrame = {
    val subdots = pairsIn
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("qvec"), col("corpus_id"),
        struct(col("j"),
          dot(pqSub(col("qvec"), col("j"), subDim), col("csub")).alias("sd"),
          col("cnorm2")).alias("part"))
    val candW = Window.partitionBy(col("query_id"))
      .orderBy(col("ascore").desc, col("corpus_id").asc)
    val candidates = subdots
      .groupBy(col("query_id"), col("corpus_id"))
      .agg(first(col("qvec")).alias("qvec"),
        array_sort(collect_list(col("part"))).alias("parts"))
      .select(col("query_id"), col("qvec"), col("corpus_id"),
        (aggregate(col("parts"), lit(0.0), (a, p) => a + p.getField("sd")) /
          (sqrt(dot(col("qvec"), col("qvec"))) *
            sqrt(aggregate(col("parts"), lit(0.0),
              (a, p) => a + p.getField("cnorm2"))))).alias("ascore"))
      .withColumn("cr", row_number().over(candW))
      .filter(col("cr") <= k * refine)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("corpus_id").asc)
    candidates.join(c, Seq("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("qvec"), col("cvec")).alias("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("score"))
  }

  /** The composed IVF × PQ search — FAISS's IVFADC shape (Jégou et al.
    * TPAMI 2011 §IV): a coarse quantizer prunes the corpus to `nprobe` of
    * `numCentroids` cells, and only THOSE cells' PQ codes are ADC-scanned,
    * so the candidate stage touches `nprobe/numCentroids` of the rows ×
    * `numSub` code bytes of the bytes — at the 4-of-16 × 4×16 defaults,
    * 1/4 of the rows at 1/64 of the float bytes = ~1/256 of the corpus
    * volume, before the exact top-`k × refine` rescore.
    *
    * This is flat PQ under IVF (codes quantize the vector itself, not the
    * cell residual — FAISS's OPQ/residual refinement changes the codebook,
    * not the plan shape). Coarse centroids and sub-codebooks both use the
    * family's deterministic lowest-id seeding so the oracle reproduces
    * every stage; `nprobe = numCentroids` provably recovers [[pqTopK]]
    * (every cell probed ⇒ the same full pair stream — spec-asserted). */
  def ivfPqTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numCentroids: Int = 16,
      nprobe: Int = 4,
      numSub: Int = 4,
      numCodes: Int = 16,
      refine: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).alias("corpus_id"), col(vecCol).alias("cvec"))
    val q = queries.select(col(idCol).alias("query_id"), col(vecCol).alias("qvec"))
    val centroids = c.orderBy(col("corpus_id").asc).limit(numCentroids)
      .select(col("corpus_id").alias("centroid_id"), col("cvec").alias("centvec"))
    // nearest cell per corpus vector (the ivfTopK assignment idiom)
    val assigned = c.crossJoin(broadcast(centroids))
      .select(col("corpus_id"),
        struct(cosine(col("cvec"), col("centvec")).alias("s"),
          col("centroid_id").alias("cid")).alias("sc"))
      .groupBy(col("corpus_id"))
      .agg(max(col("sc")).alias("best"))
      .select(col("corpus_id"), col("best.cid").alias("cell"))
    // nprobe nearest cells per query
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("ps").desc, col("cell").asc)
    val probed = q.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("qvec"),
        cosine(col("qvec"), col("centvec")).alias("ps"),
        col("centroid_id").alias("cell"))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("qvec"), col("cell"))
    val (cb, codes, subDim) = pqArtifacts(c, numSub, numCodes)
    // pair stream restricted to probed cells: the code scan is pruned
    // BEFORE any distance arithmetic runs
    val pairsIn = codes
      .join(broadcast(cb.select(col("j"), col("code_id"), col("csub"),
        col("cnorm2"))), Seq("j", "code_id"))
      .join(assigned, Seq("corpus_id"))
      .join(broadcast(probed), Seq("cell"))
    pqScore(pairsIn, c, k, refine, subDim)
  }

  /** Per-vector symmetric int8 quantization: `scale = max|x| / 127`,
    * `code_i = floor(x_i/scale + 0.5)` (round-half-UP — half-steps round
    * toward +inf, e.g. -2.5 → -2; pure double ops, engine-reproducible).
    * Returns `(<idCol>, q8_scale double, q8_codes array<tinyint>)` — the
    * stored representation is 4× smaller than float32, which at 100 TB is
    * the difference between an embedding corpus that fits page cache and
    * one that doesn't. Zero vectors quantize to all-zero codes.
    *
    * The two-step select keeps `q8_scale` a materialized projection column
    * so the max-fold runs once per row, not once per element inside the
    * code lambda (CollapseProject leaves multi-referenced non-cheap
    * expressions alone). */
  def quantize(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    withQ8(df.select(col(idCol), col(vecCol)), vecCol, "q8_")
      .select(col(idCol), col("q8_scale"), col("q8_codes"))

  /** Append `<prefix>scale`/`<prefix>codes` int8 quantization columns for
    * `vecCol`, keeping every existing column — the building block behind
    * [[quantize]] and the composed funnels, where the quantized frame must
    * carry its IVF cell along. */
  private def withQ8(df: DataFrame, vecCol: String, prefix: String): DataFrame =
    df.withColumn(s"${prefix}scale",
        array_max(transform(col(vecCol), x => abs(x.cast("double")))) / 127.0)
      .withColumn(s"${prefix}codes",
        when(col(s"${prefix}scale") === 0.0,
          transform(col(vecCol), _ => lit(0).cast("byte")))
        .otherwise(transform(col(vecCol), x =>
          floor(x.cast("double") / col(s"${prefix}scale") + 0.5).cast("long").cast("byte"))))

  /** ANN top-k over int8-quantized embeddings with exact float re-scoring.
    *
    * Candidate generation scans the quantized corpus — `scaleQ · scaleC ·
    * (codesQ · codesC)` approximates the true dot within ~1% at int8 — and
    * keeps `k × refine` candidates per query (deterministic ties). Only
    * those candidates re-join the float corpus for the exact cosine top-k.
    *
    * Scale shape mirrors [[bruteForceTopK]] (queries broadcast, corpus
    * never shuffled) but the scan reads ¼ the bytes and the dot runs on
    * 8-bit codes ([[graft.functions.VecDot]] over tinyint arrays, still
    * one codegen'd loop); the float vectors are touched for ~k×refine rows
    * per query instead of the whole corpus. Integer products summed in
    * double are exact, so the candidate set is deterministic and
    * cross-engine reproducible — which is how the DuckDB oracle can check
    * the full pipeline.
    */
  def quantizedTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      refine: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).alias("corpus_id"), col(vecCol).alias("cvec"))
    val q = queries.select(col(idCol).alias("query_id"), col(vecCol).alias("qvec"))
    val cq = quantize(c, "corpus_id", "cvec")
      .select(col("corpus_id"), col("q8_scale").alias("cscale"), col("q8_codes").alias("ccodes"))
    val qq = quantize(q, "query_id", "qvec")
      .select(col("query_id"), col("q8_scale").alias("qscale"), col("q8_codes").alias("qcodes"))
    val approxW = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("corpus_id").asc)
    val candidates = cq.join(broadcast(qq), col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        (col("qscale") * col("cscale") * dot(col("qcodes"), col("ccodes"))).alias("approx"))
      .withColumn("arank", row_number().over(approxW))
      .filter(col("arank") <= k * refine)
      .select(col("query_id"), col("corpus_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("corpus_id").asc)
    candidates
      .join(broadcast(q), Seq("query_id"))
      .join(c, Seq("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("qvec"), col("cvec")).alias("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("score"))
  }

  /** ANN top-k via Matryoshka prefix truncation with exact full-dim
    * re-scoring (Kusupati et al., "Matryoshka Representation Learning",
    * arXiv:2205.13147): candidate generation scores only the first
    * `prefixDim` dimensions — for MRL-trained embeddings the information-
    * dense prefix — and keeps `k × refine` candidates per query; only those
    * rows touch the full vectors for the exact cosine top-k.
    *
    * The funnel sibling of [[quantizedTopK]]: int8 cuts bytes-per-element
    * 4×, prefix truncation cuts ELEMENTS (dim/prefixDim ×), and the two
    * compose. Scale shape is identical — queries broadcast, corpus never
    * shuffled, the candidate scan reads `prefixDim/dim` of the embedding
    * bytes (with Parquet column-chunk stats the truncated prefix can even
    * be stored as its own column), and the full vectors are read for
    * ~k×refine rows per query. Same-order double arithmetic end to end, so
    * the DuckDB oracle hash-checks the whole funnel.
    */
  def matryoshkaTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      prefixDim: Int = 16,
      refine: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).alias("corpus_id"), col(vecCol).alias("cvec"))
    val q = queries.select(col(idCol).alias("query_id"), col(vecCol).alias("qvec"))
    val ct = c.select(col("corpus_id"), slice(col("cvec"), 1, prefixDim).alias("cpre"))
    val qt = q.select(col("query_id"), slice(col("qvec"), 1, prefixDim).alias("qpre"))
    val approxW = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("corpus_id").asc)
    val candidates = ct.join(broadcast(qt), col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("qpre"), col("cpre")).alias("approx"))
      .withColumn("arank", row_number().over(approxW))
      .filter(col("arank") <= k * refine)
      .select(col("query_id"), col("corpus_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("corpus_id").asc)
    candidates
      .join(broadcast(q), Seq("query_id"))
      .join(c, Seq("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("qvec"), col("cvec")).alias("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("score"))
  }

  /** The composed funnel: int8-quantized MATRYOSHKA-PREFIX candidate scan
    * with exact full-dim float re-scoring — [[quantizedTopK]]'s byte cut
    * (4×) times [[matryoshkaTopK]]'s element cut (dim/prefixDim ×): the
    * candidate scan reads `prefixDim/dim/4` of the float corpus bytes
    * (1/16 at the 16-of-64 defaults). Proof-by-construction that the two
    * funnels compose — same candidate-generation shape, same broadcast
    * queries, same exact rescore, and the whole pipeline stays
    * deterministic (integer code products in fixed-order double), so the
    * DuckDB oracle hash-checks it end to end like its two parents.
    */
  def matryoshkaQuantizedTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      prefixDim: Int = 16,
      refine: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).alias("corpus_id"), col(vecCol).alias("cvec"))
    val q = queries.select(col(idCol).alias("query_id"), col(vecCol).alias("qvec"))
    val cq = quantize(
      c.select(col("corpus_id"), slice(col("cvec"), 1, prefixDim).alias("cpre")),
      "corpus_id", "cpre")
      .select(col("corpus_id"), col("q8_scale").alias("cscale"),
        col("q8_codes").alias("ccodes"))
    val qq = quantize(
      q.select(col("query_id"), slice(col("qvec"), 1, prefixDim).alias("qpre")),
      "query_id", "qpre")
      .select(col("query_id"), col("q8_scale").alias("qscale"),
        col("q8_codes").alias("qcodes"))
    val approxW = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("corpus_id").asc)
    val candidates = cq.join(broadcast(qq), col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        (col("qscale") * col("cscale") * dot(col("qcodes"), col("ccodes"))).alias("approx"))
      .withColumn("arank", row_number().over(approxW))
      .filter(col("arank") <= k * refine)
      .select(col("query_id"), col("corpus_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("corpus_id").asc)
    candidates
      .join(broadcast(q), Seq("query_id"))
      .join(c, Seq("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("qvec"), col("cvec")).alias("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("score"))
  }

  /** The BUCKETED Matryoshka funnel: IVF cell partitioning ON THE PREFIX
    * DIMS composed with [[matryoshkaTopK]]'s exact full-dim rescore.
    * [[matryoshkaTopK]] alone cuts bytes-per-candidate (prefixDim/dim of
    * the floats) but its candidate stage still scans the WHOLE corpus per
    * query (a broadcast NLJ); this variant adds [[ivfTopK]]'s candidate
    * pruning so the scan touches only `nprobe / numCentroids` of the
    * corpus ROWS as well — at the 4-of-16 × 16-of-64 defaults the
    * candidate stage reads 1/4 of the rows × 1/4 of the bytes = 1/16 of
    * the prefix-scan volume, and recall is tuned by `nprobe`/`refine`
    * without touching the stored assignment.
    *
    * Everything before the rescore lives in prefix space: centroids are
    * prefix vectors (deterministic lowest-id subset by default, a kmeans
    * fit on prefixes slots into `fitCentroids`), assignment and probing
    * score prefix cosines, and only the ≤ k×refine candidates per query
    * touch the full vectors. Same-order double arithmetic end to end, so
    * the DuckDB oracle hash-checks the whole funnel like its parents.
    *
    * 100 TB shape: corpus partitioned by cell once (the only corpus-wide
    * exchange), centroids and queries broadcast, full vectors re-attached
    * by id equi-join for the candidate tail only.
    */
  def matryoshkaIvfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      prefixDim: Int = 16,
      refine: Int = 4,
      numCentroids: Int = 16,
      nprobe: Int = 4,
      fitCentroids: Option[DataFrame] = None): DataFrame = {
    val c = corpus.select(col(idCol).alias("corpus_id"), col(vecCol).alias("cvec"))
    val q = queries.select(col(idCol).alias("query_id"), col(vecCol).alias("qvec"))
    val ct = c.select(col("corpus_id"), slice(col("cvec"), 1, prefixDim).alias("cpre"))
    val qt = q.select(col("query_id"), slice(col("qvec"), 1, prefixDim).alias("qpre"))
    val centroids = fitCentroids.getOrElse(
      ct.orderBy(col("corpus_id").asc).limit(numCentroids)
        .select(col("corpus_id").alias("centroid_id"), col("cpre").alias("centvec")))
    // nearest prefix-centroid per corpus vector (argmax, deterministic
    // ties to the larger centroid id — max(struct) semantics)
    val assigned = ct.crossJoin(broadcast(centroids))
      .select(col("corpus_id"), col("cpre"),
        struct(cosine(col("cpre"), col("centvec")).alias("s"),
          col("centroid_id").alias("cid")).alias("sc"))
      .groupBy(col("corpus_id"))
      .agg(first(col("cpre")).alias("cpre"), max(col("sc")).alias("best"))
      .select(col("corpus_id"), col("cpre"), col("best.cid").alias("cell"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("ps").desc, col("cell").asc)
    val probed = qt.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("qpre"),
        cosine(col("qpre"), col("centvec")).alias("ps"),
        col("centroid_id").alias("cell"))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("qpre"), col("cell"))
    // prefix-cosine candidates inside probed cells only
    val approxW = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("corpus_id").asc)
    val candidates = assigned.join(probed, Seq("cell"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("qpre"), col("cpre")).alias("approx"))
      .withColumn("arank", row_number().over(approxW))
      .filter(col("arank") <= k * refine)
      .select(col("query_id"), col("corpus_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("corpus_id").asc)
    candidates
      .join(broadcast(q), Seq("query_id"))
      .join(c, Seq("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("qvec"), col("cvec")).alias("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("score"))
  }

  /** The FULL production funnel: IVF cells × Matryoshka prefix × int8
    * codes, then exact rescore — all three reductions composed. At the
    * 4-of-16 × 16-of-64 × int8 defaults the candidate scan touches
    * `nprobe/numCentroids` of the corpus ROWS (IVF) × `prefixDim/dim` of
    * the ELEMENTS (MRL) × ¼ of the BYTES per element (int8) = **1/256 of
    * the float corpus volume**, and only ≤ k×refine rows per query ever
    * read their full vector. This is the shape a 100 TB embedding store
    * actually serves from: cells are the partition key (one corpus-wide
    * exchange, ever), the quantized prefix codes are the only columns the
    * scan reads (a fraction small enough to pin in memory), and recall is
    * tuned by `nprobe`/`refine` without touching stored data.
    *
    * Cell assignment and probing run on FLOAT prefixes (centroid tables
    * are broadcast-sized; quantizing them saves nothing and would change
    * the cells vs [[matryoshkaIvfTopK]]); the int8 codes pay off where the
    * volume is — the per-cell candidate scan. Quantization, integer dot,
    * candidate cut, and rescore all use the same fixed-order double
    * arithmetic as the parent funnels, so the DuckDB oracle hash-checks
    * the whole composition end to end.
    */
  def matryoshkaIvfQuantizedTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      prefixDim: Int = 16,
      refine: Int = 4,
      numCentroids: Int = 16,
      nprobe: Int = 4,
      fitCentroids: Option[DataFrame] = None): DataFrame = {
    val c = corpus.select(col(idCol).alias("corpus_id"), col(vecCol).alias("cvec"))
    val q = queries.select(col(idCol).alias("query_id"), col(vecCol).alias("qvec"))
    val ct = c.select(col("corpus_id"), slice(col("cvec"), 1, prefixDim).alias("cpre"))
    val qt = q.select(col("query_id"), slice(col("qvec"), 1, prefixDim).alias("qpre"))
    val centroids = fitCentroids.getOrElse(
      ct.orderBy(col("corpus_id").asc).limit(numCentroids)
        .select(col("corpus_id").alias("centroid_id"), col("cpre").alias("centvec")))
    // float-prefix assignment — identical cells to matryoshkaIvfTopK
    val assigned = ct.crossJoin(broadcast(centroids))
      .select(col("corpus_id"), col("cpre"),
        struct(cosine(col("cpre"), col("centvec")).alias("s"),
          col("centroid_id").alias("cid")).alias("sc"))
      .groupBy(col("corpus_id"))
      .agg(first(col("cpre")).alias("cpre"), max(col("sc")).alias("best"))
      .select(col("corpus_id"), col("cpre"), col("best.cid").alias("cell"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("ps").desc, col("cell").asc)
    val probed = qt.crossJoin(broadcast(centroids))
      .select(col("query_id"), col("qpre"),
        cosine(col("qpre"), col("centvec")).alias("ps"),
        col("centroid_id").alias("cell"))
      .withColumn("pr", row_number().over(probeW))
      .filter(col("pr") <= nprobe)
      .select(col("query_id"), col("qpre"), col("cell"))
    // int8 codes for the per-cell candidate scan — the hot-volume columns
    val cq = withQ8(assigned, "cpre", "c")
      .select(col("corpus_id"), col("cell"), col("cscale"), col("ccodes"))
    val pq = withQ8(probed, "qpre", "q")
      .select(col("query_id"), col("cell"), col("qscale"), col("qcodes"))
    val approxW = Window.partitionBy(col("query_id"))
      .orderBy(col("approx").desc, col("corpus_id").asc)
    val candidates = cq.join(pq, Seq("cell"))
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        (col("qscale") * col("cscale") * dot(col("qcodes"), col("ccodes")))
          .alias("approx"))
      .withColumn("arank", row_number().over(approxW))
      .filter(col("arank") <= k * refine)
      .select(col("query_id"), col("corpus_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("corpus_id").asc)
    candidates
      .join(broadcast(q), Seq("query_id"))
      .join(c, Seq("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("qvec"), col("cvec")).alias("score"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("score"))
  }

  /** recall@k of an ANN result against the exact result: fraction of each
    * query's true top-k ids the approximate search recovered, averaged over
    * queries. Both frames use the (query_id, corpus_id) schema of
    * [[bruteForceTopK]]/[[lshTopK]]/[[ivfTopK]]. One tiny aggregate —
    * intended for offline quality tracking at sample scale. */
  def recallAtK(approx: DataFrame, exact: DataFrame): Double = {
    val hit = exact.select(col("query_id"), col("corpus_id"))
      .join(approx.select(col("query_id"), col("corpus_id")).withColumn("h", lit(1)),
        Seq("query_id", "corpus_id"), "left")
      .groupBy(col("query_id"))
      .agg((sum(coalesce(col("h"), lit(0))) / count(lit(1))).alias("r"))
    val row = hit.agg(avg(col("r"))).first()
    if (row.isNullAt(0)) 0.0 else row.getDouble(0)
  }

  /** Lloyd-refined IVF centroids: start from the deterministic lowest-id
    * seed set and run `iters` assignment/mean iterations. Everything stays
    * a DataFrame pipeline — broadcast centroids for assignment, one
    * position-exploded groupBy for the new means (shuffles (cell, pos)
    * partial sums, never vectors-by-pair) — so the fit runs at corpus
    * scale. Returns `(centroid_id, centvec)` ready for [[ivfTopK]]'s
    * `centroids` parameter. */
  def kmeansCentroids(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      numCentroids: Int,
      iters: Int = 2): DataFrame = {
    val c = corpus.select(col(idCol).alias("corpus_id"), col(vecCol).alias("cvec"))
    var cents = c.orderBy(col("corpus_id").asc).limit(numCentroids)
      .select(col("corpus_id").alias("centroid_id"), col("cvec").alias("centvec"))
    var it = 0
    while (it < iters) {
      val assigned = c.crossJoin(broadcast(cents))
        .select(col("corpus_id"), col("cvec"),
          struct(cosine(col("cvec"), col("centvec")).alias("s"),
            col("centroid_id").alias("cid")).alias("sc"))
        .groupBy(col("corpus_id"))
        .agg(first(col("cvec")).alias("cvec"), max(col("sc")).alias("best"))
        .select(col("corpus_id"), col("cvec"), col("best.cid").alias("cell"))
      // new centroid = per-position mean over the cell (float, matching the
      // embedding element type); empty cells drop out (k shrinks, fine)
      cents = assigned
        .select(col("cell"), posexplode(col("cvec")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("col")).alias("m"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m")))).alias("pm"))
        .select(col("cell").alias("centroid_id"),
          transform(col("pm"), p => p.getField("m").cast("float")).alias("centvec"))
        .localCheckpoint(true)
      it += 1
    }
    cents
  }

  /** Embedding-cosine near-duplicate pairs: all corpus pairs above a cosine
    * threshold, bucketed by SRP key so candidate generation is an equi-join
    * (near-identical vectors collide in every table with high probability). */
  def cosineNearDups(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double,
      bits: Int = 8,
      tables: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).alias("nd_id"), col(vecCol).alias("vec"))
    // Same shape as [[lshTopK]]: all table keys exploded into ONE self
    // equi-join on (table, key), candidate pairs deduped on ids alone (the
    // distinct never shuffles vectors), then each side's vector re-joined
    // exactly once for the exact re-score.
    val keyed = explodeKeys(c, col("nd_id"), col("vec"), dim, bits, tables)
    val a = keyed.alias("a")
    val b = keyed.alias("b")
    val candidates = a.join(b,
        col("a.tbl") === col("b.tbl") && col("a.bkey") === col("b.bkey") &&
        col("a.nd_id") < col("b.nd_id"))
      .select(col("a.nd_id").alias("id_a"), col("b.nd_id").alias("id_b"))
      .distinct()
    candidates
      .join(c.select(col("nd_id").alias("id_a"), col("vec").alias("vec_a")), "id_a")
      .join(c.select(col("nd_id").alias("id_b"), col("vec").alias("vec_b")), "id_b")
      .select(col("id_a"), col("id_b"), cosine(col("vec_a"), col("vec_b")).alias("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Filtered vector search: exact top-k restricted to corpus rows whose
    * `attrCol` equals the query's — the metadata-filtered ANN primitive
    * (pre-filtering, not post-filtering: the attribute equality is PART of
    * the broadcast join condition, so non-matching corpus rows are dropped
    * before any scoring, and k results are guaranteed when the stratum has
    * them — a post-filter of an unfiltered top-k can come up short).
    * Same scale shape as [[bruteForceTopK]]. */
  def filteredTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      attrCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).alias("corpus_id"),
      col(vecCol).alias("cvec"), col(attrCol).alias("c_attr"))
    val q = queries.select(col(idCol).alias("query_id"),
      col(vecCol).alias("qvec"), col(attrCol).alias("q_attr"))
    val scored = c.join(broadcast(q),
        col("c_attr") === col("q_attr") && col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        cosine(col("qvec"), col("cvec")).alias("score"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("corpus_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("corpus_id"), col("score"))
  }

  /** k-NN majority-vote classification: each query's label is the most
    * frequent label among its `k` exact nearest neighbors (ties → smaller
    * label). Same scale shape as [[bruteForceTopK]] (broadcast queries,
    * corpus never shuffled); the vote is a k×|queries|-row aggregate.
    * Output: (query_id, pred_label, votes) — all integers, hash-exact. */
  def knnClassify(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int): DataFrame = {
    val top = bruteForceTopK(corpus, queries, idCol, vecCol, k)
    val labels = corpus.select(col(idCol).alias("corpus_id"),
      col(labelCol).cast("long").alias("nbr_label"))
    val votes = top.join(labels, "corpus_id")
      .groupBy(col("query_id"), col("nbr_label"))
      .agg(count(lit(1)).alias("votes"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("nbr_label").asc)
    votes.withColumn("vr", row_number().over(w))
      .filter(col("vr") === 1)
      .select(col("query_id"), col("nbr_label").alias("pred_label"), col("votes"))
  }

  /** Nearest-centroid confusion matrix: per-label centroids (exact
    * fixed-point elementwise mean via [[graft.functions.SketchAggregates
    * .vecFixedSumAgg]] — order-independent bigint sums, so the centroid is
    * bit-identical across partitionings and engines), then every vector is
    * assigned to its highest-cosine centroid and (true label, predicted,
    * count) cells are emitted.
    *
    * Scale: the centroid aggregate partially combines map-side into one
    * 64-long buffer per label per partition; the assignment is a broadcast
    * join against |labels| centroid rows — the corpus is scanned once and
    * never shuffled on anything wider than the final (label, pred) cells. */
  def labelCentroidConfusion(
      embs: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      dim: Int): DataFrame = {
    import graft.functions.SketchAggregates.vecFixedSumAgg
    val sums = embs.groupBy(col(labelCol).cast("long").alias("c_label"))
      .agg(vecFixedSumAgg(col(vecCol), dim).alias("s"),
        count(lit(1)).alias("n"))
    // centroid_j = (Σ floor(x_j·2^24)) / (n·2^24): one correctly-rounded
    // division of exactly-representable operands — engine-invariant.
    val centroids = sums.select(col("c_label"),
      transform(col("s"),
        e => e.cast("double") / (col("n").cast("double") * lit(16777216.0)))
        .alias("cvec"))
    val assigned = embs
      .select(col(idCol).alias("v_id"), col(vecCol).alias("vec"),
        col(labelCol).cast("long").alias("label"))
      .crossJoin(broadcast(centroids))
      .withColumn("score", cosine(col("vec"), col("cvec")))
    val w = Window.partitionBy(col("v_id"))
      .orderBy(col("score").desc, col("c_label").asc)
    assigned.withColumn("ar", row_number().over(w))
      .filter(col("ar") === 1)
      .groupBy(col("label"), col("c_label").alias("pred"))
      .agg(count(lit(1)).alias("n"))
  }
}
