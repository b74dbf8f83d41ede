package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline, over a
  * `documents(doc_id, text, lang, source, n_chars)`-shaped table.
  *
  * All operators are narrow (per-row, no shuffle) and built from codegen'd
  * `org.apache.spark.sql.functions` + higher-order array functions — at
  * 100 TB these run as pure map stages pipelined into the parquet scan, with
  * column pruning keeping the scan to (doc_id, text).
  *
  * Every function here is deliberately expressible in ANSI-ish SQL so the
  * DuckDB oracle can replicate it bit-for-bit (integer/ratio outputs only;
  * see SparkEntry.oracleSql).
  */
object TextAnalysis {

  /** Whitespace tokens, keeping empties out (split on runs of spaces would
    * differ between engines on trailing separators — filtering empties makes
    * the two agree). */
  def tokens(text: Column): Column =
    filter(split(text, " ", -1), c => c =!= lit(""))

  /** Token count (whitespace tokenization). */
  def tokenCount(docs: DataFrame): DataFrame =
    docs.select(
        col("doc_id"),
        size(tokens(col("text"))).cast("long").alias("n_tokens"))
      .orderBy("doc_id")

  /** BPE-ish regex tokenization (GPT-2-style pre-tokenizer shape: letter
    * runs, digit runs, single punctuation marks). A real BPE merge table is
    * a model artifact; the engine-side primitive is the regex pass that
    * feeds it, which is what costs at 100 TB. */
  val bpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit(bpePattern), lit(0))

  def bpeTokenCount(docs: DataFrame): DataFrame =
    docs.select(
        col("doc_id"),
        size(bpeTokens(col("text"))).cast("long").alias("n_bpe_tokens"))
      .orderBy("doc_id")

  /** Stopwords for the quality ratio — a tiny fixed set is enough for a
    * quality *signal* (full lists are a config concern, not an engine one). */
  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Quality scoring: length, token count, mean token length, stopword
    * ratio, distinct-token ratio. Mirrors the length/punct/stopword-ratio
    * heuristics used by LLM data-cleaning pipelines (C4/Gopher-style rules),
    * as integer and exact-ratio outputs so the oracle hash-matches. */
  def qualityScore(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("long")
    val nStop = size(filter(toks, w => w.isin(stopwords: _*))).cast("long")
    val nUniq = size(array_distinct(toks)).cast("long")
    docs.select(
        col("doc_id"),
        length(col("text")).cast("long").alias("n_chars"),
        nTok.alias("n_tokens"),
        nStop.alias("n_stopwords"),
        (nStop.cast("double") / nTok.cast("double")).alias("stopword_ratio"),
        (nUniq.cast("double") / nTok.cast("double")).alias("distinct_ratio"))
      .orderBy("doc_id")
  }

  /** C4/Gopher-style quality gate: keep documents passing token-count and
    * ratio thresholds. Composes [[qualityScore]]'s exact metrics, so the
    * whole filter is a narrow pipeline over the scan. */
  def qualityFilter(
      docs: DataFrame,
      minTokens: Long = 20L,
      maxStopwordRatio: Double = 0.25,
      minDistinctRatio: Double = 0.5): DataFrame =
    qualityScore(docs)
      .filter(col("n_tokens") >= minTokens &&
        col("stopword_ratio") <= maxStopwordRatio &&
        col("distinct_ratio") >= minDistinctRatio)
      .select(col("doc_id"), col("n_tokens"), col("stopword_ratio"), col("distinct_ratio"))

  /** Marker words per language for the n-gram/keyword language-ID heuristic.
    * Scores are exact integer counts; the argmax is taken in a fixed language
    * order so ties resolve identically in any engine. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "est"))

  /** Language-ID heuristic: count marker-word hits per language, pick the
    * best-scoring language (ties → earlier in [[langMarkers]]), 'und' when
    * nothing matches. */
  def languageId(docs: DataFrame): DataFrame = {
    val toks = tokens(lower(col("text")))
    val scores = langMarkers.map { case (lang, markers) =>
      lang -> size(filter(toks, w => w.isin(markers: _*))).cast("long")
    }
    // fold to (bestLang, bestScore) in declaration order: strictly-greater
    // keeps the earlier language on ties.
    val (bestLang, bestScore) = scores.tail.foldLeft(
        (lit(scores.head._1), scores.head._2)) {
      case ((bl, bs), (lang, sc)) =>
        (when(sc > bs, lit(lang)).otherwise(bl), when(sc > bs, sc).otherwise(bs))
    }
    docs.select(
        col("doc_id"),
        when(bestScore > 0, bestLang).otherwise(lit("und")).alias("lang_pred"),
        bestScore.alias("lang_score"))
      .orderBy("doc_id")
  }

  /** Polynomial rolling-hash document fingerprint:
    * `h = fold(chars)(acc -> (acc*31 + ascii(c)) mod 1e9+7)`, seed 7.
    * Stays in BIGINT range at every step, so any engine reproduces it
    * exactly. Useful as a cheap content fingerprint for exact-dup detection
    * when full-text comparison is too wide to shuffle. */
  def fingerprint(text: Column): Column =
    aggregate(
      filter(split(text, "", -1), c => c =!= lit("")),
      lit(7L),
      (acc, c) => (acc * lit(31L) + ascii(c)) % lit(1000000007L))

  /** Repetition-ratio quality metric: the fraction of a document's word
    * `k`-grams that are repeats (Gopher/C4-style repetition filter —
    * boilerplate, keyword stuffing, and degenerate generations score
    * high). Per-row computation only: token hashes → narrow
    * [[graft.functions.ShingleWindows]] n-grams → distinct count, all
    * inside one projection over one scan; zero shuffles at any corpus
    * size. `rep_ratio = 1 - distinct/total`, 0 for docs with < k tokens.
    */
  def repetition(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      tokenHash: Column => Column = graft.ops.Dedup.xxHash): DataFrame = {
    import graft.functions.SketchArrayExpressions.shingleWindows
    docs
      .select(col(idCol),
        shingleWindows(transform(tokens(col(textCol)), t => tokenHash(t)), k)
          .alias("__sw"))
      .select(col(idCol),
        size(col("__sw")).cast("long").alias("n_ngrams"),
        size(array_distinct(col("__sw"))).cast("long").alias("n_distinct"))
      .withColumn("dup_ngrams", col("n_ngrams") - col("n_distinct"))
      .withColumn("rep_ratio",
        when(col("n_ngrams") === 0L, lit(0.0))
          .otherwise(col("dup_ngrams").cast("double") / col("n_ngrams")))
  }

  /** Cross-source k-gram overlap matrix: for every pair of corpus
    * sources, the count of DISTINCT shared token k-gram hashes and the
    * Jaccard similarity of the two sources' distinct k-gram sets — the
    * corpus-level leakage report (is subset A secretly a re-crawl of
    * subset B? how much does adding a source actually add?). The
    * subset-pair companion to [[graft.ops.TrainPrep.decontaminate]]'s
    * doc-level flags.
    *
    * Scale shape: per-row narrow shingling (no shuffle to form k-grams),
    * then ONE wide stage: hash-keyed `collect_set(source)` — the map-side
    * partial aggregate collapses a hash's instances to its ≤ |sources|
    * distinct sources BEFORE the exchange, so a phrase appearing in a
    * billion documents ships once per (partition, source), and no
    * self-join exists at all (a pair (a, b) is counted by a narrow
    * per-row expansion of each hash's source set). Both the totals and
    * the pair counts derive from that one aggregated table. Exchanges
    * carry (8-byte hash, small source set) rows only, never text.
    */
  def sourceOverlap(
      docs: DataFrame,
      sourceCol: String,
      textCol: String,
      k: Int,
      tokenHash: Column => Column = graft.ops.Dedup.xxHash): DataFrame = {
    import graft.functions.SketchArrayExpressions.shingleWindows
    val grams = docs
      .select(col(sourceCol).alias("__src"),
        explode(shingleWindows(
          transform(tokens(col(textCol)), t => tokenHash(t)), k)).alias("sh"))
    // ONE corpus-wide reduction: the per-hash distinct source set. Every
    // downstream number derives from it — the totals AND the pairs — so
    // the tokenize/shingle/explode pass over the corpus (the dominant
    // cost) runs exactly once: all three consumers below share this
    // groupBy-sh exchange byte for byte, and Spark's exchange reuse
    // (ReuseExchangeAndSubquery / the AQE stage cache) turns the extra
    // consumers into ReusedExchange reads of the same shuffle output.
    // Nothing corpus-sized is cached (the former spelling computed the
    // per-source totals as a SECOND count_distinct pass over the gram
    // stream behind a Pin — two full corpus scans per run).
    val perHash = grams
      .groupBy(col("sh"))
      .agg(sort_array(collect_set(col("__src"))).alias("__srcs"))
    // Per-source totals off the per-hash sets: each (hash, source)
    // appears exactly once in a set, so exploding the sets and counting
    // per source IS count(distinct sh) per source (collect_set and
    // count_distinct drop null sources alike; a null source could never
    // join the pair output anyway). The reduce-side explode touches
    // hash-space-sized rows, never the corpus.
    val counts = perHash
      .select(explode(col("__srcs")).alias("__src"))
      .groupBy(col("__src")).agg(count(lit(1)).alias("n"))
    // all i<j source pairs of each hash's (sorted) set — narrow expansion
    // bounded by C(|sources|, 2) per row (the ≥2-source filter keeps only
    // the tiny cross-source tail of the hash space)
    val pairs = perHash
      .filter(size(col("__srcs")) >= 2)
      .select(explode(expr(
        "flatten(transform(__srcs, (a, i) -> " +
          "transform(slice(__srcs, i + 2, size(__srcs)), " +
          "b -> struct(a as source_a, b as source_b))))")).alias("__p"))
      .select(col("__p.source_a"), col("__p.source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).alias("shared_ngrams"))
    pairs
      .join(broadcast(counts.select(col("__src").alias("source_a"),
        col("n").alias("__na"))), Seq("source_a"))
      .join(broadcast(counts.select(col("__src").alias("source_b"),
        col("n").alias("__nb"))), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("shared_ngrams"),
        (col("shared_ngrams").cast("double") /
          (col("__na") + col("__nb") - col("shared_ngrams")).cast("double"))
          .alias("jaccard"))
  }

  /** Tokenizer fertility statistics per language: the corpus profile a
    * tokenizer team reads before training — document count, whitespace
    * tokens, BPE-ish pre-tokens ([[bpePattern]]), characters, and the
    * fertility ratios (`chars_per_token` ≈ avg word length + 1;
    * `fertility` = pre-tokens per whitespace token, how hard the
    * pre-tokenizer fragments this language). Exact BIGINT sums; the
    * ratios divide the sums as doubles (bit-reproducible). One
    * partial-aggregated shuffle keyed on language; the per-row token
    * counting pipelines into the scan.
    */
  def fertility(docs: DataFrame, langCol: String, textCol: String): DataFrame =
    docs
      .select(col(langCol).alias("lang"),
        size(tokens(col(textCol))).cast("long").alias("__ws"),
        size(bpeTokens(col(textCol))).cast("long").alias("__bpe"),
        length(col(textCol)).cast("long").alias("__chars"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).alias("n_docs"),
        sum(col("__ws")).alias("ws_tokens"),
        sum(col("__bpe")).alias("bpe_tokens"),
        sum(col("__chars")).alias("n_chars"),
        (sum(col("__chars")).cast("double") / sum(col("__ws")).cast("double"))
          .alias("chars_per_token"),
        (sum(col("__bpe")).cast("double") / sum(col("__ws")).cast("double"))
          .alias("fertility"))

  /** Per-source k-gram NOVELTY against a reference corpus: how much of
    * each source's distinct k-gram space the reference has never seen —
    * the data-freshness/diversity signal behind "is this crawl slice
    * worth adding", the aggregate dual of [[graft.ops.TrainPrep
    * .decontaminate]]'s per-document flagging. Returns one row per
    * source: distinct k-gram count, the NOVEL count (absent from the
    * reference), and their exact ratio — all BIGINT-derived, the ratio a
    * single fixed-order division.
    *
    * Shape at scale: both sides collapse to DISTINCT 8-byte shingle
    * hashes before anything joins ([[graft.functions.ShingleWindows]] —
    * the k-grams never shuffle as text); the reference set enters a LEFT
    * ANTI join with the strategy left to AQE — broadcast under the
    * threshold, hash-keyed shuffle degrade beyond, exactly the
    * decontaminate posture. */
  def sourceNovelty(
      docs: DataFrame,
      sourceCol: String,
      textCol: String,
      reference: DataFrame,
      refTextCol: String,
      k: Int,
      tokenHash: Column => Column = graft.ops.Dedup.xxHash): DataFrame = {
    import graft.functions.SketchArrayExpressions.shingleWindows
    def grams(d: DataFrame, textC: String): DataFrame =
      d.select(explode(shingleWindows(
        transform(tokens(col(textC)), t => tokenHash(t)), k)).alias("sh"))
    val srcGrams = docs
      .select(col(sourceCol).alias("source"),
        explode(shingleWindows(
          transform(tokens(col(textCol)), t => tokenHash(t)), k)).alias("sh"))
      .distinct()
    val refSet = grams(reference, refTextCol).distinct()
    val novel = srcGrams.join(refSet, Seq("sh"), "left_anti")
      .groupBy(col("source")).agg(count(lit(1)).alias("n_novel"))
    srcGrams.groupBy(col("source"))
      .agg(count(lit(1)).alias("n_kgrams"))
      .join(novel, Seq("source"), "left")
      .select(col("source"), col("n_kgrams"),
        coalesce(col("n_novel"), lit(0L)).alias("n_novel"))
      .withColumn("novelty",
        col("n_novel").cast("double") / col("n_kgrams").cast("double"))
      .orderBy("source")
  }

  /** Top-k distinguishing terms per document by a TF-IDF-style rarity
    * weight: `score = tf · (N+1)/(df+1)` — the log-free rational form
    * (monotone in classic idf, so per-doc term *ranking* is identical;
    * transcendental-free arithmetic keeps every score bit-reproducible in
    * any engine, which log(x) is not across libm builds).
    *
    * Shape at scale: per-doc term frequencies fold INSIDE the scan
    * ([[graft.functions.TokenCounts]] — no raw term instance is ever
    * shuffled), one partial-aggregated groupBy for document frequencies,
    * a 1-row corpus count broadcast into the scoring join; the per-doc
    * top-k prunes with WindowGroupLimit.
    */
  def tfRarity(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    // tf is PER-ROW (a doc's tokens live in one row): token_counts folds it
    // inside the scan, so no raw term instance is ever shuffled — the first
    // exchange already carries only distinct (doc, token, tf) rows. One
    // exchange fewer than the explode + groupBy(doc, token) spelling, and
    // the remaining exchanges move less data.
    val tf = docs.select(col(idCol).alias("doc_id"),
        explode(graft.functions.SketchArrayExpressions.tokenCounts(
          tokens(col(textCol)))).alias("e"))
      .select(col("doc_id"), col("e.token").alias("token"), col("e.tf").alias("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).alias("df"))
    val n = docs.select(count(lit(1)).alias("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("token").asc)
    tf.join(dfreq, "token")
      .crossJoin(broadcast(n))
      .withColumn("score",
        col("tf").cast("double") * (col("n_docs") + 1).cast("double")
          / (col("df") + 1).cast("double"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("token"), col("tf"), col("df"), col("score"), col("rank"))
  }

  /** Model-free document embeddings by the hashing trick
    * ([[graft.functions.FeatureHash]]): tokens → signed bucket counts over
    * `dim` dimensions, one narrow per-row pass. Cosine over these
    * approximates token-multiset similarity — the cheap embedding that
    * feeds [[Similarity]]'s exact/ANN search when no model embedding
    * exists yet. `tokenHash` injectable like the dedup sketches. */
  def hashEmbeddings(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dim: Int = 64,
      tokenHash: Column => Column = graft.ops.Dedup.xxHash): DataFrame =
    docs.select(
      col(idCol),
      graft.functions.SketchArrayExpressions.featureHash(
        transform(tokens(col(textCol)), t => tokenHash(t)), dim).alias("embedding"))

  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), fingerprint(col("text")).alias("fp"))
      .orderBy("doc_id")

  /** Train the [[qualityLogit]] weight vector IN-ENGINE from a labeled
    * fixture — ONE count pass (explode tokens → bucket × label counts,
    * the only shuffle) and a dim-row weight table out:
    *
    *   weight_micro(b) = ⌊10⁶ · P̂(pos | b)⌋ − 500000, with the balanced
    *   Laplace-smoothed posterior
    *   P̂(pos|b) = (pos_b+1)(negT+dim) / ((pos_b+1)(negT+dim) + (neg_b+1)(posT+dim))
    *
    * — the centered smoothed posterior under equal class priors. Its SIGN
    * equals the sign of the per-bucket Naive-Bayes log-odds
    * log((pos_b+1)/(posT+dim)) − log((neg_b+1)/(negT+dim)) (the logistic
    * is monotone), and it is computed with INTEGER arithmetic only —
    * `ln` is not bit-reproducible across engines (Java's Math.log and
    * libm may differ in the last ulp), so true log-odds could not be
    * hash-checked; the centered posterior can, exactly. The three
    * products are computed in DECIMAL(38,0) unconditionally: in BIGINT
    * they overflow silently past ~2·10⁶ tokens per class
    * (10⁶·count·total > 2⁶³ — far below a production corpus), while the
    * decimal spelling is exact to ~10¹⁶ tokens per class and DuckDB's
    * HUGEINT oracle agrees bit-for-bit (overflow regression in
    * TextAnalysisSpec). `div` truncates the decimal ratio back to the
    * BIGINT micro-weight.
    *
    * Unseen buckets get the prior weight (counts 0). Returns
    * (bucket, pos_b, neg_b, weight_micro) — `collect` the dim rows and
    * pass them to [[qualityLogit]]; the trained gate replaces any
    * hand-written stub. */
  def trainQualityWeights(
      labeled: DataFrame,
      textCol: String,
      labelCol: String,
      dim: Int = 64,
      tokenHash: Column => Column = graft.ops.Dedup.xxHash): DataFrame = {
    val perTok = labeled.select(col(labelCol).cast("long").alias("__y"),
        explode(tokens(col(textCol))).alias("__t"))
      .select(col("__y"), pmod(tokenHash(col("__t")), lit(dim)).alias("bucket"))
    val counts = perTok.groupBy(col("bucket"))
      .agg(sum(col("__y")).alias("pos_b"), sum(lit(1L) - col("__y")).alias("neg_b"))
    val totals = counts.agg(
      sum(col("pos_b")).alias("__pt"), sum(col("neg_b")).alias("__nt"))
    val grid = labeled.sparkSession.range(dim).select(col("id").alias("bucket"))
    grid.join(counts, Seq("bucket"), "left").crossJoin(broadcast(totals))
      .select(col("bucket"),
        coalesce(col("pos_b"), lit(0L)).alias("pos_b"),
        coalesce(col("neg_b"), lit(0L)).alias("neg_b"),
        coalesce(col("__pt"), lit(0L)).alias("__pt"),
        coalesce(col("__nt"), lit(0L)).alias("__nt"))
      .withColumn("weight_micro", expr(
        s"""(CAST(1000000 AS DECIMAL(38,0)) * (pos_b + 1) * (__nt + $dim))
            div (CAST(pos_b + 1 AS DECIMAL(38,0)) * (__nt + $dim)
                 + CAST(neg_b + 1 AS DECIMAL(38,0)) * (__pt + $dim))
            - CAST(500000 AS BIGINT)"""))
      .select(col("bucket"), col("pos_b"), col("neg_b"), col("weight_micro"))
  }

  /** Hashed-linear-classifier quality scoring — the fastText/CCNet-style
    * "does a learned filter keep this document" signal, scored at corpus
    * scale: each token hashes to one of `dim` weight buckets and the
    * document's logit is the sum of its tokens' weights. The weight
    * vector is model data (broadcast-sized) — train it in-engine with
    * [[trainQualityWeights]] or pass a model's micro-unit weights — and
    * the whole operator is one narrow codegen'd projection: tokenize →
    * hash → `element_at` lookup → fold, zero shuffles, pipelined into the
    * scan.
    *
    * Arithmetic is EXACT: weights are integer micro-units (1e-6), the
    * logit a bigint sum — no float accumulation order to disagree on, so
    * any engine reproduces every score bit-for-bit (the DuckDB oracle
    * hash-checks logits, not a tolerance). `keep` = logit > 0, the
    * filter-gate consumers actually branch on. `tokenHash` injectable
    * like the dedup sketches.
    */
  def qualityLogit(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dim: Int,
      weightsMicro: Seq[Long],
      tokenHash: Column => Column = graft.ops.Dedup.xxHash): DataFrame = {
    val w = weightsMicro
    require(w.length == dim, s"need $dim weights, got ${w.length}")
    val warr = array(w.map(lit): _*)
    docs.select(
        col(idCol),
        aggregate(
          transform(tokens(col(textCol)),
            t => element_at(warr, pmod(tokenHash(t), lit(dim)).cast("int") + 1)),
          lit(0L), (a, x) => a + x).alias("logit_micro"))
      .withColumn("keep", col("logit_micro") > 0L)
  }

  /** BPE merge-candidate counting — iteration one of byte-pair-encoding
    * training (Sennrich et al., arXiv:1508.07909): corpus-wide counts of
    * adjacent character pairs WITHIN tokens, returning the `topK` most
    * frequent (the pair a BPE trainer would merge first, then the next
    * candidates). The trainer's subsequent iterations re-run this count
    * over progressively merged symbols; the count itself is the step that
    * costs at 100 TB, and it is exactly this shape.
    *
    * Scale shape: tokenize → per-row character-pair explode (narrow,
    * `substring` over an index sequence — no char-array materialization
    * beyond one token per row) → ONE partial-aggregated groupBy (the
    * ~|alphabet|² key space collapses map-side) → TakeOrdered top-k.
    */
  def bpePairCounts(docs: DataFrame, textCol: String, topK: Int = 30): DataFrame =
    // Per-row fold ([[graft.functions.CharPairCounts]]): each doc's
    // DISTINCT pairs with counts in one compiled pass — the exchange input
    // shrinks by the per-doc repetition factor vs exploding every pair
    // instance through two substring passes (measured 1.29 s → 0.57 s warm
    // at sf0.1; parity with the instance-explode spelling is spec-pinned).
    docs.select(explode(graft.functions.SketchArrayExpressions.charPairCounts(
        tokens(col(textCol)))).alias("bg"))
      .select(col("bg.c1").alias("c1"), col("bg.c2").alias("c2"),
        col("bg.tf").alias("tf"))
      .groupBy(col("c1"), col("c2"))
      .agg(sum(col("tf")).alias("pair_count"))
      .orderBy(col("pair_count").desc, col("c1").asc, col("c2").asc)
      .limit(topK)

  /** Inverted-index construction for the corpus's rare terms: for the
    * `topTokens` lowest-document-frequency tokens reaching `minDf`, the
    * posting list of the first `maxPostings` doc ids (sorted) plus the
    * exact df — the retrieval-index primitive behind contamination lookup
    * and rare-phrase attribution, bounded so the output is oracle-sized.
    *
    * Scale shape: per-doc DISTINCT tokens explode once (narrow), document
    * frequencies partial-aggregate map-side, the rare-token pick plans as
    * TakeOrdered (per-partition heads), and the postings join broadcasts
    * the ≤ `topTokens`-row rare set — the corpus-sized posting stream is
    * never shuffled except by its own (token-keyed, rare-token-only)
    * groupBy. The per-token cap applies BEFORE the collect via a
    * row_number window (plans as WindowGroupLimit — per-partition
    * pruning), so no task ever buffers an unbounded posting list.
    */
  def invertedIndex(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minDf: Long = 2L,
      topTokens: Int = 50,
      maxPostings: Int = 20): DataFrame = {
    val tk = docs.select(col(idCol).alias("__id"),
      explode(array_distinct(tokens(col(textCol)))).alias("token"))
    val dfq = tk.groupBy(col("token")).agg(count(lit(1)).alias("df"))
    val rare = dfq.filter(col("df") >= minDf)
      .orderBy(col("df").asc, col("token").asc).limit(topTokens)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("token")).orderBy(col("__id").asc)
    tk.join(broadcast(rare), Seq("token"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxPostings)
      .groupBy(col("token"), col("df"))
      .agg(array_join(
        transform(array_sort(collect_list(col("__id"))), i => i.cast("string")),
        " ").alias("postings"))
  }

  /** Adjacent-token bigram instances: one row per (w1, w2) occurrence, with
    * any `carry` columns (e.g. the doc id) threaded through. The ONE shared
    * bigram explode — [[pmiPairs]] and [[TrainPrep.bigramFamiliarity]] both
    * aggregate from this builder, so the tokenize/explode semantics cannot
    * drift between the collocation and familiarity paths. Entirely narrow
    * (tokenize → per-row index transform → explode). */
  private[graft] def bigramInstances(
      docs: DataFrame,
      textCol: String,
      carry: Seq[Column] = Nil): DataFrame =
    docs
      .select(carry :+ tokens(col(textCol)).alias("__toks"): _*)
      .filter(size(col("__toks")) >= 2)
      .select(carry :+
        explode(transform(sequence(lit(1), size(col("__toks")) - 1),
          i => struct((col("__toks"))(i - 1).alias("w1"),
            (col("__toks"))(i).alias("w2")))).alias("bg"): _*)
      .select(carry ++ Seq(col("bg.w1").alias("w1"), col("bg.w2").alias("w2")): _*)

  /** Collocation mining by pointwise mutual information in ratio form:
    * `pmi_ratio = c(w1,w2)·N / (c(w1)·c(w2))` — exp(PMI) rather than the
    * log, which preserves the ranking while keeping the score one
    * fixed-order double expression (exact BIGINT counts in, one multiply
    * and one divide out — reproducible in any engine; ln is not).
    * Returns the `topK` pairs with corpus count ≥ `minCount`.
    *
    * Scale shape: bigram instances reduce to pair counts in one partial-
    * aggregated shuffle; the two marginal-count joins run on the PAIR
    * table, where a token key's row count is bounded by its distinct-
    * neighbor count (never the Zipf-skewed instance table); the global
    * top-k plans as TakeOrdered.
    */
  def pmiPairs(
      docs: DataFrame,
      textCol: String,
      minCount: Long = 5L,
      topK: Int = 30): DataFrame = {
    // The pair-count table feeds FOUR consumers (cx, cy, n, the final join),
    // and n is a broadcast subplan whose stage launches concurrently with
    // the main scan. Without an eagerly-materialized persist the consumers
    // race to populate the cache and each recomputes the full bigram
    // aggregation (the round-5 bench's warm>cold inversion) — so the
    // reduction is pinned, exactly like bigramFamiliarity's.
    // Per-row `word_pair_counts` fold: the aggregate input is each doc's
    // DISTINCT bigrams with counts (narrow), not every instance — same
    // shared implementation as bigramFamiliarity's perDoc reduction.
    val pairs = Pin(docs.select(
        explode(graft.functions.SketchArrayExpressions.wordPairCounts(
          tokens(col(textCol)))).alias("bg"))
      .groupBy(col("bg.w1").alias("w1"), col("bg.w2").alias("w2"))
      .agg(sum(col("bg.tf")).alias("c12")))
    val cx = pairs.groupBy(col("w1")).agg(sum(col("c12")).alias("c1"))
    val cy = pairs.groupBy(col("w2")).agg(sum(col("c12")).alias("c2"))
    val n = pairs.agg(sum(col("c12")).alias("__n"))
    pairs
      .join(cx, Seq("w1")).join(cy, Seq("w2"))
      .crossJoin(broadcast(n))
      .filter(col("c12") >= minCount)
      .select(col("w1"), col("w2"), col("c12"),
        ((col("c12").cast("double") * col("__n").cast("double"))
          / (col("c1").cast("double") * col("c2").cast("double"))).alias("pmi_ratio"))
      .orderBy(col("pmi_ratio").desc, col("w1").asc, col("w2").asc)
      .limit(topK)
  }

  /** BM25 retrieval for a fixed term set (Robertson & Zaragoza, "The
    * Probabilistic Relevance Framework: BM25 and Beyond"): score every
    * document against `terms` and return the global top `topK`. The idf is
    * the rational form `(N - df + 0.5) / (df + 0.5)` — BM25's odds ratio
    * without the log wrapper, which preserves the ranking while keeping
    * every arithmetic step a fixed-order IEEE operation any engine
    * replicates exactly (ln is not bit-specified across runtimes).
    *
    * Scale shape: per-term tf is a narrow `size(filter(tokens))` inside the
    * scan — the corpus is never exploded or shuffled. Corpus statistics
    * (N, Σdl, per-term df) are ONE global aggregate (partial map-side, a
    * single 1-row result) broadcast back; scoring is narrow; the global
    * top-k plans as TakeOrdered (per-partition heads, no full sort).
    */
  def bm25(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75,
      topK: Int = 20): DataFrame = {
    val toks = tokens(col(textCol))
    val withTf = docs.select(
      col(idCol).alias("doc_id") +:
        size(toks).cast("long").alias("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(toks, x => x === lit(t))).cast("long").alias(s"tf$i")
        }: _*)
    val stats = withTf.agg(
      count(lit(1)).alias("n_docs"),
      sum(col("dl")).alias("sum_dl") +:
        terms.indices.map(i =>
          sum(when(col(s"tf$i") > 0L, 1L).otherwise(0L)).alias(s"df$i")): _*)
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val score = terms.indices.map { i =>
      val tf = col(s"tf$i").cast("double")
      val idf = ((col("n_docs") - col(s"df$i")).cast("double") + lit(0.5)) /
        (col(s"df$i").cast("double") + lit(0.5))
      idf * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl").cast("double") / avgdl)))
    }.reduce(_ + _)
    withTf.crossJoin(broadcast(stats))
      .withColumn("score", score)
      .select(col("doc_id") +: col("dl") +:
        terms.indices.map(i => col(s"tf$i")) :+ col("score"): _*)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(topK)
  }

  /** Heavy hitters with Count-Min estimates: the exact top-k tokens by
    * occurrence count, each with the estimate a [[graft.functions
    * .CountMinAgg]] sketch of the whole token stream gives for it
    * (`est_count ≥ exact_count` always; the gap is the sketch's collision
    * error, surfaced in the checked output on purpose).
    *
    * Why this shape scales: the sketch is ONE depth×width long array built
    * with map-side partial aggregation — the full token stream never
    * shuffles for the estimate (only the fixed-size tables merge), so a
    * 100 TB corpus costs one narrow pass plus a few-KB reduce. The exact
    * side here is the verification harness; a production pipeline at scale
    * keeps ONLY the sketch (bounded memory, mergeable across files/days)
    * and probes candidate tokens against it.
    *
    * All arithmetic is integer (hash family shared with [[graft.functions
    * .MinhashAgg]]), so sketch contents and estimates are bit-identical
    * across partitionings and engines — the DuckDB oracle rebuilds the
    * probed buckets and hash-matches. */
  def heavyHitters(
      docs: DataFrame,
      textCol: String,
      k: Int,
      depth: Int = 4,
      width: Int = 64,
      tokenHash: Column => Column = graft.ops.Dedup.xxHash): DataFrame = {
    val p = 2147483647L
    val inst = docs.select(
        explode(tokens(col(textCol))).alias("token"))
      .withColumn("h", tokenHash(col("token")))
    val cms = inst.agg(
      graft.functions.SketchAggregates.countMinAgg(col("h"), depth, width)
        .alias("cms"))
    val top = inst.groupBy(col("token"), col("h"))
      .agg(count(lit(1)).alias("exact_count"))
      .orderBy(col("exact_count").desc, col("token").asc)
      .limit(k)
    val est = least((0 until depth).map { i =>
      val a = 1103515245L * (i + 1) % p
      val b = 12345L * (i * 2 + 1) % p
      element_at(col("cms"),
        (lit(i * width) + pmod(pmod(col("h") * a + b, lit(p)), lit(width)) + 1)
          .cast("int"))
    }: _*)
    top.crossJoin(broadcast(cms))
      .select(col("token"), col("exact_count"), est.alias("est_count"))
      .orderBy(col("exact_count").desc, col("token").asc)
  }

  /** Per-group distinct-token cardinality: exact count side-by-side with a
    * HyperLogLog estimate from [[graft.functions.HllRegistersAgg]] (2^p
    * registers, elementwise-max merge).
    *
    * Scale: the exact side shuffles distinct (group, token-hash) pairs —
    * fine at test scale, and it is the verification harness; the SKETCH
    * side shuffles one 2^p-long register array per group per partition no
    * matter the cardinality, and registers merge across files/days/
    * engines (max is commutative + idempotent, so retries and replays are
    * harmless). The estimate is the raw HLL formula `0.709·m²/Σ2^-M_j`
    * with powers of two as bit shifts — every step fixed-order IEEE, no
    * libm, so the oracle reproduces the DOUBLE bit-for-bit. Zero-register
    * count is surfaced so consumers can apply small-range corrections
    * without re-scanning. */
  def distinctCardinality(
      docs: DataFrame,
      groupCol: String,
      textCol: String,
      p: Int = 6,
      tokenHash: Column => Column = graft.ops.Dedup.xxHash): DataFrame = {
    val m = 1 << p
    val inst = docs.select(col(groupCol).alias("grp"),
        explode(tokens(col(textCol))).alias("token"))
      .withColumn("h", tokenHash(col("token")))
    val exact = inst.groupBy(col("grp"))
      .agg(countDistinct(col("token")).alias("n_exact"))
    val regs = inst.groupBy(col("grp"))
      .agg(graft.functions.SketchAggregates.hllRegistersAgg(col("h"), p)
        .alias("regs"))
    // SQL-string lambda: the Column-API shiftleft only takes literal bit
    // counts; the SQL form shifts by the register value. Powers of two via
    // shift (not pow) keep every term exact in both engines.
    val sumInv = expr(
      "aggregate(regs, cast(0.0 as double), (acc, r) -> " +
        "acc + 1.0d / cast(shiftleft(1L, cast(r as int)) as double))")
    regs.join(exact, Seq("grp"))
      .select(col("grp"),
        col("n_exact"),
        (lit(0.709) * lit(m.toDouble) * lit(m.toDouble) / sumInv).alias("hll_est"),
        size(filter(col("regs"), r => r === 0L)).cast("long").alias("n_zero_regs"))
      .orderBy("grp")
  }

  /** Hybrid retrieval by reciprocal-rank fusion (Cormack et al., SIGIR'09):
    * fuse a sparse BM25 top-`listSize` list and a dense embedding-cosine
    * top-`listSize` list into `rrf(d) = Σ_lists 1/(rrfK + rank_d)` —
    * the standard sparse+dense fusion that needs no score calibration.
    *
    * Scale shape: each tower produces its list with its own scalable plan
    * (BM25: narrow tf + one broadcast stats row + TakeOrdered; dense:
    * broadcast 1-row query vector, corpus scanned once, TakeOrdered);
    * fusion then runs on ≤ 2·listSize rows — the rank windows never see
    * the corpus. Ranks are integers and the RRF sum is two fixed-order
    * divisions, so the fused scores hash-match across engines. Docs
    * missing from a list contribute 0 (rank reported as 0 = absent). */
  def hybridRrf(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      listSize: Int = 100,
      k: Int = 20,
      rrfK: Int = 60,
      dim: Int = 64,
      tokenHash: Column => Column = graft.ops.Dedup.xxHash): DataFrame = {
    import graft.functions.VectorFunctions
    val sparseW = BoundedWindow
      .orderBy(col("score").desc, col("doc_id").asc)
    val sparse = bm25(docs, idCol, textCol, terms, topK = listSize)
      .select(col("doc_id"), col("score"))
      .withColumn("rank_sparse", row_number().over(sparseW).cast("long"))
      .select(col("doc_id"), col("rank_sparse"))
    val emb = hashEmbeddings(docs, idCol, textCol, dim, tokenHash)
      .select(col(idCol).alias("doc_id"), col("embedding").alias("tvec"))
      .filter(VectorFunctions.dot(col("tvec"), col("tvec")) > 0)
    val qEmb = hashEmbeddings(
        docs.sparkSession.createDataFrame(
          java.util.List.of(org.apache.spark.sql.Row(0L, terms.mkString(" "))),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("qid",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("qtext",
              org.apache.spark.sql.types.StringType)))),
        "qid", "qtext", dim, tokenHash)
      .select(col("embedding").alias("qvec"))
    val denseW = BoundedWindow
      .orderBy(col("dscore").desc, col("doc_id").asc)
    val dense = emb.crossJoin(broadcast(qEmb))
      .select(col("doc_id"),
        VectorFunctions.cosine(col("qvec"), col("tvec")).alias("dscore"))
      .orderBy(col("dscore").desc, col("doc_id").asc)
      .limit(listSize)
      .withColumn("rank_dense", row_number().over(denseW).cast("long"))
      .select(col("doc_id"), col("rank_dense"))
    sparse.join(dense, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("rank_sparse"), lit(0L)).alias("rank_sparse"),
        coalesce(col("rank_dense"), lit(0L)).alias("rank_dense"),
        (when(col("rank_sparse").isNotNull,
            lit(1.0) / (lit(rrfK).cast("double") + col("rank_sparse").cast("double")))
          .otherwise(lit(0.0)) +
         when(col("rank_dense").isNotNull,
            lit(1.0) / (lit(rrfK).cast("double") + col("rank_dense").cast("double")))
          .otherwise(lit(0.0))).alias("rrf"))
      .orderBy(col("rrf").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Sparse TF-cosine document-pair similarity via capped posting lists —
    * the inverted-index complement to [[Similarity]]'s dense ANN.
    *
    * Scale design (the champion-list pattern of classic IR engines):
    *  - per-doc term frequencies fold INSIDE the scan
    *    ([[graft.functions.TokenCounts]]) — the first exchange already
    *    carries (doc, token, tf), never raw token instances;
    *  - hapax terms (df < minDf) can't create pairs and are dropped;
    *  - each surviving posting list is CAPPED to its `maxPostings`
    *    highest-tf docs (WindowGroupLimit prunes per-partition before the
    *    exchange) — the self-join fanout is ≤ maxPostings² per token no
    *    matter how hot the token, which is what makes the operator safe on
    *    a Zipf vocabulary at 100 TB;
    *  - the pair aggregate partially combines map-side; dot products and
    *    norms are exact bigint sums, the final cosine is one fixed-order
    *    double expression — hash-exact cross-engine.
    * The cap is the standard champion-list approximation; the ORACLE
    * replicates the same deterministic cap (tf desc, doc asc), so the
    * check is still bit-exact. */
  def sparseCosinePairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minDf: Long = 2L,
      maxPostings: Int = 100,
      topK: Int = 30): DataFrame = {
    val tf = docs.select(col(idCol).alias("doc_id"),
        explode(graft.functions.SketchArrayExpressions.tokenCounts(
          tokens(col(textCol)))).alias("e"))
      .select(col("doc_id"), col("e.token").alias("token"),
        col("e.tf").alias("tf"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).alias("df"))
    val champW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("token")).orderBy(col("tf").desc, col("doc_id").asc)
    val champ = tf.join(dfreq.filter(col("df") >= minDf), "token")
      .withColumn("pr", row_number().over(champW))
      .filter(col("pr") <= maxPostings)
      .select("doc_id", "token", "tf")
    val norms = champ.groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("tf")).alias("n2"))
    val a = champ.select(col("doc_id").alias("doc_a"), col("token"),
      col("tf").alias("tf_a"))
    val b = champ.select(col("doc_id").alias("doc_b"), col("token"),
      col("tf").alias("tf_b"))
    val pairs = a.join(b, Seq("token"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(col("tf_a") * col("tf_b")).alias("dot"))
    pairs
      .join(norms.select(col("doc_id").alias("doc_a"), col("n2").alias("n2_a")), "doc_a")
      .join(norms.select(col("doc_id").alias("doc_b"), col("n2").alias("n2_b")), "doc_b")
      .withColumn("score",
        col("dot").cast("double") /
          (sqrt(col("n2_a").cast("double")) * sqrt(col("n2_b").cast("double"))))
      .select(col("doc_a"), col("doc_b"), col("dot"), col("score"))
      .orderBy(col("score").desc, col("doc_a").asc, col("doc_b").asc)
      .limit(topK)
  }

  /** One greedy left-to-right BPE merge pass over a token array: every
    * non-overlapping adjacent occurrence of `(l, r)` becomes the single
    * token `l ++ r` (so `[a,a,a]` under `(a,a)` yields `[aa, a]` — the
    * leftmost pair wins, exactly Sennrich et al.'s replace semantics).
    * Spelled as ONE `aggregate` fold with a (emitted, pending) accumulator
    * — narrow, per-row, no explode — so a merge round over the vocabulary
    * table never shuffles.
    */
  private[graft] def mergePairFold(toks: Column, l: Column, r: Column): Column = {
    val zero = struct(
      array().cast("array<string>").alias("out"),
      lit(null).cast("string").alias("pend"))
    aggregate(
      toks,
      zero,
      (acc, t) =>
        when(acc.getField("pend") === l && t === r,
          struct(
            concat(acc.getField("out"), array(concat(l, r))).alias("out"),
            lit(null).cast("string").alias("pend")))
          .otherwise(struct(
            when(acc.getField("pend").isNull, acc.getField("out"))
              .otherwise(concat(acc.getField("out"), array(acc.getField("pend"))))
              .alias("out"),
            t.alias("pend"))),
      acc =>
        when(acc.getField("pend").isNull, acc.getField("out"))
          .otherwise(concat(acc.getField("out"), array(acc.getField("pend")))))
  }

  /** Adjacent token pairs of an array as `struct(l, r)` rows — guarded so
    * single-token arrays yield an empty list rather than a descending
    * `sequence` surprise. */
  private def adjacentPairs(toks: Column): Column =
    when(size(toks) > 1,
      transform(sequence(lit(1), size(toks) - 1),
        i => struct(element_at(toks, i).alias("l"),
          element_at(toks, i + 1).alias("r"))))
      .otherwise(array().cast("array<struct<l:string,r:string>>"))

  /** In-engine BPE merge-table training (Sennrich et al. 1508.07909, the
    * tokenizer-training step of an LLM data pipeline): `numMerges` rounds
    * of count-adjacent-pairs → argmax (ties to the lexicographically
    * smallest pair) → greedy merge, run over the DISTINCT-WORD vocabulary
    * weighted by corpus frequency, never over the corpus itself. The
    * corpus is read ONCE (the word count); after that every round is one
    * partial-aggregated groupBy over the vocabulary-sized state plus a
    * narrow [[mergePairFold]] rewrite — at 100 TB the state is
    * millions-of-words small while the corpus is petabytes, which is the
    * entire trick. The per-round argmax is a one-row TakeOrdered collect
    * (the same bounded class as the quality-weight table); the driver
    * loop is `numMerges` iterations like pointer-doubling's, with a
    * lazy localCheckpoint per round to keep lineage flat.
    *
    * Pair counts include overlapping occurrences (`aaa` counts `(a,a)`
    * twice) while the merge pass is non-overlapping greedy — both per the
    * reference algorithm. Returns the learned merge table
    * `(merge_rank, lhs, rhs, merged, pair_count)`, the model artifact a
    * tokenizer ships.
    */
  def bpeTrainMerges(
      docs: DataFrame,
      textCol: String,
      numMerges: Int): DataFrame = {
    val sp = docs.sparkSession
    import sp.implicits._
    bpeTrainCore(docs, textCol, numMerges)._1
      .toDF("merge_rank", "lhs", "rhs", "merged", "pair_count")
  }

  /** The trainer loop shared by [[bpeTrainMerges]] (which returns the
    * merge table) and [[bpeVocab]] (which also needs the final
    * segmentation state): returns the learned merges AND the post-merge
    * vocabulary state `(word, cnt, toks)`. */
  private def bpeTrainCore(
      docs: DataFrame,
      textCol: String,
      numMerges: Int): (Seq[(Long, String, String, String, Long)], DataFrame) = {
    require(numMerges >= 1, s"bpeTrainMerges: need numMerges >= 1, got $numMerges")
    var state = docs
      .select(explode(bpeTokens(col(textCol))).alias("word"))
      .groupBy(col("word")).agg(count(lit(1)).alias("cnt"))
      .withColumn("toks", split(col("word"), ""))
      .localCheckpoint(false)
    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    var k = 0
    var exhausted = false
    while (k < numMerges && !exhausted) {
      val best = state
        .select(col("cnt"), explode(adjacentPairs(col("toks"))).alias("p"))
        .groupBy(col("p.l").alias("l"), col("p.r").alias("r"))
        .agg(sum(col("cnt")).alias("c"))
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) =
          (best.head.getString(0), best.head.getString(1), best.head.getLong(2))
        merges += (((k + 1).toLong, l, r, l + r, c))
        state = state
          .withColumn("toks", mergePairFold(col("toks"), lit(l), lit(r)))
          .localCheckpoint(false)
        k += 1
      }
    }
    (merges.result(), state)
  }

  /** The tokenizer's vocabulary artifact: after `numMerges` training
    * rounds, the `topK` highest-frequency tokens in the final
    * segmentation state with contiguous ids in (freq desc, token asc)
    * order. The frequency aggregate is vocabulary-sized (it reads the
    * trainer's word-level state, not the corpus); the id window runs over
    * the already-LIMITed topK rows — rank within the top-k equals global
    * rank because the orderings are identical, so no data-wide window
    * exists at any scale. */
  def bpeVocab(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      topK: Int): DataFrame =
    vocabFromState(bpeTrainCore(docs, textCol, numMerges)._2, topK)

  private def vocabFromState(state: DataFrame, topK: Int): DataFrame = {
    val freq = state
      .select(col("cnt"), explode(col("toks")).alias("token"))
      .groupBy(col("token")).agg(sum(col("cnt")).alias("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(topK)
    freq.withColumn("token_id",
        row_number().over(BoundedWindow
          .orderBy(col("freq").desc, col("token").asc)).cast("long"))
      .select(col("token"), col("freq"), col("token_id"))
  }

  /** One trainer run, both shipped artifacts: the merge table AND the
    * vocabulary — the pair a tokenizer deploys together and
    * [[graft.streaming.Streams.sinkWithTokenizerMonitor]] maintains as
    * catalog tables. Avoids the double-train a separate
    * [[bpeTrainMerges]] + [[bpeVocab]] call would pay. */
  def bpeTrainArtifacts(
      docs: DataFrame,
      textCol: String,
      numMerges: Int,
      topK: Int): (DataFrame, DataFrame) = {
    val sp = docs.sparkSession
    import sp.implicits._
    val (merges, state) = bpeTrainCore(docs, textCol, numMerges)
    (merges.toDF("merge_rank", "lhs", "rhs", "merged", "pair_count"),
      vocabFromState(state, topK))
  }

  /** Instance-weighted UNK share of a batch under a SHIPPED tokenizer
    * (merge list + vocabulary): segment each DISTINCT word of the batch
    * with the merges, count post-merge token instances whose token is
    * outside the vocabulary. This is the tokenizer-staleness signal — the
    * fraction of the batch that would encode to id 0 — rising exactly
    * when the corpus drifts away from what the tokenizer was trained on.
    * Cost: batch-vocabulary-sized folds plus one broadcast of the (≤topK)
    * vocab array; the batch itself is scanned once.
    */
  def bpeUnkRate(
      docs: DataFrame,
      textCol: String,
      merges: Seq[(String, String)],
      vocab: DataFrame): Double = {
    val words = docs
      .select(explode(bpeTokens(col(textCol))).alias("word"))
      .groupBy(col("word")).agg(count(lit(1)).alias("n"))
      .withColumn("toks",
        merges.foldLeft(split(col("word"), ""): Column) { case (c, (l, r)) =>
          mergePairFold(c, lit(l), lit(r))
        })
    val varr = vocab.agg(sort_array(collect_list(col("token"))).alias("__vocab"))
    val row = words.crossJoin(broadcast(varr))
      .select(col("n"),
        size(col("toks")).cast("long").alias("nt"),
        size(filter(col("toks"),
          t => !array_contains(col("__vocab"), t))).cast("long").alias("nu"))
      .agg(sum(col("n") * col("nt")).alias("t"),
        sum(col("n") * col("nu")).alias("u"))
      .head()
    if (row.isNullAt(0) || row.getLong(0) == 0L) 0.0
    else row.getLong(1).toDouble / row.getLong(0).toDouble
  }

  /** The composed tokenizer path: train `numMerges` merges, build the
    * `topK` vocabulary, and encode every document as its token-id array
    * (tokens outside the vocabulary map to id 0, the UNK convention).
    * Dictionary-spelled end to end: the per-WORD id lists are computed
    * once over the trainer's vocabulary-sized state (one broadcast of the
    * id map onto it), broadcast onto the word-instance stream, and
    * reassembled per document in pre-token order — the corpus pays one
    * narrow pre-tokenize pass plus one id-keyed re-aggregation
    * (map-side-combined), never a fold per instance. Documents with no
    * pre-tokens are dropped, matching [[bpeSegmentedTokenCountDict]].
    */
  def bpeEncode(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numMerges: Int,
      topK: Int): DataFrame = {
    val state = bpeTrainCore(docs, textCol, numMerges)._2
    val wordIds = state.select(col("word"), col("toks"))
      .crossJoin(broadcast(vocabMap(vocabFromState(state, topK))))
      .select(col("word"),
        transform(col("toks"),
          t => coalesce(element_at(col("__vmap"), t), lit(0L))).alias("__ids"))
    encodeInstances(docs, idCol, textCol, wordIds)
  }

  /** [[bpeEncode]] against SHIPPED artifacts — the merge list and
    * vocabulary a prior training run (or
    * [[graft.streaming.Streams.sinkWithTokenizerMonitor]]'s maintained
    * tables) produced — so inference never retrains: the word dictionary
    * is built by folding the CORPUS'S OWN distinct words through the
    * merges (batch-vocabulary-sized work), then the same broadcast +
    * id-keyed reassembly as [[bpeEncode]]. */
  def bpeEncodeWith(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)],
      vocab: DataFrame): DataFrame = {
    val wordIds = docs
      .select(explode(bpeTokens(col(textCol))).alias("word")).distinct()
      .withColumn("toks",
        merges.foldLeft(split(col("word"), ""): Column) { case (c, (l, r)) =>
          mergePairFold(c, lit(l), lit(r))
        })
      .crossJoin(broadcast(vocabMap(vocab)))
      .select(col("word"),
        transform(col("toks"),
          t => coalesce(element_at(col("__vmap"), t), lit(0L))).alias("__ids"))
    encodeInstances(docs, idCol, textCol, wordIds)
  }

  private def vocabMap(vocab: DataFrame): DataFrame =
    vocab.agg(map_from_entries(
      collect_list(struct(col("token"), col("token_id")))).alias("__vmap"))

  private def encodeInstances(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      wordIds: DataFrame): DataFrame = {
    val inst = docs.select(col(idCol),
      posexplode(bpeTokens(col(textCol))).as(Seq("__p", "word")))
    inst.join(broadcast(wordIds), Seq("word"))
      .groupBy(col(idCol))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("__p"), col("__ids").alias("__i")))),
        s => s("__i"))).alias("token_ids"))
      .orderBy(col(idCol))
  }

  /** Apply a learned BPE merge list (rank order) and count each document's
    * resulting tokens — the inference side of [[bpeTrainMerges]]. Entirely
    * narrow: per row, pre-tokenize → per-word char split → one
    * [[mergePairFold]] per merge → sum of segment lengths; zero shuffles
    * at any corpus size — but the fold work is |instances| × |merges| and
    * the accumulator append is O(word²), so it grows linearly with the
    * merge count (measured: 5.4 s → 21.5 s from 6 to 24 merges at 40k
    * docs). [[bpeSegmentedTokenCountDict]] is the production spelling
    * (vocabulary-priced, measured flat ~1.4 s over the same sweep); this
    * form remains the zero-shuffle baseline the dict variant is
    * spec-equal to. Documents with no pre-tokens (null/empty text) are
    * dropped, matching the oracle's join semantics.
    */
  def bpeSegmentedTokenCount(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    def segLen(w: Column): Column =
      size(merges.foldLeft(split(w, ""): Column) { case (c, (l, r)) =>
        mergePairFold(c, lit(l), lit(r))
      }).cast("long")
    docs
      .select(col(idCol),
        coalesce(
          aggregate(transform(bpeTokens(col(textCol)), w => segLen(w)),
            lit(0L), (a, x) => a + x),
          lit(0L)).alias("n_tokens"))
      .filter(col("n_tokens") > 0L)
      .orderBy(col(idCol))
  }

  /** [[bpeSegmentedTokenCount]]'s dictionary spelling: segment each
    * DISTINCT word once (vocabulary-sized fold work instead of
    * instance-sized), then join the per-word lengths back onto the
    * instance stream. Identical output; different cost shape — the fold
    * runs |vocab| × |merges| times instead of |instances| × |merges|, at
    * the price of one id-keyed re-aggregation (map-side-combined down to
    * per-document partials before it exchanges; the dictionary side joins
    * as a broadcast, so the instance stream itself never shuffles on the
    * word key). Wins once the merge list is long or word repetition is
    * high; the crossover is measured in SCALE.md §BPE. */
  def bpeSegmentedTokenCountDict(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val inst = docs.select(col(idCol),
      explode(bpeTokens(col(textCol))).alias("word"))
    val dict = inst.select(col("word")).distinct()
      .withColumn("__len",
        size(merges.foldLeft(split(col("word"), ""): Column) {
          case (c, (l, r)) => mergePairFold(c, lit(l), lit(r))
        }).cast("long"))
    inst.join(broadcast(dict), Seq("word"))
      .groupBy(col(idCol))
      .agg(sum(col("__len")).alias("n_tokens"))
      .filter(col("n_tokens") > 0L)
      .orderBy(col(idCol))
  }

  /** Train-then-segment composed WITHOUT re-deriving the dictionary: the
    * trainer's final state already holds every distinct word's
    * segmentation after the learned merges (`(word, cnt, toks)` — the
    * same `mergePairFold` chain [[bpeSegmentedTokenCountDict]] would
    * re-apply to the same distinct-word set), so the per-word token
    * count is just `size(toks)` read off the (checkpointed) state. Same
    * output as `bpeTrainMerges` + `bpeSegmentedTokenCountDict`; skips
    * the segmenter's distinct-word aggregate and its |vocab| × |merges|
    * fold re-run. The dict spelling stays the API for SHIPPED merge
    * lists (inference against a stored artifact — no trainer state to
    * read). */
  def bpeSegmentedTokenCountFromTrain(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numMerges: Int): DataFrame = {
    val state = bpeTrainCore(docs, textCol, numMerges)._2
    val dict = state.select(col("word"),
      size(col("toks")).cast("long").alias("__len"))
    docs.select(col(idCol), explode(bpeTokens(col(textCol))).alias("word"))
      .join(broadcast(dict), Seq("word"))
      .groupBy(col(idCol))
      .agg(sum(col("__len")).alias("n_tokens"))
      .filter(col("n_tokens") > 0L)
      .orderBy(col(idCol))
  }

  // ──────────────────── Unigram-LM tokenizer (SentencePiece) ─────────────────

  /** The distinct-word frequency table every unigram stage works over —
    * vocabulary-sized, the corpus itself is read once. */
  private def unigramWordTable(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(bpeTokens(col(textCol))).alias("word"))
      .groupBy(col("word")).agg(count(lit(1)).alias("cnt"))

  /** Seed candidate vocabulary for [[unigramTrain]]: every substring of
    * every distinct word up to `maxPieceLen` chars, frequency-weighted by
    * corpus word counts; ALL single characters are kept unconditionally
    * (they are what keeps every word segmentable at every EM round), plus
    * the `seedSize` most frequent multi-char pieces at `minCount`+. The
    * candidate stream is vocabulary × ≤ len·maxPieceLen — never the
    * corpus; the top-k is a TakeOrdered, not a sort. */
  private[graft] def unigramSeedPieces(
      words: DataFrame,
      maxPieceLen: Int,
      seedSize: Int,
      minCount: Long): DataFrame = {
    val subs = words.select(col("cnt"),
        explode(flatten(transform(sequence(lit(1), length(col("word")).cast("int")),
          i => transform(sequence(lit(1), least(lit(maxPieceLen), i)),
            l => col("word").substr(i - l + 1, l))))).alias("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).alias("freq"))
    subs.filter(length(col("piece")) === 1).unionByName(
      subs.filter(length(col("piece")) > 1 && col("freq") >= minCount)
        .orderBy(col("freq").desc, col("piece").asc).limit(seedSize))
  }

  /** Integer-exact piece scores: `p_micro = max(1, ⌊10⁶·freq/Σfreq⌋)`
    * (DECIMAL(38,0) product, so no corpus magnitude overflows) and the
    * Viterbi edge weight `cost_centi = 2000 − ⌊100·log₂ p_micro⌋` — a
    * centi-bit quantization of −log₂ p. The floor is stable across
    * engines: consecutive integer inputs are ≥ 1.44·10⁻⁴/p··· apart on
    * the 100·log₂ scale while double error is ~10⁻¹³, so both engines
    * floor the same integer unless the TRUE value sits within ~10⁻¹³ of a
    * boundary (verified empirically against DuckDB on the fixture
    * corpora; [[perplexityBuckets]] uses the coarser whole-bit form of
    * the same argument). */
  private def unigramScores(vocab: DataFrame): DataFrame = {
    val tot = vocab.agg(sum(col("freq")).cast("decimal(38,0)").alias("__tot"))
    vocab.crossJoin(broadcast(tot))
      .withColumn("p_micro", greatest(lit(1L),
        expr("CAST((CAST(freq AS DECIMAL(38,0)) * 1000000) div __tot AS BIGINT)")))
      .withColumn("cost_centi",
        lit(2000L) - floor(lit(100.0) * log2(col("p_micro"))))
      .select(col("piece"), col("freq"), col("p_micro"), col("cost_centi"))
  }

  /** Exact Viterbi segmentation of every distinct word under a piece-cost
    * model: minimize `(Σ cost_centi, n_pieces, −last_piece_len)`
    * lexicographically — the integer total order that makes the argmax
    * path unique and engine-reproducible. The DP is ONE narrow
    * `aggregate` fold per word over its ≤ len·maxPieceLen arc list
    * (candidate pieces that exist in the model, attached by one
    * vocabulary-sized equi-join); the backtrace is a second ≤ len-step
    * fold. No shuffle beyond the arc join; the word table is
    * vocabulary-sized at any corpus scale. Returns
    * (word, cnt, pieces array). Every word must be coverable by the
    * model's single characters — [[unigramTrain]] guarantees it. */
  private[graft] def viterbiSegments(
      words: DataFrame,
      model: DataFrame,
      maxPieceLen: Int): DataFrame = {
    val cand = words.select(col("word"), col("cnt"),
        explode(flatten(transform(sequence(lit(1), length(col("word")).cast("int")),
          i => transform(sequence(lit(1), least(lit(maxPieceLen), i)),
            l => struct(i.alias("i"), l.alias("l"),
              col("word").substr(i - l + 1, l).alias("piece")))))).alias("a"))
      .select(col("word"), col("cnt"),
        col("a.i").alias("i"), col("a.l").alias("l"), col("a.piece").alias("piece"))
    val arcs = cand
      .join(model.select(col("piece"), col("cost_centi").alias("w")), Seq("piece"))
      .groupBy(col("word"), col("cnt"))
      .agg(collect_list(struct(col("i"), col("l"), col("w"))).alias("arcs"))
      .withColumn("len", length(col("word")).cast("int"))
    // best[p+1] = (cost, pieces, −lastLen) of the best segmentation of the
    // p-char prefix; struct comparison is field-order lexicographic in
    // both Spark and DuckDB, which IS the tie-break
    val zero = array(struct(lit(0L).alias("c"), lit(0L).alias("np"), lit(0L).alias("nl")))
    val withBest = arcs.withColumn("best",
      aggregate(sequence(lit(1), col("len")), zero, (acc, i) =>
        concat(acc, array(array_min(transform(
          filter(col("arcs"), a => a.getField("i") === i),
          a => struct(
            (element_at(acc, i - a.getField("l") + 1).getField("c") +
              a.getField("w")).alias("c"),
            (element_at(acc, i - a.getField("l") + 1).getField("np") +
              lit(1L)).alias("np"),
            (-a.getField("l").cast("long")).alias("nl"))))))))
    withBest.select(col("word"), col("cnt"),
      aggregate(sequence(lit(1), col("len")),
        struct(col("len").alias("pos"),
          array().cast("array<string>").alias("ps")),
        (acc, _) => {
          val pos = acc.getField("pos")
          val l = (-element_at(col("best"), pos + 1).getField("nl")).cast("int")
          when(pos > 0,
            struct((pos - l).alias("pos"),
              concat(array(col("word").substr(pos - l + 1, l)),
                acc.getField("ps")).alias("ps")))
            .otherwise(acc)
        },
        acc => acc.getField("ps")).alias("pieces"))
  }

  /** In-engine unigram-LM tokenizer training (Kudo, arXiv:1804.10959 —
    * the SentencePiece unigram model), as hard (Viterbi) EM over the
    * DISTINCT-WORD table in exact integer arithmetic:
    *
    *  1. seed: all ≤ `maxPieceLen`-char substrings at `minCount`+
    *     frequency ([[unigramSeedPieces]]) plus every single character;
    *  2. E-step: Viterbi-segment every word under the current
    *     integer-quantized scores ([[viterbiSegments]]);
    *  3. M-step: piece frequency ← corpus-weighted usage in those best
    *     segmentations; multi-char pieces with zero usage drop out,
    *     single characters persist (at zero freq → the p_micro ≥ 1
    *     floor), keeping every word segmentable;
    *  4. repeat `emIters` times; ship `(piece, freq, p_micro,
    *     cost_centi)`.
    *
    * Deviation from the paper, stated: the paper's soft-EM expected
    * counts and loss-ranked pruning are replaced by Viterbi counts and
    * zero-usage pruning — the hard-EM variant — because expected counts
    * are irrational (forward–backward ratios) and could never
    * hash-verify across engines; Viterbi counts are exact integers.
    *
    * Scale shape: the corpus is scanned ONCE (the word count); every EM
    * round is vocabulary-sized fold work plus one piece-keyed equi-join,
    * the same state-not-corpus trick as [[bpeTrainMerges]], with the
    * driver loop bounded by `emIters`. */
  def unigramTrain(
      docs: DataFrame,
      textCol: String,
      maxPieceLen: Int = 4,
      seedSize: Int = 60,
      emIters: Int = 2,
      minCount: Long = 2L): DataFrame = {
    require(emIters >= 1, s"unigramTrain: need emIters >= 1, got $emIters")
    val words = unigramWordTable(docs, textCol).localCheckpoint(false)
    val chars = words
      .select(explode(split(col("word"), "")).alias("piece"))
      .filter(col("piece") =!= "").distinct().localCheckpoint(false)
    var vocab = unigramSeedPieces(words, maxPieceLen, seedSize, minCount)
      .localCheckpoint(false)
    for (_ <- 1 to emIters) {
      val segs = viterbiSegments(words, unigramScores(vocab), maxPieceLen)
      val usage = segs.select(col("cnt"), explode(col("pieces")).alias("piece"))
        .groupBy(col("piece")).agg(sum(col("cnt")).alias("freq"))
      vocab = chars.join(usage, Seq("piece"), "left_outer")
        .select(col("piece"), coalesce(col("freq"), lit(0L)).alias("freq"))
        .unionByName(usage.join(chars, Seq("piece"), "left_anti"))
        .localCheckpoint(false)
    }
    unigramScores(vocab).orderBy(col("piece"))
  }

  /** Per-document token counts under a trained unigram model — the
    * inference side of [[unigramTrain]], dictionary-spelled like
    * [[bpeSegmentedTokenCountDict]]: the Viterbi runs once per DISTINCT
    * word, the per-word piece counts broadcast onto the instance stream
    * (no word-key shuffle), one doc-keyed re-aggregation. Documents with
    * no pre-tokens are dropped, matching the BPE family's join
    * semantics. */
  def unigramSegmentCounts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxPieceLen: Int = 4,
      seedSize: Int = 60,
      emIters: Int = 2,
      minCount: Long = 2L): DataFrame = {
    val model = unigramTrain(docs, textCol, maxPieceLen, seedSize, emIters, minCount)
    val words = unigramWordTable(docs, textCol)
    val dict = viterbiSegments(words, model, maxPieceLen)
      .select(col("word"), size(col("pieces")).cast("long").alias("__np"))
    docs.select(col(idCol), explode(bpeTokens(col(textCol))).alias("word"))
      .join(broadcast(dict), Seq("word"))
      .groupBy(col(idCol))
      .agg(sum(col("__np")).alias("n_tokens"))
      .orderBy(col(idCol))
  }

  /** Encode every document as its unigram token-id array: ids are
    * contiguous in (freq desc, piece asc) order over the trained
    * vocabulary (a vocabulary-sized window, the same bounded class as
    * [[bpeVocab]]'s), per-word id lists broadcast onto the instance
    * stream, documents reassembled in pre-token order — the
    * [[bpeEncode]] plan shape with the Viterbi dictionary in place of
    * the merge fold. */
  def unigramEncode(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxPieceLen: Int = 4,
      seedSize: Int = 60,
      emIters: Int = 2,
      minCount: Long = 2L): DataFrame = {
    val model = unigramTrain(docs, textCol, maxPieceLen, seedSize, emIters, minCount)
    val ids = model
      .withColumn("token_id",
        row_number().over(BoundedWindow
          .orderBy(col("freq").desc, col("piece").asc)).cast("long"))
      .select(col("piece").alias("token"), col("token_id"))
    val words = unigramWordTable(docs, textCol)
    val wordIds = viterbiSegments(words, model, maxPieceLen)
      .crossJoin(broadcast(vocabMap(ids)))
      .select(col("word"),
        transform(col("pieces"),
          p => coalesce(element_at(col("__vmap"), p), lit(0L))).alias("__ids"))
    encodeInstances(docs, idCol, textCol, wordIds)
  }

  /** Which of the batch's distinct words the shipped model can segment at
    * all: a word is coverable iff every character is a model piece (the
    * single-character floor [[unigramTrain]] maintains guarantees the
    * Viterbi then completes). Returns (word, covered). */
  private def unigramCoverage(words: DataFrame, model: DataFrame): DataFrame = {
    val charSet = model.filter(length(col("piece")) === 1)
      .agg(sort_array(collect_list(col("piece"))).alias("__chars"))
    words.crossJoin(broadcast(charSet))
      .withColumn("covered",
        forall(filter(split(col("word"), ""), c => c =!= lit("")),
          c => array_contains(col("__chars"), c)))
  }

  /** Encode a batch against a SHIPPED unigram model — the inference path
    * that never retrains, the [[bpeEncodeWith]] sibling: Viterbi the
    * batch's DISTINCT coverable words under the stored piece costs, map
    * pieces through the stored ids, broadcast the per-word id lists onto
    * the instance stream. A word with a character the model has never
    * seen cannot be segmented at all and encodes as a single UNK (id 0)
    * — the same convention as the BPE family's out-of-vocabulary id.
    * `model` is [[unigramTrain]]'s output (or the maintained catalog
    * table), with ids assigned in its (freq desc, piece asc) order. */
  def unigramEncodeWith(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: DataFrame,
      maxPieceLen: Int = 4): DataFrame = {
    val ids = model
      .withColumn("token_id",
        row_number().over(BoundedWindow
          .orderBy(col("freq").desc, col("piece").asc)).cast("long"))
      .select(col("piece").alias("token"), col("token_id"))
    val words = unigramWordTable(docs, textCol)
    val cov = unigramCoverage(words, model).localCheckpoint(false)
    val segIds = viterbiSegments(cov.filter(col("covered")), model, maxPieceLen)
      .crossJoin(broadcast(vocabMap(ids)))
      .select(col("word"),
        transform(col("pieces"),
          p => coalesce(element_at(col("__vmap"), p), lit(0L))).alias("__ids"))
    val unkIds = cov.filter(!col("covered"))
      .select(col("word"), array(lit(0L)).alias("__ids"))
    encodeInstances(docs, idCol, textCol, segIds.unionByName(unkIds))
  }

  /** Instance-weighted share of the batch a shipped unigram model cannot
    * segment (characters outside the model) — the staleness signal the
    * BPE family reads via [[bpeUnkRate]], for the same monitoring loop:
    * rises exactly when the corpus drifts to scripts/symbols the
    * tokenizer never saw. Batch-vocabulary-sized work plus one broadcast
    * of the model's character floor. */
  def unigramUnkRate(
      docs: DataFrame,
      textCol: String,
      model: DataFrame): Double = {
    val words = unigramWordTable(docs, textCol)
    val row = unigramCoverage(words, model)
      .agg(sum(col("cnt")).alias("t"),
        sum(when(col("covered"), lit(0L)).otherwise(col("cnt"))).alias("u"))
      .head()
    if (row.isNullAt(0) || row.getLong(0) == 0L) 0.0
    else row.getLong(1).toDouble / row.getLong(0).toDouble
  }

  // ──────────────────── WordPiece tokenizer (BERT) ────────────────────

  /** WordPiece vocabulary from the corpus — the third tokenizer scheme
    * next to BPE and unigram-LM, completing the family a training-data
    * pipeline ships (Devlin et al. 1810.04805; the greedy inference is
    * Schuster & Nakajima's original WordPiece decoding). Pieces are
    * POSITIONAL: word-INITIAL pieces keep their raw spelling, continuation
    * pieces carry BERT's `##` prefix. `##` can never collide with real
    * text: [[bpePattern]] emits multi-char words only from [A-Za-z0-9]
    * runs and lone punctuation marks, so no word longer than one char
    * contains '#'.
    *
    * Candidates are every ≤ `maxPieceLen`-char substring of every DISTINCT
    * word in its positional form, frequency-weighted by corpus word counts
    * — vocabulary × len·maxPieceLen work, never corpus-sized; the corpus
    * is read once by the word table. Every observed single-character piece
    * is kept unconditionally (the coverage floor that keeps greedy
    * segmentation total on the training corpus — mirroring
    * [[unigramSeedPieces]]'s char floor); the `topK` most frequent
    * multi-char pieces join them, a TakeOrdered, not a sort. token_id is
    * 1-based by (freq desc, token asc); id 0 is the [UNK] every
    * unsegmentable word collapses to at encode time. */
  def wordPieceVocab(
      docs: DataFrame,
      textCol: String,
      maxPieceLen: Int = 6,
      topK: Int = 256): DataFrame = {
    val words = unigramWordTable(docs, textCol)
    val len = length(col("word")).cast("int")
    val subs = words.select(col("cnt"),
        explode(flatten(transform(sequence(lit(1), len), i =>
          transform(sequence(lit(1), least(lit(maxPieceLen), len - i + 1)), l =>
            when(i === 1, col("word").substr(i, l))
              .otherwise(concat(lit("##"), col("word").substr(i, l)))))))
          .alias("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).alias("freq"))
    val bare = when(col("piece").startsWith("##"), length(col("piece")) - 2)
      .otherwise(length(col("piece")))
    subs.filter(bare === 1)
      .unionByName(subs.filter(bare > 1)
        .orderBy(col("freq").desc, col("piece").asc).limit(topK))
      .withColumn("token_id",
        row_number().over(BoundedWindow
          .orderBy(col("freq").desc, col("piece").asc)).cast("long"))
      .select(col("piece").alias("token"), col("freq"), col("token_id"))
  }

  /** In-engine WordPiece MERGE training (Schuster & Nakajima, ICASSP 2012
    * — the likelihood-scored sibling of [[bpeTrainMerges]]): each round
    * merges the adjacent pair maximizing `count(pair)/(count(l)·count(r))`
    * — the pair whose union most increases corpus likelihood under a
    * unigram model — where BPE takes the raw pair count. Scores compare
    * as the EXACT integer quotient `⌊c·10¹² / (uc_l·uc_r)⌋`
    * (DECIMAL(38,0) products, `div` integral floor; quantization ties
    * break lexicographically on (l, r)), so the per-round argmax is
    * cross-engine deterministic — no float division anywhere.
    *
    * Cost shape is [[bpeTrainMerges]]'s: the corpus is read once into the
    * frequency-weighted distinct-word state; each round adds ONE extra
    * vocabulary-sized aggregate (current unit counts) joined onto the
    * pair table. The learned merge list composes with the whole BPE
    * inference surface ([[mergePairFold]], [[bpeSegmentedTokenCountDict]],
    * [[bpeEncodeWith]], [[bpeUnkRate]]) unchanged — ranking is the only
    * thing that differs between the two schemes' merge artifacts.
    * Returns (merge_rank, lhs, rhs, merged, pair_count, score_q). */
  def wordPieceTrainMerges(
      docs: DataFrame,
      textCol: String,
      numMerges: Int): DataFrame = {
    require(numMerges >= 1, s"wordPieceTrainMerges: need numMerges >= 1, got $numMerges")
    val sp = docs.sparkSession
    import sp.implicits._
    var state = docs
      .select(explode(bpeTokens(col(textCol))).alias("word"))
      .groupBy(col("word")).agg(count(lit(1)).alias("cnt"))
      .withColumn("toks", split(col("word"), ""))
      .localCheckpoint(false)
    val merges = Seq.newBuilder[(Long, String, String, String, Long, Long)]
    var k = 0
    var exhausted = false
    while (k < numMerges && !exhausted) {
      val units = state.select(col("cnt"), explode(col("toks")).alias("t"))
        .groupBy(col("t")).agg(sum(col("cnt")).alias("uc"))
      val best = state
        .select(col("cnt"), explode(adjacentPairs(col("toks"))).alias("p"))
        .groupBy(col("p.l").alias("l"), col("p.r").alias("r"))
        .agg(sum(col("cnt")).alias("c"))
        .join(units.select(col("t").alias("l"), col("uc").alias("ucl")), Seq("l"))
        .join(units.select(col("t").alias("r"), col("uc").alias("ucr")), Seq("r"))
        .withColumn("sq", expr(
          "CAST((CAST(c AS DECIMAL(38,0)) * 1000000000000) div " +
            "(CAST(ucl AS DECIMAL(38,0)) * CAST(ucr AS DECIMAL(38,0))) AS BIGINT)"))
        .orderBy(col("sq").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val r0 = best.head
        val (l, r) = (r0.getAs[String]("l"), r0.getAs[String]("r"))
        merges += (((k + 1).toLong, l, r, l + r,
          r0.getAs[Long]("c"), r0.getAs[Long]("sq")))
        state = state
          .withColumn("toks", mergePairFold(col("toks"), lit(l), lit(r)))
          .localCheckpoint(false)
        k += 1
      }
    }
    merges.result()
      .toDF("merge_rank", "lhs", "rhs", "merged", "pair_count", "score_q")
  }

  /** Greedy longest-match-first segmentation of each input word under the
    * broadcast vocabulary map: ONE narrow `aggregate` fold per word over
    * its ≤ len positions — at each position the longest vocab piece
    * prefixing the remainder (continuation candidates `##`-prefixed) is
    * taken; no match aborts the word to [UNK] (WordPiece semantics: the
    * WHOLE word becomes id 0, partial segmentations are never emitted).
    * Preserves the input's columns and appends `__ids` (the id array, or
    * `[0]` for UNK) and `__ok`. No shuffle: the vocabulary rides in as one
    * broadcast map, the fold is per-row. */
  private def wordPieceWordIds(
      words: DataFrame,
      vocab: DataFrame,
      maxPieceLen: Int): DataFrame = {
    val len = length(col("word")).cast("int")
    def cand(pos: Column, l: Column): Column =
      concat(when(pos > 1, lit("##")).otherwise(lit("")),
        col("word").substr(pos, l))
    val init = struct(lit(1).cast("int").alias("p"),
      array().cast("array<long>").alias("ids"), lit(true).alias("ok"))
    val folded = aggregate(
      sequence(lit(1), len),
      init,
      (acc, _) => {
        val pos = acc.getField("p")
        val bestL = array_max(filter(
          sequence(lit(1), least(lit(maxPieceLen), len - pos + 1)),
          l => element_at(col("__vmap"), cand(pos, l)).isNotNull))
        when(!acc.getField("ok") || pos > len, acc)
          .otherwise(when(bestL.isNull,
            struct(pos.alias("p"), acc.getField("ids").alias("ids"),
              lit(false).alias("ok")))
          .otherwise(struct(
            (pos + bestL).cast("int").alias("p"),
            concat(acc.getField("ids"),
              array(element_at(col("__vmap"), cand(pos, bestL)))).alias("ids"),
            lit(true).alias("ok"))))
      })
    val inCols = words.columns.toSeq
    words.crossJoin(broadcast(vocabMap(vocab)))
      .withColumn("__seg", folded)
      .select(inCols.map(col) ++ Seq(
        when(col("__seg").getField("ok"), col("__seg").getField("ids"))
          .otherwise(array(lit(0L))).alias("__ids"),
        col("__seg").getField("ok").alias("__ok")): _*)
  }

  /** Greedy WordPiece inference against a SHIPPED vocabulary (the
    * [[bpeEncodeWith]]/[[unigramEncodeWith]] contract for the third
    * scheme): each DISTINCT word of the batch is segmented once
    * (batch-vocabulary-sized fold work), then the per-word id lists
    * broadcast onto the instance stream and reassemble per document in
    * pre-token order. Unsegmentable words encode as `[0]` ([UNK]).
    * Returns (idCol, token_ids); documents with no pre-tokens drop,
    * matching the other encoders. */
  def wordPieceEncodeWith(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      vocab: DataFrame,
      maxPieceLen: Int = 6): DataFrame = {
    val words = docs
      .select(explode(bpeTokens(col(textCol))).alias("word")).distinct()
    encodeInstances(docs, idCol, textCol,
      wordPieceWordIds(words, vocab, maxPieceLen)
        .select(col("word"), col("__ids")))
  }

  /** Train-and-encode in one call: [[wordPieceVocab]] then
    * [[wordPieceEncodeWith]]. */
  def wordPieceEncode(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxPieceLen: Int = 6,
      topK: Int = 256): DataFrame =
    wordPieceEncodeWith(docs, idCol, textCol,
      wordPieceVocab(docs, textCol, maxPieceLen, topK), maxPieceLen)

  /** Per-document token counts under greedy WordPiece — the
    * [[bpeSegmentedTokenCountDict]]/[[unigramSegmentCounts]] contract for
    * the third scheme: each DISTINCT word's piece count computed once,
    * broadcast onto the instance stream, re-aggregated per document.
    * UNK words count 1 (the single [UNK] id the encoder emits). */
  def wordPieceSegmentCounts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxPieceLen: Int = 6,
      topK: Int = 256): DataFrame = {
    val vocab = wordPieceVocab(docs, textCol, maxPieceLen, topK)
    val words = docs
      .select(explode(bpeTokens(col(textCol))).alias("word")).distinct()
    val dict = wordPieceWordIds(words, vocab, maxPieceLen)
      .select(col("word"), size(col("__ids")).cast("long").alias("__len"))
    docs.select(col(idCol), explode(bpeTokens(col(textCol))).alias("word"))
      .join(broadcast(dict), Seq("word"))
      .groupBy(col(idCol)).agg(sum(col("__len")).alias("n_tokens"))
      .filter(col("n_tokens") > 0L)
      .orderBy(idCol)
  }

  /** (total word instances, [UNK] word instances) of a batch under a
    * shipped WordPiece vocabulary — one row, exact BIGINTs, the
    * oracle-checkable form behind [[wordPieceUnkRate]]. */
  def wordPieceUnkCounts(
      docs: DataFrame,
      textCol: String,
      vocab: DataFrame,
      maxPieceLen: Int = 6): DataFrame =
    wordPieceWordIds(unigramWordTable(docs, textCol), vocab, maxPieceLen)
      .agg(coalesce(sum(col("cnt")), lit(0L)).alias("n_instances"),
        coalesce(sum(when(col("__ok"), lit(0L)).otherwise(col("cnt"))), lit(0L))
          .alias("n_unk"))

  /** Instance-weighted share of the batch's words a shipped WordPiece
    * vocabulary cannot segment — the staleness signal [[bpeUnkRate]] and
    * [[unigramUnkRate]] provide for their schemes, for the same
    * monitoring loop. */
  def wordPieceUnkRate(
      docs: DataFrame,
      textCol: String,
      vocab: DataFrame,
      maxPieceLen: Int = 6): Double = {
    val row = wordPieceUnkCounts(docs, textCol, vocab, maxPieceLen).head()
    if (row.isNullAt(0) || row.getLong(0) == 0L) 0.0
    else row.getLong(1).toDouble / row.getLong(0).toDouble
  }

  /** Interpolated Kneser–Ney bigram probabilities (Kneser & Ney, ICASSP
    * 1995; Chen & Goodman, TR-10-98) with the standard discount d = 0.75 —
    * the n-gram-LM smoothing used for perplexity-style data filtering —
    * computed in EXACT integer arithmetic so the result hash-matches any
    * engine.
    *
    * With d = 3/4, every term is rational over the corpus counts:
    *
    * {{{
    *   P_KN(w2|w1) = max(c12 − 3/4, 0)/c1  +  (3/4)·N1+(w1,·)/c1 · N1+(·,w2)/N1+(·,·)
    *               = [ max(4·c12 − 3, 0)·Np  +  3·N1w1·N1w2 ] / (4·c1·Np)
    * }}}
    *
    * where `c12` is the bigram instance count, `c1 = Σ_w c(w1,w)` the
    * context instance count, `N1w1 = N1+(w1,·)` the distinct continuations
    * of w1, `N1w2 = N1+(·,w2)` the distinct histories of w2, and
    * `Np = N1+(·,·)` the number of distinct bigram types. The emitted
    * probability is the exact floor `p_micro = ⌊10^6·num/den⌋`, with the
    * products widened to DECIMAL(38,0) so no count magnitude can overflow
    * (the DuckDB oracle widens to HUGEINT — both floor non-negative
    * quotients, so they agree bit-for-bit).
    *
    * Scale shape: identical to [[pmiPairs]] — instances reduce to the
    * pair-count table map-side via the per-row `word_pair_counts` fold
    * (one partial-aggregated shuffle), all four statistics (c1, N1w1,
    * N1w2, Np) are aggregates OVER THE PAIR TABLE whose per-key row count
    * is bounded by distinct-neighbor counts (never the Zipf-skewed
    * instance stream), and Np is a one-row broadcast. */
  def kneserNey(docs: DataFrame, textCol: String): DataFrame = {
    val pairs = Pin(docs.select(
        explode(graft.functions.SketchArrayExpressions.wordPairCounts(
          tokens(col(textCol)))).alias("bg"))
      .groupBy(col("bg.w1").alias("w1"), col("bg.w2").alias("w2"))
      .agg(sum(col("bg.tf")).alias("c12")))
    val ctx = pairs.groupBy(col("w1")).agg(
      sum(col("c12")).alias("c1"),
      count(lit(1)).alias("n1p_w1"))
    val hist = pairs.groupBy(col("w2")).agg(count(lit(1)).alias("n1p_w2"))
    val np = pairs.agg(count(lit(1)).alias("__np"))
    val dec = "DECIMAL(38,0)"
    pairs
      .join(ctx, Seq("w1")).join(hist, Seq("w2"))
      .crossJoin(broadcast(np))
      .select(col("w1"), col("w2"), col("c12"), col("c1"),
        col("n1p_w1"), col("n1p_w2"),
        ((greatest(col("c12") * 4L - 3L, lit(0L)).cast(dec) *
            col("__np").cast(dec) +
          lit(3L).cast(dec) * col("n1p_w1").cast(dec) * col("n1p_w2").cast(dec))
          * lit(1000000L).cast(dec)).alias("__num"),
        (lit(4L).cast(dec) * col("c1").cast(dec) * col("__np").cast(dec))
          .alias("__den"))
      // `div` (IntegralDivide) floors the exact decimal quotient — no
      // intermediate rounding, unlike floor(a / b) whose decimal division
      // result is scale-capped and rounded first.
      .selectExpr("w1", "w2", "c12", "c1", "n1p_w1", "n1p_w2",
        "CAST(__num div __den AS BIGINT) AS p_micro")
      .orderBy("w1", "w2")
  }

  /** CCNet-style perplexity bucketing (Wenzek et al., arXiv:1911.00359
    * §4.3): score every document by its cost under a Kneser–Ney bigram LM
    * ([[kneserNey]], trained on `reference` — defaulting to the corpus
    * itself) and split the corpus into equal-mass head / middle / tail
    * buckets, the crawl-filtering recipe that keeps `head` (lowest
    * perplexity ≈ most reference-like) for training.
    *
    * Exactness: true perplexity needs floating logs, which no two engines
    * reproduce bit-for-bit. The score here is the INTEGER-QUANTIZED cost
    * `Σ_instances (20 − ⌊log₂ p_micro⌋)` — `p_micro ∈ [1, 10⁶]` is
    * [[kneserNey]]'s exact integer probability, and `⌊log₂ n⌋` of an
    * integer is exact in ANY IEEE implementation (an integer's log₂ is
    * never within 10⁻⁶ of a wrong integer boundary for n ≤ 10⁶, while
    * double error is ~10⁻¹⁶), so the whole score is reproducible
    * bit-for-bit. Each bigram instance costs its probability's
    * bits-rounded-up-ish (1 cost unit ≈ 1 bit), `cost_milli` is the exact
    * per-bigram normalization `⌊1000·Σcost / n_bigrams⌋`, and unscoreable
    * docs (< 2 tokens, or p_micro = 0 under an external reference) take
    * the worst cost 20 per bigram / 20000 milli.
    *
    * Bucketing is by VALUE thresholds, not global rank: the cost_milli
    * domain is bounded ([0, 20000]), so the distribution is a ≤ 20001-row
    * aggregate; the two cutoffs (smallest values covering ⅓ and ⅔ of the
    * corpus) are a driver-side decision the size of a codebook — no
    * data-wide sort or window anywhere, the 100 TB shape. Ties at a
    * cutoff share its bucket (value tertiles), which keeps the result
    * deterministic without a total order.
    *
    * Scale shape: one [[kneserNey]] pass over the reference (pair-table
    * bounded), one map-side bigram fold per doc, one (w1,w2) equi-join
    * against the pair table, one groupBy(doc). */
  def perplexityBuckets(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      reference: Option[DataFrame] = None): DataFrame = {
    val kn = kneserNey(reference.getOrElse(docs), textCol)
      .select(col("w1"), col("w2"), col("p_micro"))
    val docPairs = docs.select(col(idCol),
        explode(graft.functions.SketchArrayExpressions.wordPairCounts(
          tokens(col(textCol)))).alias("bg"))
      .select(col(idCol), col("bg.w1").alias("w1"), col("bg.w2").alias("w2"),
        col("bg.tf").cast("long").alias("tf"))
    val scored = docPairs.join(kn, Seq("w1", "w2"), "left")
      .select(col(idCol), col("tf"),
        // 20 − ⌊log₂ p⌋ ∈ [1, 20] for p ∈ [1, 10⁶]; unseen/zero → 20
        (lit(20L) - floor(log2(greatest(
          coalesce(col("p_micro"), lit(1L)), lit(1L))))).alias("__cost"))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).alias("n_bigrams"),
        sum(col("tf") * col("__cost")).alias("__total"))
    val sc = docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).alias("n_bigrams"),
        when(col("n_bigrams").isNull, lit(20000L))
          .otherwise(expr("(__total * 1000) div n_bigrams"))
          .alias("cost_milli"))
    // bounded-domain distribution → two exact cutoff values; ≤ 20001 rows
    // is the same driver-side decision class as a probed-cell set
    val dist = sc.groupBy(col("cost_milli")).agg(count(lit(1)).alias("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val n = dist.map(_._2).sum
    var cum = 0L; var c1 = 20000L; var c2 = 20000L
    var seen1 = false; var seen2 = false
    dist.foreach { case (v, c) =>
      cum += c
      if (!seen1 && cum * 3 >= n) { c1 = v; seen1 = true }
      if (!seen2 && cum * 3 >= 2 * n) { c2 = v; seen2 = true }
    }
    sc.select(col(idCol), col("n_bigrams"), col("cost_milli"),
        when(col("cost_milli") <= c1, lit("head"))
          .when(col("cost_milli") <= c2, lit("middle"))
          .otherwise(lit("tail")).alias("bucket"))
      .orderBy(col(idCol))
  }

  /** Corpus datasheet: the one-row "data card" summary a training-data
    * release ships with (Gebru et al., "Datasheets for Datasets", CACM
    * 2021) — document/token volumes, source/language breadth, exact-dup
    * mass, and quality-gate pass count, every figure an exact BIGINT so
    * the card is reproducible on any engine.
    *
    * Scale shape: ONE aggregate pass over the corpus (all counts partial-
    * aggregate map-side; the distinct-text exact-dup figure rides the same
    * shuffle as a two-phase distinct). No joins, no windows. */
  def corpusDatasheet(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nTok = size(toks).cast("long")
    val nStop = size(filter(toks, w => w.isin(stopwords: _*))).cast("long")
    val nUniq = size(array_distinct(toks)).cast("long")
    docs.select(col("doc_id"), col("text"), col("lang"), col("source"),
        nTok.alias("__nt"), nStop.alias("__ns"), nUniq.alias("__nu"))
      .agg(
        count(lit(1)).alias("n_docs"),
        (count(lit(1)) - count_distinct(col("text"))).alias("n_exact_dup_docs"),
        sum(col("__nt")).alias("n_tokens"),
        max(col("__nt")).alias("max_doc_tokens"),
        count_distinct(col("lang")).alias("n_langs"),
        count_distinct(col("source")).alias("n_sources"),
        // the qualityFilter gate, counted: ≥20 tokens, stopword ratio
        // ≤ 0.25, distinct ratio ≥ 0.5 — spelled integer-exact
        sum(when(col("__nt") >= 20L &&
            col("__ns") * 4L <= col("__nt") &&
            col("__nu") * 2L >= col("__nt"), 1L).otherwise(0L))
          .alias("n_quality_pass"))
  }

  /** Gopher's "required stop words" set — a doc must contain at least two
    * DISTINCT members to pass the stop-word rule (Rae et al.,
    * arXiv:2112.11446 §A1.1). */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher quality-rule flags (Rae et al., arXiv:2112.11446 §A1.1): the
    * published rule battery for crawl-scale document filtering, one boolean
    * per rule plus the conjunction, computed per-row over one scan.
    *
    * Every threshold comparison is spelled in EXACT integer arithmetic —
    * `3 ≤ mean_word_len ≤ 10` as `3·n ≤ Σlen ≤ 10·n`, `symbol_ratio ≤ 0.1`
    * as `10·symbols ≤ n` — so there is no float division anywhere and any
    * engine reproduces the booleans bit-for-bit. The rules:
    *
    *  - `ok_word_count`:   minWords ≤ n_words ≤ maxWords (paper: 50..100k)
    *  - `ok_mean_len`:     3 ≤ mean word length ≤ 10 characters
    *  - `ok_symbol_ratio`: (# of '#' or '…' symbols) / n_words ≤ 0.1
    *  - `ok_alpha_words`:  ≥ 80 % of words contain ≥ 1 alphabetic char
    *  - `ok_stopwords`:    ≥ 2 distinct [[gopherStopwords]] present
    *  - `keep` = all of the above.
    *
    * The paper's line-level rules (bullet-start / ellipsis-end fractions)
    * live on the line table, not the doc table — compose with a
    * `split(text, '\n')` explode where corpora carry newlines; the fixture
    * corpus is single-line so they would be vacuous here.
    *
    * 100 TB shape: narrow projection, no shuffle, pipelines into the scan
    * with (doc_id, text) pruning; the filter composes with
    * [[qualityFilter]] and [[repetition]] in the same stage. */
  def gopherRules(
      docs: DataFrame,
      minWords: Long = 50L,
      maxWords: Long = 100000L): DataFrame = {
    val toks = tokens(col("text"))
    val nWords = size(toks).cast("long")
    // Σ word length — exact, for the integer-form mean bound.
    val sumLen = coalesce(
      aggregate(toks, lit(0L), (a, w) => a + length(w).cast("long")), lit(0L))
    // '#' and '…' occurrences over the whole text (symbols, not words).
    val nSym = (length(col("text")) -
      length(regexp_replace(col("text"), "[#…]", ""))).cast("long")
    val nAlpha = size(filter(toks, w => w.rlike("[A-Za-z]"))).cast("long")
    val nStop = size(array_intersect(array_distinct(toks),
      array(gopherStopwords.map(lit): _*))).cast("long")
    docs.select(
        col("doc_id"),
        nWords.alias("n_words"),
        sumLen.alias("sum_word_len"),
        nSym.alias("n_symbols"),
        nAlpha.alias("n_alpha_words"),
        nStop.alias("n_stopwords_distinct"),
        (nWords >= minWords && nWords <= maxWords).alias("ok_word_count"),
        (sumLen >= nWords * 3L && sumLen <= nWords * 10L).alias("ok_mean_len"),
        (nSym * 10L <= nWords).alias("ok_symbol_ratio"),
        (nAlpha * 5L >= nWords * 4L).alias("ok_alpha_words"),
        (nStop >= 2L).alias("ok_stopwords"))
      .withColumn("keep",
        col("ok_word_count") && col("ok_mean_len") && col("ok_symbol_ratio") &&
          col("ok_alpha_words") && col("ok_stopwords"))
      .orderBy("doc_id")
  }
}
