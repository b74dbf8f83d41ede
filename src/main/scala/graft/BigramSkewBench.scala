package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarial Zipf benchmark for [[graft.ops.TrainPrep.bigramFamiliarity]]:
  * a deterministic Zipfian corpus (token rank drawn log-uniformly —
  * `rank = floor(exp(u·ln K))` for uniform `u` gives `P(rank=r) ∝ 1/r`,
  * the natural-language distribution, with no RNG) where the hottest token
  * heads ~7 % of all bigram contexts, against:
  *
  *  1. `naive_token_join` — the pre-hardening shape: per-instance rows
  *     shuffle-joined on raw tokens, the hot context in one task;
  *  2. `plain_shuffle` — the production default: per-doc (id,w1,w2)
  *     reduction, window-derived context counts, ONE plain count join
  *     (AQE skew-join subdivides hot probe partitions);
  *  3. `hot_cold_split` — the round-5 hot-key broadcast split
  *     (`hotCount = 4096`), retained for AQE-off deployments; measured
  *     SLOWER than the plain join since the single-join restructure.
  *
  * Prints one JSON line; numbers recorded in SCALE.md.
  */
object BigramSkewBench {

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** The round-4 shape, kept verbatim as the baseline under measure. */
  private def naive(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bigrams = docs
      .select(col(idCol), graft.ops.TextAnalysis.tokens(col(textCol)).alias("__toks"))
      .filter(size(col("__toks")) >= 2)
      .select(col(idCol),
        explode(transform(sequence(lit(1), size(col("__toks")) - 1),
          i => struct((col("__toks"))(i - 1).alias("w1"),
            (col("__toks"))(i).alias("w2")))).alias("bg"))
      .select(col(idCol), col("bg.w1").alias("w1"), col("bg.w2").alias("w2"))
    val bigramCounts = bigrams.groupBy(col("w1").alias("bc_w1"), col("w2").alias("bc_w2"))
      .agg(count(lit(1)).alias("c12"))
    val contextCounts = bigrams.groupBy(col("w1").alias("uc_w1"))
      .agg(count(lit(1)).alias("c1"))
    bigrams
      .join(bigramCounts, col("w1") === col("bc_w1") && col("w2") === col("bc_w2"))
      .join(contextCounts, col("w1") === col("uc_w1"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).alias("n_bigrams"),
        (sum(col("c12")).cast("double") / sum(col("c1")).cast("double"))
          .alias("familiarity"),
        (sum(when(col("c12") === 1, 1L).otherwise(0L)).cast("double") /
          count(lit(1))).alias("novelty_ratio"))
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(300000L)
    val docLen = 50
    val vocab = 30000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // doc i, position j → u = hash(i,j)/2^20 ∈ [0,1) → token rank
    // floor(exp(u ln K)): "t1" heads ln(2)/ln(K) ≈ 6.7 % of the corpus.
    def corpus: DataFrame = spark.range(nDocs).select(
      col("id").alias("doc_id"),
      array_join(
        transform(sequence(lit(0), lit(docLen - 1)), j =>
          concat(lit("t"), floor(exp(
            (pmod(xxhash64(col("id") * 64 + j), lit(1048576L)).cast("double")
              / 1048576.0) * math.log(vocab.toDouble))).cast("long").cast("string"))),
        " ").alias("text"))

    def force(df: DataFrame): Unit = { df.agg(sum(col("familiarity"))).collect(); () }
    def measure(label: String)(df: => DataFrame): (String, Double) = {
      force(df) // cold
      spark.catalog.clearCache()
      val warm = time(force(df))
      spark.catalog.clearCache()
      label -> warm
    }

    val results = Seq(
      measure("naive_token_join")(naive(corpus, "doc_id", "text")),
      // production default: reduction + plain join, AQE skew-join handles
      // hot probe partitions
      measure("plain_shuffle")(graft.ops.TrainPrep.bigramFamiliarity(
        corpus, "doc_id", "text")),
      // the round-5 hot/cold broadcast split, kept for AQE-off deployments
      measure("hot_cold_split")(graft.ops.TrainPrep.bigramFamiliarity(
        corpus, "doc_id", "text", hotCount = 4096L)))
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    println(f"""{"metric":"bigram_skew","docs":$nDocs,"doc_len":$docLen,"vocab":$vocab,"timings":$qs}""")
    spark.stop()
  }
}
