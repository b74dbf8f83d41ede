package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures what the champion-list cap buys `sparseCosinePairs` on a
  * Zipf-hot vocabulary: a corpus where every doc shares one stopword-class
  * token plus a few discriminative ones. Uncapped, the hot posting list is
  * the whole corpus and the self-join fans out |corpus|²/2 on that token;
  * capped, it is bounded by maxPostings²/2 — run both and print times +
  * candidate-pair counts. Results recorded in SCALE.md. */
object SparseSkewBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 5000
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Engine.tune(spark)
    import spark.implicits._
    // every doc: the universal "hot" token + 4 semi-shared + 2 rare
    val docs = (0 until n).map { i =>
      (i.toLong,
        s"hot s${i % 50} s${(i * 7) % 50} s${(i * 13) % 50} s${(i * 29) % 50} " +
          s"r${i} r${i + n}")
    }.toDF("doc_id", "text")
    docs.persist().count()
    def run(cap: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      val c = graft.ops.TextAnalysis
        .sparseCosinePairs(docs, "doc_id", "text", minDf = 2L,
          maxPostings = cap, topK = 30)
        .count()
      ((System.nanoTime() - t0) / 1e9, c)
    }
    run(100) // warm codegen/JIT on the capped shape first
    val (tCap, _) = run(100)
    val (tUncap, _) = run(Int.MaxValue)
    println(f"[sparse-skew] n=$n capped(100): $tCap%.2f s   " +
      f"uncapped: $tUncap%.2f s   ratio=${tUncap / tCap}%.1f x")
    spark.stop()
  }
}
