package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the BPE family ([[graft.ops.TextAnalysis.bpeTrainMerges]]
  * and the two segmentation spellings): measures
  *
  *  1. training cost per merge round as the corpus grows while the
  *     VOCABULARY stays fixed — the design claim is that rounds are priced
  *     on the vocabulary (corpus scanned once for the word count), so
  *     per-round time should be flat-ish across corpus sizes;
  *  2. the fold-per-instance vs dictionary-join segmentation crossover as
  *     the merge count grows: the narrow fold pays |instances| × |merges|
  *     fold steps with zero shuffles; the dict spelling pays |vocab| ×
  *     |merges| plus one id-keyed re-aggregation.
  *
  * Prints JSON lines; numbers recorded in SCALE.md §BPE.
  */
object BpeBench {

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val repl = args.headOption.map(_.toInt).getOrElse(20)
    val merges = args.lift(1).map(_.toInt).getOrElse(24)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // corpus scaling: same documents replicated N× — the vocabulary (and
    // so the merge table) is IDENTICAL at every size; only the one corpus
    // scan and the instance-side work should grow
    val base = queries.Parity.t(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).filter(col("text").isNotNull)
    def corpus(n: Int) = {
      val u = (0 until n).map(i =>
          base.select((col("doc_id") + lit(i.toLong * 1000000L)).alias("doc_id"),
            col("text")))
        .reduce(_ union _)
      u.repartition(cpus.toInt).localCheckpoint(false)
    }

    for (n <- Seq(1, repl / 2, repl).distinct.filter(_ >= 1)) {
      val c = corpus(n)
      c.count()
      val t = time {
        graft.ops.TextAnalysis.bpeTrainMerges(c, "text", numMerges = 6).count()
      }
      println(s"""{"bench":"bpe_train","replicas":$n,"rows":${c.count()},""" +
        s""""merges":6,"sec":$t}""")
    }

    // segmentation crossover at growing merge counts on the full
    // `repl`-times-replicated corpus: |instances| is held fixed at its
    // largest value while |merges| sweeps — the variable the fold
    // spelling's cost is linear in
    val c1 = corpus(repl)
    c1.count()
    val learned = graft.ops.TextAnalysis
      .bpeTrainMerges(c1, "text", numMerges = merges)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    for (m <- Seq(6, merges / 2, merges).distinct.sorted if m >= 1) {
      val ms = learned.take(m)
      def fold() = graft.ops.TextAnalysis
        .bpeSegmentedTokenCount(c1, "doc_id", "text", ms)
        .agg(sum(col("n_tokens"))).head()
      def dict() = graft.ops.TextAnalysis
        .bpeSegmentedTokenCountDict(c1, "doc_id", "text", ms)
        .agg(sum(col("n_tokens"))).head()
      val rf = fold(); val rd = dict()
      require(rf.getLong(0) == rd.getLong(0),
        s"segment spellings disagree at m=$m: ${rf.getLong(0)} vs ${rd.getLong(0)}")
      fold(); dict() // warm
      val tf = time(fold()); val td = time(dict())
      println(s"""{"bench":"bpe_segment","replicas":$repl,"merges":$m,""" +
        s""""fold_sec":$tf,"dict_sec":$td}""")
    }
    spark.stop()
  }
}
