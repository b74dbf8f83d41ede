package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for [[graft.ops.Dedup.exciseDuplicateSpans]]'s rewrite
  * step on the shape the operator exists for at crawl scale: book-length
  * docs DENSE with duplicated spans (a tiny vocabulary makes nearly every
  * k-window corpus-duplicated, so the cut list approaches the doc
  * length). Compares the production two-pointer merge
  * ([[graft.functions.ExciseKeepIndices]], O(len + cuts) per doc) against
  * the `filter × exists` HOF spelling it replaced (O(len × cuts) —
  * quadratic per doc on this fixture).
  *
  * Prints one JSON line; numbers recorded in SCALE.md §excise.
  */
object ExciseBench {

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(64)
    val tokensPerDoc = args.lift(1).map(_.toInt).getOrElse(3000)
    val k = args.lift(2).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val rng = new scala.util.Random(7)
    val docs = (0 until nDocs).map { i =>
      (i.toLong, Seq.fill(tokensPerDoc)(vocab(rng.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text").localCheckpoint(false)

    def twoPointer() = graft.ops.Dedup
      .exciseDuplicateSpans(docs, "doc_id", "text", k)
      .agg(sum(col("n_removed"))).head()

    // the replaced HOF spelling, reproduced verbatim around the same span
    // aggregates, as the comparison baseline
    def hof() = {
      import graft.functions.SketchArrayExpressions.shingleWindows
      val toks = graft.ops.TextAnalysis.tokens(col("text"))
      val base = docs.select(col("doc_id").alias("__id"), toks.alias("__toks"))
        .withColumn("__hs",
          shingleWindows(transform(col("__toks"), t => graft.ops.Dedup.xxHash(t)), k))
      val occ = base.select(col("__id"), posexplode(col("__hs")))
        .withColumnRenamed("pos", "__pos").withColumnRenamed("col", "__sh")
      val dup = occ.groupBy(col("__sh"))
        .agg(count(lit(1)).alias("__n"),
          min(struct(col("__id"), col("__pos"))).alias("__keep"))
        .filter(col("__n") >= 2)
      val cuts = occ.join(dup, Seq("__sh"))
        .filter(!(col("__keep.__id") === col("__id") &&
          col("__keep.__pos") === col("__pos")))
        .groupBy(col("__id"))
        .agg(sort_array(collect_set(col("__pos"))).alias("__xs"))
      val joined = base.join(cuts, Seq("__id"), "left")
        .withColumn("__xs", coalesce(col("__xs"), array().cast("array<int>")))
      val idxs = when(size(col("__toks")) === 0, array().cast("array<int>"))
        .otherwise(sequence(lit(0), size(col("__toks")) - 1))
      val keptIdx = filter(idxs,
        i => !exists(col("__xs"), p => p <= i && i < p + lit(k)))
      joined.select((size(col("__toks")) - size(keptIdx)).cast("long").alias("n_removed"))
        .agg(sum(col("n_removed"))).head()
    }

    val r1 = twoPointer(); val r2 = hof()
    require(r1.getLong(0) == r2.getLong(0),
      s"spellings disagree: ${r1.getLong(0)} vs ${r2.getLong(0)}")
    twoPointer(); hof() // warm
    val tTwo = time(twoPointer())
    val tHof = time(hof())
    println(f"[excise] docs=$nDocs tokens/doc=$tokensPerDoc k=$k " +
      f"removed=${r1.getLong(0)}%,d two-pointer=$tTwo%.2f s hof=$tHof%.2f s " +
      f"(${tHof / tTwo}%.1fx)")
    println(s"""{"bench":"excise","docs":$nDocs,"tokens_per_doc":$tokensPerDoc,""" +
      s""""k":$k,"two_pointer_sec":$tTwo,"hof_sec":$tHof}""")
    spark.stop()
  }
}
