package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TrainPrep}

/** Scale probe for the incremental-day fold
  * ([[TrainPrep.incrementalFold]]) vs rebuilding the world
  * ([[TrainPrep.prepareCorpusNearDup]]) at a volume the sf0.1 bench
  * cannot exercise: a synthetic corpus with exact dups, within-triple
  * near-dups, and batch→history cross-links, where the daily batch is 5%
  * of the history. The fold consumes PRE-BUILT state (gated survivors,
  * signatures, labels, bloom row — what `sinkWithCorpusMaintenance`
  * maintains); the from-scratch run re-gates, re-shingles, and
  * re-converges everything. Both produce the day's manifest; equality is
  * the OpsSpec/oracle contract, this measures the cost gap. Prints one
  * JSON line; numbers recorded in SCALE.md.
  */
object CorpusFoldBench {

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(500000L)
    val batchN = n / 20
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // triples share a 25-token base (near-dups, jaccard well above 0.5);
    // pairs (2k, 2k+1) inside a triple share the salt too (exact dups);
    // batch bases alias the history's base space (cross-link pairs)
    // ids spelled in LETTERS — digit runs >= 4 would be PII-scrubbed to
    // <NUM> and collapse the corpus into one exact-dup class
    def alpha(c: org.apache.spark.sql.Column) =
      translate(c.cast("long").cast("string"), "0123456789", "abcdefghij")
    def synth(ids: DataFrame, baseOf: org.apache.spark.sql.Column): DataFrame =
      ids.select(col("id").alias("doc_id"),
        concat_ws(" ",
          array_join(transform(sequence(lit(0), lit(24)),
            j => concat(lit("w"), alpha(baseOf), lit("x"), alpha(j))), " "),
          concat(lit("s"), alpha(col("id") / 2))).alias("text"),
        when(pmod(col("id"), lit(5)) === 0, "fr").otherwise("en").alias("lang"))

    val history = synth(spark.range(n).toDF(), col("id") / 3)
      .localCheckpoint(false)
    val batch = synth(spark.range(n, n + batchN).toDF(),
      pmod(col("id") - n, lit(n / 3))).localCheckpoint(false)

    // UNTIMED: the stored state a production deployment already holds
    val dir = java.nio.file.Files.createTempDirectory("graft-foldbench").toString
    val gh = TrainPrep.gatedFront(history, "doc_id", "text", "lang")
    val keepH = gh.groupBy(col("__fp")).agg(min(col("doc_id")).alias("doc_id"))
      .select(col("doc_id"))
    val survH = gh.join(keepH, Seq("doc_id"))
    survH.write.mode("overwrite").parquet(s"$dir/gated")
    val storedGated = spark.read.parquet(s"$dir/gated")
    Dedup.minhashSignatures(storedGated.select(col("doc_id"), col("scrubbed")),
        "doc_id", "scrubbed", k = 3, numHashes = 32)
      .write.mode("overwrite").parquet(s"$dir/sigs")
    val storedSigs = spark.read.parquet(s"$dir/sigs")
    storedGated.select(col("doc_id").alias("id"))
      .join(Dedup.clustersFast(
        Dedup.minhashLshFromSigs(storedSigs).select("id_a", "id_b"),
        maxIter = 25), Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).alias("cluster_id"))
      .write.mode("overwrite").parquet(s"$dir/labels")
    storedGated.agg(graft.functions.BloomFunctions.bloom_agg(
        xxhash64(col("__fp"))).alias("bloom"))
      .write.mode("overwrite").parquet(s"$dir/bloom")

    def fold(): Long = TrainPrep.incrementalFold(
      spark.read.parquet(s"$dir/gated"),
      spark.read.parquet(s"$dir/sigs"),
      spark.read.parquet(s"$dir/labels"),
      Some(spark.read.parquet(s"$dir/bloom")),
      batch, "doc_id", "text", "lang").count()
    def scratch(): Long = TrainPrep.prepareCorpusNearDup(
      history.unionByName(batch), "doc_id", "text", "lang",
      priority = when(col("doc_id") >= n, lit(1L)).otherwise(lit(0L))).count()

    val foldRows = fold() // settle + row count
    val scratchRows = scratch()
    require(foldRows == scratchRows,
      s"fold ($foldRows) must equal from-scratch ($scratchRows)")
    val tF = (1 to 3).map(_ => time { fold() }).sorted.apply(1)
    val tS = (1 to 3).map(_ => time { scratch() }).sorted.apply(1)
    println(f"""{"metric":"corpus_fold","history":$n,"batch":$batchN,"manifest_rows":$foldRows,"fold_sec":$tF%.1f,"scratch_sec":$tS%.1f,"speedup":${tS / tF}%.1f}""")
    spark.stop()
  }
}
