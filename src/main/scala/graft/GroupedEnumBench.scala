package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skewed-group measurement for the two-pass grouped enumeration
  * (SCALE.md §grouped-enumeration): a synthetic corpus where ONE language
  * holds 90 % of the rows — the shape that serializes a
  * `Window.partitionBy(lang)` running sum through a single task — packed
  * two ways:
  *
  *  - `serial`: the group-wide window (the pre-round-7 packSequences);
  *  - `two-pass`: [[graft.ops.TrainPrep.packSequences]] (range partition +
  *    per-(pid, group) slices + broadcast offsets).
  *
  * Both produce identical seq assignments (asserted); the report is the
  * wall-clock of each at increasing row counts.
  *
  * usage: runMain graft.GroupedEnumBench [rows=5000000]
  */
object GroupedEnumBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 5000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Engine.tune(spark)

    // 90 % of rows in "en", the rest across 9 small languages
    val docs = spark.range(n).select(
      col("id").alias("doc_id"),
      when(pmod(col("id"), lit(10)) < 9, lit("en"))
        .otherwise(concat(lit("l"), pmod(col("id"), lit(10)))).alias("lang"),
      (pmod(col("id"), lit(100)) + 10).alias("toks"))

    def serialPack() = {
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs.withColumn("n_tokens", col("toks"))
        .withColumn("__cum", sum(col("n_tokens")).over(w))
        .withColumn("seq_id",
          floor((col("__cum") - col("n_tokens")) / lit(512)).cast("long"))
        .drop("__cum")
    }
    def twoPass() =
      graft.ops.TrainPrep.packSequences(docs, "doc_id", "lang", col("toks"), 512)

    def time(label: String)(fn: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      // aggregate over seq_id so the enumeration cannot be pruned away (a
      // bare count() lets ColumnPruning delete the unused window entirely)
      fn.agg(sum(col("seq_id")), max(col("seq_id"))).collect()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[groupedenum] $label: $t%.2f s ($n rows, 90%% one group)")
      spark.catalog.clearCache(); t
    }
    // warm both plans once at 1/10 size for JIT parity, then measure
    val warm = docs.limit((n / 10).toInt)
    graft.ops.TrainPrep.packSequences(warm, "doc_id", "lang", col("toks"), 512).count()
    spark.catalog.clearCache()

    val s1 = time("serial (group-wide window)")(serialPack())
    val s2 = time("two-pass (grouped enumeration)")(twoPass())
    println(f"[groupedenum] speedup ${s1 / s2}%.2fx")
    // identical assignments — the two forms are the same function
    val mism = serialPack().select(col("doc_id"), col("seq_id").alias("a"))
      .join(twoPass().select(col("doc_id"), col("seq_id").alias("b")), "doc_id")
      .filter(col("a") =!= col("b")).count()
    println(s"[groupedenum] mismatches: $mism")
    assert(mism == 0)
    spark.stop()
  }
}
