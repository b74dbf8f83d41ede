package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarial skew-join benchmark: a zipfian fact (one key owns 50 % of
  * all rows, ten warm keys own another 25 %, the tail is uniform over 10k
  * keys) joined to a 10k-row dim with broadcast disabled — the situation
  * [[graft.ops.Relational.saltedJoin]] exists for.
  *
  * Three measurements (each run twice, warm time reported):
  *  1. plain sort-merge join, AQE skew-join OFF — the straggler baseline:
  *     one task owns the hot key's half of the fact table;
  *  2. plain join, AQE skew-join ON — Spark's runtime mitigation (only
  *     applies to sort-merge/shuffled-hash plans);
  *  3. [[graft.ops.Relational.saltedJoin]], AQE skew-join OFF — the manual
  *     fallback that also works where AQE can't re-plan.
  *
  * Prints one JSON line; numbers are recorded in SCALE.md.
  */
object SkewBench {

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val nKeys = 10000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // dim "too big"
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // deterministic zipf-ish key distribution, no RNG
    def fact: DataFrame = spark.range(n).select(
      when(col("id") % 2 === 0, lit(0L))
        .when(col("id") % 4 === 1, col("id") % 10 + 1)
        .otherwise(pmod(xxhash64(col("id")), lit(nKeys.toLong))).alias("k"),
      col("id").alias("fact_id"),
      (col("id") % 1000).alias("v"))
    def dim: DataFrame = spark.range(nKeys.toLong)
      .select(col("id").alias("k"), (col("id") * 7 % 100).alias("dimv"))

    def force(df: DataFrame): Unit = { df.agg(sum(col("v") * col("dimv"))).collect(); () }
    def skew(on: Boolean): Unit =
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", on.toString)

    def measure(label: String, skewOn: Boolean)(df: => DataFrame): (String, Double) = {
      skew(skewOn)
      force(df) // cold
      val warm = time(force(df))
      label -> warm
    }

    val results = Seq(
      measure("naive_skewjoin_off", skewOn = false)(fact.join(dim, Seq("k"))),
      measure("naive_aqe_skewjoin", skewOn = true)(fact.join(dim, Seq("k"))),
      measure("salted_32", skewOn = false)(
        graft.ops.Relational.saltedJoin(fact, dim, "k", "fact_id", nSalts = 32)))
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    println(f"""{"metric":"skew_join","rows":$n,"timings":$qs}""")
    spark.stop()
  }
}
