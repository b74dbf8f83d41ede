package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the round-5 maintenance operators at data volumes the
  * sf0.1 bench cannot exercise:
  *
  *  1. [[graft.ops.Relational.mergeUpsert]] — a 10 M-row snapshot under a
  *     2 M-row changelog (updates + deletes + inserts): the one-shuffle
  *     CDC apply, vs the join-per-op alternative (left anti for deletes,
  *     then full outer for upserts — two shuffled joins of snapshot
  *     cardinality);
  *  2. [[graft.ops.Relational.resampleFill]] — 10 M events over 100 k
  *     keys × 64 periods with ~40 % gaps: snap + last-per-period + grid +
  *     forward fill.
  *
  * Prints one JSON line; numbers recorded in SCALE.md.
  */
object MaintenanceBench {

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(10000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // snapshot: n rows keyed 0..n-1; changelog: every 5th key updated,
    // every 11th deleted, n/10 fresh inserts — all derived arithmetic
    def base = spark.range(n).select(col("id").alias("k"),
      (col("id") % 997).alias("v"))
    def changes = base.filter(col("k") % 5 === 0)
      .select(col("k"), (col("v") + 1).alias("v"), lit(1L).alias("seq"),
        lit("upsert").alias("op"))
      .unionByName(base.filter(col("k") % 11 === 0)
        .select(col("k"), col("v"), lit(2L).alias("seq"), lit("delete").alias("op")))
      .unionByName(spark.range(n, n + n / 10).select(col("id").alias("k"),
        lit(0L).alias("v"), lit(1L).alias("seq"), lit("upsert").alias("op")))

    def runMerge(): Long =
      ops.Relational.mergeUpsert(base, changes, "k", "seq", "op").count()

    // the max_by hash-aggregate spelling: same single exchange, no sort —
    // but the struct buffer forces ObjectHashAggregate, measured slower
    def runMergeMaxBy(): Long = {
      val baseSide = base.withColumn("__seq", lit(Long.MinValue))
        .withColumn("__op", lit("upsert"))
      val changeSide = changes.select(col("k"), col("v"),
        col("seq").alias("__seq"), col("op").alias("__op"))
      baseSide.unionByName(changeSide)
        .groupBy(col("k"))
        .agg(max_by(struct(col("v"), col("__op")), col("__seq")).alias("__w"))
        .filter(col("__w.__op") =!= "delete")
        .select(col("k"), col("__w.v").alias("v"))
        .count()
    }

    // the join-per-op alternative: anti join out the deletes, then
    // full-outer the upserts back in — two snapshot-sized shuffled joins
    def runJoinAlt(): Long = {
      val ups = changes.filter(col("op") === "upsert")
        .withColumn("__rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("k"))
            .orderBy(col("seq").desc)))
        .filter(col("__rn") === 1).select(col("k"), col("v"))
      val dels = changes.filter(col("op") === "delete"
          && col("seq") === 2L) // deletes not superseded (this workload's law)
        .select(col("k"))
      base.join(dels, Seq("k"), "left_anti")
        .join(ups.withColumnRenamed("v", "__nv"), Seq("k"), "full_outer")
        .select(col("k"), coalesce(col("__nv"), col("v")).alias("v"))
        .count()
    }

    // events: 10M rows, 100k keys, ~64 periods each, 40% of slots empty
    def events = spark.range(n).select(
      (col("id") % 100000).alias("k"),
      ((col("id") * 2654435761L) % 64000).alias("t"), // period = t div 1000
      col("id").alias("tie"),
      (col("id") % 1000).cast("double").alias("v"))

    def runResample(): Long =
      ops.Relational.resampleFill(events, "k", "t", "tie", "v", period = 1000L)
        .count()

    // interleaved rounds (A B C D, A B C D, ...) so JVM heap/GC drift over
    // the process lifetime biases every shape equally; per-shape median
    val shapes: Seq[(String, () => Long)] = Seq(
      ("merge", () => runMerge()), ("maxby", () => runMergeMaxBy()),
      ("joinalt", () => runJoinAlt()), ("resample", () => runResample()))
    shapes.foreach(_._2()) // warm-up round
    val rounds = (1 to 3).map(_ => shapes.map { case (n2, f) => n2 -> time(f()) })
    def median(name: String): Double =
      rounds.map(_.find(_._1 == name).get._2).sorted.apply(1)
    val merge = median("merge")
    val maxBy = median("maxby")
    val joinAlt = median("joinalt")
    val resample = median("resample")
    println(f"""{"metric":"maintenance","n":$n,"merge_upsert_s":$merge%.2f,"merge_maxby_s":$maxBy%.2f,"join_alt_s":$joinAlt%.2f,"resample_fill_s":$resample%.2f}""")
    spark.stop()
  }
}
