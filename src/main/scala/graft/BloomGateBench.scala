package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.BloomFunctions.bloom_agg

/** Scale evidence for the Bloom-gated incremental dedup (SCALE.md
  * §bloom-gate): a large already-deduped history vs a mostly-new daily
  * batch — the daily-ingest shape the gate exists for.
  *
  * Three spellings of the same exact result (equality asserted):
  *  - `plain`: [[graft.ops.Dedup.incremental]] — every batch key probes
  *    the history anti join;
  *  - `gated`: [[graft.ops.Dedup.incrementalBloom]] building the filter
  *    in-run (pays one history scan to fold the bitset, then joins only
  *    the possibly-seen fraction);
  *  - `gated+persisted`: the filter pre-built (what
  *    [[graft.streaming.Streams.sinkWithBloomMaintenance]] maintains
  *    across days) — the history table is never scanned for the
  *    definite-new majority; only the possibly-seen keys meet the
  *    history's distinct-key table.
  *
  * usage: runMain graft.BloomGateBench [histRows=20000000] [batchRows=2000000] [dupPct=5]
  */
object BloomGateBench {
  def main(args: Array[String]): Unit = {
    val histN = if (args.length > 0) args(0).toLong else 20000000L
    val batchN = if (args.length > 1) args(1).toLong else 2000000L
    val dupPct = if (args.length > 2) args(2).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Engine.tune(spark)

    // history keys 0..histN; batch: dupPct% resampled history keys, the
    // rest brand new (histN + i)
    val history = spark.range(histN).select(
        col("id").as("event_id"), col("id").as("user_id"),
        concat(lit("t"), pmod(col("id"), lit(7))).as("event_type"))
      .localCheckpoint(false)
    val batch = spark.range(batchN).select(
        (col("id") + histN).as("event_id"),
        when(pmod(col("id"), lit(100)) < dupPct,
          pmod(col("id") * 2654435761L, lit(histN)))
          .otherwise(col("id") + histN).as("user_id"),
        concat(lit("t"), pmod(col("id"), lit(7))).as("event_type"))
      .localCheckpoint(false)
    val keys = Seq("user_id", "event_type")
    val bits = 1 << 27 // 16 MiB — ~2.6% fp at 20 M keys, 5 probes
    val persisted = history
      .agg(bloom_agg(xxhash64(col("user_id"), col("event_type")), bits, 5)
        .alias("bloom"))
      .select(col("bloom"), lit(bits).alias("num_bits"),
        lit(5).alias("num_hashes"))
      .localCheckpoint(false)

    def time(label: String)(fn: => org.apache.spark.sql.DataFrame): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = fn.count()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[bloomgate] $label: $t%.2f s ($n survivors; hist=$histN, batch=$batchN, $dupPct%% dups)")
      (n, t)
    }

    def plain() = ops.Dedup.incremental(history, batch, keys, "event_id")
    def gated() = ops.Dedup.incrementalBloom(history, batch, keys, "event_id",
      numBits = bits)
    def gatedPersisted() = ops.Dedup.incrementalBloom(history, batch, keys,
      "event_id", numBits = bits, precomputed = Some(persisted))

    plain().count(); gatedPersisted().count() // JIT/caches warm-up
    val (n1, t1) = time("plain anti join")(plain())
    val (n2, t2) = time("bloom gate, filter built in-run")(gated())
    val (n3, t3) = time("bloom gate, persisted filter")(gatedPersisted())
    println(f"[bloomgate] speedup in-run ${t1 / t2}%.2fx, persisted ${t1 / t3}%.2fx")
    assert(n1 == n2 && n1 == n3, s"survivor counts diverged: $n1 $n2 $n3")
    val diff = plain().exceptAll(gatedPersisted()).count() +
      gatedPersisted().exceptAll(plain()).count()
    assert(diff == 0, s"gated result diverged from plain: $diff rows")
    println(s"[bloomgate] exact-equality check passed")
    spark.stop()
  }
}
