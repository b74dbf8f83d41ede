package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.storage.GraftCatalog

/** Scale probe for the partition-evolution cost claims:
  *
  *  1. EVOLUTION ITSELF is a metadata commit — O(1) in table size —
  *     versus the full rewrite a layout change costs without spec
  *     evolution. Measured: ALTER time on an n-row table vs rewriting
  *     the same table into the new layout.
  *  2. The MIXED-LAYOUT READ TAX: a full-scan aggregate and a
  *     partition-column filter over (a) a uniform single-layout table
  *     and (b) the same rows split 50/50 across a legacy flat layout
  *     and the evolved dir layout (one union scan, two delegate
  *     groups). The filter case shows the asymmetry honestly: the new
  *     layout prunes by directory, the legacy half pays a data-filter
  *     scan until a rewrite migrates it.
  *
  * Prints one JSON line; numbers recorded in SCALE.md §partition
  * evolution after a quiet-machine check (1-min load ≲ 2).
  */
object EvolutionBench {

  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime(); val a = f; ((System.nanoTime() - t0) / 1e9, a)
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(4000000L)
    val files = args.lift(1).map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wh = java.nio.file.Files.createTempDirectory("graft-evobench").toString
    spark.conf.set("spark.sql.catalog.evb", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.evb.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS evb.s")

    // 16 regions, payload-heavy rows so scan cost is visible
    def rows(a: Long, b: Long) = spark.range(a, b).select(
      col("id"),
      concat(lit("r"), col("id") % 16).alias("region"),
      (col("id") % 9973).alias("v"),
      concat(lit("payload-"), col("id"), lit("-x") ).alias("payload"))

    // warm each measurement: run twice, report the second (first run
    // pays JIT + footer-cache effects that would bias whichever table
    // measures first)
    def warm[A](f: => A): (Double, A) = { time(f); time(f) }

    // ── uniform baseline: both halves under region=... from birth, the
    // same two-append write shape the evolved table gets ────────────────
    rows(0, n / 2).repartition(files / 2)
      .writeTo("evb.s.uniform").using("parquet")
      .partitionedBy(col("region")).createOrReplace()
    rows(n / 2, n).repartition(files / 2)
      .writeTo("evb.s.uniform").append()
    spark.catalog.refreshTable("evb.s.uniform")
    val (tAggU, aggU) = warm(spark.table("evb.s.uniform")
      .agg(sum("v")).head.getLong(0))
    val (tFilU, filU) = warm(spark.table("evb.s.uniform")
      .filter(col("region") === "r3").agg(count(lit(1))).head.getLong(0))

    // ── evolved table: first half flat, evolve, second half dir-layout ──
    rows(0, n / 2).repartition(files / 2)
      .writeTo("evb.s.evolved").using("parquet").createOrReplace()
    val (tEvolve, _) = time(spark.sql(
      s"""ALTER TABLE evb.s.evolved SET TBLPROPERTIES
          ('${GraftCatalog.PartitionByProp}' = 'region')"""))
    rows(n / 2, n).repartition(files / 2).writeTo("evb.s.evolved").append()
    spark.catalog.refreshTable("evb.s.evolved")
    val (tAggE, aggE) = warm(spark.table("evb.s.evolved")
      .agg(sum("v")).head.getLong(0))
    val (tFilE, filE) = warm(spark.table("evb.s.evolved")
      .filter(col("region") === "r3").agg(count(lit(1))).head.getLong(0))

    // ── the alternative to evolution: rewrite everything into the new
    // layout (what a layout change costs WITHOUT spec evolution) ────────
    rows(0, n / 2).repartition(files / 2)
      .writeTo("evb.s.rewrite").using("parquet").createOrReplace()
    val (tRewrite, _) = time {
      spark.table("evb.s.rewrite").writeTo("evb.s.rewrite_new")
        .using("parquet").partitionedBy(col("region")).createOrReplace()
    }

    // ── closing the loop: TARGETED migration (rewrite only the legacy
    // tail) vs a FULL compact (rewrite everything) on two identically
    // evolved tables with a 1/8-flat + 7/8-dir split — the operational
    // shape (a small legacy tail after most data landed post-evolution);
    // the price of restoring DPO/pushdown/SPJ should be the legacy set,
    // not the table ─────────────────────────────────────────────────────
    def evolvedTable(name: String): Unit = {
      rows(0, n / 8).repartition(files / 8)
        .writeTo(s"evb.s.$name").using("parquet").createOrReplace()
      spark.sql(s"""ALTER TABLE evb.s.$name SET TBLPROPERTIES
          ('${GraftCatalog.PartitionByProp}' = 'region')""")
      rows(n / 8, n).repartition(files * 7 / 8).writeTo(s"evb.s.$name").append()
      spark.catalog.refreshTable(s"evb.s.$name")
    }
    evolvedTable("mig")
    val (tMigrate, migRep) = time {
      spark.sql("CALL evb.system.migrate_layout('s.mig', 4)").head
    }
    evolvedTable("cmp")
    val (tCompact, _) = time {
      spark.sql("CALL evb.system.compact('s.cmp', 4)").head
    }
    spark.catalog.refreshTable("evb.s.mig")
    val migSum = spark.table("evb.s.mig").agg(sum("v")).head.getLong(0)
    require(migSum == aggU, s"migrate_layout changed content: $migSum vs $aggU")

    require(aggU == aggE, s"uniform/evolved aggregate mismatch: $aggU vs $aggE")
    require(filU == filE, s"uniform/evolved filter mismatch: $filU vs $filE")
    println(
      s"""{"bench":"evolution","n":$n,"files":$files,""" +
      s""""evolve_s":${f"$tEvolve%.3f"},"rewrite_half_s":${f"$tRewrite%.3f"},""" +
      s""""migrate_legacy_s":${f"$tMigrate%.3f"},"full_compact_s":${f"$tCompact%.3f"},""" +
      s""""migrated_files":${migRep.getInt(0)},"kept_files":${migRep.getInt(1)},""" +
      s""""agg_uniform_s":${f"$tAggU%.3f"},"agg_evolved_s":${f"$tAggE%.3f"},""" +
      s""""filter_uniform_s":${f"$tFilU%.3f"},"filter_evolved_s":${f"$tFilE%.3f"}}""")
    spark.stop()
  }
}
