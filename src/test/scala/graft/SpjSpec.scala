package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.storage.GraftCatalog

/** Storage-partitioned joins on [[GraftCatalog]] tables: when both sides of
  * an equi-join are partitioned on the join key, the scans report
  * KeyGroupedPartitioning and Spark plans the join with NO shuffle exchange
  * on either side — the 100 TB co-located fact-fact join.
  */
class SpjSpec extends SparkSpec {

  import spark.implicits._

  private lazy val wh = {
    val dir = java.nio.file.Files.createTempDirectory("graft-spjwh").toString
    spark.conf.set("spark.sql.catalog.graftspj", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftspj.warehouse", dir)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftspj.db")

    (1 to 40).map(i => (i.toLong, i % 4, s"left_$i"))
      .toDF("id", "k", "lv")
      .writeTo("graftspj.db.facts_a").using("parquet")
      .partitionedBy(col("k")).createOrReplace()
    (1 to 60).map(i => (i.toLong, i % 4, i * 10.0))
      .toDF("rid", "k", "amount")
      .writeTo("graftspj.db.facts_b").using("parquet")
      .partitionedBy(col("k")).createOrReplace()
    // two partition values, many small files per value (8 write tasks):
    // the shape where key-grouping would cap a plain scan at 2 tasks
    (1 to 64).map(i => (i.toLong, i % 2, s"pad_$i" * 50))
      .toDF("id", "k", "payload").repartition(8)
      .writeTo("graftspj.db.wide_files").using("parquet")
      // keep the 8-files-per-value layout: the default hash write
      // distribution would consolidate each value to one file
      .tableProperty(graft.storage.GraftCatalog.WriteDistributionProp, "none")
      .partitionedBy(col("k")).createOrReplace()
    dir
  }

  private def withSpjConf[A](body: => A): A = {
    val saved = Seq(
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled",
      "spark.sql.graft.spj.preserveDataGrouping",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    // the SPJ-first setting: always key-group (the 100 TB fact-join intent)
    spark.conf.set("spark.sql.graft.spj.preserveDataGrouping", "true")
    // force what would otherwise be a shuffle join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("co-partitioned equi-join plans with zero shuffle") {
    wh
    withSpjConf {
      val j = spark.table("graftspj.db.facts_a")
        .join(spark.table("graftspj.db.facts_b"), "k")
        .groupBy("k").agg(count(lit(1)).alias("n"), sum("amount").alias("amt"))
      val rows = j.collect().map(r => (r.getInt(0), r.getLong(1))).toMap
      // 10 left x 15 right rows per key
      assert(rows == Map(0 -> 150L, 1 -> 150L, 2 -> 150L, 3 -> 150L))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected a storage-partitioned join with no shuffle, got:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join, got:\n$plan")
    }
  }

  test("partition-value mismatch still joins shuffle-free and correctly") {
    wh
    // facts_c is missing key 3 entirely — pushPartValues aligns the sides
    (1 to 30).filter(_ % 4 != 3).map(i => (i.toLong, i % 4, s"c_$i"))
      .toDF("cid", "k", "cv")
      .writeTo("graftspj.db.facts_c").using("parquet")
      .partitionedBy(col("k")).createOrReplace()
    withSpjConf {
      val j = spark.table("graftspj.db.facts_a")
        .join(spark.table("graftspj.db.facts_c"), Seq("k"), "inner")
      val n = j.count()
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected no shuffle, got:\n$plan")
      // correctness vs the un-bucketed plan
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val expected = spark.table("graftspj.db.facts_a")
        .join(spark.table("graftspj.db.facts_c"), Seq("k"), "inner").count()
      assert(n == expected)
    }
  }

  test("auto grouping declines when it would cap scan parallelism") {
    wh
    // key-grouping wide_files (2 values, ~8 files each) would cap the
    // whole scan at 2 tasks. `auto` must keep stock file splits.
    withSpjConf {
      spark.conf.set("spark.sql.graft.spj.preserveDataGrouping", "auto")
      val scan = spark.table("graftspj.db.wide_files")
      val nTasks = scan.rdd.getNumPartitions
      assert(nTasks > 2,
        s"auto grouping collapsed a 2-value table to $nTasks tasks")
      // forcing the grouping caps tasks at the partition-value count —
      // the trade-off the conf exists to control
      spark.conf.set("spark.sql.graft.spj.preserveDataGrouping", "true")
      val groupedTasks = spark.table("graftspj.db.wide_files").rdd.getNumPartitions
      assert(groupedTasks == 2, s"expected 2 key-grouped tasks, got $groupedTasks")
    }
  }

  test("preserveDataGrouping=false disables the key report entirely") {
    wh
    withSpjConf {
      spark.conf.set("spark.sql.graft.spj.preserveDataGrouping", "false")
      val j = spark.table("graftspj.db.facts_a")
        .join(spark.table("graftspj.db.facts_b"), "k")
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("Exchange hashpartitioning"),
        s"kill switch must restore the stock shuffle join:\n$plan")
    }
  }

  test("grouped scan repacks a key's files into multiple splits (skew-ready)") {
    wh
    // with the grouping forced on, the per-key splits underneath the
    // one-task-per-key grouping must still be stock-sized file partitions,
    // not one mega-split — that's what partially-clustered SPJ subdivides
    withSpjConf {
      val scan = spark.table("graftspj.db.wide_files")
      import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
      val batch = scan.queryExecution.executedPlan.collectFirst {
        case b: BatchScanExec => b }
      assert(batch.isDefined)
      val splits = batch.get.inputPartitions
      val byKey = splits.groupBy(
        _.asInstanceOf[org.apache.spark.sql.connector.read.HasPartitionKey]
          .partitionKey().toString)
      assert(byKey.size == 2)
      assert(byKey.values.exists(_.size > 1),
        "each key collapsed to a single mega-split; skewed keys would be unsplittable")
    }
  }

  test("partially-clustered SPJ subdivides a hot partition at runtime") {
    wh
    // skewed fact: key 0 holds ~10x the rows AND 10 files; keys 1/2 one
    // file each — the shape where one-task-per-key serializes the hot key
    (1 to 1000).map(i => (i.toLong, 0, s"hot_$i" * 30))
      .toDF("id", "k", "payload").repartition(10)
      .writeTo("graftspj.db.skew_fact").using("parquet")
      // keep the 10-file hot partition (see wide_files)
      .tableProperty(graft.storage.GraftCatalog.WriteDistributionProp, "none")
      .partitionedBy(col("k")).createOrReplace()
    (1 to 100).map(i => (i.toLong, i % 2 + 1, s"cold_$i"))
      .toDF("id", "k", "payload").coalesce(1)
      .writeTo("graftspj.db.skew_fact").append()
    (1 to 30).map(i => (i.toLong, i % 3, i * 1.0))
      .toDF("rid", "k", "amount")
      .writeTo("graftspj.db.skew_probe").using("parquet")
      .partitionedBy(col("k")).createOrReplace()
    withSpjConf {
      def join() = spark.table("graftspj.db.skew_fact")
        .join(spark.table("graftspj.db.skew_probe"), "k")
      // baseline: fully-clustered SPJ = ONE task per key — the hot key's
      // 10 splits all serialize into a single task
      val fully = join()
      assert(!fully.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
      val fullyTasks = fully.rdd.getNumPartitions
      assert(fullyTasks == 3, s"expected 3 one-per-key tasks, got $fullyTasks")
      // partially-clustered: Spark zips EACH of the hot key's splits with a
      // replica of the other side's key group — the hot partition fans out
      // across tasks at runtime, still with zero shuffle
      spark.conf.set(
        "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled", "true")
      val partial = join()
      val plan = partial.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"partially-clustered SPJ must stay shuffle-free:\n$plan")
      val partialTasks = partial.rdd.getNumPartitions
      assert(partialTasks >= 10,
        s"hot key not subdivided: $partialTasks tasks for 3 keys " +
          "(expected >= 10, one per hot-key split)")
      // and the answers agree with the stock shuffle plan
      val n = partial.count()
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      assert(n == join().count())
    }
  }

  test("bucketed tables: zero-shuffle join on a high-cardinality key") {
    wh
    // date partitioning can't co-locate a join on a high-cardinality id —
    // bucket(n, id) is the 100 TB layout for that: both tables hash the key
    // into n dirs at WRITE time, and the scans report bucket(n, id) so SPJ
    // zips bucket i with bucket i, no shuffle on either side.
    import org.apache.spark.sql.functions.bucket
    (1 to 400).map(i => (i.toLong, s"left_$i"))
      .toDF("id", "lv")
      .writeTo("graftspj.db.bucket_a").using("parquet")
      .partitionedBy(bucket(8, col("id"))).createOrReplace()
    (1 to 600).map(i => ((i % 200 + 1).toLong, i * 10.0))
      .toDF("id", "amount")
      .writeTo("graftspj.db.bucket_b").using("parquet")
      .partitionedBy(bucket(8, col("id"))).createOrReplace()
    withSpjConf {
      val j = spark.table("graftspj.db.bucket_a")
        .join(spark.table("graftspj.db.bucket_b"), "id")
      val n = j.count()
      val total = j.agg(sum("amount")).collect()(0).getDouble(0)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected a bucket-co-partitioned join with no shuffle, got:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      // correctness vs the un-bucketed plan
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "false")
      val ref = spark.table("graftspj.db.bucket_a")
        .join(spark.table("graftspj.db.bucket_b"), "id")
      assert(n == ref.count())
      assert(total == ref.agg(sum("amount")).collect()(0).getDouble(0))
    }
    // the bucket level is storage layout, not a column: SELECT * must show
    // exactly the declared schema
    assert(spark.table("graftspj.db.bucket_a").columns.toSeq == Seq("id", "lv"))
    // and the physical layout is __bucket_id=<n> dirs
    val dirs = new java.io.File(s"$wh/db/bucket_a").listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("__bucket_id=")), s"unexpected layout: $dirs")
  }

  test("a read that PRUNES the partition columns away declines key " +
    "grouping instead of projecting garbage partition values") {
    wh
    withSpjConf {
      // partitionValues rows match the READ partition schema — empty when
      // the query needs no partition column; the grouping projection over
      // the table's full partition schema then read out of bounds
      // (crashed with an Unsafe IllegalArgumentException before the fix)
      val narrow = spark.table("graftspj.db.wide_files")
        .filter(col("id") > 0).agg(count(lit(1))).head.getLong(0)
      assert(narrow == 64L)
      // with the partition column in the output, grouping still reports
      val keyed = spark.table("graftspj.db.wide_files")
        .groupBy("k").agg(count(lit(1)).as("c"))
        .orderBy("k").collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
      assert(keyed == Seq((0, 32L), (1, 32L)))
    }
  }

  test("single-table reads keep pushdown through the keyed scan") {
    wh
    val q = spark.table("graftspj.db.facts_b").filter(col("k") === 2).select("rid")
    val p = q.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // partition pruning happened (only k=2 files) and column pruning held
    assert(q.count() == 15)
    assert(p.contains("ReadSchema") && !p.toLowerCase.contains("lv"),
      s"column pruning lost:\n$p")
  }
}
