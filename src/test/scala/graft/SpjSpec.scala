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
    dir
  }

  private def withSpjConf[A](body: => A): A = {
    val saved = Seq(
      "spark.sql.sources.v2.bucketing.enabled",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k))
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
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
