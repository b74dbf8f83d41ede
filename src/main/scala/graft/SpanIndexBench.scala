package graft

import org.apache.spark.sql.SparkSession

/** Measures the suffix-array span-excision AMORTIZATION claim
  * (SCALE.md §suffix-array): for a set of span lengths, compare
  *
  *   1. per-k fixed-window hash passes
  *      ([[graft.ops.Dedup.exciseDuplicateSpans]] — one full pass per k),
  *   2. per-k suffix-array runs
  *      ([[graft.ops.Dedup.exciseDuplicateSpansSA]] — rebuilds the index
  *      per k, the pre-round-13 API shape),
  *   3. ONE shared index serving every k
  *      ([[graft.ops.Dedup.exciseDuplicateSpansSAMany]] — the build-once
  *      /derive-many path).
  *
  * All three produce bit-identical frames (OpsSpec pins it); this bench
  * prices where each wins. Prints one JSON line; numbers recorded in
  * SCALE.md.
  *
  * usage: runMain graft.SpanIndexBench [ks=2,3,4,6,8]
  *        (corpus from SPARK_GRAFT_SF_DIR, default sf0.01)
  */
object SpanIndexBench {

  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime(); val a = f; ((System.nanoTime() - t0) / 1e9, a)
  }

  def main(args: Array[String]): Unit = {
    val ks = args.headOption.map(_.split(",").map(_.trim.toInt).toSeq)
      .getOrElse(Seq(2, 3, 4, 6, 8))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Engine.tune(spark)
    val docs = queries.Parity.t(spark, sfDir, "documents").cache()
    docs.count()

    def clear(): Unit = {
      spark.catalog.clearCache(); docs.cache(); docs.count(); ()
    }

    val (fixedSec, fixedRows) = time {
      ks.map(k => graft.ops.Dedup
        .exciseDuplicateSpans(docs, "doc_id", "text", k,
          tokenHash = graft.ops.Dedup.oracleHash).count()).sum
    }
    clear()
    val (perKSec, perKRows) = time {
      ks.map(k => graft.ops.Dedup
        .exciseDuplicateSpansSA(docs, "doc_id", "text", k).count()).sum
    }
    clear()
    val (manySec, manyRows) = time {
      graft.ops.Dedup.exciseDuplicateSpansSAMany(docs, "doc_id", "text", ks)
        .values.map(_.count()).sum
    }
    require(fixedRows == perKRows && perKRows == manyRows,
      s"row divergence: $fixedRows / $perKRows / $manyRows")
    println(f"""{"bench":"span_index","sf_dir":"$sfDir","ks":[${ks.mkString(",")}],"fixed_per_k_sec":$fixedSec%.3f,"sa_per_k_sec":$perKSec%.3f,"sa_shared_index_sec":$manySec%.3f,"rows":$manyRows}""")
    spark.stop()
  }
}
