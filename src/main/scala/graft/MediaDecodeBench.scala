package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.MediaExpressions.img_ahash
import graft.ops.Multimodal

/** Typed `mapPartitions` decode vs the codegen'd media-hash expression
  * (SCALE.md §media-decode; VERDICT r7 #7's measured migration attempt).
  *
  * Same kernel, two plan shapes over an n-row synthetic media table:
  *
  *  - `typed`: dataset of `MediaRow` → `mapPartitions` → tuple dataset —
  *    pays DeserializeToObject / SerializeFromObject around the stage
  *    (every payload copied into a case class and back);
  *  - `expr`: `img_ahash(bytes, w, h)` straight over the DataFrame — one
  *    compiled call per row inside WholeStageCodegen, the payload read
  *    from the unsafe row in place.
  *
  * Identical hashes asserted. usage: runMain graft.MediaDecodeBench [rows]
  */
object MediaDecodeBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 2000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Engine.tune(spark)
    import spark.implicits._

    // ~120-byte payloads, 64×(64..176) stub dims — the documents-table
    // media shape at bench scale
    val media = spark.range(n).select(
        col("id").as("media_id"),
        encode(concat(lit("payload-"), col("id"),
          lit("-abcdefghijklmnopqrstuvwxyz0123456789"),
          col("id") * 2654435761L), "UTF-8").as("bytes"),
        (lit(64) + (pmod(col("id"), lit(8)) * 16)).cast("int").as("width"),
        lit(64).as("height"))
      .localCheckpoint(false)

    def time(label: String)(fn: => Long): Long = {
      val t0 = System.nanoTime()
      val r = fn
      println(f"[mediadecode] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      r
    }

    def typedRun(): Long = {
      val ds = media.select(col("media_id"), lit("image").as("kind"), col("bytes"),
          struct(lit("png").as("format"), col("width"), col("height"),
            lit(0).as("sampleRate"), lit(1).as("nFrames")).as("meta"))
        .as[Multimodal.MediaRow]
      Multimodal.imageAhash(ds).agg(sum(col("ahash"))).collect()(0).getLong(0)
    }
    def exprRun(): Long =
      media.select(img_ahash(col("bytes"), col("width"), col("height")).as("ahash"))
        .agg(sum(col("ahash"))).collect()(0).getLong(0)

    // one unmeasured warm-up of each plan (JIT parity), then alternate
    typedRun(); exprRun()
    val t1 = time("typed mapPartitions")(typedRun())
    val e1 = time("codegen expression")(exprRun())
    val t2 = time("typed mapPartitions")(typedRun())
    val e2 = time("codegen expression")(exprRun())
    assert(t1 == e1 && t2 == e2 && t1 == t2, "hash sums diverged")
    // per-row equality, not just the checksum
    val mism = Multimodal.imageAhash(
        media.select(col("media_id"), lit("image").as("kind"), col("bytes"),
          struct(lit("png").as("format"), col("width"), col("height"),
            lit(0).as("sampleRate"), lit(1).as("nFrames")).as("meta"))
        .as[Multimodal.MediaRow]).withColumnRenamed("ahash", "a")
      .join(media.select(col("media_id"),
        img_ahash(col("bytes"), col("width"), col("height")).as("b")), "media_id")
      .filter(col("a") =!= col("b")).count()
    println(s"[mediadecode] mismatches: $mism")
    assert(mism == 0)
    spark.stop()
  }
}
