package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Oracle-checkable variants of the sketch-dedup family.
  *
  * The scale-path implementations ([[graft.ops.Dedup]]) hash with xxhash64,
  * which no other engine reproduces — the driver can only row-count them.
  * These variants derive every hash from the polynomial char fold
  * (`(acc*31 + ascii) mod 1e9+7`, same as `text_fingerprint`), so DuckDB
  * replicates the *entire* MinHash/SimHash/Jaccard computation bit-for-bit
  * and the driver hash-checks real signatures, not row counts.
  *
  * Trade-off, documented: the 30-bit hash space is fine at oracle scale
  * (≤5k docs) but would collide at corpus scale — production stays on the
  * xxhash64 path; the math (shingle windows, permutation minima, bit-sum
  * signs) is IDENTICAL, which is exactly what the oracle certifies.
  */
object DedupOracle {

  private val P = 1000000007L // char-fold modulus
  private val P2 = 2147483647L // permutation modulus (2^31-1)

  /** Polynomial hash of one token (identical to TextAnalysis.fingerprint's
    * fold, applied per word). */
  private def tokenHash(w: Column): Column =
    aggregate(
      filter(split(w, "", -1), c => c =!= lit("")),
      lit(7L),
      (acc, c) => (acc * lit(31L) + ascii(c)) % lit(P))

  /** Exploded (doc, pos, token-hash) rows; hashes computed once per doc
    * inside the explode argument (never inside a downstream lambda — the
    * HOF-recompute trap). */
  private def tokenHashRows(docs: DataFrame): DataFrame =
    docs.select(
        col("doc_id"),
        posexplode_outer(transform(
          filter(split(col("text"), " ", -1), c => c =!= lit("")),
          w => tokenHash(w))))
      .toDF("doc_id", "pos", "th")

  /** 3-gram shingle hash rows via lead() windows: sh = (th0*38 + th1*100 +
    * th2*162) mod P, null for incomplete windows. */
  private def shingleRows(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos").asc)
    tokenHashRows(docs).select(
      col("doc_id"),
      ((col("th") * lit(38L) + lead(col("th"), 1).over(w) * lit(100L) +
        lead(col("th"), 2).over(w) * lit(162L)) % lit(P)).alias("sh"))
  }

  /** 8-permutation MinHash signature per doc as columns m0..m7 (sentinel
    * P2 for docs with no complete shingle). */
  def minhashOracle(s: SparkSession, dir: String): DataFrame = {
    val docs = Parity.t(s, dir, "documents")
    val aggs = (0 until 8).map { i =>
      val a = 1103515245L * (i + 1) % P2
      val b = 12345L * (i * 2 + 1) % P2
      coalesce(min((col("sh") * lit(a) + lit(b)) % lit(P2)), lit(P2)).alias(s"m$i")
    }
    shingleRows(docs)
      .groupBy(col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("doc_id")
  }

  /** 16-bit SimHash per doc from token-hash bit-sign sums. */
  def simhashOracle(s: SparkSession, dir: String): DataFrame = {
    val docs = Parity.t(s, dir, "documents")
    val bitAggs = (0 until 16).map { b =>
      sum(when(col("th").isNull, 0)
        .when(shiftright(col("th"), b).bitwiseAND(lit(1L)) === lit(1L), 1)
        .otherwise(-1)).alias(s"s$b")
    }
    tokenHashRows(docs)
      .groupBy(col("doc_id"))
      .agg(bitAggs.head, bitAggs.tail: _*)
      .select(col("doc_id"),
        (0 until 16).map(b =>
          when(col(s"s$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L)))
          .reduce(_.bitwiseOR(_)).alias("simhash16"))
      .orderBy("doc_id")
  }

  /** Exact 3-gram Jaccard for the deterministic neighbor pairs
    * (doc_id, doc_id+d), d ∈ 1..4 — an equi-join on generated partner ids,
    * not an inequality join. */
  def jaccardNeighbors(s: SparkSession, dir: String): DataFrame = {
    val sets = shingleRows(Parity.t(s, dir, "documents"))
      .groupBy(col("doc_id"))
      .agg(collect_set(col("sh")).alias("shs"))
    val pairs = sets.select(
        col("doc_id").alias("id_a"), col("shs").alias("sh_a"),
        explode(sequence(lit(1), lit(4))).alias("d"))
      .withColumn("id_b", col("id_a") + col("d"))
    pairs
      .join(sets.select(col("doc_id").alias("id_b"), col("shs").alias("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double")).alias("jaccard"))
      .orderBy("id_a", "id_b")
  }
}
