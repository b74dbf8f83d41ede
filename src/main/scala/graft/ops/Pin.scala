package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Persist AND eagerly materialize a multi-consumer reduction.
  *
  * A lazy `persist()` alone does not serialize its consumers: when the
  * downstream plan fans out (a self-join's two shuffle stages, a broadcast
  * subplan racing the main stage), Spark submits the consumer stages
  * concurrently, each finds the cache unpopulated, and each recomputes EVERY
  * partition of the supposedly-shared reduction — duplicate work plus cache
  * write contention ("Block rdd_N already exists" warnings). Measured on
  * this repo's bench: `text_source_overlap` swung 1.7–10.1 s across
  * identical runs at sf0.1 (the round-5 warm>cold inversion) purely from
  * this race.
  *
  * The fix is the standard one: force the reduction once (a `count()` — full
  * materialization, no driver-side result beyond the long) before handing
  * the cached frame to its consumers. At cluster scale this matters more,
  * not less: the racing recompute would duplicate a 100 TB-input stage.
  *
  * The cost is an eager action at DataFrame-BUILD time, which is why this is
  * applied only inside operators whose reduction is always consumed (their
  * result is meaningless without it), never at API boundaries.
  */
private[graft] object Pin {
  def apply(df: DataFrame): DataFrame = {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    p.count()
    p
  }
}
