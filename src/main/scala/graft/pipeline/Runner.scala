package graft.pipeline

import java.time.LocalDate

import org.apache.spark.sql.SparkSession

import graft.ingest.RecordFetcher
import graft.layers.{Bronze, Gold, Silver}
import graft.storage.Storage

/** Batch orchestrator replacing the reference's Airflow DAG chain
  * (reference: dags/01..03 with ExternalTaskSensor gating; SURVEY.md §1.1) —
  * bronze -> silver -> gold in dependency order for one run-date, each layer
  * written with dynamic partition overwrite so same-date re-runs are
  * idempotent.
  *
  * Returns per-layer row counts (the reference logs the same counts:
  * bronze:155, silver:76, gold:54).
  */
final class Runner(spark: SparkSession, storage: Storage, fetcher: RecordFetcher) {

  final case class RunReport(bronzeRows: Long, silverRows: Long, goldRows: Long, totalCount: Long)

  def run(runDate: LocalDate): RunReport = {
    graft.Engine.tune(spark)

    val bronze = Bronze.build(spark, fetcher.fetch(), runDate)
    storage.writePartitioned(bronze, "bronze")
    val bronzeRows = storage.read("bronze").count()

    val silver = Silver.transform(storage.read("bronze"), runDate)
    storage.writePartitioned(silver, "silver")
    val silverRows = storage.read("silver").count()

    val gold = Gold.aggregate(storage.read("silver"), runDate)
    storage.writePartitioned(gold, "gold")
    val goldRows = storage.read("gold").count()
    val total = Gold.total(storage.read("gold"))

    RunReport(bronzeRows, silverRows, goldRows, total)
  }
}
