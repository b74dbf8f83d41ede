package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.Identifier

import graft.quality.Expectations
import graft.quality.Expectations.Expectation

/** Write–Audit–Publish on [[GraftCatalog]] branches — the lakehouse
  * quality gate the reference's Nessie + data-quality stack exists to
  * enable (audit a staged commit in isolation, publish only if it
  * passes):
  *
  *  1. WRITE: append the batch to an ephemeral branch — main's lineage is
  *     untouched, so downstream readers cannot observe unaudited data;
  *  2. AUDIT: evaluate an [[Expectations]] suite against the BRANCH view
  *     of the table (the merged state under audit, not just the delta);
  *  3. PUBLISH: fast-forward main to the branch head on pass; on fail the
  *     branch is dropped (or kept for debugging) and main never moves.
  *
  * The audit read and the publish are the same snapshot — the branch head
  * manifest — so what was audited is exactly what publishes (no re-read
  * race). At 100 TB this costs one extra manifest file over a direct
  * append; data files are written once and only ever re-pointed.
  */
object Wap {

  /** Outcome of one write–audit–publish cycle. */
  final case class WapResult(
      published: Boolean,
      /** Main snapshot after publish (unchanged main head on failure). */
      snapshot: Long,
      /** Per-expectation audit report (rule, column, violations, passed). */
      report: Seq[(String, String, Long, Boolean)])

  /** Run one WAP cycle appending `batch` to `table` (a catalog-qualified
    * name, e.g. `graftv2.bronze.events`). `keepFailedBranch` leaves the
    * quarantine branch in place for inspection instead of dropping it.
    * `txn` (appId, version) makes the cycle replay-idempotent: a replayed
    * batch whose watermark already reached main commits nothing on the
    * branch and publishes trivially (no duplicate data, no extra
    * snapshot). */
  def writeAuditPublish(
      spark: SparkSession,
      catalog: GraftCatalog,
      ident: Identifier,
      table: String,
      batch: DataFrame,
      expectations: Seq[Expectation],
      branch: String = "wap_audit",
      keepFailedBranch: Boolean = false,
      txn: Option[(String, Long)] = None): WapResult = {
    // the audit branch is ephemeral by contract: a crashed prior cycle may
    // have left one behind, and createBranch's exclusive create would then
    // fail every retry — drop any leftover first (its staged data was
    // never published, so discarding it is the correct recovery)
    catalog.dropBranch(ident, branch)
    catalog.createBranch(ident, branch)
    try {
      val w0 = batch.writeTo(table).option(GraftCatalog.BranchOption, branch)
      val w = txn.fold(w0) { case (app, v) =>
        w0.option(GraftCatalog.TxnAppIdOption, app)
          .option(GraftCatalog.TxnVersionOption, v.toString)
      }
      w.append()
      if (catalog.branchState(ident, branch).exists(_._2 == 0L)) {
        // replayed txn: the branch recorded no commit — nothing to audit
        // or publish
        catalog.dropBranch(ident, branch)
        WapResult(published = true,
          snapshot = catalog.currentSnapshot(ident), report = Seq.empty)
      } else {
        val audited = spark.sql(s"SELECT * FROM $table VERSION AS OF '$branch'")
        val report = Expectations.report(audited, expectations)
          .collect()
          .map(r => (r.getAs[String]("rule"), r.getAs[String]("column"),
            r.getAs[Long]("n_violations"), r.getAs[Boolean]("passed")))
          .toSeq
        if (report.forall(_._4)) {
          val snap = catalog.mergeBranch(ident, branch)
          catalog.dropBranch(ident, branch)
          WapResult(published = true, snapshot = snap, report = report)
        } else {
          if (!keepFailedBranch) catalog.dropBranch(ident, branch)
          WapResult(published = false,
            snapshot = catalog.currentSnapshot(ident),
            report = report)
        }
      }
    } catch {
      case e: Throwable =>
        if (!keepFailedBranch) catalog.dropBranch(ident, branch)
        throw e
    }
  }
}
