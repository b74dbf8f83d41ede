package graft.storage

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Internals of the snapshot-commit protocol: exclusive manifest creation
  * is the optimistic-concurrency seam — two commits that both based their
  * manifests on snapshot N race to create `_snap-N+1`, and the loser must
  * FAIL, not overwrite. (The end-to-end lifecycle runs in CatalogSpec;
  * this spec drives the seam directly because the race window lives inside
  * a single commit() call.)
  */
class CatalogCommitSpec extends AnyFunSuite {

  private def tmpDir() = {
    val d = java.nio.file.Files.createTempDirectory("graft-occ").toFile
    new Path(d.getAbsolutePath)
  }

  test("writeSnapshotAt refuses to overwrite an existing snapshot id") {
    val dir = tmpDir()
    val fs = dir.getFileSystem(new Configuration())
    // writer A (the winner) commits snapshot 1
    GraftCatalog.writeSnapshotAt(fs, dir, 1L, Seq("a.parquet"))
    // writer B also based its commit on snapshot 0 and tries snapshot 1
    val ex = intercept[java.io.IOException] {
      GraftCatalog.writeSnapshotAt(fs, dir, 1L, Seq("b.parquet"))
    }
    assert(ex.getMessage.contains("concurrent commit"))
    // the winner's manifest is byte-for-byte intact
    assert(GraftCatalog.readManifest(fs, dir, 1L).get == Seq("a.parquet"))
  }

  test("writeSnapshot sequences ids and round-trips txn headers") {
    val dir = tmpDir()
    val fs = dir.getFileSystem(new Configuration())
    assert(GraftCatalog.writeSnapshot(fs, dir, Seq("x")) == 1L)
    assert(GraftCatalog.writeSnapshot(fs, dir, Seq("x", "y"),
      Map("app-1" -> 7L, "app-2" -> 0L)) == 2L)
    assert(GraftCatalog.readManifest(fs, dir, 2L).get == Seq("x", "y"))
    assert(GraftCatalog.readTxns(fs, dir, 2L) == Map("app-1" -> 7L, "app-2" -> 0L))
    assert(GraftCatalog.readTxns(fs, dir, 1L) == Map.empty)
  }
}
