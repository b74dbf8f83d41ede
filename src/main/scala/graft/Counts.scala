package graft

/** Prints the query-surface counts the docs cite — generated, never
  * hand-maintained (three rounds of doc drift say why). `tools/sync_counts.sh`
  * combines this with the ScalaTest total and rewrites the numbers in
  * COVERAGE.md / README.md in place. */
object Counts {
  def main(args: Array[String]): Unit = {
    val q = SparkEntry.queries.size
    val o = SparkEntry.oracleSql.size
    println(s"[counts] queries=$q oracle_backed=$o rows_only=${q - o}")
  }
}
