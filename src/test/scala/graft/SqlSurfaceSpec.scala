package graft

import graft.sources.Tables

/** The spark.sql front end over registered testdata views — the parity
  * stand-in for the reference's Trino-over-Iceberg interactive role.
  */
class SqlSurfaceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("SQL over registered views matches the DataFrame query results") {
    Tables.registerAll(spark, sf)
    val sqlRows = spark.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS row_count,
                count(DISTINCT l_orderkey) AS unique_orders
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""").collect()
    val dfRows = SparkEntry.queries("q_gold_agg")(spark, sf).collect()
    assert(sqlRows.map(_.toString).toSeq == dfRows.map(_.toString).toSeq)
  }

  test("native vector functions usable in SQL joins") {
    Tables.registerAll(spark, sf)
    val top = spark.sql(
      """SELECT a.vec_id, b.vec_id AS other, vec_cosine(a.embedding, b.embedding) AS c
         FROM embeddings a JOIN embeddings b ON a.vec_id = 0 AND b.vec_id = 1""").collect().head
    assert(!top.isNullAt(2) && math.abs(top.getDouble(2)) <= 1.0)
  }

  test("json path extraction via SQL mirrors the silver layer") {
    Tables.registerAll(spark, sf)
    val r = spark.sql(
      """SELECT get_json_object(props, '$.k') AS k,
                CAST(get_json_object(props, '$.missing') AS DOUBLE) AS absent
         FROM events LIMIT 1""").collect().head
    assert(r.getString(0) != null && r.isNullAt(1)) // null-tolerant extraction
  }
}
