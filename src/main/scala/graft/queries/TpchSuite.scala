package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The remaining TPC-H query shapes (the suite's Q1/3/5/6/10/18 live in
  * [[Parity]] / [[graft.SparkEntry]]), adapted to the driver testdata's
  * schema: there is no `partsupp` table and no ship mode / commit /
  * receipt date columns, so Q2/9/11/16/20 derive the part↔supplier
  * relation from `lineitem` and Q4/12/21 define lateness as shipping long
  * after the order date. Every adaptation preserves the original query's
  * PLAN shape — correlated scalar subqueries, EXISTS/NOT-EXISTS pairs,
  * CASE-aggregation, HAVING subqueries, outer-join histograms — which is
  * what matters for engine coverage; only predicates moved to columns
  * that exist.
  *
  * Determinism (hash-match vs DuckDB): money sums go through
  * DECIMAL(18,2)/(18,4) and cast to DOUBLE at the end; ratios divide two
  * exact-sum doubles (IEEE division is bit-reproducible); counts cast to
  * BIGINT; every query ORDER BYs a unique key.
  *
  * Scale notes are per-query: dims broadcast, facts shuffle once on their
  * join key, semi/anti joins stay semi/anti (never materialize the right
  * side), scalar subqueries broadcast a 1-row plan instead of windowing
  * over a single partition.
  */
object TpchSuite {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Parity.t(s, dir, name)

  /** revenue item: l_extendedprice * (1 - l_discount), exact. */
  private def revItem: Column =
    col("l_extendedprice").cast("decimal(12,2)") *
      (lit(1).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)"))

  private def drev = sum(revItem).cast("double")

  /** Whole days from order date to ship date (both are midnight-aligned
    * timestamps; compared as DATE in both engines). */
  private def shipDelayDays: Column =
    datediff(col("l_shipdate").cast("date"), col("o_orderdate").cast("date"))

  private def ts(d: String): Column = lit(d).cast("timestamp")

  // ── Q4 (order priority checking): quarter of orders, EXISTS a line that
  //    shipped >30 days after the order date (lateness adaptation of
  //    commitdate<receiptdate). LEFT SEMI join — the lineitem side is
  //    never materialized into the output, one shuffle on orderkey.
  def q4(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= ts("1996-01-01") &&
        col("o_orderdate") < ts("1996-04-01"))
    val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
    o.join(l, col("o_orderkey") === col("l_orderkey") && shipDelayDays > 30,
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).alias("order_count"))
      .orderBy("o_orderpriority")
  }

  // ── Q12 (shipping buckets): CASE-aggregation over a derived ship-delay
  //    bucket (shipmode adaptation). Fact-fact join shuffles once; the
  //    two conditional counts are partial-aggregated map-side.
  def q12(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val l = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1997-01-01"))
    val highPrio = col("o_orderpriority") === "1-URGENT" ||
      col("o_orderpriority") === "2-HIGH"
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(
        when(shipDelayDays <= 30, "FAST")
          .when(shipDelayDays <= 90, "MEDIUM")
          .otherwise("SLOW").alias("ship_bucket"),
        highPrio.alias("hp"))
      .groupBy(col("ship_bucket"))
      .agg(
        sum(when(col("hp"), 1L).otherwise(0L)).alias("high_line_count"),
        sum(when(col("hp"), 0L).otherwise(1L)).alias("low_line_count"))
      .orderBy("ship_bucket")
  }

  // ── Q13 (customer order-count distribution): LEFT OUTER join with a
  //    join-side filter (the comment-filter adaptation), two cascaded
  //    aggregations. Customers with zero qualifying orders must appear —
  //    that is the point of the outer join.
  def q13(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select(col("c_custkey"))
    val o = t(s, dir, "orders")
      .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
      .select(col("o_custkey"), col("o_orderkey"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).alias("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).alias("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  // ── Q14 (promo revenue share): CASE-sum ratio over one month of
  //    shipments. Part dim broadcasts; numerator/denominator are two
  //    exact decimal sums divided as doubles (bit-reproducible).
  def q14(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-03-01") &&
        col("l_shipdate") < ts("1996-04-01"))
    l.join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) *
          coalesce(sum(when(col("p_type") === "PROMO", revItem)).cast("double"),
            lit(0.0)) /
          sum(revItem).cast("double")).alias("promo_revenue"))
  }

  // ── Q19 (discounted revenue, OR-of-ANDs): three brand/size/quantity
  //    conjunct groups OR'd together — the classic "does the optimizer
  //    push a disjunction of conjunctions into the join" shape. Part
  //    broadcasts; the common p_size bound pushes to the part scan.
  def q19(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
    val p = broadcast(t(s, dir, "part").filter(col("p_size") <= 15))
    val m1 = col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
      col("l_quantity").between(1, 11)
    val m2 = col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
      col("l_quantity").between(10, 20)
    val m3 = col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
      col("l_quantity").between(20, 30)
    l.join(p, col("l_partkey") === col("p_partkey") && (m1 || m2 || m3))
      .agg(drev.alias("revenue"))
  }

  // ── Q7 (volume shipping between two nations): supplier-nation ×
  //    customer-nation pair in either direction, revenue by ship year.
  //    Both nation dims and their filters broadcast; the lineitem-orders
  //    join is the only big shuffle.
  def q7(s: SparkSession, dir: String): DataFrame = {
    val n1 = broadcast(t(s, dir, "nation")
      .select(col("n_nationkey").alias("s_nkey"), col("n_name").alias("supp_nation")))
    val n2 = broadcast(t(s, dir, "nation")
      .select(col("n_nationkey").alias("c_nkey"), col("n_name").alias("cust_nation")))
    val pairOk = (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
      (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1")
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1998-01-01"))
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(n1, col("s_nationkey") === col("s_nkey"))
      .join(n2, col("c_nationkey") === col("c_nkey"))
      .filter(pairOk)
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").alias("l_year"))
      .agg(drev.alias("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  // ── Q8 (national market share): one nation's share of PROMO-part
  //    revenue into one region's customers, by order year. The share is a
  //    conditional-sum / total-sum division of two exact decimal sums
  //    cast to double — bit-reproducible. All dims broadcast.
  def q8(s: SparkSession, dir: String): DataFrame = {
    val america = broadcast(t(s, dir, "region").filter(col("r_name") === "AMERICA"))
    val custNation = broadcast(t(s, dir, "nation")
      .select(col("n_nationkey").alias("c_nkey"), col("n_regionkey").alias("c_rkey")))
    val suppNation = broadcast(t(s, dir, "nation")
      .select(col("n_nationkey").alias("s_nkey"), col("n_name").alias("supp_nation")))
    val promoParts = broadcast(t(s, dir, "part").filter(col("p_type") === "PROMO"))
    t(s, dir, "lineitem")
      .join(promoParts, col("l_partkey") === col("p_partkey"))
      .join(t(s, dir, "orders").filter(
          col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1998-01-01")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(custNation, col("c_nationkey") === col("c_nkey"))
      .join(america, col("c_rkey") === col("r_regionkey"))
      .join(suppNation, col("s_nationkey") === col("s_nkey"))
      .groupBy(year(col("o_orderdate")).cast("long").alias("o_year"))
      .agg(
        (coalesce(sum(when(col("supp_nation") === "NATION_3", revItem)).cast("double"),
          lit(0.0)) / drev).alias("mkt_share"))
      .orderBy("o_year")
  }

  // ── Q9 (product-type profit by nation and year): profit adapted to the
  //    schema as revenue minus a retail-price cost proxy (no
  //    ps_supplycost); the two terms are summed exactly (DECIMAL) and
  //    subtracted as doubles. The part-name LIKE filter prunes the
  //    broadcast part dim; facts shuffle once on orderkey.
  def q9(s: SparkSession, dir: String): DataFrame = {
    val parts = broadcast(t(s, dir, "part").filter(col("p_name").like("%red%")))
    val suppNation = broadcast(t(s, dir, "nation")
      .select(col("n_nationkey").alias("s_nkey"), col("n_name")))
    t(s, dir, "lineitem")
      .join(parts, col("l_partkey") === col("p_partkey"))
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(suppNation, col("s_nationkey") === col("s_nkey"))
      .groupBy(col("n_name").alias("nation"),
        year(col("o_orderdate")).cast("long").alias("o_year"))
      .agg(
        (drev -
          sum(col("p_retailprice").cast("decimal(12,2)") *
            col("l_quantity").cast("decimal(4,0)")).cast("double"))
          .alias("sum_profit"))
      .orderBy("nation", "o_year")
  }

  // ── Q2 (minimum-cost supplier): for each part in a size slice, the
  //    EUROPE supplier with the lowest account balance among suppliers
  //    that actually shipped it (lineitem bridge — no partsupp table).
  //    The correlated-min subquery becomes a grouped min re-joined on
  //    (part, min) — two shuffles on partkey, dims broadcast. min() of
  //    doubles is exact, so the equality re-join is deterministic.
  def q2(s: SparkSession, dir: String): DataFrame = {
    val bridge = t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val europe = broadcast(
      t(s, dir, "supplier")
        .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "region").filter(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name")))
    val p = broadcast(t(s, dir, "part").filter(col("p_size") === 15)
      .select(col("p_partkey"), col("p_name")))
    val cand = bridge
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(europe, col("l_suppkey") === col("s_suppkey"))
    val minBal = cand.groupBy(col("p_partkey").alias("mb_pkey"))
      .agg(min(col("s_acctbal")).alias("min_bal"))
    cand.join(minBal,
        col("p_partkey") === col("mb_pkey") && col("s_acctbal") === col("min_bal"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  // ── Q11 (important stock): per-part shipped value from one region's
  //    suppliers, kept where it exceeds a fraction of the total — the
  //    scalar-subquery HAVING. The total is a 1-row plan broadcast into
  //    the filter (never a global window). Sums stay DECIMAL until the
  //    final double compare.
  def q11(s: SparkSession, dir: String): DataFrame = {
    val asiaSupp = broadcast(
      t(s, dir, "supplier")
        .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "region").filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("s_suppkey")))
    val perPart = t(s, dir, "lineitem")
      .join(asiaSupp, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey").alias("p_partkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).alias("v"))
    val total = perPart.agg(sum(col("v")).alias("tot"))
    perPart.crossJoin(broadcast(total))
      .filter(col("v").cast("double") > col("tot").cast("double") * 0.0008)
      .select(col("p_partkey"), col("v").cast("double").alias("part_value"))
      .orderBy(col("part_value").desc, col("p_partkey"))
  }

  // ── Q15 (top supplier): quarterly revenue per supplier, keep the
  //    max-revenue row(s) via a broadcast 1-row max — the view + scalar
  //    subquery shape. Revenue doubles come from exact decimal sums, so
  //    the equality against max() is bit-safe.
  //    `rev` feeds both the scalar max and the outer probe; the supplier
  //    join pushes an isnotnull(l_suppkey) into the probe branch only,
  //    which would break canonical equality and force the aggregation to
  //    run twice. The isNotNull is therefore part of rev's own definition
  //    (l_suppkey is a non-null key, so values are unchanged) — both
  //    branches then share one exchange (PlanSpec pins ReusedExchange).
  def q15(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= ts("1996-01-01") &&
        col("l_shipdate") < ts("1996-04-01") && col("l_suppkey").isNotNull)
      .groupBy(col("l_suppkey"))
      .agg(drev.alias("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).alias("mr"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_revenue") === col("mr"))
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  // ── Q16 (supplier diversity by part attributes): distinct shippers per
  //    (brand, type, size) from the lineitem bridge, excluding
  //    negative-balance suppliers (the complaints-comment adaptation) via
  //    LEFT ANTI join. countDistinct shuffles once on the group keys with
  //    partial distinct map-side.
  def q16(s: SparkSession, dir: String): DataFrame = {
    val bridge = t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val p = broadcast(t(s, dir, "part")
      .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size")))
    val bad = broadcast(t(s, dir, "supplier")
      .filter(col("s_acctbal") < 0).select(col("s_suppkey")))
    bridge
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(bad, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).alias("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  // ── Q17 (small-quantity revenue): lines under 20% of their part's
  //    average quantity — the correlated-avg subquery as a grouped avg
  //    re-joined on partkey. The part dim filter broadcasts into BOTH the
  //    average computation and the outer scan, so only the sliced part's
  //    lines are ever aggregated. avg is computed identically in both
  //    engines: exact decimal sum cast double, divided by the bigint count.
  def q17(s: SparkSession, dir: String): DataFrame = {
    val p = broadcast(t(s, dir, "part")
      .filter(col("p_brand") === "Brand#3" && col("p_size") < 10)
      .select(col("p_partkey")))
    val lf = t(s, dir, "lineitem")
      .join(p, col("l_partkey") === col("p_partkey"))
    val avgQty = lf.groupBy(col("l_partkey").alias("aq_pkey"))
      .agg((sum(col("l_quantity").cast("decimal(12,2)")).cast("double") /
        count(lit(1))).alias("avg_qty"))
    lf.join(avgQty, col("l_partkey") === col("aq_pkey"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double") /
        lit(7.0)).alias("avg_yearly"))
  }

  // ── Q20 (potential part promotions): suppliers in one region that
  //    shipped a large cumulative quantity of some matching part — the
  //    nested-aggregate IN subquery (availqty adaptation). The inner
  //    (supplier, part) aggregate shuffles once; the qualifying-supplier
  //    set is tiny and broadcasts into a LEFT SEMI join.
  def q20(s: SparkSession, dir: String): DataFrame = {
    val redParts = broadcast(t(s, dir, "part")
      .filter(col("p_name").like("red%")).select(col("p_partkey")))
    val qualifying = t(s, dir, "lineitem")
      .join(redParts, col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("l_quantity").cast("decimal(12,2)")).alias("qty"))
      .filter(col("qty") > 80)
      .select(col("l_suppkey")).distinct()
    t(s, dir, "supplier")
      .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region").filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(qualifying), col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal"))
      .orderBy("s_name")
  }

  // ── Q21 (suppliers who kept orders waiting): late lines on completed
  //    multi-supplier orders where NO other supplier was late — the
  //    EXISTS / NOT-EXISTS pair, computed as ONE per-order aggregate
  //    (supplier count + late-supplier count) instead of two correlated
  //    rescans of lineitem; the l1 row join then selects orders with
  //    nsupp ≥ 2 and exactly one late supplier. Lateness = shipped >60
  //    days after the order date; o_orderstatus = 'F'.
  //    `lo` feeds two consumers — the per-order aggregate and the
  //    late-line probe. The probe's `late` filter pushes below the join,
  //    so the two subtrees don't canonicalize equal and ReuseExchange
  //    can't dedup them; without intervention the lineitem⋈orders join
  //    runs TWICE (a second full fact pass at 100 TB). `lo` is therefore
  //    persisted: three narrow columns (two ids + a boolean), so the
  //    cache is a fraction of one join's shuffle, and both consumers
  //    read it (PlanSpec pins the two InMemoryTableScans).
  def q21(s: SparkSession, dir: String): DataFrame = {
    val lo = t(s, dir, "lineitem")
      .join(t(s, dir, "orders").filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"), (shipDelayDays > 60).alias("late"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val perOrder = lo.groupBy(col("l_orderkey").alias("po_okey"))
      .agg(
        countDistinct(col("l_suppkey")).alias("nsupp"),
        countDistinct(when(col("late"), col("l_suppkey"))).alias("nlate"))
      .filter(col("nsupp") >= 2 && col("nlate") === 1)
    lo.filter(col("late"))
      .join(perOrder, col("l_orderkey") === col("po_okey"))
      .join(broadcast(
          t(s, dir, "supplier")
            .join(t(s, dir, "nation").filter(col("n_name") === "NATION_7"),
              col("s_nationkey") === col("n_nationkey"))
            .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).alias("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  // ── Q22 (global sales opportunity): customers above the global
  //    positive-balance average (broadcast scalar) with no recent orders
  //    (LEFT ANTI join), grouped by nation (the country-code adaptation).
  //    The average divides an exact decimal sum by the bigint count —
  //    identical bits in both engines.
  def q22(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val nations = Seq(1, 5, 9, 13, 17, 21)
    val avgBal = c.filter(col("c_acctbal") > 0.0)
      .agg((sum(col("c_acctbal").cast("decimal(12,2)")).cast("double") /
        count(lit(1))).alias("avg_bal"))
    val recent = t(s, dir, "orders")
      .filter(col("o_orderdate") >= ts("2000-01-01")).select(col("o_custkey"))
    c.filter(col("c_nationkey").isin(nations: _*))
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").cast("long").alias("cntrycode"))
      .agg(
        count(lit(1)).alias("numcust"),
        sum(col("c_acctbal").cast("decimal(12,2)")).cast("double").alias("totacctbal"))
      .orderBy("cntrycode")
  }

  /** Per-query (SparkSession, sfDir) => DataFrame, merged into
    * [[graft.SparkEntry.queries]]. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_tpch2" -> (q2 _),
    "q_tpch4" -> (q4 _),
    "q_tpch7" -> (q7 _),
    "q_tpch11" -> (q11 _),
    "q_tpch15" -> (q15 _),
    "q_tpch16" -> (q16 _),
    "q_tpch17" -> (q17 _),
    "q_tpch20" -> (q20 _),
    "q_tpch21" -> (q21 _),
    "q_tpch22" -> (q22 _),
    "q_tpch8" -> (q8 _),
    "q_tpch9" -> (q9 _),
    "q_tpch12" -> (q12 _),
    "q_tpch13" -> (q13 _),
    "q_tpch14" -> (q14 _),
    "q_tpch19" -> (q19 _),
  )

  /** DuckDB oracles — same arithmetic, same column names. */
  def oracleSql: Map[String, String] = Map(
    "q_tpch20" ->
      """SELECT s_name, s_acctbal
         FROM supplier
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'EUROPE'
           AND s_suppkey IN (
             SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
             WHERE p_name LIKE 'red%'
             GROUP BY l_suppkey, l_partkey
             HAVING sum(CAST(l_quantity AS DECIMAL(12,2))) > 80)
         ORDER BY s_name""",
    "q_tpch21" ->
      """WITH lo AS (
           SELECT l_orderkey, l_suppkey,
                  date_diff('day', CAST(o_orderdate AS DATE),
                            CAST(l_shipdate AS DATE)) > 60 AS late
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           WHERE o_orderstatus = 'F'),
         po AS (
           SELECT l_orderkey AS po_okey,
                  count(DISTINCT l_suppkey) AS nsupp,
                  count(DISTINCT CASE WHEN late THEN l_suppkey END) AS nlate
           FROM lo GROUP BY l_orderkey)
         SELECT s_name, count(*) AS numwait
         FROM lo
         JOIN po ON l_orderkey = po_okey AND nsupp >= 2 AND nlate = 1
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         WHERE late AND n_name = 'NATION_7'
         GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""",
    "q_tpch22" ->
      """WITH ab AS (
           SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
                    / count(*) AS avg_bal
           FROM customer WHERE c_acctbal > 0.0)
         SELECT CAST(c_nationkey AS BIGINT) AS cntrycode, count(*) AS numcust,
                CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
         FROM customer, ab
         WHERE c_nationkey IN (1, 5, 9, 13, 17, 21)
           AND c_acctbal > avg_bal
           AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                           AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
         GROUP BY c_nationkey ORDER BY cntrycode""",
    "q_tpch2" ->
      """WITH cand AS (
           SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
         eur AS (
           SELECT s_suppkey, s_name, s_acctbal, n_name
           FROM supplier
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'EUROPE'),
         j AS (
           SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
                  min(s_acctbal) OVER (PARTITION BY p_partkey) AS min_bal
           FROM cand
           JOIN part ON l_partkey = p_partkey AND p_size = 15
           JOIN eur ON l_suppkey = s_suppkey)
         SELECT s_acctbal, s_name, n_name, p_partkey, p_name
         FROM j WHERE s_acctbal = min_bal
         ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""",
    "q_tpch11" ->
      """WITH pv AS (
           SELECT l_partkey AS p_partkey,
                  sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS v
           FROM lineitem
           JOIN supplier ON l_suppkey = s_suppkey
           JOIN nation ON s_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'ASIA'
           GROUP BY l_partkey)
         SELECT p_partkey, CAST(v AS DOUBLE) AS part_value
         FROM pv, (SELECT sum(v) AS tot FROM pv)
         WHERE CAST(v AS DOUBLE) > CAST(tot AS DOUBLE) * 0.0008
         ORDER BY part_value DESC, p_partkey""",
    "q_tpch15" ->
      """WITH rev AS (
           SELECT l_suppkey,
                  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
                    AS DOUBLE) AS total_revenue
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name, total_revenue
         FROM supplier JOIN rev ON s_suppkey = l_suppkey
         WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
         ORDER BY s_suppkey""",
    "q_tpch16" ->
      """SELECT p_brand, p_type, p_size,
                count(DISTINCT l_suppkey) AS supplier_cnt
         FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
         JOIN part ON l_partkey = p_partkey
         WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
           AND p_size IN (1, 4, 9, 16, 25, 36, 49)
           AND l_suppkey NOT IN
             (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         GROUP BY p_brand, p_type, p_size
         ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
    "q_tpch17" ->
      """WITH lf AS (
           SELECT l_partkey, l_quantity, l_extendedprice
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE p_brand = 'Brand#3' AND p_size < 10),
         aq AS (
           SELECT l_partkey AS aq_pkey,
                  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                    / count(*) AS avg_qty
           FROM lf GROUP BY l_partkey)
         SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                  / 7.0 AS avg_yearly
         FROM lf JOIN aq ON l_partkey = aq_pkey
         WHERE l_quantity < 0.2 * avg_qty""",
    "q_tpch4" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders
         WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
           AND EXISTS (
             SELECT 1 FROM lineitem
             WHERE l_orderkey = o_orderkey
               AND date_diff('day', CAST(o_orderdate AS DATE),
                             CAST(l_shipdate AS DATE)) > 30)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_tpch7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                year(l_shipdate) AS l_year,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                  (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
                  AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation n1 ON s_nationkey = n1.n_nationkey
         JOIN nation n2 ON c_nationkey = n2.n_nationkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
           AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
             OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
         GROUP BY supp_nation, cust_nation, l_year
         ORDER BY supp_nation, cust_nation, l_year""",
    "q_tpch8" ->
      """SELECT year(o_orderdate) AS o_year,
                COALESCE(CAST(sum(CASE WHEN n1.n_name = 'NATION_3' THEN
                    CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                  END) AS DOUBLE), 0.0) /
                CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                  (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
                  AS DOUBLE) AS mkt_share
         FROM lineitem
         JOIN part ON l_partkey = p_partkey
         JOIN orders ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation n2 ON c_nationkey = n2.n_nationkey
         JOIN region ON n2.n_regionkey = r_regionkey
         JOIN nation n1 ON s_nationkey = n1.n_nationkey
         WHERE p_type = 'PROMO' AND r_name = 'AMERICA'
           AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY o_year ORDER BY o_year""",
    "q_tpch9" ->
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                  (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
                  AS DOUBLE) -
                CAST(sum(CAST(p_retailprice AS DECIMAL(12,2)) *
                  CAST(l_quantity AS DECIMAL(4,0))) AS DOUBLE) AS sum_profit
         FROM lineitem
         JOIN part ON l_partkey = p_partkey
         JOIN orders ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         WHERE p_name LIKE '%red%'
         GROUP BY n_name, o_year ORDER BY n_name, o_year""",
    "q_tpch12" ->
      """SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE),
                               CAST(l_shipdate AS DATE)) <= 30 THEN 'FAST'
                     WHEN date_diff('day', CAST(o_orderdate AS DATE),
                               CAST(l_shipdate AS DATE)) <= 90 THEN 'MEDIUM'
                     ELSE 'SLOW' END AS ship_bucket,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         GROUP BY ship_bucket ORDER BY ship_bucket""",
    "q_tpch13" ->
      """SELECT c_count, count(*) AS custdist FROM (
           SELECT c_custkey, count(o_orderkey) AS c_count
           FROM customer LEFT OUTER JOIN orders
             ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
           GROUP BY c_custkey)
         GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",
    "q_tpch14" ->
      """SELECT 100.0 * COALESCE(CAST(sum(CASE WHEN p_type = 'PROMO' THEN
                  CAST(l_extendedprice AS DECIMAL(12,2)) *
                  (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                END) AS DOUBLE), 0.0) /
                CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                  (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
                  AS DOUBLE) AS promo_revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
           AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'""",
    "q_tpch19" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
                  (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))))
                  AS DOUBLE) AS revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
                AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
                AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 20 AND 30)""",
  )
}
