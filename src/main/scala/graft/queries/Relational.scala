package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables

/** TPC-H-shaped relational headliners beyond the q1/q3/q5 trio — the
  * multi-join / disjunctive-predicate / having-clause shapes an analytics
  * engine must plan well at scale. Adapted to the harness's trimmed star
  * schema (TESTDATA.md: no shipmode/commitdate/container columns), with
  * revenue carried as exact integer cents (BIGINT) so aggregate sums are
  * order-independent and hash-identical across engines.
  *
  * Scale notes:
  *   - dimension sides (nation, region, part, supplier, customer) are
  *     `broadcast(...)` — the fact table (lineitem/orders) never shuffles
  *     for a dimension join;
  *   - every date / disjunctive predicate sits on scan columns →
  *     Catalyst pushes them into the parquet reader (row-group pruning);
  *   - the q18 having-filter reduces BEFORE the dimension joins, so the
  *     expensive join input is already tiny.
  */
object Relational {

  /** Exact revenue cents: round(extprice * (1 - discount) * 100). The
    * double product is IEEE-identical across engines; the rounding to
    * integer cents makes the subsequent SUM order-independent. */
  private def revenueCents: Column =
    round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
      .cast("long")

  private def ts(s: String): Column = to_timestamp(lit(s))

  // --------------------------------------------------------------------
  // TPC-H Q7 (volume shipping): bilateral trade volume by nation pair
  // --------------------------------------------------------------------

  /** Revenue between every (supplier nation, customer nation) pair by ship
    * year, 1996–1997, excluding domestic flows. lineitem joins the
    * broadcast supplier/customer→nation dims; the only fact shuffle is the
    * final group-by on the ~25×24×2 result keys. */
  def tradeVolume(spark: SparkSession, dir: String): DataFrame = {
    val suppNation = Tables.supplier(spark, dir)
      .join(Tables.nation(spark, dir),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val custNation = Tables.customer(spark, dir)
      .join(Tables.nation(spark, dir),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
              col("l_shipdate") < ts("1998-01-01 00:00:00"))
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(suppNation), col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(custNation), col("c_custkey") === col("o_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
               year(col("l_shipdate")).as("l_year"))
      .agg(sum(revenueCents).as("revenue_cents"), count(lit(1)).as("n_lines"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  // --------------------------------------------------------------------
  // TPC-H Q12 (shipping priority): urgent vs low line counts per class
  // --------------------------------------------------------------------

  /** Per return-flag class (the schema's stand-in for shipmode): how many
    * 1996-shipped lines belong to URGENT/HIGH-priority orders vs the
    * rest. The order side is projected to (key, priority) before the join
    * — at scale that's the smaller side and broadcasts; counts are
    * conditional sums in one map-side-combinable agg. */
  def shipPriority(spark: SparkSession, dir: String): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
              col("l_shipdate") < ts("1997-01-01 00:00:00"))
      .join(Tables.orders(spark, dir)
              .select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }

  // --------------------------------------------------------------------
  // TPC-H Q14 (promotion effect): promo revenue share
  // --------------------------------------------------------------------

  /** Share of 1996 revenue from PROMO-type parts: a single-row ratio of
    * two exact BIGINT cent sums (one conditional). Part is broadcast; the
    * fact scan reduces map-side to one row — no wide shuffle at all. The
    * final `100·promo/total` division is the only floating step. */
  def promoShare(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
              col("l_shipdate") < ts("1997-01-01 00:00:00"))
      .join(broadcast(Tables.part(spark, dir)
              .select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", revenueCents).otherwise(0L))
          .as("promo_cents"),
        sum(revenueCents).as("total_cents"))
      .select(
        ((lit(100.0) * col("promo_cents")) / col("total_cents"))
          .as("promo_pct"),
        col("promo_cents"), col("total_cents"))

  // --------------------------------------------------------------------
  // TPC-H Q18 (large-volume customers): groupBy + HAVING + top-N
  // --------------------------------------------------------------------

  /** Orders whose total line quantity exceeds 150 units, with their
    * customer — the HAVING-then-join shape. The quantity rollup runs
    * FIRST (map-side combinable, shuffle on orderkey); joining before
    * aggregating would shuffle the full fact table through the dimension
    * join for rows that are thrown away. No side carries a broadcast
    * hint: the HAVING survivors scale LINEARLY with the data (a constant
    * qualifying fraction of orders), so forcing them broadcast is the
    * same data-scaled-build-side OOM as broadcasting customer (150k rows
    * per SF — fact-sized); AQE sizes the build side from the runtime
    * survivor count instead, broadcasting when genuinely small and
    * falling back to a shuffle join when not. */
  def largeVolumeCustomers(spark: SparkSession, dir: String,
      thresholdQty: Double = 150.0): DataFrame = {
    val bigOrders = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(round(col("l_quantity") * 100).cast("long")).as("total_qty_cents"))
      .filter(col("total_qty_cents") > (thresholdQty * 100).toLong)
    val withOrders = Tables.orders(spark, dir)
      .join(bigOrders, col("o_orderkey") === col("l_orderkey"))
    Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"))
      .join(withOrders, col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
              col("o_orderdate"), col("total_qty_cents"))
      .orderBy(col("total_qty_cents").desc, col("o_orderkey"))
      .limit(100)
  }

  // --------------------------------------------------------------------
  // TPC-H Q19 (discounted revenue): disjunctive multi-clause predicate
  // --------------------------------------------------------------------

  /** Revenue over three OR-ed (type, size-band, quantity-band) clauses —
    * the disjunctive-pushdown stress shape. Part is broadcast; the
    * disjunction references both sides so it evaluates at the join, but
    * the per-side prefilters (size ≤ 50, qty bounds) still push into the
    * scans. Single-row exact-cents output. */
  def brandRevenue(spark: SparkSession, dir: String): DataFrame = {
    val clause =
      (col("p_type") === "PROMO" && col("p_size").between(1, 15) &&
         col("l_quantity").between(10, 30)) ||
      (col("p_type") === "SMALL" && col("p_size").between(16, 35) &&
         col("l_quantity").between(20, 40)) ||
      (col("p_type") === "LARGE" && col("p_size").between(36, 50) &&
         col("l_quantity").between(25, 50))
    Tables.lineitem(spark, dir)
      .join(broadcast(Tables.part(spark, dir)
              .select(col("p_partkey"), col("p_type"), col("p_size"))),
        col("l_partkey") === col("p_partkey"))
      .filter(clause)
      .agg(sum(revenueCents).as("revenue_cents"), count(lit(1)).as("n_lines"))
  }

  // --------------------------------------------------------------------
  // TPC-H Q2 core (argmin join): cheapest supplier per part
  // --------------------------------------------------------------------

  /** Per-part argmin over suppliers (Q2's correlated min, on the
    * harness schema: lineitem as the part×supplier price observation).
    * Two-phase: a map-side-combinable (part → min price) aggregate,
    * then ONE equi-join back on (part, price) with a deterministic
    * min-suppkey tie-break — never a correlated per-row subquery, and
    * never a row_number over the full observation table when only the
    * argmin row is wanted (the aggregate's shuffle carries two columns,
    * the window's would carry every column). */
  def cheapestSupplier(spark: SparkSession, dir: String,
      topN: Int = 100): DataFrame = {
    val obs = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), col("l_suppkey"),
        round(col("l_extendedprice") * 100).cast("long").as("price_cents"))
    val minPrice = obs.groupBy(col("l_partkey"))
      .agg(min(col("price_cents")).as("min_cents"))
    obs.join(minPrice, Seq("l_partkey"))
      .filter(col("price_cents") === col("min_cents"))
      .groupBy(col("l_partkey"), col("min_cents"))
      .agg(min(col("l_suppkey")).as("supp"))
      .join(broadcast(Tables.supplier(spark, dir)
        .select(col("s_suppkey"), col("s_name"))), col("supp") === col("s_suppkey"))
      .select(col("l_partkey"), col("min_cents"), col("supp"), col("s_name"))
      .orderBy(col("min_cents").desc, col("l_partkey"))
      .limit(topN)
  }

  // --------------------------------------------------------------------
  // Existence joins (TPC-H Q4/Q22 shape): left-semi + left-anti
  // --------------------------------------------------------------------

  /** Per-nation customer census by URGENT-order existence: LEFT SEMI
    * (has ≥1 urgent order) and LEFT ANTI (has none) as first-class
    * plans — the EXISTS / NOT EXISTS duals. Semi/anti is the right
    * physical shape when only existence matters: the probe side emits
    * each customer at most once regardless of order fan-out (no
    * post-join dedup), and the build side carries ONLY o_custkey —
    * the orderpriority predicate is pushed into the orders scan and
    * the join's build input is the filtered key column, not the fact
    * table. The final per-nation rollup is a 25-key broadcast-dim
    * aggregate. */
  def existenceJoins(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("nation"))
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    val semi = cust.join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("nation")).agg(count(lit(1)).as("n_urgent_cust"))
    val anti = cust.join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("nation")).agg(count(lit(1)).as("n_no_urgent"))
    cust.groupBy(col("nation")).agg(count(lit(1)).as("n_cust"))
      .join(semi, Seq("nation"), "left")
      .join(anti, Seq("nation"), "left")
      .select(col("nation"), col("n_cust"),
        coalesce(col("n_urgent_cust"), lit(0L)).as("n_urgent_cust"),
        coalesce(col("n_no_urgent"), lit(0L)).as("n_no_urgent"))
      .orderBy(col("nation"))
  }

  /** Frequent item pairs (market-basket, the Apriori first two passes),
    * gated as q_item_pairs: top-20 part pairs by co-occurrence support
    * across orders, with lift against the independence baseline.
    *
    * Scale shape — the three classic guards against the quadratic
    * blow-up:
    *   1. per-basket distinct first (an order listing a part twice is
    *      one incidence), so the pair fan-out is C(distinct items, 2)
    *      per basket — bounded by basket width, never by corpus;
    *   2. Apriori pruning: a pair can reach `minSupport` only if BOTH
    *      items do (anti-monotonicity), so the frequent-item semi-join
    *      (broadcast: |frequent items| ≤ |parts|) shrinks baskets
    *      BEFORE the self-join fan-out;
    *   3. the pair aggregate is map-side-combinable on the (p1, p2)
    *      key, and the final top-20 is a TakeOrdered k-row reduction,
    *      not a global sort.
    * Lift's one double division happens after exact integer counts. */
  def itemPairs(spark: SparkSession, dir: String,
      minSupport: Long = 3, k: Int = 20): DataFrame = {
    val baskets = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val freq = baskets.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("f"))
      .filter(col("f") >= minSupport)
    val pruned = baskets
      .join(broadcast(freq.select(col("l_partkey"))), Seq("l_partkey"))
    val nOrders = Tables.orders(spark, dir).agg(count(lit(1)).as("n_orders"))
    val pairs = pruned.as("a")
      .join(pruned.as("b"), col("a.l_orderkey") === col("b.l_orderkey")
        && col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("p1"), col("b.l_partkey").as("p2"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
    pairs
      .join(broadcast(freq.select(col("l_partkey").as("p1"), col("f").as("f1"))), Seq("p1"))
      .join(broadcast(freq.select(col("l_partkey").as("p2"), col("f").as("f2"))), Seq("p2"))
      .crossJoin(broadcast(nOrders))
      .select(col("p1"), col("p2"), col("support"), col("f1"), col("f2"),
        round((col("support") * col("n_orders")).cast("double")
          / (col("f1") * col("f2")).cast("double"), 6).as("lift"))
      .orderBy(col("support").desc, col("p1"), col("p2"))
      .limit(k)
  }
}
