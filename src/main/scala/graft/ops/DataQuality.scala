package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables

/** Declarative data-quality validation (the Deequ/Great-Expectations
  * shape): a fixed suite of constraints — completeness, uniqueness,
  * value ranges, referential integrity, cross-table consistency —
  * evaluated in one batch, emitting a (check, n_checked, n_violations)
  * census. The pipeline-gate operator: a training-data build at 100 TB
  * runs this BEFORE dedup/mixing so a bad upstream delivery fails fast
  * instead of poisoning the corpus.
  *
  * Scale shape — the whole suite costs three fact-table passes, not one
  * per check:
  *   - all single-column checks on a table (null/range) fold into ONE
  *     map-side-combinable multi-sum aggregate over its scan;
  *   - uniqueness is a groupBy on the candidate key (count>1 census) —
  *     the only shuffle keyed on the table itself;
  *   - referential integrity and cross-table consistency share one
  *     key-projected join per (fact, dim) pair; the dim side is the
  *     key column only, so even a "big" dim ships a single long column.
  * Every check emits exactly one row, so the union at the end is a
  * constant-size frame regardless of data volume.
  */
object DataQuality {

  def dqChecks(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val customer = Tables.customer(spark, dir)

    def viol(c: org.apache.spark.sql.Column) =
      sum(when(c, 1L).otherwise(0L))

    // one pass over orders: completeness + range checks together
    val ordersPass = orders.agg(
      count(lit(1)).as("n"),
      viol(col("o_totalprice").isNull).as("v_null_total"),
      viol(col("o_totalprice") <= 0).as("v_nonpos_total"),
      viol(col("o_orderdate").isNull).as("v_null_date"))
    val ordersChecks = ordersPass.select(explode(array(
      struct(lit("orders.o_totalprice.complete").as("check"),
        col("n").as("n_checked"), col("v_null_total").as("n_violations")),
      struct(lit("orders.o_totalprice.positive").as("check"),
        col("n").as("n_checked"), col("v_nonpos_total").as("n_violations")),
      struct(lit("orders.o_orderdate.complete").as("check"),
        col("n").as("n_checked"), col("v_null_date").as("n_violations"))))
      .as("r")).select(col("r.*"))

    // one pass over lineitem
    val liPass = lineitem.agg(
      count(lit(1)).as("n"),
      viol(col("l_discount") < 0 || col("l_discount") > 0.1).as("v_disc"),
      viol(col("l_quantity") <= 0).as("v_qty"),
      viol(col("l_extendedprice").isNull).as("v_null_price"))
    val liChecks = liPass.select(explode(array(
      struct(lit("lineitem.l_discount.in_range_0_0.1").as("check"),
        col("n").as("n_checked"), col("v_disc").as("n_violations")),
      struct(lit("lineitem.l_quantity.positive").as("check"),
        col("n").as("n_checked"), col("v_qty").as("n_violations")),
      struct(lit("lineitem.l_extendedprice.complete").as("check"),
        col("n").as("n_checked"), col("v_null_price").as("n_violations"))))
      .as("r")).select(col("r.*"))

    // uniqueness: candidate-key duplicate census (n_checked = distinct
    // keys; violations = rows beyond the first per duplicated key)
    def uniqueness(df: DataFrame, name: String, keys: String*) = df
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
      .agg(count(lit(1)).as("n_checked"),
        coalesce(sum(when(col("c") > 1, col("c") - 1)), lit(0L))
          .as("n_violations"))
      .select(lit(name).as("check"), col("n_checked"), col("n_violations"))
    val uniqOrders = uniqueness(orders, "orders.o_orderkey.unique", "o_orderkey")
    val uniqLi = uniqueness(lineitem, "lineitem.(l_orderkey,l_linenumber).unique",
      "l_orderkey", "l_linenumber")

    // referential integrity: fact key ⟶ dim key, as a key-projected
    // left join + null census (never a per-row subquery)
    def ri(fact: DataFrame, fk: String, dim: DataFrame, pk: String, name: String) =
      fact.select(col(fk))
        .join(dim.select(col(pk)).distinct(), col(fk) === col(pk), "left")
        .agg(count(lit(1)).as("n_checked"),
          coalesce(sum(when(col(pk).isNull, 1L)), lit(0L)).as("n_violations"))
        .select(lit(name).as("check"), col("n_checked"), col("n_violations"))
    val riOrders = ri(orders, "o_custkey", customer, "c_custkey",
      "orders.o_custkey.refers.customer")
    val riLi = ri(lineitem, "l_orderkey", orders, "o_orderkey",
      "lineitem.l_orderkey.refers.orders")

    // cross-table consistency: a line item must not ship before its
    // order was placed (fires on the synthetic data — the example of a
    // check that catches real generator/upstream bugs)
    val shipAfter = lineitem.select(col("l_orderkey"), col("l_shipdate"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .agg(count(lit(1)).as("n_checked"),
        coalesce(sum(when(col("l_shipdate") < col("o_orderdate"), 1L)), lit(0L))
          .as("n_violations"))
      .select(lit("lineitem.l_shipdate.gte.o_orderdate").as("check"),
        col("n_checked"), col("n_violations"))

    ordersChecks.unionAll(liChecks).unionAll(uniqOrders).unionAll(uniqLi)
      .unionAll(riOrders).unionAll(riLi).unionAll(shipAfter)
      .orderBy(col("check"))
  }

  /** k-anonymity / l-diversity census over the document corpus — the
    * privacy-governance face of data quality (Sweeney 2002; Machanavajjhala
    * et al. 2007): rows sharing a quasi-identifier tuple (language,
    * length bucket) form an equivalence class; a class smaller than k is
    * re-identifiable, and a class whose sensitive attribute (here:
    * source) is homogeneous leaks it even at size ≥ k. Emits one row per
    * class with size, l-diversity, 1/size re-identification risk and
    * both at-risk flags — the audit a release gate runs before
    * publishing corpus metadata.
    *
    * Scale shape: ONE map-side-combinable aggregate over the scan
    * (count + two-phase distinct on a bounded attribute); output is
    * |QI-space|-bounded, independent of corpus size. */
  /** Benford first-digit conformance census, gated as q_benford: the
    * leading-digit distribution of lineitem extended prices against
    * Benford's law — the classic forensic screen for fabricated or
    * truncated numeric columns (a synthetic or clipped price feed
    * deviates sharply). Emits one row per digit with observed count,
    * expected probability and the chi-square component, so the caller
    * sums 9 bounded terms.
    *
    * Exactness: the digit comes from the integer-cents STRING prefix
    * (BIGINT→VARCHAR is exact in both engines — no log10 anywhere),
    * the nine Benford probabilities are pinned literals, and each
    * chi-square component is one deterministic double expression from
    * a BIGINT count. One map-side-combinable 9-group aggregate over
    * the scan; output is 9 rows at any scale. */
  def benford(spark: SparkSession, dir: String): DataFrame = {
    // log10(1 + 1/d) for d = 1..9, pinned so libm cannot drift
    val p = Seq(0.3010299956639812, 0.17609125905568124, 0.12493873660829993,
      0.09691001300805642, 0.07918124604762482, 0.06694678963061322,
      0.05799194697768673, 0.05115252244738129, 0.04575749056067514)
    val probExpr = p.zipWithIndex.reverse
      .foldLeft(lit(0.0)) { case (acc, (v, i)) =>
        when(col("digit") === (i + 1), v).otherwise(acc)
      }
    Tables.lineitem(spark, dir)
      .filter(col("l_extendedprice") > 0)
      .withColumn("digit",
        substring(round(col("l_extendedprice") * 100).cast("long")
          .cast("string"), 1, 1).cast("int"))
      // values under half a cent round to 0 cents -> digit 0, whose
      // expected_p is 0 and whose chi2 term divides by zero; Benford's
      // domain is digits 1..9 (unreachable on extendedprice, guarded
      // for reuse on other columns)
      .filter(col("digit").between(1, 9))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("observed"))
      .withColumn("n", sum(col("observed")).over( // 9-row frame: bounded
        org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("expected_p", probExpr)
      .withColumn("dev",
        col("observed").cast("double")
          - col("n").cast("double") * col("expected_p"))
      // integer-unit re-quantization: round-to-BIGINT is engine-stable,
      // round(x, 6) is not (Spark BigDecimal vs DuckDB multiply path)
      .select(col("digit"), col("observed"), col("n"), col("expected_p"),
        (round(col("dev") * col("dev")
            / (col("n").cast("double") * col("expected_p")) * 1e6)
          .cast("long").cast("double") / 1e6).as("chi2_part"))
      .orderBy(col("digit"))
  }

  def kAnonymity(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"),
        (floor(col("n_chars") / 200) * 200).as("len_bucket"), col("source"))
      .groupBy(col("lang"), col("len_bucket"))
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col("source")).as("l_diversity"))
      .select(col("lang"), col("len_bucket"), col("class_size"),
        col("l_diversity"),
        round(lit(1.0) / col("class_size"), 6).as("reident_risk"),
        when(col("class_size") < k, 1L).otherwise(0L).as("at_risk_k"),
        when(col("l_diversity") < 2, 1L).otherwise(0L).as("at_risk_l"))
      .orderBy(col("lang"), col("len_bucket"))
}
