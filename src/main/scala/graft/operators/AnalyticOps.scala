package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.Tables

/** Analytic surface beyond the reference (engine-extension queries): rollup
  * grouping sets, window frames (running totals, lag deltas), and exact
  * interpolated percentiles — each cross-checked against DuckDB.
  */
object AnalyticOps {

  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  // u6 — ROLLUP over (returnflag, linestatus): subtotal + grand-total rows.
  private def u6Rollup(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_extendedprice")).as("price_sum"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  private val u6Sql =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // o5 — window frames: per-customer running order total + gap to the
  // previous order (lag) in days.
  private def o5WindowFrames(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("running_total",
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)).cast(DoubleType))
      .withColumn("prev_date", lag(col("o_orderdate"), 1).over(w))
      .withColumn("gap_days",
        datediff(col("o_orderdate"), col("prev_date")).cast(IntegerType))
      .select("o_custkey", "o_orderkey", "o_orderdate", "running_total", "gap_days")
      .orderBy("o_custkey", "o_orderdate", "o_orderkey")
  }

  private val o5Sql =
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_total,
      |  CAST(date_diff('day', lag(o_orderdate, 1) OVER w, o_orderdate) AS INTEGER) AS gap_days
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin

  // a7 — exact interpolated percentiles per group (quantity is
  // integer-valued, so the linear interpolation is exact in both engines).
  private def a7Percentiles(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("qty_p50"),
        expr("percentile(l_quantity, 0.9)").as("qty_p90"),
        expr("percentile(l_quantity, 0.99)").as("qty_p99"))
      .orderBy("l_returnflag")

  private val a7Sql =
    """SELECT l_returnflag,
      |  quantile_cont(l_quantity, 0.5) AS qty_p50,
      |  quantile_cont(l_quantity, 0.9) AS qty_p90,
      |  quantile_cont(l_quantity, 0.99) AS qty_p99
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // a8 — salted two-phase aggregation: the skew-mitigation pattern as an
  // operator. l_returnflag has 3 values (extreme skew at scale: a plain
  // groupBy funnels a third of 100 TB through one reducer); salting spreads
  // phase 1 over key x 16 salt buckets (map-side partials land evenly),
  // phase 2 reduces 3 x 16 tiny rows. DECIMAL partials keep the result
  // bit-equal to the unsalted plan, so the oracle is the plain GROUP BY.
  private def a8SaltedAgg(s: SparkSession, d: String): DataFrame = {
    val salted = Tables.lineitem(s, d)
      .withColumn("salt", pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(16)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).as("part_price"),
        sum(col("l_quantity")).as("part_qty"),
        count(lit(1)).as("part_n"))
    salted
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("part_price")).cast(DoubleType).as("price_sum"),
        sum(col("part_qty")).as("qty_sum"),
        sum(col("part_n")).as("n"))
      .orderBy("l_returnflag")
  }

  private val a8Sql =
    """SELECT l_returnflag,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum,
      |  sum(l_quantity) AS qty_sum,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------------------
  // j8 — salted skew join: lineitem's returnflag is a 3-value key (massively
  // skewed if joined directly — one reducer per flag). The big side salts
  // pmod(hash(orderkey, linenumber), 16); the 3-row dim EXPLODES x16 so
  // every (flag, salt) bucket finds its match. The join key becomes
  // (flag, salt) — 48 evenly-sized buckets instead of 3 whales. Output is
  // identical to the unsalted join, so the oracle is the plain SQL join.
  // (AQE's skew-join split is the runtime twin; this is the declared-plan
  // version for engines/cases AQE can't rebalance, e.g. a custom
  // aggregation downstream of the join.)
  private def j8SaltedJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val flagDim = Seq(("R", "returned"), ("A", "ack"), ("N", "none"))
      .toDF("flag", "flag_desc")
    val Salts = 16
    val dimSalted = flagDim
      .withColumn("salt", explode(expr(s"sequence(0, ${Salts - 1})")))
    val factSalted = Tables.lineitem(s, d)
      .withColumn("salt", pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(Salts)))
    factSalted
      .join(broadcast(dimSalted),
        col("l_returnflag") === col("flag") && factSalted("salt") === dimSalted("salt"))
      .groupBy(col("flag_desc"))
      .agg(
        sum(col("l_quantity")).as("qty_sum"),
        count(lit(1)).as("n"))
      .orderBy("flag_desc")
  }

  private val j8Sql =
    """SELECT flag_desc, sum(l_quantity) AS qty_sum, count(*) AS n
      |FROM lineitem
      |JOIN (VALUES ('R', 'returned'), ('A', 'ack'), ('N', 'none')) AS dim(flag, flag_desc)
      |  ON l_returnflag = flag
      |GROUP BY flag_desc ORDER BY flag_desc""".stripMargin

  // ---------------------------------------------------------------------------
  // a9 — KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al.
  // 2002): keep the k smallest of the distinct 60-bit hashes of the key;
  // estimate = (k-1) / u_k where u_k is the k-th minimum normalized to
  // [0, 1). The plan is the scale story: the inner DISTINCT is map-side
  // partial (each partition emits its own distinct hashes), and orderBy +
  // limit compiles to TakeOrderedAndProject — every partition keeps only
  // its k smallest, the driver merges k-sized heaps, and NOTHING resembling
  // the full key set ever moves. Like t7's Count-Min (and unlike HLL whose
  // register layout is engine-private), the portable md5-backed hash makes
  // the sketch — and therefore the estimate — DuckDB-oracle-checkable.
  private val KmvK = 256

  private def a9KmvDistinct(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val hashes = li
      .select(TextOps.hash60(col("l_orderkey").cast(StringType)).as("h")).distinct()
    val kmin = hashes.orderBy("h").limit(KmvK)
    // (k-1) * 2^60 is exact in IEEE double (8-bit mantissa), so the whole
    // estimate is one exactly-reproducible division in both engines
    val scaleNum = lit((KmvK - 1).toDouble) * lit(math.pow(2, 60))
    kmin.agg(count(lit(1)).as("k"), max(col("h")).as("hk"))
      .crossJoin(li.agg(countDistinct(col("l_orderkey")).as("true_n")))
      // unfull sketch => it holds EVERY distinct hash, so the observed k IS
      // the (exact) answer; the (k-1)/u_k estimator only applies at k = K
      .withColumn("est",
        when(col("k") < KmvK, col("k").cast(DoubleType))
          .otherwise(scaleNum / col("hk").cast(DoubleType)))
      .select(col("k"), col("hk"), col("true_n"),
        round(col("est"), 2).as("est_n"),
        round((col("est") - col("true_n")) / col("true_n") * 100, 2).as("err_pct"))
  }

  private val a9Sql =
    s"""WITH hashes AS (
       |  SELECT DISTINCT CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)),1,15)) AS BIGINT) AS h
       |  FROM lineitem
       |), kmin AS (
       |  SELECT h FROM hashes ORDER BY h LIMIT $KmvK
       |), agg AS (
       |  SELECT CAST(count(*) AS BIGINT) AS k, max(h) AS hk FROM kmin
       |), exact AS (
       |  SELECT count(DISTINCT l_orderkey) AS true_n FROM lineitem
       |)
       |SELECT k, hk, true_n,
       |  round(CASE WHEN k < $KmvK THEN CAST(k AS DOUBLE)
       |        ELSE ${KmvK - 1}.0 * power(2.0, 60) / CAST(hk AS DOUBLE) END, 2) AS est_n,
       |  round((CASE WHEN k < $KmvK THEN CAST(k AS DOUBLE)
       |         ELSE ${KmvK - 1}.0 * power(2.0, 60) / CAST(hk AS DOUBLE) END - true_n) / true_n * 100, 2) AS err_pct
       |FROM agg, exact""".stripMargin

  // ---------------------------------------------------------------------------
  // a10 — per-group KMV distinct sketches: the same k-minimum-values
  // construction as a9 but keyed (distinct orderkeys per returnflag).
  // Per-key sketches are what a 100 TB pipeline actually maintains
  // (distincts per domain / language / source): each group's k-minima are
  // mergeable cell-wise, the DISTINCT is map-side partial, and the window
  // rank runs on already-deduped (flag, hash) rows. The estimator applies
  // the same full/unfull split as a9 per group.
  private def a10GroupedKmv(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val hashes = li.select(col("l_returnflag").as("flag"),
        TextOps.hash60(col("l_orderkey").cast(StringType)).as("h"))
      .distinct()
    val w = Window.partitionBy("flag").orderBy("h")
    val kmin = hashes.withColumn("rn", row_number().over(w)).where(col("rn") <= KmvK)
    val scaleNum = lit((KmvK - 1).toDouble) * lit(math.pow(2, 60))
    val exact = li.groupBy(col("l_returnflag").as("flag"))
      .agg(countDistinct(col("l_orderkey")).as("true_n"))
    kmin.groupBy("flag")
      .agg(count(lit(1)).as("k"), max(col("h")).as("hk"))
      .join(exact, "flag")
      .withColumn("est",
        when(col("k") < KmvK, col("k").cast(DoubleType))
          .otherwise(scaleNum / col("hk").cast(DoubleType)))
      .select(col("flag"), col("k"), col("true_n"),
        round(col("est"), 2).as("est_n"),
        round((col("est") - col("true_n")) / col("true_n") * 100, 2).as("err_pct"))
      .orderBy("flag")
  }

  private val a10Sql =
    s"""WITH hashes AS (
       |  SELECT DISTINCT l_returnflag AS flag,
       |    CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)),1,15)) AS BIGINT) AS h
       |  FROM lineitem
       |), kmin AS (
       |  SELECT flag, h FROM (
       |    SELECT flag, h, row_number() OVER (PARTITION BY flag ORDER BY h) AS rn FROM hashes)
       |  WHERE rn <= $KmvK
       |), agg AS (
       |  SELECT flag, CAST(count(*) AS BIGINT) AS k, max(h) AS hk FROM kmin GROUP BY flag
       |), exact AS (
       |  SELECT l_returnflag AS flag, count(DISTINCT l_orderkey) AS true_n
       |  FROM lineitem GROUP BY flag
       |)
       |SELECT flag, k, true_n,
       |  round(CASE WHEN k < $KmvK THEN CAST(k AS DOUBLE)
       |        ELSE ${KmvK - 1}.0 * power(2.0, 60) / CAST(hk AS DOUBLE) END, 2) AS est_n,
       |  round((CASE WHEN k < $KmvK THEN CAST(k AS DOUBLE)
       |         ELSE ${KmvK - 1}.0 * power(2.0, 60) / CAST(hk AS DOUBLE) END - true_n) / true_n * 100, 2) AS err_pct
       |FROM agg JOIN exact USING (flag)
       |ORDER BY flag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "u6_rollup"        -> u6Rollup _,
    "o5_window_frames" -> o5WindowFrames _,
    "a7_percentiles"   -> a7Percentiles _,
    "a8_salted_agg"    -> a8SaltedAgg _,
    "a9_kmv_distinct"  -> a9KmvDistinct _,
    "a10_grouped_kmv"  -> a10GroupedKmv _,
    "j8_salted_join"   -> j8SaltedJoin _)

  val oracles: Map[String, String] = Map(
    "u6_rollup"        -> u6Sql,
    "o5_window_frames" -> o5Sql,
    "a7_percentiles"   -> a7Sql,
    "a8_salted_agg"    -> a8Sql,
    "a9_kmv_distinct"  -> a9Sql,
    "a10_grouped_kmv"  -> a10Sql,
    "j8_salted_join"   -> j8Sql)
}
