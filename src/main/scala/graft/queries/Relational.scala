package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Relational core — SURVEY.md §2.B. The range/point/fold primitives the
  * view engine compiles to, each proven against the DuckDB oracle.
  *
  * Scale notes: dimension tables (region/nation/supplier/part/customer at
  * TPC-H ratios) are broadcast explicitly; only fact-side aggregations
  * shuffle, and those pre-aggregate map-side via partial agg. Filters and
  * projections are plain `Column` expressions so Catalyst pushes them into
  * the parquet scan.
  */
object Relational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  private def r4(c: Column): Column = round(c, 4)

  val all: Seq[Q] = Seq(

    // B1: TPC-H Q1-style flat aggregation; partial agg map-side, one shuffle.
    // Money math in exact integer fixed point ([[Fixed]]): plain cents
    // sums stay Long; the cents×percent composites (per-row ~1e11) sum
    // in decimal(38,0) via Fixed.sumExact so no group size can overflow
    // — the sf1 sweep showed round(sum(double)) flipping rounding
    // boundaries at 10x gate scale, and a Long composite sum would cap
    // out near ~8e7 rows/group, far below the 100 TB target.
    Q("q01_agg",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS DOUBLE) AS sum_qty,
        |  CAST(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 AS sum_base_price,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 AS sum_disc_price,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l_discount * 100) AS BIGINT))
        |    * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS DOUBLE) / 1000000.0 AS sum_charge,
        |  CAST(CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      val priceC = Fixed.cents(col("l_extendedprice"))
      val discP = lit(100L) - Fixed.cents(col("l_discount"))
      val taxP = lit(100L) + Fixed.cents(col("l_tax"))
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Fixed.asDouble(sum(col("l_quantity").cast("long")), 1L).as("sum_qty"),
          Fixed.asDouble(sum(priceC), 100L).as("sum_base_price"),
          Fixed.asDouble(Fixed.sumExact(priceC * discP), 10000L).as("sum_disc_price"),
          Fixed.asDouble(Fixed.sumExact(priceC * discP * taxP), 1000000L).as("sum_charge"),
          (Fixed.asDouble(sum(col("l_quantity").cast("long")), 1L) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // B2: filter + projection pushdown (PushedFilters + pruned ReadSchema).
    Q("q02_filter_project",
      """SELECT l_orderkey, l_linenumber,
        |  round(l_extendedprice * (1 - l_discount), 4) AS net_price
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-06-01' AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-06-01").cast("timestamp") &&
          col("l_discount") > 0.05)
        .select(col("l_orderkey"), col("l_linenumber"),
          r4(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    },

    // B3: fact joins two broadcast dims; no shuffle on the dim side.
    Q("q03_join_broadcast",
      """SELECT n_name,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000.0 AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(Fixed.asDouble(Fixed.sumExact(
            Fixed.cents(col("l_extendedprice")) * (lit(100L) - Fixed.cents(col("l_discount")))),
            10000L).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    },

    // B4: star join orders→customer→nation→region, all dims broadcast.
    Q("q04_star_join",
      """SELECT r_name, n_name, count(*) AS n_orders,
        |  CAST(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 AS total_price
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          Fixed.asDouble(sum(Fixed.cents(col("o_totalprice"))), 100L).as("total_price"))
        .orderBy(col("r_name"), col("n_name"))
    },

    // B5: EXISTS → left_semi (no row multiplication, dedup-free).
    Q("q05_semi_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 100000)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_totalprice") > 100000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // B6: NOT EXISTS → left_anti.
    Q("q06_anti_join",
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },

    // B7: left outer + count of non-null right keys.
    Q("q07_outer_join",
      """SELECT c_custkey, count(o_orderkey) AS order_cnt,
        |  round(coalesce(sum(o_totalprice), 0), 4) AS total_spend
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("order_cnt"),
          r4(coalesce(sum(col("o_totalprice")), lit(0.0))).as("total_spend"))
        .orderBy(col("c_custkey"))
    },

    // B8: top-N per group via row_number; deterministic tie-break.
    Q("q08_window_topn",
      """SELECT l_returnflag, rn, l_orderkey, l_linenumber, l_extendedprice FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem) WHERE rn <= 5
        |ORDER BY l_returnflag, rn""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      t(s, dir, "lineitem")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("l_returnflag"), col("rn").cast("long").as("rn"),
          col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_returnflag"), col("rn"))
    },

    // B9: running sum with an explicit rows frame over a unique order key.
    Q("q09_window_running",
      """SELECT o_custkey, o_orderkey,
        |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_spend
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          r4(sum(col("o_totalprice")).over(w)).as("running_spend"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    },

    // B10: global ORDER BY + LIMIT → TakeOrderedAndProject, never a full sort.
    Q("q10_sort_limit",
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 100""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(100)
    },

    // B11: distinct = shuffle dedup with partial map-side dedup.
    Q("q11_distinct",
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },

    // B12: union-all of heterogenous sides, tagged, then re-aggregated.
    Q("q12_union",
      """SELECT side, nationkey, count(*) AS cnt FROM (
        |  SELECT 'c' AS side, c_nationkey AS nationkey FROM customer
        |  UNION ALL
        |  SELECT 's' AS side, s_nationkey AS nationkey FROM supplier)
        |GROUP BY side, nationkey
        |ORDER BY side, nationkey""".stripMargin) { (s, dir) =>
      val c = t(s, dir, "customer").select(lit("c").as("side"), col("c_nationkey").as("nationkey"))
      val su = t(s, dir, "supplier").select(lit("s").as("side"), col("s_nationkey").as("nationkey"))
      c.unionByName(su)
        .groupBy(col("side"), col("nationkey"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("side"), col("nationkey"))
    },

    // B13: HAVING = post-aggregation filter.
    Q("q13_having",
      """SELECT o_custkey, count(*) AS cnt FROM orders
        |GROUP BY o_custkey HAVING count(*) >= 3
        |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= 3)
        .orderBy(col("o_custkey"))
    },

    // B14: CASE WHEN / conditional aggregation.
    Q("q14_case_when",
      """SELECT l_linestatus,
        |  CAST(CAST(sum(CASE WHEN l_returnflag = 'R'
        |    THEN CAST(round(l_extendedprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS DOUBLE) / 100.0 AS returned_price,
        |  CAST(CAST(sum(CASE WHEN l_returnflag <> 'R'
        |    THEN CAST(round(l_extendedprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS DOUBLE) / 100.0 AS kept_price
        |FROM lineitem GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin) { (s, dir) =>
      val priceC = Fixed.cents(col("l_extendedprice"))
      t(s, dir, "lineitem")
        .groupBy(col("l_linestatus"))
        .agg(
          Fixed.asDouble(sum(when(col("l_returnflag") === "R", priceC).otherwise(0L)), 100L)
            .as("returned_price"),
          Fixed.asDouble(sum(when(col("l_returnflag") =!= "R", priceC).otherwise(0L)), 100L)
            .as("kept_price"))
        .orderBy(col("l_linestatus"))
    },

    // B15: scalar subquery → broadcast one-row agg, joined with a cross join.
    // The `price > avg(price)` threshold is taken in exact integer space
    // (price_cents * n > sum_cents — the division-free restatement; see
    // Fixed): avg() over a scale-growing table carries summation-order
    // noise in its last ulps, so a boundary part could flip between
    // engines at 100 TB even though presentation rounding hides it here.
    Q("q15_scalar_subquery",
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |WHERE CAST(round(p_retailprice * 100) AS BIGINT)
        |      * (SELECT count(*) FROM part)
        |    > (SELECT sum(CAST(round(p_retailprice * 100) AS BIGINT)) FROM part)
        |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      val part = t(s, dir, "part")
      val stats = part.agg(
        sum(Fixed.cents(col("p_retailprice"))).as("sum_cents"),
        count(lit(1)).as("n_parts"))
      part.join(broadcast(stats))
        .filter(Fixed.cents(col("p_retailprice")) * col("n_parts") > col("sum_cents"))
        .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
        .orderBy(col("p_partkey"))
    },

    // B16: rollup; grouping nulls normalized to 'ALL' for stable x-engine order.
    Q("q16_rollup",
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  count(*) AS cnt,
        |  CAST(CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY returnflag, linestatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"),
          Fixed.asDouble(sum(col("l_quantity").cast("long")), 1L).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("cnt"), col("sum_qty"))
        .orderBy(col("returnflag"), col("linestatus"))
    },

    // B17: exact multi-column count distinct (expand + two-phase agg).
    Q("q17_count_distinct",
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy(col("l_returnflag"))
    },

    // B17b: HLL sketch counterpart — not SQL-comparable, rows-only check.
    Q.noOracle("q17b_approx_distinct") { (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"))
        .orderBy(col("l_returnflag"))
    },

    // B18: string functions (all codegen'd builtins, no UDFs).
    Q("q18_string_funcs",
      """SELECT p_partkey,
        |  upper(substr(p_name, 1, 8)) AS name_prefix,
        |  CAST(length(p_name) AS BIGINT) AS name_len,
        |  concat(p_brand, '#', p_type) AS brand_type,
        |  CAST(CASE WHEN p_name LIKE '%a%' THEN 1 ELSE 0 END AS BIGINT) AS has_a
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      t(s, dir, "part").select(
        col("p_partkey"),
        upper(substring(col("p_name"), 1, 8)).as("name_prefix"),
        length(col("p_name")).cast("long").as("name_len"),
        concat(col("p_brand"), lit("#"), col("p_type")).as("brand_type"),
        when(col("p_name").contains("a"), 1L).otherwise(0L).as("has_a"))
        .orderBy(col("p_partkey"))
    },

    // B19: date/time extraction (cast to BIGINT on both engines).
    Q("q19_date_funcs",
      """SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
        |  CAST(extract(month FROM o_orderdate) AS BIGINT) AS o_month,
        |  count(*) AS n_orders,
        |  CAST(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 AS total
        |FROM orders GROUP BY 1, 2
        |ORDER BY o_year, o_month""".stripMargin) { (s, dir) =>
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"),
          month(col("o_orderdate")).cast("long").as("o_month"))
        .agg(count(lit(1)).as("n_orders"),
          Fixed.asDouble(sum(Fixed.cents(col("o_totalprice"))), 100L).as("total"))
        .orderBy(col("o_year"), col("o_month"))
    },

    // B20: time-bucketed event aggregation (batch form of the streaming D1).
    Q("q20_events_window",
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour_bucket,
        |  event_type, count(*) AS n,
        |  CAST(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 AS total_value
        |FROM events GROUP BY 1, 2
        |ORDER BY hour_bucket, event_type""".stripMargin) { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00:00").as("hour_bucket"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          Fixed.asDouble(sum(Fixed.cents(col("value"))), 100L).as("total_value"))
        .orderBy(col("hour_bucket"), col("event_type"))
    },

    // B29: the salted-join skew path, oracle-gated. Salted.join spreads a
    // hot key over `salts` synthetic sub-keys (dim side replicated
    // x salts) so one skewed key can't pin a single reducer — this gate
    // proves the rewrite is RESULT-IDENTICAL to the plain join the oracle
    // runs. 8 salts here; at 100 TB you'd size salts ~ executor count /
    // hot-key share (or lean on AQE skew-join for the non-pathological
    // cases — Salted.join is for keys AQE can't split, e.g. a single
    // null-like sentinel key carrying 30% of a corpus).
    Q("q29_salted_join",
      """SELECT c.c_mktsegment AS segment, CAST(count(*) AS BIGINT) AS n,
        |  CAST(CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS DOUBLE) / 100.0 AS total
        |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val dims = t(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      graft.functions.Salted
        .join(t(s, dir, "orders"), dims, "o_custkey", salts = 8,
          ordinal = Some(col("o_orderkey")))
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n"),
          Fixed.asDouble(sum(Fixed.cents(col("o_totalprice"))), 100L).as("total"))
        .orderBy(col("segment"))
    },

    // B30: arbitrary GROUPING SETS — unlike B16's ROLLUP prefix
    // hierarchy, this mixes a 2-column set, a NON-prefix 1-column set
    // (linestatus alone), and the grand total in ONE Expand+agg pass.
    // Spark exposes grouping sets through SQL only, so this rides the
    // q27-style spark.sql entry point. NULL group markers are coalesced
    // to 'ALL' on both engines (sidesteps cross-engine NULL sort order).
    Q("q30_grouping_sets",
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  count(*) AS cnt,
        |  CAST(CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
        |ORDER BY returnflag, linestatus""".stripMargin) { (s, dir) =>
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(
        """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
          |  coalesce(l_linestatus, 'ALL') AS linestatus,
          |  count(*) AS cnt,
          |  CAST(CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS DOUBLE) AS sum_qty
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
          |ORDER BY returnflag, linestatus""".stripMargin)
    },

    // B31 (r9): VALUE-RANGE window frame — the trailing-30-day per-
    // customer order count/value (RANGE BETWEEN, peer rows by VALUE
    // not position — the frame kind B9's running totals and B8's topN
    // don't exercise; ties on order date must enter the frame
    // together in both engines). Money in integer cents (the round-
    // then-sum discipline) so the trailing sums hash-gate.
    // 100 TB shape: one shuffle on o_custkey; frames are per-customer
    // in-partition scans — no corpus-wide window.
    Q("q31_range_frame",
      """SELECT o_orderkey,
        |  CAST(count(*) OVER w AS BIGINT) AS trail_n,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT) AS trail_cents
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
        |  RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
        // epoch DAYS (unix_date is timezone-free on the NTZ column's
        // date): the timestamps are date-grained, so a [-30, 0]-day
        // range frame is exactly DuckDB's INTERVAL 30 DAYS PRECEDING
        .orderBy(unix_date(col("o_orderdate").cast("date")))
        .rangeBetween(-30L, 0L)
      t(s, dir, "orders").select(col("o_orderkey"),
          count(lit(1)).over(w).as("trail_n"),
          sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).over(w)
            .as("trail_cents"))
        .orderBy(col("o_orderkey"))
    },

    // B32 (r9): CUBE — all 2² grouping combinations in one pass
    // (rollup B16 and explicit sets B30 cover the other shapes);
    // coalesce-to-'ALL' keeps the null totals hashable, q30's
    // discipline.
    Q("q32_cube",
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |  coalesce(o_orderpriority, 'ALL') AS priority,
        |  count(*) AS cnt,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin) { (s, dir) =>
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(
        """SELECT coalesce(o_orderstatus, 'ALL') AS status,
          |  coalesce(o_orderpriority, 'ALL') AS priority,
          |  count(*) AS cnt,
          |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
          |FROM orders
          |GROUP BY CUBE (o_orderstatus, o_orderpriority)
          |ORDER BY status, priority""".stripMargin)
    }
  )
}
