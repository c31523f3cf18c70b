package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each declared operator appears as a `queries` entry; SQL-expressible ones
  * also carry a DuckDB oracle in `oracleSql` with IDENTICAL output column
  * names, a total ORDER BY, and order-independent float aggregation
  * (see [[Det]]) so the driver's hash compare is deterministic.
  */
object SparkEntry {

  /** One declared query: the Spark implementation + optional DuckDB oracle. */
  final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String]
  )

  import graft.operators._

  /** The declared query corpus. Names are stable; the driver iterates them. */
  def all: Seq[Q] = relationalQs ++ Registry.extra

  private def relationalQs: Seq[Q] = Seq(
    Q(
      "q01_pricing_summary",
      Relational.pricingSummary,
      Some("""
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
               CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_disc_price,
               CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_charge,
               SUM(l_quantity) / COUNT(*) AS avg_qty,
               CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*) AS avg_price,
               CAST(SUM(CAST(round(l_discount * 100) AS BIGINT)) AS DOUBLE) / 100.0 / COUNT(*) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1999-01-01'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
      """)
    ),
    Q(
      "q02_top_event_types",
      Relational.topEventTypes,
      Some("""
        SELECT event_type, COUNT(*) AS doc_count
        FROM events
        GROUP BY event_type
        ORDER BY doc_count DESC, event_type
        LIMIT 10
      """)
    ),
    Q(
      "q03_recent_window_daily",
      Relational.recentWindowDailyCounts,
      Some("""
        SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events
        FROM events
        WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 7 DAY
        GROUP BY day
        ORDER BY day
      """)
    ),
    Q(
      "q04_filter_equality",
      Relational.filterEquality,
      Some("""
        SELECT event_id, user_id, value
        FROM events
        WHERE event_type = 'click'
        ORDER BY event_id
      """)
    ),
    Q(
      "q05_sample_first",
      Relational.sampleFirst,
      Some("""
        SELECT event_id, event_type, user_id
        FROM events
        ORDER BY event_id
        LIMIT 1
      """)
    ),
    Q(
      "q10_join_revenue_by_order",
      Relational.revenueByOrder,
      Some("""
        SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date,
               CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY l_orderkey, order_date
        ORDER BY revenue DESC, l_orderkey
        LIMIT 20
      """)
    ),
    Q(
      "q11_join_revenue_by_nation",
      Relational.revenueByNation,
      Some("""
        SELECT r_name, n_name,
               CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name
      """)
    ),
    Q(
      "q12_left_join_customer_stats",
      Relational.customerOrderStats,
      Some("""
        SELECT c_custkey, c_name,
               COUNT(o_orderkey) AS n_orders,
               CAST(SUM(CAST(round(COALESCE(o_totalprice, 0.0) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_spent
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name
        ORDER BY c_custkey
      """)
    ),
    Q(
      "q13_semi_join_orders",
      Relational.semiJoinOrders,
      Some("""
        SELECT o_orderkey, o_orderstatus, CAST(o_orderdate AS DATE) AS order_date
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity >= 45)
        ORDER BY o_orderkey
      """)
    ),
    Q(
      "q14_anti_join_customers",
      Relational.antiJoinCustomers,
      Some("""
        SELECT c_custkey, c_name, c_nationkey
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        ORDER BY c_custkey
      """)
    ),
    Q(
      "q15_full_outer_nation_counts",
      Relational.fullOuterNationCounts,
      Some("""
        SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
               COALESCE(n_cust, 0) AS n_cust,
               COALESCE(n_supp, 0) AS n_supp
        FROM (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) c
        FULL OUTER JOIN (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) s
          ON c.c_nationkey = s.s_nationkey
        ORDER BY nationkey
      """)
    ),
    Q(
      "q16_theta_join_price_band",
      Relational.thetaJoinPriceBand,
      Some("""
        SELECT s_suppkey, p_partkey, p_retailprice
        FROM part JOIN supplier
          ON p_retailprice >= s_acctbal / 4 AND p_retailprice <= s_acctbal / 4 + 50
        ORDER BY s_suppkey, p_partkey
      """)
    ),
    Q(
      "q18_late_priority_count",
      Relational.latePriorityCount,
      Some("""
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
      """)
    ),
    Q(
      "q19_cross_nation_volume",
      Relational.crossNationVolume,
      Some("""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INT) AS yr,
               CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS volume
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
           OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3')
        GROUP BY supp_nation, cust_nation, yr
        ORDER BY supp_nation, cust_nation, yr
      """)
    ),
    Q(
      "q19b_disjunctive_predicates",
      Relational.disjunctivePredicates,
      Some("""
        SELECT CAST(SUM(CAST(round(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000.0 AS revenue,
               COUNT(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 15)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 25)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)
      """)
    ),
    Q(
      "q20_distinct_agg",
      Relational.distinctAgg,
      Some("""
        SELECT l_returnflag,
               COUNT(DISTINCT l_orderkey) AS n_orders,
               COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
      """)
    ),
    // Sketch estimate itself is engine-specific; the declared output is the
    // exact count + a Spark-side tolerance check the oracle replays as true.
    Q(
      "q21_approx_distinct",
      Relational.approxDistinct,
      Some("""
        SELECT l_returnflag,
               COUNT(DISTINCT l_orderkey) AS n_orders_exact,
               true AS within_tolerance
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
      """)
    ),
    Q(
      "q22_rollup_orders",
      Relational.rollupOrders,
      Some("""
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
               COUNT(*) AS n,
               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY g_status, g_priority, status, priority
      """)
    ),
    Q(
      "q23_cube_lineitem",
      Relational.cubeLineitem,
      Some("""
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
               CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
               SUM(l_quantity) AS sum_qty,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY g_rf, g_ls, returnflag, linestatus
      """)
    ),
    Q(
      "q24_window_functions",
      Relational.windowFunctions,
      Some("""
        SELECT l_orderkey, l_linenumber, l_quantity,
               ROW_NUMBER() OVER w AS rn,
               RANK() OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC, l_linenumber) AS qty_rank,
               DENSE_RANK() OVER (PARTITION BY l_orderkey ORDER BY l_quantity DESC) AS qty_dense_rank,
               LAG(l_quantity, 1) OVER w AS prev_qty,
               LEAD(l_quantity, 1) OVER w AS next_qty,
               SUM(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
        FROM lineitem
        WHERE l_orderkey <= 100
        WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber)
        ORDER BY l_orderkey, l_linenumber
      """)
    ),
    Q(
      "q24b_window_extended",
      Relational.windowFunctionsExtended,
      Some("""
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(NTILE(4) OVER w AS INT) AS quartile,
               round(PERCENT_RANK() OVER w, 6) AS pct_rank,
               round(CUME_DIST() OVER w, 6) AS cume,
               FIRST_VALUE(o_orderkey) OVER w AS cheapest_order,
               NTH_VALUE(o_orderkey, 2) OVER w AS second_cheapest
        FROM orders
        WHERE o_custkey <= 50
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
        ORDER BY o_custkey, o_totalprice, o_orderkey
      """)
    ),
    Q(
      "q24c_fuzzy_match",
      Relational.fuzzyNameMatch,
      Some("""
        SELECT a.p_partkey AS id1, b.p_partkey AS id2,
               CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist
        FROM part a JOIN part b ON a.p_partkey < b.p_partkey
        WHERE a.p_partkey <= 100 AND b.p_partkey <= 100
          AND levenshtein(a.p_name, b.p_name) <= 6
        ORDER BY id1, id2
      """)
    ),
    Q(
      "q25_topk_per_group",
      Relational.topOrdersPerCustomer,
      Some("""
        SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rk
          FROM orders) t
        WHERE rk <= 3
        ORDER BY o_custkey, rk
      """)
    ),
    Q(
      "q26_global_topk",
      Relational.globalTopOrders,
      Some("""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
      """)
    ),
    Q(
      "q27_set_ops",
      Relational.setOps,
      Some("""
        WITH c AS (SELECT DISTINCT CAST(c_nationkey AS INT) AS nationkey FROM customer),
             s AS (SELECT DISTINCT CAST(s_nationkey AS INT) AS nationkey FROM supplier)
        SELECT 'union' AS op, nationkey FROM (SELECT nationkey FROM c UNION SELECT nationkey FROM s)
        UNION ALL
        SELECT 'intersect' AS op, nationkey FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s)
        UNION ALL
        SELECT 'except' AS op, nationkey FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)
        ORDER BY op, nationkey
      """)
    )
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.topEventTypes(Session.tune(spark), "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** Headline subset timed by [[Bench]] (driver runs it at sf0.1):
    * the relational core plus one representative per extension pack. */
  def benchQueries: Seq[String] = Seq(
    "q01_pricing_summary",
    "q02_top_event_types",
    "q10_join_revenue_by_order",
    "q11_join_revenue_by_nation",
    "q20_distinct_agg",
    "q23_cube_lineitem",
    "q25_topk_per_group",
    "q26_global_topk",
    "q61_quality_score",
    "q64_exact_dedup",
    "q65_minhash_lsh_pairs",
    "q66_simhash_pairs",
    "q67_ngram_jaccard_pairs",
    "q69_cosine_topk",
    "q71_image_features",
    "q73_session_window",
    "q80_export_pipeline"
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case Q(n, _, Some(sql)) => n -> sql.linesIterator.map(_.trim).mkString(" ").trim }.toMap
}
