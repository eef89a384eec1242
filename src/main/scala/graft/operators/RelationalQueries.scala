package graft.operators

import graft.sources.TpchGraph.table
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator layer: scans → filters → joins → aggregations →
  * windows → sorts, tuned for scale (broadcast the dimensions, let the
  * fact tables shuffle on join keys, keep arithmetic codegen'd).
  * Double aggregates are rounded (2 dp money, 4 dp ratios) so results are
  * stable under partial-aggregation reordering and engine-portable.
  */
object RelationalQueries {

  val all: Seq[Q] = Seq(

    Q("q01_pricing_summary",
      (s, d) => table(s, d, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 2).as("avg_qty"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus"),
      Some("""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity),2) AS sum_qty,
               round(sum(l_extendedprice),2) AS sum_base_price,
               round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
               round(avg(l_quantity),2) AS avg_qty,
               round(avg(l_discount),4) AS avg_disc,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem GROUP BY 1,2 ORDER BY 1,2"""),
      "TPC-H Q1 shape: full-scan hash aggregate with partial+final combine"),

    Q("q02_revenue_by_nation",
      (s, d) => {
        val li = table(s, d, "lineitem")
        val o = table(s, d, "orders").select("o_orderkey", "o_custkey")
        val c = table(s, d, "customer").select("c_custkey", "c_nationkey")
        val n = table(s, d, "nation")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey")) // customer scales with SF — let AQE pick broadcast vs shuffle
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .groupBy("n_name")
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
               count(lit(1)).as("n_items"))
          .orderBy("n_name")
      },
      Some("""
        SELECT n_name,
               round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem JOIN orders ON l_orderkey=o_orderkey
        JOIN customer ON o_custkey=c_custkey
        JOIN nation ON c_nationkey=n_nationkey
        GROUP BY 1 ORDER BY 1"""),
      "TPC-H Q5 shape: fact-fact shuffle join + broadcast dimension joins"),

    Q("q03_top_orders",
      (s, d) => table(s, d, "lineitem")
        .groupBy("l_orderkey")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10),
      Some("""
        SELECT l_orderkey, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        FROM lineitem GROUP BY 1
        ORDER BY revenue DESC, l_orderkey LIMIT 10"""),
      "TPC-H Q3 shape: aggregate + TakeOrderedAndProject top-k (no full sort)"),

    Q("q04_order_priority",
      (s, d) => {
        val o = table(s, d, "orders")
        val li = table(s, d, "lineitem").select("l_orderkey", "l_shipdate")
        o.join(li, col("o_orderkey") === col("l_orderkey") &&
                   col("l_shipdate") > col("o_orderdate"), "left_semi")
          .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
          .orderBy("o_orderpriority")
      },
      Some("""
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
        FROM orders
        WHERE EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey=o_orderkey AND l_shipdate > o_orderdate)
        GROUP BY 1 ORDER BY 1"""),
      "TPC-H Q4 shape: conditional existence semi-join"),

    Q("q05_forecast_revenue",
      (s, d) => table(s, d, "lineitem")
        .filter(col("l_discount").between(0.05, 0.07) &&
                col("l_quantity") < 24 &&
                year(col("l_shipdate")) === 1996)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
             count(lit(1)).as("n")),
      Some("""
        SELECT round(sum(l_extendedprice*l_discount),2) AS revenue,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem
        WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
          AND year(l_shipdate) = 1996"""),
      "TPC-H Q6 shape: predicate-pushdown scan + scalar aggregate"),

    Q("q06_rank_window",
      (s, d) => {
        val o = table(s, d, "orders").filter(col("o_custkey") < 50)
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        o.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("o_custkey", "o_orderkey", "rn")
          .orderBy("o_custkey", "rn")
      },
      Some("""
        SELECT o_custkey, o_orderkey, CAST(rn AS INT) AS rn FROM (
          SELECT o_custkey, o_orderkey,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders WHERE o_custkey < 50)
        WHERE rn <= 3 ORDER BY o_custkey, rn"""),
      "§2.5 — ranking window (top-3 orders per customer)"),

    Q("q07_running_sum",
      (s, d) => {
        val li = table(s, d, "lineitem").filter(col("l_suppkey") < 20)
        val w = Window.partitionBy(col("l_suppkey"))
          .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        li.withColumn("running_qty", round(sum(col("l_quantity")).over(w), 2))
          .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("running_qty"))
          .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
      },
      Some("""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               round(sum(l_quantity) OVER (PARTITION BY l_suppkey
                 ORDER BY l_shipdate, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS running_qty
        FROM lineitem WHERE l_suppkey < 20
        ORDER BY l_suppkey, l_orderkey, l_linenumber"""),
      "§2.5 — running aggregate over an explicit row frame"),

    Q("q08_events_hourly",
      (s, d) => table(s, d, "events")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
                col("event_type"), col("n"), col("sum_value"))
        .orderBy("hour_start", "event_type"),
      Some("""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
               event_type, CAST(count(*) AS BIGINT) AS n,
               round(sum(value),2) AS sum_value
        FROM events GROUP BY 1,2 ORDER BY 1,2"""),
      "tumbling-window aggregation over the event table (batch form of the streaming op)"),

    Q("q09_events_json",
      (s, d) => table(s, d, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy("event_type")
        .agg(round(avg(col("k")), 4).as("avg_k"), count(lit(1)).as("n"))
        .orderBy("event_type"),
      Some("""
        SELECT event_type,
               round(avg(CAST(json_extract_string(props, '$.k') AS INT)),4) AS avg_k,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1 ORDER BY 1"""),
      "F13 — JSON payload projection + aggregate"),

    Q("q11_customers_without_orders",
      (s, d) => {
        val c = table(s, d, "customer")
        val o = table(s, d, "orders").select("o_custkey")
        c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name", "c_mktsegment")
          .orderBy("c_custkey")
      },
      Some("""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        ORDER BY c_custkey"""),
      "anti-join (NOT EXISTS) — left_anti physical plan"),

    Q("q12_parts_above_brand_avg",
      (s, d) => {
        val p = table(s, d, "part")
        // threshold on the ROUNDED average: raw double averages are
        // accumulation-order-dependent, so a part sitting at the exact
        // 1.2x boundary could flip membership between engines
        val brandAvg = p.groupBy(col("p_brand").as("b"))
          .agg(round(avg(col("p_retailprice")), 4).as("brand_avg"))
        p.join(broadcast(brandAvg), col("p_brand") === col("b"))
          .filter(col("p_retailprice") > col("brand_avg") * 1.2)
          .groupBy("p_brand")
          .agg(count(lit(1)).as("n"), round(max(col("p_retailprice")), 2).as("max_price"))
          .orderBy("p_brand")
      },
      Some("""
        SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
               round(max(p_retailprice), 2) AS max_price
        FROM part p1
        WHERE p_retailprice > 1.2 * (SELECT round(avg(p_retailprice), 4) FROM part p2
                                     WHERE p2.p_brand = p1.p_brand)
        GROUP BY 1 ORDER BY 1"""),
      "correlated scalar subquery — decorrelated to aggregate + broadcast join"),

    Q("q13_rollup_revenue",
      (s, d) => {
        val o = table(s, d, "orders")
        val c = table(s, d, "customer").select("c_custkey", "c_nationkey")
        val n = table(s, d, "nation")
        val r = table(s, d, "region")
        o.join(c, col("o_custkey") === col("c_custkey")) // customer scales with SF — let AQE pick broadcast vs shuffle
          .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .select("r_name", "n_name", "o_totalprice")
          .createOrReplaceTempView("graft_rollup_src")
        s.sql("""
          SELECT r_name, n_name, round(sum(o_totalprice), 2) AS total,
                 count(*) AS n
          FROM graft_rollup_src
          GROUP BY ROLLUP (r_name, n_name)
          ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""")
      },
      Some("""
        SELECT r_name, n_name, round(sum(o_totalprice),2) AS total,
               CAST(count(*) AS BIGINT) AS n
        FROM orders JOIN customer ON o_custkey=c_custkey
        JOIN nation ON c_nationkey=n_nationkey
        JOIN region ON n_regionkey=r_regionkey
        GROUP BY ROLLUP (r_name, n_name)
        ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST"""),
      "rollup hierarchy aggregation (region → nation → grand total)"),

    Q("q14_distinct_counts",
      (s, d) => table(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag"),
      Some("""
        SELECT l_returnflag,
               CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM lineitem GROUP BY 1 ORDER BY 1"""),
      "multi-distinct aggregation (expand + two-phase aggregate)"),

    Q("q15_topk_custom_operator",
      (s, d) => graft.plans.TopKPerGroup.topK(
          table(s, d, "orders").filter(col("o_custkey") < 200),
          Seq(col("o_custkey")),
          struct(col("o_totalprice"), -col("o_orderkey")), k = 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .orderBy("o_custkey", "o_orderkey"),
      Some("""
        SELECT o_custkey, o_orderkey, o_totalprice FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders WHERE o_custkey < 200)
        WHERE rn <= 3 ORDER BY o_custkey, o_orderkey"""),
      "custom LogicalPlan+Strategy+Exec: two-phase grouped top-k via bounded heaps (no sort, no window)"),

    Q("q10_top_suppliers",
      (s, d) => {
        val sup = table(s, d, "supplier")
        val n = table(s, d, "nation")
        sup.join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_name"), col("n_name"), col("s_acctbal"))
          .orderBy(col("s_acctbal").desc, col("s_name"))
          .limit(10)
      },
      Some("""
        SELECT s_name, n_name, s_acctbal
        FROM supplier JOIN nation ON s_nationkey=n_nationkey
        ORDER BY s_acctbal DESC, s_name LIMIT 10"""),
      "O1-O3 — broadcast dim join + top-k sort/limit"),

    Q("q16_volume_shipping",
      (s, d) => {
        val li = table(s, d, "lineitem")
        val o = table(s, d, "orders").select("o_orderkey", "o_custkey")
        val c = table(s, d, "customer").select("c_custkey", "c_nationkey")
        val sup = table(s, d, "supplier").select("s_suppkey", "s_nationkey")
        val n = table(s, d, "nation")
        val n1 = n.select(col("n_nationkey").as("ck"), col("n_name").as("cust_nation"))
        val n2 = n.select(col("n_nationkey").as("sk"), col("n_name").as("supp_nation"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey")) // customer scales with SF — let AQE pick broadcast vs shuffle
          .join(broadcast(n1), col("c_nationkey") === col("ck"))
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(n2), col("s_nationkey") === col("sk"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("l_year"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
          .orderBy(col("revenue").desc, col("supp_nation"), col("cust_nation"), col("l_year"))
          .limit(20)
      },
      Some("""
        SELECT supp_nation, cust_nation, l_year, revenue FROM (
          SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
                 CAST(year(l_shipdate) AS INT) AS l_year,
                 round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE n1.n_name <> n2.n_name
          GROUP BY 1, 2, 3)
        ORDER BY revenue DESC, supp_nation, cust_nation, l_year LIMIT 20"""),
      "TPC-H Q7 shape: nation-pair trade volume — two fact joins + 4 broadcast dims, " +
        "grouped by derived year, total-order top-20"),

    Q("q17_potential_promotion",
      (s, d) => {
        val li = table(s, d, "lineitem")
        val parts = table(s, d, "part")
          .filter(col("p_name").startsWith("c")).select("p_partkey")
        val active = li.join(broadcast(parts), col("l_partkey") === col("p_partkey"))
          .groupBy("l_suppkey").agg(count(lit(1)).as("c"))
          .filter(col("c") > 80)
          .select("l_suppkey")
        table(s, d, "supplier")
          .join(active, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select("s_name", "s_acctbal")
          .orderBy("s_name")
      },
      Some("""
        SELECT s_name, s_acctbal FROM supplier
        WHERE s_suppkey IN (
          SELECT l_suppkey FROM lineitem
          WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'c%')
          GROUP BY l_suppkey HAVING count(*) > 80)
        ORDER BY s_name"""),
      "TPC-H Q20 shape: nested IN subqueries -> broadcast semi-joins with a grouped " +
        "HAVING threshold in the inner query"),

    Q("q18_large_orders",
      (s, d) => {
        val li = table(s, d, "lineitem")
        // grouped-HAVING first: the aggregate collapses lineitem to
        // per-order totals BEFORE any join (partial map-side combine on
        // l_orderkey), and the > 300 filter cuts that to a sliver — the
        // joins then run on the sliver, never on raw lineitem
        val big = li.groupBy("l_orderkey")
          .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
          .filter(col("total_qty") > 300)
        table(s, d, "orders")
          .join(big, col("o_orderkey") === col("l_orderkey"))
          .join(table(s, d, "customer"), col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate").cast("string").as("o_orderdate"),
            col("o_totalprice"), col("total_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100)
      },
      Some("""
        SELECT c_name, c_custkey, o_orderkey,
               CAST(o_orderdate AS VARCHAR) AS o_orderdate,
               o_totalprice, total_qty
        FROM (SELECT l_orderkey, round(sum(l_quantity),2) AS total_qty
              FROM lineitem GROUP BY 1 HAVING round(sum(l_quantity),2) > 300) big
        JOIN orders ON o_orderkey = big.l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""),
      "TPC-H Q18 shape: large-volume orders — aggregate-then-join (the HAVING " +
        "sliver drives the joins, raw lineitem never reaches a join), total-order " +
        "top-100"),

    Q("q19_disjunctive_revenue",
      (s, d) => {
        // classic Q19 rewrite: the part-side half of each disjunct
        // (brand + size) pre-filters the dimension so the join input is
        // tiny and broadcast-able; the coupled (brand, quantity) predicate
        // then applies on the joined rows. Filters push to both scans.
        val p = table(s, d, "part")
          .filter((col("p_brand") === "Brand#12" && col("p_size").between(1, 5)) ||
                  (col("p_brand") === "Brand#23" && col("p_size").between(1, 10)) ||
                  (col("p_brand") === "Brand#34" && col("p_size").between(1, 15)))
          .select("p_partkey", "p_brand")
        table(s, d, "lineitem")
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .filter((col("p_brand") === "Brand#12" && col("l_quantity").between(1, 11)) ||
                  (col("p_brand") === "Brand#23" && col("l_quantity").between(10, 20)) ||
                  (col("p_brand") === "Brand#34" && col("l_quantity").between(20, 30)))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
      },
      Some("""
        SELECT round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)"""),
      "TPC-H Q19 shape: OR-of-ANDs disjunctive predicate — part-side disjunct " +
        "halves pre-filter the dimension into a broadcast, the coupled " +
        "(brand, quantity) terms apply post-join; no disjunction ever blocks " +
        "pushdown on the fact scan"),

    Q("q20_waiting_suppliers",
      (s, d) => {
        // TPC-H Q21 shape (sole late shipper): suppliers whose lineitem
        // shipped late (> 60 days after the order date) on orders where
        // ANOTHER supplier also shipped (EXISTS) but NO other supplier
        // was late (NOT EXISTS). The double-correlated subquery pair
        // compiles to one semi + one anti join over deduped (order,
        // supplier) pairs — both on the order key with a supplier
        // inequality, so the fact table shuffles once into compact pairs
        // and the quantifiers never rescan it.
        val li = graft.sources.TpchGraph.lineitemDeduped(s, d)
          .select("l_orderkey", "l_suppkey", "l_shipdate")
        val o = table(s, d, "orders").select("o_orderkey", "o_orderdate")
        val l = li.join(o, col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
            (col("l_shipdate") > col("o_orderdate") + expr("interval 60 days"))
              .as("late"))
        val pairs = l.select("ok", "sk").distinct()
        val latePairs = l.filter(col("late")).select("ok", "sk").distinct()
        val withOther = latePairs.as("w").join(pairs.as("p"),
          col("w.ok") === col("p.ok") && col("w.sk") =!= col("p.sk"), "left_semi")
          .select(col("ok"), col("sk")).as("w2")
        val sole = withOther.join(latePairs.as("q"),
          col("w2.ok") === col("q.ok") && col("w2.sk") =!= col("q.sk"), "left_anti")
        sole.join(broadcast(table(s, d, "supplier")
            .select("s_suppkey", "s_name")), col("sk") === col("s_suppkey"))
          .groupBy("s_name").agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(10)
      },
      Some(s"""
        WITH l AS (
          SELECT l_orderkey AS ok, l_suppkey AS sk,
                 l_shipdate > o_orderdate + INTERVAL 60 DAY AS late
          FROM ${graft.sources.TpchGraph.lineitemDedupSql} li
          JOIN orders ON l_orderkey = o_orderkey),
        pairs AS (SELECT DISTINCT ok, sk FROM l),
        latep AS (SELECT DISTINCT ok, sk FROM l WHERE late),
        sole AS (
          SELECT * FROM latep w
          WHERE EXISTS (SELECT 1 FROM pairs p
                        WHERE p.ok = w.ok AND p.sk <> w.sk)
            AND NOT EXISTS (SELECT 1 FROM latep q
                            WHERE q.ok = w.ok AND q.sk <> w.sk))
        SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM sole JOIN supplier ON sk = s_suppkey
        GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 10"""),
      "TPC-H Q21 shape: the sole-late-shipper double-quantifier (EXISTS " +
        "another supplier, NOT EXISTS another LATE supplier) compiled to " +
        "one semi + one anti join over deduped (order, supplier) pairs — " +
        "the fact table shuffles once into compact pairs and the " +
        "quantifiers never rescan it; supplier dim broadcasts, top-10 is " +
        "TakeOrdered"),

    Q("q21_sales_opportunity",
      (s, d) => {
        // TPC-H Q22 shape (global sales opportunity), adapted to this
        // schema (nation keys stand in for phone country codes):
        // customers from a fixed country set with above-average positive
        // balance and NO orders. Money in integer CENTS throughout —
        // the avg threshold is exact integer arithmetic, so the
        // above-average cut has no cross-engine float knife edge.
        val cust = table(s, d, "customer")
          .filter(col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
          .select(col("c_custkey"), col("c_nationkey"),
            expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("cents"))
        val avgBal = cust.filter(col("cents") > 0)
          .agg(expr("sum(cents) div count(1)").as("avg_cents"))
        val noOrders = cust.join(
          table(s, d, "orders").select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        noOrders.crossJoin(broadcast(avgBal))
          .filter(col("cents") > col("avg_cents"))
          .groupBy("c_nationkey")
          .agg(count(lit(1)).as("numcust"),
            (sum(col("cents")) / 100.0).as("totacctbal"))
          .orderBy("c_nationkey")
      },
      Some("""
        WITH cust AS (
          SELECT c_custkey, c_nationkey,
                 CAST(round(c_acctbal * 100) AS BIGINT) AS cents
          FROM customer WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)),
        a AS (SELECT sum(cents) // count(*) AS avg_cents
              FROM cust WHERE cents > 0)
        SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
               CAST(sum(cents) AS BIGINT) / 100.0 AS totacctbal
        FROM cust, a
        WHERE cents > avg_cents
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = cust.c_custkey)
        GROUP BY 1 ORDER BY 1"""),
      "TPC-H Q22 shape: above-average-balance customers with no orders, " +
        "by country — a scalar aggregate broadcast against the dimension " +
        "(one-row crossJoin, never a shuffle), an anti join against the " +
        "fact table's custkeys, and a k-row aggregate. Money is integer " +
        "cents end-to-end so the average threshold is exact and the " +
        "above-average cut cannot drift between engines")
  )
}
