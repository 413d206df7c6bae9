package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables
import graft.core.LogSchema
import graft.core.{NormCondition, NormalizedField}
import graft.core.FieldType._
import graft.classify.Classifier
import graft.classify.{ArtifactExtractor, Normalizer, Sanitizer}
import graft.rules._
import graft.alerts.{AlertMerger, MergeInputAlert, Publishers}
import graft.sources.Sources
import graft.history.{HistoricalSink, RulePromotion, ScheduledQueries}
import graft.pipeline.{Dedup, Eval, Multimodal, Preference, Similarity, Sketches, TextAnalysis}

/** SQL surface (SURVEY §2.5): aggregation, joins, windows, rollup/cube,
  * set ops, pivot, percentiles, sessionization, as-of/range joins,
  * graph and warehouse rows expressed over the TPC-H-ish tables. */
private[graft] trait SqlQueries extends RegistryBase {


  // ---------------------------------------------------------------------------
  // SQL surface (SURVEY §2.5) — scheduled-query style aggregation
  // ---------------------------------------------------------------------------

  // TPC-H Q1 shape: the canonical historical-store aggregation
  // (reference delegates these to Athena; we are the engine).
  //
  // Money math is done in exact integer cents — floor(x*100 + 0.5) is
  // bit-identical IEEE arithmetic in Spark and DuckDB, unlike double→DECIMAL
  // casts whose rounding mode differs across engines/versions. DuckDB integer
  // sums are CAST to BIGINT because HUGEINT surfaces as float64 in pandas.
  register(
    "q1_agg",
    """SELECT l_returnflag, l_linestatus,
      |       CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS sum_qty,
      |       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS sum_base_price,
      |       count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        (sum(floor(col("l_quantity") * 100 + 0.5)) / 100.0).as("sum_qty"),
        (sum(floor(col("l_extendedprice") * 100 + 0.5)) / 100.0).as("sum_base_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }


  // ---------------------------------------------------------------------------
  // SQL surface (SURVEY §2.5), continued: every construct the reference's
  // scheduled queries / rule promotion actually use, plus the join/window/
  // set-op machinery "full parity = whatever Spark SQL supports" implies.
  // ---------------------------------------------------------------------------

  // json_extract + string fns + NOT IN (sample/athena.py:27,46).
  register(
    "q2_json_string_fns",
    """SELECT event_id,
      |       upper(substr(event_type, 1, 3)) AS etype3,
      |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |FROM events
      |WHERE event_type NOT IN ('signup', 'login')
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .where(!col("event_type").isin("signup", "login"))
      .select(
        col("event_id"),
        upper(substring(col("event_type"), 1, 3)).as("etype3"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy("event_id")
  }


  // TPC-H Q3 shape: 3-way join + aggregation + top-N.
  register(
    "q3_join_topn",
    """SELECT o.o_orderkey,
      |       CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
      |                * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))) AS BIGINT) / 10000.0 AS revenue
      |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |WHERE c.c_mktsegment = 'BUILDING'
      |GROUP BY o.o_orderkey
      |ORDER BY revenue DESC, o.o_orderkey LIMIT 10""".stripMargin) { (s, dir) =>
    val c = t(s, dir, "customer").where(col("c_mktsegment") === "BUILDING")
    val o = t(s, dir, "orders")
    val l = t(s, dir, "lineitem")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy("o_orderkey")
      .agg((sum(floor(col("l_extendedprice") * 100 + 0.5) *
        (lit(100) - floor(col("l_discount") * 100 + 0.5))) / 10000.0).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey")).limit(10)
  }


  // TPC-H Q5 shape: 5-way join through the region/nation dimension chain.
  register(
    "q5_multi_join",
    """SELECT n.n_name AS nation, count(*) AS n_items,
      |       CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS total
      |FROM lineitem l
      |JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE r.r_name = 'REGION_0'
      |GROUP BY n.n_name ORDER BY nation""".stripMargin) { (s, dir) =>
    val l = t(s, dir, "lineitem")
    val sup = t(s, dir, "supplier")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region").where(col("r_name") === "REGION_0")
    l.join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_items"),
        (sum(floor(col("l_extendedprice") * 100 + 0.5)) / 100.0).as("total"))
      .orderBy("nation")
  }


  // TPC-H Q6 shape: selective filter + single aggregate (predicate pushdown
  // reaches the parquet scan).
  register(
    "q6_filter_agg",
    """SELECT CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
      |                * CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT) / 10000.0 AS revenue
      |FROM lineitem
      |WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .where(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg((sum(floor(col("l_extendedprice") * 100 + 0.5) *
        floor(col("l_discount") * 100 + 0.5)) / 10000.0).as("revenue"))
  }


  // Window functions: top-2 orders per customer (row_number, partitioned).
  register(
    "q7_window_topk",
    """SELECT * FROM (
      |  SELECT o_custkey, o_orderkey,
      |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) / 100.0 AS price,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) WHERE rn <= 2 ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        (floor(col("o_totalprice") * 100 + 0.5) / 100.0).as("price"),
        row_number().over(w).cast("long").as("rn"))
      .where(col("rn") <= 2)
      .orderBy("o_custkey", "rn")
  }


  // SELECT DISTINCT (athena/helpers.py:136-151 dedup of result values).
  register(
    "q8_distinct",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY 1, 2") { (s, dir) =>
    t(s, dir, "lineitem").select("l_returnflag", "l_linestatus")
      .distinct().orderBy("l_returnflag", "l_linestatus")
  }


  // EXISTS / left-semi join.
  register(
    "q9_exists_semi",
    """SELECT o_orderkey FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val big = t(s, dir, "lineitem").where(col("l_quantity") >= 49)
      .select(col("l_orderkey").as("o_orderkey"))
    t(s, dir, "orders").join(big, Seq("o_orderkey"), "left_semi")
      .select("o_orderkey").orderBy("o_orderkey")
  }


  // ROLLUP grouping sets via spark.sql (the raw-SQL execution surface).
  register(
    "q10_rollup",
    """SELECT l_returnflag, l_linestatus,
      |       CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS qty
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |       sum(floor(l_quantity * 100 + 0.5)) / CAST(100 AS DOUBLE) AS qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
  }


  // Rolling 3-month distinct customers from the HLL sketch store — the
  // dashboard staple ("distinct entities, trailing window") that exact
  // distinct cannot serve incrementally: per-month sketches merge across
  // the window (months-cardinality join + hll_union_agg), so the rolling
  // series costs O(months × sketch) regardless of order volume. Pinned
  // q25-style: every window's estimate within the 3σ standard-error
  // envelope of the exact count, which DuckDB recomputes.
  register(
    "q48_rolling_distinct",
    """WITH mc AS (
      |  SELECT DISTINCT epoch_us(o_orderdate) // 86400000000 // 30 AS m,
      |                  o_custkey
      |  FROM orders),
      |months AS (SELECT DISTINCT m FROM mc)
      |SELECT w.m,
      |       CAST(count(DISTINCT mc.o_custkey) AS BIGINT) AS exact_custs,
      |       TRUE AS within_eps
      |FROM months w JOIN mc ON mc.m BETWEEN w.m - 2 AND w.m
      |GROUP BY w.m ORDER BY w.m""".stripMargin) { (s, dir) =>
    val o = t(s, dir, "orders")
      .select(expr(
        "unix_micros(cast(o_orderdate as timestamp)) div 86400000000 div 30")
        .as("m"), col("o_custkey"))
    val sketches = o.groupBy("m")
      .agg(hll_sketch_agg(col("o_custkey"), 12).as("hll"))
    val months = sketches.select(col("m").as("w"))
    val rolled = months
      .join(sketches, col("m").between(col("w") - 2, col("w")))
      .groupBy(col("w").as("m"))
      .agg(hll_sketch_estimate(hll_union_agg(col("hll"))).as("__est"))
    val exact = months
      .join(o.dropDuplicates("m", "o_custkey"),
        col("m").between(col("w") - 2, col("w")))
      .groupBy(col("w"))
      .agg(count_distinct(col("o_custkey")).as("exact_custs"))
      .withColumnRenamed("w", "m")
    exact.join(rolled, "m")
      .select(col("m"), col("exact_custs"),
        (abs(col("__est").cast("double") - col("exact_custs")) <=
          lit(3 * 1.04 / math.sqrt(1 << 12)) * col("exact_custs"))
          .as("within_eps"))
      .orderBy("m")
  }


  // Largest-remainder proration: distribute each order's total price
  // across its line items proportionally to quantity, in EXACT integer
  // cents — floor shares first, then the remainder cents go to the
  // largest fractional parts (linenumber tie-break), so every order's
  // allocations sum EXACTLY to its total (the billing/quota-allocation
  // staple; same machinery allocates sampling quotas). Two windows over
  // the per-order partition; allocation correctness is pinned by the
  // alloc_sum_ok column the oracle constant-folds TRUE.
  register(
    "q47_proration",
    """WITH li AS (
      |  SELECT l_orderkey, l_linenumber,
      |         CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS q
      |  FROM lineitem),
      |o AS (SELECT o_orderkey,
      |             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS total
      |      FROM orders),
      |base AS (
      |  SELECT li.l_orderkey, li.l_linenumber, li.q, o.total,
      |         sum(li.q) OVER (PARTITION BY li.l_orderkey) AS qsum
      |  FROM li JOIN o ON li.l_orderkey = o.o_orderkey),
      |shares AS (
      |  SELECT *, (total * q) // qsum AS fl,
      |         (total * q) % qsum AS frac
      |  FROM base),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY l_orderkey
      |           ORDER BY frac DESC, l_linenumber ASC) AS rk,
      |         total - sum(fl) OVER (PARTITION BY l_orderkey) AS rem
      |  FROM shares)
      |SELECT l_orderkey, l_linenumber,
      |       CAST(fl + CASE WHEN rk <= rem THEN 1 ELSE 0 END AS BIGINT)
      |         AS alloc_cents,
      |       CAST(sum(fl + CASE WHEN rk <= rem THEN 1 ELSE 0 END)
      |            OVER (PARTITION BY l_orderkey) AS BIGINT) = max(total)
      |            OVER (PARTITION BY l_orderkey) AS alloc_sum_ok
      |FROM ranked ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val wO = Window.partitionBy("l_orderkey")
    val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
      floor(col("l_quantity") * 100 + 0.5).cast("long").as("q"))
    val o = t(s, dir, "orders").select(col("o_orderkey"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("total"))
    val base = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("qsum", sum(col("q")).over(wO))
    val shares = base
      .withColumn("fl", expr("(total * q) div qsum"))
      .withColumn("frac", (col("total") * col("q")) % col("qsum"))
    val ranked = shares
      .withColumn("rk", row_number().over(
        wO.orderBy(col("frac").desc, col("l_linenumber").asc)))
      .withColumn("rem", col("total") - sum(col("fl")).over(wO))
      .withColumn("alloc_cents",
        col("fl") + when(col("rk") <= col("rem"), 1L).otherwise(0L))
    ranked
      .withColumn("alloc_sum_ok",
        sum(col("alloc_cents")).over(wO) === max(col("total")).over(wO))
      .select("l_orderkey", "l_linenumber", "alloc_cents", "alloc_sum_ok")
      .orderBy("l_orderkey", "l_linenumber")
  }


  // Sweep-line interval occupancy: how many orders are "active" (within
  // 7 days of placement) at each change point — the scalable alternative
  // to an interval self-join (which explodes quadratically on overlap):
  // each interval becomes a +1/-1 delta event, one pre-combined agg per
  // day, one running sum over the DAY-cardinality change points. At
  // corpus scale the running sum partitions by coarse time shard with a
  // carried-in prefix (the t15 sequence-packing shard pattern).
  register(
    "q46_sweepline_occupancy",
    """WITH d AS (
      |  SELECT epoch_us(o_orderdate) // 86400000000 AS day, 1 AS delta
      |  FROM orders
      |  UNION ALL
      |  SELECT epoch_us(o_orderdate) // 86400000000 + 7, -1 FROM orders),
      |g AS (SELECT day, sum(delta) AS delta FROM d GROUP BY day)
      |SELECT day, CAST(sum(delta) OVER (ORDER BY day) AS BIGINT)
      |         AS active_orders
      |FROM g ORDER BY day""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val day = expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
    val o = t(s, dir, "orders")
    val deltas = o.select(day.as("day"), lit(1L).as("delta"))
      .unionAll(o.select((day + 7).as("day"), lit(-1L).as("delta")))
      .groupBy("day").agg(sum(col("delta")).as("delta"))
    deltas
      .withColumn("active_orders", sum(col("delta")).over(
        Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)))
      .select("day", "active_orders")
      .orderBy("day")
  }


  // Capped running balance per customer — the classic NON-LINEAR window
  // recursion plain SQL window functions cannot express (balance floors
  // at zero after every order: b_t = max(0, b_{t-1} + delta_t)). The
  // ordered-fold pattern solves it deterministically: both engines fold
  // the same (day, orderkey)-sorted integer delta list left-to-right,
  // zero-seeded (DuckDB's first-element-seeded list_reduce gets an
  // explicit prepended 0 to match Spark's aggregate init). Per-entity
  // lists are order-count bounded.
  register(
    "q45_capped_balance",
    """WITH o AS (
      |  SELECT o_custkey AS k,
      |         epoch_us(o_orderdate) // 86400000000 AS d, o_orderkey,
      |         CASE WHEN o_orderkey % 2 = 0
      |              THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
      |              ELSE -CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
      |         END AS delta
      |  FROM orders),
      |s AS (SELECT k, list(delta ORDER BY d, o_orderkey) AS arr
      |      FROM o GROUP BY k)
      |SELECT k AS o_custkey, CAST(len(arr) AS BIGINT) AS n_orders,
      |       CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), arr),
      |            (acc, x) -> greatest(CAST(0 AS BIGINT), acc + x))
      |         AS BIGINT) AS balance_cents
      |FROM s ORDER BY o_custkey""".stripMargin) { (s, dir) =>
    val cents = floor(col("o_totalprice") * 100 + 0.5).cast("long")
    t(s, dir, "orders")
      .select(col("o_custkey").as("k"),
        expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
          .as("d"),
        col("o_orderkey"),
        when(col("o_orderkey") % 2 === 0, cents).otherwise(-cents).as("delta"))
      .groupBy("k")
      .agg(array_sort(collect_list(
        struct(col("d"), col("o_orderkey"), col("delta")))).as("arr"))
      .select(col("k").as("o_custkey"),
        size(col("arr")).cast("long").as("n_orders"),
        aggregate(col("arr"), lit(0L),
          (acc, x) => greatest(lit(0L), acc + x.getField("delta")))
          .as("balance_cents"))
      .orderBy("o_custkey")
  }


  // Robust statistics: median absolute deviation per group — the
  // outlier-resistant scale estimate (1.4826·MAD ≈ σ under normality)
  // as two chained exact-percentile passes with the median riding a
  // group-cardinality broadcast join. Exact percentile buffers each
  // group's values, so THIS row is the verify-harness face; at corpus
  // scale the same statistic reads from the q36 histogram store within
  // one bin width.
  register(
    "q44_mad_robust",
    """WITH base AS (
      |  SELECT l_returnflag,
      |         CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS c
      |  FROM lineitem),
      |med AS (SELECT l_returnflag, quantile_cont(c, 0.5) AS med
      |        FROM base GROUP BY 1)
      |SELECT m.l_returnflag,
      |       round(m.med / 100.0, 6) AS median_qty,
      |       round(quantile_cont(abs(CAST(b.c AS DOUBLE) - m.med), 0.5)
      |             / 100.0, 6) AS mad_qty
      |FROM base b JOIN med m ON b.l_returnflag = m.l_returnflag
      |GROUP BY m.l_returnflag, m.med
      |ORDER BY m.l_returnflag""".stripMargin) { (s, dir) =>
    val base = t(s, dir, "lineitem").select(col("l_returnflag"),
      floor(col("l_quantity") * 100 + 0.5).cast("long").as("c"))
    val med = base.groupBy("l_returnflag")
      .agg(expr("percentile(c, 0.5)").as("med"))
    base.join(broadcast(med), "l_returnflag")
      .groupBy(col("l_returnflag"), col("med"))
      .agg(round(expr("percentile(abs(cast(c as double) - med), 0.5)")
        / 100.0, 6).as("mad_qty"))
      .select(col("l_returnflag"), round(col("med") / 100.0, 6).as("median_qty"),
        col("mad_qty"))
      .orderBy("l_returnflag")
  }


  // EWMA per event-type hourly series (the alerting baseline metric):
  // s_1 = x_1, s_t = 0.7·s_{t-1} + 0.3·x_t over hour-ordered exact
  // integer sums. Order-dependent recursion made engine-identical by the
  // ordered-fold pattern: Spark's aggregate() and DuckDB's list_reduce()
  // are both left folds seeded with the first element, applied to the
  // same hour-sorted list of identical doubles.
  register(
    "q43_ewma",
    """WITH hourly AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
      |         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
      |  FROM events GROUP BY 1, 2),
      |series AS (
      |  SELECT event_type, list(CAST(cents AS DOUBLE) ORDER BY h) AS arr
      |  FROM hourly GROUP BY event_type)
      |SELECT event_type, CAST(len(arr) AS BIGINT) AS n_hours,
      |       round(list_reduce(arr, (acc, x) -> acc * 0.7 + x * 0.3), 6)
      |         AS ewma
      |FROM series ORDER BY event_type""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .groupBy(col("event_type"), expr("unix_micros(ts) div 3600000000").as("h"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
      .groupBy("event_type")
      .agg(array_sort(collect_list(struct(col("h"), col("cents")))).as("arr"))
      .select(col("event_type"),
        size(col("arr")).cast("long").as("n_hours"),
        round(aggregate(
          expr("slice(arr, 2, size(arr) - 1)"),
          element_at(col("arr"), 1).getField("cents").cast("double"),
          (acc, x) => acc * 0.7 + x.getField("cents").cast("double") * 0.3),
          6).as("ewma"))
      .orderBy("event_type")
  }


  // Hopping (sliding) window aggregation — the overlapping-window face
  // of q11's tumbling buckets: a 2-hour window sliding hourly, so every
  // event lands in exactly two windows (Spark's window() generator; the
  // oracle derives the same two epoch-anchored hop starts by integer
  // hour arithmetic).
  register(
    "q42_hopping_window",
    """SELECT make_timestamp((h - k) * 3600000000) AS window_start,
      |       event_type, CAST(count(*) AS BIGINT) AS n
      |FROM (SELECT epoch_us(ts) // 3600000000 AS h, event_type FROM events),
      |     (VALUES (0), (1)) t(k)
      |GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .groupBy(window(col("ts"), "2 hours", "1 hour").getField("start")
        .as("window_start"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("window_start", "event_type")
  }


  // Full CUBE with grouping() provenance — completes the grouping-sets
  // family next to q10's ROLLUP: all four (flag, status) slice
  // combinations in one pass, gid disambiguating which NULLs mean
  // "aggregated over" (grouping(col), not data NULLs).
  register(
    "q41_cube",
    """SELECT l_returnflag, l_linestatus,
      |       CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
      |            AS BIGINT) AS gid,
      |       CAST(count(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""
      .stripMargin) { (s, dir) =>
    t(s, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg((grouping(col("l_returnflag")) * 2 +
        grouping(col("l_linestatus"))).cast("long").as("gid"),
        count(lit(1)).as("n"))
      .select("l_returnflag", "l_linestatus", "gid", "n")
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }


  // Event-time tumbling-window aggregation over the events stream table —
  // the batch face of the streaming windowed-agg path. `ts` is a session-UTC
  // TimestampType whatever the parquet physical type was (Tables.normalize),
  // so hour buckets align with DuckDB's epoch-anchored time_bucket.
  register(
    "q11_time_window",
    """SELECT time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
      |       event_type, count(*) AS n,
      |       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS total
      |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour").getField("start").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("value") * 100 + 0.5)) / 100.0).as("total"))
      .orderBy("window_start", "event_type")
  }


  // Gap-based sessionization — the analytics staple the fixed-window q11
  // can't express: a session breaks after 30 idle minutes; session index =
  // running count of breaks (lag + running sum, two window passes over ONE
  // user-partitioned sort). All arithmetic in integer micros end-to-end.
  register(
    "q18_sessionize",
    """WITH e AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
      |m AS (
      |  SELECT user_id, tus,
      |         CASE WHEN lag(tus) OVER w IS NULL
      |                OR tus - lag(tus) OVER w > 1800000000 THEN 1
      |              ELSE 0 END AS new_sess
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus)),
      |s AS (
      |  SELECT user_id, tus,
      |         sum(new_sess) OVER (PARTITION BY user_id ORDER BY tus
      |                             ROWS UNBOUNDED PRECEDING) AS session_idx
      |  FROM m)
      |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       min(tus) AS sess_start_us, max(tus) AS sess_end_us
      |FROM s GROUP BY user_id, session_idx
      |ORDER BY user_id, session_idx""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("tus")
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // integer micros on both sides: DuckDB's TIMESTAMP carries micro
    // precision, and unix_micros over the normalized TimestampType `ts`
    // (Tables.normalize) is exactly DuckDB's epoch_us
    t(s, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("tus"))
      .withColumn("new_sess",
        when(lag(col("tus"), 1).over(w).isNull ||
          col("tus") - lag(col("tus"), 1).over(w) > 1800000000L, 1)
          .otherwise(0))
      .withColumn("session_idx", sum(col("new_sess")).over(wRun))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        min(col("tus")).as("sess_start_us"),
        max(col("tus")).as("sess_end_us"))
      .orderBy("user_id", "session_idx")
  }


  // Temporal correlation — "X followed by Y within the window", the
  // security-analytics staple (the reference's correlation rules run as
  // Athena SQL over the historical store). Scalable shape: NOT a range
  // self-join (quadratic per key) but ONE user-partitioned sort with the
  // last-X timestamp carried forward by a running max — each Y row then
  // checks its gap locally. Integer micros end-to-end (the q18 pattern).
  register(
    "q22_correlation",
    """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tus FROM events),
      |m AS (
      |  SELECT user_id, event_type, tus,
      |         max(CASE WHEN event_type = 'view' THEN tus END)
      |           OVER (PARTITION BY user_id ORDER BY tus, event_type
      |                 ROWS UNBOUNDED PRECEDING) AS last_view
      |  FROM e)
      |SELECT user_id,
      |       CAST(count(*) FILTER (WHERE event_type = 'purchase'
      |              AND last_view IS NOT NULL
      |              AND tus - last_view <= 1800000000) AS BIGINT)
      |         AS correlated_purchases,
      |       CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
      |         AS purchases
      |FROM m GROUP BY user_id
      |HAVING count(*) FILTER (WHERE event_type = 'purchase') > 0
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    // tiebreak on event_type: same-micro rows must frame identically in
    // both engines ('purchase' sorts before 'view', so a tied view is
    // deterministically excluded from the purchase's running frame)
    val wRun = Window.partitionBy("user_id").orderBy("tus", "event_type")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tus"))
      .withColumn("last_view",
        max(when(col("event_type") === "view", col("tus"))).over(wRun))
      .groupBy("user_id")
      .agg(
        count(when(col("event_type") === "purchase" &&
          col("last_view").isNotNull &&
          col("tus") - col("last_view") <= 1800000000L, 1))
          .as("correlated_purchases"),
        count(when(col("event_type") === "purchase", 1)).as("purchases"))
      .where(col("purchases") > 0)
      .orderBy("user_id")
  }


  // PIVOT: long→wide reshaping (the reporting face of the scheduled-query
  // surface). Spark's relational pivot plans as ONE aggregation with a
  // pivot-aggregate per value — same shape as the CASE-per-column oracle.
  register(
    "q19_pivot",
    """SELECT user_id % 10 AS user_bucket,
      |  CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
      |  CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view,
      |  CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
      |  CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
      |  CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup
      |FROM events GROUP BY 1 ORDER BY user_bucket""".stripMargin) { (s, dir) =>
    t(s, dir, "events")
      .groupBy((col("user_id") % 10).as("user_bucket"))
      .pivot("event_type", Seq("purchase", "view", "error", "click", "signup"))
      .agg(coalesce(count(lit(1)), lit(0L)))
      .na.fill(0L)
      .orderBy("user_bucket")
  }


  // Skew-mitigation operators: salted join + two-phase aggregation produce
  // the same result as their unsalted forms (that IS the correctness
  // contract), while splitting hot keys across tasks.
  register(
    "q12_salted_join",
    """SELECT e.event_id, n.n_name AS nation_name FROM events e
      |JOIN nation n ON e.user_id % 25 = n.n_nationkey
      |ORDER BY e.event_id""".stripMargin) { (s, dir) =>
    val big = t(s, dir, "events")
      .select(col("event_id"), (col("user_id") % 25).cast("int").as("n_nationkey"))
    val small = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
    graft.functions.Skew.saltedJoin(big, small, "n_nationkey", salts = 8)
      .select(col("event_id"), col("n_name").as("nation_name"))
      .orderBy("event_id")
  }


  register(
    "q13_salted_agg",
    """SELECT event_type, count(*) AS n FROM events
      |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    graft.functions.Skew.saltedCount(
      t(s, dir, "events").select("event_type"), "event_type", salts = 8)
      .orderBy("event_type")
  }


  // GROUPING SETS: the general form of q10's ROLLUP (Athena/Presto surface;
  // Catalyst's Expand operator underneath).
  register(
    "q14_grouping_sets",
    """SELECT l_returnflag, l_linestatus, count(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
  }


  // Set operations: INTERSECT / EXCEPT between customer segments — the
  // remaining §2.5 construct family (distinct-based set semantics).
  register(
    "q15_setops",
    """SELECT c_nationkey FROM customer WHERE c_acctbal > 5000
      |INTERSECT
      |SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |EXCEPT
      |SELECT c_nationkey FROM customer WHERE c_acctbal < -950
      |ORDER BY c_nationkey""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """SELECT c_nationkey FROM customer WHERE c_acctbal > 5000
        |INTERSECT
        |SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        |EXCEPT
        |SELECT c_nationkey FROM customer WHERE c_acctbal < -950
        |ORDER BY c_nationkey""".stripMargin)
  }


  // Anti join (TPC-H Q22 shape): customers with no orders — completes the
  // join-type family (inner/broadcast q3/q5, semi q9, outer inside r7,
  // anti here; the same NOT EXISTS the redelivery ledger gate uses).
  register(
    "q21_anti_join",
    """SELECT c.c_custkey, c.c_acctbal
      |FROM customer c
      |WHERE c.c_acctbal > 0 AND NOT EXISTS (
      |  SELECT 1 FROM orders o
      |  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      |ORDER BY c.c_custkey""".stripMargin) { (s, dir) =>
    t(s, dir, "customer").where(col("c_acctbal") > 0)
      .join(t(s, dir, "orders").where(col("o_totalprice") > 400000)
        .select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), "left_anti")
      .select("c_custkey", "c_acctbal")
      .orderBy("c_custkey")
  }


  // Exact percentiles (the Athena/Presto approx_percentile surface, done
  // exactly): both engines linearly interpolate at h = (n-1)*q over the
  // sorted values, so interpolating on INTEGER CENTS is bit-identical
  // IEEE arithmetic — the q1 money trick applied to order statistics.
  register(
    "q20_percentiles",
    """SELECT o_orderpriority,
      |  round(quantile_cont(cents, 0.5) / 100.0, 6) AS p50,
      |  round(quantile_cont(cents, 0.95) / 100.0, 6) AS p95,
      |  count(*) AS n
      |FROM (SELECT o_orderpriority,
      |        CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |      FROM orders)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    t(s, dir, "orders")
      .select(col("o_orderpriority"),
        floor(col("o_totalprice") * 100 + 0.5).as("cents"))
      .groupBy("o_orderpriority")
      .agg(
        round(percentile(col("cents"), lit(0.5)) / 100.0, 6).as("p50"),
        round(percentile(col("cents"), lit(0.95)) / 100.0, 6).as("p95"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")
  }


  // Point-in-time (as-of) join: each purchase event picks up the most
  // recent signup state for its user (ties at equal ts match; purchases
  // before any signup keep NULL). Spark side is the union trick — one
  // shuffle on user_id + one ordered window; DuckDB's native ASOF LEFT
  // JOIN is the oracle.
  register(
    "q23_asof_join",
    """WITH dim AS (
      |  SELECT user_id, ts, max(value) AS state_value
      |  FROM events WHERE event_type = 'signup' GROUP BY user_id, ts),
      |fact AS (
      |  SELECT event_id, user_id, ts
      |  FROM events WHERE event_type = 'purchase')
      |SELECT f.event_id, f.user_id, f.ts,
      |       d.ts AS asof_ts, d.state_value AS asof_state_value
      |FROM fact f ASOF LEFT JOIN dim d
      |  ON f.user_id = d.user_id AND f.ts >= d.ts
      |ORDER BY f.event_id""".stripMargin) { (s, dir) =>
    val events = t(s, dir, "events")
    val dim = events.where(col("event_type") === "signup")
      .groupBy("user_id", "ts").agg(max(col("value")).as("state_value"))
    val fact = events.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    graft.operators.TemporalJoins
      .asofJoin(fact, dim, Seq("user_id"), "ts", Seq("state_value"))
      .orderBy("event_id")
  }


  // Interval (range) join via time bucketing: events against 360
  // half-open one-hour maintenance windows spaced every two hours. The
  // Spark plan is an EQUI-join on the derived hour bucket (never a
  // nested-loop over the inequality); the oracle is the plain BETWEEN
  // join. Money in integer cents (the q1 trick).
  register(
    "q24_range_join",
    """WITH iv AS (
      |  SELECT k AS window_id,
      |         TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (k*7200) SECOND AS ws,
      |         TIMESTAMP '2024-01-01 00:00:00' + INTERVAL (k*7200+3600) SECOND AS we
      |  FROM (SELECT unnest(generate_series(0, 359)) AS k))
      |SELECT iv.window_id, count(*) AS n_events,
      |       CAST(sum(CAST(floor(e.value * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |         AS sum_cents
      |FROM events e JOIN iv ON e.ts >= iv.ws AND e.ts < iv.we
      |GROUP BY iv.window_id ORDER BY iv.window_id""".stripMargin) { (s, dir) =>
    val t0 = 1704067200000000L // 2024-01-01T00:00:00Z in epoch micros
    val iv = s.range(360).select(col("id").as("window_id"),
      timestamp_micros(lit(t0) + col("id") * lit(7200000000L)).as("ws"),
      timestamp_micros(lit(t0) + col("id") * lit(7200000000L) + lit(3600000000L)).as("we"))
    graft.operators.TemporalJoins
      .rangeJoinBucketed(t(s, dir, "events"), "ts", iv, "ws", "we",
        bucketSeconds = 3600L)
      .groupBy("window_id")
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100 + 0.5)).cast("long").as("sum_cents"))
      .orderBy("window_id")
  }


  // Z-order values (Morton interleave) over (user_id, event time) — the
  // arithmetic behind history.Layout's multi-dimensional file layout,
  // hash-pinned cross-engine: 16-bit rank normalization against table
  // bounds (floor, not cast — Spark truncates, DuckDB rounds) and the
  // 32-bit interleave built from the same shift/mask terms on both
  // sides. The layout BENEFIT (file skipping on either dimension) is
  // pinned by LayoutSpec; this row pins the curve itself.
  register(
    "q28_zorder_values", {
      val interleave = (0 until 16).map(i =>
        s"(((r1 >> $i) & 1) << ${2 * i}) | (((r2 >> $i) & 1) << ${2 * i + 1})")
        .mkString(" | ")
      s"""WITH b AS (SELECT min(user_id) AS mn1, max(user_id) AS mx1,
         |                 min(epoch_us(ts)) AS mn2, max(epoch_us(ts)) AS mx2
         |           FROM events),
         |r AS (SELECT event_id,
         |        CAST(floor((user_id - mn1)::DOUBLE / (mx1 - mn1)::DOUBLE
         |                   * 65535.0) AS BIGINT) AS r1,
         |        CAST(floor((epoch_us(ts) - mn2)::DOUBLE / (mx2 - mn2)::DOUBLE
         |                   * 65535.0) AS BIGINT) AS r2
         |      FROM events, b)
         |SELECT event_id, CAST($interleave AS BIGINT) AS z
         |FROM r ORDER BY event_id""".stripMargin
    }) { (s, dir) =>
    graft.history.Layout.withZValue(
        t(s, dir, "events").select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("tus")),
        "user_id", "tus")
      .select(col("event_id"), col("__z").as("z"))
      .orderBy("event_id")
  }


  // Rolling volume-anomaly detection — the scheduled-query alerting
  // staple ("this hour's event volume is k sigma off its trailing
  // baseline"). Hourly counts per event type, baseline = the previous
  // 24 hourly buckets (rows frame, ordered by hour — deterministic).
  // Mean and variance are built EXPLICITLY from integer sums
  // (sum, sum of squares, count — exact in both engines) rather than
  // avg/stddev aggregates whose accumulation internals differ; the
  // z-score is one identical double expression, rounded at 6.
  register(
    "q29_volume_anomaly",
    """WITH hourly AS (
      |  SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
      |         count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |stats AS (
      |  SELECT event_type, hr, n,
      |         sum(n) OVER w AS s,
      |         sum(n * n) OVER w AS sq,
      |         count(*) OVER w AS c
      |  FROM hourly
      |  WINDOW w AS (PARTITION BY event_type ORDER BY hr
      |               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
      |SELECT event_type, hr, n,
      |       round((CAST(n AS DOUBLE) - CAST(s AS DOUBLE) / c) /
      |             sqrt((CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) *
      |                   CAST(s AS DOUBLE) / c) / (c - 1)), 6) AS z
      |FROM stats
      |WHERE c >= 12
      |  AND (CAST(sq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / c)
      |      / (c - 1) > 0
      |ORDER BY event_type, hr""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy("hr")
      .rowsBetween(-24, -1)
    val hourly = t(s, dir, "events")
      .select(col("event_type"), unix_micros(col("ts")).as("tus"))
      .select(col("event_type"), expr("tus div 3600000000").as("hr"))
      .groupBy("event_type", "hr").agg(count(lit(1)).as("n"))
    val stats = hourly
      .withColumn("s", sum(col("n")).over(w))
      .withColumn("sq", sum(col("n") * col("n")).over(w))
      .withColumn("c", count(lit(1)).over(w))
    val variance = (col("sq").cast("double") -
      col("s").cast("double") * col("s").cast("double") / col("c")) /
      (col("c") - 1)
    stats
      .where(col("c") >= 12 && variance > 0)
      .select(col("event_type"), col("hr"), col("n"),
        round((col("n").cast("double") - col("s").cast("double") / col("c")) /
          sqrt(variance), 6).as("z"))
      .orderBy("event_type", "hr")
  }


  // Ordered funnel conversion (signup → click → purchase): step i's
  // per-user time is the min step-i event STRICTLY AFTER step i-1's —
  // k-1 skinny (user, micros) joins, never a per-user event array, so
  // one power user cannot skew a task. Integer micros end-to-end.
  register(
    "q26_funnel",
    """WITH e AS (SELECT user_id, epoch_us(ts) AS tus, event_type FROM events),
      |s1 AS (SELECT user_id, min(tus) AS t1 FROM e
      |       WHERE event_type = 'signup' GROUP BY user_id),
      |s2 AS (SELECT e.user_id, min(tus) AS t2 FROM e JOIN s1 USING (user_id)
      |       WHERE event_type = 'click' AND tus > t1 GROUP BY e.user_id),
      |s3 AS (SELECT e.user_id, min(tus) AS t3 FROM e JOIN s2 USING (user_id)
      |       WHERE event_type = 'purchase' AND tus > t2 GROUP BY e.user_id)
      |SELECT * FROM (
      |  SELECT 1 AS step_idx, 'signup' AS step,
      |         (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_users
      |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
      |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))
      |ORDER BY step_idx""".stripMargin) { (s, dir) =>
    graft.operators.Behavior.funnelCounts(t(s, dir, "events"),
        "user_id", "ts", "event_type", Seq("signup", "click", "purchase"))
      .orderBy("step_idx")
  }


  // Weekly cohort retention: cohort = epoch-week of a user's first event
  // (integer micros // 604800e6 — no calendar functions, so engines
  // agree bit-for-bit); cells count distinct active cohort members.
  register(
    "q27_retention_cohorts",
    """WITH w AS (
      |  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk
      |  FROM events),
      |c AS (SELECT user_id, min(wk) AS cohort_wk FROM w GROUP BY user_id)
      |SELECT c.cohort_wk, w.wk - c.cohort_wk AS week_offset,
      |       CAST(count(DISTINCT w.user_id) AS BIGINT) AS n_users
      |FROM w JOIN c USING (user_id)
      |WHERE w.wk - c.cohort_wk <= 3
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    graft.operators.Behavior.retentionCohorts(t(s, dir, "events"),
        "user_id", "ts", maxOffset = 3)
      .orderBy("cohort_wk", "week_offset")
  }


  // First-order Markov transitions over per-user event paths: adjacent
  // (prev → next) pairs from ONE lead window (ordered by integer micros
  // with the event-id tie-break, so simultaneous events are
  // deterministic), then P(next|prev) from exact integer counts — the
  // "what do users do after X" path-analysis staple.
  register(
    "q32_markov_transitions",
    """WITH e AS (
      |  SELECT user_id, event_type,
      |         lead(event_type) OVER (PARTITION BY user_id
      |           ORDER BY epoch_us(ts), event_id) AS next_type
      |  FROM events),
      |c AS (SELECT event_type AS prev_type, next_type, count(*) AS n
      |      FROM e WHERE next_type IS NOT NULL GROUP BY 1, 2)
      |SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
      |       round(CAST(n AS DOUBLE) /
      |             CAST(sum(n) OVER (PARTITION BY prev_type) AS DOUBLE),
      |             6) AS p
      |FROM c ORDER BY prev_type, next_type""".stripMargin) { (s, dir) =>
    graft.operators.Behavior.markovTransitions(t(s, dir, "events"),
      "user_id", "ts", "event_type", "event_id")
  }


  // §2.5: scheduled query with time-param substitution over the store.
  register(
    "sq_scheduled_query",
    """SELECT l_returnflag AS flag, count(*) AS n FROM lineitem
      |WHERE strftime(l_shipdate, '%Y-%m-%d-%H') < '1995-06-17-12'
      |GROUP BY l_returnflag ORDER BY flag""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    ScheduledQueries.run(s,
      """SELECT l_returnflag AS flag, count(*) AS n FROM lineitem
        |WHERE date_format(l_shipdate, 'yyyy-MM-dd-HH') < '{utcdatehour_minus1day}'
        |GROUP BY l_returnflag ORDER BY flag""".stripMargin,
      java.time.Instant.parse("1995-06-18T12:00:00Z"))
  }


  // §2.5: a USER-AUTHORED inequality interval join through the
  // scheduled-query surface — proves plans/RangeJoinRewrite.scala fires on
  // raw SQL text (not just the q24 operator path): the join condition is
  // bound-only (ts >= start AND ts < end, no equi-conjunct), which Spark
  // would plan as a nested loop; the injected optimizer rule rebuilds it
  // as a bucketed hash join (RangeJoinRewriteSqSpec pins the plan shape).
  // The oracle brute-forces the same SQL in DuckDB.
  register(
    "sq_range_join",
    """WITH iv AS (
      |  SELECT event_type AS itype, min(ts) AS start_ts,
      |         min(ts) + INTERVAL 2 HOUR AS end_ts
      |  FROM events GROUP BY event_type)
      |SELECT itype, count(*) AS n
      |FROM events e JOIN iv ON e.ts >= iv.start_ts AND e.ts < iv.end_ts
      |GROUP BY itype ORDER BY itype""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    ScheduledQueries.run(s,
      """WITH iv AS (
        |  SELECT event_type AS itype, min(ts) AS start_ts,
        |         min(ts) + INTERVAL 2 HOUR AS end_ts
        |  FROM events GROUP BY event_type)
        |SELECT itype, count(*) AS n
        |FROM events e JOIN iv ON e.ts >= iv.start_ts AND e.ts < iv.end_ts
        |GROUP BY itype ORDER BY itype""".stripMargin,
      java.time.Instant.parse("1995-06-18T12:00:00Z"))
  }


  // §3.2 dialect compatibility: the reference's own sample query pack runs
  // VERBATIM — text from scheduled_queries/sample/athena.py:24-47 (params
  // substituted by the pack runner, exactly as the reference does), parsed
  // by plain spark.sql via ScheduledQueries.runPresto: the injected Presto
  // aliases resolve `json_extract` (Presto-faithful since r18 — the
  // database_name column is the JSON-ENCODED '"db_N"' with quotes, exactly
  // what Athena returns for this pack), ANSI double-quoted identifiers
  // resolve `"ATHENA_DATABASE_NAME"."cloudwatch_cloudtrail"`, and Spark's
  // native map subscript handles `requestparameters['querystring']`. The fixture
  // is a catalog VIEW shaped like the Athena CloudTrail table (map-typed
  // requestparameters/useridentity, dt partition strings), derived from
  // events with decorrelated moduli so every WHERE clause discriminates.
  private[graft] val prestoSampleSql =
    """
      |SELECT
      |  eventtime,
      |  json_extract(requestparameters['queryexecutioncontext'], '$.database') as database_name,
      |  requestparameters['querystring'] as querystring,
      |  useridentity['type'] as user_identity_type,
      |  useridentity['arn'] as user_identity_arn,
      |  dt
      |FROM
      |  "ATHENA_DATABASE_NAME"."cloudwatch_cloudtrail"
      |WHERE
      |  dt = '{utcdatehour_minus1hour}'
      |
      |  -- Only Events from Athena
      |  AND eventsource = 'athena.amazonaws.com'
      |  AND eventname = 'StartQueryExecution'
      |
      |  -- Only on the CSIRT Prod account
      |  AND recipientaccountid = '123456789012'
      |
      |  -- Filter out noisy ALTER and SHOW queries. SHOW queries are commonly run in automation
      |  -- by API clients, and ALTER queries are run commonly by the Athena partition function.
      |  AND upper(substr(requestparameters['querystring'], 1, 5)) NOT IN ('ALTER', 'SHOW ')
      |""".stripMargin

  /** CloudTrail-shaped fixture view in a real catalog database, so the
    * pack's qualified `"db"."table"` reference resolves. A catalog VIEW
    * cannot reference a temp view, so the body reads the parquet path
    * directly; the ts expression absorbs a raw-long encoding the way
    * `Tables.normalize` does (all current warehouses are TIMESTAMP(us),
    * where it is just `ts`). */
  private def prestoFixture(s: SparkSession, dir: String): Unit = {
    val tsExpr = s.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => "timestamp_micros(ts DIV 1000)"
      case _ => "ts"
    }
    s.sql("CREATE DATABASE IF NOT EXISTS athena_database_name")
    s.sql(
      s"""CREATE OR REPLACE VIEW athena_database_name.cloudwatch_cloudtrail AS
         |SELECT
         |  date_format($tsExpr, 'yyyy-MM-dd''T''HH:mm:ss''Z''') AS eventtime,
         |  element_at(array('athena.amazonaws.com', 's3.amazonaws.com',
         |    'iam.amazonaws.com'), CAST(event_id % 3 AS INT) + 1) AS eventsource,
         |  element_at(array('StartQueryExecution', 'GetQueryResults',
         |    'CreateUser', 'BatchGetQueryExecution'),
         |    CAST(event_id % 4 AS INT) + 1) AS eventname,
         |  CASE WHEN user_id % 2 = 0 THEN '123456789012'
         |       ELSE '999999999999' END AS recipientaccountid,
         |  map(
         |    'queryexecutioncontext',
         |    concat('{"database":"db_', CAST(event_id % 7 AS STRING), '"}'),
         |    'querystring',
         |    element_at(array(
         |      concat('SELECT * FROM t', CAST(event_id % 5 AS STRING)),
         |      'ALTER TABLE t ADD PARTITION (dt = 1)',
         |      'SHOW  TABLES',
         |      concat('select count(*) from logs where id = ',
         |        CAST(event_id AS STRING))),
         |      CAST((event_id DIV 4) % 4 AS INT) + 1)) AS requestparameters,
         |  map(
         |    'type', CASE WHEN user_id % 3 = 0 THEN 'IAMUser'
         |                 ELSE 'AssumedRole' END,
         |    'arn', concat('arn:aws:iam::123456789012:user/u',
         |      CAST(user_id AS STRING))) AS useridentity,
         |  CASE WHEN event_id % 5 = 0 THEN '1995-06-18-11'
         |       ELSE '1995-06-18-10' END AS dt
         |FROM parquet.`$dir/events.parquet`""".stripMargin)
  }

  register(
    "sq_presto_verbatim",
    """SELECT strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS eventtime,
      |       '"db_' || CAST(event_id % 7 AS VARCHAR) || '"' AS database_name,
      |       CASE WHEN (event_id // 4) % 4 = 0
      |            THEN 'SELECT * FROM t' || CAST(event_id % 5 AS VARCHAR)
      |            ELSE 'select count(*) from logs where id = ' ||
      |                 CAST(event_id AS VARCHAR) END AS querystring,
      |       CASE WHEN user_id % 3 = 0 THEN 'IAMUser'
      |            ELSE 'AssumedRole' END AS user_identity_type,
      |       'arn:aws:iam::123456789012:user/u' || CAST(user_id AS VARCHAR)
      |         AS user_identity_arn,
      |       '1995-06-18-11' AS dt
      |FROM events
      |WHERE event_id % 60 = 0 AND user_id % 2 = 0
      |  AND (event_id // 4) % 4 IN (0, 3)
      |ORDER BY eventtime, user_identity_arn, querystring""".stripMargin) {
    (s, dir) =>
    prestoFixture(s, dir)
    ScheduledQueries.runPresto(s, prestoSampleSql,
        java.time.Instant.parse("1995-06-18T12:00:00Z"))
      .orderBy(col("eventtime"), col("user_identity_arn"), col("querystring"))
  }


  // §3.2 dialect fidelity, JSON-encoded leg (r17 verdict ask #3): Presto's
  // `json_extract` returns the JSON-ENCODED value — quoted string scalars,
  // raw objects/arrays with FIELD ORDER preserved (the fixture's meta keys
  // are deliberately unsorted b-then-a), and the text `null` for a JSON
  // null — while `json_extract_scalar` unquotes scalars and is SQL NULL on
  // objects/arrays/JSON-null. Both run as the native
  // [[graft.functions.PrestoJsonExtract]] through the verbatim pack path.
  // DuckDB's json_extract shares the encoded semantics (order-preserving
  // yyjson) except on JSON null, where it yields SQL NULL — that column and
  // the scalar-mode rows are spelled as literal CASE constructions instead.
  register(
    "sq_presto_json_encoded",
    """WITH jd AS (
      |  SELECT event_id AS id,
      |         '{"name":"u' || CAST(event_id AS VARCHAR) ||
      |         '","meta":{"b":' || CAST(event_id % 3 AS VARCHAR) ||
      |         ',"a":"x' || CAST(event_id % 5 AS VARCHAR) ||
      |         '"},"tags":["t' || CAST(event_id % 2 AS VARCHAR) ||
      |         '",' || CAST(event_id % 7 AS VARCHAR) ||
      |         '],"opt":' ||
      |         CASE WHEN event_id % 4 = 0 THEN 'null' ELSE '"v"' END ||
      |         '}' AS j
      |  FROM events)
      |SELECT id,
      |  CAST(json_extract(j, '$.name') AS VARCHAR) AS name_json,
      |  json_extract_string(j, '$.name') AS name_scalar,
      |  CAST(json_extract(j, '$.meta') AS VARCHAR) AS meta_json,
      |  CAST(NULL AS VARCHAR) AS meta_scalar,
      |  CAST(json_extract(j, '$.meta.a') AS VARCHAR) AS meta_a_json,
      |  CAST(json_extract(j, '$.tags[0]') AS VARCHAR) AS tag0_json,
      |  json_extract_string(j, '$.tags[1]') AS tag1_scalar,
      |  CASE WHEN id % 4 = 0 THEN 'null' ELSE '"v"' END AS opt_json,
      |  CASE WHEN id % 4 = 0 THEN NULL ELSE 'v' END AS opt_scalar,
      |  CAST(json_extract(j, '$.missing') AS VARCHAR) AS missing_json
      |FROM jd ORDER BY id""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """CREATE OR REPLACE TEMPORARY VIEW json_docs AS
        |SELECT event_id AS id,
        |  concat('{"name":"u', CAST(event_id AS STRING),
        |         '","meta":{"b":', CAST(event_id % 3 AS STRING),
        |         ',"a":"x', CAST(event_id % 5 AS STRING),
        |         '"},"tags":["t', CAST(event_id % 2 AS STRING),
        |         '",', CAST(event_id % 7 AS STRING),
        |         '],"opt":',
        |         CASE WHEN event_id % 4 = 0 THEN 'null' ELSE '"v"' END,
        |         '}') AS j
        |FROM events""".stripMargin)
    ScheduledQueries.runPresto(s,
      """SELECT id,
        |  json_extract(j, '$.name') AS name_json,
        |  json_extract_scalar(j, '$.name') AS name_scalar,
        |  json_extract(j, '$.meta') AS meta_json,
        |  json_extract_scalar(j, '$.meta') AS meta_scalar,
        |  json_extract(j, '$.meta.a') AS meta_a_json,
        |  json_extract(j, '$.tags[0]') AS tag0_json,
        |  json_extract_scalar(j, '$.tags[1]') AS tag1_scalar,
        |  json_extract(j, '$.opt') AS opt_json,
        |  json_extract_scalar(j, '$.opt') AS opt_scalar,
        |  json_extract(j, '$.missing') AS missing_json
        |FROM json_docs
        |ORDER BY id""".stripMargin,
      java.time.Instant.parse("1995-06-18T12:00:00Z"))
  }

  // §3.2: the remaining Presto aliases exercised as VERBATIM SQL text
  // through the same surface — from_iso8601_timestamp/to_unixtime (double
  // epoch seconds), strpos (1-based BIGINT), arbitrary (deterministic
  // here: every value in the group is identical), approx_distinct (HLL++;
  // deterministic for fixed data, and exact at the planted cardinality-10
  // group sizes, so the exact-COUNT oracle hash-matches).
  register(
    "sq_presto_functions",
    """SELECT event_type,
      |       upper(event_type) AS etype_upper,
      |       CAST(strpos(event_type, 'e') AS BIGINT) AS e_pos,
      |       epoch(TIMESTAMP '1995-06-18 12:00:00') AS fixed_unixtime,
      |       epoch(min(ts)) AS min_unixtime,
      |       CAST(count(DISTINCT user_id % 10) AS BIGINT) AS approx_mod_users
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
    (s, dir) =>
    Tables.registerAll(s, dir)
    ScheduledQueries.runPresto(s,
      """SELECT event_type,
        |  arbitrary(upper(event_type)) AS etype_upper,
        |  strpos(event_type, 'e') AS e_pos,
        |  to_unixtime(from_iso8601_timestamp('1995-06-18T12:00:00Z'))
        |    AS fixed_unixtime,
        |  to_unixtime(min(ts)) AS min_unixtime,
        |  approx_distinct(user_id % 10) AS approx_mod_users
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
      java.time.Instant.parse("1995-06-18T12:00:00Z"))
  }


  // §3.2 dialect compatibility, r18 function batch: the high-frequency
  // Athena pack functions beyond sq_presto_functions — quoted-unit
  // date_diff/date_add (parse-rewritten to Spark's bare-keyword special
  // form, same ts2−ts1 semantics), MySQL-format date_parse (token
  // conversion, strict), format_datetime, sha256 (varbinary, hex'd for
  // display), bitwise ops, levenshtein_distance, codepoint, TRY. The
  // time-unit oracle avoids DuckDB's boundary-crossing date_diff (Presto
  // and Spark truncate COMPLETE units) by integer epoch arithmetic.
  register(
    "sq_presto_functions2",
    """SELECT event_type,
      |  CAST((CAST(epoch(max(ts)) AS BIGINT) - CAST(epoch(min(ts)) AS BIGINT)) // 60
      |       AS BIGINT) AS span_min,
      |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
      |  CAST(epoch(strptime(strftime(min(ts), '%Y-%m-%d %H:%M:%S'),
      |       '%Y-%m-%d %H:%M:%S')) AS BIGINT) AS roundtrip,
      |  strftime(min(ts) + INTERVAL 2 HOUR, '%Y-%m-%d %H:%M:%S') AS plus2h,
      |  sha256(event_type) AS type_sha,
      |  CAST(min(event_id) & 255 AS BIGINT) AS ba,
      |  CAST(levenshtein(event_type, 'purchase') AS BIGINT) AS lev,
      |  CAST(ord(substr(event_type, 1, 1)) AS BIGINT) AS cp,
      |  CAST(TRY_CAST(substr(event_type, 1, 1) AS INTEGER) AS BIGINT) AS tri
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
    (s, dir) =>
    Tables.registerAll(s, dir)
    ScheduledQueries.runPresto(s,
      """SELECT event_type,
        |  date_diff('minute', min(ts), max(ts)) AS span_min,
        |  format_datetime(min(ts), 'yyyy-MM-dd HH:mm:ss') AS first_ts,
        |  CAST(to_unixtime(date_parse(
        |    format_datetime(min(ts), 'yyyy-MM-dd HH:mm:ss'),
        |    '%Y-%m-%d %H:%i:%s')) AS BIGINT) AS roundtrip,
        |  format_datetime(date_add('hour', 2, min(ts)),
        |    'yyyy-MM-dd HH:mm:ss') AS plus2h,
        |  lower(to_hex(sha256(event_type))) AS type_sha,
        |  bitwise_and(min(event_id), 255) AS ba,
        |  CAST(levenshtein_distance(event_type, 'purchase') AS BIGINT) AS lev,
        |  CAST(codepoint(substr(event_type, 1, 1)) AS BIGINT) AS cp,
        |  CAST(try(CAST(substr(event_type, 1, 1) AS INTEGER)) AS BIGINT) AS tri
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
      java.time.Instant.parse("1995-06-18T12:00:00Z"))
  }


  // §3.2 dialect compatibility, r19 function batch (r18 verdict ask #3):
  // json_parse/json_format (canonical compact re-encode — the fixture
  // plants extra whitespace the canonicalization must strip), contains
  // over an array (the type-dispatching alias that keeps Spark's string
  // contains alive), 4-arg reduce, zip with Presto field names + null
  // padding, split_to_map with LITERAL delimiters, url_encode/url_decode
  // (Spark builtins sharing Presto's x-www-form semantics), and the ISO
  // date fields (day_of_week 1=Monday, week, year_of_week). Every
  // integer output casts to BIGINT on both sides (the cross-engine
  // schema convention); the oracle derives each value analytically.
  register(
    "sq_presto_functions3",
    """SELECT event_type,
      |  '{"t":"' || event_type || '","n":' ||
      |    CAST(min(event_id) % 5 AS VARCHAR) || '}' AS jnorm,
      |  (min(event_id) % 3 = 1 OR min(event_id) % 5 = 1) AS has1,
      |  CAST((min(event_id) % 4 + 1) * (min(event_id) % 4 + 2) AS BIGINT) AS red,
      |  CAST(min(event_id) % 5 AS BIGINT) AS z0,
      |  CAST(min(event_id) % 11 AS BIGINT) AS z1,
      |  CAST(NULL AS BIGINT) AS zpad,
      |  CAST(min(event_id) % 9 AS VARCHAR) AS mb,
      |  replace(replace(event_type || ' &x', ' ', '+'), '&', '%26') AS ue,
      |  event_type || ' &x' AS ud,
      |  CAST(isodow(min(ts)) AS BIGINT) AS dw,
      |  CAST(dayofyear(min(ts)) AS BIGINT) AS dy,
      |  CAST(weekofyear(min(ts)) AS BIGINT) AS wk,
      |  CAST(isoyear(min(ts)) AS BIGINT) AS yw,
      |  CAST(day(min(ts)) AS BIGINT) AS dm
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
    (s, dir) =>
    Tables.registerAll(s, dir)
    ScheduledQueries.runPresto(s,
      """SELECT event_type,
        |  json_format(json_parse(concat('{"t": "', event_type, '", "n": ',
        |    CAST(min(event_id) % 5 AS VARCHAR), '}'))) AS jnorm,
        |  contains(ARRAY[CAST(min(event_id) % 3 AS INTEGER),
        |                 CAST(min(event_id) % 5 AS INTEGER)], 1) AS has1,
        |  CAST(reduce(sequence(1, CAST(min(event_id) % 4 + 1 AS INTEGER)),
        |    0, (s, x) -> s + x, s -> s * 2) AS BIGINT) AS red,
        |  CAST(element_at(zip(
        |    ARRAY[CAST(min(event_id) % 3 AS INTEGER),
        |          CAST(min(event_id) % 5 AS INTEGER)],
        |    ARRAY[CAST(min(event_id) % 7 AS INTEGER)]), 2).field0
        |    AS BIGINT) AS z0,
        |  CAST(element_at(zip(
        |    ARRAY[CAST(min(event_id) % 3 AS INTEGER)],
        |    ARRAY[CAST(min(event_id) % 7 AS INTEGER),
        |          CAST(min(event_id) % 11 AS INTEGER)]), 2).field1
        |    AS BIGINT) AS z1,
        |  CAST(element_at(zip(
        |    ARRAY[CAST(min(event_id) % 3 AS INTEGER)],
        |    ARRAY[CAST(min(event_id) % 7 AS INTEGER),
        |          CAST(min(event_id) % 11 AS INTEGER)]), 2).field0
        |    AS BIGINT) AS zpad,
        |  element_at(split_to_map(concat('a=1;b=',
        |    CAST(min(event_id) % 9 AS VARCHAR)), ';', '='), 'b') AS mb,
        |  url_encode(concat(event_type, ' &x')) AS ue,
        |  url_decode(url_encode(concat(event_type, ' &x'))) AS ud,
        |  day_of_week(min(ts)) AS dw,
        |  day_of_year(min(ts)) AS dy,
        |  week(min(ts)) AS wk,
        |  year_of_week(min(ts)) AS yw,
        |  day_of_month(min(ts)) AS dm
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
      java.time.Instant.parse("1995-06-18T12:00:00Z"))
  }


  // §3.2 dialect compatibility, r19 batch 4 — the PACK-SCOPED overrides
  // (GraftExtensions.packOverrides): Presto names whose semantics
  // conflict with the same-named Spark builtin, bound to runPresto's
  // cloned session only. regexp_extract returns NULL on no-match and
  // the WHOLE match for the 2-arg form (Spark: '' and group 1);
  // split_part returns NULL past the field count (Spark: '');
  // from_unixtime returns a real TIMESTAMP usable by date functions
  // (Spark: a formatted string) with fractional seconds kept; array_agg
  // KEEPS null elements (collect_list drops them — pinned via
  // cardinality + null-count, which are order-deterministic where the
  // element order is not). Plus the batch-4 global aliases: any_match/
  // all_match/none_match with Presto's three-valued NULL logic (the
  // null-element rows pin unknown-propagation on both sides), format
  // (java.util.Formatter ≡ DuckDB's C-style printf for %s/%0Nd),
  // date_format with MySQL tokens incl. the output-only %a day name
  // (pack-scoped — Spark's builtin speaks JDK patterns), and
  // to_iso8601's type-dispatched rendering over both input types.
  register(
    "sq_presto_functions4",
    """SELECT event_type,
      |  CASE WHEN regexp_matches(event_type, '[aeiou]+')
      |       THEN regexp_extract(event_type, '[aeiou]+') END AS vox,
      |  CAST(NULL AS VARCHAR) AS nomatch,
      |  CASE WHEN length(event_type) >= 2
      |       THEN substr(event_type, 2, 1) END AS ch2,
      |  CAST(min(event_id) % 7 AS VARCHAR) AS sp2,
      |  CAST(NULL AS VARCHAR) AS sp_oob,
      |  '1995-06-18 12:00:00.500' AS fu,
      |  CAST(count(*) AS BIGINT) AS aa_n,
      |  CAST(sum(CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS aa_nulls,
      |  (min(event_id) % 4 + 1 > 2 OR min(event_id) % 6 + 1 > 2) AS am,
      |  CAST(NULL AS BOOLEAN) AS am_null,
      |  CAST(NULL AS BOOLEAN) AS alm_null,
      |  NOT (min(event_id) % 4 + 1 > 2 OR min(event_id) % 6 + 1 > 2) AS nm,
      |  printf('%s|%03d', event_type, min(event_id) % 47) AS fmt,
      |  strftime(min(ts), '%Y-%m-%d %a') AS df,
      |  '1995-06-18T12:00:00.500' AS iso_ts,
      |  '2024-02-29' AS iso_d,
      |  event_type AS sp1,
      |  CAST(3 AS BIGINT) AS rsn,
      |  regexp_replace(event_type, '[aeiou]', '', 'g') AS rr,
      |  CAST(min(event_id) % 5 + 1 AS BIGINT) AS ng,
      |  CAST(2 AS BIGINT) AS ng_short,
      |  round(exp(avg(ln(CAST(event_id % 7 + 1 AS DOUBLE)))), 6) AS gm
      |FROM events
      |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    ScheduledQueries.runPresto(s,
      """SELECT event_type,
        |  regexp_extract(event_type, '[aeiou]+') AS vox,
        |  regexp_extract(event_type, 'zqj+') AS nomatch,
        |  regexp_extract(event_type, '^(.)(.)', 2) AS ch2,
        |  split_part(event_type || '-' ||
        |    CAST(min(event_id) % 7 AS VARCHAR), '-', 2) AS sp2,
        |  split_part(event_type, '-', 9) AS sp_oob,
        |  format_datetime(from_unixtime(803476800.5),
        |    'yyyy-MM-dd HH:mm:ss.SSS') AS fu,
        |  CAST(cardinality(array_agg(
        |    CASE WHEN event_id % 3 = 0 THEN NULL ELSE event_id END))
        |    AS BIGINT) AS aa_n,
        |  CAST(cardinality(filter(array_agg(
        |    CASE WHEN event_id % 3 = 0 THEN NULL ELSE event_id END),
        |    x -> x IS NULL)) AS BIGINT) AS aa_nulls,
        |  any_match(ARRAY[CAST(min(event_id) % 4 + 1 AS INTEGER),
        |                  CAST(min(event_id) % 6 + 1 AS INTEGER)],
        |            x -> x > 2) AS am,
        |  any_match(ARRAY[CAST(NULL AS INTEGER),
        |                  CAST(min(event_id) % 4 AS INTEGER)],
        |            x -> x > 99) AS am_null,
        |  all_match(ARRAY[CAST(NULL AS INTEGER),
        |                  CAST(min(event_id) % 4 AS INTEGER)],
        |            x -> x >= 0) AS alm_null,
        |  none_match(ARRAY[CAST(min(event_id) % 4 + 1 AS INTEGER),
        |                   CAST(min(event_id) % 6 + 1 AS INTEGER)],
        |             x -> x > 2) AS nm,
        |  format('%s|%03d', event_type, min(event_id) % 47) AS fmt,
        |  date_format(min(ts), '%Y-%m-%d %a') AS df,
        |  to_iso8601(from_unixtime(803476800.5)) AS iso_ts,
        |  to_iso8601(from_iso8601_date('2024-02-29')) AS iso_d,
        |  element_at(split(event_type || '.x.y', '.'), 1) AS sp1,
        |  CAST(cardinality(regexp_split('a1b22c', '[0-9]+')) AS BIGINT)
        |    AS rsn,
        |  regexp_replace(event_type, '[aeiou]') AS rr,
        |  CAST(element_at(element_at(ngrams(ARRAY[
        |    CAST(min(event_id) % 5 AS INTEGER),
        |    CAST(min(event_id) % 5 + 1 AS INTEGER),
        |    CAST(min(event_id) % 5 + 2 AS INTEGER)], 2), 2), 1)
        |    AS BIGINT) AS ng,
        |  CAST(cardinality(element_at(ngrams(ARRAY[
        |    CAST(min(event_id) % 5 AS INTEGER),
        |    CAST(min(event_id) % 5 + 1 AS INTEGER)], 5), 1))
        |    AS BIGINT) AS ng_short,
        |  round(geometric_mean(CAST(event_id % 7 + 1 AS DOUBLE)), 6) AS gm
        |FROM events
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
      java.time.Instant.parse("1995-06-18T12:00:00Z"))
  }


  // §3.2 dialect compatibility, UNNEST leg (r17 verdict ask #5): the
  // single most common Athena FROM-clause idiom Spark's parser rejects —
  // `CROSS JOIN UNNEST(col) AS t (x)` over an array and a map — runs
  // VERBATIM through runPresto's token-aware rewrite to LATERAL VIEW
  // explode (ScheduledQueries.rewriteUnnest). The oracle spells the same
  // expansion as engine-neutral UNION ALL branches (duplicate array
  // elements legitimately produce duplicate rows in both engines).
  register(
    "sq_presto_unnest",
    """WITH base AS (
      |  SELECT event_id AS id, event_type, user_id
      |  FROM events WHERE event_id % 7 = 0),
      |xs AS (
      |  SELECT id, CAST(id % 3 AS INT) AS x, CAST(1 AS BIGINT) AS i FROM base
      |  UNION ALL
      |  SELECT id, CAST(id % 5 AS INT) AS x, CAST(2 AS BIGINT) AS i FROM base),
      |kv AS (
      |  SELECT id, 't' AS k, event_type AS v FROM base
      |  UNION ALL
      |  SELECT id, 'u' AS k, CAST(user_id AS VARCHAR) AS v FROM base)
      |SELECT xs.id, x, i, k, v
      |FROM xs JOIN kv USING (id)
      |ORDER BY id, i, k, v""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """CREATE OR REPLACE TEMPORARY VIEW unnest_docs AS
        |SELECT event_id AS id,
        |  array(CAST(event_id % 3 AS INT), CAST(event_id % 5 AS INT)) AS arr,
        |  map('t', event_type, 'u', CAST(user_id AS STRING)) AS m
        |FROM events WHERE event_id % 7 = 0""".stripMargin)
    ScheduledQueries.runPresto(s,
      """SELECT id, x, CAST(i AS BIGINT) AS i, k, v
        |FROM unnest_docs
        |CROSS JOIN UNNEST(arr) WITH ORDINALITY AS t (x, i)
        |CROSS JOIN UNNEST(m) AS u (k, v)
        |ORDER BY id, i, k, v""".stripMargin,
      java.time.Instant.parse("1995-06-18T12:00:00Z"))
  }


  // §3.2 dialect compatibility, parallel-array UNNEST leg (r18 verdict
  // ask #2): Presto's `CROSS JOIN UNNEST(a, b) [WITH ORDINALITY]` zips
  // the arrays to the LONGEST length and pads the shorter with nulls —
  // exactly arrays_zip's contract, which the rewrite rides
  // (inline(arrays_zip(...)) for the plain form, posexplode + trailing
  // 1-based pos for ORDINALITY). Fixture arrays have UNEQUAL lengths in
  // both directions (3-vs-2 zipped under ORDINALITY, 2-vs-3 under the
  // inline form) so the null padding is exercised on each side; the
  // oracle spells the same expansion as engine-neutral UNION ALL
  // branches. Sort keys (id, i, q) are non-null and unique by
  // construction — null-ordering defaults differ across engines.
  register(
    "sq_presto_unnest2",
    """WITH base AS (
      |  SELECT event_id AS id FROM events WHERE event_id % 11 = 0),
      |t AS (
      |  SELECT id, CAST(id % 3 AS INT) AS x,
      |         'u' || CAST(id % 2 AS VARCHAR) AS y, CAST(1 AS BIGINT) AS i
      |  FROM base
      |  UNION ALL
      |  SELECT id, CAST(id % 5 AS INT),
      |         'v' || CAST(id % 3 AS VARCHAR), CAST(2 AS BIGINT) FROM base
      |  UNION ALL
      |  SELECT id, CAST(id % 7 AS INT), NULL, CAST(3 AS BIGINT) FROM base),
      |u AS (
      |  SELECT id, 'm' AS p, CAST(id % 4 AS INT) AS q FROM base
      |  UNION ALL
      |  SELECT id, 'n' || CAST(id % 3 AS VARCHAR),
      |         CAST(id % 6 + 10 AS INT) FROM base
      |  UNION ALL
      |  SELECT id, NULL, CAST(id % 9 + 100 AS INT) FROM base)
      |SELECT t.id, x, y, i, p, q
      |FROM t JOIN u ON t.id = u.id
      |ORDER BY t.id, i, q""".stripMargin) { (s, dir) =>
    Tables.registerAll(s, dir)
    s.sql(
      """CREATE OR REPLACE TEMPORARY VIEW unnest2_docs AS
        |SELECT event_id AS id,
        |  array(CAST(event_id % 3 AS INT), CAST(event_id % 5 AS INT),
        |        CAST(event_id % 7 AS INT)) AS a,
        |  array(concat('u', CAST(event_id % 2 AS STRING)),
        |        concat('v', CAST(event_id % 3 AS STRING))) AS b,
        |  array('m', concat('n', CAST(event_id % 3 AS STRING))) AS c,
        |  array(CAST(event_id % 4 AS INT), CAST(event_id % 6 + 10 AS INT),
        |        CAST(event_id % 9 + 100 AS INT)) AS d
        |FROM events WHERE event_id % 11 = 0""".stripMargin)
    ScheduledQueries.runPresto(s,
      """SELECT id, x, y, CAST(i AS BIGINT) AS i, p, q
        |FROM unnest2_docs
        |CROSS JOIN UNNEST(a, b) WITH ORDINALITY AS t (x, y, i)
        |CROSS JOIN UNNEST(c, d) AS u (p, q)
        |ORDER BY id, i, q""".stripMargin,
      java.time.Instant.parse("1995-06-18T12:00:00Z"))
  }


  // §3.2/§3.3 dialect compatibility, promotion leg: the reference's
  // rule-promotion SQL TEMPLATES run verbatim — texts from
  // rule_promotion/statistic.py:22-31 (_COUNT_QUERY_TEMPLATE /
  // _COUNT_QUERY_WHERE_FRAGMENT / _INFO_QUERY_TEMPLATE), where-fragments
  // formatted exactly as statistic.py sql_where_fragment does (the
  // reference's own runner fills {where_clause} in Python, so template
  // substitution is part of the contract, not a deviation).
  private[graft] val cqTemplate =
    "SELECT rule_name, count(*) AS count FROM alerts WHERE {where_clause} GROUP BY rule_name"
  private[graft] val cqWhereFragment =
    "(dt >= '{date}-{hour:02}' AND rule_name = '{rule_name}')"
  private[graft] val infoTemplate =
    "SELECT id, rule_name, created, cluster, log_source, source_entity, " +
      "record FROM alerts WHERE dt >= '{date}-{hour:02}' AND " +
      "rule_name = '{rule_name}' ORDER BY created DESC"

  private def cqFragment(date: String, hour: Int, rule: String): String =
    cqWhereFragment.replace("{date}", date)
      .replace("{hour:02}", f"$hour%02d").replace("{rule_name}", rule)

  // staged-alerts fixture view over events: 3 rules, dt over 2 days x 4
  // hours, so each staged rule's dt bound discriminates differently and
  // the unstaged rule falls out entirely
  private val alertsFixtureSelect =
    """SELECT event_id AS id,
      |  element_at(array('err_rule', 'big_rule', 'quiet_rule'),
      |    CAST(event_id % 3 AS INT) + 1) AS rule_name,
      |  timestamp_micros(event_id * 1000000) AS created,
      |  concat('c', CAST(event_id % 2 AS STRING)) AS cluster,
      |  'demo:json_events' AS log_source,
      |  concat('entity_', CAST(event_id % 5 AS STRING)) AS source_entity,
      |  concat('{"event_id":', CAST(event_id AS STRING), '}') AS record,
      |  concat('2024-01-0', CAST(event_id % 2 + 1 AS STRING), '-',
      |    lpad(CAST((event_id % 4) * 6 AS STRING), 2, '0')) AS dt""".stripMargin

  private val alertsFixtureDuck =
    """SELECT event_id AS id,
      |  CASE CAST(event_id % 3 AS INT) WHEN 0 THEN 'err_rule'
      |    WHEN 1 THEN 'big_rule' ELSE 'quiet_rule' END AS rule_name,
      |  make_timestamp(event_id * 1000000) AS created,
      |  'c' || CAST(event_id % 2 AS VARCHAR) AS cluster,
      |  'demo:json_events' AS log_source,
      |  'entity_' || CAST(event_id % 5 AS VARCHAR) AS source_entity,
      |  '{"event_id":' || CAST(event_id AS VARCHAR) || '}' AS record,
      |  '2024-01-0' || CAST(event_id % 2 + 1 AS VARCHAR) || '-' ||
      |    lpad(CAST((event_id % 4) * 6 AS VARCHAR), 2, '0') AS dt""".stripMargin

  private def alertsFixture(s: SparkSession, dir: String): Unit = {
    Tables.registerAll(s, dir)
    s.sql(s"$alertsFixtureSelect FROM events")
      .createOrReplaceTempView("alerts")
  }

  register(
    "sq_presto_promotion",
    s"""WITH alerts AS ($alertsFixtureDuck FROM events)
       |SELECT rule_name, CAST(count(*) AS BIGINT) AS count FROM alerts
       |WHERE (dt >= '2024-01-02-00' AND rule_name = 'err_rule')
       |   OR (dt >= '2024-01-01-12' AND rule_name = 'big_rule')
       |GROUP BY rule_name ORDER BY rule_name""".stripMargin) { (s, dir) =>
    alertsFixture(s, dir)
    val whereClause = Seq(
      cqFragment("2024-01-02", 0, "err_rule"),
      cqFragment("2024-01-01", 12, "big_rule")).mkString(" OR ")
    ScheduledQueries.runPresto(s, cqTemplate,
        java.time.Instant.parse("2024-01-03T00:00:00Z"),
        extra = Map("where_clause" -> whereClause))
      .orderBy("rule_name")
  }

  register(
    "sq_presto_alert_info",
    s"""WITH alerts AS ($alertsFixtureDuck FROM events)
       |SELECT id, rule_name, created, cluster, log_source, source_entity,
       |       record
       |FROM alerts
       |WHERE dt >= '2024-01-02-00' AND rule_name = 'err_rule'
       |ORDER BY created DESC""".stripMargin) { (s, dir) =>
    alertsFixture(s, dir)
    // {hour:02} is a Python format spec — statistic.py fills it with
    // .format() before the query ships; mirror that pre-formatting here
    val sqlText = infoTemplate.replace("{date}", "2024-01-02")
      .replace("{hour:02}", "00").replace("{rule_name}", "err_rule")
    ScheduledQueries.runPresto(s, sqlText,
      java.time.Instant.parse("2024-01-03T00:00:00Z"))
  }


  // §3.3: rule-promotion staging statistics (compound count query).
  register(
    "rp_promotion_stats",
    """SELECT * FROM (
      |  SELECT 'err_rule' AS rule_name, count(*) AS alert_count
      |  FROM events WHERE event_type = 'error'
      |  UNION ALL
      |  SELECT 'big_rule', count(*) FROM events WHERE value > 150)
      |ORDER BY rule_name""".stripMargin) { (s, dir) =>
    val rules = Seq(
      Rule("err_rule", RuleOpts(logs = Seq("demo:json_events")),
        rec => rec.getField("event_type") === "error"),
      Rule("big_rule", RuleOpts(logs = Seq("demo:json_events")),
        rec => rec.getField("value") > 150))
    val alerts = new RulesEngine(rules, deterministicIds = true, clock = Some(fixedClock))
      .evaluate(classifiedEvents(s, dir), "demo:json_events")
      .withColumn("dt", HistoricalSink.dtColumn(col("created")))
    RulePromotion.stagingStatistics(alerts,
      Map("err_rule" -> "2024-01-01-00", "big_rule" -> "2024-01-01-00"))
      .orderBy("rule_name")
  }


  // Top user journeys: the most common 3-step event paths (sequence
  // mining — the k-step generalization of q32's 1-step Markov matrix).
  // Two lead windows over the same (user, time, id) ordering extract
  // every consecutive triple; counts pre-combine; top-10 with path
  // tie-break. Journey strings are path-cardinality, never per-user
  // arrays.
  register(
    "q52_top_paths",
    """WITH e AS (
      |  SELECT user_id, event_type,
      |         lead(event_type, 1) OVER w AS t2,
      |         lead(event_type, 2) OVER w AS t3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
      |p AS (
      |  SELECT event_type || '>' || t2 || '>' || t3 AS path, count(*) AS n
      |  FROM e WHERE t3 IS NOT NULL GROUP BY 1)
      |SELECT path, CAST(n AS BIGINT) AS n FROM p
      |ORDER BY n DESC, path LIMIT 10""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("tus"), col("event_id"))
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tus"))
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .where(col("t3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("t2"), col("t3"))
        .as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(10)
  }


  // Quantity-weighted median price per group: pre-aggregate weight per
  // distinct price (shrinks the window input to price-cardinality), then
  // the smallest price whose cumulative weight reaches half the total —
  // all integer arithmetic, one running-sum window per group. The q36
  // histogram store answers the same statistic within a bin at scales
  // where even the distinct-price table is too wide.
  register(
    "q51_weighted_median",
    """WITH b AS (
      |  SELECT l_returnflag,
      |         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price,
      |         CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS wt
      |  FROM lineitem),
      |g AS (SELECT l_returnflag, price, sum(wt) AS wt FROM b GROUP BY 1, 2),
      |c AS (SELECT l_returnflag, price,
      |             sum(wt) OVER (PARTITION BY l_returnflag ORDER BY price)
      |               AS cum,
      |             sum(wt) OVER (PARTITION BY l_returnflag) AS tot
      |      FROM g)
      |SELECT l_returnflag, CAST(min(price) AS BIGINT) AS wmedian_cents
      |FROM c WHERE cum * 2 >= tot
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val g = t(s, dir, "lineitem")
      .select(col("l_returnflag"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("price"),
        floor(col("l_quantity") * 100 + 0.5).cast("long").as("wt"))
      .groupBy("l_returnflag", "price").agg(sum(col("wt")).as("wt"))
    val wCum = Window.partitionBy("l_returnflag").orderBy("price")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy("l_returnflag")
    g.withColumn("cum", sum(col("wt")).over(wCum))
      .withColumn("tot", sum(col("wt")).over(wAll))
      .where(col("cum") * 2 >= col("tot"))
      .groupBy("l_returnflag")
      .agg(min(col("price")).as("wmedian_cents"))
      .orderBy("l_returnflag")
  }


  // Recursive hierarchy closure — the WITH RECURSIVE gap: every node's
  // root and depth in the doc_id div 10 forest (parent = id/10, root 0),
  // computed by pointer doubling in ⌈log₂ depth⌉ skinny self-join rounds
  // (never depth sequential passes); DuckDB answers the same question
  // with its native recursive CTE, so the closure is hash-verified
  // across two entirely different evaluation strategies.
  register(
    "q50_tree_closure",
    """WITH RECURSIVE r AS (
      |  SELECT doc_id AS node, doc_id AS root, 0 AS depth
      |  FROM documents WHERE doc_id = 0
      |  UNION ALL
      |  SELECT d.doc_id, r.root, r.depth + 1
      |  FROM documents d JOIN r ON r.node = d.doc_id // 10
      |  WHERE d.doc_id > 0)
      |SELECT node, root, CAST(depth AS BIGINT) AS depth
      |FROM r ORDER BY node""".stripMargin) { (s, dir) =>
    val edges = t(s, dir, "documents").where(col("doc_id") > 0)
      .select(col("doc_id").as("child"),
        expr("doc_id div 10").as("parent"))
    graft.pipeline.Graphs.forestRootDepth(edges)
      .orderBy("node")
  }


  // Pareto frontier (skyline): line items no other item dominates
  // (cheaper-or-equal AND bigger-or-equal quantity, strict somewhere) —
  // the classic multi-criteria shortlist, solved in O(n log n) with ONE
  // RANGE-frame window per group (running max quantity over all STRICTLY
  // cheaper rows) plus a same-price max, instead of the naive quadratic
  // dominance self-join. Skyline size is bounded by distinct quantity
  // levels (≤ 50 here), so the output is tiny at any scale.
  register(
    "q49_skyline",
    """WITH b AS (
      |  SELECT l_returnflag,
      |         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price,
      |         CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qty
      |  FROM lineitem),
      |w AS (
      |  SELECT l_returnflag, price, qty,
      |         max(qty) OVER (PARTITION BY l_returnflag ORDER BY price
      |           RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |           AS best_cheaper,
      |         max(qty) OVER (PARTITION BY l_returnflag, price)
      |           AS best_same
      |  FROM b)
      |SELECT l_returnflag, price, qty,
      |       CAST(count(*) AS BIGINT) AS n
      |FROM w
      |WHERE qty > coalesce(best_cheaper, -1) AND qty = best_same
      |GROUP BY l_returnflag, price, qty
      |ORDER BY l_returnflag, price""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val b = t(s, dir, "lineitem").select(col("l_returnflag"),
      floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("price"),
      floor(col("l_quantity") * 100 + 0.5).cast("long").as("qty"))
    val wCheaper = Window.partitionBy("l_returnflag").orderBy("price")
      .rangeBetween(Window.unboundedPreceding, -1)
    val wSame = Window.partitionBy("l_returnflag", "price")
    b.withColumn("best_cheaper", max(col("qty")).over(wCheaper))
      .withColumn("best_same", max(col("qty")).over(wSame))
      .where(col("qty") > coalesce(col("best_cheaper"), lit(-1L)) &&
        col("qty") === col("best_same"))
      .groupBy("l_returnflag", "price", "qty")
      .agg(count(lit(1)).as("n"))
      .orderBy("l_returnflag", "price")
  }


  // Mergeable histogram store + percentile read: per-batch fixed-bin
  // integer histograms merge losslessly (unlike the GK sketch behind
  // percentile_approx, whose binary state has no relational merge);
  // any rollup answers any percentile with error <= one bin width. The
  // p50 lower edge is pure integer arithmetic (running-sum window over
  // occupied bins), and merge_lossless pins rollup == single-pass.
  register(
    "q36_histogram_store",
    """WITH h AS (
      |  SELECT l_returnflag,
      |         CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) // 500 AS bin,
      |         count(*) AS n
      |  FROM lineitem GROUP BY 1, 2),
      |c AS (SELECT l_returnflag, bin,
      |             sum(n) OVER (PARTITION BY l_returnflag ORDER BY bin) AS cum,
      |             sum(n) OVER (PARTITION BY l_returnflag) AS tot
      |      FROM h)
      |SELECT l_returnflag,
      |       CAST(min(bin) * 500 AS BIGINT) AS p_lower_cents,
      |       TRUE AS merge_lossless
      |FROM c WHERE cum * 1000000 >= tot * 500000
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val li = t(s, dir, "lineitem")
    val cents = floor(col("l_quantity") * 100 + 0.5).cast("long")
    // 4 synthetic ingest batches stand in for dt-partitioned store writes
    val store = Sketches.histSketches(
      li.withColumn("__batch", pmod(col("l_orderkey"), lit(4))),
      Seq("l_returnflag", "__batch"), cents, binWidthCents = 500L)
    val merged = Sketches.histMerge(store, Seq("l_returnflag"))
    val direct = Sketches.histSketches(li, Seq("l_returnflag"), cents, 500L)
      .withColumnRenamed("n", "__nd")
    val lossless = merged.join(direct, Seq("l_returnflag", "bin"), "full_outer")
      .groupBy("l_returnflag")
      .agg(bool_and(col("n").isNotNull && col("__nd").isNotNull &&
        col("n") === col("__nd")).as("merge_lossless"))
    Sketches.histPercentile(merged, Seq("l_returnflag"), q = 0.5,
        binWidthCents = 500L)
      .join(lossless, "l_returnflag")
      .select(col("l_returnflag"), col("p_lower_cents"), col("merge_lossless"))
      .orderBy("l_returnflag")
  }


  // Snapshot store end-to-end: three batch commits land a projected
  // lineitem slice each, a replace-commit compacts the union, and the
  // query TIME-TRAVELS to version 2 — whose content (batches 0 and 1)
  // the oracle recomputes directly from lineitem. Proves the manifest
  // protocol's read path: the compaction and the third batch must be
  // invisible to the pinned version.
  register(
    "q39_snapshot_store",
    """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
      |            AS BIGINT) / 100.0 AS sum_qty
      |FROM lineitem WHERE l_orderkey % 3 IN (0, 1)
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    import graft.history.Snapshots
    val root = scratchDir("graft_snapq")
    val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_returnflag"),
      floor(col("l_quantity") * 100 + 0.5).cast("long").as("qc"))
    for (b <- 0 to 2)
      Snapshots.commit(li.where(pmod(col("l_orderkey"), lit(3)) === b), root)
    Snapshots.commit(Snapshots.read(s, root), root, replace = true) // compact
    Snapshots.read(s, root, version = Some(2L))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        (sum(col("qc")) / 100.0).as("sum_qty"))
      .orderBy("l_returnflag")
  }


  // Incremental materialized view over the snapshot store: three
  // commits, a refresh after each — refresh 2 and 3 read ONLY the new
  // data directory and fold it into the stored moment rows
  // (Materialized.refresh + the q30 mergeable shapes). The final view's
  // derived stats must equal the direct full-history aggregation, which
  // the oracle computes from lineitem in one pass.
  register(
    "q40_incremental_view",
    """WITH m AS (
      |  SELECT l_returnflag,
      |         CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
      |              AS BIGINT) AS s,
      |         CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) *
      |                  CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
      |              AS BIGINT) AS ss
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |       round((CAST(s AS DOUBLE) / 100.0) / n, 6) AS mean,
      |       round((CAST(ss AS DOUBLE) / 10000.0 -
      |              (CAST(s AS DOUBLE) / 100.0) *
      |              (CAST(s AS DOUBLE) / 100.0) / n) / n, 6) AS var_pop
      |FROM m ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    import graft.history.{Materialized, Snapshots}
    val root = scratchDir("graft_mvbase")
    val viewRoot = scratchDir("graft_mview")
    val li = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_returnflag"),
      floor(col("l_quantity") * 100 + 0.5).cast("long").as("qc"))
    val partial = (df: DataFrame) =>
      Sketches.momentSketches(df, Seq("l_returnflag"), col("qc"))
    val merge = (df: DataFrame) => Sketches.momentMerge(df, Seq("l_returnflag"))
    var view: DataFrame = null
    for (b <- 0 to 2) {
      Snapshots.commit(li.where(pmod(col("l_orderkey"), lit(3)) === b), root)
      view = Materialized.refresh(s, root, viewRoot, partial, merge)
    }
    Sketches.momentStats(view)
      .select(col("l_returnflag"), col("n"), col("mean"), col("var_pop"))
      .orderBy("l_returnflag")
  }


  // Time-weighted average value per event type (TWAP — the
  // billing/uptime scheduled-query staple): each reading holds until the
  // next event of the SAME type, so its weight is that duration. One
  // lead window keyed by type (event-id tie-break), integer seconds ×
  // integer cents products, one pre-combined agg — the double division
  // happens once per group at 6 dp.
  register(
    "q38_twap",
    """WITH e AS (
      |  SELECT event_type,
      |         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
      |         epoch_us(ts) AS tus,
      |         lead(epoch_us(ts)) OVER (PARTITION BY event_type
      |           ORDER BY epoch_us(ts), event_id) AS next_tus
      |  FROM events),
      |d AS (SELECT event_type, cents,
      |             (next_tus - tus) // 1000000 AS dur_s
      |      FROM e WHERE next_tus IS NOT NULL)
      |SELECT event_type,
      |       CAST(sum(dur_s) AS BIGINT) AS total_s,
      |       round((CAST(sum(cents * dur_s) AS DOUBLE) / 100.0) /
      |             CAST(sum(dur_s) AS DOUBLE), 6) AS twap
      |FROM d GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("event_type").orderBy(col("tus"), col("event_id"))
    t(s, dir, "events")
      .select(col("event_type"), col("event_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents"),
        unix_micros(col("ts")).as("tus"))
      .withColumn("next_tus", lead(col("tus"), 1).over(w))
      .where(col("next_tus").isNotNull)
      .withColumn("dur_s", expr("(next_tus - tus) div 1000000"))
      .groupBy("event_type")
      .agg(sum(col("dur_s")).as("total_s"),
        round((sum(col("cents") * col("dur_s")).cast("double") / 100.0) /
          sum(col("dur_s")).cast("double"), 6).as("twap"))
      .orderBy("event_type")
  }


  // Population stability index between two snapshot histograms — the
  // standard drift monitor over the q36 histogram store (PSI > 0.1 =
  // moderate drift). Snapshot B deterministically drops 2/3 of the
  // high-quantity mass FOR RETURNFLAG 'A' ONLY, so the alarm fires for
  // A (psi 0.24 at sf0.01) and stays silent for N/R (~0.002) — both of
  // the verdict are exercised and hash-pinned; per-bin
  // contributions are ratios of exact integers and the cross-bin sum
  // folds in bin order (the ADC ordered-list pattern), engine-identical.
  register(
    "q37_psi_drift",
    """WITH a AS (
      |  SELECT l_returnflag,
      |         CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) // 500 AS bin,
      |         count(*) AS n
      |  FROM lineitem WHERE l_orderkey % 2 = 0 GROUP BY 1, 2),
      |b AS (
      |  SELECT l_returnflag,
      |         CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) // 500 AS bin,
      |         count(*) AS n
      |  FROM lineitem WHERE l_orderkey % 2 = 1
      |    AND NOT (floor(l_quantity * 100 + 0.5) > 2500
      |             AND l_orderkey % 3 < 2 AND l_returnflag = 'A')
      |  GROUP BY 1, 2),
      |ta AS (SELECT l_returnflag, CAST(sum(n) AS DOUBLE) AS t FROM a GROUP BY 1),
      |tb AS (SELECT l_returnflag, CAST(sum(n) AS DOUBLE) AS t FROM b GROUP BY 1),
      |j AS (
      |  SELECT coalesce(a.l_returnflag, b.l_returnflag) AS l_returnflag,
      |         coalesce(a.bin, b.bin) AS bin,
      |         coalesce(a.n, 0) AS na, coalesce(b.n, 0) AS nb
      |  FROM a FULL OUTER JOIN b
      |    ON a.l_returnflag = b.l_returnflag AND a.bin = b.bin),
      |c AS (
      |  SELECT j.l_returnflag, j.bin,
      |         (greatest(CAST(na AS DOUBLE) / ta.t, 0.000001) -
      |          greatest(CAST(nb AS DOUBLE) / tb.t, 0.000001)) *
      |         ln(greatest(CAST(na AS DOUBLE) / ta.t, 0.000001) /
      |            greatest(CAST(nb AS DOUBLE) / tb.t, 0.000001)) AS c
      |  FROM j JOIN ta USING (l_returnflag) JOIN tb USING (l_returnflag))
      |SELECT l_returnflag,
      |       round(list_sum(list(c ORDER BY bin)), 6) AS psi,
      |       round(list_sum(list(c ORDER BY bin)), 6) > 0.1 AS drifted
      |FROM c GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val li = t(s, dir, "lineitem")
    val cents = floor(col("l_quantity") * 100 + 0.5).cast("long")
    val a = Sketches.histSketches(li.where(col("l_orderkey") % 2 === 0),
      Seq("l_returnflag"), cents, binWidthCents = 500L)
    val b = Sketches.histSketches(li.where(col("l_orderkey") % 2 === 1 &&
        !(cents > 2500 && col("l_orderkey") % 3 < 2 &&
          col("l_returnflag") === "A")),
      Seq("l_returnflag"), cents, binWidthCents = 500L)
    Sketches.psiDrift(a, b, Seq("l_returnflag"), alarm = 0.1)
      .orderBy("l_returnflag")
  }


  // Fixed-point weighted PageRank (3 iterations, d=0.85) over the
  // nation-trade graph: customer nation → supplier nation edges weighted
  // by lineitem count. Total rank mass is 10^9 integer units and every
  // division floors, so the eigenvector arithmetic is bit-identical
  // across engines — the generic operator (Graphs.pagerank) is the
  // crawl-domain-authority scorer; the edge build here is the
  // corpus-cardinality stage, the iteration is graph-cardinality.
  register(
    "q31_pagerank_trade",
    """WITH e AS (
      |  SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
      |         CAST(count(*) AS BIGINT) AS w
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  GROUP BY 1, 2),
      |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      |nn AS (SELECT count(*) AS n FROM nodes),
      |ow AS (SELECT src, sum(w) AS outw FROM e GROUP BY src),
      |r0 AS (SELECT node, 1000000000 // (SELECT n FROM nn) AS rank
      |       FROM nodes),
      |r1 AS (SELECT nodes.node,
      |         (15 * (1000000000 // (SELECT n FROM nn))) // 100 +
      |         (85 * coalesce(m.s, 0)) // 100 AS rank
      |       FROM nodes LEFT JOIN (
      |         SELECT e.dst AS node, sum((r0.rank * e.w) // ow.outw) AS s
      |         FROM e JOIN ow ON e.src = ow.src
      |                JOIN r0 ON r0.node = e.src
      |         GROUP BY e.dst) m ON m.node = nodes.node),
      |r2 AS (SELECT nodes.node,
      |         (15 * (1000000000 // (SELECT n FROM nn))) // 100 +
      |         (85 * coalesce(m.s, 0)) // 100 AS rank
      |       FROM nodes LEFT JOIN (
      |         SELECT e.dst AS node, sum((r1.rank * e.w) // ow.outw) AS s
      |         FROM e JOIN ow ON e.src = ow.src
      |                JOIN r1 ON r1.node = e.src
      |         GROUP BY e.dst) m ON m.node = nodes.node),
      |r3 AS (SELECT nodes.node,
      |         (15 * (1000000000 // (SELECT n FROM nn))) // 100 +
      |         (85 * coalesce(m.s, 0)) // 100 AS rank
      |       FROM nodes LEFT JOIN (
      |         SELECT e.dst AS node, sum((r2.rank * e.w) // ow.outw) AS s
      |         FROM e JOIN ow ON e.src = ow.src
      |                JOIN r2 ON r2.node = e.src
      |         GROUP BY e.dst) m ON m.node = nodes.node)
      |SELECT node, CAST(rank AS BIGINT) AS rank_e9
      |FROM r3 ORDER BY node""".stripMargin) { (s, dir) =>
    val edges = t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
    graft.pipeline.Graphs.pagerank(edges, iters = 3, dampingPct = 85)
      .select(col("node"), col("rank").as("rank_e9"))
      .orderBy("node")
  }


  // HITS hubs & authorities (2 full iterations) over the same trade
  // graph — integer "ppm" mass with floor-division L1 rescaling, so the
  // mutual-reinforcement arithmetic is engine-identical. Hub scores flag
  // aggregator nations (broad supplier reach), authority scores flag
  // supply concentration.
  register(
    "q34_hits_trade",
    """WITH e AS (
      |  SELECT DISTINCT c.c_nationkey AS src, s.s_nationkey AS dst
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey),
      |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      |nn AS (SELECT count(*) AS n FROM nodes),
      |h0 AS (SELECT node, 1000000 // (SELECT n FROM nn) AS s FROM nodes),
      |a1r AS (SELECT e.dst AS node, sum(h0.s) AS raw
      |        FROM e JOIN h0 ON h0.node = e.src GROUP BY e.dst),
      |a1 AS (SELECT nodes.node,
      |         CAST((coalesce(a1r.raw, 0) * 1000000) //
      |              (SELECT sum(raw) FROM a1r) AS BIGINT) AS s
      |       FROM nodes LEFT JOIN a1r ON a1r.node = nodes.node),
      |h1r AS (SELECT e.src AS node, sum(a1.s) AS raw
      |        FROM e JOIN a1 ON a1.node = e.dst GROUP BY e.src),
      |h1 AS (SELECT nodes.node,
      |         CAST((coalesce(h1r.raw, 0) * 1000000) //
      |              (SELECT sum(raw) FROM h1r) AS BIGINT) AS s
      |       FROM nodes LEFT JOIN h1r ON h1r.node = nodes.node),
      |a2r AS (SELECT e.dst AS node, sum(h1.s) AS raw
      |        FROM e JOIN h1 ON h1.node = e.src GROUP BY e.dst),
      |a2 AS (SELECT nodes.node,
      |         CAST((coalesce(a2r.raw, 0) * 1000000) //
      |              (SELECT sum(raw) FROM a2r) AS BIGINT) AS s
      |       FROM nodes LEFT JOIN a2r ON a2r.node = nodes.node),
      |h2r AS (SELECT e.src AS node, sum(a2.s) AS raw
      |        FROM e JOIN a2 ON a2.node = e.dst GROUP BY e.src),
      |h2 AS (SELECT nodes.node,
      |         CAST((coalesce(h2r.raw, 0) * 1000000) //
      |              (SELECT sum(raw) FROM h2r) AS BIGINT) AS s
      |       FROM nodes LEFT JOIN h2r ON h2r.node = nodes.node)
      |SELECT h2.node, h2.s AS hub_ppm, a2.s AS auth_ppm
      |FROM h2 JOIN a2 ON a2.node = h2.node
      |ORDER BY h2.node""".stripMargin) { (s, dir) =>
    val edges = t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .distinct()
    graft.pipeline.Graphs.hits(edges, iters = 2)
      .orderBy("node")
  }


  // Sketch-class operator: HLL++ approximate distinct counts per group —
  // at 100 TB the ONLY way to count distinct users/URLs/tokens without a
  // full distinct shuffle (fixed-size sketch per partition, merged). The
  // estimate is engine-specific so there is no DuckDB hash oracle; the
  // rows-only check plus PipelineOpsSpec's error-bound test (vs exact,
  // within 3×rsd) cover it.
  registerNoOracle("q16_approx_distinct") { (s, dir) =>
    t(s, dir, "events").groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users"))
      .orderBy("event_type")
  }


  // The hash-matched face of q16: the HLL estimate itself is
  // engine-specific, but its ERROR BOUND is not — per group, emit the
  // exact distinct count plus whether |hll − exact| <= 3·rsd·exact (the
  // same bound PipelineOpsSpec asserts). DuckDB computes the exact side
  // and the bound claim constant-folds to TRUE, so the sketch's accuracy
  // contract itself becomes a hash-compared row instead of a take-it-on-
  // faith spec assertion.
  register(
    "q16b_approx_distinct_bound",
    """SELECT event_type,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
      |       TRUE AS within_bound
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    t(s, dir, "events").groupBy("event_type")
      .agg(
        count_distinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), 0.02).as("__approx"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("__approx") - col("exact_users")) <=
          lit(3 * 0.02) * col("exact_users")).as("within_bound"))
      .orderBy("event_type")
  }


  // Mergeable HLL sketch store (DataSketches HLL via native
  // hll_sketch_agg): each batch reduces to one fixed-size sketch per
  // group; cross-batch rollups merge sketch BYTES, never re-shuffling
  // raw keys — the incremental replacement for re-running
  // count(DISTINCT) per scheduled-query window. The row pins two
  // claims: (1) the 4-batch-merged estimate is IDENTICAL to the
  // single-pass estimate (HLL unions at a common lgConfigK are
  // lossless), (2) both sit within the 3σ standard-error envelope
  // (1.04/√2¹² ≈ 1.6% per σ) of the exact count, which DuckDB
  // recomputes exactly and constant-folds TRUE.
  register(
    "q25_hll_sketch_store",
    """SELECT event_type,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
      |       TRUE AS merge_lossless, TRUE AS within_eps
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
    val ev = t(s, dir, "events")
    // 4 synthetic ingest batches stand in for dt-partitioned store writes
    val store = Sketches.hllSketches(
      ev.withColumn("__batch", pmod(col("event_id"), lit(4))),
      Seq("event_type", "__batch"), "user_id", lgConfigK = 12)
    val merged = Sketches.hllEstimate(store, Seq("event_type"))
    val direct = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(
        hll_sketch_agg(col("user_id"), 12)).as("__direct"))
    val exact = ev.groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("exact_users"))
    exact.join(merged, "event_type").join(direct, "event_type")
      .select(col("event_type"), col("exact_users"),
        (col("distinct_est") === col("__direct")).as("merge_lossless"),
        (abs(col("distinct_est").cast("double") - col("exact_users")) <=
          lit(3 * 1.04 / math.sqrt(1 << 12)) * col("exact_users"))
          .as("within_eps"))
      .orderBy("event_type")
  }


  // Mergeable MOMENT store (exact sufficient statistics): each batch
  // reduces to per-group (n, Σcents, Σcents²); cross-batch rollups sum
  // integers, so the merged mean/variance is BIT-IDENTICAL to the
  // single-pass aggregate — no error envelope needed, which the row pins
  // (merge_lossless) alongside the derived stats that DuckDB recomputes
  // from the same integer sums with the same expression nesting.
  register(
    "q30_moment_store",
    """WITH m AS (
      |  SELECT l_returnflag,
      |         CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
      |              AS BIGINT) AS s,
      |         CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) *
      |                  CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
      |              AS BIGINT) AS ss
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |       round((CAST(s AS DOUBLE) / 100.0) / n, 6) AS mean,
      |       round((CAST(ss AS DOUBLE) / 10000.0 -
      |              (CAST(s AS DOUBLE) / 100.0) *
      |              (CAST(s AS DOUBLE) / 100.0) / n) / n, 6) AS var_pop,
      |       TRUE AS merge_lossless
      |FROM m ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val li = t(s, dir, "lineitem")
    val cents = floor(col("l_quantity") * 100 + 0.5).cast("long")
    // 4 synthetic ingest batches stand in for dt-partitioned store writes
    val store = Sketches.momentSketches(
      li.withColumn("__batch", pmod(col("l_orderkey"), lit(4))),
      Seq("l_returnflag", "__batch"), cents)
    val merged = Sketches.momentMerge(store, Seq("l_returnflag"))
    val direct = Sketches.momentSketches(li, Seq("l_returnflag"), cents)
      .select(col("l_returnflag"), col("n").as("__nd"), col("s").as("__sd"),
        col("ss").as("__ssd"))
    Sketches.momentStats(merged).join(direct, "l_returnflag")
      .select(col("l_returnflag"), col("n"), col("mean"), col("var_pop"),
        (col("n") === col("__nd") && col("s") === col("__sd") &&
          col("ss") === col("__ssd")).as("merge_lossless"))
      .orderBy("l_returnflag")
  }


  // SCD type-2 upsert: an append log of entity versions (snapshot + three
  // deterministic change batches, one of them pure no-ops) assembles into
  // validity-interval rows — MERGE-style dimension history over the
  // historical store. No-op versions (tracked attributes identical to the
  // predecessor) emit no row; intervals are integer epoch-days, so both
  // engines agree bit-for-bit. One hash exchange on the key feeds both
  // windows.
  register(
    "q33_scd2_upsert",
    """WITH v AS (
      |  SELECT o_orderkey AS k, epoch_us(o_orderdate) // 86400000000 AS d,
      |         o_orderstatus AS status,
      |         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
      |  FROM orders),
      |log AS (
      |  SELECT k, d, status, price_cents FROM v
      |  UNION ALL
      |  SELECT k, d + 30, 'F2', price_cents + price_cents // 10
      |  FROM v WHERE k % 7 = 0
      |  UNION ALL
      |  SELECT k, d + 60, 'F2', price_cents + price_cents // 10
      |  FROM v WHERE k % 14 = 0
      |  UNION ALL
      |  SELECT k, d + 90, 'X', price_cents + price_cents // 10 + 5
      |  FROM v WHERE k % 21 = 0),
      |lagged AS (
      |  SELECT *, lag(status) OVER w AS ps, lag(price_cents) OVER w AS pp
      |  FROM log WINDOW w AS (PARTITION BY k ORDER BY d)),
      |changed AS (
      |  SELECT k, d, status, price_cents FROM lagged
      |  WHERE ps IS NULL OR status != ps OR price_cents != pp)
      |SELECT k AS o_orderkey, status, price_cents,
      |       d AS valid_from, lead(d) OVER w AS valid_to,
      |       lead(d) OVER w IS NULL AS is_current
      |FROM changed WINDOW w AS (PARTITION BY k ORDER BY d)
      |ORDER BY o_orderkey, valid_from""".stripMargin) { (s, dir) =>
    val v = t(s, dir, "orders").select(
      col("o_orderkey").as("k"),
      // orderdate is TIMESTAMP_NTZ; cast in the UTC session zone = the
      // naive instant DuckDB's epoch_us sees (see Tables.normalize)
      expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
        .as("d"),
      col("o_orderstatus").as("status"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("price_cents"))
    val upd1 = v.where(col("k") % 7 === 0).select(col("k"),
      (col("d") + 30).as("d"), lit("F2").as("status"),
      (col("price_cents") + expr("price_cents div 10")).as("price_cents"))
    val noop = v.where(col("k") % 14 === 0).select(col("k"),
      (col("d") + 60).as("d"), lit("F2").as("status"),
      (col("price_cents") + expr("price_cents div 10")).as("price_cents"))
    val upd2 = v.where(col("k") % 21 === 0).select(col("k"),
      (col("d") + 90).as("d"), lit("X").as("status"),
      (col("price_cents") + expr("price_cents div 10") + 5).as("price_cents"))
    graft.history.Scd.scd2(v.unionAll(upd1).unionAll(noop).unionAll(upd2),
        Seq("k"), "d", Seq("status", "price_cents"))
      .select(col("k").as("o_orderkey"), col("status"), col("price_cents"),
        col("valid_from"), col("valid_to"), col("is_current"))
      .orderBy("o_orderkey", "valid_from")
  }


  // Array-valued result surface: per-user sorted distinct event types —
  // the reference's alert `outputs`/`log_sources` style list columns as a
  // query result (shared/alert.py:212-242). The list is projected to a
  // canonical comma-joined string on BOTH sides because the driver's
  // pandas-based oracle cannot sort list cells (r4: TypeError unhashable
  // numpy.ndarray); the semantics proven are identical — same distinct
  // set, same order. The NATIVE array<string>-through-parquet path stays
  // proven by PipelineOpsSpec ("array-valued results round-trip parquet").
  register(
    "q17_array_agg",
    """SELECT user_id,
      |       array_to_string(list_sort(list(DISTINCT event_type)), ',')
      |         AS event_types,
      |       count(*) AS n_events
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
    q17Native(s, dir)
      .withColumn("event_types", array_join(col("event_types"), ","))
      .orderBy("user_id")
  }


  // Exact triangle count over the undirected nation trade graph — the
  // degree-orientation shape (Graphs.triangleCount) that survives hub
  // skew at 100 TB: every wedge is generated at its lowest-(degree, id)
  // apex, bounding per-key fan-out by O(sqrt(edges)) instead of the hub
  // degree. The oracle brute-forces the a<b<c triple join in DuckDB.
  register(
    "q53_triangle_count",
    """WITH e0 AS (
      |  SELECT DISTINCT least(c.c_nationkey, s.s_nationkey) AS a,
      |         greatest(c.c_nationkey, s.s_nationkey) AS b
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  WHERE c.c_nationkey <> s.s_nationkey)
      |SELECT CAST(count(*) AS BIGINT) AS triangles
      |FROM e0 ab JOIN e0 bc ON ab.b = bc.a
      |JOIN e0 ac ON ac.a = ab.a AND ac.b = bc.b""".stripMargin) { (s, dir) =>
    val edges = t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
    graft.pipeline.Graphs.triangleCount(edges)
  }


  // k-core of the trade graph (rows-only: the peel fixpoint is not
  // SQL-expressible; the planted twin below hash-proves the mechanism).
  registerNoOracle("q56_kcore") { (s, dir) =>
    val edges = t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
    graft.pipeline.Graphs.kCore(edges, k = 8).orderBy("node")
  }


  // Planted k-core twin: K6 clique on nodes 0..5 with a 20-node chain
  // hung off node 5. At k = 4 every chain node has degree <= 2 and
  // peels in round 1; the clique survives with in-core degree exactly
  // 5 and round 2 is the no-op fixpoint — the answer is analytic.
  register(
    "q56b_kcore_planted",
    """SELECT i AS node, CAST(5 AS BIGINT) AS deg
      |FROM range(0, 6) r(i) ORDER BY node""".stripMargin) { (s, dir) =>
    val ids = s.range(6).toDF("i")
    val clique = ids.as("x").join(ids.as("y"), col("x.i") < col("y.i"))
      .select(col("x.i").as("src"), col("y.i").as("dst"))
    val chain = s.range(5, 25).toDF("i")
      .select(col("i").as("src"), (col("i") + 1).as("dst"))
    graft.pipeline.Graphs.kCore(clique.unionAll(chain), k = 4)
      .orderBy("node")
  }


  // Local clustering coefficient per nation over the trade graph —
  // per-node triangle membership from the same degree-oriented machinery
  // as q53, divided by the node's possible neighbor pairs. The density
  // signal that separates genuine communities from hub spam.
  register(
    "q55_clustering_coeff",
    """WITH e0 AS (
      |  SELECT DISTINCT least(c.c_nationkey, s.s_nationkey) AS a,
      |         greatest(c.c_nationkey, s.s_nationkey) AS b
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  WHERE c.c_nationkey <> s.s_nationkey),
      |und AS (SELECT a AS src FROM e0 UNION ALL SELECT b FROM e0),
      |deg AS (SELECT src AS node, count(*) AS deg FROM und GROUP BY src),
      |tri AS (
      |  SELECT unnest([ab.a, ab.b, bc.b]) AS node
      |  FROM e0 ab JOIN e0 bc ON ab.b = bc.a
      |  JOIN e0 ac ON ac.a = ab.a AND ac.b = bc.b),
      |tn AS (SELECT node, count(*) AS triangles FROM tri GROUP BY node)
      |SELECT deg.node, CAST(deg.deg AS BIGINT) AS deg,
      |       CAST(coalesce(tn.triangles, 0) AS BIGINT) AS triangles,
      |       CASE WHEN deg.deg >= 2
      |            THEN round(coalesce(tn.triangles, 0) * 2.0 /
      |                       (deg.deg * (deg.deg - 1)), 6)
      |            ELSE 0.0 END AS coeff
      |FROM deg LEFT JOIN tn USING (node) ORDER BY node""".stripMargin) { (s, dir) =>
    val edges = t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
    graft.pipeline.Graphs.clusteringCoefficient(edges).orderBy("node")
  }


  // Seeded label propagation over the trade graph: every 5th nation is a
  // labeled seed (its region), two clamped spreading rounds label the
  // rest — the semi-supervised label-expansion primitive (propagate a few
  // human quality/toxicity labels through a similarity graph). Integer
  // mass, unnormalized, ties to the smallest label — the oracle unrolls
  // both rounds as CTEs (the q31 fixed-point pattern).
  register(
    "q54_label_propagation",
    """WITH e0 AS (
      |  SELECT DISTINCT least(c.c_nationkey, s.s_nationkey) AS a,
      |         greatest(c.c_nationkey, s.s_nationkey) AS b
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  WHERE c.c_nationkey <> s.s_nationkey),
      |und AS (SELECT a AS src, b AS dst FROM e0
      |        UNION ALL SELECT b AS src, a AS dst FROM e0),
      |seeds AS (SELECT n_nationkey AS node, CAST(n_regionkey AS BIGINT) AS label
      |          FROM nation WHERE n_nationkey % 5 = 0),
      |s0 AS (SELECT node, label, CAST(1000000 AS BIGINT) AS m FROM seeds),
      |p1 AS (SELECT und.dst AS node, s0.label AS label,
      |              CAST(sum(s0.m) AS BIGINT) AS m
      |       FROM und JOIN s0 ON und.src = s0.node GROUP BY 1, 2),
      |s1 AS (SELECT node, label, m FROM p1
      |       WHERE node NOT IN (SELECT node FROM seeds)
      |       UNION ALL SELECT node, label, m FROM s0),
      |p2 AS (SELECT und.dst AS node, s1.label AS label,
      |              CAST(sum(s1.m) AS BIGINT) AS m
      |       FROM und JOIN s1 ON und.src = s1.node GROUP BY 1, 2),
      |s2 AS (SELECT node, label, m FROM p2
      |       WHERE node NOT IN (SELECT node FROM seeds)
      |       UNION ALL SELECT node, label, m FROM s0)
      |SELECT node, label FROM (
      |  SELECT node, label,
      |         row_number() OVER (PARTITION BY node
      |                            ORDER BY m DESC, label ASC) AS rn
      |  FROM s2) WHERE rn = 1 ORDER BY node""".stripMargin) { (s, dir) =>
    val edges = t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
    val seeds = t(s, dir, "nation").where(col("n_nationkey") % 5 === 0)
      .select(col("n_nationkey").as("node"), col("n_regionkey").as("label"))
    graft.pipeline.Graphs.labelPropagation(edges, seeds, iters = 2)
      .orderBy("node")
  }
}
