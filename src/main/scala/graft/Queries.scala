package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables
import graft.pipeline.Dedup

/** The operator-coverage query registry (SURVEY.md §2).
  *
  * Each entry is a Spark DataFrame pipeline over the TESTDATA.md parquet
  * tables plus, when the semantics are ANSI-SQL expressible, a DuckDB
  * oracle string with identical column aliases. Money aggregations use
  * exact integer-cents arithmetic — floor(x*100 + 0.5) on both sides — so
  * the hash compare is summation-order-insensitive (see the q1 comment).
  */
object Queries {

  private type Q = (SparkSession, String) => DataFrame

  private val entries = scala.collection.mutable.LinkedHashMap[String, (Q, Option[String])]()

  private def register(name: String, oracle: String)(fn: Q): Unit =
    entries(name) = (fn, Some(oracle))

  private def registerNoOracle(name: String)(fn: Q): Unit =
    entries(name) = (fn, None)

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** One per-JVM scratch root for the snapshot-store queries (q39/q40/p3),
    * removed recursively on shutdown — Bench re-executes those queries
    * n>=3 times and a bare createTempDirectory would leak a committed
    * parquet store under /tmp per execution. */
  private lazy val scratchRoot: java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft_scratch")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(p.toFile)
    }))
    p
  }

  private def scratchDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(scratchRoot, prefix).toString

  /** Cache for the recall-bound rows' brute-force GROUND-TRUTH sides,
    * keyed (session, sfDir, harness). The ground truth is deliberately
    * id-bounded (O(1) in corpus size) verification rig, not the scale
    * path — the measured pipelines (d2/d3/d5 full-corpus runs) still
    * execute in full on every rep; only the exact-pair harness, identical
    * across reps and shared between d2e and d3c (same id slice, same
    * 2-gram shingles — the J >= 0.7 set is a subset of the J >= 0.5 set,
    * and any J >= 0.7 pair passes the 2x length prune), is computed once
    * per (session, sf). */
  private val harnessCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), DataFrame]()
  private def cachedHarness(s: SparkSession, dir: String, key: String)(
      build: => DataFrame): DataFrame = {
    // evict entries owned by stopped sessions (their checkpoint blocks
    // died with the context; the stale DataFrame handles must not pin the
    // session object or accumulate across sessions in one JVM)
    val it = harnessCache.keySet.iterator()
    while (it.hasNext) if (it.next()._1.sparkContext.isStopped) it.remove()
    harnessCache.computeIfAbsent((s, dir, key), _ => build.localCheckpoint())
  }

  /** Shared d2e/d3c ground truth: all (id_a < id_b) pairs among
    * doc_id < 500 with 2-gram-shingle Jaccard >= 0.5, with the j value. */
  private def exactJaccardPairs(s: SparkSession, dir: String): DataFrame =
    cachedHarness(s, dir, "jaccard_pairs_500") {
      // shingle once per DOC and MATERIALIZE (localCheckpoint): the
      // inequality join is a nested loop whose condition/projection would
      // otherwise re-run the shingle pipeline per candidate pair
      val sh = t(s, dir, "documents").where(col("doc_id") < 500)
        .select(col("doc_id"), Dedup.wordShingles(col("text"), 2).as("s"))
        .withColumn("n", size(col("s")))
        .repartition(32)
        .localCheckpoint()
      // length-ratio prune: J(A,B) >= 0.5 forces |A| and |B| within 2x of
      // each other, so most pairs skip the array intersect entirely
      sh.as("a").join(sh.as("b"),
          col("a.doc_id") < col("b.doc_id") &&
            col("a.n") * 2 >= col("b.n") && col("b.n") * 2 >= col("a.n"))
        .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
          round(Dedup.jaccard(col("a.s"), col("b.s")), 6).as("j"))
        .where(col("j") >= 0.5)
    }

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

  // Span-corruption transform (Raffel et al. 2020, T5): two id-derived
  // word spans are replaced by sentinels in the input and emitted as the
  // target sequence — the denoising-objective prep, RNG-free like t40 so
  // epochs reproduce across runs/engines. Token-array slicing is pure
  // scan-side arithmetic; spans are disjoint by construction (first span
  // in the first half, second in the second half).
  register(
    "t41_span_corruption",
    """WITH w AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
      |                             x -> x != '') AS toks
      |  FROM documents),
      |cut AS (
      |  SELECT doc_id, toks, len(toks) AS n,
      |         1 + (doc_id * 13) % greatest(len(toks) // 2 - 2, 1) AS s1,
      |         len(toks) // 2 + 1 +
      |           (doc_id * 29 + 7) % greatest((len(toks) + 1) // 2 - 2, 1) AS s2
      |  FROM w WHERE len(toks) >= 8)
      |SELECT doc_id,
      |       coalesce(array_to_string(toks[1:s1-1], ' '), '') || ' <X> ' ||
      |       coalesce(array_to_string(toks[s1+2:s2-1], ' '), '') || ' <Y> ' ||
      |       coalesce(array_to_string(toks[s2+2:n], ' '), '') AS corrupted,
      |       '<X> ' || array_to_string(toks[s1:s1+1], ' ') ||
      |       ' <Y> ' || array_to_string(toks[s2:s2+1], ' ') || ' <Z>'
      |         AS target
      |FROM cut ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val toks = graft.pipeline.TextAnalysis.tokens(lower(col("text")))
    t(s, dir, "documents")
      .select(col("doc_id"), toks.as("toks"))
      .where(size(col("toks")) >= 8)
      .withColumn("n", size(col("toks")))
      .withColumn("s1", lit(1) +
        (col("doc_id") * 13) % greatest(expr("n div 2") - 2, lit(1)))
      .withColumn("s2", expr("n div 2") + 1 +
        (col("doc_id") * 29 + 7) % greatest(expr("(n + 1) div 2") - 2, lit(1)))
      .select(col("doc_id"),
        concat(
          array_join(expr("slice(toks, 1, cast(s1 - 1 as int))"), " "),
          lit(" <X> "),
          array_join(expr("slice(toks, cast(s1 + 2 as int), cast(s2 - s1 - 2 as int))"), " "),
          lit(" <Y> "),
          array_join(expr("slice(toks, cast(s2 + 2 as int), cast(n - s2 - 1 as int))"), " "))
          .as("corrupted"),
        concat(
          lit("<X> "), array_join(expr("slice(toks, cast(s1 as int), 2)"), " "),
          lit(" <Y> "), array_join(expr("slice(toks, cast(s2 as int), 2)"), " "),
          lit(" <Z>")).as("target"))
      .orderBy("doc_id")
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

  // Fill-in-middle transform (Bavarian et al. 2022): each document is
  // deterministically cut into (prefix, middle, suffix) at two
  // id-derived character offsets and re-emitted in PSM order with
  // sentinels — the pretraining transform that teaches infilling. Pure
  // integer cut-point arithmetic + substring, scan-side, zero shuffle;
  // the id-derived offsets make the transform reproducible across runs
  // and engines (no RNG), which is what makes the epoch deterministic.
  register(
    "t40_fim_transform",
    """SELECT doc_id,
      |       '<PRE>' || substr(text, 1, a) ||
      |       '<SUF>' || substr(text, b + 1) ||
      |       '<MID>' || substr(text, a + 1, b - a) AS fim
      |FROM (
      |  SELECT doc_id, text,
      |         least(lo, hi) AS a, greatest(lo, hi) AS b
      |  FROM (
      |    SELECT doc_id, text,
      |           1 + (doc_id * 37) % greatest(len(text) - 2, 1) AS lo,
      |           1 + (doc_id * 61 + 13) % greatest(len(text) - 2, 1) AS hi
      |    FROM documents WHERE len(text) >= 3))
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    t(s, dir, "documents")
      .where(length(col("text")) >= 3)
      .withColumn("__m", greatest(length(col("text")) - 2, lit(1)))
      .withColumn("lo", lit(1) + (col("doc_id") * 37) % col("__m"))
      .withColumn("hi", lit(1) + (col("doc_id") * 61 + 13) % col("__m"))
      .withColumn("a", least(col("lo"), col("hi")))
      .withColumn("b", greatest(col("lo"), col("hi")))
      .select(col("doc_id"), concat(
        lit("<PRE>"), expr("substring(text, 1, cast(a as int))"),
        lit("<SUF>"), expr("substring(text, cast(b as int) + 1)"),
        lit("<MID>"), expr("substring(text, cast(a as int) + 1, cast(b - a as int))"))
        .as("fim"))
      .orderBy("doc_id")
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

  // ---------------------------------------------------------------------------
  // Classifier operators (SURVEY §2.2): each query serializes testdata rows
  // into the wire format the operator consumes, runs the REAL classify
  // pipeline, and projects the typed record — so the DuckDB oracle is the
  // identity projection over the original table.
  // ---------------------------------------------------------------------------

  import graft.classify.Classifier
  import graft.core.LogSchema

  // O1: JSON parser — parse + strict key check + coercion round-trip.
  register(
    "o1_json_parser",
    "SELECT event_id, event_type, value AS val, props FROM events") { (s, dir) =>
    val raw = t(s, dir, "events").select(
      to_json(struct(col("event_id"), col("event_type"), col("value"), col("props")))
        .as("line"))
    new Classifier(Seq(DemoSchemas.jsonEvents))
      .classify(raw, "line").forType("demo:json_events")
      .select(
        col("record.event_id").as("event_id"),
        col("record.event_type").as("event_type"),
        col("record.value").as("val"),
        col("record.props").as("props"))
  }

  // O1b + O8: json_path record explosion with envelope extraction — one
  // payload becomes two child records, each carrying the parent's event_id.
  register(
    "o1_json_path_envelope",
    """SELECT event_id, 1 AS n, value AS v FROM events
      |UNION ALL
      |SELECT event_id, 2 AS n, value + 1 AS v FROM events""".stripMargin) { (s, dir) =>
    val raw = t(s, dir, "events").select(
      to_json(struct(
        col("event_id"),
        array(
          struct(lit(1).as("n"), col("value").as("v")),
          struct(lit(2).as("n"), (col("value") + 1).as("v"))).as("Records")))
        .as("line"))
    new Classifier(Seq(DemoSchemas.jsonNested))
      .classify(raw, "line").forType("demo:json_nested")
      .select(
        col(s"${LogSchema.EnvelopeKey}.event_id").as("event_id"),
        col("record.n").as("n"),
        col("record.v").as("v"))
  }

  // O1b: json_regex_key — a JSON blob embedded in a string field (the
  // osquery-via-syslog shape) regex-extracted then parsed
  // (parsers.py:520,565-593).
  register(
    "o1b_json_regex_key",
    "SELECT event_id, event_type FROM events") { (s, dir) =>
    import graft.core.FieldType._
    val schema = graft.core.LogSchema(
      name = "demo:json_regex", parser = graft.core.ParserKind.Json,
      schema = TStruct.of("event_id" -> TInteger, "event_type" -> TString),
      jsonRegexKey = Some("data"))
    val raw = t(s, dir, "events").select(
      to_json(struct(
        concat(lit("app[123]: "),
          to_json(struct(col("event_id"), col("event_type")))).as("data"))).as("line"))
    new Classifier(Seq(schema)).classify(raw, "line").forType("demo:json_regex")
      .select(col("record.event_id").as("event_id"),
        col("record.event_type").as("event_type"))
  }

  // O1c: embedded_json — json_path children that are STRINGIFIED JSON,
  // parsed a second time (parsers.py:546-563; the CloudWatch-Logs shape).
  register(
    "o1c_embedded_json",
    "SELECT event_id, event_type FROM events") { (s, dir) =>
    import graft.core.FieldType._
    val schema = graft.core.LogSchema(
      name = "demo:json_embedded", parser = graft.core.ParserKind.Json,
      schema = TStruct.of("event_id" -> TInteger, "event_type" -> TString),
      jsonPath = Some("logs[]"), embeddedJson = true)
    val raw = t(s, dir, "events").select(
      to_json(struct(array(
        to_json(struct(col("event_id"), col("event_type")))).as("logs"))).as("line"))
    new Classifier(Seq(schema)).classify(raw, "line").forType("demo:json_embedded")
      .select(col("record.event_id").as("event_id"),
        col("record.event_type").as("event_type"))
  }

  // O2: CSV parser — positional columns to schema keys.
  register(
    "o2_csv_parser",
    "SELECT p_partkey AS partkey, p_brand AS brand, p_size AS psize FROM part") { (s, dir) =>
    val raw = t(s, dir, "part").select(
      concat_ws(",", col("p_partkey"), col("p_brand"), col("p_size")).as("line"))
    new Classifier(Seq(DemoSchemas.csvParts))
      .classify(raw, "line").forType("demo:csv_parts")
      .select(
        col("record.partkey").as("partkey"),
        col("record.brand").as("brand"),
        col("record.psize").as("psize"))
  }

  // O3: KV parser — delimiter/separator split into schema keys.
  register(
    "o3_kv_parser",
    "SELECT user_id AS uid, event_type AS etype, event_id AS eid FROM events") { (s, dir) =>
    val raw = t(s, dir, "events").select(
      concat(lit("uid="), col("user_id"), lit(" etype="), col("event_type"),
        lit(" eid="), col("event_id")).as("line"))
    new Classifier(Seq(DemoSchemas.kvEvents))
      .classify(raw, "line").forType("demo:kv_events")
      .select(
        col("record.uid").as("uid"),
        col("record.etype").as("etype"),
        col("record.eid").as("eid"))
  }

  // O3b: KV duplicate-key positional fallback (parsers.py:795-801) — the
  // repeated key 'k' lands in the schema key at its position ('k2').
  register(
    "o3b_kv_duplicate_keys",
    "SELECT user_id AS k, event_type AS k2, event_id AS eid FROM events") { (s, dir) =>
    import graft.core.FieldType._
    val schema = graft.core.LogSchema(
      name = "demo:kv_dup", parser = graft.core.ParserKind.Kv,
      schema = TStruct.of("k" -> TInteger, "k2" -> TString, "eid" -> TInteger))
    val raw = t(s, dir, "events").select(
      concat(lit("k="), col("user_id"), lit(" k="), col("event_type"),
        lit(" eid="), col("event_id")).as("line"))
    new Classifier(Seq(schema)).classify(raw, "line").forType("demo:kv_dup")
      .select(
        col("record.k").as("k"),
        col("record.k2").as("k2"),
        col("record.eid").as("eid"))
  }

  // O4: Syslog parser — fixed regex into 4 fields.
  register(
    "o4_syslog_parser",
    """SELECT concat('h-', CAST(user_id AS VARCHAR)) AS host,
      |       concat('app', CAST(event_id AS VARCHAR)) AS application,
      |       concat(event_type, ' event') AS message
      |FROM events""".stripMargin) { (s, dir) =>
    val raw = t(s, dir, "events").select(
      concat(lit("Jan 10 19:35:33 h-"), col("user_id"), lit(" app"), col("event_id"),
        lit(": "), col("event_type"), lit(" event")).as("line"))
    new Classifier(Seq(DemoSchemas.syslog))
      .classify(raw, "line").forType("demo:syslog")
      .select(
        col("record.host").as("host"),
        col("record.application").as("application"),
        col("record.message").as("message"))
  }

  // O5: schema resolution — mixed csv/kv input, first full parse wins,
  // per-type routing counts.
  register(
    "o5_schema_resolution",
    """SELECT * FROM (
      |  SELECT 'demo:csv_parts' AS log_schema_type, count(*) AS n FROM part
      |  UNION ALL
      |  SELECT 'demo:kv_events' AS log_schema_type, count(*) AS n FROM events)
      |ORDER BY log_schema_type""".stripMargin) { (s, dir) =>
    val csvLines = t(s, dir, "part").select(
      concat_ws(",", col("p_partkey"), col("p_brand"), col("p_size")).as("line"))
    val kvLines = t(s, dir, "events").select(
      concat(lit("uid="), col("user_id"), lit(" etype="), col("event_type"),
        lit(" eid="), col("event_id")).as("line"))
    new Classifier(Seq(DemoSchemas.csvParts, DemoSchemas.kvEvents))
      .classify(csvLines.unionAll(kvLines), "line")
      .tagged.groupBy("log_schema_type").agg(count(lit(1)).as("n"))
      .orderBy("log_schema_type")
  }

  // O5b: cluster data_sources candidate filtering (classifier.py:82-114) —
  // two sources declare IDENTICAL schemas; the resource's source config
  // admits only 'beta', so every record classifies as beta:events even
  // though alpha:events is declared first and would otherwise win.
  register(
    "o5b_data_sources_filter",
    "SELECT 'beta:events' AS log_schema_type, count(*) AS n FROM events") { (s, dir) =>
    import graft.core.FieldType._
    def schemaFor(src: String) = graft.core.LogSchema(
      name = s"$src:events", parser = graft.core.ParserKind.Json,
      schema = TStruct.of("event_id" -> TInteger, "event_type" -> TString))
    val ds = Map("kinesis" -> Map("stream-1" -> Seq("beta")))
    val candidates = graft.core.DataSources.candidates(
      Seq(schemaFor("alpha"), schemaFor("beta")), ds, "kinesis", "stream-1")
    val raw = t(s, dir, "events").select(
      to_json(struct(col("event_id"), col("event_type"))).as("line"))
    new Classifier(candidates).classify(raw, "line")
      .tagged.groupBy("log_schema_type").agg(count(lit(1)).as("n"))
  }

  // O6: type coercion + optional-key zero-value back-fill.
  register(
    "o6_coercion_optionals",
    "SELECT event_id, '' AS opt_s, 0 AS opt_i FROM events") { (s, dir) =>
    val raw = t(s, dir, "events").select(
      to_json(struct(col("event_id").cast("string").as("event_id"))).as("line"))
    new Classifier(Seq(DemoSchemas.jsonOptional))
      .classify(raw, "line").forType("demo:json_optional")
      .select(
        col("record.event_id").as("event_id"),
        col("record.opt_s").as("opt_s"),
        col("record.opt_i").as("opt_i"))
  }

  // O9: invalid-record routing — records failing coercion go to the
  // dead-letter stream; valid/invalid split counts.
  register(
    "o9_invalid_routing",
    """SELECT CAST(sum(CASE WHEN event_id % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_invalid,
      |       CAST(sum(CASE WHEN event_id % 10 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_valid
      |FROM events""".stripMargin) { (s, dir) =>
    val raw = t(s, dir, "events").select(
      to_json(struct(
        when(col("event_id") % 10 === 0, lit("bad"))
          .otherwise(col("event_id").cast("string")).as("event_id"),
        col("event_type"), col("value"), col("props"))).as("line"))
    val c = new Classifier(Seq(DemoSchemas.jsonEvents.copy(schema =
      graft.core.FieldType.TStruct.of(
        "event_id" -> graft.core.FieldType.TInteger,
        "event_type" -> graft.core.FieldType.TString,
        "value" -> graft.core.FieldType.TFloat,
        "props" -> graft.core.FieldType.TString))))
      .classify(raw, "line")
    c.tagged.agg(
      sum(when(col("log_schema_type").isNull, 1).otherwise(0)).as("n_invalid"),
      sum(when(col("log_schema_type").isNull, 0).otherwise(1)).as("n_valid"))
  }

  // O10: log_patterns fnmatch filter — only event types matching p*/s* classify.
  register(
    "o10_log_patterns",
    """SELECT event_type AS etype, count(*) AS n FROM events
      |WHERE event_type LIKE 'p%' OR event_type LIKE 's%'
      |GROUP BY event_type ORDER BY etype""".stripMargin) { (s, dir) =>
    val raw = t(s, dir, "events").select(
      to_json(struct(col("event_id"), col("event_type").as("etype"))).as("line"))
    new Classifier(Seq(DemoSchemas.jsonPatterned))
      .classify(raw, "line").forType("demo:json_patterned")
      .groupBy(col("record.etype").as("etype")).agg(count(lit(1)).as("n"))
      .orderBy("etype")
  }

  // ---------------------------------------------------------------------------
  // Rules engine (SURVEY §2.3) + alert construction (§2.4 A1): rules run over
  // the REAL classified stream; the oracle re-states each predicate in SQL.
  // ---------------------------------------------------------------------------

  import graft.rules._

  private def classifiedEvents(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "events").select(
      to_json(struct(col("event_id"), col("event_type"), col("value"), col("props")))
        .as("line"))
    new Classifier(Seq(DemoSchemas.jsonEvents))
      .classify(raw, "line").forType("demo:json_events")
  }

  private val fixedClock = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")

  // R1+R2: dispatch by log type, predicate evaluation, multi-rule explosion.
  register(
    "r1_rule_dispatch",
    """SELECT * FROM (
      |  SELECT 'any_error' AS rule_name, count(*) AS n FROM events WHERE event_type = 'error'
      |  UNION ALL
      |  SELECT 'big_value' AS rule_name, count(*) AS n FROM events WHERE value > 150)
      |ORDER BY rule_name""".stripMargin) { (s, dir) =>
    val rules = Seq(
      Rule("any_error", RuleOpts(logs = Seq("demo:json_events")),
        rec => rec.getField("event_type") === "error"),
      Rule("big_value", RuleOpts(logs = Seq("demo:json_events")),
        rec => rec.getField("value") > 150))
    new RulesEngine(rules, deterministicIds = true, clock = Some(fixedClock))
      .evaluate(classifiedEvents(s, dir), "demo:json_events")
      .groupBy("rule_name").agg(count(lit(1)).as("n")).orderBy("rule_name")
  }

  // R2 projection + A1 alert field surface (fixed clock for determinism).
  register(
    "r2_alert_construction",
    """SELECT 'high_value_error' AS rule_name,
      |       TIMESTAMP '2024-01-01 00:00:00' AS created,
      |       'local' AS cluster, 'demo:json_events' AS log_type,
      |       'aws-firehose:alerts,slack:alerts' AS outputs,
      |       event_id, value AS val
      |FROM events WHERE event_type = 'error' AND value > 100""".stripMargin) { (s, dir) =>
    val rules = Seq(
      Rule("high_value_error",
        RuleOpts(logs = Seq("demo:json_events"), outputs = Seq("slack:alerts")),
        rec => rec.getField("event_type") === "error" && rec.getField("value") > 100))
    new RulesEngine(rules, deterministicIds = true, clock = Some(fixedClock))
      .evaluate(classifiedEvents(s, dir), "demo:json_events")
      .select(
        col("rule_name"), col("created"), col("cluster"), col("log_type"),
        array_join(col("outputs"), ",").as("outputs"),
        col("record.event_id").as("event_id"),
        col("record.value").as("val"))
  }

  // R3: matchers ANDed ahead of the rule body.
  register(
    "r3_matchers",
    """SELECT event_id FROM events
      |WHERE event_type = 'purchase' AND value > 100""".stripMargin) { (s, dir) =>
    val m = new MatcherRegistry
    m.register("is_purchase")(rec => rec.getField("event_type") === "purchase")
    val rules = Seq(
      Rule("big_purchase", RuleOpts(logs = Seq("demo:json_events"), matchers = Seq("is_purchase")),
        rec => rec.getField("value") > 100))
    new RulesEngine(rules, m, deterministicIds = true, clock = Some(fixedClock))
      .evaluate(classifiedEvents(s, dir), "demo:json_events")
      .select(col("record.event_id").as("event_id"))
  }

  // R4: req_subkeys null-safety guard over a nested optional struct.
  register(
    "r4_req_subkeys",
    """SELECT event_id FROM events
      |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) % 5 != 0""".stripMargin) { (s, dir) =>
    import graft.core.FieldType._
    val schema = graft.core.LogSchema(
      name = "demo:json_subkeys", parser = graft.core.ParserKind.Json,
      schema = TStruct.of("event_id" -> TInteger,
        "props" -> TStruct.of("k" -> TInteger)),
      optionalTopLevelKeys = Set("props"))
    val raw = t(s, dir, "events").select(
      to_json(struct(
        col("event_id"),
        when(get_json_object(col("props"), "$.k").cast("long") % 5 =!= 0,
          struct(get_json_object(col("props"), "$.k").cast("long").as("k")))
          .as("props"))).as("line"))
    val typed = new Classifier(Seq(schema)).classify(raw, "line").forType("demo:json_subkeys")
    val rules = Seq(
      Rule("has_k", RuleOpts(logs = Seq("demo:json_subkeys"),
        reqSubkeys = Map("props" -> Seq("k"))), _ => lit(true)))
    new RulesEngine(rules, deterministicIds = true, clock = Some(fixedClock))
      .evaluate(typed, "demo:json_subkeys")
      .select(col("record.event_id").as("event_id"))
  }

  // R6: helper library — CIDR membership + prefix matching as codegen'd
  // Column predicates.
  register(
    "r6_helpers",
    """SELECT event_id,
      |       concat(CASE WHEN user_id % 2 = 0 THEN '10.0.' ELSE '192.168.' END,
      |              CAST(user_id % 256 AS VARCHAR), '.',
      |              CAST(event_id % 256 AS VARCHAR)) AS ip
      |FROM events
      |WHERE user_id % 2 = 0
      |  AND (event_type LIKE 'p%' OR event_type LIKE 's%')""".stripMargin) { (s, dir) =>
    import graft.core.FieldType._
    val schema = graft.core.LogSchema(
      name = "demo:json_ip", parser = graft.core.ParserKind.Json,
      schema = TStruct.of("event_id" -> TInteger, "etype" -> TString, "ip" -> TString))
    val raw = t(s, dir, "events").select(
      to_json(struct(
        col("event_id"), col("event_type").as("etype"),
        concat(
          when(col("user_id") % 2 === 0, lit("10.0.")).otherwise(lit("192.168.")),
          (col("user_id") % 256).cast("string"), lit("."),
          (col("event_id") % 256).cast("string")).as("ip"))).as("line"))
    val typed = new Classifier(Seq(schema)).classify(raw, "line").forType("demo:json_ip")
    val rules = Seq(
      Rule("internal_ps", RuleOpts(logs = Seq("demo:json_ip")), rec =>
        Helpers.inNetwork(rec.getField("ip"), Seq("10.0.0.0/8")) &&
          Helpers.startsWithAny(rec.getField("etype"), Seq("p", "s"))))
    new RulesEngine(rules, deterministicIds = true, clock = Some(fixedClock))
      .evaluate(typed, "demo:json_ip")
      .select(col("record.event_id").as("event_id"), col("record.ip").as("ip"))
  }

  // R10: per-rule stats via observe() metrics (shared/stats.py:26-100) —
  // counts ride the alerts action as AggregateMetrics, zero extra passes;
  // the query materializes the collected Observation as rows. alerts_total
  // is the sum of per-rule counts (a record firing k rules is k alerts).
  register(
    "r10_rule_stats",
    """SELECT * FROM (
      |  SELECT 'any_error' AS rule_name, count(*) AS n FROM events
      |  WHERE event_type = 'error'
      |  UNION ALL
      |  SELECT 'big_value', count(*) FROM events WHERE value > 150
      |  UNION ALL
      |  SELECT '__total__',
      |         (SELECT count(*) FROM events WHERE event_type = 'error')
      |         + (SELECT count(*) FROM events WHERE value > 150))
      |ORDER BY rule_name""".stripMargin) { (s, dir) =>
    import graft.rules.RuleStats
    val rules = Seq(
      Rule("any_error", RuleOpts(logs = Seq("demo:json_events")),
        rec => rec.getField("event_type") === "error"),
      Rule("big_value", RuleOpts(logs = Seq("demo:json_events")),
        rec => rec.getField("value") > 150))
    val alerts = new RulesEngine(rules, deterministicIds = true, clock = Some(fixedClock))
      .evaluate(classifiedEvents(s, dir), "demo:json_events")
    val (observed, obs) = RuleStats.observed(alerts, rules)
    observed.write.mode("overwrite").format("noop").save() // action -> metrics
    val m = obs.get
    import s.implicits._
    (Seq("__total__" -> m("alerts_total").asInstanceOf[Long]) ++
      rules.map(r => r.name -> m(s"alerts_${r.name}").asInstanceOf[Long]))
      .toDF("rule_name", "n").orderBy("rule_name")
  }

  // R6b: typed-record deep search (shared/utils.py:79-145 get_keys BFS +
  // base.py:203-224 data_has_value_from_substring_list) over a 3-level
  // nested schema with a string list. The needles hit DIFFERENT branches:
  // 'err' matches meta.type for error events, 'tag-3' matches a tags list
  // element — the plan-time BFS must find both without knowing where.
  register(
    "r6b_deep_search",
    """SELECT event_id, event_type AS type_val FROM events
      |WHERE event_type LIKE '%err%'
      |   OR CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 = 3""".stripMargin) {
    (s, dir) =>
    import graft.core.FieldType._
    val schema = graft.core.LogSchema(
      name = "demo:json_deep", parser = graft.core.ParserKind.Json,
      schema = TStruct.of(
        "event_id" -> TInteger,
        "meta" -> TStruct.of(
          "type" -> TString,
          "inner" -> TStruct.of("v" -> TFloat)),
        "tags" -> TList))
    val raw = t(s, dir, "events").select(
      to_json(struct(
        col("event_id"),
        struct(col("event_type").as("type"),
          struct(col("value").as("v")).as("inner")).as("meta"),
        array(concat(lit("tag-"),
          (get_json_object(col("props"), "$.k").cast("long") % 10).cast("string")))
          .as("tags"))).as("line"))
    val typed = new Classifier(Seq(schema)).classify(raw, "line")
      .forType("demo:json_deep")
    val recType = typed.schema("record").dataType
    val rec = col("record")
    typed
      .where(Helpers.dataHasValueFromSubstringList(rec, recType, Seq("err", "tag-3")))
      .select(col("record.event_id").as("event_id"),
        Helpers.getFirstKey(rec, recType, "type", lit("(n/a)")).as("type_val"))
  }

  // R11+R12: dynamic outputs computed from the record, unioned with rule +
  // required outputs, ':'-validated.
  register(
    "r11_dynamic_outputs",
    """SELECT event_id,
      |       concat('aws-firehose:alerts,pagerduty:',
      |              CASE WHEN value > 150 THEN 'high' ELSE 'low' END,
      |              ',slack:chan') AS outputs
      |FROM events WHERE event_type = 'error'""".stripMargin) { (s, dir) =>
    val rules = Seq(
      Rule("dyn", RuleOpts(logs = Seq("demo:json_events"),
        outputs = Seq("slack:chan", "bad-no-colon"),
        dynamicOutputs = Some(rec => array(
          concat(lit("pagerduty:"),
            when(rec.getField("value") > 150, lit("high")).otherwise(lit("low")))))),
        rec => rec.getField("event_type") === "error"))
    new RulesEngine(rules, deterministicIds = true, clock = Some(fixedClock))
      .evaluate(classifiedEvents(s, dir), "demo:json_events")
      .select(
        col("record.event_id").as("event_id"),
        array_join(col("outputs"), ",").as("outputs"))
  }

  // ---------------------------------------------------------------------------
  // Normalization (O11), artifacts (O12), sanitization (O7), datatype rules (R5)
  // ---------------------------------------------------------------------------

  import graft.classify.{ArtifactExtractor, Normalizer, Sanitizer}
  import graft.core.{NormCondition, NormalizedField}
  import graft.core.FieldType._

  private val normSchema = graft.core.LogSchema(
    name = "demo:json_norm", parser = graft.core.ParserKind.Json,
    schema = TStruct.of("event_id" -> TInteger, "etype" -> TString, "k" -> TInteger))

  private val normConfig: Map[String, Seq[NormalizedField]] = Map(
    "event_category" -> Seq(NormalizedField(
      path = Seq("etype"), function = Some("Event category"),
      condition = Some(NormCondition(Seq("etype"), "in", Seq("purchase", "signup"))))),
    "numeric_k" -> Seq(NormalizedField(path = Seq("k"), function = Some("K value"))),
    "hidden_id" -> Seq(NormalizedField(path = Seq("event_id"), sendToArtifacts = false)))

  private def normalizedEvents(s: SparkSession, dir: String): DataFrame = {
    val raw = t(s, dir, "events").select(
      to_json(struct(col("event_id"), col("event_type").as("etype"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))).as("line"))
    val typed = new Classifier(Seq(normSchema)).classify(raw, "line")
      .forType("demo:json_norm")
    typed
      .withColumn(Normalizer.NormalizationKey,
        Normalizer.normalizationCol(col("record"), normConfig, Some(normSchema.schema)))
      .withColumn(Normalizer.RecordIdKey,
        Normalizer.recordIdCol(col(Normalizer.NormalizationKey),
          deterministicFrom = Some(col("record.event_id"))))
  }

  // O11: normalization map + conditional extraction + falsey semantics.
  register(
    "o11_normalization",
    """SELECT event_id,
      |  CASE WHEN event_type IN ('purchase','signup') THEN event_type ELSE '' END AS cat,
      |  CASE WHEN CAST(json_extract_string(props,'$.k') AS BIGINT) != 0
      |       THEN json_extract_string(props,'$.k') ELSE '' END AS kv
      |FROM events""".stripMargin) { (s, dir) =>
    normalizedEvents(s, dir).select(
      col("record.event_id").as("event_id"),
      array_join(Normalizer.valuesForNormalizedType(
        col(Normalizer.NormalizationKey), "event_category"), ",").as("cat"),
      array_join(Normalizer.valuesForNormalizedType(
        col(Normalizer.NormalizationKey), "numeric_k"), ",").as("kv"))
  }

  // O12: artifact explosion into 5 string columns; send_to_artifacts=false
  // entries skipped.
  register(
    "o12_artifacts",
    """SELECT 'Event category' AS function, md5(CAST(event_id AS VARCHAR)) AS streamalert_record_id,
      |       'demo:json_norm' AS source_type, 'event_category' AS type, event_type AS value
      |FROM events WHERE event_type IN ('purchase','signup')
      |UNION ALL
      |SELECT 'K value', md5(CAST(event_id AS VARCHAR)), 'demo:json_norm', 'numeric_k',
      |       json_extract_string(props,'$.k')
      |FROM events WHERE CAST(json_extract_string(props,'$.k') AS BIGINT) != 0""".stripMargin) {
    (s, dir) =>
      ArtifactExtractor.artifacts(normalizedEvents(s, dir), "demo:json_norm")
  }

  // O7: key sanitization — hostile (nested) key names rewritten \W -> _ as a
  // pure schema transform before the historical sink.
  register(
    "o7_sanitize_keys",
    """SELECT concat('u', CAST(user_id AS VARCHAR)) AS user_name,
      |       event_id % 500 AS status_code
      |FROM events""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.types._
    val hostileSchema = graft.core.LogSchema(
      name = "demo:json_hostile", parser = graft.core.ParserKind.Json,
      schema = TStruct.of("user name" -> TString, "status-code" -> TInteger))
    val raw = t(s, dir, "events").select(
      to_json(struct(
        concat(lit("u"), col("user_id")).as("user name"),
        (col("event_id") % 500).as("status-code"))).as("line"))
    val typed = new Classifier(Seq(hostileSchema)).classify(raw, "line")
      .forType("demo:json_hostile")
    Sanitizer.sanitizeKeys(typed.select("record.*"))
  }

  // R5: datatype-selected rule reading values via the normalization map
  // (get_values_for_normalized_type).
  register(
    "r5_datatype_rule",
    "SELECT event_id FROM events WHERE event_type = 'purchase'") { (s, dir) =>
    val rules = Seq(
      Rule("purchase_by_datatype",
        RuleOpts(datatypes = Seq("event_category")),
        _ => array_contains(
          Normalizer.valuesForNormalizedType(
            col(Normalizer.NormalizationKey), "event_category"), "purchase")))
    new RulesEngine(rules, deterministicIds = true, clock = Some(fixedClock))
      .evaluate(normalizedEvents(s, dir), "demo:json_norm")
      .select(col("record.event_id").as("event_id"))
  }

  // ---------------------------------------------------------------------------
  // Joins (SURVEY §2.3 R7-R9): threat intel, lookup tables, staging gate
  // ---------------------------------------------------------------------------

  // R7: IOC annotate — explode candidates from the normalization map,
  // broadcast-join the IOC table, CIDR exclusions, re-aggregate per record.
  register(
    "r7_threat_intel",
    """WITH ips AS (
      |  SELECT event_id, user_id,
      |         concat('10.0.', CAST(user_id % 256 AS VARCHAR), '.',
      |                CAST(event_id % 256 AS VARCHAR)) AS ip
      |  FROM events),
      |ioc AS (SELECT DISTINCT ip AS ioc_value FROM ips
      |        WHERE event_id % 13 = 0 AND user_id % 256 != 99)
      |SELECT i.event_id, i.ip FROM ips i JOIN ioc ON i.ip = ioc.ioc_value
      |ORDER BY i.event_id""".stripMargin) { (s, dir) =>
    import graft.core.FieldType._
    val ipSchema = graft.core.LogSchema(
      name = "demo:json_ioc", parser = graft.core.ParserKind.Json,
      schema = TStruct.of("event_id" -> TInteger, "ip" -> TString))
    val ipCol = concat(lit("10.0."), (col("user_id") % 256).cast("string"),
      lit("."), (col("event_id") % 256).cast("string"))
    val raw = t(s, dir, "events").select(
      to_json(struct(col("event_id"), ipCol.as("ip"))).as("line"))
    val typed = new Classifier(Seq(ipSchema)).classify(raw, "line").forType("demo:json_ioc")
      .withColumn(Normalizer.NormalizationKey,
        Normalizer.normalizationCol(col("record"),
          Map("sourceAddress" -> Seq(NormalizedField(path = Seq("ip")))),
          Some(ipSchema.schema)))
      .withColumn(Normalizer.RecordIdKey,
        Normalizer.recordIdCol(col(Normalizer.NormalizationKey),
          deterministicFrom = Some(col("record.event_id"))))
    // IOC table: every 13th event's ip is "malicious" (minus an excluded /24)
    val iocTable = t(s, dir, "events")
      .where(col("event_id") % 13 === 0 && col("user_id") % 256 =!= 99)
      .select(ipCol.as("ioc_value"), lit("ip").as("sub_type")).distinct()
    val ti = new ThreatIntel(iocTable,
      normalizedTypeToIoc = Map("sourceAddress" -> "ip"),
      excluded = Map("ip" -> Seq("10.0.99.0/24")))
    val annotated = ti.annotate(typed)
    annotated.where(size(map_keys(col(ti.IocKey))) > 0)
      .select(col("record.event_id").as("event_id"), col("record.ip").as("ip"))
      .orderBy("event_id")
  }

  // R8: lookup-table reference join — small S3-style doc as a literal map
  // (zero-join path) used inside a rule body.
  register(
    "r8_lookup_table",
    """SELECT c_custkey, c_name, n.n_name AS nation_name
      |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |WHERE n.n_name LIKE 'NATION_1%'""".stripMargin) { (s, dir) =>
    val nationMap = t(s, dir, "nation").collect()
      .map(r => r.getInt(0).toString -> r.getString(1)).toMap
    val lookups = new LookupTables(Map("nations" -> MapLookupTable(nationMap)))
    t(s, dir, "customer")
      .withColumn("nation_name",
        lookups.get("nations", col("c_nationkey"), lit("unknown")))
      .where(Helpers.startsWithAny(col("nation_name"), Seq("NATION_1")))
      .select("c_custkey", "c_name", "nation_name")
  }

  // R8b: DataFrame-style lookup join (the DynamoDB per-key driver analogue)
  // via broadcast-hash join.
  register(
    "r8_lookup_join",
    """SELECT s_suppkey, s_name, coalesce(n.n_name, 'unknown') AS nation_name
      |FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey""".stripMargin) {
    (s, dir) =>
      val table = DataFrameLookupTable(t(s, dir, "nation"), "n_nationkey", "n_name")
      table.join(t(s, dir, "supplier"), col("s_nationkey"), "nation_name", lit("unknown"))
        .select("s_suppkey", "s_name", "nation_name")
  }

  // R9: staging gate — staged rules restricted to required outputs.
  register(
    "r9_staging_gate",
    """SELECT * FROM (
      |  SELECT 'staged_rule' AS rule_name, true AS staged,
      |         'aws-firehose:alerts' AS outputs, count(*) AS n
      |  FROM events WHERE event_type = 'error'
      |  UNION ALL
      |  SELECT 'live_rule', false, 'aws-firehose:alerts,slack:live', count(*)
      |  FROM events WHERE value > 150) ORDER BY rule_name""".stripMargin) { (s, dir) =>
    val rules = Seq(
      Rule("staged_rule", RuleOpts(logs = Seq("demo:json_events"), outputs = Seq("slack:staged")),
        rec => rec.getField("event_type") === "error"),
      Rule("live_rule", RuleOpts(logs = Seq("demo:json_events"), outputs = Seq("slack:live")),
        rec => rec.getField("value") > 150))
    val alerts = new RulesEngine(rules, deterministicIds = true, clock = Some(fixedClock))
      .evaluate(classifiedEvents(s, dir), "demo:json_events")
    val ruleTable = s.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row("staged_rule", true),
        org.apache.spark.sql.Row("live_rule", false)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("rule_name",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("staged",
          org.apache.spark.sql.types.BooleanType))))
    Staging.applyStaging(alerts, ruleTable)
      .groupBy(col("rule_name"), col("staged"), array_join(col("outputs"), ",").as("outputs"))
      .agg(count(lit(1)).as("n"))
      .orderBy("rule_name")
  }

  // ---------------------------------------------------------------------------
  // Alert merge (SURVEY §2.4 A2-A3): anchored-window grouped aggregation.
  // Data is shaped so every (rule, merge-key) group structurally fits one
  // anchored window (span 30min < window 35min) and stays under the 50-cap,
  // making the result expressible as a plain GROUP BY for the oracle.
  // ---------------------------------------------------------------------------

  import graft.alerts.{AlertMerger, MergeInputAlert}

  register(
    "a2_merge_groups",
    """SELECT CAST(event_id // 30 AS VARCHAR) AS merge_keys,
      |       count(*) AS alert_count,
      |       min(TIMESTAMP '2024-01-01 00:00:00'
      |           + to_minutes(CAST(event_id % 4 * 10 AS BIGINT))) AS alert_time_first,
      |       max(TIMESTAMP '2024-01-01 00:00:00'
      |           + to_minutes(CAST(event_id % 4 * 10 AS BIGINT))) AS alert_time_last,
      |       concat('{"mk":"', CAST(event_id // 30 AS VARCHAR), '"}') AS merged_by_json
      |FROM events
      |GROUP BY event_id // 30 ORDER BY CAST(event_id // 30 AS BIGINT)""".stripMargin) {
    (s, dir) =>
      import org.apache.spark.sql.Encoders
      implicit val enc = Encoders.product[MergeInputAlert]
      val alerts = t(s, dir, "events").select(
        md5(col("event_id").cast("string")).as("alert_id"),
        lit("merge_demo").as("rule_name"),
        // 1704067200 = 2024-01-01T00:00:00Z; +10min per (event_id % 4)
        (lit(1704067200L) + col("event_id") % 4 * 600L).cast(TimestampType).as("created"),
        to_json(struct(
          col("event_id"),
          floor(col("event_id") / 30).cast("string").as("mk"))).as("record_json"),
        lit("mk").as("merge_by_keys"),
        lit(35).as("merge_window_mins"),
        array(lit("aws-firehose:alerts")).as("outputs"),
        lit(false).as("staged"),
        // precomputed merge-key values (the RulesEngine path) — grouping
        // then needs no JSON parse
        floor(col("event_id") / 30).cast("string").as("merge_key_vals"))
        .as[MergeInputAlert]
      AlertMerger.mergeBatch(alerts)
        .select(col("merge_keys"), col("alert_count"), col("alert_time_first"),
          col("alert_time_last"), col("merged_by_json"))
        .orderBy(col("merge_keys").cast("long"))
  }

  // A3: merged-record common/diff surface (alert.py:289-380). Records carry a
  // group-constant field ('svc' -> always in OtherCommonKeys) and a varying
  // field ('etype' -> common iff uniform in the group, else per-alert diffs
  // keyed by the alert's created Instant). The corpus is shaped so both JSON
  // fields are exactly constructible in SQL: flat records, distinct whole-
  // second created per group member, deterministic field order (svc, etype).
  register(
    "a3_merge_common_diff",
    """WITH base AS (
      |  SELECT event_id // 30 AS grp,
      |         'svc-' || CAST((event_id // 30) % 3 AS VARCHAR) AS svc,
      |         event_type AS etype,
      |         TIMESTAMP '2024-01-01 00:00:00'
      |           + to_seconds(CAST(event_id % 30 AS BIGINT)) AS created
      |  FROM events),
      |g AS (
      |  SELECT grp, any_value(svc) AS svc, count(*) AS n,
      |         min(etype) AS min_e, max(etype) AS max_e
      |  FROM base GROUP BY grp),
      |d AS (
      |  SELECT b.grp,
      |         string_agg(
      |           '"' || strftime(b.created, '%Y-%m-%dT%H:%M:%SZ') || '":'
      |             || CASE WHEN g.min_e = g.max_e THEN '{}'
      |                     ELSE '{"etype":"' || b.etype || '"}' END,
      |           ',' ORDER BY b.created) AS body
      |  FROM base b JOIN g USING (grp) GROUP BY b.grp)
      |SELECT CAST(g.grp AS VARCHAR) AS merge_keys,
      |       g.n AS alert_count,
      |       CASE WHEN g.min_e = g.max_e
      |            THEN '{"svc":"' || g.svc || '","etype":"' || g.min_e || '"}'
      |            ELSE '{"svc":"' || g.svc || '"}' END AS other_common_keys_json,
      |       '{' || d.body || '}' AS value_diffs_json
      |FROM g JOIN d USING (grp)""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.Encoders
    implicit val enc = Encoders.product[MergeInputAlert]
    val grp = floor(col("event_id") / 30).cast("string")
    val alerts = t(s, dir, "events").select(
      md5(col("event_id").cast("string")).as("alert_id"),
      lit("common_diff_demo").as("rule_name"),
      (lit(1704067200L) + col("event_id") % 30).cast(TimestampType).as("created"),
      to_json(struct(
        grp.as("mk"),
        concat(lit("svc-"), (floor(col("event_id") / 30) % 3).cast("string")).as("svc"),
        col("event_type").as("etype"))).as("record_json"),
      lit("mk").as("merge_by_keys"),
      lit(35).as("merge_window_mins"),
      array(lit("aws-firehose:alerts")).as("outputs"),
      lit(false).as("staged"),
      grp.as("merge_key_vals"))
      .as[MergeInputAlert]
    AlertMerger.mergeBatch(alerts)
      .select(col("merge_keys"), col("alert_count"),
        col("other_common_keys_json"), col("value_diffs_json"))
  }

  // A4/A6: dispatch round-trip (alert_processor/main.py:76-151). Alerts fan
  // out to per-service FileDispatchers once; the redelivery proof then runs
  // the production ledger gate (Outputs.freshAgainst) against the landed
  // sink read back ONCE — the same frame also yields the final counts, so
  // the second fan-out's duplicate explode/collect/empty-append jobs fold
  // away while the idempotence assertion (ledger filters every alert)
  // stays. Counts are exactly one per (alert_id, output) because the sink
  // dir doubles as the outputs_sent ledger (main.py:99-115); a true double
  // fanOut through the dispatcher is pinned at unit scale in PipelineSpec.
  register(
    "a6_dispatch_roundtrip",
    """SELECT * FROM (
      |  SELECT 'aws-firehose:alerts' AS output, 'any_purchase' AS rule_name,
      |         count(*) AS n
      |  FROM events WHERE event_type = 'purchase'
      |  UNION ALL
      |  SELECT 'aws-firehose:alerts', 'big_error', count(*) FROM events
      |  WHERE event_type = 'error' AND value > 100
      |  UNION ALL
      |  SELECT 'slack:alerts', 'big_error', count(*) FROM events
      |  WHERE event_type = 'error' AND value > 100)
      |ORDER BY output, rule_name""".stripMargin) { (s, dir) =>
    import graft.alerts.Outputs
    val root = s"/tmp/graft_a6_${dir.replaceAll("\\W", "_")}"
    val rootFile = new java.io.File(root)
    if (rootFile.exists()) org.apache.commons.io.FileUtils.deleteDirectory(rootFile)
    val rules = Seq(
      Rule("any_purchase", RuleOpts(logs = Seq("demo:json_events")),
        rec => rec.getField("event_type") === "purchase"),
      Rule("big_error",
        RuleOpts(logs = Seq("demo:json_events"), outputs = Seq("slack:alerts")),
        rec => rec.getField("event_type") === "error" && rec.getField("value") > 100))
    // persisted across the two fan-outs: the classify->rules pipeline
    // evaluates once, both deliveries read the cache
    val alerts = new RulesEngine(rules, deterministicIds = true, clock = Some(fixedClock))
      .evaluate(classifiedEvents(s, dir), "demo:json_events").persist()
    val dispatchers = Map(
      "aws-firehose" -> Outputs.FileDispatcher(s"$root/aws-firehose"),
      "slack" -> Outputs.FileDispatcher(s"$root/slack"))
    try {
      Outputs.fanOut(alerts, dispatchers)
      val sinks = Seq(
        "aws-firehose:alerts" -> s"$root/aws-firehose/alerts",
        "slack:alerts" -> s"$root/slack/alerts")
        .map { case (out, path) => out -> s.read.parquet(path).persist() }
      try {
        // redelivery: the production gate must filter EVERY alert against
        // the landed ledger — one union job instead of a second fan-out
        val redelivered = sinks.map { case (out, sent) =>
          Outputs.freshAgainst(
            alerts.where(array_contains(col("outputs"), out)),
            Some(sent.select("alert_id").distinct()))
            .select("alert_id")
        }.reduce(_ unionAll _)
        require(redelivered.isEmpty,
          "outputs_sent ledger failed to gate redelivery")
        sinks.map { case (out, sent) =>
          sent.select(lit(out).as("output"), col("rule_name"), col("alert_id"))
        }
          .reduce(_ unionAll _)
          .groupBy("output", "rule_name").agg(count(lit(1)).as("n"))
          .orderBy("output", "rule_name")
          .localCheckpoint(eager = true) // 3 rows; lets the sink caches release
      } finally sinks.foreach(_._2.unpersist(false))
    } finally alerts.unpersist()
  }

  // A4/A6: the attempt-ledger retry loop, oracle-proven end-to-end — a
  // transiently failing dispatcher records a failed attempt WITHOUT
  // aborting the fan-out; the next fan-out retries exactly the unsent
  // pairs (attempts=2) and never re-dispatches sent ones (attempts stays
  // 1). The ledger state IS the reference alert table's Attempts /
  // OutputsSent bookkeeping (shared/alert_table.py:84-190).
  register(
    "a7_attempt_ledger",
    """SELECT * FROM (
      |  SELECT 'aws-firehose:alerts' AS output, CAST(1 AS BIGINT) AS attempts,
      |         true AS sent, count(*) AS n_pairs
      |  FROM events WHERE event_id < 20000
      |    AND (event_type = 'purchase' OR (event_type = 'error' AND value > 100))
      |  UNION ALL
      |  SELECT 'slack:alerts', CAST(2 AS BIGINT), true, count(*)
      |  FROM events WHERE event_id < 20000
      |    AND event_type = 'error' AND value > 100)
      |ORDER BY output""".stripMargin) { (s, dir) =>
    import graft.alerts.Outputs
    val root = s"/tmp/graft_a7_${dir.replaceAll("\\W", "_")}"
    val rootFile = new java.io.File(root)
    if (rootFile.exists()) org.apache.commons.io.FileUtils.deleteDirectory(rootFile)
    val rules = Seq(
      Rule("any_purchase", RuleOpts(logs = Seq("demo:json_events")),
        rec => rec.getField("event_type") === "purchase"),
      Rule("big_error",
        RuleOpts(logs = Seq("demo:json_events"), outputs = Seq("slack:alerts")),
        rec => rec.getField("event_type") === "error" && rec.getField("value") > 100))
    // the event_id cap is pushed to the parquet scan, BEFORE the JSON
    // round-trip — filtering the classified frame instead would serialize
    // and re-parse the whole events table to keep 2% of it
    val raw = t(s, dir, "events").where(col("event_id") < 20000).select(
      to_json(struct(col("event_id"), col("event_type"), col("value"), col("props")))
        .as("line"))
    val typed = new Classifier(Seq(DemoSchemas.jsonEvents))
      .classify(raw, "line").forType("demo:json_events")
    val alerts = new RulesEngine(rules, deterministicIds = true, clock = Some(fixedClock))
      .evaluate(typed, "demo:json_events")
      .persist()
    val ledger = Outputs.AttemptLedger(s"$root/ledger")
    // slack is transiently down for the first fan-out only
    var slackDown = true
    val dispatchers = Map(
      "aws-firehose" -> Outputs.FileDispatcher(s"$root/aws-firehose"),
      "slack" -> Outputs.WebhookDispatcher((_, _) =>
        if (slackDown) sys.error("transient 500")))
    try {
      val r1 = Outputs.fanOutTracked(alerts, dispatchers, ledger,
        clock = Some(fixedClock))
      require(r1("slack:alerts") == false && r1("aws-firehose:alerts") == true,
        s"expected slack down / firehose up on attempt 1, got $r1")
      slackDown = false
      val r2 = Outputs.fanOutTracked(alerts, dispatchers, ledger,
        clock = Some(fixedClock))
      require(r2("slack:alerts") == true, s"expected slack retry to succeed, got $r2")
      ledger.state(s).groupBy("output", "attempts", "sent")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("output")
        .localCheckpoint(eager = true)
    } finally alerts.unpersist()
  }

  // ---------------------------------------------------------------------------
  // Sources (S1-S3), historical store + partition pruning (S6), scheduled
  // queries (§2.5), streamquery re-injection (S10), rule promotion (§3.3),
  // publishers (A5)
  // ---------------------------------------------------------------------------

  import graft.sources.Sources
  import graft.history.{HistoricalSink, RulePromotion, ScheduledQueries}
  import graft.alerts.Publishers

  // S1: kinesis-style base64(+gzip) payload decode -> classify.
  register(
    "s1_kinesis_decode",
    "SELECT event_id, event_type FROM events") { (s, dir) =>
    val gzB64 = udf { (text: String) =>
      val bos = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(bos)
      gz.write(text.getBytes("UTF-8")); gz.close()
      java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
    }
    val encoded = t(s, dir, "events").select(gzB64(
      to_json(struct(col("event_id"), col("event_type")))).as("data"))
    val schema = graft.core.LogSchema(
      name = "demo:kinesis", parser = graft.core.ParserKind.Json,
      schema = graft.core.FieldType.TStruct.of(
        "event_id" -> graft.core.FieldType.TInteger,
        "event_type" -> graft.core.FieldType.TString))
    new Classifier(Seq(schema))
      .classify(encoded.select(Sources.decodeKinesisData(col("data")).as("value")))
      .forType("demo:kinesis")
      .select(col("record.event_id").as("event_id"),
        col("record.event_type").as("event_type"))
  }

  // S2: whole-object S3 drop — pretty-printed multi-line JSON objects (one
  // gzip-compressed) read wholetext, minified, classified via json_path
  // explosion (ref s3.py:124-174: gz reader -> json.load -> jsonlines).
  register(
    "s2_s3_object",
    "SELECT event_id, event_type FROM events WHERE event_id < 120") { (s, dir) =>
    val root = new java.io.File(s"/tmp/graft_s2_${dir.replaceAll("\\W", "_")}")
    if (root.exists()) org.apache.commons.io.FileUtils.deleteDirectory(root)
    root.mkdirs()
    // fixture prep (driver-side, 120 tiny rows — test scaffolding, not the
    // operator): 4 pretty-printed {"Records":[...]} documents, the
    // CloudTrail-export shape, one of them gzipped
    val rows = t(s, dir, "events").where(col("event_id") < 120)
      .select(col("event_id"), col("event_type")).collect()
    rows.groupBy(r => r.getLong(0) % 4).foreach { case (k, rs) =>
      val recs = rs.map(r =>
        s"""    {\n      "event_id": ${r.getLong(0)},\n      "event_type": "${r.getString(1)}"\n    }""")
        .mkString(",\n")
      val doc = s"{\n  \"Records\": [\n$recs\n  ]\n}\n"
      if (k == 3) {
        val out = new java.util.zip.GZIPOutputStream(
          new java.io.FileOutputStream(new java.io.File(root, s"obj_$k.json.gz")))
        out.write(doc.getBytes("UTF-8")); out.close()
      } else
        java.nio.file.Files.writeString(root.toPath.resolve(s"obj_$k.json"), doc)
    }
    val schema = graft.core.LogSchema(
      name = "demo:s3_object", parser = graft.core.ParserKind.Json,
      schema = graft.core.FieldType.TStruct.of(
        "event_id" -> graft.core.FieldType.TInteger,
        "event_type" -> graft.core.FieldType.TString),
      jsonPath = Some("Records[]"))
    new Classifier(Seq(schema)).classify(Sources.objectDrop(s, root.getPath))
      .forType("demo:s3_object")
      .select(col("record.event_id").as("event_id"),
        col("record.event_type").as("event_type"))
  }

  // S3: SNS envelope unwrap -> classify the inner message.
  register(
    "s3_sns_unwrap",
    "SELECT event_id, value AS val FROM events") { (s, dir) =>
    val envelope = t(s, dir, "events").select(
      to_json(struct(struct(
        to_json(struct(col("event_id"), col("value"))).as("Message")).as("Sns")))
        .as("envelope"))
    val schema = graft.core.LogSchema(
      name = "demo:sns", parser = graft.core.ParserKind.Json,
      schema = graft.core.FieldType.TStruct.of(
        "event_id" -> graft.core.FieldType.TInteger,
        "value" -> graft.core.FieldType.TFloat))
    new Classifier(Seq(schema))
      .classify(envelope.select(Sources.snsMessage(col("envelope")).as("value")))
      .forType("demo:sns")
      .select(col("record.event_id").as("event_id"), col("record.value").as("val"))
  }

  // S6: historical sink round-trip — write alerts dt-partitioned, read back
  // with a dt predicate (partition-pruned scan).
  register(
    "s6_historical_sink",
    """SELECT count(*) AS n FROM events WHERE event_type = 'error'""".stripMargin) { (s, dir) =>
    val alerts = {
      val rules = Seq(Rule("err", RuleOpts(logs = Seq("demo:json_events")),
        rec => rec.getField("event_type") === "error"))
      new RulesEngine(rules, deterministicIds = true, clock = Some(fixedClock))
        .evaluate(classifiedEvents(s, dir), "demo:json_events")
    }
    val root = s"/tmp/graft_hist_${dir.replaceAll("\\W", "_")}"
    val dirF = new java.io.File(s"$root/demo_events")
    if (dirF.exists()) org.apache.commons.io.FileUtils.deleteDirectory(dirF)
    HistoricalSink.write(alerts, root, "demo:events")
    s.read.parquet(s"$root/demo_events")
      .where(col("dt") === "2024-01-01-00")
      .agg(count(lit(1)).as("n"))
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

  // S10: scheduled-query results wrapped as streamquery records, re-entering
  // the classifier, fields recovered downstream.
  register(
    "s10_streamquery_reinject",
    """SELECT 'hourly_by_flag' AS qname, l_returnflag AS flag, count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY flag""".stripMargin) { (s, dir) =>
    val result = t(s, dir, "lineitem")
      .groupBy(col("l_returnflag").as("flag")).agg(count(lit(1)).as("n"))
    val wrapped = ScheduledQueries.asStreamQueryRecords(result, "hourly_by_flag")
    val sqSchema = graft.core.LogSchema(
      name = "streamquery:version1", parser = graft.core.ParserKind.Json,
      schema = graft.core.FieldType.TStruct.of(
        "streamquery_name" -> graft.core.FieldType.TString,
        "streamquery_version" -> graft.core.FieldType.TString,
        "data" -> graft.core.FieldType.TString))
    new Classifier(Seq(sqSchema)).classify(wrapped, "value")
      .forType("streamquery:version1")
      .select(
        col("record.streamquery_name").as("qname"),
        get_json_object(col("record.data"), "$.flag").as("flag"),
        get_json_object(col("record.data"), "$.n").cast("long").as("n"))
      .orderBy("flag")
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

  // A5: publisher chain — strip internal fields, publication JSON produced.
  register(
    "a5_publishers",
    """SELECT event_id, 'high_value' AS rule_name FROM events
      |WHERE value > 150 ORDER BY event_id""".stripMargin) { (s, dir) =>
    val rules = Seq(Rule("high_value", RuleOpts(logs = Seq("demo:json_events")),
      rec => rec.getField("value") > 150))
    val alerts = new RulesEngine(rules, deterministicIds = true, clock = Some(fixedClock))
      .evaluate(classifiedEvents(s, dir), "demo:json_events")
      .withColumn("staged", lit(false))
    Publishers.publish(alerts, Seq("remove_internal_fields"))
      .select(col("record.event_id").as("event_id"), col("rule_name"))
      .orderBy("event_id")
  }

  // A5c: real publication shapes — the slack default message (header,
  // mrkdwn'd record attachment with sorted bolded keys / tabbed nesting /
  // html escape, rule-description pretext; slack.py:68-149,297-412) and the
  // pagerduty-v2 event (descriptor-namespaced dedup_key, critical payload;
  // pagerduty.py:56-144) — every published field reconstructed
  // byte-for-byte in SQL.
  register(
    "a5c_publishers_shapes",
    """SELECT event_id,
      |  '*StreamAlert Rule Triggered: high_value*' AS slack_text,
      |  'Record:' AS slack_title,
      |  '*Rule Description:*' || chr(10) || 'Large value event' || chr(10) AS slack_pretext,
      |  '*event_id:* ' || event_id || chr(10)
      |    || '*event_type:* ' || event_type || chr(10)
      |    || '*note:* a&lt;b&amp;c&quot;d&#x27;e' || chr(10)
      |    || '*tags:*' || chr(10)
      |    || chr(9) || '*[1]* x' || chr(10) || chr(9) || '*[2]* y' || chr(10)
      |    || '*who:*' || chr(10) || chr(9) || '*uid:* ' || user_id AS slack_mrkdwn,
      |  'demo:' || md5(CAST(event_id AS VARCHAR)) AS pd_dedup_key,
      |  'StreamAlert Rule Triggered - high_value' AS pd_summary,
      |  'demo:json_events' AS pd_source,
      |  'critical' AS pd_severity,
      |  event_id AS pd_event_id,
      |  'StreamAlert high_value' AS jira_summary,
      |  'SECOPS' AS jira_project,
      |  'Task' AS jira_issuetype,
      |  '{code:JSON}' || to_json(struct_pack(record := struct_pack(
      |     event_id := event_id, event_type := event_type,
      |     note := 'a<b&c"d''e', tags := ['x','y'],
      |     who := struct_pack(uid := user_id)))) || '{code}' AS jira_description
      |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin) { (s, dir) =>
    import graft.alerts.Publishers
    val alerts = t(s, dir, "events").where(col("event_id") < 200)
      .select(
        md5(col("event_id").cast("string")).as("alert_id"),
        lit("high_value").as("rule_name"),
        lit("Large value event").as("rule_description"),
        lit("demo:json_events").as("log_type"),
        struct(col("event_id"), col("event_type"),
          lit("a<b&c\"d'e").as("note"),
          array(lit("x"), lit("y")).as("tags"),
          struct(col("user_id").as("uid")).as("who")).as("record"))
    Publishers.register("pagerduty_v2_demo")(
      Publishers.pagerDutyV2Event(routingKey = "demo-routing-key", descriptor = "demo"))
    val slack = Publishers.publish(alerts, Seq("slack_message"))
      .select(col("alert_id"), col("record.event_id").as("event_id"),
        get_json_object(col("publication"), "$.text").as("slack_text"),
        get_json_object(col("publication"), "$.attachments[0].title").as("slack_title"),
        get_json_object(col("publication"), "$.attachments[0].pretext").as("slack_pretext"),
        get_json_object(col("publication"), "$.attachments[0].text").as("slack_mrkdwn"))
    val pd = Publishers.publish(alerts, Seq("pagerduty_v2_demo"))
      .select(col("alert_id"),
        get_json_object(col("publication"), "$.dedup_key").as("pd_dedup_key"),
        get_json_object(col("publication"), "$.payload.summary").as("pd_summary"),
        get_json_object(col("publication"), "$.payload.source").as("pd_source"),
        get_json_object(col("publication"), "$.payload.severity").as("pd_severity"),
        get_json_object(col("publication"), "$.payload.custom_details.record.event_id")
          .cast("long").as("pd_event_id"))
    Publishers.register("jira_demo")(
      Publishers.jiraIssueFields(projectKey = "SECOPS", issueType = "Task"))
    // record_only first: the jira body renders the publication dict, here
    // pinned to the record so the oracle byte-matches the {code:JSON} block
    val jira = Publishers.publish(alerts, Seq("record_only", "jira_demo"))
      .select(col("alert_id"),
        get_json_object(col("publication"), "$.summary").as("jira_summary"),
        get_json_object(col("publication"), "$.project.key").as("jira_project"),
        get_json_object(col("publication"), "$.issuetype.name").as("jira_issuetype"),
        get_json_object(col("publication"), "$.description").as("jira_description"))
    slack.join(pd, "alert_id").join(jira, "alert_id")
      .drop("alert_id").orderBy("event_id")
  }

  // A5d: github + teams publication shapes (the two most commonly deployed
  // dialects after a5c's slack/pagerduty/jira). The github issue body IS
  // json.dumps(record, indent=2, sort_keys=True) in a fenced block
  // (github.py:110-114) — reconstructed byte-for-byte in SQL including
  // two-space nesting, sorted keys, and JSON string escaping; the teams
  // card (teams.py:95-154) checks title/text/themeColor plus both facts
  // sections.
  register(
    "a5d_publishers_github_teams",
    """SELECT event_id,
      |  'StreamAlert: high_value' AS gh_title,
      |  '### Description' || chr(10) || 'Large value event' || chr(10) || chr(10)
      |    || '### Event data' || chr(10) || chr(10) || '```' || chr(10)
      |    || '{' || chr(10)
      |    || '  "event_id": ' || event_id || ',' || chr(10)
      |    || '  "event_type": "' || event_type || '",' || chr(10)
      |    || '  "note": "a<b&c\"d''e",' || chr(10)
      |    || '  "tags": [' || chr(10)
      |    || '    "x",' || chr(10)
      |    || '    "y"' || chr(10)
      |    || '  ],' || chr(10)
      |    || '  "who": {' || chr(10)
      |    || '    "uid": ' || user_id || chr(10)
      |    || '  }' || chr(10)
      |    || '}' || chr(10) || '```' AS gh_body,
      |  '["security","streamalert"]' AS gh_labels,
      |  'StreamAlert Rule Triggered: high_value' AS tm_title,
      |  'Large value event' AS tm_text,
      |  'E81123' AS tm_color,
      |  'Alert Info' AS tm_alert_title,
      |  'high_value' AS tm_fact_rule,
      |  md5(CAST(event_id AS VARCHAR)) AS tm_fact_alert_id,
      |  'StreamAlert Alert Record' AS tm_record_title,
      |  'a<b&c"d''e' AS tm_fact_note,
      |  CAST(event_id AS VARCHAR) AS tm_fact_event_id
      |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin) { (s, dir) =>
    import graft.alerts.Publishers
    val alerts = t(s, dir, "events").where(col("event_id") < 200)
      .select(
        md5(col("event_id").cast("string")).as("alert_id"),
        lit("high_value").as("rule_name"),
        lit("Large value event").as("rule_description"),
        lit("demo:json_events").as("log_type"),
        struct(col("event_id"), col("event_type"),
          lit("a<b&c\"d'e").as("note"),
          array(lit("x"), lit("y")).as("tags"),
          struct(col("user_id").as("uid")).as("who")).as("record"))
    Publishers.register("github_demo")(
      Publishers.githubIssue(labels = Seq("security", "streamalert")))
    val gh = Publishers.publish(alerts, Seq("github_demo"))
      .select(col("alert_id"), col("record.event_id").as("event_id"),
        get_json_object(col("publication"), "$.title").as("gh_title"),
        get_json_object(col("publication"), "$.body").as("gh_body"),
        get_json_object(col("publication"), "$.labels").as("gh_labels"))
    Publishers.register("teams_demo")(Publishers.teamsCard())
    val tm = Publishers.publish(alerts, Seq("teams_demo"))
      .select(col("alert_id"),
        get_json_object(col("publication"), "$.title").as("tm_title"),
        get_json_object(col("publication"), "$.text").as("tm_text"),
        get_json_object(col("publication"), "$.themeColor").as("tm_color"),
        get_json_object(col("publication"), "$.sections[0].activityTitle").as("tm_alert_title"),
        get_json_object(col("publication"), "$.sections[0].facts[0].value").as("tm_fact_rule"),
        get_json_object(col("publication"), "$.sections[0].facts[1].value").as("tm_fact_alert_id"),
        get_json_object(col("publication"), "$.sections[1].activityTitle").as("tm_record_title"),
        get_json_object(col("publication"), "$.sections[1].facts[2].value").as("tm_fact_note"),
        get_json_object(col("publication"), "$.sections[1].facts[0].value").as("tm_fact_event_id"))
    gh.join(tm, "alert_id").drop("alert_id").orderBy("event_id")
  }

  // A5e: victorops + komand + demisto publication shapes. Demisto is the
  // interesting one: the publication flattens into sorted string labels
  // with RUNTIME list indices (record.tags[0], record.tags[1]) — the
  // byte-exact labels JSON is reconstructed in SQL below.
  register(
    "a5e_publishers_victorops_demisto",
    """SELECT event_id,
      |  'CRITICAL' AS vo_message_type,
      |  'streamalert/alert' AS vo_entity_id,
      |  'high_value' AS vo_entity_display_name,
      |  event_id AS vo_event_id,
      |  'high_value' AS ko_data_rule,
      |  'high_value' AS dm_name,
      |  'StreamAlert' AS dm_owner,
      |  'Unclassified' AS dm_type,
      |  '0.0' AS dm_severity,
      |  'Unknown' AS dm_playbook,
      |  'true' AS dm_create,
      |  'Large value event' AS dm_details,
      |  '[{"type":"record.event_id","value":"' || event_id
      |    || '"},{"type":"record.event_type","value":"' || event_type
      |    || '"},{"type":"record.note","value":"a<b&c\"d''e"}'
      |    || ',{"type":"record.tags[0]","value":"x"}'
      |    || ',{"type":"record.tags[1]","value":"y"}'
      |    || ',{"type":"record.who.uid","value":"' || user_id || '"}]' AS dm_labels
      |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin) { (s, dir) =>
    import graft.alerts.Publishers
    val alerts = t(s, dir, "events").where(col("event_id") < 200)
      .select(
        md5(col("event_id").cast("string")).as("alert_id"),
        lit("high_value").as("rule_name"),
        lit("Large value event").as("rule_description"),
        struct(col("event_id"), col("event_type"),
          lit("a<b&c\"d'e").as("note"),
          array(lit("x"), lit("y")).as("tags"),
          struct(col("user_id").as("uid")).as("who")).as("record"))
    val vo = Publishers.publish(alerts, Seq("victorops_message"))
      .select(col("alert_id"), col("record.event_id").as("event_id"),
        get_json_object(col("publication"), "$.message_type").as("vo_message_type"),
        get_json_object(col("publication"), "$.entity_id").as("vo_entity_id"),
        get_json_object(col("publication"), "$.entity_display_name").as("vo_entity_display_name"),
        get_json_object(col("publication"), "$.record.event_id")
          .cast("long").as("vo_event_id"))
    val ko = Publishers.publish(alerts, Seq("komand_envelope"))
      .select(col("alert_id"),
        get_json_object(col("publication"), "$.data.rule_name").as("ko_data_rule"))
    Publishers.register("demisto_demo")(Publishers.demistoIncident())
    val dm = Publishers.publish(alerts, Seq("record_only", "demisto_demo"))
      .select(col("alert_id"),
        get_json_object(col("publication"), "$.name").as("dm_name"),
        get_json_object(col("publication"), "$.owner").as("dm_owner"),
        get_json_object(col("publication"), "$.type").as("dm_type"),
        get_json_object(col("publication"), "$.severity").as("dm_severity"),
        get_json_object(col("publication"), "$.playbook").as("dm_playbook"),
        get_json_object(col("publication"), "$.createInvestigation").as("dm_create"),
        get_json_object(col("publication"), "$.details").as("dm_details"),
        get_json_object(col("publication"), "$.labels").as("dm_labels"))
    vo.join(ko, "alert_id").join(dm, "alert_id")
      .drop("alert_id").orderBy("event_id")
  }

  // A5f: aws-sns + aws-ses shapes — both build on the indent-2 sorted-keys
  // dump (aws.py:532 / :727). SNS additionally exercises the 99-char
  // middle-elision of an over-long subject (helpers.py:19-33) with a
  // 160-char rule name.
  register(
    "a5f_publishers_sns_ses",
    """WITH a AS (
      |  SELECT event_id, event_type, user_id,
      |         md5(CAST(event_id AS VARCHAR)) AS alert_id,
      |         'high_value_' || repeat('x', 100) AS long_rule,
      |         '{' || chr(10)
      |           || '  "record": {' || chr(10)
      |           || '    "event_id": ' || event_id || ',' || chr(10)
      |           || '    "event_type": "' || event_type || '",' || chr(10)
      |           || '    "note": "a<b&c\"d''e",' || chr(10)
      |           || '    "tags": [' || chr(10)
      |           || '      "x",' || chr(10)
      |           || '      "y"' || chr(10)
      |           || '    ],' || chr(10)
      |           || '    "who": {' || chr(10)
      |           || '      "uid": ' || user_id || chr(10)
      |           || '    }' || chr(10)
      |           || '  }' || chr(10) || '}' AS pub_dump,
      |         '{' || chr(10)
      |           || '  "event_id": ' || event_id || ',' || chr(10)
      |           || '  "event_type": "' || event_type || '",' || chr(10)
      |           || '  "note": "a<b&c\"d''e",' || chr(10)
      |           || '  "tags": [' || chr(10)
      |           || '    "x",' || chr(10)
      |           || '    "y"' || chr(10)
      |           || '  ],' || chr(10)
      |           || '  "who": {' || chr(10)
      |           || '    "uid": ' || user_id || chr(10)
      |           || '  }' || chr(10) || '}' AS rec_dump
      |  FROM events WHERE event_id < 200),
      |s AS (SELECT *, long_rule || ' triggered alert ' || alert_id AS subj FROM a)
      |SELECT event_id,
      |  substr(subj, 1, 47) || ' ... ' || right(subj, 47) AS sns_subject,
      |  pub_dump AS sns_message,
      |  'secops@example.com' AS ses_to,
      |  'alerts@example.com' AS ses_from,
      |  'high_value triggered alert ' || alert_id AS ses_subject,
      |  'Please review the attached record.json' AS ses_body,
      |  'record.json' AS ses_att_name,
      |  rec_dump AS ses_att_content
      |FROM s ORDER BY event_id""".stripMargin) { (s, dir) =>
    import graft.alerts.Publishers
    def alerts(rule: Column) = t(s, dir, "events").where(col("event_id") < 200)
      .select(
        md5(col("event_id").cast("string")).as("alert_id"),
        rule.as("rule_name"),
        struct(col("event_id"), col("event_type"),
          lit("a<b&c\"d'e").as("note"),
          array(lit("x"), lit("y")).as("tags"),
          struct(col("user_id").as("uid")).as("who")).as("record"))
    val longRule = concat(lit("high_value_"),
      array_join(array_repeat(lit("x"), 100), ""))
    val sns = Publishers.publish(alerts(longRule), Seq("record_only", "sns_message"))
      .select(col("alert_id"),
        get_json_object(col("publication"), "$.subject").as("sns_subject"),
        get_json_object(col("publication"), "$.message").as("sns_message"))
    Publishers.register("ses_demo")(
      Publishers.sesEmailFields("secops@example.com", "alerts@example.com"))
    val ses = Publishers.publish(alerts(lit("high_value")), Seq("ses_demo"))
      .select(col("alert_id"), col("record.event_id").as("event_id"),
        get_json_object(col("publication"), "$.to").as("ses_to"),
        get_json_object(col("publication"), "$.from").as("ses_from"),
        get_json_object(col("publication"), "$.subject").as("ses_subject"),
        get_json_object(col("publication"), "$.body").as("ses_body"),
        get_json_object(col("publication"), "$.attachment.filename").as("ses_att_name"),
        get_json_object(col("publication"), "$.attachment.content").as("ses_att_content"))
    ses.join(sns, "alert_id").drop("alert_id").orderBy("event_id")
  }

  // A5g: phantom container + artifact payloads (the last payload-shaped
  // dialect; carbonblack remains out as a device-action API). The
  // container_id is the dispatcher-resolved parameter.
  register(
    "a5g_publishers_phantom",
    """SELECT event_id,
      |  'high_value' AS ph_container_name,
      |  'Large value event' AS ph_container_desc,
      |  42 AS ph_container_id,
      |  'Phantom Artifact' AS ph_artifact_name,
      |  'Alert' AS ph_artifact_label,
      |  event_id AS ph_cef_event_id,
      |  event_type AS ph_data_event_type
      |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin) { (s, dir) =>
    import graft.alerts.Publishers
    val alerts = t(s, dir, "events").where(col("event_id") < 200)
      .select(
        md5(col("event_id").cast("string")).as("alert_id"),
        lit("high_value").as("rule_name"),
        lit("Large value event").as("rule_description"),
        struct(col("event_id"), col("event_type")).as("record"))
    Publishers.register("phantom_demo")(Publishers.phantomShapes(containerId = 42L))
    Publishers.publish(alerts, Seq("record_only", "phantom_demo"))
      .select(col("record.event_id").as("event_id"),
        get_json_object(col("publication"), "$.container.name").as("ph_container_name"),
        get_json_object(col("publication"), "$.container.description").as("ph_container_desc"),
        get_json_object(col("publication"), "$.artifact.container_id")
          .cast("int").as("ph_container_id"),
        get_json_object(col("publication"), "$.artifact.name").as("ph_artifact_name"),
        get_json_object(col("publication"), "$.artifact.label").as("ph_artifact_label"),
        get_json_object(col("publication"), "$.artifact.cef.event_id")
          .cast("long").as("ph_cef_event_id"),
        get_json_object(col("publication"), "$.artifact.data.record.event_type")
          .as("ph_data_event_type"))
      .orderBy("event_id")
  }

  // A5h: the remaining pagerduty dialects — Events v1 (with context
  // validation: an invalid context is dropped, valid link/image re-emit
  // only standardized keys) and the REST incident payload (service /
  // escalation-policy references, urgency validation). Completes the
  // pagerduty family alongside a5c's v2 event.
  register(
    "a5h_publishers_pagerduty_family",
    """SELECT event_id,
      |  'svc-key-1' AS pd1_service_key,
      |  'trigger' AS pd1_event_type,
      |  'StreamAlert Rule Triggered - high_value' AS pd1_description,
      |  'Large value event' AS pd1_details_desc,
      |  event_id AS pd1_record_event_id,
      |  'streamalert' AS pd1_client,
      |  '[{"type":"link","href":"https://runbook.example.com","text":"Runbook"},{"type":"image","src":"https://img.example.com/a.png"}]'
      |    AS pd1_contexts,
      |  'StreamAlert Incident - Rule triggered: high_value' AS pdi_title,
      |  'SVC123' AS pdi_service_id,
      |  'service_reference' AS pdi_service_type,
      |  'incident_body' AS pdi_body_type,
      |  'Large value event' AS pdi_body_details,
      |  'EP456' AS pdi_policy_id,
      |  'escalation_policy_reference' AS pdi_policy_type,
      |  'high' AS pdi_urgency
      |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin) { (s, dir) =>
    import graft.alerts.Publishers
    val alerts = t(s, dir, "events").where(col("event_id") < 200)
      .select(
        md5(col("event_id").cast("string")).as("alert_id"),
        lit("high_value").as("rule_name"),
        lit("Large value event").as("rule_description"),
        struct(col("event_id")).as("record"))
    Publishers.register("pd1_demo")(Publishers.pagerDutyV1Event(
      serviceKey = "svc-key-1",
      contexts = Seq(
        Map("type" -> "link", "href" -> "https://runbook.example.com",
          "text" -> "Runbook", "extra" -> "stripped"), // extra key dropped
        Map("type" -> "bogus", "href" -> "x"),          // invalid: dropped
        Map("type" -> "image", "src" -> "https://img.example.com/a.png"))))
    val pd1 = Publishers.publish(alerts, Seq("pd1_demo"))
      .select(col("alert_id"), col("record.event_id").as("event_id"),
        get_json_object(col("publication"), "$.service_key").as("pd1_service_key"),
        get_json_object(col("publication"), "$.event_type").as("pd1_event_type"),
        get_json_object(col("publication"), "$.description").as("pd1_description"),
        get_json_object(col("publication"), "$.details.description").as("pd1_details_desc"),
        get_json_object(col("publication"), "$.details.record.event_id")
          .cast("long").as("pd1_record_event_id"),
        get_json_object(col("publication"), "$.client").as("pd1_client"),
        get_json_object(col("publication"), "$.contexts").as("pd1_contexts"))
    Publishers.register("pdi_demo")(Publishers.pagerDutyIncident(
      serviceId = "SVC123", escalationPolicyId = "EP456",
      urgency = Some("high")))
    val pdi = Publishers.publish(alerts, Seq("pdi_demo"))
      .select(col("alert_id"),
        get_json_object(col("publication"), "$.incident.title").as("pdi_title"),
        get_json_object(col("publication"), "$.incident.service.id").as("pdi_service_id"),
        get_json_object(col("publication"), "$.incident.service.type").as("pdi_service_type"),
        get_json_object(col("publication"), "$.incident.body.type").as("pdi_body_type"),
        get_json_object(col("publication"), "$.incident.body.details").as("pdi_body_details"),
        get_json_object(col("publication"), "$.incident.escalation_policy.id").as("pdi_policy_id"),
        get_json_object(col("publication"), "$.incident.escalation_policy.type").as("pdi_policy_type"),
        get_json_object(col("publication"), "$.incident.urgency").as("pdi_urgency"))
    pd1.join(pdi, "alert_id").drop("alert_id").orderBy("event_id")
  }

  // A5i: the raw AWS output payloads — lambda invocation (with the v1
  // function:qualifier parsing, both branches pinned), sqs message body,
  // and the cloudwatch-log indent-2 dump. Together with sns/ses (a5f) and
  // the firehose/s3 file sinks this covers every payload-shaped AWS output;
  // carbonblack remains out as a device-action API.
  register(
    "a5i_publishers_aws",
    """SELECT event_id,
      |  'alert-fn' AS l1_function,
      |  'prod' AS l1_qualifier,
      |  'Event' AS l1_invocation_type,
      |  '{"event_id":' || event_id || ',"event_type":"' || event_type || '"}'
      |    AS l1_payload,
      |  'bare-fn' AS l2_function,
      |  '__absent' AS l2_qualifier,
      |  '{"event_id":' || event_id || ',"event_type":"' || event_type || '"}'
      |    AS sqs_body,
      |  '{' || chr(10)
      |    || '  "record": {' || chr(10)
      |    || '    "event_id": ' || event_id || ',' || chr(10)
      |    || '    "event_type": "' || event_type || '"' || chr(10)
      |    || '  }' || chr(10) || '}' AS cw_dump
      |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin) { (s, dir) =>
    import graft.alerts.Publishers
    val alerts = t(s, dir, "events").where(col("event_id") < 200)
      .select(
        md5(col("event_id").cast("string")).as("alert_id"),
        lit("high_value").as("rule_name"),
        struct(col("event_id"), col("event_type")).as("record"))
    // full-ARN config: 8 parts -> function=parts[-2], qualifier=parts[-1]
    Publishers.register("lambda_arn_demo")(Publishers.lambdaInvocation(
      "arn:aws:lambda:us-east-1:123456789012:function:alert-fn:prod"))
    // bare name: 1 part -> function as-is, qualifier key omitted entirely
    Publishers.register("lambda_bare_demo")(Publishers.lambdaInvocation("bare-fn"))
    Publishers.register("sqs_demo")(Publishers.sqsMessage())
    Publishers.register("cw_demo")(Publishers.cloudwatchLogEntry())
    val l1 = Publishers.publish(alerts, Seq("lambda_arn_demo"))
      .select(col("alert_id"), col("record.event_id").as("event_id"),
        get_json_object(col("publication"), "$.function_name").as("l1_function"),
        get_json_object(col("publication"), "$.qualifier").as("l1_qualifier"),
        get_json_object(col("publication"), "$.invocation_type").as("l1_invocation_type"),
        get_json_object(col("publication"), "$.payload").as("l1_payload"))
    val l2 = Publishers.publish(alerts, Seq("lambda_bare_demo"))
      .select(col("alert_id"),
        get_json_object(col("publication"), "$.function_name").as("l2_function"),
        coalesce(get_json_object(col("publication"), "$.qualifier"),
          lit("__absent")).as("l2_qualifier"))
    val sqs = Publishers.publish(alerts, Seq("sqs_demo"))
      .select(col("alert_id"),
        get_json_object(col("publication"), "$.message_body").as("sqs_body"))
    val cw = Publishers.publish(alerts, Seq("record_only", "cw_demo"))
      .select(col("alert_id"),
        get_json_object(col("publication"), "$.message").as("cw_dump"))
    l1.join(l2, "alert_id").join(sqs, "alert_id").join(cw, "alert_id")
      .drop("alert_id").orderBy("event_id")
  }

  // A5j: the community slack/pagerduty LAYOUT chains (slack_layout.py
  // Summary + AttachRuleInfo + AttachFullRecord; pagerduty_layout.py
  // populate_fields + PrettyPrintArrays + ShortenTitle + as_custom_details)
  // — full publication JSON byte-exact against SQL-built strings,
  // including the parsed rule description, the github-search title link,
  // the indent-2 record dump inside the code fence, and the
  // single-hit-scalar populate arity.
  register(
    "a5j_publishers_layout",
    """SELECT event_id,
      |  '{"@slack.text":"Rule triggered","@slack.attachments":['
      |  || '{"fallback":"Rule triggered: layout_demo","color":"#ff5a5f",'
      |  || '"author_name":"","author_link":"","author_icon":"",'
      |  || '"title":"layout_demo","title_link":'
      |  || '"https://github.com/airbnb/streamalert/search?q=layout_demo+path%3A%2Frules",'
      |  || '"text":"Demo of the slack layout chain","image_url":"","thumb_url":"",'
      |  || '"footer":"","footer_icon":"","ts":1704067200,"mrkdwn_in":[]},'
      |  || '{"color":"#8ce071","fields":[{"title":"Note","value":"First note line continues here"},'
      |  || '{"title":"Playbook","value":"(a) check the runbook"}]},'
      |  || '{"color":"#7b0051","author":"stream-1","title":"Record",'
      |  || '"text":"```\n\n{\n  \"event_id\": ' || event_id
      |  || ',\n  \"event_type\": \"' || event_type || '\"\n}\n```",'
      |  || '"fields":[{"title":"Alert Id","value":"' || md5(event_id::VARCHAR) || '"}],'
      |  || '"footer":"via <https://console.aws.amazon.com/kinesis/home|kinesis>",'
      |  || '"footer_icon":"","mrkdwn_in":["text"]}],'
      |  || '"@slack._previous_publication":{"record":{"event_id":' || event_id
      |  || ',"event_type":"' || event_type || '"}}}' AS slack_pub,
      |  '{"event_id":' || event_id || ',"event_type":"' || event_type || '",'
      |  || '"@pagerduty-v2.summary":"layout_demo",'
      |  || '"@pagerduty-incident.incident_title":"layout_demo",'
      |  || '"@pagerduty.description":"layout_demo",'
      |  || '"@pagerduty.details":{"event_id":' || event_id
      |  || ',"event_type":"' || event_type || '"},'
      |  || '"@pagerduty-v2.custom_details":{"event_id":' || event_id
      |  || ',"event_type":"' || event_type || '"}}' AS pd_pub
      |FROM events WHERE event_id < 200 ORDER BY event_id""".stripMargin) { (s, dir) =>
    import graft.alerts.Publishers
    val alerts = t(s, dir, "events").where(col("event_id") < 200)
      .select(
        md5(col("event_id").cast("string")).as("alert_id"),
        lit("layout_demo").as("rule_name"),
        lit(java.sql.Timestamp.valueOf("2024-01-01 00:00:00"))
          .cast("timestamp").as("created"),
        lit("kinesis").as("source_service"),
        lit("stream-1").as("source_entity"),
        lit("description: Demo of the slack layout chain\n\n" +
          "note: First note line\n  continues here\n" +
          "playbook: (a) check the runbook").as("rule_description"),
        struct(col("event_id"), col("event_type")).as("record"))
    Publishers.register("populate_a5j")(
      Publishers.populateFields(Seq("event_id", "event_type")))
    val slackChain = Seq("record_only", "slack_summary",
      "slack_attach_rule_info", "slack_attach_full_record")
    val pdChain = Seq("record_only", "populate_a5j", "pretty_print_arrays",
      "pagerduty_shorten_title", "pagerduty_as_custom_details")
    val sl = Publishers.publish(alerts, slackChain)
      .select(col("alert_id"), col("record.event_id").as("event_id"),
        col("publication").as("slack_pub"))
    val pd = Publishers.publish(alerts, pdChain)
      .select(col("alert_id"), col("publication").as("pd_pub"))
    sl.join(pd, "alert_id").drop("alert_id").orderBy("event_id")
  }

  // A5b: community publisher library — record_only + enumerate_fields
  // (dotted-path flattening, generic.py:115-168) and populate_fields (deep
  // get_keys extraction with the reference's single-hit-publishes-scalar
  // arity, generic.py:171-203) — publication JSON checked byte-for-byte
  // against SQL-built strings.
  register(
    "a5b_publishers_library",
    """SELECT event_id,
      |       '{"record.event_id":' || event_id
      |         || ',"record.event_type":"' || event_type
      |         || '","record.who.uid":' || user_id || '}' AS enum_pub,
      |       '{"uid":' || user_id || '}' AS pop_pub
      |FROM events""".stripMargin) { (s, dir) =>
    import graft.alerts.Publishers
    val alerts = t(s, dir, "events").select(
      md5(col("event_id").cast("string")).as("alert_id"),
      lit("pub_demo").as("rule_name"),
      struct(col("event_id"), col("event_type"),
        struct(col("user_id").as("uid")).as("who")).as("record"),
      lit(false).as("staged"))
    Publishers.register("populate_uid")(Publishers.populateFields(Seq("uid")))
    val enumPub = Publishers.publish(alerts, Seq("record_only", "enumerate_fields"))
      .select(col("alert_id"), col("record.event_id").as("event_id"),
        col("publication").as("enum_pub"))
    val popPub = Publishers.publish(alerts, Seq("populate_uid"))
      .select(col("alert_id"), col("publication").as("pop_pub"))
    enumPub.join(popPub, "alert_id").drop("alert_id")
  }

  // ---------------------------------------------------------------------------
  // Training-data pipeline operators: dedup family, ANN, text analysis,
  // multimodal plumbing (documents/embeddings tables)
  // ---------------------------------------------------------------------------

  import graft.pipeline.{Dedup, Eval, Multimodal, Preference, Similarity, Sketches, TextAnalysis}

  // The composite training-corpus filter — the query a data-curation user
  // actually runs: exact-dedup keep verdict ∧ quality floor ∧ language ∧
  // minimum length, returning the kept corpus with its curation columns.
  // Every stage is an already-oracled operator (d1/t1/t2/t3) composed in
  // one plan: the dedup verdict is the only shuffle (16-byte fingerprint
  // groupBy), everything else stays scan-side.
  register(
    "p0_training_corpus",
    """WITH fp AS (
      |  SELECT doc_id,
      |         md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS f
      |  FROM documents),
      |keep AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY f),
      |feat AS (
      |  SELECT doc_id,
      |    len(list_filter(string_split_regex(text, '\s+'), x -> x != ''))
      |      AS n_tokens,
      |    round(greatest(0.0,
      |      least(length(text) / 500.0, 1.0) * 0.4 +
      |      least((len(list_filter(string_split_regex(lower(text), '\s+'),
      |              x -> x IN ('the','a','of','and','to','in'))) ::DOUBLE /
      |             greatest(len(list_filter(string_split_regex(lower(text), '\s+'),
      |              x -> x != '')), 1)) * 3.0, 1.0) * 0.4 +
      |      (1.0 - least(len(regexp_extract_all(text, '[^\w\s]'))::DOUBLE /
      |                   greatest(length(text), 1) * 5.0, 1.0)) * 0.2), 6)
      |      AS quality,
      |    (SELECT CASE
      |       WHEN s_en >= s_es AND s_en >= s_de THEN 'en'
      |       WHEN s_es >= s_de THEN 'es' ELSE 'de' END
      |     FROM (SELECT
      |       len(list_intersect(t, ['the','a','and','scan','join'])) AS s_en,
      |       len(list_intersect(t, ['el','la','que','datos'])) AS s_es,
      |       len(list_intersect(t, ['der','die','und','das'])) AS s_de
      |       FROM (SELECT list_distinct(list_filter(
      |         string_split_regex(lower(text), '\s+'), x -> x != '')) AS t)))
      |      AS langid
      |  FROM documents)
      |SELECT f.doc_id, f.n_tokens, f.quality
      |FROM feat f JOIN keep k ON f.doc_id = k.doc_id
      |WHERE f.quality >= 0.3 AND f.langid = 'en' AND f.n_tokens >= 5
      |ORDER BY f.doc_id""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val kept = Dedup.dropExactDuplicates(docs, "text", "doc_id")
    kept.select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"),
      TextAnalysis.qualityScore(col("text"),
        Seq("the", "a", "of", "and", "to", "in")).as("quality"),
      TextAnalysis.langId(col("text"), Seq(
        "en" -> Seq("the", "a", "and", "scan", "join"),
        "es" -> Seq("el", "la", "que", "datos"),
        "de" -> Seq("der", "die", "und", "das"))).as("langid"))
      .where(col("quality") >= 0.3 && col("langid") === "en" &&
        col("n_tokens") >= 5)
      .drop("langid")
      .orderBy("doc_id")
  }

  // Exact dedup: hash-groupBy on the normalized-text fingerprint.
  register(
    "d1_dedup_exact",
    """SELECT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fingerprint,
      |       count(*) AS n_docs, min(doc_id) AS canonical_id
      |FROM documents GROUP BY 1""".stripMargin) { (s, dir) =>
    Dedup.exactGroups(t(s, dir, "documents"), "text", "doc_id")
  }

  // MinHash+LSH near-dup: shingle -> signature -> band-bucket join -> exact
  // Jaccard verify. LSH bucketing is not ANSI-SQL-expressible -> rows-only.
  registerNoOracle("d2_dedup_minhash_lsh") { (s, dir) =>
    // 8 bands × 4 rows: band-collision prob j^4 — near-random pairs
    // (baseline jaccard ~0.03 on this corpus) generate ~zero candidates
    // while planted near-dups (j>0.9) are caught with ~certainty
    Dedup.minhashNearDups(t(s, dir, "documents"), "text", "doc_id",
      shingleWords = 2, numHashes = 32, bands = 8, threshold = 0.5)
  }

  // Incremental near-dup (the 100 TB operating mode): even doc_ids act as
  // the staged corpus signature store, odd doc_ids as the arriving batch —
  // only the batch is shingled/signed; cross-batch dups surface via the
  // bucket join against the store.
  registerNoOracle("d2b_dedup_incremental") { (s, dir) =>
    val d = t(s, dir, "documents")
    val (storeShingles, storeBuckets) = Dedup.minhashStages(
      d.where(col("doc_id") % 2 === 0), "text", "doc_id",
      shingleWords = 2, numHashes = 32, bands = 8)
    Dedup.minhashNearDupsAgainstStore(
      d.where(col("doc_id") % 2 === 1), "text", "doc_id",
      storeShingles, storeBuckets,
      shingleWords = 2, numHashes = 32, bands = 8, threshold = 0.5)
      .orderBy("id_new", "id_store")
  }

  /** The planted-corpus construction shared by every lexical hash-matched
    * approximate row (d2c/d2d/d3b/d9): every token is prefixed with its
    * doc_id, so DISTINCT docs share zero shingles/tokens (cross-doc jaccard
    * 0, independent fingerprints) while a re-ingested copy keeps its
    * source's text verbatim (jaccard 1, identical fingerprint). */
  private def docPrefixed(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      array_join(transform(split(lower(col("text")), "\\s+"),
        x => concat_ws("_", col("doc_id").cast("string"), x)), " ").as("text"))

  /** [[docPrefixed]] plus one byte-identical copy of every 97th doc under
    * id + 1,000,000 — the planted near-dup pairs. */
  private def docPlantedCorpus(docs: DataFrame): DataFrame = {
    val prefixed = docPrefixed(docs)
    prefixed.unionAll(prefixed.where(col("doc_id") % 97 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
  }

  // MinHash+LSH, hash-matched: the mm_phash trick applied to the minhash
  // pipeline (see docPrefixed). The REAL shingle→signature→band-bucket→
  // exact-verify pipeline has exactly one SQL-expressible answer: the
  // planted pairs — identical shingle sets collide in every band with
  // certainty, and no other pair reaches the 0.5 verify threshold.
  // Converts the approximate family's core operator from rows-only to a
  // full hash match (d2 keeps the realistic corpus).
  register(
    "d2c_dedup_minhash_planted",
    """SELECT doc_id AS id_a, doc_id + 1000000 AS id_b,
      |       CAST(1.0 AS DOUBLE) AS jaccard
      |FROM documents WHERE doc_id % 97 = 0 ORDER BY id_a""".stripMargin) { (s, dir) =>
    Dedup.minhashNearDups(docPlantedCorpus(t(s, dir, "documents")), "text", "doc_id",
      shingleWords = 2, numHashes = 32, bands = 8, threshold = 0.5)
      .orderBy("id_a")
  }

  // The INCREMENTAL store mode, hash-matched: the staged corpus is the
  // prefixed documents table, the arriving batch is the planted copies —
  // the bipartite bucket join against the store can only pair each copy
  // with its source (jaccard 1 vs 0 for everything else), so the exact
  // output is SQL-computable. Proves the *AgainstStore path (d2b keeps the
  // realistic even/odd split) with a real hash oracle.
  register(
    "d2d_incremental_planted",
    """SELECT doc_id + 1000000 AS id_new, doc_id AS id_store,
      |       CAST(1.0 AS DOUBLE) AS jaccard
      |FROM documents WHERE doc_id % 97 = 0 ORDER BY id_new""".stripMargin) { (s, dir) =>
    val prefixed = docPrefixed(t(s, dir, "documents"))
    val (storeShingles, storeBuckets) = Dedup.minhashStages(prefixed,
      "text", "doc_id", shingleWords = 2, numHashes = 32, bands = 8)
    val batch = prefixed.where(col("doc_id") % 97 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
    Dedup.minhashNearDupsAgainstStore(batch, "text", "doc_id",
      storeShingles, storeBuckets, shingleWords = 2, numHashes = 32, bands = 8,
      threshold = 0.5).orderBy("id_new")
  }

  // MinHash recall on the REALISTIC corpus, hash-pinned — the d3c
  // construction applied to the minhash pipeline. d2c proves the pipeline
  // on planted byte-identical pairs; this row bounds its recall on the
  // corpus's organic near-dups: DuckDB brute-forces the exact 2-gram
  // Jaccard >= 0.7 pair count (id-bounded to doc_id < 500 so the ground
  // truth stays O(1) in corpus size; the whole corpus at correctness SFs)
  // and constant-folds the claim to TRUE; Spark computes the same exact
  // count plus containment of those pairs in d2's band-bucket output. The
  // signature permutations are seeded, so measured recall is deterministic
  // and the bound CLAIM hash-compares — a banding/signature regression
  // flips the bool and fails the hash. The all-pairs join is the
  // VERIFICATION harness at test SF; the scale path is d2 itself.
  register(
    "d2e_minhash_recall_bound",
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS t
      |  FROM documents WHERE doc_id < 500),
      |sh AS (
      |  SELECT doc_id, CASE WHEN len(t) >= 2
      |    THEN list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))
      |    ELSE [array_to_string(t, ' ')] END AS s
      |  FROM toks)
      |SELECT CAST(count(*) AS BIGINT) AS exact_pairs, TRUE AS recall_floor_met
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |WHERE round(len(list_intersect(a.s, b.s))::DOUBLE /
      |      len(list_distinct(list_concat(a.s, b.s))), 6) >= 0.7""".stripMargin) { (s, dir) =>
    val d = t(s, dir, "documents")
    // shared cached harness ([[exactJaccardPairs]]): the J >= 0.7 set is
    // the j-filtered subset of the J >= 0.5 ground truth d3c also reads
    val exact = exactJaccardPairs(s, dir)
      .where(col("j") >= 0.7)
      .select("id_a", "id_b")
    val found = Dedup.minhashNearDups(d, "text", "doc_id",
      shingleWords = 2, numHashes = 32, bands = 8, threshold = 0.5)
      .select(col("id_a"), col("id_b"), lit(1).as("__found"))
    exact.join(found, Seq("id_a", "id_b"), "left")
      .agg(count(lit(1)).as("__exact"), sum(coalesce(col("__found"), lit(0))).as("__hit"))
      .select(col("__exact").cast("long").as("exact_pairs"),
        // the corpus's organic near-dups all sit at J >= 0.9, where banding
        // theory (8 bands × 4 rows) detects with prob 1-(1-0.9^4)^8 ≈
        // 0.9998 — measured recall is 1.0 at sf0.001/sf0.01 for 3+ rounds;
        // floor 0.95 per the house stability rule (within 0.05 of worst
        // measured once stable 2+ rounds — the ivf/d5e precedent).
        // coalesce: empty ground truth → vacuous-true on both engines
        coalesce(col("__hit").cast("double") / col("__exact") >= 0.95, lit(true))
          .as("recall_floor_met"))
  }

  // End-to-end near-dup corpus dedup on the planted corpus: pairs →
  // connected components → keep-one. Same doc-unique-prefix construction
  // as d2c, so the expected clusters are exact: each planted copy joins
  // its source's cluster (labeled by the min id = the source) and is
  // dropped; every other doc is its own kept cluster.
  register(
    "d9_drop_near_duplicates",
    """SELECT doc_id AS id, doc_id AS cluster_id, TRUE AS keep FROM documents
      |UNION ALL
      |SELECT doc_id + 1000000 AS id, doc_id AS cluster_id, FALSE AS keep
      |FROM documents WHERE doc_id % 97 = 0
      |ORDER BY id""".stripMargin) { (s, dir) =>
    Dedup.dropNearDuplicates(docPlantedCorpus(t(s, dir, "documents")), "text", "doc_id",
      shingleWords = 2, numHashes = 32, bands = 8, threshold = 0.5)
      .orderBy("id")
  }

  // Canonical selection by QUALITY: same planted corpus, but score = doc_id
  // makes each planted copy (id + 1,000,000) the best-scoring cluster
  // member — the keep verdict FLIPS relative to d9 (copy kept, source
  // dropped), which is exactly what proves the score path: a text-derived
  // score would tie on the byte-identical pair and fall back to d9's
  // min-id answer.
  register(
    "d12_keep_best_quality",
    """SELECT doc_id AS id, doc_id AS cluster_id,
      |       doc_id % 97 <> 0 AS keep
      |FROM documents
      |UNION ALL
      |SELECT doc_id + 1000000 AS id, doc_id AS cluster_id, TRUE AS keep
      |FROM documents WHERE doc_id % 97 = 0
      |ORDER BY id""".stripMargin) { (s, dir) =>
    Dedup.dropNearDuplicatesKeepBest(
      docPlantedCorpus(t(s, dir, "documents")), "text", "doc_id",
      scoreCol = col("doc_id"),
      shingleWords = 2, numHashes = 32, bands = 8, threshold = 0.5)
      .orderBy("id")
  }

  // Corpus snapshot diff: snapshot B derives deterministically from the
  // documents table — every doc_id % 7 == 0 removed, % 11 == 0 rewritten
  // (changed), % 13 == 0 re-added under id+1,000,000 (added; the %7
  // deletions win where they overlap) — so all four statuses are
  // genuinely exercised. The operator joins (id, md5) fingerprints only.
  register(
    "d13_snapshot_diff",
    """WITH b AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 11 = 0 THEN text || ' rev2' ELSE text END
      |           AS text
      |  FROM documents WHERE doc_id % 7 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text
      |  FROM documents WHERE doc_id % 13 = 0),
      |j AS (
      |  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
      |         md5(a.text) AS ha, md5(b.text) AS hb
      |  FROM documents a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
      |SELECT doc_id,
      |       CASE WHEN ha IS NULL THEN 'added'
      |            WHEN hb IS NULL THEN 'removed'
      |            WHEN ha = hb THEN 'unchanged'
      |            ELSE 'changed' END AS status
      |FROM j ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val a = t(s, dir, "documents")
    val b = a.where(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"))
      .unionByName(a.where(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
    Dedup.snapshotDiff(a, b, "doc_id", "text").orderBy("doc_id")
  }

  // Winnowing (MOSS) near-dup candidates: deterministic fingerprint
  // selection, so — unlike the minhash/simhash family — the REALISTIC
  // corpus run is exactly SQL-expressible, star cap and all. Window
  // minima compare md5 hex strings lexicographically on both engines.
  register(
    "d10_winnowing",
    """WITH w AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
      |                             x -> x != '') AS t
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, list_transform(generate_series(0, len(t) - 3),
      |           i -> md5(array_to_string(t[i+1:i+3], ' '))) AS grams
      |  FROM w WHERE len(t) >= 3),
      |fps AS (
      |  SELECT DISTINCT doc_id, fp FROM (
      |    SELECT doc_id, unnest(list_distinct(list_transform(
      |             generate_series(0, greatest(len(grams) - 4, 0)),
      |             i -> list_min(grams[i+1:i+4])))) AS fp
      |    FROM g)),
      |rk AS (
      |  SELECT fp, doc_id AS id,
      |         row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      |  FROM fps)
      |SELECT DISTINCT x.id AS id_a, y.id AS id_b
      |FROM rk x JOIN rk y
      |  ON x.fp = y.fp AND x.id < y.id AND (y.rn <= 64 OR x.rn = 1)
      |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    Dedup.winnowingCandidates(t(s, dir, "documents"), "text", "doc_id",
      k = 3, window = 4, maxBucketPairing = 64)
      .orderBy("id_a", "id_b")
  }

  // SimHash near-dup: 64-bit fingerprint, hamming <= 6, chunk-bucketed.
  registerNoOracle("d3_dedup_simhash") { (s, dir) =>
    Dedup.simhashNearDups(t(s, dir, "documents"), "text", "doc_id", maxDist = 6)
  }

  // SimHash, hash-matched: the d2c construction again. Doc-unique token
  // prefixes make every distinct pair's token sets disjoint, so their
  // 64-bit fingerprints are independent random draws — P(hamming <= 6)
  // ~4e-12 per pair, i.e. ZERO non-planted pairs pass the verify at any
  // test SF — while the planted byte-identical copies fingerprint to the
  // SAME 64 bits (hamming 0, all four pigeonhole chunks collide, detection
  // certain). The real fingerprint→chunk-bucket→exact-hamming pipeline thus
  // has exactly one SQL-expressible answer: the planted pairs at distance 0.
  register(
    "d3b_dedup_simhash_planted",
    """SELECT doc_id AS id_a, doc_id + 1000000 AS id_b, 0 AS hamming
      |FROM documents WHERE doc_id % 97 = 0 ORDER BY id_a""".stripMargin) { (s, dir) =>
    Dedup.simhashNearDups(docPlantedCorpus(t(s, dir, "documents")), "text", "doc_id",
      maxDist = 6).orderBy("id_a")
  }

  // The q16b pattern for d3's REALISTIC corpus (d3b proves the planted
  // one): simhash is approximate in WHICH candidate pairs it surfaces, but
  // its recall against the exact high-Jaccard ground truth is a
  // deterministic number (seeded token hashing, no randomness), so the
  // bound CLAIM hash-compares. DuckDB brute-forces the exact 2-gram
  // Jaccard >= 0.5 pair count (the d4 gram conventions) and constant-folds
  // the claim to TRUE; Spark computes the same exact count plus the actual
  // containment of those pairs in d3's hamming<=6 output. A recall
  // regression in the fingerprint/bucket/verify pipeline flips the bool
  // and fails the hash. The all-pairs join is the VERIFICATION harness at
  // test SF, not the scale path — the scale path is d3 itself; the ground
  // truth is id-bounded to doc_id < 500 (the whole corpus at the
  // correctness SFs, a fixed slice at larger ones) so the brute force
  // stays O(1) in corpus size while simhash still runs full-corpus.
  register(
    "d3c_simhash_recall_bound",
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS t
      |  FROM documents WHERE doc_id < 500),
      |sh AS (
      |  SELECT doc_id, CASE WHEN len(t) >= 2
      |    THEN list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))
      |    ELSE [array_to_string(t, ' ')] END AS s
      |  FROM toks)
      |SELECT CAST(count(*) AS BIGINT) AS exact_pairs, TRUE AS recall_floor_met
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |WHERE round(len(list_intersect(a.s, b.s))::DOUBLE /
      |      len(list_distinct(list_concat(a.s, b.s))), 6) >= 0.5""".stripMargin) { (s, dir) =>
    val d = t(s, dir, "documents")
    // shared cached harness ([[exactJaccardPairs]]) — d2e filters the
    // same ground truth to its higher threshold
    val exact = exactJaccardPairs(s, dir).select("id_a", "id_b")
    val sim = Dedup.simhashNearDups(d, "text", "doc_id", maxDist = 6)
      .select(col("id_a"), col("id_b"), lit(1).as("__found"))
    exact.join(sim, Seq("id_a", "id_b"), "left")
      .agg(count(lit(1)).as("__exact"), sum(coalesce(col("__found"), lit(0))).as("__hit"))
      .select(col("__exact").cast("long").as("exact_pairs"),
        // measured recall is 0.92-0.93 at sf0.001/sf0.01 (deterministic);
        // 0.8 leaves drift margin while still catching a real regression.
        // coalesce: empty ground truth → 0/0 → NULL would hash-mismatch the
        // oracle's constant TRUE; degrade to vacuous-true on both engines
        coalesce(col("__hit").cast("double") / col("__exact") >= 0.8, lit(true))
          .as("recall_floor_met"))
  }

  // n-gram Jaccard: the exact verifier over adjacent-id document pairs.
  register(
    "d4_ngram_jaccard",
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, CASE WHEN len(t) >= 2
      |    THEN list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))
      |    ELSE [array_to_string(t, ' ')] END AS s
      |  FROM toks)
      |SELECT a.doc_id AS id, round(len(list_intersect(a.s, b.s))::DOUBLE /
      |       len(list_distinct(list_concat(a.s, b.s))), 6) AS j
      |FROM sh a JOIN sh b ON a.doc_id + 1 = b.doc_id ORDER BY id""".stripMargin) { (s, dir) =>
    val d = t(s, dir, "documents")
    val paired = d.as("a").join(d.as("b"), col("a.doc_id") + 1 === col("b.doc_id"))
      .select(col("a.doc_id").as("id"), col("a.text").as("ta"), col("b.text").as("tb"))
    paired.select(col("id"),
      round(Dedup.ngramJaccardPairs(paired, "ta", "tb", shingleWords = 2), 6).as("j"))
      .orderBy("id")
  }

  // Asymmetric containment C(A->B) = |A∩B|/|A| — the subset-duplication
  // detector symmetric Jaccard structurally misses (a short doc fully
  // quoted in a long one has J ≈ 0 but C = 1). Realistic rows: adjacent
  // doc pairs, both directions + J for contrast; planted rows: each
  // doc's own 8-token prefix vs the full doc, where C(prefix->doc) MUST
  // be exactly 1.0 while C(doc->prefix) and J stay fractional — the
  // asymmetry proven in the same hash-matched result.
  register(
    "d18_containment",
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
      |                             x -> x != '') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, CASE WHEN len(t) >= 2
      |    THEN list_distinct(list_transform(range(1, len(t)),
      |                                      i -> t[i] || ' ' || t[i+1]))
      |    ELSE [array_to_string(t, ' ')] END AS s
      |  FROM toks),
      |psh AS (
      |  SELECT doc_id, CASE WHEN least(len(t), 8) >= 2
      |    THEN list_distinct(list_transform(range(1, least(len(t), 8)),
      |                                      i -> t[i] || ' ' || t[i+1]))
      |    ELSE [array_to_string(t[1 : 8], ' ')] END AS s
      |  FROM toks),
      |realistic AS (
      |  SELECT a.doc_id AS id,
      |    round(len(list_intersect(a.s, b.s))::DOUBLE / len(a.s), 6) AS c_ab,
      |    round(len(list_intersect(a.s, b.s))::DOUBLE / len(b.s), 6) AS c_ba,
      |    round(len(list_intersect(a.s, b.s))::DOUBLE /
      |          len(list_distinct(list_concat(a.s, b.s))), 6) AS j
      |  FROM sh a JOIN sh b ON a.doc_id + 1 = b.doc_id),
      |planted AS (
      |  SELECT p.doc_id + 1000000 AS id,
      |    round(len(list_intersect(p.s, f.s))::DOUBLE / len(p.s), 6) AS c_ab,
      |    round(len(list_intersect(p.s, f.s))::DOUBLE / len(f.s), 6) AS c_ba,
      |    round(len(list_intersect(p.s, f.s))::DOUBLE /
      |          len(list_distinct(list_concat(p.s, f.s))), 6) AS j
      |  FROM psh p JOIN sh f USING (doc_id))
      |SELECT id, c_ab, c_ba, j FROM realistic
      |UNION ALL SELECT id, c_ab, c_ba, j FROM planted
      |ORDER BY id""".stripMargin) { (s, dir) =>
    val d = t(s, dir, "documents")
    val paired = d.as("a").join(d.as("b"), col("a.doc_id") + 1 === col("b.doc_id"))
      .select(col("a.doc_id").as("id"), col("a.text").as("ta"),
        col("b.text").as("tb"))
    def row(df: DataFrame): DataFrame = {
      val sa = Dedup.wordShingles(col("ta"), 2)
      val sb = Dedup.wordShingles(col("tb"), 2)
      df.select(col("id"),
        round(Dedup.containment(sa, sb), 6).as("c_ab"),
        round(Dedup.containment(sb, sa), 6).as("c_ba"),
        round(Dedup.jaccard(sa, sb), 6).as("j"))
    }
    val planted = d.select((col("doc_id") + 1000000).as("id"),
      concat_ws(" ",
        slice(TextAnalysis.tokens(lower(col("text"))), 1, 8)).as("ta"),
      col("text").as("tb"))
    row(paired).unionAll(row(planted)).orderBy("id")
  }

  // EXACT similarity join via prefix filtering (AllPairs/PPJoin): every
  // pair with bigram-shingle Jaccard >= 0.8, no candidate-recall loss —
  // the deterministic complement to d2's minhash path, so the oracle is
  // the full quadratic ground truth (tractable in DuckDB at oracle SF;
  // the Spark side runs the prefix-filtered plan, never the all-pairs
  // join, and must produce the IDENTICAL pair set to hash-match).
  // 0.8 is the operator's intended high-similarity regime: the synthetic
  // corpus's templated bigrams make moderate thresholds adversarial for
  // prefix filtering (τ=0.6 leaves 2.4M of 12.5M pairs as candidates at
  // sf0.1; τ=0.8 prunes to the true near-dup structure) — below ~0.7 on
  // such corpora the minhash band join (d2) is the scale path, which the
  // similarityJoin Scaladoc states.
  register(
    "d14_similarity_join",
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, CASE WHEN len(t) >= 2
      |    THEN list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))
      |    ELSE [array_to_string(t, ' ')] END AS s
      |  FROM toks),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |         len(list_intersect(a.s, b.s))::DOUBLE /
      |         len(list_distinct(list_concat(a.s, b.s))) AS j
      |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
      |SELECT id_a, id_b, round(j, 6) AS jaccard
      |FROM pairs WHERE j >= 0.8 ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    Dedup.similarityJoin(t(s, dir, "documents"), "text", "doc_id",
        shingleWords = 2, threshold = 0.8)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  // The incremental twin, fully oracled (exactness makes that possible —
  // the probabilistic incremental rows d2b/d5f settle for planted twins):
  // docs < 250 found the staged store and FREEZE the canonical token
  // order; docs >= 250 arrive as the new batch and join bipartite
  // against the store, with unseen tokens ranking at frozen-df 0. The
  // oracle is the quadratic bipartite ground truth.
  register(
    "d15_similarity_join_incremental",
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, CASE WHEN len(t) >= 2
      |    THEN list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))
      |    ELSE [array_to_string(t, ' ')] END AS s
      |  FROM toks),
      |pairs AS (
      |  SELECT b.doc_id AS id_new, a.doc_id AS id_store,
      |         len(list_intersect(a.s, b.s))::DOUBLE /
      |         len(list_distinct(list_concat(a.s, b.s))) AS j
      |  FROM sh a JOIN sh b ON a.doc_id < 250 AND b.doc_id >= 250)
      |SELECT id_new, id_store, round(j, 6) AS jaccard
      |FROM pairs WHERE j >= 0.8 ORDER BY id_new, id_store""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val (freqPlan, sortedPlan) = Dedup.similarityStages(
      docs.where(col("doc_id") < 250), "text", "doc_id", shingleWords = 2)
    // materialize the stages like the parquet-staged store they stand in
    // for: the prefix AND verify branches both read the store side, and
    // an unmaterialized plan would recompute the shingle scan twice
    val (freq, sorted) = (freqPlan.localCheckpoint(), sortedPlan.localCheckpoint())
    Dedup.similarityJoinAgainstStore(docs.where(col("doc_id") >= 250),
        "text", "doc_id", freq, sorted, shingleWords = 2, threshold = 0.8)
      .select(col("id_new"), col("id_store"),
        round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id_new", "id_store")
  }

  // Embedding-cosine near-dup (exact verify path over adjacent pairs; the
  // LSH-bucketed variant is d5b below).
  register(
    "d5_embedding_cosine",
    """SELECT a.vec_id AS id,
      |       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos
      |FROM embeddings a JOIN embeddings b ON a.vec_id + 1 = b.vec_id
      |ORDER BY id""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "embeddings")
    e.as("a").join(e.as("b"), col("a.vec_id") + 1 === col("b.vec_id"))
      .select(col("a.vec_id").as("id"),
        round(Dedup.cosine(col("a.embedding"), col("b.embedding")), 6).as("cos"))
      .orderBy("id")
  }

  // Hyperplane-LSH bucketed embedding near-dup (the 100 TB scale path).
  registerNoOracle("d5b_embedding_lsh_neardup") { (s, dir) =>
    // synthetic embeddings are near-orthogonal (max pairwise cos ~0.3), so
    // the "near-dup" bar is set to the top of that range
    Dedup.embeddingNearDups(t(s, dir, "embeddings"), "embedding", "vec_id",
      planes = 6, threshold = 0.2)
  }

  // Banded (OR-amplified) hyperplane LSH with its recall hash-pinned — the
  // d3c pattern over embeddings. d5b's single 6-bit signature needs all
  // signs to agree, so realistic-corpus recall at cos>=0.2 is ~4%; 16
  // bands of 4 planes lift the theoretical pair-recall to 1-(1-p^4)^16
  // ~0.8 at the same bucket-join shape. The hyperplanes are seeded, so the
  // measured recall against brute-force ground truth is deterministic and
  // the bound claim hash-compares: DuckDB computes the exact cos>=0.2 pair
  // count (id-bounded to vec_id < 500, the whole corpus at correctness
  // SFs) and constant-folds TRUE; Spark additionally checks containment in
  // the banded output. The all-pairs side is the VERIFICATION harness;
  // the scale path is the band join itself.
  register(
    "d5e_embedding_banded_recall",
    """WITH gt AS (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
      |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |  WHERE a.vec_id < 500 AND b.vec_id < 500
      |    AND round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.2)
      |SELECT CAST(count(*) AS BIGINT) AS exact_pairs, TRUE AS recall_floor_met
      |FROM gt""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "embeddings")
    // id-bounded brute-force ground truth, cached per (session, sf) like
    // the d2e/d3c harness — the banded pipeline below still runs per rep
    val exact = cachedHarness(s, dir, "cos_pairs_500") {
      // materialize + spread the sliced vectors: the inequality pair join
      // is a nested loop that would otherwise re-read one split serially
      val slice = e.where(col("vec_id") < 500)
        .select(col("vec_id"), col("embedding"))
        .repartition(32).localCheckpoint()
      slice.as("a").join(slice.as("b"), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
          round(Dedup.cosine(col("a.embedding"), col("b.embedding")), 6).as("cos"))
        .where(col("cos") >= 0.2)
        .select("id_a", "id_b")
    }
    val found = Dedup.embeddingNearDupsBanded(e, "embedding", "vec_id",
      bands = 16, planesPerBand = 4, threshold = 0.2)
      .select(col("id_a"), col("id_b"), lit(1).as("__found"))
    exact.join(found, Seq("id_a", "id_b"), "left")
      .agg(count(lit(1)).as("__exact"), sum(coalesce(col("__found"), lit(0))).as("__hit"))
      .select(col("__exact").cast("long").as("exact_pairs"),
        // measured recall 0.849-0.857 at sf0.001/sf0.01 (deterministic,
        // theory ~0.82 for cos 0.2 at 16 bands x 4 planes); floor 0.8 sits
        // within 0.05 of the worst measurement (r8 shipped 0.7; tightened
        // after a second round of stable measurements). coalesce: empty
        // ground truth → vacuous-true on both engines, not a NULL mismatch
        coalesce(col("__hit").cast("double") / col("__exact") >= 0.8, lit(true))
          .as("recall_floor_met"))
  }

  // The banded index's INCREMENTAL mode, hash-matched — the d2d
  // construction over embeddings: the staged store is the corpus's banded
  // (id, v) + (id, band, sig) stages, the arriving batch is byte-identical
  // copies of every 7th vector under id + 1,000,000. A copy shares every
  // band signature with its source (detection certain, cos exactly 1.0)
  // while the near-orthogonal rest of the corpus stays far below the 0.9
  // threshold, so the bipartite new-vs-store join has exactly one
  // SQL-expressible answer. Proves the *AgainstStore path of the banded
  // family (d5e pins the full-corpus recall).
  register(
    "d5f_banded_incremental_planted",
    """SELECT vec_id + 1000000 AS id_new, vec_id AS id_store,
      |       CAST(1.0 AS DOUBLE) AS cos
      |FROM embeddings WHERE vec_id % 7 = 0 ORDER BY id_new""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "embeddings")
    val (storeBase, storeBuckets) = Dedup.embeddingStagesBanded(
      e.select(col("vec_id"), col("embedding")), "embedding", "vec_id",
      bands = 16, planesPerBand = 4)
    val batch = e.where(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 1000000).as("vec_id"), col("embedding"))
    Dedup.embeddingNearDupsBandedAgainstStore(batch, "embedding", "vec_id",
      storeBase, storeBuckets, bands = 16, planesPerBand = 4, threshold = 0.9)
      .orderBy("id_new")
  }

  // Embedding-LSH near-dup, hash-matched: byte-identical copies of every
  // 7th vector planted under id + 1,000,000. Identical vectors share every
  // hyperplane sign (same bucket, detection certain) and cosine 1.0, while
  // the near-orthogonal rest of the corpus stays far below the 0.9
  // threshold — the real signature→bucket-join→cosine-verify pipeline has
  // exactly one SQL-expressible answer (d5b keeps the realistic corpus).
  register(
    "d5c_embedding_lsh_planted",
    """SELECT vec_id AS id_a, vec_id + 1000000 AS id_b,
      |       CAST(1.0 AS DOUBLE) AS cos
      |FROM embeddings WHERE vec_id % 7 = 0 ORDER BY id_a""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "embeddings")
    val corpus = e.select(col("vec_id"), col("embedding")).unionAll(
      e.where(col("vec_id") % 7 === 0)
        .select((col("vec_id") + 1000000).as("vec_id"), col("embedding")))
    Dedup.embeddingNearDups(corpus, "embedding", "vec_id",
      planes = 6, threshold = 0.9)
      .orderBy("id_a")
  }

  // Brute-force cosine top-k ANN (correctness baseline).
  register(
    "ann_bruteforce_topk",
    """WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5),
      |scored AS (
      |  SELECT q.q_id, c.vec_id AS neighbor_id,
      |         round(list_cosine_similarity(c.embedding::DOUBLE[], q.q_vec::DOUBLE[]), 6) AS cos
      |  FROM embeddings c CROSS JOIN q WHERE c.vec_id != q.q_id),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id ASC) AS rank
      |  FROM scored)
      |SELECT q_id, neighbor_id, cos, rank FROM ranked WHERE rank <= 3
      |ORDER BY q_id, rank""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "embeddings")
    val queries = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    Similarity.bruteForceTopK(e, queries, k = 3).orderBy("q_id", "rank")
  }

  // Scalar int8 quantization serving: per-dim min-max codes, SYMMETRIC
  // integer-dot ranking — the whole pipeline (range training, encoding,
  // scoring, top-k) is exact integer/fixed-shape-double arithmetic, so
  // unlike the LSH/IVF families this quantized path is hash-proven
  // END-TO-END, not recall-bounded.
  register(
    "ann_sq8_topk",
    """WITH st AS (
      |  SELECT pos, min(CAST(v AS DOUBLE)) AS mn, max(CAST(v AS DOUBLE)) AS mx
      |  FROM (SELECT unnest(embedding) AS v,
      |               generate_subscripts(embedding, 1) AS pos FROM embeddings)
      |  GROUP BY pos),
      |mnmx AS (SELECT list(mn ORDER BY pos) AS mn, list(mx ORDER BY pos) AS mx
      |         FROM st),
      |qz AS (
      |  SELECT vec_id, list_transform(range(1, len(embedding) + 1),
      |    i -> CASE WHEN s.mx[i] > s.mn[i] THEN
      |           greatest(CAST(0 AS BIGINT), least(CAST(255 AS BIGINT),
      |             CAST(floor(((CAST(embedding[i] AS DOUBLE) - s.mn[i]) /
      |               (s.mx[i] - s.mn[i])) * 255.0 + 0.5) AS BIGINT)))
      |         ELSE CAST(0 AS BIGINT) END) AS code
      |  FROM embeddings, mnmx s),
      |q AS (SELECT vec_id AS q_id, code AS q_code FROM qz WHERE vec_id < 5),
      |scored AS (
      |  SELECT q.q_id, c.vec_id AS neighbor_id,
      |         CAST(list_sum(list_transform(range(1, len(c.code) + 1),
      |           i -> c.code[i] * q.q_code[i])) AS BIGINT) AS score
      |  FROM qz c CROSS JOIN q WHERE c.vec_id != q.q_id),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY q_id
      |    ORDER BY score DESC, neighbor_id ASC) AS rank FROM scored)
      |SELECT q_id, neighbor_id, score, rank FROM ranked WHERE rank <= 3
      |ORDER BY q_id, rank""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "embeddings")
    val queries = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    Similarity.sq8TopK(e, queries, k = 3).orderBy("q_id", "rank")
  }

  // Dominant principal component by power iteration — realistic run
  // (rows-only: eigen-solves aren't SQL; the planted twin hash-proves
  // the mechanism).
  registerNoOracle("ann_power_iteration") { (s, dir) =>
    Similarity.powerIteration(t(s, dir, "embeddings"), "embedding",
      dim = 64).orderBy("pos")
  }

  // Planted twin: each source row contributes the PAIR ±[1, 2, 0…], so
  // the mean is exactly zero regardless of corpus parity and the
  // covariance is the exact-integer rank-1 matrix [[1,2],[2,4]] ⊕ 0 —
  // the dominant eigenvector is analytically [1,2]/√5 with eigenvalue
  // 5, and every iterate stays on it, so loadings and eigenvalue
  // hash-match the closed form.
  register(
    "ann_power_planted",
    """SELECT pos,
      |  CASE WHEN pos = 0 THEN
      |         floor((1 / sqrt(5.0)) * 1000000.0 + 0.5) / 1000000.0
      |       WHEN pos = 1 THEN
      |         floor((2 / sqrt(5.0)) * 1000000.0 + 0.5) / 1000000.0
      |       ELSE 0.0 END AS loading,
      |  5.0 AS eigenvalue
      |FROM (SELECT unnest(range(0, 64)) AS pos) ORDER BY pos""".stripMargin) {
    (s, dir) =>
      val sgn = explode(array(lit(1.0), lit(-1.0)))
      val planted = t(s, dir, "embeddings").select(sgn.as("s"))
        .select(transform(sequence(lit(0), lit(63)),
          i => when(i === 0, col("s")).when(i === 1, col("s") * 2)
            .otherwise(lit(0.0))).as("v"))
      Similarity.powerIteration(planted, "v", dim = 64).orderBy("pos")
  }

  // IVF coarse-quantizer training step: per-group per-dimension centroids.
  register(
    "ann_centroids",
    """SELECT label AS grp, pos - 1 AS pos, round(avg(v), 6) AS centroid
      |FROM (SELECT label, unnest(embedding) AS v,
      |             generate_subscripts(embedding, 1) AS pos FROM embeddings)
      |GROUP BY label, pos ORDER BY grp, pos""".stripMargin) { (s, dir) =>
    graft.pipeline.Similarity.centroids(
      t(s, dir, "embeddings").withColumnRenamed("label", "grp"), "embedding", "grp")
      .select(col("group").as("grp"), col("pos"),
        round(col("centroid"), 6).as("centroid"))
      .orderBy("grp", "pos")
  }

  // IVF ANN: inverted lists by nearest centroid, n-probe search (rows-only).
  registerNoOracle("ann_ivf_topk") { (s, dir) =>
    val e = t(s, dir, "embeddings")
    val queries = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    graft.pipeline.Similarity.ivfTopK(e, queries, k = 3, nLists = 8, nProbe = 3)
      .orderBy("q_id", "rank")
  }

  // Banded (AND-OR) LSH ANN with in-band multi-probe (approximate ->
  // rows-only check; the recall-bound row pins the measured quality).
  registerNoOracle("ann_lsh_topk") { (s, dir) =>
    val e = t(s, dir, "embeddings")
    val queries = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    Similarity.lshTopK(e, queries, k = 3).orderBy("q_id", "rank")
  }

  /** The d2c planting construction applied to embeddings: each query vector
    * (vec_id < 5) is re-ingested as `reps` byte-identical copies under ids
    * q_id + r·1,000,000. Identical vectors share every hyperplane sign and
    * every centroid distance, so BOTH bucketed ANN paths find the copies
    * with certainty (they sit in the query's own bucket / nearest inverted
    * list), and cosine(v, v) rounds to exactly 1.0 — strictly above the
    * near-orthogonal rest of the corpus (max pairwise cos ~0.3). The real
    * bucket→probe→verify→top-k pipeline therefore has exactly ONE possible
    * answer: the planted copies in id order. */
  private def plantedAnnCorpus(e: DataFrame, reps: Int): DataFrame = {
    val base = e.select(col("vec_id"), col("embedding"))
    val planted = (1 to reps).map(r => e.where(col("vec_id") < 5)
      .select((col("vec_id") + r * 1000000).as("vec_id"), col("embedding")))
      .reduce(_ unionAll _)
    base.unionAll(planted)
  }

  private val AnnPlantedOracle =
    """SELECT e.vec_id AS q_id, e.vec_id + reps.r * 1000000 AS neighbor_id,
      |       CAST(1.0 AS DOUBLE) AS cos, CAST(reps.r AS INTEGER) AS rank
      |FROM embeddings e CROSS JOIN (SELECT unnest([1, 2, 3]) AS r) reps
      |WHERE e.vec_id < 5 ORDER BY q_id, rank""".stripMargin

  // Hyperplane-LSH ANN, hash-matched via the planted corpus: the top-3 for
  // every query MUST be its three planted copies (cos 1.0, id order) — the
  // approximate path's recall is certain by construction, so the full
  // bucket/multi-probe/top-k machinery gets a real hash oracle.
  register("ann_lsh_planted", AnnPlantedOracle) { (s, dir) =>
    val e = t(s, dir, "embeddings")
    val queries = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    Similarity.lshTopK(plantedAnnCorpus(e, 3), queries, k = 3)
      .orderBy("q_id", "rank")
  }

  // IVF ANN, hash-matched via the same planted corpus: identical vectors
  // land in the query's own nearest inverted list, which nProbe >= 1 always
  // searches — recall through the coarse-quantizer path is certain.
  register("ann_ivf_planted", AnnPlantedOracle) { (s, dir) =>
    val e = t(s, dir, "embeddings")
    val queries = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    graft.pipeline.Similarity.ivfTopK(plantedAnnCorpus(e, 3), queries,
      k = 3, nLists = 8, nProbe = 3)
      .orderBy("q_id", "rank")
  }

  // Recall@k bounds for the approximate ANN paths on the REALISTIC corpus —
  // the d3c/d2e construction with brute-force top-k as the ground truth.
  // DuckDB recomputes the exact top-3 neighbor set of the 5 query vectors
  // (the same ranking ann_bruteforce_topk hash-verifies) and constant-folds
  // the claim to TRUE; Spark recomputes it AND measures containment in the
  // approximate output. Centroids/hyperplanes are seeded, so measured
  // recall is deterministic and the bound claim hash-compares. The ground
  // truth is query-bounded (5 ids), so the brute-force side stays O(corpus)
  // — the same work the approximate path's verify stage already does.
  private val AnnRecallOracle =
    """WITH q AS (SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings WHERE vec_id < 5),
      |scored AS (
      |  SELECT q.q_id, c.vec_id AS neighbor_id,
      |         round(list_cosine_similarity(c.embedding::DOUBLE[], q.q_vec::DOUBLE[]), 6) AS cos
      |  FROM embeddings c CROSS JOIN q WHERE c.vec_id != q.q_id),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id ASC) AS rank
      |  FROM scored)
      |SELECT CAST(count(*) AS BIGINT) AS exact_pairs, TRUE AS recall_floor_met
      |FROM ranked WHERE rank <= 3""".stripMargin

  private def annRecallClaim(exact: DataFrame, approx: DataFrame,
      floor: Double): DataFrame =
    exact.select(col("q_id"), col("neighbor_id"))
      .join(approx.select(col("q_id"), col("neighbor_id"), lit(1).as("__found")),
        Seq("q_id", "neighbor_id"), "left")
      .agg(count(lit(1)).as("__exact"), sum(coalesce(col("__found"), lit(0))).as("__hit"))
      .select(col("__exact").cast("long").as("exact_pairs"),
        // coalesce: empty ground truth → vacuous-true on both engines
        coalesce(col("__hit").cast("double") / col("__exact") >= floor, lit(true))
          .as("recall_floor_met"))

  register("ann_ivf_recall_bound", AnnRecallOracle) { (s, dir) =>
    val e = t(s, dir, "embeddings")
    val queries = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    annRecallClaim(
      Similarity.bruteForceTopK(e, queries, k = 3),
      graft.pipeline.Similarity.ivfTopK(e, queries, k = 3, nLists = 8, nProbe = 3),
      // measured recall@3 is 0.667 (10/15) at BOTH sf0.001 and sf0.01,
      // stable for three rounds — an honest number: the synthetic corpus
      // is near-orthogonal, so the "true" top-3 sit at cos ~0.3 where
      // 3-of-8 probed lists genuinely miss some (the planted rows prove
      // the machinery; this row pins the realistic-corpus behavior).
      // Floor 0.65 = within 0.05 of worst measured (the d5e stability rule)
      floor = 0.65)
  }

  register("ann_lsh_recall_bound", AnnRecallOracle) { (s, dir) =>
    val e = t(s, dir, "embeddings")
    val queries = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    annRecallClaim(
      Similarity.bruteForceTopK(e, queries, k = 3),
      Similarity.lshTopK(e, queries, k = 3),
      // banded AND-OR scheme (8 bands x 6 planes + in-band 1-bit probes):
      // measured recall@3 is 0.867 (13/15) at sf0.001 and 0.933 (14/15)
      // at sf0.01 — theory for cos~0.3 neighbors (p ~ 0.6) predicts ~0.98
      // with probes, vs the 0.2 the single 6-bit signature measured before
      // the r12 graduation. Floor 0.8 = within 0.05 of worst measured
      // (the d5e stability rule)
      floor = 0.8)
  }

  // Classifier-accuracy audit against labeled data: the t3 language-ID
  // heuristic scored per DECLARED label. Measured: en 1.0, everything
  // else 0.0 — the synthetic non-English docs don't contain the es/de
  // stopword lists, so the tiny heuristic defaults to 'en'. That HONEST
  // confusion readout is the point: this is the eval-loop shape every
  // curation classifier needs (predictions join ground truth, one
  // pre-combined agg, exact integer rates) and it correctly reports that
  // this classifier must not gate non-English sources.
  register(
    "t42_langid_accuracy",
    """WITH toks AS (
      |  SELECT doc_id, lang, list_distinct(list_filter(
      |    string_split_regex(lower(text), '\s+'), x -> x != '')) AS t
      |  FROM documents),
      |scores AS (
      |  SELECT doc_id, lang,
      |    len(list_intersect(t, ['the','a','and','scan','join'])) AS s_en,
      |    len(list_intersect(t, ['el','la','que','datos'])) AS s_es,
      |    len(list_intersect(t, ['der','die','und','das'])) AS s_de
      |  FROM toks),
      |pred AS (
      |  SELECT doc_id, lang, CASE
      |    WHEN s_en >= s_es AND s_en >= s_de THEN 'en'
      |    WHEN s_es >= s_de THEN 'es' ELSE 'de' END AS langid
      |  FROM scores)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(CASE WHEN langid = lang THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_match,
      |       round(CAST(sum(CASE WHEN langid = lang THEN 1 ELSE 0 END)
      |             AS DOUBLE) / count(*), 6) AS accuracy
      |FROM pred GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    t(s, dir, "documents")
      .select(col("lang"),
        (TextAnalysis.langId(col("text"), Seq(
          "en" -> Seq("the", "a", "and", "scan", "join"),
          "es" -> Seq("el", "la", "que", "datos"),
          "de" -> Seq("der", "die", "und", "das"))) === col("lang"))
          .cast("long").as("__m"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("__m")).as("n_match"),
        round(sum(col("__m")).cast("double") / count(lit(1)), 6).as("accuracy"))
      .orderBy("lang")
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

  // Round-10 warehouse loop composite: three batches COMMIT to the
  // snapshot store, the materialized view refreshes incrementally after
  // each (manifest delta + moment merge), and the drift monitor compares
  // the first and last ingest batches' histograms — the steady-state
  // closed loop a 100 TB store runs daily, pinned as ONE hash-matched
  // program (the p0/p1 composite tradition for the storage family).
  // Random thirds drift ~0, so the monitor correctly stays silent.
  register(
    "p3_warehouse_loop",
    """WITH m AS (
      |  SELECT l_returnflag,
      |         CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
      |              AS BIGINT) AS s,
      |         CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) *
      |                  CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
      |              AS BIGINT) AS ss
      |  FROM lineitem GROUP BY l_returnflag),
      |a AS (
      |  SELECT l_returnflag,
      |         CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) // 500 AS bin,
      |         count(*) AS n
      |  FROM lineitem WHERE l_orderkey % 3 = 0 GROUP BY 1, 2),
      |b AS (
      |  SELECT l_returnflag,
      |         CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) // 500 AS bin,
      |         count(*) AS n
      |  FROM lineitem WHERE l_orderkey % 3 = 2 GROUP BY 1, 2),
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
      |  FROM j JOIN ta USING (l_returnflag) JOIN tb USING (l_returnflag)),
      |psi AS (
      |  SELECT l_returnflag,
      |         round(list_sum(list(c ORDER BY bin)), 6) AS psi
      |  FROM c GROUP BY l_returnflag)
      |SELECT m.l_returnflag, m.n,
      |       round((CAST(m.s AS DOUBLE) / 100.0) / m.n, 6) AS mean,
      |       round((CAST(m.ss AS DOUBLE) / 10000.0 -
      |              (CAST(m.s AS DOUBLE) / 100.0) *
      |              (CAST(m.s AS DOUBLE) / 100.0) / m.n) / m.n, 6) AS var_pop,
      |       psi.psi, psi.psi > 0.1 AS drifted
      |FROM m JOIN psi USING (l_returnflag)
      |ORDER BY m.l_returnflag""".stripMargin) { (s, dir) =>
    import graft.history.{Materialized, Snapshots}
    val root = scratchDir("graft_p3base")
    val viewRoot = scratchDir("graft_p3view")
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
    // drift monitor over the FIRST vs LAST committed batches, read back
    // from their snapshot versions (time travel is the monitor's input)
    def hist(v: Long) = Sketches.histSketches(
      if (v == 1) Snapshots.read(s, root, Some(1L))
      else Snapshots.read(s, root, Some(v))
        .exceptAll(Snapshots.read(s, root, Some(v - 1))),
      Seq("l_returnflag"), col("qc"), binWidthCents = 500L)
    val drift = Sketches.psiDrift(hist(1L), hist(3L), Seq("l_returnflag"))
    Sketches.momentStats(view)
      .join(drift, "l_returnflag")
      .select(col("l_returnflag"), col("n"), col("mean"), col("var_pop"),
        col("psi"), col("drifted"))
      .orderBy("l_returnflag")
  }

  // Edit-distance verification (the character-level complement to n-gram
  // Jaccard for SHORT strings — titles, names, URLs — where shingles are
  // too coarse): Levenshtein over adjacent-id document pairs, normalized
  // by the longer length at 6 dp. Classic DP is engine-identical;
  // per-pair O(len²) work stays scan-side.
  register(
    "d16_edit_distance",
    """SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |       CAST(levenshtein(a.text, b.text) AS BIGINT) AS dist,
      |       round(CAST(levenshtein(a.text, b.text) AS DOUBLE) /
      |             greatest(len(a.text), len(b.text)), 6) AS norm_dist
      |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      |ORDER BY id_a""".stripMargin) { (s, dir) =>
    val d = t(s, dir, "documents")
    d.as("a").join(d.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        levenshtein(col("a.text"), col("b.text")).cast("long").as("dist"),
        round(levenshtein(col("a.text"), col("b.text")).cast("double") /
          greatest(length(col("a.text")), length(col("b.text"))), 6)
          .as("norm_dist"))
      .orderBy("id_a")
  }

  // Semantic (embedding-space) test-set decontamination: the benchmark
  // slice (vec_id < 5) broadcasts with precomputed norms; every training
  // vector takes its max cosine against it, pre-combined map-side —
  // paraphrased benchmark leakage the lexical tiers (t8/t8b/t33) miss.
  // Planted copies of the benchmark vectors (ids + 1,000,000, cos 1.0 by
  // construction) MUST be flagged, so the drop verdict is hash-proven
  // alongside the realistic rows (the near-orthogonal corpus keeps its
  // honest max-cos ~0.3, all kept).
  register(
    "d17_semantic_decontaminate",
    """WITH bench AS (SELECT embedding AS bv FROM embeddings WHERE vec_id < 5),
      |train AS (
      |  SELECT vec_id, embedding FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id < 5),
      |scored AS (
      |  SELECT t.vec_id,
      |         max(round(list_cosine_similarity(t.embedding::DOUBLE[],
      |                                          b.bv::DOUBLE[]), 6)) AS max_bench_cos
      |  FROM train t CROSS JOIN bench b GROUP BY t.vec_id)
      |SELECT vec_id, max_bench_cos, max_bench_cos < 0.95 AS keep
      |FROM scored ORDER BY vec_id""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "embeddings")
    val train = e.select(col("vec_id"), col("embedding")).unionAll(
      e.where(col("vec_id") < 5)
        .select((col("vec_id") + 1000000).as("vec_id"), col("embedding")))
    val bench = e.where(col("vec_id") < 5).select(col("embedding"))
    Dedup.semanticDecontaminate(train, bench, "vec_id", "embedding",
        "embedding", threshold = 0.95)
      .orderBy("vec_id")
  }

  // Blocked fuzzy entity resolution: a corrupted twin of every customer
  // (the '#' separator swapped for '=') must link back to exactly its
  // source — levenshtein 1 to the source, >= 2 to every other name —
  // searched only inside (name-digit-prefix, nation) blocks so the
  // quadratic edit distance never sees the table, just the block.
  register(
    "p4_entity_resolution",
    """WITH dirty AS (
      |  SELECT c_custkey + 1000000 AS d_id,
      |         replace(c_name, '#', '=') AS d_name,
      |         c_nationkey AS d_nat
      |  FROM customer),
      |m AS (
      |  SELECT d.d_id, c.c_custkey,
      |         CAST(levenshtein(d.d_name, c.c_name) AS BIGINT) AS dist
      |  FROM dirty d JOIN customer c
      |    ON substr(d.d_name, 10, 6) = substr(c.c_name, 10, 6)
      |   AND d.d_nat = c.c_nationkey
      |  WHERE levenshtein(d.d_name, c.c_name) <= 1),
      |r AS (SELECT d_id, c_custkey, dist,
      |             row_number() OVER (PARTITION BY d_id
      |                                ORDER BY dist, c_custkey) AS rn
      |      FROM m)
      |SELECT d_id, c_custkey AS matched_id, dist
      |FROM r WHERE rn = 1 ORDER BY d_id""".stripMargin) { (s, dir) =>
    val cust = t(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
    val dirty = cust.select(
      (col("c_custkey") + 1000000).as("d_id"),
      regexp_replace(col("c_name"), "#", "=").as("d_name"),
      col("c_nationkey").as("d_nat"))
    Dedup.entityMatch(dirty, cust, "d_id", "c_custkey", "d_name", "c_name",
        blockKeys = Seq(
          substring(col("d_name"), 10, 6) -> substring(col("c_name"), 10, 6),
          col("d_nat") -> col("c_nationkey")),
        maxDist = 1)
      .orderBy("d_id")
  }

  // Greedy k-center diverse selection (Gonzalez farthest-point): 4
  // selection rounds, each a corpus scan folding the running min-distance
  // against a one-row broadcast center — the coreset/diversity sampler
  // for curation. The oracle unrolls all 4 rounds as CTEs with the
  // operator's exact fold nesting (least of 6-dp-rounded distances),
  // argmax tie-break (mind desc, vec_id asc), and the chosen-id
  // exclusion (NOT IN prior centers — k distinct ids guaranteed).
  register(
    "ann_kcenter_select",
    """WITH e AS (SELECT vec_id, embedding FROM embeddings),
      |c1 AS (SELECT vec_id, embedding FROM e ORDER BY vec_id LIMIT 1),
      |d1 AS (SELECT e.vec_id,
      |              round(1 - list_cosine_similarity(e.embedding::DOUBLE[],
      |                    c1.embedding::DOUBLE[]), 6) AS mind
      |       FROM e, c1),
      |c2 AS (SELECT e.vec_id, e.embedding FROM e JOIN d1 USING (vec_id)
      |       WHERE e.vec_id NOT IN (SELECT vec_id FROM c1)
      |       ORDER BY d1.mind DESC, e.vec_id LIMIT 1),
      |d2 AS (SELECT d1.vec_id,
      |              least(d1.mind, round(1 - list_cosine_similarity(
      |                e.embedding::DOUBLE[], c2.embedding::DOUBLE[]), 6)) AS mind
      |       FROM d1 JOIN e USING (vec_id), c2),
      |c3 AS (SELECT e.vec_id, e.embedding FROM e JOIN d2 USING (vec_id)
      |       WHERE e.vec_id NOT IN (SELECT vec_id FROM c1
      |                              UNION SELECT vec_id FROM c2)
      |       ORDER BY d2.mind DESC, e.vec_id LIMIT 1),
      |d3 AS (SELECT d2.vec_id,
      |              least(d2.mind, round(1 - list_cosine_similarity(
      |                e.embedding::DOUBLE[], c3.embedding::DOUBLE[]), 6)) AS mind
      |       FROM d2 JOIN e USING (vec_id), c3),
      |c4 AS (SELECT e.vec_id FROM e JOIN d3 USING (vec_id)
      |       WHERE e.vec_id NOT IN (SELECT vec_id FROM c1
      |                              UNION SELECT vec_id FROM c2
      |                              UNION SELECT vec_id FROM c3)
      |       ORDER BY d3.mind DESC, e.vec_id LIMIT 1)
      |SELECT CAST(1 AS BIGINT) AS sel_rank, (SELECT vec_id FROM c1) AS vec_id
      |UNION ALL SELECT 2, (SELECT vec_id FROM c2)
      |UNION ALL SELECT 3, (SELECT vec_id FROM c3)
      |UNION ALL SELECT 4, (SELECT vec_id FROM c4)
      |ORDER BY sel_rank""".stripMargin) { (s, dir) =>
    Similarity.kCenterSelect(t(s, dir, "embeddings"), "embedding", "vec_id",
      k = 4).orderBy("sel_rank")
  }

  // Matryoshka-truncation audit: recall@3 of 16-dim-prefix cosine search
  // against the full 64-dim ranking — the "can we serve on a prefix"
  // embedding-efficiency question (Kusupati et al. 2022). Both rankings
  // are deterministic (6-dp cosines, id tie-breaks), so per-query recall
  // is EXACT on both engines — no floor needed, the values themselves
  // hash-match. Measured recall here is 0.0: the synthetic random
  // embeddings have NO nested structure, and the audit's whole point is
  // to measure that before anyone serves on a prefix (MRL-trained
  // embeddings would score near 1). Truncation is a scan-side slice.
  register(
    "ann_matryoshka_recall",
    """WITH q AS (SELECT vec_id AS q_id, embedding FROM embeddings WHERE vec_id < 5),
      |full_r AS (
      |  SELECT q_id, neighbor_id FROM (
      |    SELECT q.q_id, c.vec_id AS neighbor_id,
      |           row_number() OVER (PARTITION BY q.q_id ORDER BY
      |             round(list_cosine_similarity(c.embedding::DOUBLE[],
      |               q.embedding::DOUBLE[]), 6) DESC, c.vec_id ASC) AS rank
      |    FROM embeddings c CROSS JOIN q WHERE c.vec_id != q.q_id)
      |  WHERE rank <= 3),
      |tr AS (
      |  SELECT q_id, neighbor_id FROM (
      |    SELECT q.q_id, c.vec_id AS neighbor_id,
      |           row_number() OVER (PARTITION BY q.q_id ORDER BY
      |             round(list_cosine_similarity(c.embedding[1:16]::DOUBLE[],
      |               q.embedding[1:16]::DOUBLE[]), 6) DESC, c.vec_id ASC) AS rank
      |    FROM embeddings c CROSS JOIN q WHERE c.vec_id != q.q_id)
      |  WHERE rank <= 3)
      |SELECT f.q_id,
      |       round(CAST(count(t.neighbor_id) AS DOUBLE) / 3.0, 6) AS recall
      |FROM full_r f LEFT JOIN tr t
      |  ON t.q_id = f.q_id AND t.neighbor_id = f.neighbor_id
      |GROUP BY f.q_id ORDER BY f.q_id""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "embeddings")
    val queries = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val full = Similarity.bruteForceTopK(e, queries, k = 3)
      .select(col("q_id"), col("neighbor_id"))
    val eT = e.select(col("vec_id"), slice(col("embedding"), 1, 16).as("embedding"))
    val qT = queries.select(col("q_id"), slice(col("q_vec"), 1, 16).as("q_vec"))
    val trunc = Similarity.bruteForceTopK(eT, qT, k = 3)
      .select(col("q_id"), col("neighbor_id"), lit(1).as("__hit"))
    full.join(trunc, Seq("q_id", "neighbor_id"), "left")
      .groupBy("q_id")
      .agg(round(sum(coalesce(col("__hit"), lit(0))).cast("double") / 3.0, 6)
        .as("recall"))
      .orderBy("q_id")
  }

  // MMR diversity re-ranking over each query's exact top-8 shortlist:
  // pick 3 of 8 maximizing 0.7·relevance − 0.3·max-cos-to-picked — the
  // serving-side diversification of the retrieval chain. The oracle
  // unrolls all 3 greedy rounds as CTEs with the operator's exact score
  // rounding, coefficient literals (0.7/0.3 derived from integer
  // percents on the Spark side so both engines parse the same doubles),
  // max-sim fold, and (score desc, cand asc) tie-break.
  register(
    "ann_mmr_rerank",
    """WITH q AS (SELECT vec_id AS q_id, embedding AS qv FROM embeddings
      |           WHERE vec_id < 3),
      |sc AS (SELECT q.q_id, c.vec_id AS cid,
      |              round(list_cosine_similarity(c.embedding::DOUBLE[],
      |                                           q.qv::DOUBLE[]), 6) AS rel,
      |              c.embedding AS cv
      |       FROM embeddings c CROSS JOIN q WHERE c.vec_id != q.q_id),
      |cand AS (SELECT q_id, cid, rel, cv FROM (
      |           SELECT *, row_number() OVER (PARTITION BY q_id
      |                      ORDER BY rel DESC, cid ASC) AS rn FROM sc)
      |         WHERE rn <= 8),
      |s1 AS (SELECT q_id, cid, rel, cv,
      |              floor((0.7 * rel - 0.3 * 0.0) * 1000000 + 0.5) / 1000000.0
      |                AS score FROM cand),
      |p1 AS (SELECT q_id, cid, score, cv FROM (
      |         SELECT *, row_number() OVER (PARTITION BY q_id
      |                    ORDER BY score DESC, cid ASC) AS rn FROM s1)
      |       WHERE rn = 1),
      |st2 AS (SELECT c.q_id, c.cid, c.rel, c.cv,
      |               greatest(0.0, round(list_cosine_similarity(
      |                 c.cv::DOUBLE[], p1.cv::DOUBLE[]), 6)) AS maxsim
      |        FROM cand c JOIN p1 ON p1.q_id = c.q_id AND c.cid != p1.cid),
      |s2 AS (SELECT q_id, cid, rel, cv, maxsim,
      |              floor((0.7 * rel - 0.3 * maxsim) * 1000000 + 0.5) / 1000000.0
      |                AS score FROM st2),
      |p2 AS (SELECT q_id, cid, score, cv FROM (
      |         SELECT *, row_number() OVER (PARTITION BY q_id
      |                    ORDER BY score DESC, cid ASC) AS rn FROM s2)
      |       WHERE rn = 1),
      |st3 AS (SELECT c.q_id, c.cid, c.rel, c.cv,
      |               greatest(c.maxsim, round(list_cosine_similarity(
      |                 c.cv::DOUBLE[], p2.cv::DOUBLE[]), 6)) AS maxsim
      |        FROM s2 c JOIN p2 ON p2.q_id = c.q_id AND c.cid != p2.cid),
      |s3 AS (SELECT q_id, cid, rel, cv, maxsim,
      |              floor((0.7 * rel - 0.3 * maxsim) * 1000000 + 0.5) / 1000000.0
      |                AS score FROM st3),
      |p3 AS (SELECT q_id, cid, score FROM (
      |         SELECT *, row_number() OVER (PARTITION BY q_id
      |                    ORDER BY score DESC, cid ASC) AS rn FROM s3)
      |       WHERE rn = 1)
      |SELECT q_id, CAST(1 AS BIGINT) AS rank, cid AS cand_id, score FROM p1
      |UNION ALL SELECT q_id, 2, cid, score FROM p2
      |UNION ALL SELECT q_id, 3, cid, score FROM p3
      |ORDER BY q_id, rank""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "embeddings")
    val queries = e.where(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val shortlist = Similarity.bruteForceTopK(e, queries, k = 8)
    val cands = shortlist.join(
      e.select(col("vec_id").as("neighbor_id"), col("embedding")),
      "neighbor_id")
    Similarity.mmrRerank(cands, k = 3, lambdaPct = 70)
      .orderBy("q_id", "rank")
  }

  // Embedding covariance matrix (the PCA/whitening/OPQ training
  // statistic): ONE corpus pass through the vec_moments
  // TypedImperativeAggregate — fixed-size [n, Σx, upper-tri Σxy] buffers
  // partial-aggregate map-side, never a dim²-per-row explode. Per-term
  // integer micro-unit lifting makes the sums partitioning-exact, and
  // the covariance derivation is the same double expression tree in both
  // engines — full hash oracle over all dim(dim+1)/2 = 2080 cells.
  register(
    "ann_covariance",
    """WITH v AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS p,
      |         unnest(embedding)::DOUBLE AS x
      |  FROM embeddings),
      |pp AS (
      |  SELECT a.p AS i, b.p AS j,
      |         sum(CAST(floor(a.x * b.x * 1000000 + 0.5) AS BIGINT)) AS pxy
      |  FROM v a JOIN v b ON a.vec_id = b.vec_id AND a.p <= b.p
      |  GROUP BY a.p, b.p),
      |s AS (SELECT p, sum(CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS sx
      |      FROM v GROUP BY p),
      |n AS (SELECT count(*) AS n FROM embeddings)
      |SELECT pp.i - 1 AS i, pp.j - 1 AS j,
      |       round(pxy / (1000000.0 * n) -
      |             (sa.sx / (1000000.0 * n)) * (sb.sx / (1000000.0 * n)), 6)
      |         + 0.0 AS cov
      |FROM pp JOIN s sa ON sa.p = pp.i JOIN s sb ON sb.p = pp.j CROSS JOIN n
      |ORDER BY i, j""".stripMargin) { (s, dir) =>
    Similarity.covarianceMatrix(t(s, dir, "embeddings"), "embedding", dim = 64)
      .orderBy("i", "j")
  }

  // Two-sample embedding drift: covariance cells of the even-id slice vs
  // the odd-id slice with |delta| — the quantizer-retraining signal
  // between corpus snapshots. Same fixed-point moments machinery as
  // ann_covariance (one GramAgg pass per slice), so every cell
  // hash-matches; on the synthetic corpus the halves are iid draws and
  // the measured dcov is honestly tiny but nonzero.
  register(
    "ann_embedding_drift",
    """WITH v AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS p,
      |         unnest(embedding)::DOUBLE AS x
      |  FROM embeddings),
      |cov AS (
      |  SELECT pp.side, i - 1 AS i, j - 1 AS j,
      |         round(pxy / (1000000.0 * n) -
      |               (si / (1000000.0 * n)) * (sj / (1000000.0 * n)), 6) + 0.0
      |           AS cov
      |  FROM (
      |    SELECT a.vec_id % 2 AS side, a.p AS i, b.p AS j,
      |           sum(CAST(floor(a.x * b.x * 1000000 + 0.5) AS BIGINT)) AS pxy
      |    FROM v a JOIN v b ON a.vec_id = b.vec_id AND a.p <= b.p
      |    GROUP BY 1, 2, 3) pp
      |  JOIN (SELECT vec_id % 2 AS side, p,
      |               sum(CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS si
      |        FROM v GROUP BY 1, 2) s1 ON s1.side = pp.side AND s1.p = pp.i
      |  JOIN (SELECT vec_id % 2 AS side, p,
      |               sum(CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS sj
      |        FROM v GROUP BY 1, 2) s2 ON s2.side = pp.side AND s2.p = pp.j
      |  JOIN (SELECT vec_id % 2 AS side, count(*) AS n
      |        FROM embeddings GROUP BY 1) nn ON nn.side = pp.side)
      |SELECT ca.i, ca.j, ca.cov AS cov_a, cb.cov AS cov_b,
      |       round(abs(ca.cov - cb.cov), 6) + 0.0 AS dcov
      |FROM (SELECT * FROM cov WHERE side = 0) ca
      |JOIN (SELECT * FROM cov WHERE side = 1) cb USING (i, j)
      |ORDER BY i, j""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "embeddings")
    Similarity.embeddingDrift(
      e.where(col("vec_id") % 2 === 0), e.where(col("vec_id") % 2 === 1),
      "embedding", dim = 64)
      .orderBy("i", "j")
  }

  // Margin-based parallel-pair mining (Artetxe & Schwenk 2019 — the
  // CCMatrix/NLLB bitext-mining score): even vec_ids play the source
  // language, odd ones the target; each source keeps its best-margin
  // target (cos normalized by both sides' mean top-4 neighborhood
  // cosine). EXACT hash oracle: cosines round to 6 dp then lift to
  // integer micro-units (the money-in-cents move), neighborhood means
  // stay integer-sum / exact-count, and the margin is one fixed-shape
  // double expression over exact integers — bit-identical across
  // engines. Source side is id-bounded (< 200) so the mining pass stays
  // O(|X|·|Y|) with a small X at every sf; cos is symmetric, so both
  // kNN directions share one scored table in the oracle.
  register(
    "ann_margin_mine",
    """WITH x AS (SELECT vec_id AS x_id, embedding AS xv FROM embeddings
      |           WHERE vec_id % 2 = 0 AND vec_id < 200),
      |y AS (SELECT vec_id AS y_id, embedding AS yv FROM embeddings
      |      WHERE vec_id % 2 = 1),
      |sx AS (SELECT x_id, y_id,
      |              round(list_cosine_similarity(yv::DOUBLE[], xv::DOUBLE[]), 6) AS cos
      |       FROM x CROSS JOIN y),
      |xk AS (SELECT x_id, y_id, cos FROM (
      |         SELECT *, row_number() OVER (PARTITION BY x_id
      |                    ORDER BY cos DESC, y_id ASC) AS rn FROM sx)
      |       WHERE rn <= 4),
      |yk AS (SELECT x_id, y_id, cos FROM (
      |         SELECT *, row_number() OVER (PARTITION BY y_id
      |                    ORDER BY cos DESC, x_id ASC) AS rn FROM sx)
      |       WHERE rn <= 4),
      |xa AS (SELECT x_id, sum(CAST(floor(cos * 1000000 + 0.5) AS BIGINT)) AS sxs,
      |              count(*) AS cx FROM xk GROUP BY x_id),
      |ya AS (SELECT y_id, sum(CAST(floor(cos * 1000000 + 0.5) AS BIGINT)) AS sys,
      |              count(*) AS cy FROM yk GROUP BY y_id),
      |m AS (SELECT xk.x_id, xk.y_id, xk.cos,
      |             CASE WHEN (CAST(sxs AS DOUBLE) / cx + CAST(sys AS DOUBLE) / cy) / 2 > 0
      |               THEN round(CAST(floor(xk.cos * 1000000 + 0.5) AS BIGINT) /
      |                 ((CAST(sxs AS DOUBLE) / cx + CAST(sys AS DOUBLE) / cy) / 2), 6)
      |             END AS margin
      |      FROM xk JOIN xa USING (x_id) JOIN ya USING (y_id)),
      |r AS (SELECT *, row_number() OVER (PARTITION BY x_id
      |               ORDER BY margin DESC NULLS LAST, y_id ASC) AS rn FROM m)
      |SELECT x_id, y_id, cos, margin FROM r
      |WHERE rn = 1 AND margin IS NOT NULL AND margin >= 1.0
      |ORDER BY x_id""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "embeddings")
    val xs = e.where(col("vec_id") % 2 === 0 && col("vec_id") < 200)
      .select(col("vec_id").as("x_id"), col("embedding").as("x_vec"))
    val ys = e.where(col("vec_id") % 2 === 1)
      .select(col("vec_id").as("y_id"), col("embedding").as("y_vec"))
    Similarity.marginMine(xs, ys, k = 4, threshold = 1.0)
      .orderBy("x_id")
  }

  // Composite program (the p0/p1 tradition): margin-mine parallel pairs,
  // then gate each mined pair's TARGET through semantic benchmark
  // decontamination — the bitext-curation loop a multilingual pipeline
  // runs end to end (mine -> decontaminate -> ship), pinned as ONE
  // hash-matched program. Mining algebra = ann_margin_mine's; the gate =
  // d17's max-bench-cos; on this corpus the keeps are honestly all true
  // (near-orthogonal bench), with d17 carrying the planted drop proof.
  register(
    "p5_mined_pair_curation",
    """WITH x AS (SELECT vec_id AS x_id, embedding AS xv FROM embeddings
      |           WHERE vec_id % 2 = 0 AND vec_id < 200),
      |y AS (SELECT vec_id AS y_id, embedding AS yv FROM embeddings
      |      WHERE vec_id % 2 = 1),
      |sx AS (SELECT x_id, y_id,
      |              round(list_cosine_similarity(yv::DOUBLE[], xv::DOUBLE[]), 6) AS cos
      |       FROM x CROSS JOIN y),
      |xk AS (SELECT x_id, y_id, cos FROM (
      |         SELECT *, row_number() OVER (PARTITION BY x_id
      |                    ORDER BY cos DESC, y_id ASC) AS rn FROM sx)
      |       WHERE rn <= 4),
      |yk AS (SELECT x_id, y_id, cos FROM (
      |         SELECT *, row_number() OVER (PARTITION BY y_id
      |                    ORDER BY cos DESC, x_id ASC) AS rn FROM sx)
      |       WHERE rn <= 4),
      |xa AS (SELECT x_id, sum(CAST(floor(cos * 1000000 + 0.5) AS BIGINT)) AS sxs,
      |              count(*) AS cx FROM xk GROUP BY x_id),
      |ya AS (SELECT y_id, sum(CAST(floor(cos * 1000000 + 0.5) AS BIGINT)) AS sys,
      |              count(*) AS cy FROM yk GROUP BY y_id),
      |m AS (SELECT xk.x_id, xk.y_id, xk.cos,
      |             CASE WHEN (CAST(sxs AS DOUBLE) / cx + CAST(sys AS DOUBLE) / cy) / 2 > 0
      |               THEN round(CAST(floor(xk.cos * 1000000 + 0.5) AS BIGINT) /
      |                 ((CAST(sxs AS DOUBLE) / cx + CAST(sys AS DOUBLE) / cy) / 2), 6)
      |             END AS margin
      |      FROM xk JOIN xa USING (x_id) JOIN ya USING (y_id)),
      |mined AS (SELECT x_id, y_id, cos, margin FROM (
      |            SELECT *, row_number() OVER (PARTITION BY x_id
      |                       ORDER BY margin DESC NULLS LAST, y_id ASC) AS rn
      |            FROM m)
      |          WHERE rn = 1 AND margin IS NOT NULL AND margin >= 1.0),
      |deco AS (SELECT y.y_id,
      |                max(round(list_cosine_similarity(y.yv::DOUBLE[],
      |                                                 be.bv::DOUBLE[]), 6))
      |                  AS bench_cos
      |         FROM y CROSS JOIN (SELECT embedding AS bv FROM embeddings
      |                            WHERE vec_id < 5) be
      |         GROUP BY y.y_id)
      |SELECT mined.x_id, mined.y_id, mined.margin, deco.bench_cos,
      |       deco.bench_cos < 0.95 AS keep
      |FROM mined JOIN deco USING (y_id)
      |ORDER BY x_id""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "embeddings")
    val xs = e.where(col("vec_id") % 2 === 0 && col("vec_id") < 200)
      .select(col("vec_id").as("x_id"), col("embedding").as("x_vec"))
    val ys = e.where(col("vec_id") % 2 === 1)
      .select(col("vec_id").as("y_id"), col("embedding").as("y_vec"))
    val bench = e.where(col("vec_id") < 5).select(col("embedding"))
    val mined = Similarity.marginMine(xs, ys, k = 4, threshold = 1.0)
    val deco = Dedup.semanticDecontaminate(ys, bench, "y_id", "y_vec",
      "embedding", threshold = 0.95)
    mined.join(deco, "y_id")
      .select(col("x_id"), col("y_id"), col("margin"),
        col("max_bench_cos").as("bench_cos"), col("keep"))
      .orderBy("x_id")
  }

  /** Deterministic PQ codebook for the oracle rows: code c of subspace s is
    * the s-th 16-dim slice of vector c (vec_id < 4) — SQL-expressible, so
    * the encode/ADC machinery gets an exact hash oracle (production trains
    * the codebook per subspace with [[graft.pipeline.Similarity.kmeansLloyd]];
    * see the PipelineOpsSpec composition test). */
  private def pqSliceCodebook(e: DataFrame): DataFrame =
    e.where(col("vec_id") < 4)
      .select(col("vec_id").cast("int").as("code"),
        explode(sequence(lit(0), lit(3))).as("sub"), col("embedding"))
      .select(col("sub"), col("code"),
        slice(col("embedding").cast("array<double>"),
          col("sub") * 16 + 1, lit(16)).as("centroid"))

  private val PqCbSql =
    """cb AS (
      |  SELECT s.s AS sub, e.vec_id::INT AS code,
      |         list_transform(range(s.s * 16 + 1, s.s * 16 + 17),
      |           i -> e.embedding[i]::DOUBLE) AS cvec
      |  FROM embeddings e CROSS JOIN (SELECT unnest(range(0, 4)) AS s) s
      |  WHERE e.vec_id < 4),
      |enc AS (
      |  SELECT v.vec_id, cb.sub, cb.code,
      |         row_number() OVER (PARTITION BY v.vec_id, cb.sub ORDER BY
      |           round(list_sum(list_transform(range(1, 17),
      |             i -> (v.embedding[cb.sub * 16 + i]::DOUBLE - cb.cvec[i]) *
      |                  (v.embedding[cb.sub * 16 + i]::DOUBLE - cb.cvec[i]))), 6) ASC,
      |           cb.code ASC) AS rn
      |  FROM embeddings v CROSS JOIN cb)""".stripMargin

  // PQ encode: 64-dim float vectors -> 4 code bytes (nearest codebook
  // centroid per 16-dim subspace). Exact hash oracle — encoding is a
  // deterministic argmin on 6-decimal-rounded distances, no planting
  // needed. The memory move of billion-vector ANN. Codes project as ONE
  // comma-joined string on both sides — the q17_array_agg trick — because
  // the driver's pandas compare cannot lexsort a LIST column.
  register(
    "ann_pq_encode",
    s"""WITH $PqCbSql
      |SELECT vec_id, string_agg(code::VARCHAR, ',' ORDER BY sub) AS codes
      |FROM enc WHERE rn = 1 GROUP BY vec_id ORDER BY vec_id""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "embeddings")
    graft.pipeline.Similarity.pqEncode(e, pqSliceCodebook(e))
      .select(col("vec_id"),
        concat_ws(",", col("codes").cast("array<string>")).as("codes"))
      .orderBy("vec_id")
  }

  // PQ asymmetric-distance top-k: per-query m-by-K distance table, candidate
  // distance = 4 table lookups summed over the CODES table (the float
  // corpus is never touched). Deterministic end-to-end -> exact hash oracle.
  register(
    "ann_pq_adc_topk",
    s"""WITH $PqCbSql,
      |codes AS (SELECT vec_id, sub, code FROM enc WHERE rn = 1),
      |q AS (SELECT vec_id AS q_id, embedding FROM embeddings WHERE vec_id < 5),
      |dt AS (
      |  SELECT q.q_id, cb.sub, cb.code,
      |         round(list_sum(list_transform(range(1, 17),
      |           i -> (q.embedding[cb.sub * 16 + i]::DOUBLE - cb.cvec[i]) *
      |                (q.embedding[cb.sub * 16 + i]::DOUBLE - cb.cvec[i]))), 6) AS d2
      |  FROM q CROSS JOIN cb),
      |cand AS (
      |  SELECT dt.q_id, c.vec_id AS neighbor_id,
      |         round(list_sum(list(dt.d2 ORDER BY dt.sub)), 6) AS adist
      |  FROM codes c JOIN dt ON c.sub = dt.sub AND c.code = dt.code
      |  WHERE c.vec_id != dt.q_id
      |  GROUP BY dt.q_id, c.vec_id),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY q_id
      |    ORDER BY adist ASC, neighbor_id ASC) AS rank FROM cand)
      |SELECT q_id, neighbor_id, adist, rank FROM ranked WHERE rank <= 3
      |ORDER BY q_id, rank""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "embeddings")
    val cb = pqSliceCodebook(e)
    val codes = graft.pipeline.Similarity.pqEncode(e, cb)
    val queries = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    graft.pipeline.Similarity.pqAdcTopK(codes, queries, cb, k = 3)
      .orderBy("q_id", "rank")
  }

  // Two-stage PQ serving: the ADC scan over-fetches a 10-candidate
  // shortlist per query (codes only), then exact squared-L2 re-ranks
  // just those ids to top-3 — the standard recovery for PQ quantization
  // error. Float reads are shortlist-cardinality; every stage is a
  // deterministic argmin on 6-decimal-rounded distances → exact oracle.
  register(
    "ann_pq_refine_topk",
    s"""WITH $PqCbSql,
      |codes AS (SELECT vec_id, sub, code FROM enc WHERE rn = 1),
      |q AS (SELECT vec_id AS q_id, embedding FROM embeddings WHERE vec_id < 5),
      |dt AS (
      |  SELECT q.q_id, cb.sub, cb.code,
      |         round(list_sum(list_transform(range(1, 17),
      |           i -> (q.embedding[cb.sub * 16 + i]::DOUBLE - cb.cvec[i]) *
      |                (q.embedding[cb.sub * 16 + i]::DOUBLE - cb.cvec[i]))), 6) AS d2
      |  FROM q CROSS JOIN cb),
      |cand AS (
      |  SELECT dt.q_id, c.vec_id AS neighbor_id,
      |         round(list_sum(list(dt.d2 ORDER BY dt.sub)), 6) AS adist
      |  FROM codes c JOIN dt ON c.sub = dt.sub AND c.code = dt.code
      |  WHERE c.vec_id != dt.q_id
      |  GROUP BY dt.q_id, c.vec_id),
      |shortlist AS (
      |  SELECT q_id, neighbor_id FROM (
      |    SELECT *, row_number() OVER (PARTITION BY q_id
      |      ORDER BY adist ASC, neighbor_id ASC) AS arank FROM cand)
      |  WHERE arank <= 10),
      |refined AS (
      |  SELECT s.q_id, s.neighbor_id,
      |         round(list_sum(list_transform(range(1, 65),
      |           i -> (q.embedding[i]::DOUBLE - v.embedding[i]::DOUBLE) *
      |                (q.embedding[i]::DOUBLE - v.embedding[i]::DOUBLE))), 6) AS dist2
      |  FROM shortlist s
      |  JOIN embeddings v ON v.vec_id = s.neighbor_id
      |  JOIN q ON q.q_id = s.q_id),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY q_id
      |    ORDER BY dist2 ASC, neighbor_id ASC) AS rank FROM refined)
      |SELECT q_id, neighbor_id, dist2, rank FROM ranked WHERE rank <= 3
      |ORDER BY q_id, rank""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "embeddings")
    val cb = pqSliceCodebook(e)
    val codes = graft.pipeline.Similarity.pqEncode(e, cb)
    val queries = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    graft.pipeline.Similarity.pqRefineTopK(e, codes, queries, cb,
        k = 3, rerank = 10)
      .orderBy("q_id", "rank")
  }

  // IVF-PQ: the composed serving architecture (coarse inverted lists
  // restrict the scan, PQ codes replace floats, ADC scores candidates).
  // Explicit centroids (vectors 0-7) + sliced codebook make EVERY stage —
  // list assignment, probes, codes, distance tables, final rank — a
  // deterministic argmin on 6-decimal-rounded distances, so the whole
  // composition carries an exact hash oracle with no planting.
  register(
    "ann_ivfpq_topk",
    s"""WITH $PqCbSql,
      |codes AS (SELECT vec_id, sub, code FROM enc WHERE rn = 1),
      |cen AS (SELECT vec_id::INT AS g, list_transform(embedding, x -> x::DOUBLE) AS cv
      |        FROM embeddings WHERE vec_id < 8),
      |lists AS (
      |  SELECT v.vec_id, cen.g,
      |         row_number() OVER (PARTITION BY v.vec_id ORDER BY
      |           round(list_sum(list_transform(range(1, 65),
      |             i -> (v.embedding[i]::DOUBLE - cen.cv[i]) *
      |                  (v.embedding[i]::DOUBLE - cen.cv[i]))), 6) ASC, cen.g ASC) AS rn
      |  FROM embeddings v CROSS JOIN cen),
      |assign AS (SELECT vec_id, g AS list FROM lists WHERE rn = 1),
      |q AS (SELECT vec_id AS q_id, embedding FROM embeddings WHERE vec_id < 5),
      |qprobe AS (
      |  SELECT q.q_id, cen.g AS list,
      |         row_number() OVER (PARTITION BY q.q_id ORDER BY
      |           round(list_sum(list_transform(range(1, 65),
      |             i -> (q.embedding[i]::DOUBLE - cen.cv[i]) *
      |                  (q.embedding[i]::DOUBLE - cen.cv[i]))), 6) ASC, cen.g ASC) AS rn
      |  FROM q CROSS JOIN cen),
      |probes AS (SELECT q_id, list FROM qprobe WHERE rn <= 3),
      |dt AS (
      |  SELECT q.q_id, cb.sub, cb.code,
      |         round(list_sum(list_transform(range(1, 17),
      |           i -> (q.embedding[cb.sub * 16 + i]::DOUBLE - cb.cvec[i]) *
      |                (q.embedding[cb.sub * 16 + i]::DOUBLE - cb.cvec[i]))), 6) AS d2
      |  FROM q CROSS JOIN cb),
      |cand AS (
      |  SELECT p.q_id, a.vec_id AS neighbor_id
      |  FROM probes p JOIN assign a ON a.list = p.list
      |  WHERE a.vec_id != p.q_id),
      |scored AS (
      |  SELECT c.q_id, c.neighbor_id,
      |         round(list_sum(list(dt.d2 ORDER BY dt.sub)), 6) AS adist
      |  FROM cand c
      |  JOIN codes co ON co.vec_id = c.neighbor_id
      |  JOIN dt ON dt.q_id = c.q_id AND dt.sub = co.sub AND dt.code = co.code
      |  GROUP BY c.q_id, c.neighbor_id),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY q_id
      |    ORDER BY adist ASC, neighbor_id ASC) AS rank FROM scored)
      |SELECT q_id, neighbor_id, adist, rank FROM ranked WHERE rank <= 3
      |ORDER BY q_id, rank""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "embeddings")
    val cents = e.where(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("group"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "centroid")))
    val queries = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    graft.pipeline.Similarity.ivfPqTopK(e, queries, cents, pqSliceCodebook(e),
      k = 3, nProbe = 3)
      .orderBy("q_id", "rank")
  }

  // IVF-PQ against a MATERIALIZED (id, list, codes) index — the
  // build-once/probe-many serving loop (the ANN analogue of t13b's staged
  // postings): the index localCheckpoints so the serving plan provably
  // starts from the store with no float-corpus lineage, and the result
  // must hash-equal the inline composition's (same oracle).
  register(
    "ann_ivfpq_store",
    s"""WITH $PqCbSql,
      |codes AS (SELECT vec_id, sub, code FROM enc WHERE rn = 1),
      |cen AS (SELECT vec_id::INT AS g, list_transform(embedding, x -> x::DOUBLE) AS cv
      |        FROM embeddings WHERE vec_id < 8),
      |lists AS (
      |  SELECT v.vec_id, cen.g,
      |         row_number() OVER (PARTITION BY v.vec_id ORDER BY
      |           round(list_sum(list_transform(range(1, 65),
      |             i -> (v.embedding[i]::DOUBLE - cen.cv[i]) *
      |                  (v.embedding[i]::DOUBLE - cen.cv[i]))), 6) ASC, cen.g ASC) AS rn
      |  FROM embeddings v CROSS JOIN cen),
      |assign AS (SELECT vec_id, g AS list FROM lists WHERE rn = 1),
      |q AS (SELECT vec_id AS q_id, embedding FROM embeddings WHERE vec_id < 5),
      |qprobe AS (
      |  SELECT q.q_id, cen.g AS list,
      |         row_number() OVER (PARTITION BY q.q_id ORDER BY
      |           round(list_sum(list_transform(range(1, 65),
      |             i -> (q.embedding[i]::DOUBLE - cen.cv[i]) *
      |                  (q.embedding[i]::DOUBLE - cen.cv[i]))), 6) ASC, cen.g ASC) AS rn
      |  FROM q CROSS JOIN cen),
      |probes AS (SELECT q_id, list FROM qprobe WHERE rn <= 3),
      |dt AS (
      |  SELECT q.q_id, cb.sub, cb.code,
      |         round(list_sum(list_transform(range(1, 17),
      |           i -> (q.embedding[cb.sub * 16 + i]::DOUBLE - cb.cvec[i]) *
      |                (q.embedding[cb.sub * 16 + i]::DOUBLE - cb.cvec[i]))), 6) AS d2
      |  FROM q CROSS JOIN cb),
      |cand AS (
      |  SELECT p.q_id, a.vec_id AS neighbor_id
      |  FROM probes p JOIN assign a ON a.list = p.list
      |  WHERE a.vec_id != p.q_id),
      |scored AS (
      |  SELECT c.q_id, c.neighbor_id,
      |         round(list_sum(list(dt.d2 ORDER BY dt.sub)), 6) AS adist
      |  FROM cand c
      |  JOIN codes co ON co.vec_id = c.neighbor_id
      |  JOIN dt ON dt.q_id = c.q_id AND dt.sub = co.sub AND dt.code = co.code
      |  GROUP BY c.q_id, c.neighbor_id),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY q_id
      |    ORDER BY adist ASC, neighbor_id ASC) AS rank FROM scored)
      |SELECT q_id, neighbor_id, adist, rank FROM ranked WHERE rank <= 3
      |ORDER BY q_id, rank""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "embeddings")
    val cents = e.where(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("group"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("pos", "centroid")))
    val queries = e.where(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val cb = pqSliceCodebook(e)
    val index = graft.pipeline.Similarity.ivfPqIndex(e, cents, cb)
      .localCheckpoint(true)
    graft.pipeline.Similarity.ivfPqTopKAgainstStore(index, queries, cents, cb,
      k = 3, nProbe = 3)
      .orderBy("q_id", "rank")
  }

  // K-means Lloyd training (the trainer behind the IVF quantizer and
  // semantic dedup), proven EXACTLY — no planting needed: Lloyd from fixed
  // seeds is deterministic (assignment argmin on 6-decimal-rounded squared
  // distances with cluster-id tie-break, means in double), so two rounds
  // seeded from the first four vectors have exactly one answer and the
  // whole assign→mean→reassign→mean loop hash-matches DuckDB.
  register(
    "ann_kmeans_lloyd",
    """WITH corpus AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |init AS (SELECT vec_id::INT AS cluster, embedding::DOUBLE[] AS c
      |         FROM embeddings WHERE vec_id < 4),
      |a1 AS (
      |  SELECT vec_id, cluster FROM (
      |    SELECT corpus.vec_id, init.cluster,
      |           row_number() OVER (PARTITION BY corpus.vec_id ORDER BY
      |             round(list_sum(list_transform(range(1, len(v) + 1),
      |               i -> (v[i] - c[i]) * (v[i] - c[i]))), 6), init.cluster) AS rn
      |    FROM corpus CROSS JOIN init)
      |  WHERE rn = 1),
      |c1 AS (
      |  SELECT cluster, pos - 1 AS pos, avg(val) AS cen FROM (
      |    SELECT a1.cluster, unnest(corpus.v) AS val,
      |           generate_subscripts(corpus.v, 1) AS pos
      |    FROM a1 JOIN corpus ON a1.vec_id = corpus.vec_id)
      |  GROUP BY cluster, pos),
      |c1v AS (SELECT cluster, list(cen ORDER BY pos) AS c FROM c1 GROUP BY cluster),
      |a2 AS (
      |  SELECT vec_id, cluster FROM (
      |    SELECT corpus.vec_id, c1v.cluster,
      |           row_number() OVER (PARTITION BY corpus.vec_id ORDER BY
      |             round(list_sum(list_transform(range(1, len(v) + 1),
      |               i -> (v[i] - c[i]) * (v[i] - c[i]))), 6), c1v.cluster) AS rn
      |    FROM corpus CROSS JOIN c1v)
      |  WHERE rn = 1),
      |c2 AS (
      |  SELECT cluster, pos - 1 AS pos, avg(val) AS cen FROM (
      |    SELECT a2.cluster, unnest(corpus.v) AS val,
      |           generate_subscripts(corpus.v, 1) AS pos
      |    FROM a2 JOIN corpus ON a2.vec_id = corpus.vec_id)
      |  GROUP BY cluster, pos)
      |SELECT cluster, pos, round(cen, 6) AS centroid FROM c2
      |ORDER BY cluster, pos""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "embeddings")
    val init = e.where(col("vec_id") < 4)
      .select(col("vec_id").cast("int").as("cluster"),
        col("embedding").as("centroid_vec"))
    Similarity.kmeansLloyd(e, init, iters = 2)
      .select(col("cluster"), col("pos"),
        round(col("centroid"), 6).as("centroid"))
      .orderBy("cluster", "pos")
  }

  // Okapi BM25 top-k retrieval: the corpus-audit probe search ("which
  // documents answer this query"). Postings carry (doc_id, term, tf, dl)
  // from one scan-side explode+pre-combined agg; probe terms, their df, and
  // the corpus stats all broadcast, so scoring touches only matched
  // postings. Double arithmetic written identically on both sides, scores
  // rounded to 6 BEFORE ranking, ties by doc_id — fully hash-matched.
  register(
    "t13_bm25_topk",
    """WITH q AS (SELECT * FROM (VALUES ('q1', 'table scan'),
      |    ('q2', 'merge join batch'), ('q3', 'vector data stream'))
      |    AS q(q_id, q_text)),
      |post AS (
      |  SELECT doc_id, dl, term, count(*)::DOUBLE AS tf FROM (
      |    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM (
      |      SELECT doc_id,
      |             list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')
      |               AS toks
      |      FROM documents))
      |  GROUP BY doc_id, dl, term),
      |qt AS (
      |  SELECT q_id, unnest(list_distinct(
      |    list_filter(string_split_regex(lower(q_text), '\s+'), x -> x != ''))) AS term
      |  FROM q),
      |stats AS (
      |  SELECT count(*)::DOUBLE AS n,
      |         avg(len(list_filter(string_split_regex(lower(text), '\s+'),
      |             x -> x != ''))::DOUBLE) AS avgdl
      |  FROM documents),
      |dft AS (
      |  SELECT term, count(*)::DOUBLE AS df
      |  FROM post JOIN (SELECT DISTINCT term FROM qt) v USING (term)
      |  GROUP BY term),
      |scored AS (
      |  SELECT qt.q_id, post.doc_id,
      |         round(sum(ln((n - df + 0.5) / (df + 0.5) + 1.0) *
      |           tf * (1.2 + 1.0) /
      |           (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 6) AS score
      |  FROM post JOIN qt USING (term) JOIN dft USING (term) CROSS JOIN stats
      |  GROUP BY qt.q_id, post.doc_id)
      |SELECT q_id, doc_id, score, rank FROM (
      |  SELECT *, row_number() OVER (PARTITION BY q_id
      |    ORDER BY score DESC, doc_id ASC) AS rank FROM scored)
      |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin) { (s, dir) =>
    val session = s
    import session.implicits._
    val probes = Seq(("q1", "table scan"), ("q2", "merge join batch"),
      ("q3", "vector data stream")).toDF("q_id", "q_text")
    graft.pipeline.Retrieval.bm25TopK(t(s, dir, "documents"), probes, k = 5)
      .orderBy("q_id", "rank")
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

  // Lexical diversity per source: distinct-trigram ratio (the distinct-n
  // diversity audit — low ratios flag templated/boilerplate sources that
  // would teach a model to repeat itself). Exact integer counts from one
  // explode + pre-combined aggs; ratio at 6 dp.
  register(
    "t39_ngram_diversity",
    """WITH g AS (
      |  SELECT source, t.gram FROM (
      |    SELECT source, list_filter(string_split_regex(lower(text), '\s+'),
      |                               x -> x != '') AS toks
      |    FROM documents) d,
      |  LATERAL (SELECT unnest(list_transform(
      |    generate_series(1, len(d.toks) - 2),
      |    i -> d.toks[i] || ' ' || d.toks[i+1] || ' ' || d.toks[i+2])) AS gram) t)
      |SELECT source,
      |       CAST(count(*) AS BIGINT) AS total_trigrams,
      |       CAST(count(DISTINCT gram) AS BIGINT) AS distinct_trigrams,
      |       round(CAST(count(DISTINCT gram) AS DOUBLE) / count(*), 6)
      |         AS diversity
      |FROM g GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    val toks = TextAnalysis.tokens(lower(col("text")))
    t(s, dir, "documents")
      .select(col("source"), toks.as("toks"))
      .where(size(col("toks")) >= 3)
      .select(col("source"), explode(transform(
        sequence(lit(0), size(col("toks")) - 3),
        i => concat_ws(" ", element_at(col("toks"), i + 1),
          element_at(col("toks"), i + 2), element_at(col("toks"), i + 3))))
        .as("gram"))
      .groupBy("source")
      .agg(count(lit(1)).as("total_trigrams"),
        count_distinct(col("gram")).as("distinct_trigrams"),
        round(count_distinct(col("gram")).cast("double") / count(lit(1)), 6)
          .as("diversity"))
      .orderBy("source")
  }

  // Split-leakage audit — the eval-hygiene composite: near-duplicate
  // pairs whose members land in DIFFERENT train/val/test splits are
  // contamination that benchmark decontamination (t8/t8b/t33) cannot
  // see, because both sides live inside the corpus. Composes the real
  // minhash near-dup pipeline with the md5-interval split rule on the
  // planted corpus (byte-identical copies under id+1e6 — the d2c
  // construction), where the leaked set is SQL-exact: the planted pairs
  // whose two ids hash into different splits (4 at sf0.01, 22 at sf0.1).
  register(
    "p2_split_leakage",
    """WITH p AS (SELECT doc_id AS id_a, doc_id + 1000000 AS id_b
      |           FROM documents WHERE doc_id % 97 = 0),
      |s AS (SELECT id,
      |        CASE WHEN substr(md5(CAST(id AS VARCHAR)), 1, 8) < 'cccccccc'
      |               THEN 'train'
      |             WHEN substr(md5(CAST(id AS VARCHAR)), 1, 8) < 'e6666666'
      |               THEN 'val'
      |             ELSE 'test' END AS split
      |      FROM (SELECT id_a AS id FROM p UNION SELECT id_b FROM p))
      |SELECT p.id_a, p.id_b, sa.split AS split_a, sb.split AS split_b
      |FROM p JOIN s sa ON sa.id = p.id_a JOIN s sb ON sb.id = p.id_b
      |WHERE sa.split != sb.split ORDER BY p.id_a""".stripMargin) { (s, dir) =>
    val corpus = docPlantedCorpus(t(s, dir, "documents"))
    val pairs = Dedup.minhashNearDups(corpus, "text", "doc_id",
      shingleWords = 2, numHashes = 32, bands = 8, threshold = 0.5)
    val splits = TextAnalysis.splitAssign(corpus.select("doc_id"), "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select(col("doc_id"), col("split"))
    pairs
      .join(splits.select(col("doc_id").as("id_a"), col("split").as("split_a")),
        "id_a")
      .join(splits.select(col("doc_id").as("id_b"), col("split").as("split_b")),
        "id_b")
      .where(col("split_a") =!= col("split_b"))
      .select("id_a", "id_b", "split_a", "split_b")
      .orderBy("id_a")
  }

  /** Piece vocabulary for the t38 WordPiece fertility row — fixed multi-char
    * pieces; single characters are the implicit fallback on both engines. */
  private val WpVocab = Seq("ta", "er", "an", "in", "re", "st", "on",
    "ing", "ion", "ble", "data", "scan")

  /** One greedy-match step of the t38 oracle: consume the longest vocab
    * piece at the cursor (or one char), frozen once the cursor passes the
    * word end — the CTE-unrolled mirror of the Spark-side aggregate fold
    * (10 steps cover the corpus's max 8-char token with margin). */
  private def wpStepSql(i: Int): String =
    s"""s$i AS (
       |  SELECT tok, pos + step AS pos,
       |         cnt + (CASE WHEN pos <= len(tok) THEN 1 ELSE 0 END) AS cnt
       |  FROM (
       |    SELECT s.tok, s.pos, s.cnt,
       |           CASE WHEN s.pos <= len(s.tok)
       |                THEN max(CASE WHEN substr(s.tok, s.pos, len(v.piece)) = v.piece
       |                              THEN len(v.piece) ELSE 1 END)
       |                ELSE 0 END AS step
       |    FROM s${i - 1} s CROSS JOIN v
       |    GROUP BY s.tok, s.pos, s.cnt))""".stripMargin

  // WordPiece-style tokenization fertility (pieces per word): greedy
  // longest-match segmentation against a fixed piece vocabulary, run as
  // a codegen'd aggregate fold over character positions on the Spark
  // side and as 10 unrolled greedy CTE steps in the oracle — the
  // tokenizer-choice metric for a pretraining corpus. Segmentation is
  // vocabulary-cardinality work (distinct words), joined back to
  // pre-combined per-doc word counts; all-integer until the final 6 dp
  // division.
  register(
    "t38_wordpiece_fertility",
    s"""WITH wc AS (
      |  SELECT doc_id, tok, count(*) AS c FROM (
      |    SELECT doc_id, unnest(list_filter(
      |      string_split_regex(lower(text), '\\s+'), x -> x != '')) AS tok
      |    FROM documents) GROUP BY doc_id, tok),
      |dw AS (SELECT DISTINCT tok FROM wc),
      |v(piece) AS (SELECT * FROM (VALUES
      |  ${WpVocab.map(p => s"('$p')").mkString(", ")}) t(piece)),
      |s0 AS (SELECT tok, 1 AS pos, 0 AS cnt FROM dw),
      |${(1 to 10).map(wpStepSql).mkString(",\n")}
      |SELECT wc.doc_id,
      |       CAST(sum(wc.c) AS BIGINT) AS n_words,
      |       CAST(sum(wc.c * s10.cnt) AS BIGINT) AS n_pieces,
      |       round(CAST(sum(wc.c * s10.cnt) AS DOUBLE) / sum(wc.c), 6)
      |         AS fertility
      |FROM wc JOIN s10 USING (tok)
      |GROUP BY wc.doc_id ORDER BY wc.doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.wordpieceFertility(t(s, dir, "documents"), "text", "doc_id",
        WpVocab)
      .orderBy("doc_id")
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

  // Sketch-guided EXACT top-k — the two-pass pattern that makes "exact
  // top 10 tokens" affordable at corpus scale: pass 1 summarizes each
  // partition with a Misra-Gries sketch (no vocabulary shuffle), pass 2
  // recounts ONLY the <= 64 candidates (broadcast semi-join at the scan)
  // and ranks exactly. The MG theorem guarantees the true top-10 survive
  // pass 1 whenever the 10th frequency exceeds n/65 (it does here: 30+
  // tokens clear that bar, pinned by t31), so the result equals the
  // full exact top-10 the oracle computes.
  register(
    "t37_exact_topk_twopass",
    """WITH toks AS (
      |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                x -> x != '')) AS tok
      |  FROM documents),
      |c AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok)
      |SELECT tok, CAST(cnt AS BIGINT) AS cnt, rank FROM (
      |  SELECT *, row_number() OVER (ORDER BY cnt DESC, tok ASC) AS rank
      |  FROM c)
      |WHERE rank <= 10 ORDER BY rank""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val toks = t(s, dir, "documents")
      .select(explode(TextAnalysis.tokens(lower(col("text")))).as("tok"))
    val cand = toks
      .agg(graft.functions.MisraGriesAgg.misra_gries(col("tok"), 64).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item").as("tok"))
    val exact = toks.join(broadcast(cand), "tok")
      .groupBy("tok").agg(count(lit(1)).as("cnt"))
    exact
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cnt").desc, col("tok").asc)))
      .where(col("rank") <= 10)
      .orderBy("rank")
  }

  // k-anonymity audit (Sweeney 2002): equivalence classes over the
  // quasi-identifier tuple (event_type, epoch-day, value decile); classes
  // smaller than k=5 are re-identifiable and flagged for suppression —
  // the structured-data counterpart of PII redaction before a corpus
  // ships. One pre-combined agg keyed by the QI tuple.
  register(
    "t36_k_anonymity",
    """SELECT event_type, epoch_us(ts) // 86400000000 AS day,
      |       CAST(floor(value / 10.0) AS BIGINT) AS value_bucket,
      |       CAST(count(*) AS BIGINT) AS n,
      |       count(*) < 5 AS suppress
      |FROM events GROUP BY 1, 2, 3
      |ORDER BY event_type, day, value_bucket""".stripMargin) { (s, dir) =>
    val qi = t(s, dir, "events").select(
      col("event_type"),
      expr("unix_micros(ts) div 86400000000").as("day"),
      floor(col("value") / 10.0).cast("long").as("value_bucket"))
    graft.pipeline.TextAnalysis.kAnonymityClasses(qi,
        Seq("event_type", "day", "value_bucket"), k = 5)
      .orderBy("event_type", "day", "value_bucket")
  }

  // Reciprocal-rank fusion of lexical BM25 and dense cosine rankings —
  // the hybrid-retrieval merge (Cormack et al. 2009): score =
  // Σ 1/(60+rank), missing entries contribute 0, no cross-system score
  // calibration. Probes q1-q3 pair their BM25 text with embedding
  // vectors 1-3 as the dense queries (synthetic 1:1 id spaces). Two-term
  // IEEE addition is exactly commutative, so the fused doubles are
  // engine-identical; ranks tie-break on doc_id.
  register(
    "t35_rrf_fusion",
    """WITH q AS (SELECT * FROM (VALUES ('q1', 'table scan'),
      |    ('q2', 'merge join batch'), ('q3', 'vector data stream'))
      |    AS q(q_id, q_text)),
      |post AS (
      |  SELECT doc_id, dl, term, count(*)::DOUBLE AS tf FROM (
      |    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM (
      |      SELECT doc_id,
      |             list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')
      |               AS toks
      |      FROM documents))
      |  GROUP BY doc_id, dl, term),
      |qt AS (
      |  SELECT q_id, unnest(list_distinct(
      |    list_filter(string_split_regex(lower(q_text), '\s+'), x -> x != ''))) AS term
      |  FROM q),
      |stats AS (
      |  SELECT count(*)::DOUBLE AS n,
      |         avg(len(list_filter(string_split_regex(lower(text), '\s+'),
      |             x -> x != ''))::DOUBLE) AS avgdl
      |  FROM documents),
      |dft AS (
      |  SELECT term, count(*)::DOUBLE AS df
      |  FROM post JOIN (SELECT DISTINCT term FROM qt) v USING (term)
      |  GROUP BY term),
      |scored AS (
      |  SELECT qt.q_id, post.doc_id,
      |         round(sum(ln((n - df + 0.5) / (df + 0.5) + 1.0) *
      |           tf * (1.2 + 1.0) /
      |           (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 6) AS score
      |  FROM post JOIN qt USING (term) JOIN dft USING (term) CROSS JOIN stats
      |  GROUP BY qt.q_id, post.doc_id),
      |lex10 AS (
      |  SELECT q_id, doc_id, rank FROM (
      |    SELECT *, row_number() OVER (PARTITION BY q_id
      |      ORDER BY score DESC, doc_id ASC) AS rank FROM scored)
      |  WHERE rank <= 10),
      |dq AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id IN (1, 2, 3)),
      |dense10 AS (
      |  SELECT q_id, doc_id, rank FROM (
      |    SELECT 'q' || dq.vec_id AS q_id, c.vec_id AS doc_id,
      |           row_number() OVER (PARTITION BY dq.vec_id ORDER BY
      |             round(list_cosine_similarity(c.embedding::DOUBLE[],
      |               dq.embedding::DOUBLE[]), 6) DESC, c.vec_id ASC) AS rank
      |    FROM embeddings c CROSS JOIN dq WHERE c.vec_id != dq.vec_id)
      |  WHERE rank <= 10),
      |fused AS (
      |  SELECT coalesce(l.q_id, d.q_id) AS q_id,
      |         coalesce(l.doc_id, d.doc_id) AS doc_id,
      |         round(coalesce(1.0 / (60 + l.rank), 0) +
      |               coalesce(1.0 / (60 + d.rank), 0), 6) AS rrf_score
      |  FROM lex10 l FULL OUTER JOIN dense10 d
      |    ON l.q_id = d.q_id AND l.doc_id = d.doc_id)
      |SELECT q_id, doc_id, rrf_score, rank FROM (
      |  SELECT *, row_number() OVER (PARTITION BY q_id
      |    ORDER BY rrf_score DESC, doc_id ASC) AS rank FROM fused)
      |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin) { (s, dir) =>
    val session = s
    import session.implicits._
    val probes = Seq(("q1", "table scan"), ("q2", "merge join batch"),
      ("q3", "vector data stream")).toDF("q_id", "q_text")
    val lex = graft.pipeline.Retrieval
      .bm25TopK(t(s, dir, "documents"), probes, k = 10)
      .select(col("q_id"), col("doc_id"), col("rank"))
    val e = t(s, dir, "embeddings")
    val dq = e.where(col("vec_id").isin(1, 2, 3))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val dense = Similarity.bruteForceTopK(e, dq, k = 10)
      .select(concat(lit("q"), col("q_id")).as("q_id"),
        col("neighbor_id").as("doc_id"), col("rank"))
    graft.pipeline.Retrieval.rrfFuse(Seq(lex, dense), k = 5)
      .orderBy("q_id", "rank")
  }

  // BM25 against a staged postings store — the build-once/probe-many
  // serving loop (the retrieval analogue of d2b's signature store): corpus
  // stats are derived from the store's distinct (doc, dl) pairs, raw text
  // never rescanned. Hash-matched with the stats written store-side in the
  // oracle too, so the serving path's equivalence is proven, not assumed.
  register(
    "t13b_bm25_store",
    """WITH q AS (SELECT * FROM (VALUES ('q1', 'table scan'),
      |    ('q2', 'merge join batch'), ('q3', 'vector data stream'))
      |    AS q(q_id, q_text)),
      |post AS (
      |  SELECT doc_id, dl, term, count(*)::DOUBLE AS tf FROM (
      |    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM (
      |      SELECT doc_id,
      |             list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')
      |               AS toks
      |      FROM documents))
      |  GROUP BY doc_id, dl, term),
      |qt AS (
      |  SELECT q_id, unnest(list_distinct(
      |    list_filter(string_split_regex(lower(q_text), '\s+'), x -> x != ''))) AS term
      |  FROM q),
      |stats AS (
      |  SELECT count(*)::DOUBLE AS n, avg(dl::DOUBLE) AS avgdl
      |  FROM (SELECT DISTINCT doc_id, dl FROM post)),
      |dft AS (
      |  SELECT term, count(*)::DOUBLE AS df
      |  FROM post JOIN (SELECT DISTINCT term FROM qt) v USING (term)
      |  GROUP BY term),
      |scored AS (
      |  SELECT qt.q_id, post.doc_id,
      |         round(sum(ln((n - df + 0.5) / (df + 0.5) + 1.0) *
      |           tf * (1.2 + 1.0) /
      |           (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 6) AS score
      |  FROM post JOIN qt USING (term) JOIN dft USING (term) CROSS JOIN stats
      |  GROUP BY qt.q_id, post.doc_id)
      |SELECT q_id, doc_id, score, rank FROM (
      |  SELECT *, row_number() OVER (PARTITION BY q_id
      |    ORDER BY score DESC, doc_id ASC) AS rank FROM scored)
      |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin) { (s, dir) =>
    val session = s
    import session.implicits._
    val probes = Seq(("q1", "table scan"), ("q2", "merge join batch"),
      ("q3", "vector data stream")).toDF("q_id", "q_text")
    val store = graft.pipeline.Retrieval.postings(t(s, dir, "documents"))
    graft.pipeline.Retrieval.bm25TopKAgainstStore(store, probes, k = 5)
      .orderBy("q_id", "rank")
  }

  // BM25 hard-negative mining (the DPR recipe): per (query, positive) pair,
  // the k best-scoring docs that are NOT the positive. Positives here are
  // the BM25 top-1 per probe — deterministic on both engines — so the
  // negatives are exactly ranks 2..k+1 renumbered, and the whole
  // candidates→exclude→re-rank path is hash-proven.
  register(
    "t13c_bm25_hard_negatives",
    """WITH q AS (SELECT * FROM (VALUES ('q1', 'table scan'),
      |    ('q2', 'merge join batch'), ('q3', 'vector data stream'))
      |    AS q(q_id, q_text)),
      |post AS (
      |  SELECT doc_id, dl, term, count(*)::DOUBLE AS tf FROM (
      |    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM (
      |      SELECT doc_id,
      |             list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')
      |               AS toks
      |      FROM documents))
      |  GROUP BY doc_id, dl, term),
      |qt AS (
      |  SELECT q_id, unnest(list_distinct(
      |    list_filter(string_split_regex(lower(q_text), '\s+'), x -> x != ''))) AS term
      |  FROM q),
      |stats AS (
      |  SELECT count(*)::DOUBLE AS n,
      |         avg(len(list_filter(string_split_regex(lower(text), '\s+'),
      |             x -> x != ''))::DOUBLE) AS avgdl
      |  FROM documents),
      |dft AS (
      |  SELECT term, count(*)::DOUBLE AS df
      |  FROM post JOIN (SELECT DISTINCT term FROM qt) v USING (term)
      |  GROUP BY term),
      |scored AS (
      |  SELECT qt.q_id, post.doc_id,
      |         round(sum(ln((n - df + 0.5) / (df + 0.5) + 1.0) *
      |           tf * (1.2 + 1.0) /
      |           (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 6) AS score
      |  FROM post JOIN qt USING (term) JOIN dft USING (term) CROSS JOIN stats
      |  GROUP BY qt.q_id, post.doc_id),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY q_id
      |    ORDER BY score DESC, doc_id ASC) AS rank FROM scored),
      |pos AS (SELECT q_id, doc_id AS pos_id FROM ranked WHERE rank = 1)
      |SELECT r.q_id, pos_id, doc_id, score, rank - 1 AS neg_rank
      |FROM ranked r JOIN pos USING (q_id)
      |WHERE rank BETWEEN 2 AND 6
      |ORDER BY q_id, neg_rank""".stripMargin) { (s, dir) =>
    val session = s
    import session.implicits._
    val probes = Seq(("q1", "table scan"), ("q2", "merge join batch"),
      ("q3", "vector data stream")).toDF("q_id", "q_text")
    val docs = t(s, dir, "documents")
    val top1 = graft.pipeline.Retrieval.bm25TopK(docs, probes, k = 1)
      .select(col("q_id"), col("doc_id").as("pos_id"))
    val posPairs = probes.join(top1, Seq("q_id"))
    graft.pipeline.Retrieval.hardNegatives(docs, posPairs, k = 5)
      .orderBy("q_id", "neg_rank")
  }

  // TF-IDF salient terms per document ("what is this document about") —
  // full-vocabulary document frequencies from one skinny pre-combined agg,
  // per-doc top-3 window over (doc_id, term, score) triples.
  register(
    "t14_tfidf_top_terms",
    """WITH post AS (
      |  SELECT doc_id, dl, term, count(*)::DOUBLE AS tf FROM (
      |    SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM (
      |      SELECT doc_id,
      |             list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')
      |               AS toks
      |      FROM documents))
      |  GROUP BY doc_id, dl, term),
      |stats AS (SELECT count(*)::DOUBLE AS n FROM documents),
      |dft AS (SELECT term, count(*)::DOUBLE AS df FROM post GROUP BY term),
      |scored AS (
      |  SELECT doc_id, term, round(tf / dl * ln(n / df), 6) AS tfidf
      |  FROM post JOIN dft USING (term) CROSS JOIN stats)
      |SELECT doc_id, term, tfidf, rank FROM (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id
      |    ORDER BY tfidf DESC, term ASC) AS rank FROM scored)
      |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin) { (s, dir) =>
    graft.pipeline.Retrieval.tfidfTopTerms(t(s, dir, "documents"), k = 3)
      .orderBy("doc_id", "rank")
  }

  // Offset-based sequence packing (pretraining batch prep): documents of
  // each source laid end-to-end in id order; a doc joins the sequence its
  // start offset falls in. Pure integer arithmetic over one running-sum
  // window per source — deterministic, hash-matched.
  register(
    "t15_sequence_pack",
    """WITH t AS (
      |  SELECT doc_id, source,
      |         len(list_filter(string_split_regex(text, '\s+'), x -> x != ''))
      |           ::BIGINT AS n_tokens
      |  FROM documents),
      |s AS (
      |  SELECT doc_id, source, n_tokens,
      |         coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
      |  FROM t)
      |SELECT doc_id, source, n_tokens,
      |       CAST(start // 256 AS BIGINT) AS seq_idx,
      |       CAST(start % 256 AS BIGINT) AS seq_offset
      |FROM s ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.packSequences(t(s, dir, "documents"), seqTokens = 256)
      .orderBy("doc_id")
  }

  // Per-source corpus mix report — the source-composition audit a corpus
  // curator runs before weighting: doc/token mass and mean quality per
  // source. One pre-combined agg; every input column is an already-oracled
  // operator (t1/t2).
  register(
    "t16_source_mix",
    """SELECT source,
      |       count(*) AS n_docs,
      |       CAST(sum(len(list_filter(string_split_regex(text, '\s+'),
      |         x -> x != ''))) AS BIGINT) AS sum_tokens,
      |       round(avg(round(greatest(0.0,
      |         least(length(text) / 500.0, 1.0) * 0.4 +
      |         least((len(list_filter(string_split_regex(lower(text), '\s+'),
      |                 x -> x IN ('the','a','of','and','to','in'))) ::DOUBLE /
      |                greatest(len(list_filter(string_split_regex(lower(text), '\s+'),
      |                 x -> x != '')), 1)) * 3.0, 1.0) * 0.4 +
      |         (1.0 - least(len(regexp_extract_all(text, '[^\w\s]'))::DOUBLE /
      |                      greatest(length(text), 1) * 5.0, 1.0)) * 0.2), 6)), 6)
      |         AS avg_quality
      |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    t(s, dir, "documents").groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("sum_tokens"),
        round(avg(TextAnalysis.qualityScore(col("text"),
          Seq("the", "a", "of", "and", "to", "in"))), 6).as("avg_quality"))
      .orderBy("source")
  }

  // Gopher-style rule filter (published surface-statistic thresholds):
  // per-document stats, one boolean per rule, composite keep. All ratios
  // are divisions of exact integer counts — hash-matched across engines.
  register(
    "t17_gopher_rules",
    """WITH toks AS (
      |  SELECT doc_id, text,
      |         list_filter(string_split_regex(text, '\s+'), x -> x != '') AS tk,
      |         list_filter(string_split(text, chr(10)), l -> trim(l) != '') AS ls
      |  FROM documents),
      |m AS (
      |  SELECT doc_id,
      |         len(tk)::BIGINT AS n_words,
      |         round(CASE WHEN len(tk) > 0
      |           THEN list_sum(list_transform(tk, x -> length(x)))::DOUBLE / len(tk)
      |           ELSE 0.0 END, 6) AS mean_word_len,
      |         round((len(regexp_extract_all(text, '#')) +
      |                len(regexp_extract_all(text, '\.\.\.')))::DOUBLE /
      |               greatest(len(tk), 1), 6) AS symbol_ratio,
      |         round(CASE WHEN len(ls) > 0
      |           THEN len(list_filter(ls, l -> substr(ltrim(l), 1, 1) IN ('-', '*', '•')))::DOUBLE / len(ls)
      |           ELSE 0.0 END, 6) AS bullet_ratio,
      |         round(CASE WHEN len(ls) > 0
      |           THEN len(list_filter(ls, l -> ends_with(rtrim(l), '...') OR ends_with(rtrim(l), '…')))::DOUBLE / len(ls)
      |           ELSE 0.0 END, 6) AS ellipsis_ratio,
      |         round(CASE WHEN len(tk) > 0
      |           THEN len(list_filter(tk, x -> regexp_matches(x, '[A-Za-z]')))::DOUBLE / len(tk)
      |           ELSE 0.0 END, 6) AS alpha_frac,
      |         len(list_intersect(
      |           list_distinct(list_filter(string_split_regex(lower(text), '\s+'), x -> x != '')),
      |           ['the','be','to','of','and','that','have','with']))::BIGINT AS stop_hits
      |  FROM toks)
      |SELECT *,
      |       n_words BETWEEN 50 AND 100000 AS ok_words,
      |       mean_word_len BETWEEN 3.0 AND 10.0 AS ok_word_len,
      |       symbol_ratio < 0.1 AS ok_symbols,
      |       bullet_ratio < 0.9 AS ok_bullets,
      |       ellipsis_ratio < 0.3 AS ok_ellipsis,
      |       alpha_frac >= 0.8 AS ok_alpha,
      |       stop_hits >= 2 AS ok_stops,
      |       (n_words BETWEEN 50 AND 100000) AND (mean_word_len BETWEEN 3.0 AND 10.0)
      |         AND symbol_ratio < 0.1 AND bullet_ratio < 0.9 AND ellipsis_ratio < 0.3
      |         AND alpha_frac >= 0.8 AND stop_hits >= 2 AS keep
      |FROM m ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.gopherRuleReport(t(s, dir, "documents")).orderBy("doc_id")
  }

  // Deterministic global training-order shuffle: sort-by-md5(seed:id),
  // shard by the first hex digit, in-shard rank = epoch position. Pure
  // hash arithmetic — reproducible across engines and partition layouts.
  register(
    "t18_training_shuffle",
    """WITH h AS (
      |  SELECT doc_id, md5('ep1:' || CAST(doc_id AS VARCHAR)) AS hh FROM documents)
      |SELECT doc_id,
      |       ('0x' || substr(hh, 1, 1))::BIGINT AS shard,
      |       CAST(row_number() OVER (PARTITION BY substr(hh, 1, 1)
      |         ORDER BY hh, doc_id) AS BIGINT) AS pos
      |FROM h ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.trainingShuffle(t(s, dir, "documents"), seed = "ep1")
      .orderBy("doc_id")
  }

  // Corpus mixing toward target source weights: per-source keep rates
  // derived from counts (K = min n_s/w_s; rate_s = w_s*K/n_s), applied by
  // the deterministic md5 threshold. Four sources weighted 4/2/1/1, the
  // rest dropped — the binding source (largest n/w deficit) keeps all.
  register(
    "t19_target_mix",
    """WITH w AS (SELECT * FROM (VALUES ('src0', 4.0), ('src1', 2.0),
      |                                 ('src2', 1.0), ('src3', 1.0)) AS w(source, wt)),
      |c AS (SELECT source, count(*)::DOUBLE AS n FROM documents GROUP BY source),
      |j AS (SELECT c.source, n, wt, n / wt AS k FROM c JOIN w USING (source)),
      |r AS (SELECT source, least(1.0, wt * (SELECT min(k) FROM j) / n) AS rate FROM j)
      |SELECT d.doc_id, d.source, round(r.rate, 6) AS rate
      |FROM documents d JOIN r USING (source)
      |WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) <
      |      CASE WHEN r.rate >= 1.0 THEN 'zzzzzzzz'
      |           ELSE lower(lpad(hex(CAST(floor(r.rate * 4294967296.0) AS BIGINT)), 8, '0')) END
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.targetMixSample(t(s, dir, "documents"),
      Map("src0" -> 4.0, "src1" -> 2.0, "src2" -> 1.0, "src3" -> 1.0))
      .orderBy("doc_id")
  }

  // Corpus-level boilerplate: fraction of a doc's distinct trigrams whose
  // corpus document-frequency exceeds 2 (the cross-document complement of
  // t9's intra-doc repetition signal).
  register(
    "t20_boilerplate_ngrams",
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS t
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, CASE WHEN len(t) >= 3
      |    THEN list_distinct(list_transform(range(1, len(t) - 1),
      |           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
      |    ELSE [array_to_string(t, ' ')] END AS s
      |  FROM toks),
      |g AS (SELECT doc_id, unnest(s) AS gram FROM sh),
      |df AS (SELECT gram, count(*) AS df FROM g GROUP BY gram),
      |per AS (
      |  SELECT g.doc_id, count(*) AS n_grams,
      |         sum(CASE WHEN df.df > 2 THEN 1 ELSE 0 END) AS n_common
      |  FROM g JOIN df USING (gram) GROUP BY g.doc_id)
      |SELECT doc_id, n_grams::BIGINT AS n_grams, n_common::BIGINT AS n_common,
      |       round(n_common::DOUBLE / n_grams, 6) AS common_frac,
      |       round(n_common::DOUBLE / n_grams, 6) > 0.5 AS boilerplate
      |FROM per ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.boilerplateNgrams(t(s, dir, "documents"), "text", "doc_id",
      n = 3, dfCutoff = 2, frac = 0.5)
      .orderBy("doc_id")
  }

  // BPE first-merge candidates: corpus-weighted adjacent-char-pair counts,
  // exploded from the VOCABULARY (one corpus-cardinality word-count agg),
  // top-50 with (count desc, pair asc) tie-break.
  register(
    "t21_bpe_pairs",
    """WITH words AS (
      |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                            x -> x != '')) AS word
      |  FROM documents),
      |wc AS (SELECT word, count(*) AS wc FROM words GROUP BY word),
      |pairs AS (
      |  SELECT wc, unnest(list_transform(range(1, len(word)),
      |           i -> substr(word, CAST(i AS INT), 2))) AS pair
      |  FROM wc WHERE len(word) >= 2),
      |pc AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS n FROM pairs GROUP BY pair),
      |r AS (SELECT pair, n,
      |             row_number() OVER (ORDER BY n DESC, pair) AS rank FROM pc)
      |SELECT CAST(rank AS BIGINT) AS rank, pair, n
      |FROM r WHERE rank <= 50 ORDER BY rank""".stripMargin) { (s, dir) =>
    TextAnalysis.bpePairCounts(t(s, dir, "documents"), "text", k = 50)
      .orderBy("rank")
  }

  // Full BPE merge-rule learning (the tokenizer-induction loop): 8
  // rounds of pair-count → argmax → greedy merge over the word-count
  // vocabulary — here via the driver-local incremental loop (the vocab
  // is far under driverVocabLimit; the distributed fallback is
  // byte-identical, BpeSpec pins the equality). No SQL oracle — the
  // merge table depends on the loop, which t44b proves end-to-end on a
  // planted corpus with an ANALYTIC merge sequence (the d2c
  // planted-twin pattern); BpeSpec pins the classic low/lower/newest
  // hand example and the greedy-fold semantics ('aaaa' -> 'aa aa',
  // never 'aaa a').
  registerNoOracle("t44_bpe_learn") { (s, dir) =>
    TextAnalysis.bpeLearn(t(s, dir, "documents"), "text", merges = 8)
      .orderBy("rank")
  }

  // BPE planted twin: every document collapses to one of three words
  // (abab/abc/bc by doc_id % 3), so the merge sequence is analytic:
  // round 1 is always ('a','b') with count 2*n0+n1 (it dominates (b,a)=n0
  // and (b,c)=n1+n2 whenever 2*n0 > n2 — any near-balanced id split),
  // and round 2's candidates are exactly ('ab','ab')=n0, ('ab','c')=n1,
  // ('b','c')=n2, which the oracle argmaxes under the operator's own
  // (count desc, lhs, rhs) tie-break.
  register(
    "t44b_bpe_learn_planted",
    """WITH n AS (
      |  SELECT count(*) FILTER (WHERE doc_id % 3 = 0) AS n0,
      |         count(*) FILTER (WHERE doc_id % 3 = 1) AS n1,
      |         count(*) FILTER (WHERE doc_id % 3 = 2) AS n2
      |  FROM documents),
      |cand AS (
      |  SELECT 'ab' AS lhs, 'ab' AS rhs, n0 AS n FROM n
      |  UNION ALL SELECT 'ab', 'c', n1 FROM n
      |  UNION ALL SELECT 'b', 'c', n2 FROM n),
      |w2 AS (SELECT lhs, rhs, CAST(n AS BIGINT) AS n,
      |              row_number() OVER (ORDER BY n DESC, lhs, rhs) AS rn
      |       FROM cand)
      |SELECT CAST(1 AS BIGINT) AS rank, 'a' AS lhs, 'b' AS rhs,
      |       CAST(2*n0+n1 AS BIGINT) AS n FROM n
      |UNION ALL
      |SELECT CAST(2 AS BIGINT), lhs, rhs, n FROM w2 WHERE rn = 1
      |ORDER BY rank""".stripMargin) { (s, dir) =>
    val planted = t(s, dir, "documents").select(
      when(col("doc_id") % 3 === 0, "abab")
        .when(col("doc_id") % 3 === 1, "abc")
        .otherwise("bc").as("text"))
    TextAnalysis.bpeLearn(planted, "text", merges = 2).orderBy("rank")
  }

  // Vocabulary coverage curve: fraction of corpus token occurrences the
  // top-N words cover, for tokenizer vocab sizing — distributed top-k
  // cut, windows only over the bounded survivors, one-row total
  // broadcast. Exact integer token mass -> hash oracle.
  register(
    "t46_vocab_coverage",
    """WITH toks AS (
      |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                            x -> x != '')) AS tok
      |  FROM documents),
      |c AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total_tokens FROM c),
      |r AS (SELECT tok, n, row_number() OVER (ORDER BY n DESC, tok ASC) AS rnk
      |      FROM c),
      |cum AS (SELECT rnk, CAST(sum(n) OVER (ORDER BY rnk) AS BIGINT) AS cum
      |        FROM r WHERE rnk <= 1000),
      |sizes AS (SELECT unnest([10, 100, 1000]) AS n_vocab)
      |SELECT CAST(n_vocab AS BIGINT) AS n_vocab,
      |       CAST(max(cum) AS BIGINT) AS covered_tokens,
      |       CAST(tot.total_tokens AS BIGINT) AS total_tokens,
      |       round(CAST(max(cum) AS DOUBLE) / tot.total_tokens, 6) AS coverage
      |FROM sizes JOIN cum ON cum.rnk <= sizes.n_vocab CROSS JOIN tot
      |GROUP BY n_vocab, tot.total_tokens
      |ORDER BY n_vocab""".stripMargin) { (s, dir) =>
    TextAnalysis.vocabCoverage(t(s, dir, "documents"), "text",
      sizes = Seq(10, 100, 1000))
      .orderBy("n_vocab")
  }

  // Dialogue-format validation (instruction-data QA): events per user
  // read as a conversation, event types mapped to roles; a transcript is
  // training-grade only if roles strictly alternate, the user opens and
  // the assistant closes. On this synthetic stream most conversations
  // honestly FAIL (random role sequences repeat) — the gate's job is
  // exactly that filtering. One conversation-key exchange serves all
  // three windows; exact integers + total turn order -> hash oracle.
  register(
    "t53_dialogue_validate",
    """WITH r AS (
      |  SELECT user_id AS conv_id,
      |         CASE WHEN event_type IN ('purchase', 'signup') THEN 'user'
      |              ELSE 'assistant' END AS role,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY epoch_us(ts), event_id) AS rn,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY epoch_us(ts) DESC, event_id DESC)
      |           AS rnd,
      |         lag(CASE WHEN event_type IN ('purchase', 'signup') THEN 'user'
      |                  ELSE 'assistant' END)
      |           OVER (PARTITION BY user_id
      |                 ORDER BY epoch_us(ts), event_id) AS prev
      |  FROM events)
      |SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
      |       CAST(sum(CASE WHEN prev = role THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_repeats,
      |       max(CASE WHEN rn = 1 THEN role END) = 'user' AS starts_user,
      |       max(CASE WHEN rnd = 1 THEN role END) = 'assistant'
      |         AS ends_assistant,
      |       (sum(CASE WHEN prev = role THEN 1 ELSE 0 END) = 0
      |        AND max(CASE WHEN rn = 1 THEN role END) = 'user'
      |        AND max(CASE WHEN rnd = 1 THEN role END) = 'assistant') AS valid
      |FROM r GROUP BY conv_id ORDER BY conv_id""".stripMargin) { (s, dir) =>
    graft.operators.Behavior.validateDialogues(t(s, dir, "events"),
        "user_id", "ts",
        when(col("event_type").isin("purchase", "signup"), "user")
          .otherwise("assistant"),
        "event_id")
      .orderBy("conv_id")
  }

  // Preference-pair format audit (RLHF data QA): chosen/rejected pairs
  // built from doc pairs, with adversarial branches — every 17th pair
  // identical (vacuous label), every 23rd an empty chosen side. The
  // audit is a pure scan-side projection (no shuffle); token counts are
  // the t1 whitespace definition, the length ratio micro-floors before
  // the 6 dp emit. Hash oracle over the full audit row.
  register(
    "t54_preference_audit",
    """WITH pairs AS (
      |  SELECT a.doc_id AS pair_id,
      |         CASE WHEN a.doc_id % 17 = 0 THEN b.text
      |              WHEN a.doc_id % 23 = 0 THEN '' ELSE a.text END AS chosen,
      |         b.text AS rejected
      |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 25),
      |tok AS (
      |  SELECT pair_id, chosen, rejected,
      |         len(list_filter(string_split_regex(chosen, '\s+'),
      |             x -> x != '')) AS ct,
      |         len(list_filter(string_split_regex(rejected, '\s+'),
      |             x -> x != '')) AS rt
      |  FROM pairs)
      |SELECT pair_id,
      |       CAST(ct AS BIGINT) AS chosen_toks,
      |       CAST(rt AS BIGINT) AS rejected_toks,
      |       chosen = rejected AS identical,
      |       (trim(chosen) = '' OR trim(rejected) = '') AS empty_side,
      |       ct > rt AS chosen_longer,
      |       CASE WHEN rt > 0
      |            THEN floor(ct * 1000000.0 / rt + 0.5) / 1000000.0
      |       END AS len_ratio,
      |       (NOT chosen = rejected
      |        AND NOT (trim(chosen) = '' OR trim(rejected) = '')) AS valid
      |FROM tok ORDER BY pair_id""".stripMargin) { (s, dir) =>
    val d = t(s, dir, "documents").select(col("doc_id"), col("text"))
    val pairs = d.as("a").join(d.as("b"),
        col("b.doc_id") === col("a.doc_id") + 25)
      .select(col("a.doc_id").as("pair_id"),
        when(col("a.doc_id") % 17 === 0, col("b.text"))
          .when(col("a.doc_id") % 23 === 0, lit(""))
          .otherwise(col("a.text")).as("chosen"),
        col("b.text").as("rejected"))
    Preference.pairAudit(pairs, "pair_id", "chosen", "rejected")
      .orderBy("pair_id")
  }

  // Fleiss' kappa (inter-rater agreement): three synthetic raters label
  // each doc's language, each rater disagreeing on a deterministic 2/5
  // of (doc, rater) slots (defaulting to 'en') — the labeling-batch
  // acceptance gate. Every fraction micro-floors BEFORE any cross-row
  // sum, so the single output row hash-matches exactly.
  register(
    "t55_fleiss_kappa",
    """WITH ratings AS (
      |  SELECT doc_id AS item,
      |         CASE WHEN (doc_id * 3 + r) % 5 < 3 THEN lang
      |              ELSE 'en' END AS label
      |  FROM documents, (SELECT unnest([0, 1, 2]) AS r)),
      |counts AS (
      |  SELECT item, label, count(*) AS c FROM ratings GROUP BY 1, 2),
      |per_item AS (
      |  SELECT item, CAST(sum(c) AS BIGINT) AS n,
      |         CAST(sum(c * c) AS BIGINT) AS s2
      |  FROM counts GROUP BY 1 HAVING sum(c) >= 2),
      |items_agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_items,
      |         CAST(sum(n) AS BIGINT) AS n_ratings,
      |         CAST(sum(CAST(floor(CAST(s2 - n AS DOUBLE) * 1000000.0 /
      |           (n * (n - 1)) + 0.5) AS BIGINT)) AS BIGINT) AS po_sum
      |  FROM per_item),
      |cat AS (
      |  SELECT label, CAST(sum(c) AS BIGINT) AS tc FROM counts
      |  WHERE item IN (SELECT item FROM per_item) GROUP BY 1),
      |cat_agg AS (
      |  SELECT CAST(sum(CAST(floor((CAST(tc AS DOUBLE) / t.n_ratings) *
      |           (CAST(tc AS DOUBLE) / t.n_ratings) * 1000000.0 + 0.5)
      |           AS BIGINT)) AS BIGINT) AS pe_sum
      |  FROM cat, items_agg t)
      |SELECT n_items, n_ratings,
      |       CAST(floor(CAST(po_sum AS DOUBLE) / n_items + 0.5) AS BIGINT)
      |         / 1000000.0 AS po,
      |       pe_sum / 1000000.0 AS pe,
      |       CASE WHEN pe_sum < 1000000 THEN
      |         floor(CAST(CAST(floor(CAST(po_sum AS DOUBLE) / n_items + 0.5)
      |           AS BIGINT) - pe_sum AS DOUBLE) * 1000000.0 /
      |           (1000000 - pe_sum) + 0.5) / 1000000.0
      |       END AS kappa
      |FROM items_agg, cat_agg""".stripMargin) { (s, dir) =>
    val ratings = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(0), lit(2))).as("r"))
      .select(col("doc_id"),
        when((col("doc_id") * 3 + col("r")) % 5 < 3, col("lang"))
          .otherwise(lit("en")).as("label"))
    Preference.fleissKappa(ratings, "doc_id", "label")
  }

  // Unbiased pass@k (HumanEval estimator) over synthetic per-sample
  // outcomes: ~n/200 samples per problem, 30% pass rate. The
  // combinatorial C(n-c,k)/C(n,k) runs as the SAME left-to-right k-term
  // product fold in both engines (each term a rational of exact
  // integers), so the trajectory is engine-exact; n<k problems null,
  // n-c<k problems score exactly 1 — hash oracle.
  register(
    "t66_pass_at_k",
    """WITH s AS (
      |  SELECT doc_id % 200 AS problem_id,
      |         CASE WHEN (doc_id * 7) % 10 < 3 THEN 1 ELSE 0 END AS p
      |  FROM documents),
      |g AS (
      |  SELECT problem_id, CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(p) AS BIGINT) AS c
      |  FROM s GROUP BY 1)
      |SELECT problem_id, n, c,
      |  CASE WHEN n < 1 THEN NULL WHEN n - c < 1 THEN 1.0
      |       ELSE round(1.0 - list_reduce(list_transform(
      |         generate_series(0, 0),
      |         i -> CAST(n - c - i AS DOUBLE) / (n - i)),
      |         (a, b) -> a * b), 6) END AS pass_at_1,
      |  CASE WHEN n < 3 THEN NULL WHEN n - c < 3 THEN 1.0
      |       ELSE round(1.0 - list_reduce(list_transform(
      |         generate_series(0, 2),
      |         i -> CAST(n - c - i AS DOUBLE) / (n - i)),
      |         (a, b) -> a * b), 6) END AS pass_at_3
      |FROM g ORDER BY problem_id""".stripMargin) { (s, dir) =>
    val samples = t(s, dir, "documents").select(
      (col("doc_id") % 200).as("problem_id"),
      when((col("doc_id") * 7) % 10 < 3, 1).otherwise(0).as("p"))
    Eval.passAtK(samples, "problem_id", "p", ks = Seq(1, 3))
      .orderBy("problem_id")
  }

  // Per-class precision/recall/F1 + macro row for the t3/t42 language-ID
  // classifier against gold labels — the confusion-matrix report that
  // accuracy (t42) flattens away. One pre-combined (truth, pred) count;
  // per-class ratios micro-floor; the macro row averages truth-present
  // classes with an explicit Σ/n (avg()'s accumulation is
  // engine-specific). Hash oracle over class rows + macro.
  register(
    "t67_classification_report",
    """WITH toks AS (
      |  SELECT doc_id, lang, list_distinct(list_filter(
      |    string_split_regex(lower(text), '\s+'), x -> x != '')) AS tk
      |  FROM documents),
      |pred AS (
      |  SELECT lang AS t, CASE
      |    WHEN len(list_intersect(tk, ['the','a','and','scan','join'])) >=
      |         len(list_intersect(tk, ['el','la','que','datos']))
      |     AND len(list_intersect(tk, ['the','a','and','scan','join'])) >=
      |         len(list_intersect(tk, ['der','die','und','das'])) THEN 'en'
      |    WHEN len(list_intersect(tk, ['el','la','que','datos'])) >=
      |         len(list_intersect(tk, ['der','die','und','das'])) THEN 'es'
      |    ELSE 'de' END AS p
      |  FROM toks),
      |cells AS (SELECT t, p, CAST(count(*) AS BIGINT) AS n
      |          FROM pred GROUP BY 1, 2),
      |truth AS (SELECT t AS label, CAST(sum(n) AS BIGINT) AS n_true
      |          FROM cells GROUP BY 1),
      |pr AS (SELECT p AS label, CAST(sum(n) AS BIGINT) AS n_pred
      |       FROM cells GROUP BY 1),
      |tp AS (SELECT t AS label, n AS tp FROM cells WHERE t = p),
      |pc AS (
      |  SELECT coalesce(truth.label, pr.label) AS label,
      |         coalesce(n_true, 0) AS n_true, coalesce(n_pred, 0) AS n_pred,
      |         coalesce(tp.tp, 0) AS tp
      |  FROM truth FULL JOIN pr ON pr.label = truth.label
      |             LEFT JOIN tp ON tp.label = coalesce(truth.label, pr.label)),
      |m AS (
      |  SELECT label, n_true, n_pred, tp,
      |    CASE WHEN n_pred > 0 THEN CAST(floor(CAST(tp AS DOUBLE) *
      |      1000000.0 / n_pred + 0.5) AS BIGINT) END AS pm,
      |    CASE WHEN n_true > 0 THEN CAST(floor(CAST(tp AS DOUBLE) *
      |      1000000.0 / n_true + 0.5) AS BIGINT) END AS rm
      |  FROM pc),
      |m2 AS (
      |  SELECT label, n_true, n_pred, tp, pm, rm,
      |    CASE WHEN pm IS NOT NULL AND rm IS NOT NULL THEN
      |      CASE WHEN pm + rm > 0 THEN CAST(floor(CAST(pm * rm * 2 AS
      |        DOUBLE) / (pm + rm) + 0.5) AS BIGINT) ELSE 0 END END AS fm
      |  FROM m),
      |mac AS (
      |  SELECT '__macro__' AS label,
      |    CAST(sum(n_true) AS BIGINT) AS n_true,
      |    CAST(sum(n_pred) AS BIGINT) AS n_pred,
      |    CAST(sum(tp) AS BIGINT) AS tp,
      |    CAST(floor(CAST(sum(coalesce(pm, 0)) AS DOUBLE) / count(*) + 0.5)
      |      AS BIGINT) AS pm,
      |    CAST(floor(CAST(sum(coalesce(rm, 0)) AS DOUBLE) / count(*) + 0.5)
      |      AS BIGINT) AS rm,
      |    CAST(floor(CAST(sum(coalesce(fm, 0)) AS DOUBLE) / count(*) + 0.5)
      |      AS BIGINT) AS fm
      |  FROM m2 WHERE n_true > 0)
      |SELECT label, n_true, n_pred, tp, pm / 1000000.0 AS precision,
      |       rm / 1000000.0 AS recall, fm / 1000000.0 AS f1
      |FROM (SELECT * FROM m2 UNION ALL SELECT * FROM mac)
      |ORDER BY label""".stripMargin) { (s, dir) =>
    val scored = t(s, dir, "documents").select(col("lang").as("truth"),
      TextAnalysis.langId(col("text"), Seq(
        "en" -> Seq("the", "a", "and", "scan", "join"),
        "es" -> Seq("el", "la", "que", "datos"),
        "de" -> Seq("der", "die", "und", "das"))).as("pred"))
    Eval.classificationReport(scored, "truth", "pred").orderBy("label")
  }

  // chrF2 over character-corrupted candidates: every 3rd doc's candidate
  // has e->3 substitutions (the tokenization-free metric still scores
  // partial char overlap where word-gram BLEU collapses), every 31st is
  // empty. Whitespace-stripped char grams of orders 1-6 ride one
  // side-tagged explode; all six orders' P/R micro-floor before the
  // 5PR/(4P+R) harmonic — hash oracle.
  register(
    "t65_chrf",
    """WITH w AS (
      |  SELECT doc_id AS pair_id, substring(text, 1, 120) AS ref0
      |  FROM documents),
      |p AS (
      |  SELECT pair_id,
      |         CASE WHEN pair_id % 31 = 0 THEN ''
      |              WHEN pair_id % 3 = 0 THEN replace(ref0, 'e', '3')
      |              ELSE ref0 END AS cand0, ref0
      |  FROM w),
      |s AS (
      |  SELECT pair_id,
      |         regexp_replace(lower(cand0), '\s+', '', 'g') AS cs,
      |         regexp_replace(lower(ref0), '\s+', '', 'g') AS rs
      |  FROM p),
      |n6 AS (SELECT unnest([1, 2, 3, 4, 5, 6]) AS n),
      |cg AS (
      |  SELECT pair_id, n, g, count(*) AS cc FROM (
      |    SELECT pair_id, n, unnest(list_transform(
      |      generate_series(1, greatest(length(cs) - n + 1, 0)),
      |      i -> substring(cs, i, n))) AS g FROM s, n6) GROUP BY 1, 2, 3),
      |rg AS (
      |  SELECT pair_id, n, g, count(*) AS rc FROM (
      |    SELECT pair_id, n, unnest(list_transform(
      |      generate_series(1, greatest(length(rs) - n + 1, 0)),
      |      i -> substring(rs, i, n))) AS g FROM s, n6) GROUP BY 1, 2, 3),
      |m AS (
      |  SELECT c.pair_id, c.n, CAST(sum(least(c.cc, r.rc)) AS BIGINT) AS mg
      |  FROM cg c JOIN rg r ON r.pair_id = c.pair_id AND r.n = c.n
      |                     AND r.g = c.g
      |  GROUP BY 1, 2),
      |tot AS (
      |  SELECT pair_id, n,
      |         CAST(greatest(length(cs) - n + 1, 0) AS BIGINT) AS cn,
      |         CAST(greatest(length(rs) - n + 1, 0) AS BIGINT) AS rn
      |  FROM s, n6),
      |pn AS (
      |  SELECT t.pair_id, t.n,
      |    CASE WHEN t.cn > 0 THEN CAST(floor(CAST(coalesce(m.mg, 0) AS
      |      DOUBLE) * 1000000.0 / t.cn + 0.5) AS BIGINT) ELSE 0 END AS pm,
      |    CASE WHEN t.rn > 0 THEN CAST(floor(CAST(coalesce(m.mg, 0) AS
      |      DOUBLE) * 1000000.0 / t.rn + 0.5) AS BIGINT) ELSE 0 END AS rm
      |  FROM tot t LEFT JOIN m ON m.pair_id = t.pair_id AND m.n = t.n),
      |pp AS (
      |  SELECT pair_id,
      |         CAST(floor(CAST(sum(pm) AS DOUBLE) / 6 + 0.5) AS BIGINT)
      |           AS pmm,
      |         CAST(floor(CAST(sum(rm) AS DOUBLE) / 6 + 0.5) AS BIGINT)
      |           AS rmm
      |  FROM pn GROUP BY 1)
      |SELECT s.pair_id, CAST(length(cs) AS BIGINT) AS cand_chars,
      |       CAST(length(rs) AS BIGINT) AS ref_chars,
      |       pmm / 1000000.0 AS chr_p, rmm / 1000000.0 AS chr_r,
      |       CASE WHEN pmm * 4 + rmm > 0 THEN
      |         floor(CAST(pmm * rmm * 5 AS DOUBLE) / (pmm * 4 + rmm) + 0.5)
      |           / 1000000.0
      |       ELSE 0.0 END AS chrf2
      |FROM s JOIN pp ON pp.pair_id = s.pair_id
      |ORDER BY s.pair_id""".stripMargin) { (s, dir) =>
    val ref0 = substring(col("text"), 1, 120)
    val p = t(s, dir, "documents")
      .select(col("doc_id").as("pair_id"), ref0.as("ref0"))
      .select(col("pair_id"),
        when(col("pair_id") % 31 === 0, lit(""))
          .when(col("pair_id") % 3 === 0,
            regexp_replace(col("ref0"), "e", "3"))
          .otherwise(col("ref0")).as("cand"),
        col("ref0").as("ref"))
    Eval.chrF(p, "pair_id", "cand", "ref").orderBy("pair_id")
  }

  // Exact tie-aware ROC-AUC over the SAME synthetic overconfident
  // classifier as t60 — calibration (t60) and discrimination (this row)
  // are the two halves of a corpus-filter QA report. The Mann–Whitney
  // midrank algebra runs entirely on integers (2·rank sums), so the
  // one-row result hash-matches exactly.
  register(
    "t64_roc_auc",
    """WITH sc AS (
      |  SELECT CAST((doc_id * 37) % 101 AS DOUBLE) / 100.0 AS conf,
      |         CASE WHEN (doc_id * 53) % 100 <
      |                   ((doc_id * 37) % 101) * 0.8
      |              THEN 1 ELSE 0 END AS y
      |  FROM documents),
      |m AS (SELECT CAST(floor(conf * 1000000.0 + 0.5) AS BIGINT) AS s, y
      |      FROM sc),
      |g AS (SELECT s, CAST(count(*) AS BIGINT) AS tied,
      |             CAST(sum(y) AS BIGINT) AS tied_pos
      |      FROM m GROUP BY 1),
      |w AS (SELECT s, tied, tied_pos,
      |             CAST(coalesce(sum(tied) OVER (ORDER BY s ROWS BETWEEN
      |               UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |               AS below
      |      FROM g),
      |a AS (SELECT CAST(sum(tied_pos) AS BIGINT) AS n_pos,
      |             CAST(sum(tied - tied_pos) AS BIGINT) AS n_neg,
      |             CAST(sum(tied_pos * (below * 2 + tied + 1)) AS BIGINT)
      |               AS r2
      |      FROM w)
      |SELECT n_pos, n_neg,
      |       CASE WHEN n_pos > 0 AND n_neg > 0 THEN
      |         floor(CAST(r2 - n_pos * (n_pos + 1) AS DOUBLE) * 1000000.0
      |           / (n_pos * n_neg * 2) + 0.5) / 1000000.0 END AS auc
      |FROM a""".stripMargin) { (s, dir) =>
    val scored = t(s, dir, "documents").select(
      (((col("doc_id") * 37) % 101).cast("double") / 100.0).as("conf"),
      when((col("doc_id") * 53) % 100 <
        ((col("doc_id") * 37) % 101) * 0.8, 1).otherwise(0).as("y"))
    Eval.rocAuc(scored, "conf", "y")
  }

  // Wilson-interval win rates per language matchup — the arena-style
  // reporting table beside t56's Bradley–Terry strengths, on the SAME
  // match construction. The Wilson algebra is one fixed-shape double
  // expression over exact (wins, n) integers, spelled IDENTICALLY here
  // and in the oracle (z² always written 1.96*1.96 — a 3.8416 literal
  // would parse to different bits), rounded at 6 dp.
  register(
    "t63_win_rate_wilson",
    """WITH m AS (
      |  SELECT a.lang AS a, b.lang AS b,
      |         CASE WHEN a.n_chars >= b.n_chars THEN a.lang
      |              ELSE b.lang END AS winner
      |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      |  WHERE a.lang <> b.lang),
      |pc AS (
      |  SELECT least(a, b) AS item_i, greatest(a, b) AS item_j,
      |         CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(CASE WHEN winner = least(a, b) THEN 1 ELSE 0 END)
      |           AS BIGINT) AS wins
      |  FROM m GROUP BY 1, 2)
      |SELECT item_i, item_j, n, wins,
      |       floor(CAST(wins AS DOUBLE) * 1000000.0 / n + 0.5) / 1000000.0
      |         AS win_rate,
      |       round((CAST(wins AS DOUBLE) / n + (1.96*1.96) / (n * 2) -
      |         1.96 * sqrt((CAST(wins AS DOUBLE) / n *
      |           (1.0 - CAST(wins AS DOUBLE) / n) + (1.96*1.96) / (n * 4))
      |           / n)) / (1.0 + (1.96*1.96) / n), 6) AS wilson_lo,
      |       round((CAST(wins AS DOUBLE) / n + (1.96*1.96) / (n * 2) +
      |         1.96 * sqrt((CAST(wins AS DOUBLE) / n *
      |           (1.0 - CAST(wins AS DOUBLE) / n) + (1.96*1.96) / (n * 4))
      |           / n)) / (1.0 + (1.96*1.96) / n), 6) AS wilson_hi
      |FROM pc ORDER BY item_i, item_j""".stripMargin) { (s, dir) =>
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val m = d.as("a").join(d.as("b"),
        col("b.doc_id") === col("a.doc_id") + 1)
      .where(col("a.lang") =!= col("b.lang"))
      .select(col("a.lang").as("a"), col("b.lang").as("b"),
        when(col("a.n_chars") >= col("b.n_chars"), col("a.lang"))
          .otherwise(col("b.lang")).as("winner"))
    Preference.winRateIntervals(m, "a", "b", "winner")
      .orderBy("item_i", "item_j")
  }

  // Krippendorff's alpha with MISSING rating slots — the regime Fleiss'
  // kappa (t55) can't handle: every (doc, rater) slot where
  // (doc_id + r) % 7 = 0 is absent, so units carry 2 or 3 pairable
  // ratings and sub-2 units drop. Per-unit disagreement terms
  // micro-floor before the one cross-row sum; hash oracle on the
  // single (n_items, n_ratings, d_obs, d_exp, alpha) row.
  register(
    "t62_krippendorff_alpha",
    """WITH ratings AS (
      |  SELECT doc_id AS item,
      |         CASE WHEN (doc_id * 3 + r) % 5 < 3 THEN lang
      |              ELSE 'en' END AS label
      |  FROM documents, (SELECT unnest([0, 1, 2]) AS r)
      |  WHERE (doc_id + r) % 7 != 0),
      |counts AS (
      |  SELECT item, label, count(*) AS c FROM ratings GROUP BY 1, 2),
      |per_item AS (
      |  SELECT item, CAST(sum(c) AS BIGINT) AS n
      |  FROM counts GROUP BY 1 HAVING sum(c) >= 2),
      |withn AS (
      |  SELECT c.item, c.label, c.c, p.n
      |  FROM counts c JOIN per_item p ON p.item = c.item),
      |items_agg AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n_items,
      |         CAST(sum(n) AS BIGINT) AS n_ratings FROM per_item),
      |do_agg AS (
      |  SELECT CAST(sum(CAST(floor(CAST(c * (n - c) AS DOUBLE) * 1000000.0
      |    / (n - 1) + 0.5) AS BIGINT)) AS BIGINT) AS do_sum FROM withn),
      |cat AS (
      |  SELECT label, CAST(sum(c) AS BIGINT) AS nc FROM withn GROUP BY 1),
      |de_agg AS (
      |  SELECT CAST(sum(nc * (t.n_ratings - nc)) AS BIGINT) AS de_sum
      |  FROM cat, items_agg t),
      |micro AS (
      |  SELECT n_items, n_ratings,
      |         CAST(floor(CAST(do_sum AS DOUBLE) / n_ratings + 0.5)
      |           AS BIGINT) AS dom,
      |         CAST(floor(CAST(de_sum AS DOUBLE) * 1000000.0 /
      |           (n_ratings * (n_ratings - 1)) + 0.5) AS BIGINT) AS dem
      |  FROM items_agg, do_agg, de_agg)
      |SELECT n_items, n_ratings,
      |       dom / 1000000.0 AS d_obs, dem / 1000000.0 AS d_exp,
      |       CASE WHEN dem > 0 THEN floor(CAST(dem - dom AS DOUBLE) *
      |         1000000.0 / dem + 0.5) / 1000000.0 END AS alpha
      |FROM micro""".stripMargin) { (s, dir) =>
    val ratings = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(0), lit(2))).as("r"))
      .where((col("doc_id") + col("r")) % 7 =!= 0)
      .select(col("doc_id"),
        when((col("doc_id") * 3 + col("r")) % 5 < 3, col("lang"))
          .otherwise(lit("en")).as("label"))
    Preference.krippendorffAlpha(ratings, "doc_id", "label")
  }

  // Grouped-jackknife confidence interval on the corpus mean quality
  // score — the deterministic error bar (no RNG, so it fits the
  // exactness contract where bootstrap cannot): 20 doc_id-modulo
  // buckets, leave-one-out means, Efron-Stein variance. One corpus
  // scan collapses to 20 (count, sum) rows; all else is B-row integer
  // math with one IEEE-exact sqrt — hash oracle on the single row.
  register(
    "t70_jackknife_ci",
    """WITH q AS (
      |  SELECT doc_id % 20 AS b,
      |    CAST(floor(round(
      |      greatest(0.0,
      |        least(length(text) / 500.0, 1.0) * 0.4 +
      |        least((len(list_filter(string_split_regex(lower(text), '\s+'),
      |                x -> x IN ('the','a','of','and','to','in'))) ::DOUBLE /
      |               greatest(len(list_filter(string_split_regex(lower(text),
      |                '\s+'), x -> x != '')), 1)) * 3.0, 1.0) * 0.4 +
      |        (1.0 - least(len(regexp_extract_all(text, '[^\w\s]'))::DOUBLE /
      |                     greatest(length(text), 1) * 5.0, 1.0)) * 0.2), 6)
      |      * 1000000.0 + 0.5) AS BIGINT) AS v
      |  FROM documents),
      |pb AS (SELECT b, CAST(count(*) AS BIGINT) AS bn,
      |              CAST(sum(v) AS BIGINT) AS bs FROM q GROUP BY 1),
      |tot AS (SELECT CAST(sum(bn) AS BIGINT) AS n,
      |               CAST(sum(bs) AS BIGINT) AS s,
      |               CAST(count(*) AS BIGINT) AS nb FROM pb),
      |loo AS (
      |  SELECT t.n, t.s, t.nb,
      |         CASE WHEN t.n > pb.bn THEN CAST(floor(CAST(t.s - pb.bs AS
      |           DOUBLE) / (t.n - pb.bn) + 0.5) AS BIGINT) END AS theta
      |  FROM pb, tot t),
      |tm AS (SELECT CAST(floor(CAST(sum(theta) AS DOUBLE) / count(theta)
      |         + 0.5) AS BIGINT) AS tm FROM loo),
      |ssx AS (SELECT max(l.n) AS n, max(l.s) AS s, max(l.nb) AS nb,
      |               CAST(sum((l.theta - t.tm) * (l.theta - t.tm))
      |                 AS BIGINT) AS ss
      |        FROM loo l, tm t),
      |fin AS (SELECT n, nb,
      |          CAST(floor(CAST(s AS DOUBLE) / n + 0.5) AS BIGINT) AS meanm,
      |          CASE WHEN nb > 1 AND ss IS NOT NULL THEN
      |            CAST(floor(sqrt(CAST(nb - 1 AS DOUBLE) * ss / nb) + 0.5)
      |              AS BIGINT) END AS sem
      |        FROM ssx)
      |SELECT n, nb AS n_buckets, meanm / 1000000.0 AS mean,
      |       sem / 1000000.0 AS se,
      |       (meanm - CAST(floor(CAST(sem AS DOUBLE) * 1.96 + 0.5)
      |         AS BIGINT)) / 1000000.0 AS lo,
      |       (meanm + CAST(floor(CAST(sem AS DOUBLE) * 1.96 + 0.5)
      |         AS BIGINT)) / 1000000.0 AS hi
      |FROM fin""".stripMargin) { (s, dir) =>
    val scored = t(s, dir, "documents").select(
      (col("doc_id") % 20).as("bucket"),
      TextAnalysis.qualityScore(col("text"),
        Seq("the", "a", "of", "and", "to", "in")).as("quality"))
    Eval.jackknifeCI(scored, "quality", "bucket")
  }

  // Compression-ratio quality signal, proven by WIDE-MARGIN planted
  // verdicts (the recall-bound oracle-constant pattern — no SQL engine
  // can deflate, but the orderings are entropy-forced): 20-char-unit
  // boilerplate deflates below 0.1, pseudorandom hex cannot deflate
  // below its ~0.5 entropy so sits above 0.4, 2000-char prose lands in
  // the (0.2, 0.9) band, and prose repeated 4x (within DEFLATE's 32 KB
  // window) compresses strictly better than prose itself.
  register(
    "t72_compression_ratio",
    """SELECT * FROM (VALUES ('boiler_low', true), ('degenerate_low', true),
      |  ('hex_high', true), ('prose_mid', true),
      |  ('rep4_beats_prose', true)) AS v(probe, pass)
      |ORDER BY probe""".stripMargin) { (s, dir) =>
    val d1 = t(s, dir, "documents").where(col("doc_id") === 1)
      .select(substring(col("text"), 1, 2000).as("prose"))
    val probes = d1.select(
      col("prose").as("prose"),
      repeat(substring(col("prose"), 1, 20), 100).as("boiler"),
      repeat(lit("a"), 2000).as("degenerate"),
      array_join(transform(sequence(lit(1), lit(32)),
        i => md5(concat(lit("entropy-probe-"), i))), "").as("hexblob"),
      repeat(col("prose"), 4).as("rep4"))
    def ratio(c: Column): Column =
      floor(graft.functions.DeflateSize.column(c).cast("double") * 1000000.0 /
        octet_length(c) + 0.5) / 1000000.0
    val r = probes.select(ratio(col("prose")).as("rp"),
      ratio(col("boiler")).as("rb"), ratio(col("degenerate")).as("rd"),
      ratio(col("hexblob")).as("rh"), ratio(col("rep4")).as("r4"))
    r.select(explode(array(
      struct(lit("boiler_low").as("probe"), (col("rb") < 0.1).as("pass")),
      struct(lit("degenerate_low").as("probe"), (col("rd") < 0.05).as("pass")),
      struct(lit("hex_high").as("probe"), (col("rh") > 0.4).as("pass")),
      struct(lit("prose_mid").as("probe"),
        (col("rp") > 0.2 && col("rp") < 0.9).as("pass")),
      struct(lit("rep4_beats_prose").as("probe"),
        (col("r4") < col("rp")).as("pass")))).as("v"))
      .select(col("v.probe").as("probe"), col("v.pass").as("pass"))
      .orderBy("probe")
  }

  // Unicode NFC normalization — EXACT cross-engine oracle (Java
  // Normalizer and DuckDB's utf8proc implement the same
  // stability-guaranteed canonical algorithm; agreement probed on every
  // branch below). The corpus is ASCII, so the un-normalized input is
  // planted deterministically in BOTH engines: combining acute after
  // every 'e' (composes to U+00E9), dot-below + acute after every 'o'
  // (composition + canonical reordering -> U+1ECD U+0301), and on the
  // %5 branch the U+212B angstrom singleton (-> U+00C5) plus the
  // NFC-inert fi ligature; %11 rows carry NULL text (nulls propagate,
  // ids survive). The hash pins the full normalized strings, so any
  // divergence in composition, reordering, or singleton mapping breaks
  // the row.
  register(
    "t73_unicode_normalize",
    """WITH d AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 11 = 0 THEN NULL
      |              ELSE replace(replace(substr(text, 1, 120),
      |                     'e', 'e' || chr(769)),
      |                     'o', 'o' || chr(803) || chr(769))
      |                   || CASE WHEN doc_id % 5 = 0
      |                           THEN ' ' || chr(8491) || chr(64257)
      |                           ELSE '' END
      |         END AS dirty
      |  FROM documents)
      |SELECT doc_id,
      |       CAST(length(dirty) AS BIGINT) AS raw_chars,
      |       CAST(length(nfc_normalize(dirty)) AS BIGINT) AS nfc_chars,
      |       nfc_normalize(dirty) != dirty AS changed,
      |       nfc_normalize(dirty) AS text_nfc
      |FROM d ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val dirty = when(col("doc_id") % 11 === 0, lit(null).cast("string"))
      .otherwise(concat(
        regexp_replace(regexp_replace(substring(col("text"), 1, 120),
          "e", "e\u0301"), "o", "o\u0323\u0301"),
        when(col("doc_id") % 5 === 0, lit(" \u212B\uFB01"))
          .otherwise(lit(""))))
    TextAnalysis.unicodeNormalize(
      t(s, dir, "documents").select(col("doc_id"), dirty.as("dirty")),
      "dirty", "doc_id").orderBy("doc_id")
  }

  // C4-style blocklist filter on the native Aho-Corasick expression.
  // The pattern set exercises the automaton's structure for real:
  // 'slo' nests inside 'slow' (fail-link output closure must emit
  // both), 'join order' crosses a token boundary (substring semantics),
  // 'zzzz' never occurs. EXACT oracle: DuckDB re-derives the matches
  // with per-pattern contains() — P probes, the very shape the
  // automaton exists to avoid, which is fine for a 5-phrase oracle.
  register(
    "t75_blocklist_filter",
    """WITH m AS (
      |  SELECT doc_id,
      |         list_sort(list_filter(['dup', 'join order', 'slo', 'slow',
      |                                'zzzz'],
      |           p -> contains(lower(text), p))) AS hits
      |  FROM documents)
      |SELECT doc_id, coalesce(array_to_string(hits, ','), '') AS matched,
      |       CAST(len(hits) AS BIGINT) AS n_matched,
      |       len(hits) > 0 AS blocked
      |FROM m ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.blocklistFilter(t(s, dir, "documents"), "text", "doc_id",
      Seq("dup", "join order", "slo", "slow", "zzzz"))
      .orderBy("doc_id")
  }

  // Full-batch logistic-regression quality classifier, 3 GD rounds
  // unrolled in the oracle (the dawidSkene precedent): features are the
  // t2 quality components micro-quantized scan-side, weights live in
  // integer nanos, the margin/sigmoid/update arithmetic is the same
  // fixed-shape IEEE expression in both engines, and per-doc gradient
  // terms nano-floor before the order-free integer sum — the whole
  // training trajectory plus final accuracy hash-matches.
  register(
    "t76_logreg_quality",
    """WITH f AS (
      |  SELECT CASE WHEN source IN ('src0', 'src1', 'src2')
      |              THEN 1 ELSE 0 END AS y,
      |         CAST(floor(least(length(text) / 500.0, 1.0) * 1000000.0
      |           + 0.5) AS BIGINT) AS lm,
      |         CAST(floor((CASE WHEN len(toks) > 0 THEN
      |             len(list_filter(toks, x -> x IN ('the','a','of','and',
      |               'to','in')))::DOUBLE / len(toks)
      |           ELSE 0.0 END) * 1000000.0 + 0.5) AS BIGINT) AS sm,
      |         CAST(floor((CASE WHEN length(text) > 0 THEN
      |             len(regexp_extract_all(text, '[^\w\s]'))::DOUBLE /
      |               length(text)
      |           ELSE 0.0 END) * 1000000.0 + 0.5) AS BIGINT) AS pm
      |  FROM (SELECT source, text,
      |          list_filter(string_split_regex(lower(text), '\s+'),
      |                      x -> x != '') AS toks
      |        FROM documents)),
      |nt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f),
      |w0 AS (SELECT CAST(0 AS BIGINT) AS b, CAST(0 AS BIGINT) AS l,
      |              CAST(0 AS BIGINT) AS s, CAST(0 AS BIGINT) AS p),
      |g1 AS (
      |  SELECT
      |    CAST(sum(CAST(floor((CAST(y AS DOUBLE) - (1.0 / (1.0 + exp(-((((CAST(w.b AS DOUBLE) / 1000000000.0) + ((CAST(w.l AS DOUBLE) / 1000000000.0) * (CAST(lm AS DOUBLE) / 1000000.0))) + ((CAST(w.s AS DOUBLE) / 1000000000.0) * (CAST(sm AS DOUBLE) / 1000000.0))) + ((CAST(w.p AS DOUBLE) / 1000000000.0) * (CAST(pm AS DOUBLE) / 1000000.0))))))) * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS gb,
      |    CAST(sum(CAST(floor(((CAST(y AS DOUBLE) - (1.0 / (1.0 + exp(-((((CAST(w.b AS DOUBLE) / 1000000000.0) + ((CAST(w.l AS DOUBLE) / 1000000000.0) * (CAST(lm AS DOUBLE) / 1000000.0))) + ((CAST(w.s AS DOUBLE) / 1000000000.0) * (CAST(sm AS DOUBLE) / 1000000.0))) + ((CAST(w.p AS DOUBLE) / 1000000000.0) * (CAST(pm AS DOUBLE) / 1000000.0))))))) * (CAST(lm AS DOUBLE) / 1000000.0)) * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS gl,
      |    CAST(sum(CAST(floor(((CAST(y AS DOUBLE) - (1.0 / (1.0 + exp(-((((CAST(w.b AS DOUBLE) / 1000000000.0) + ((CAST(w.l AS DOUBLE) / 1000000000.0) * (CAST(lm AS DOUBLE) / 1000000.0))) + ((CAST(w.s AS DOUBLE) / 1000000000.0) * (CAST(sm AS DOUBLE) / 1000000.0))) + ((CAST(w.p AS DOUBLE) / 1000000000.0) * (CAST(pm AS DOUBLE) / 1000000.0))))))) * (CAST(sm AS DOUBLE) / 1000000.0)) * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS gs,
      |    CAST(sum(CAST(floor(((CAST(y AS DOUBLE) - (1.0 / (1.0 + exp(-((((CAST(w.b AS DOUBLE) / 1000000000.0) + ((CAST(w.l AS DOUBLE) / 1000000000.0) * (CAST(lm AS DOUBLE) / 1000000.0))) + ((CAST(w.s AS DOUBLE) / 1000000000.0) * (CAST(sm AS DOUBLE) / 1000000.0))) + ((CAST(w.p AS DOUBLE) / 1000000000.0) * (CAST(pm AS DOUBLE) / 1000000.0))))))) * (CAST(pm AS DOUBLE) / 1000000.0)) * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS gp
      |  FROM f, w0 w),
      |w1 AS (SELECT
      |    w.b + CAST(floor((0.5 * CAST(g.gb AS DOUBLE)) / nt.n + 0.5) AS BIGINT) AS b,
      |    w.l + CAST(floor((0.5 * CAST(g.gl AS DOUBLE)) / nt.n + 0.5) AS BIGINT) AS l,
      |    w.s + CAST(floor((0.5 * CAST(g.gs AS DOUBLE)) / nt.n + 0.5) AS BIGINT) AS s,
      |    w.p + CAST(floor((0.5 * CAST(g.gp AS DOUBLE)) / nt.n + 0.5) AS BIGINT) AS p
      |  FROM w0 w, g1 g, nt),
      |g2 AS (
      |  SELECT
      |    CAST(sum(CAST(floor((CAST(y AS DOUBLE) - (1.0 / (1.0 + exp(-((((CAST(w.b AS DOUBLE) / 1000000000.0) + ((CAST(w.l AS DOUBLE) / 1000000000.0) * (CAST(lm AS DOUBLE) / 1000000.0))) + ((CAST(w.s AS DOUBLE) / 1000000000.0) * (CAST(sm AS DOUBLE) / 1000000.0))) + ((CAST(w.p AS DOUBLE) / 1000000000.0) * (CAST(pm AS DOUBLE) / 1000000.0))))))) * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS gb,
      |    CAST(sum(CAST(floor(((CAST(y AS DOUBLE) - (1.0 / (1.0 + exp(-((((CAST(w.b AS DOUBLE) / 1000000000.0) + ((CAST(w.l AS DOUBLE) / 1000000000.0) * (CAST(lm AS DOUBLE) / 1000000.0))) + ((CAST(w.s AS DOUBLE) / 1000000000.0) * (CAST(sm AS DOUBLE) / 1000000.0))) + ((CAST(w.p AS DOUBLE) / 1000000000.0) * (CAST(pm AS DOUBLE) / 1000000.0))))))) * (CAST(lm AS DOUBLE) / 1000000.0)) * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS gl,
      |    CAST(sum(CAST(floor(((CAST(y AS DOUBLE) - (1.0 / (1.0 + exp(-((((CAST(w.b AS DOUBLE) / 1000000000.0) + ((CAST(w.l AS DOUBLE) / 1000000000.0) * (CAST(lm AS DOUBLE) / 1000000.0))) + ((CAST(w.s AS DOUBLE) / 1000000000.0) * (CAST(sm AS DOUBLE) / 1000000.0))) + ((CAST(w.p AS DOUBLE) / 1000000000.0) * (CAST(pm AS DOUBLE) / 1000000.0))))))) * (CAST(sm AS DOUBLE) / 1000000.0)) * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS gs,
      |    CAST(sum(CAST(floor(((CAST(y AS DOUBLE) - (1.0 / (1.0 + exp(-((((CAST(w.b AS DOUBLE) / 1000000000.0) + ((CAST(w.l AS DOUBLE) / 1000000000.0) * (CAST(lm AS DOUBLE) / 1000000.0))) + ((CAST(w.s AS DOUBLE) / 1000000000.0) * (CAST(sm AS DOUBLE) / 1000000.0))) + ((CAST(w.p AS DOUBLE) / 1000000000.0) * (CAST(pm AS DOUBLE) / 1000000.0))))))) * (CAST(pm AS DOUBLE) / 1000000.0)) * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS gp
      |  FROM f, w1 w),
      |w2 AS (SELECT
      |    w.b + CAST(floor((0.5 * CAST(g.gb AS DOUBLE)) / nt.n + 0.5) AS BIGINT) AS b,
      |    w.l + CAST(floor((0.5 * CAST(g.gl AS DOUBLE)) / nt.n + 0.5) AS BIGINT) AS l,
      |    w.s + CAST(floor((0.5 * CAST(g.gs AS DOUBLE)) / nt.n + 0.5) AS BIGINT) AS s,
      |    w.p + CAST(floor((0.5 * CAST(g.gp AS DOUBLE)) / nt.n + 0.5) AS BIGINT) AS p
      |  FROM w1 w, g2 g, nt),
      |g3 AS (
      |  SELECT
      |    CAST(sum(CAST(floor((CAST(y AS DOUBLE) - (1.0 / (1.0 + exp(-((((CAST(w.b AS DOUBLE) / 1000000000.0) + ((CAST(w.l AS DOUBLE) / 1000000000.0) * (CAST(lm AS DOUBLE) / 1000000.0))) + ((CAST(w.s AS DOUBLE) / 1000000000.0) * (CAST(sm AS DOUBLE) / 1000000.0))) + ((CAST(w.p AS DOUBLE) / 1000000000.0) * (CAST(pm AS DOUBLE) / 1000000.0))))))) * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS gb,
      |    CAST(sum(CAST(floor(((CAST(y AS DOUBLE) - (1.0 / (1.0 + exp(-((((CAST(w.b AS DOUBLE) / 1000000000.0) + ((CAST(w.l AS DOUBLE) / 1000000000.0) * (CAST(lm AS DOUBLE) / 1000000.0))) + ((CAST(w.s AS DOUBLE) / 1000000000.0) * (CAST(sm AS DOUBLE) / 1000000.0))) + ((CAST(w.p AS DOUBLE) / 1000000000.0) * (CAST(pm AS DOUBLE) / 1000000.0))))))) * (CAST(lm AS DOUBLE) / 1000000.0)) * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS gl,
      |    CAST(sum(CAST(floor(((CAST(y AS DOUBLE) - (1.0 / (1.0 + exp(-((((CAST(w.b AS DOUBLE) / 1000000000.0) + ((CAST(w.l AS DOUBLE) / 1000000000.0) * (CAST(lm AS DOUBLE) / 1000000.0))) + ((CAST(w.s AS DOUBLE) / 1000000000.0) * (CAST(sm AS DOUBLE) / 1000000.0))) + ((CAST(w.p AS DOUBLE) / 1000000000.0) * (CAST(pm AS DOUBLE) / 1000000.0))))))) * (CAST(sm AS DOUBLE) / 1000000.0)) * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS gs,
      |    CAST(sum(CAST(floor(((CAST(y AS DOUBLE) - (1.0 / (1.0 + exp(-((((CAST(w.b AS DOUBLE) / 1000000000.0) + ((CAST(w.l AS DOUBLE) / 1000000000.0) * (CAST(lm AS DOUBLE) / 1000000.0))) + ((CAST(w.s AS DOUBLE) / 1000000000.0) * (CAST(sm AS DOUBLE) / 1000000.0))) + ((CAST(w.p AS DOUBLE) / 1000000000.0) * (CAST(pm AS DOUBLE) / 1000000.0))))))) * (CAST(pm AS DOUBLE) / 1000000.0)) * 1000000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS gp
      |  FROM f, w2 w),
      |w3 AS (SELECT
      |    w.b + CAST(floor((0.5 * CAST(g.gb AS DOUBLE)) / nt.n + 0.5) AS BIGINT) AS b,
      |    w.l + CAST(floor((0.5 * CAST(g.gl AS DOUBLE)) / nt.n + 0.5) AS BIGINT) AS l,
      |    w.s + CAST(floor((0.5 * CAST(g.gs AS DOUBLE)) / nt.n + 0.5) AS BIGINT) AS s,
      |    w.p + CAST(floor((0.5 * CAST(g.gp AS DOUBLE)) / nt.n + 0.5) AS BIGINT) AS p
      |  FROM w2 w, g3 g, nt),
      |acc AS (
      |  SELECT CAST(sum(CASE WHEN (((((CAST(w.b AS DOUBLE) / 1000000000.0) + ((CAST(w.l AS DOUBLE) / 1000000000.0) * (CAST(lm AS DOUBLE) / 1000000.0))) + ((CAST(w.s AS DOUBLE) / 1000000000.0) * (CAST(sm AS DOUBLE) / 1000000.0))) + ((CAST(w.p AS DOUBLE) / 1000000000.0) * (CAST(pm AS DOUBLE) / 1000000.0))) >= 0.0) = (y = 1)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS c
      |  FROM f, w3 w)
      |SELECT nt.n,
      |       CAST(w3.b AS DOUBLE) / 1000000000.0 AS w_bias,
      |       CAST(w3.l AS DOUBLE) / 1000000000.0 AS w_f_len,
      |       CAST(w3.s AS DOUBLE) / 1000000000.0 AS w_f_stop,
      |       CAST(w3.p AS DOUBLE) / 1000000000.0 AS w_f_punct,
      |       floor((CAST(acc.c AS DOUBLE) * 1000000.0) / nt.n + 0.5)
      |         / 1000000.0 AS accuracy
      |FROM nt, w3, acc""".stripMargin) { (s, dir) =>
    val stop = Seq("the", "a", "of", "and", "to", "in")
    val feats = t(s, dir, "documents").select(
      when(col("source").isin("src0", "src1", "src2"), 1).otherwise(0).as("y"),
      floor(least(length(col("text")).cast("double") / 500.0, lit(1.0)) *
        1000000.0 + 0.5).cast("long").as("f_len"),
      floor(TextAnalysis.stopwordRatio(col("text"), stop) * 1000000.0 + 0.5)
        .cast("long").as("f_stop"),
      floor(TextAnalysis.punctRatio(col("text")) * 1000000.0 + 0.5)
        .cast("long").as("f_punct"))
    TextAnalysis.logregTrain(feats, Seq("f_len", "f_stop", "f_punct"), "y",
      rounds = 3, lr = 0.5)
  }

  // Zipf power-law fit over the top-200 vocabulary ranks: micro-floored
  // log moments, exact-integer OLS sums, one double division per
  // coefficient — hash-matched.
  register(
    "t77_zipf_fit",
    """WITH c AS (
      |  SELECT tok, CAST(count(*) AS BIGINT) AS n
      |  FROM (SELECT unnest(list_filter(string_split_regex(lower(text),
      |          '\s+'), x -> x != '')) AS tok FROM documents)
      |  GROUP BY tok),
      |t AS (SELECT n, row_number() OVER (ORDER BY n DESC, tok ASC) AS rank
      |      FROM c ORDER BY n DESC, tok ASC LIMIT 200),
      |mm AS (SELECT
      |    CAST(floor(ln(CAST(rank AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS x,
      |    CAST(floor(ln(CAST(n AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS y
      |  FROM t),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS r,
      |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |             CAST(sum(x * x) AS BIGINT) AS sxx,
      |             CAST(sum(x * y) AS BIGINT) AS sxy FROM mm)
      |SELECT r,
      |  floor((CAST(r * sxy - sx * sy AS DOUBLE) /
      |         CAST(r * sxx - sx * sx AS DOUBLE)) * 1000000.0 + 0.5)
      |    / 1000000.0 AS slope,
      |  floor((CAST(sy AS DOUBLE) - (CAST(r * sxy - sx * sy AS DOUBLE) /
      |         CAST(r * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE)) /
      |         CAST(r AS DOUBLE) + 0.5) / 1000000.0 AS intercept
      |FROM m""".stripMargin) { (s, dir) =>
    TextAnalysis.zipfFit(t(s, dir, "documents"), "text", topR = 200)
  }

  // Dataset card: the one-row release summary (sizes, vocab, mean
  // quality, exact-dup rate, blocklist exposure) — a composite of
  // individually-proven pieces (t2 quality, d1 hash-dedup, t75
  // blocklist) in ONE pre-combined per-doc aggregate + a vocab pass.
  register(
    "p9_dataset_card",
    """WITH d AS (
      |  SELECT text, lower(text) AS lt,
      |         list_filter(string_split_regex(lower(text), '\s+'),
      |                     x -> x != '') AS toks
      |  FROM documents),
      |a AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |         CAST(sum(len(toks)) AS BIGINT) AS ntok,
      |         CAST(sum(length(text)) AS BIGINT) AS nch,
      |         CAST(sum(CAST(floor(round(greatest(0.0,
      |           least(length(text) / 500.0, 1.0) * 0.4 +
      |           least((len(list_filter(toks, x -> x IN ('the','a','of',
      |             'and','to','in')))::DOUBLE /
      |             greatest(len(toks), 1)) * 3.0, 1.0) * 0.4 +
      |           (1.0 - least(len(regexp_extract_all(text, '[^\w\s]'))::DOUBLE /
      |             greatest(length(text), 1) * 5.0, 1.0)) * 0.2), 6)
      |           * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS q,
      |         CAST(count(DISTINCT md5(text)) AS BIGINT) AS dh,
      |         CAST(sum(CASE WHEN len(list_filter(['dup', 'join order',
      |             'slo', 'slow', 'zzzz'], p -> contains(lt, p))) > 0
      |           THEN 1 ELSE 0 END) AS BIGINT) AS bln
      |  FROM d),
      |v AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS vocab
      |      FROM (SELECT unnest(toks) AS tok FROM d))
      |SELECT n AS n_docs, ntok AS n_tokens, nch AS n_chars, vocab,
      |       floor(CAST(q AS DOUBLE) / n + 0.5) / 1000000.0 AS mean_quality,
      |       floor(CAST(n - dh AS DOUBLE) * 1000000.0 / n + 0.5)
      |         / 1000000.0 AS dup_rate,
      |       floor(CAST(bln AS DOUBLE) * 1000000.0 / n + 0.5)
      |         / 1000000.0 AS blocked_frac
      |FROM a, v""".stripMargin) { (s, dir) =>
    TextAnalysis.datasetCard(t(s, dir, "documents"), "text",
      stopwords = Seq("the", "a", "of", "and", "to", "in"),
      blocklist = Seq("dup", "join order", "slo", "slow", "zzzz"))
  }

  // Unigram-LM (SentencePiece-style) tokenizer training — realistic run
  // (rows-only: the Viterbi E-step is not SQL-expressible; the planted
  // twin below hash-proves the full mechanism, the t44 BPE precedent).
  registerNoOracle("t78_unigram_lm") { (s, dir) =>
    TextAnalysis.unigramLmLearn(t(s, dir, "documents"), "text",
      maxPieceLen = 3, seedSize = 30, rounds = 2).orderBy("piece")
  }

  // Planted twin with PROVABLE segmentations: words are pure repetitions
  // of the disjoint-alphabet pieces 'ab' and 'cd' (lengths driven by
  // doc_id arithmetic), maxPieceLen = 2. Under the seed scores
  // p(ab) = p(a) = p(b) (every 'a' occurs inside an 'ab'), so the
  // 2-piece path beats any char/straddle path strictly:
  // p(ab)² > p(a)·p(ba)·p(b) because p(ba) < 1 — Viterbi MUST emit
  // k × [ab] for 'ab'^k in every round. Piece counts are therefore
  // analytic (sum of the doc_id arithmetic), straddle pieces 'ba'/'dc'
  // win zero mass and are pruned, chars sit at the -25.0 UNK floor, and
  // the M-step log-probs are ln(count/total) micro-floored — all
  // SQL-reproducible, hash-matched.
  register(
    "t78b_unigram_lm_planted",
    """WITH k AS (SELECT CAST(sum(doc_id % 3 + 1) AS BIGINT) AS nab,
      |                  CAST(sum(doc_id % 5 + 1) AS BIGINT) AS ncd
      |           FROM documents)
      |SELECT piece, count, logprob FROM (
      |  SELECT 'ab' AS piece, nab AS count,
      |         floor(ln(CAST(nab AS DOUBLE) / CAST(nab + ncd AS DOUBLE))
      |           * 1000000.0 + 0.5) / 1000000.0 AS logprob FROM k
      |  UNION ALL
      |  SELECT 'cd', ncd,
      |         floor(ln(CAST(ncd AS DOUBLE) / CAST(nab + ncd AS DOUBLE))
      |           * 1000000.0 + 0.5) / 1000000.0 FROM k
      |  UNION ALL SELECT 'a', CAST(0 AS BIGINT), -25.0 FROM k
      |  UNION ALL SELECT 'b', CAST(0 AS BIGINT), -25.0 FROM k
      |  UNION ALL SELECT 'c', CAST(0 AS BIGINT), -25.0 FROM k
      |  UNION ALL SELECT 'd', CAST(0 AS BIGINT), -25.0 FROM k)
      |ORDER BY piece""".stripMargin) { (s, dir) =>
    val planted = t(s, dir, "documents").select(concat(
      expr("repeat('ab', CAST(doc_id % 3 + 1 AS INT))"), lit(" "),
      expr("repeat('cd', CAST(doc_id % 5 + 1 AS INT))")).as("text"))
    TextAnalysis.unigramLmLearn(planted, "text", maxPieceLen = 2,
      seedSize = 10, rounds = 2).orderBy("piece")
  }

  // Minimum-Bayes-risk candidate selection: 5 "samples" per problem
  // (doc_id % 100 buckets), winner = max mean pairwise ROUGE-2 F1.
  // EXACT oracle — the pairwise clipped-gram algebra is fully
  // SQL-expressible, so unlike ROUGE-L rows no planting is needed.
  register(
    "t79_mbr_select",
    """WITH c AS (
      |  SELECT doc_id % 100 AS problem, doc_id AS cand_id,
      |         list_filter(string_split_regex(lower(text), '\s+'),
      |                     x -> x != '') AS toks
      |  FROM documents),
      |tk AS (SELECT problem, cand_id,
      |         CASE WHEN len(toks) >= 2 THEN
      |           list_transform(generate_series(1, len(toks) - 1),
      |             i -> md5(toks[i] || ' ' || toks[i+1]))
      |         ELSE [] END AS gs FROM c),
      |g AS (SELECT problem, cand_id, gk, CAST(count(*) AS BIGINT) AS c
      |      FROM (SELECT problem, cand_id, unnest(gs) AS gk FROM tk)
      |      GROUP BY 1, 2, 3),
      |tot AS (SELECT problem, cand_id, CAST(sum(c) AS BIGINT) AS ng
      |        FROM g GROUP BY 1, 2),
      |ids AS (SELECT t.problem, t.cand_id, coalesce(tot.ng, 0) AS ng
      |        FROM (SELECT problem, cand_id FROM c) t
      |        LEFT JOIN tot USING (problem, cand_id)),
      |pr AS (SELECT a.problem, a.cand_id AS ida, b.cand_id AS idb,
      |              a.ng AS na, b.ng AS nb
      |       FROM ids a JOIN ids b
      |         ON a.problem = b.problem AND a.cand_id != b.cand_id),
      |mt AS (SELECT x.problem, x.cand_id AS ida, y.cand_id AS idb,
      |              CAST(sum(least(x.c, y.c)) AS BIGINT) AS m
      |       FROM g x JOIN g y ON x.problem = y.problem AND x.gk = y.gk
      |         AND x.cand_id != y.cand_id
      |       GROUP BY 1, 2, 3),
      |f AS (SELECT problem, ida, pm, rm FROM (
      |        SELECT pr.problem, pr.ida,
      |          CASE WHEN na > 0 THEN CAST(floor(CAST(coalesce(mt.m, 0)
      |            AS DOUBLE) * 1000000.0 / na + 0.5) AS BIGINT) END AS pm,
      |          CASE WHEN nb > 0 THEN CAST(floor(CAST(coalesce(mt.m, 0)
      |            AS DOUBLE) * 1000000.0 / nb + 0.5) AS BIGINT) END AS rm
      |        FROM pr LEFT JOIN mt ON pr.problem = mt.problem
      |          AND pr.ida = mt.ida AND pr.idb = mt.idb)),
      |f1 AS (SELECT problem, ida,
      |         CASE WHEN pm IS NOT NULL AND rm IS NOT NULL THEN
      |           CASE WHEN pm + rm > 0 THEN
      |             CAST(floor(CAST(pm * rm * 2 AS DOUBLE) / (pm + rm) + 0.5)
      |               AS BIGINT)
      |           ELSE CAST(0 AS BIGINT) END
      |         ELSE CAST(0 AS BIGINT) END AS f1m FROM f),
      |pc AS (SELECT problem, ida, CAST(sum(f1m) AS BIGINT) AS sf,
      |              CAST(count(*) AS BIGINT) AS np FROM f1 GROUP BY 1, 2),
      |kt AS (SELECT problem, CAST(count(*) AS BIGINT) AS k
      |       FROM ids GROUP BY 1),
      |al AS (SELECT ids.problem, ids.cand_id AS ida, pc.sf, pc.np, kt.k
      |       FROM ids LEFT JOIN pc ON ids.problem = pc.problem
      |         AND ids.cand_id = pc.ida
      |       JOIN kt ON ids.problem = kt.problem),
      |rk AS (SELECT *, row_number() OVER (PARTITION BY problem ORDER BY
      |         (CASE WHEN np IS NOT NULL THEN
      |            floor(CAST(sf AS DOUBLE) / np + 0.5) END) DESC,
      |         ida ASC) AS rnk FROM al)
      |SELECT problem, ida AS winner_id,
      |       CASE WHEN np IS NOT NULL THEN
      |         floor(CAST(sf AS DOUBLE) / np + 0.5) / 1000000.0 END
      |         AS mbr_score, k
      |FROM rk WHERE rnk = 1 ORDER BY problem""".stripMargin) { (s, dir) =>
    Eval.mbrSelect(
      t(s, dir, "documents").select((col("doc_id") % 100).as("problem"),
        col("doc_id").as("cand_id"), col("text")),
      "problem", "cand_id", "text", n = 2).orderBy("problem")
  }

  // Unigram-LM tokenizer APPLICATION on the t78b planted corpus: the
  // learned table (trained in-query — full train->apply composition)
  // must segment 'ab'^k1 'cd'^k2 into exactly k1 + k2 pieces, so the
  // per-doc counts are pure doc_id arithmetic — hash-matched.
  register(
    "t78c_unigram_counts_planted",
    """SELECT doc_id, CAST(2 AS BIGINT) AS n_words,
      |       CAST((doc_id % 3 + 1) + (doc_id % 5 + 1) AS BIGINT) AS n_pieces
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val planted = t(s, dir, "documents").select(col("doc_id"), concat(
      expr("repeat('ab', CAST(doc_id % 3 + 1 AS INT))"), lit(" "),
      expr("repeat('cd', CAST(doc_id % 5 + 1 AS INT))")).as("text"))
    val learned = TextAnalysis.unigramLmLearn(planted, "text",
      maxPieceLen = 2, seedSize = 10, rounds = 2)
      .collect().map(r => r.getString(0) ->
        math.floor(r.getDouble(2) * 1000000.0 + 0.5).toLong).toSeq
    TextAnalysis.unigramTokenCounts(planted, "text", "doc_id", learned)
      .orderBy("doc_id")
  }

  // Heaps' law fit over 10 ingestion checkpoints — the vocabulary-growth
  // exponent beside t77's static Zipf check; micro-floored log points,
  // exact-integer OLS — hash-matched.
  register(
    "t80_heaps_fit",
    """WITH tk AS (
      |  SELECT doc_id AS id,
      |         unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                x -> x != '')) AS tok
      |  FROM documents),
      |fs AS (SELECT tok, CAST(min(id) AS BIGINT) AS fd FROM tk GROUP BY tok),
      |pd AS (SELECT id, CAST(count(*) AS BIGINT) AS nt FROM tk GROUP BY id),
      |mx AS (SELECT CAST(max(id) AS BIGINT) AS m FROM pd),
      |cuts AS (SELECT DISTINCT CAST((m * i) // 10 AS BIGINT) AS cut
      |         FROM mx, range(1, 11) r(i)),
      |v AS (SELECT cut, CAST(count(*) AS BIGINT) AS vv
      |      FROM cuts, fs WHERE fd <= cut GROUP BY cut),
      |tt AS (SELECT cut, CAST(sum(nt) AS BIGINT) AS tn
      |       FROM cuts, pd WHERE id <= cut GROUP BY cut),
      |pts AS (SELECT
      |    CAST(floor(ln(CAST(tn AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS x,
      |    CAST(floor(ln(CAST(vv AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS y
      |  FROM v JOIN tt USING (cut) WHERE tn > 0),
      |m AS (SELECT CAST(count(*) AS BIGINT) AS r,
      |             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |             CAST(sum(x * x) AS BIGINT) AS sxx,
      |             CAST(sum(x * y) AS BIGINT) AS sxy FROM pts)
      |SELECT r AS c,
      |  floor((CAST(r * sxy - sx * sy AS DOUBLE) /
      |         CAST(r * sxx - sx * sx AS DOUBLE)) * 1000000.0 + 0.5)
      |    / 1000000.0 AS beta,
      |  floor((CAST(sy AS DOUBLE) - (CAST(r * sxy - sx * sy AS DOUBLE) /
      |         CAST(r * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE)) /
      |         CAST(r AS DOUBLE) + 0.5) / 1000000.0 AS ln_k
      |FROM m""".stripMargin) { (s, dir) =>
    TextAnalysis.heapsFit(t(s, dir, "documents"), "text", "doc_id",
      checkpoints = 10)
  }

  // Luhn-validated card detection: every doc gets a planted 16-digit
  // number whose check digit is COMPUTED by the same Luhn fold in both
  // engines — even docs get the valid digit, odd docs get it shifted
  // by 5 (never equal mod 10, so provably invalid). The validator then
  // splits the corpus exactly in half — hash-matched.
  register(
    "t81_luhn_pii",
    """WITH b AS (
      |  SELECT doc_id,
      |         lpad(CAST(doc_id * 7919 AS VARCHAR), 15, '0') AS base
      |  FROM documents),
      |ck AS (
      |  SELECT doc_id, base,
      |    CAST((10 - CAST(list_sum(list_transform(
      |        range(1, length(base) + 1),
      |        i -> CASE WHEN (length(base) + 1 - i) % 2 = 1 THEN
      |               CASE WHEN CAST(base[i] AS INTEGER) * 2 > 9
      |                    THEN CAST(base[i] AS INTEGER) * 2 - 9
      |                    ELSE CAST(base[i] AS INTEGER) * 2 END
      |             ELSE CAST(base[i] AS INTEGER) END)) AS BIGINT) % 10)
      |      % 10 AS BIGINT) AS cd
      |  FROM b),
      |t AS (
      |  SELECT doc_id,
      |         'card ' || base ||
      |           CAST((cd + CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 5 END) % 10
      |                AS VARCHAR) || ' end' AS text81
      |  FROM ck),
      |e AS (
      |  SELECT doc_id, regexp_extract_all(text81, '[0-9]{13,19}') AS cands
      |  FROM t)
      |SELECT doc_id, CAST(len(cands) AS BIGINT) AS n_candidates,
      |  CAST(len(list_filter(cands, c ->
      |    CAST(list_sum(list_transform(range(1, length(c) + 1),
      |      i -> CASE WHEN (length(c) - i) % 2 = 1 THEN
      |             CASE WHEN CAST(c[i] AS INTEGER) * 2 > 9
      |                  THEN CAST(c[i] AS INTEGER) * 2 - 9
      |                  ELSE CAST(c[i] AS INTEGER) * 2 END
      |           ELSE CAST(c[i] AS INTEGER) END)) AS BIGINT) % 10 = 0))
      |    AS BIGINT) AS n_valid
      |FROM e ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val base = lpad((col("doc_id") * 7919).cast("string"), 15, "0")
    val cd = TextAnalysis.luhnCheckDigit(base)
    val planted = t(s, dir, "documents").select(col("doc_id"), concat(
      lit("card "), base,
      ((cd + when(col("doc_id") % 2 === 0, 0).otherwise(5)) % 10)
        .cast("string"), lit(" end")).as("text81"))
    TextAnalysis.luhnCards(planted, "text81", "doc_id").orderBy("doc_id")
  }

  // Word error rate via the codegen'd token-level edit distance, on a
  // planted construction with ANALYTIC distances: empty hypothesis
  // (edits = ref_len), identical (0), kept-subsequence — a
  // deletions-only ASR-style hypothesis (edits = dropped count exactly:
  // insertions-only is both achievable and the ref-LCS lower bound) —
  // and prefix-30 (edits = tail length). Hash oracle over the analytic
  // values; EvalSpec proves the DP against a reference implementation
  // and the builtin char levenshtein. (A first cut planted noise
  // tokens in the subsequence and assumed 2 substitutions were always
  // available — the DP refuted it: fixed noise POSITIONS cannot always
  // align to a dropped token, so the analytic claim held only
  // gap-structure-dependently. Planted oracles must be provable under
  // alignment constraints, not just edit-count arithmetic.)
  register(
    "t71_wer_planted",
    """WITH w AS (
      |  SELECT doc_id AS pair_id,
      |         list_filter(string_split_regex(lower(text), '\s+'),
      |                     x -> x != '') AS toks
      |  FROM documents),
      |b AS (SELECT pair_id, list_slice(toks, 1, 40) AS rt FROM w),
      |k AS (SELECT pair_id, rt,
      |             list_filter(rt, (x, i) -> i % 3 != 0) AS kept FROM b),
      |a AS (
      |  SELECT pair_id, CAST(len(rt) AS BIGINT) AS ref_len,
      |         CASE WHEN pair_id % 19 = 0 THEN CAST(0 AS BIGINT)
      |              WHEN pair_id % 13 = 0 THEN CAST(len(rt) AS BIGINT)
      |              WHEN pair_id % 5 = 0 THEN CAST(len(kept) AS BIGINT)
      |              ELSE CAST(least(len(rt), 30) AS BIGINT) END AS hyp_len,
      |         CASE WHEN pair_id % 19 = 0 THEN CAST(len(rt) AS BIGINT)
      |              WHEN pair_id % 13 = 0 THEN CAST(0 AS BIGINT)
      |              WHEN pair_id % 5 = 0 THEN
      |                CAST(len(rt) - len(kept) AS BIGINT)
      |              ELSE CAST(len(rt) - least(len(rt), 30) AS BIGINT)
      |         END AS edits
      |  FROM k)
      |SELECT pair_id, hyp_len, ref_len, edits,
      |       CASE WHEN ref_len > 0 THEN floor(CAST(edits AS DOUBLE) *
      |         1000000.0 / ref_len + 0.5) / 1000000.0 END AS wer
      |FROM a ORDER BY pair_id""".stripMargin) { (s, dir) =>
    val toksCol = TextAnalysis.tokens(lower(col("text")))
    val kdf = t(s, dir, "documents")
      .select(col("doc_id").as("pair_id"), slice(toksCol, 1, 40).as("rt"))
      .select(col("pair_id"), col("rt"),
        filter(col("rt"), (_, i) => (i + 1) % 3 =!= 0).as("kept"))
    val hypArr = when(col("pair_id") % 19 === 0,
        array().cast("array<string>"))
      .when(col("pair_id") % 13 === 0, col("rt"))
      .when(col("pair_id") % 5 === 0, col("kept"))
      .otherwise(slice(col("rt"), 1, 30))
    val p = kdf.select(col("pair_id"), array_join(hypArr, " ").as("hyp"),
      array_join(col("rt"), " ").as("ref"))
    Eval.wer(p, "pair_id", "hyp", "ref").orderBy("pair_id")
  }

  // Paired A/B system comparison with a significance envelope — the
  // eval report that decides "ship system A or B": per document, both
  // systems' candidates score ROUGE-L recall against the same
  // reference (A = prefix-30, B = kept-subsequence+noise — both with
  // ANALYTIC LCS), then win/tie/loss counts plus a grouped-jackknife
  // CI on the mean per-pair delta. A CI excluding 0 = a significant
  // winner, computed deterministically end to end — hash oracle on the
  // single report row.
  register(
    "p8_ab_eval",
    """WITH w AS (
      |  SELECT doc_id AS pair_id,
      |         list_filter(string_split_regex(lower(text), '\s+'),
      |                     x -> x != '') AS toks
      |  FROM documents),
      |b AS (SELECT pair_id, list_slice(toks, 1, 40) AS rt FROM w),
      |k AS (SELECT pair_id, rt,
      |             list_filter(rt, (x, i) -> i % 3 != 0) AS kept FROM b),
      |m AS (
      |  SELECT pair_id, CAST(len(rt) AS BIGINT) AS rl,
      |         CAST(least(len(rt), 30) AS BIGINT) AS lcs_a,
      |         CAST(len(kept) AS BIGINT) AS lcs_b
      |  FROM k WHERE len(rt) > 0),
      |d AS (
      |  SELECT pair_id,
      |    CAST(floor(CAST(lcs_a AS DOUBLE) * 1000000.0 / rl + 0.5)
      |      AS BIGINT) AS am,
      |    CAST(floor(CAST(lcs_b AS DOUBLE) * 1000000.0 / rl + 0.5)
      |      AS BIGINT) AS bm
      |  FROM m),
      |wl AS (
      |  SELECT CAST(sum(CASE WHEN am / 1000000.0 > bm / 1000000.0
      |           THEN 1 ELSE 0 END) AS BIGINT) AS a_wins,
      |         CAST(sum(CASE WHEN am / 1000000.0 = bm / 1000000.0
      |           THEN 1 ELSE 0 END) AS BIGINT) AS ties,
      |         CAST(sum(CASE WHEN am / 1000000.0 < bm / 1000000.0
      |           THEN 1 ELSE 0 END) AS BIGINT) AS b_wins
      |  FROM d),
      |q AS (
      |  SELECT pair_id % 20 AS bk,
      |    CAST(floor((am / 1000000.0 - bm / 1000000.0) * 1000000.0 + 0.5)
      |      AS BIGINT) AS v
      |  FROM d),
      |pb AS (SELECT bk, CAST(count(*) AS BIGINT) AS bn,
      |              CAST(sum(v) AS BIGINT) AS bs FROM q GROUP BY 1),
      |tot AS (SELECT CAST(sum(bn) AS BIGINT) AS n,
      |               CAST(sum(bs) AS BIGINT) AS s,
      |               CAST(count(*) AS BIGINT) AS nb FROM pb),
      |loo AS (
      |  SELECT t.n, t.s, t.nb,
      |         CASE WHEN t.n > pb.bn THEN CAST(floor(CAST(t.s - pb.bs AS
      |           DOUBLE) / (t.n - pb.bn) + 0.5) AS BIGINT) END AS theta
      |  FROM pb, tot t),
      |tm AS (SELECT CAST(floor(CAST(sum(theta) AS DOUBLE) / count(theta)
      |         + 0.5) AS BIGINT) AS tm FROM loo),
      |ssx AS (SELECT max(l.n) AS n, max(l.s) AS s, max(l.nb) AS nb,
      |               CAST(sum((l.theta - t.tm) * (l.theta - t.tm))
      |                 AS BIGINT) AS ss
      |        FROM loo l, tm t),
      |fin AS (SELECT n, nb,
      |          CAST(floor(CAST(s AS DOUBLE) / n + 0.5) AS BIGINT) AS meanm,
      |          CASE WHEN nb > 1 AND ss IS NOT NULL THEN
      |            CAST(floor(sqrt(CAST(nb - 1 AS DOUBLE) * ss / nb) + 0.5)
      |              AS BIGINT) END AS sem
      |        FROM ssx)
      |SELECT f.n, f.nb AS n_buckets, wl.a_wins, wl.ties, wl.b_wins,
      |       f.meanm / 1000000.0 AS mean, f.sem / 1000000.0 AS se,
      |       (f.meanm - CAST(floor(CAST(f.sem AS DOUBLE) * 1.96 + 0.5)
      |         AS BIGINT)) / 1000000.0 AS lo,
      |       (f.meanm + CAST(floor(CAST(f.sem AS DOUBLE) * 1.96 + 0.5)
      |         AS BIGINT)) / 1000000.0 AS hi
      |FROM fin f, wl""".stripMargin) { (s, dir) =>
    val toksCol = TextAnalysis.tokens(lower(col("text")))
    val kdf = t(s, dir, "documents")
      .select(col("doc_id").as("pair_id"), slice(toksCol, 1, 40).as("rt"))
      .select(col("pair_id"), col("rt"),
        filter(col("rt"), (_, i) => (i + 1) % 3 =!= 0).as("kept"))
      .where(size(col("rt")) > 0)
    val noise = md5(col("pair_id").cast("string"))
    val candB = concat(array(noise), slice(col("kept"), 1, 10), array(noise),
      slice(col("kept"), lit(11), greatest(size(col("kept")) - 10, lit(0))))
    val pa = kdf.select(col("pair_id"),
      array_join(slice(col("rt"), 1, 30), " ").as("cand"),
      array_join(col("rt"), " ").as("ref"))
    val pb = kdf.select(col("pair_id"), array_join(candB, " ").as("cand"),
      array_join(col("rt"), " ").as("ref"))
    val ra = Eval.rougeL(pa, "pair_id", "cand", "ref")
      .select(col("pair_id"), col("rouge_r").as("a_r"))
    val rb = Eval.rougeL(pb, "pair_id", "cand", "ref")
      .select(col("pair_id"), col("rouge_r").as("b_r"))
    val joined = ra.join(rb, "pair_id").localCheckpoint()
    val wl = joined.agg(
      sum(when(col("a_r") > col("b_r"), 1L).otherwise(0L)).as("a_wins"),
      sum(when(col("a_r") === col("b_r"), 1L).otherwise(0L)).as("ties"),
      sum(when(col("a_r") < col("b_r"), 1L).otherwise(0L)).as("b_wins"))
    val jk = Eval.jackknifeCI(
      joined.select((col("pair_id") % 20).as("bucket"),
        (col("a_r") - col("b_r")).as("delta")),
      "delta", "bucket")
    jk.crossJoin(broadcast(wl))
      .select(col("n"), col("n_buckets"), col("a_wins"), col("ties"),
        col("b_wins"), col("mean"), col("se"), col("lo"), col("hi"))
  }

  // WARC web-corpus ingestion round trip (the a6 round-trip oracle
  // pattern): documents serialize into 50-record WARC blobs with real
  // Content-Length byte framing — every 17th body EMBEDS the
  // "WARC/1.0" magic verbatim, which shreds any delimiter-split parser
  // — then warc_split parses the blobs back scan-side. The oracle never
  // parses: it asserts the parse reproduces the source records exactly.
  register(
    "p7_warc_ingest",
    """SELECT 'd' || CAST(doc_id AS VARCHAR) AS rec_id,
      |       'conversion' AS rec_type,
      |       CAST(strlen(body) AS BIGINT) AS content_length, body
      |FROM (SELECT doc_id,
      |        CASE WHEN doc_id % 17 = 0 THEN text || ' WARC/1.0 embedded'
      |             ELSE text END AS body
      |      FROM documents)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val body = when(col("doc_id") % 17 === 0,
      concat(col("text"), lit(" WARC/1.0 embedded"))).otherwise(col("text"))
    val rec = concat(
      lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Record-ID: d"),
      col("doc_id").cast("string"),
      lit("\r\nContent-Length: "), octet_length(body).cast("string"),
      lit("\r\n\r\n"), body, lit("\r\n\r\n"))
    val blobs = t(s, dir, "documents")
      .select((col("doc_id") / 50).cast("long").as("blob_id"),
        struct(col("doc_id").as("i"), rec.as("r")).as("e"))
      .groupBy("blob_id")
      .agg(array_join(transform(sort_array(collect_list(col("e"))),
        e => e.getField("r")), "").as("blob"))
    blobs
      .select(explode(graft.functions.WarcSplit.column(
        col("blob").cast("binary"))).as("rec"))
      .select(col("rec.rec_id"), col("rec.rec_type"),
        col("rec.content_length"), col("rec.body"))
      .orderBy(substring(col("rec_id"), 2, 18).cast("long"))
  }

  // Model-output QA gate (the p1/p5-style composite a generation-data
  // curator ships): every candidate clears non-empty ∧ non-verbatim ∧
  // ROUGE-L recall ≥ 0.6 against its reference before it enters a
  // training set. Branches: empty (%19), verbatim copy (%13, the
  // plagiarism reject), kept-subsequence+noise (%5, ships), prefix
  // (default, ships) — every branch has an ANALYTIC LCS (prefixes and
  // subsequences of the reference), so the whole verdict row
  // hash-matches end to end.
  register(
    "p6_output_qa",
    """WITH w AS (
      |  SELECT doc_id AS pair_id,
      |         list_filter(string_split_regex(lower(text), '\s+'),
      |                     x -> x != '') AS toks
      |  FROM documents),
      |b AS (SELECT pair_id, list_slice(toks, 1, 40) AS rt FROM w),
      |k AS (SELECT pair_id, rt,
      |             list_filter(rt, (x, i) -> i % 3 != 0) AS kept FROM b),
      |a AS (
      |  SELECT pair_id, CAST(len(rt) AS BIGINT) AS ref_toks,
      |         CASE WHEN pair_id % 19 = 0 THEN CAST(0 AS BIGINT)
      |              WHEN pair_id % 13 = 0 THEN CAST(len(rt) AS BIGINT)
      |              WHEN pair_id % 5 = 0 THEN CAST(len(kept) + 2 AS BIGINT)
      |              ELSE CAST(least(len(rt), 30) AS BIGINT) END AS cand_toks,
      |         CASE WHEN pair_id % 19 = 0 THEN CAST(0 AS BIGINT)
      |              WHEN pair_id % 13 = 0 THEN CAST(len(rt) AS BIGINT)
      |              WHEN pair_id % 5 = 0 THEN CAST(len(kept) AS BIGINT)
      |              ELSE CAST(least(len(rt), 30) AS BIGINT) END AS lcs,
      |         pair_id % 19 = 0 AS empty_side,
      |         (pair_id % 19 != 0 AND (pair_id % 13 = 0 OR
      |          (pair_id % 5 != 0 AND len(rt) <= 30))) AS identical
      |  FROM k),
      |m AS (
      |  SELECT pair_id, cand_toks, ref_toks, lcs, empty_side, identical,
      |         CASE WHEN ref_toks > 0 THEN CAST(floor(CAST(lcs AS DOUBLE)
      |           * 1000000.0 / ref_toks + 0.5) AS BIGINT) END AS rm
      |  FROM a)
      |SELECT pair_id, cand_toks, ref_toks, lcs,
      |       rm / 1000000.0 AS rouge_r, identical, empty_side,
      |       (NOT identical AND NOT empty_side
      |        AND coalesce(rm, 0) >= 600000) AS ship
      |FROM m ORDER BY pair_id""".stripMargin) { (s, dir) =>
    val toksCol = TextAnalysis.tokens(lower(col("text")))
    val kdf = t(s, dir, "documents")
      .select(col("doc_id").as("pair_id"), slice(toksCol, 1, 40).as("rt"))
      .select(col("pair_id"), col("rt"),
        filter(col("rt"), (_, i) => (i + 1) % 3 =!= 0).as("kept"))
    val noise = md5(col("pair_id").cast("string"))
    val candArr = when(col("pair_id") % 19 === 0,
        array().cast("array<string>"))
      .when(col("pair_id") % 13 === 0, col("rt"))
      .when(col("pair_id") % 5 === 0, concat(array(noise),
        slice(col("kept"), 1, 10), array(noise),
        slice(col("kept"), lit(11), greatest(size(col("kept")) - 10, lit(0)))))
      .otherwise(slice(col("rt"), 1, 30))
    val pairs = kdf.select(col("pair_id"),
      array_join(candArr, " ").as("cand"), array_join(col("rt"), " ").as("ref"))
    val flags = pairs.select(col("pair_id"),
      (trim(col("cand")) === "").as("empty_side"),
      (trim(col("cand")) =!= "" && col("cand") === col("ref")).as("identical"))
    Eval.rougeL(pairs, "pair_id", "cand", "ref")
      .join(flags, "pair_id")
      .select(col("pair_id"), col("cand_len").as("cand_toks"),
        col("ref_len").as("ref_toks"), col("lcs"), col("rouge_r"),
        col("identical"), col("empty_side"),
        (!col("identical") && !col("empty_side") &&
          coalesce(col("rouge_r"), lit(0.0)) >= 0.6).as("ship"))
      .orderBy("pair_id")
  }

  // Retrieval eval at k=10 — recall/MRR/nDCG per query over synthetic
  // ranked runs (rank = deterministic 13x%97 scramble within each
  // query's candidate group) against graded judgments (rel 2/1/0 by an
  // 11x%5 cycle). DCG terms micro-floor per (hit, rank) before the
  // per-query sums; nDCG divides the two micro sums — hash oracle.
  register(
    "t69_retrieval_metrics",
    """WITH base AS (
      |  SELECT doc_id, 'q' || CAST(doc_id % 20 AS VARCHAR) AS q_id
      |  FROM documents),
      |runs AS (
      |  SELECT q_id, doc_id, CAST(row_number() OVER (PARTITION BY q_id
      |    ORDER BY (doc_id * 13) % 97, doc_id) AS BIGINT) AS rnk
      |  FROM base),
      |runk AS (SELECT * FROM runs WHERE rnk <= 10),
      |rel AS (
      |  SELECT * FROM (
      |    SELECT q_id, doc_id,
      |           CASE CAST((doc_id * 11) % 5 AS INT)
      |                WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 0 END AS rel
      |    FROM base) WHERE rel > 0),
      |j AS (
      |  SELECT r.q_id, r.rnk,
      |         CAST(floor((power(2, e.rel) - 1.0) * 1000000.0 /
      |           log2(r.rnk + 1) + 0.5) AS BIGINT) AS term
      |  FROM runk r JOIN rel e ON e.q_id = r.q_id AND e.doc_id = r.doc_id),
      |perq AS (
      |  SELECT q_id, CAST(count(*) AS BIGINT) AS hits,
      |         CAST(min(rnk) AS BIGINT) AS minrnk,
      |         CAST(sum(term) AS BIGINT) AS dcg
      |  FROM j GROUP BY 1),
      |ideal AS (
      |  SELECT q_id, CAST(sum(CAST(floor((power(2, rel) - 1.0) * 1000000.0
      |    / log2(irnk + 1) + 0.5) AS BIGINT)) AS BIGINT) AS idcg FROM (
      |      SELECT q_id, rel, row_number() OVER (PARTITION BY q_id
      |        ORDER BY rel DESC, doc_id ASC) AS irnk FROM rel)
      |  WHERE irnk <= 10 GROUP BY 1),
      |ra AS (SELECT q_id, CAST(count(*) AS BIGINT) AS n_rel
      |       FROM rel GROUP BY 1),
      |qs AS (SELECT DISTINCT q_id FROM runs)
      |SELECT qs.q_id, coalesce(n_rel, 0) AS n_rel, coalesce(hits, 0) AS hits,
      |  CASE WHEN coalesce(n_rel, 0) > 0 THEN
      |    floor(CAST(coalesce(hits, 0) AS DOUBLE) * 1000000.0 / n_rel + 0.5)
      |      / 1000000.0 END AS recall_at_k,
      |  coalesce(CASE WHEN minrnk IS NOT NULL THEN
      |    floor(1000000.0 / minrnk + 0.5) / 1000000.0 END, 0.0) AS mrr_at_k,
      |  CASE WHEN idcg > 0 THEN
      |    floor(CAST(coalesce(dcg, 0) AS DOUBLE) * 1000000.0 / idcg + 0.5)
      |      / 1000000.0 END AS ndcg_at_k
      |FROM qs LEFT JOIN ra USING (q_id) LEFT JOIN perq USING (q_id)
      |        LEFT JOIN ideal USING (q_id)
      |ORDER BY q_id""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val base = t(s, dir, "documents").select(col("doc_id"),
      concat(lit("q"), (col("doc_id") % 20).cast("string")).as("q_id"))
    val runs = base.withColumn("rank", row_number().over(
      Window.partitionBy("q_id")
        .orderBy((col("doc_id") * 13) % 97, col("doc_id"))))
    val qrels = base.select(col("q_id"), col("doc_id"),
      when((col("doc_id") * 11) % 5 === 0, 2)
        .when((col("doc_id") * 11) % 5 === 1, 1).otherwise(0).as("rel"))
    Eval.retrievalMetrics(runs, qrels, "q_id", "doc_id", "rank", "rel",
        k = 10)
      .orderBy("q_id")
  }

  // Dawid–Skene label aggregation (one hard-EM round, fully unrolled in
  // the oracle): the t62 rating construction (3 raters, missing slots,
  // 'en'-biased noise) aggregated beyond majority vote — worker
  // confusion matrices learned from the majority init re-weight every
  // vote. Log terms micro-floor before the only cross-row sums; ties
  // break to the smallest label at both argmax sites. Hash oracle over
  // (item, label, n_votes, n_agree).
  register(
    "t68_dawid_skene",
    """WITH ratings AS (
      |  SELECT CAST(doc_id AS VARCHAR) AS item,
      |         'w' || CAST(r AS VARCHAR) AS worker,
      |         CASE WHEN (doc_id * 3 + r) % 5 < 3 THEN lang
      |              ELSE 'en' END AS vote
      |  FROM documents, (SELECT unnest([0, 1, 2]) AS r)
      |  WHERE (doc_id + r) % 7 != 0),
      |kk AS (SELECT CAST(count(DISTINCT vote) AS BIGINT) AS k FROM ratings),
      |nn AS (SELECT CAST(count(DISTINCT item) AS BIGINT) AS n FROM ratings),
      |labels AS (SELECT DISTINCT vote AS cand FROM ratings),
      |mj AS (SELECT item, vote, count(*) AS c FROM ratings GROUP BY 1, 2),
      |init AS (SELECT item, vote AS t FROM (
      |    SELECT item, vote, row_number() OVER (PARTITION BY item
      |      ORDER BY c DESC, vote ASC) AS rn FROM mj) WHERE rn = 1),
      |assigned AS (
      |  SELECT r.item, r.worker, r.vote, i.t
      |  FROM ratings r JOIN init i ON i.item = r.item),
      |cwtv AS (SELECT worker, t, vote, CAST(count(*) AS BIGINT) AS cnt
      |         FROM assigned GROUP BY 1, 2, 3),
      |cwt AS (SELECT worker, t, CAST(sum(cnt) AS BIGINT) AS tot
      |        FROM cwtv GROUP BY 1, 2),
      |prior AS (SELECT t AS cand, CAST(count(*) AS BIGINT) AS nt
      |          FROM init GROUP BY 1),
      |escore AS (
      |  SELECT r.item, l.cand,
      |    CAST(sum(CAST(floor(ln(CAST(coalesce(cv.cnt, 0) + 1 AS DOUBLE) /
      |      (coalesce(ct.tot, 0) + kk.k)) * 1000000.0 + 0.5) AS BIGINT))
      |      AS BIGINT) AS s
      |  FROM ratings r
      |  CROSS JOIN labels l CROSS JOIN kk
      |  LEFT JOIN cwtv cv ON cv.worker = r.worker AND cv.t = l.cand
      |                   AND cv.vote = r.vote
      |  LEFT JOIN cwt ct ON ct.worker = r.worker AND ct.t = l.cand
      |  GROUP BY 1, 2),
      |wprior AS (
      |  SELECT e.item, e.cand,
      |    e.s + CAST(floor(ln(CAST(coalesce(p.nt, 0) + 1 AS DOUBLE) /
      |      (nn.n + kk.k)) * 1000000.0 + 0.5) AS BIGINT) AS s
      |  FROM escore e LEFT JOIN prior p ON p.cand = e.cand, nn, kk),
      |assign1 AS (SELECT item, cand AS t FROM (
      |    SELECT item, cand, row_number() OVER (PARTITION BY item
      |      ORDER BY s DESC, cand ASC) AS rn FROM wprior) WHERE rn = 1)
      |SELECT r.item, a.t AS label, CAST(count(*) AS BIGINT) AS n_votes,
      |       CAST(sum(CASE WHEN r.vote = a.t THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_agree
      |FROM ratings r JOIN assign1 a ON a.item = r.item
      |GROUP BY 1, 2 ORDER BY CAST(r.item AS BIGINT)""".stripMargin) { (s, dir) =>
    val ratings = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        explode(sequence(lit(0), lit(2))).as("r"))
      .where((col("doc_id") + col("r")) % 7 =!= 0)
      .select(col("doc_id").cast("string").as("item"),
        concat(lit("w"), col("r").cast("string")).as("worker"),
        when((col("doc_id") * 3 + col("r")) % 5 < 3, col("lang"))
          .otherwise(lit("en")).as("vote"))
    Preference.dawidSkene(ratings, "item", "worker", "vote", iters = 1)
      .orderBy(col("item").cast("long"))
  }

  // Bradley–Terry strength ranking from pairwise outcomes: adjacent docs
  // of different languages "play a match" won by the longer doc, and 3
  // MM rounds turn the win/match counts into per-language strengths —
  // the preference-aggregation shape of arena-style policy evals. The
  // corpus-sized work is one count pass; the k² MM solve runs on micro
  // longs with per-term floors, unrolled identically in the oracle.
  register(
    "t56_bt_rank",
    """WITH m AS (
      |  SELECT a.lang AS a, b.lang AS b,
      |         CASE WHEN a.n_chars >= b.n_chars THEN a.lang
      |              ELSE b.lang END AS winner
      |  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      |  WHERE a.lang <> b.lang),
      |pc AS (SELECT least(a, b) AS i, greatest(a, b) AS j,
      |              CAST(count(*) AS BIGINT) AS nij
      |       FROM m GROUP BY 1, 2),
      |sym AS (SELECT i AS it, j AS opp, nij FROM pc
      |        UNION ALL SELECT j, i, nij FROM pc),
      |wins AS (SELECT winner AS item, CAST(count(*) AS BIGINT) AS wi
      |         FROM m GROUP BY 1),
      |items AS (SELECT DISTINCT it AS item FROM sym),
      |k AS (SELECT CAST(count(*) AS BIGINT) AS n FROM items),
      |w0 AS (SELECT item, CAST(1000000 AS BIGINT) AS wm FROM items),
      |d1 AS (SELECT s.it AS item,
      |         CAST(sum(CAST(floor(CAST(s.nij AS DOUBLE) * 1000000000000.0 /
      |           (wa.wm + wb.wm) + 0.5) AS BIGINT)) AS BIGINT) AS dm
      |       FROM sym s JOIN w0 wa ON wa.item = s.it
      |                  JOIN w0 wb ON wb.item = s.opp GROUP BY 1),
      |u1 AS (SELECT d1.item,
      |         CAST(floor(CAST(coalesce(w.wi, 0) AS DOUBLE) *
      |           1000000000000.0 / d1.dm + 0.5) AS BIGINT) AS wm
      |       FROM d1 LEFT JOIN wins w ON w.item = d1.item),
      |w1 AS (SELECT item, CAST(floor(CAST(wm AS DOUBLE) * (SELECT n FROM k)
      |         * 1000000.0 / (SELECT sum(wm) FROM u1) + 0.5) AS BIGINT) AS wm
      |       FROM u1),
      |d2 AS (SELECT s.it AS item,
      |         CAST(sum(CAST(floor(CAST(s.nij AS DOUBLE) * 1000000000000.0 /
      |           (wa.wm + wb.wm) + 0.5) AS BIGINT)) AS BIGINT) AS dm
      |       FROM sym s JOIN w1 wa ON wa.item = s.it
      |                  JOIN w1 wb ON wb.item = s.opp GROUP BY 1),
      |u2 AS (SELECT d2.item,
      |         CAST(floor(CAST(coalesce(w.wi, 0) AS DOUBLE) *
      |           1000000000000.0 / d2.dm + 0.5) AS BIGINT) AS wm
      |       FROM d2 LEFT JOIN wins w ON w.item = d2.item),
      |w2 AS (SELECT item, CAST(floor(CAST(wm AS DOUBLE) * (SELECT n FROM k)
      |         * 1000000.0 / (SELECT sum(wm) FROM u2) + 0.5) AS BIGINT) AS wm
      |       FROM u2),
      |d3 AS (SELECT s.it AS item,
      |         CAST(sum(CAST(floor(CAST(s.nij AS DOUBLE) * 1000000000000.0 /
      |           (wa.wm + wb.wm) + 0.5) AS BIGINT)) AS BIGINT) AS dm
      |       FROM sym s JOIN w2 wa ON wa.item = s.it
      |                  JOIN w2 wb ON wb.item = s.opp GROUP BY 1),
      |u3 AS (SELECT d3.item,
      |         CAST(floor(CAST(coalesce(w.wi, 0) AS DOUBLE) *
      |           1000000000000.0 / d3.dm + 0.5) AS BIGINT) AS wm
      |       FROM d3 LEFT JOIN wins w ON w.item = d3.item),
      |w3 AS (SELECT item, CAST(floor(CAST(wm AS DOUBLE) * (SELECT n FROM k)
      |         * 1000000.0 / (SELECT sum(wm) FROM u3) + 0.5) AS BIGINT) AS wm
      |       FROM u3)
      |SELECT item, wm / 1000000.0 AS w,
      |       CAST(row_number() OVER (ORDER BY wm DESC, item) AS BIGINT) AS rnk
      |FROM w3 ORDER BY rnk""".stripMargin) { (s, dir) =>
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val m = d.as("a").join(d.as("b"),
        col("b.doc_id") === col("a.doc_id") + 1)
      .where(col("a.lang") =!= col("b.lang"))
      .select(col("a.lang").as("a"), col("b.lang").as("b"),
        when(col("a.n_chars") >= col("b.n_chars"), col("a.lang"))
          .otherwise(col("b.lang")).as("winner"))
    Preference.btRank(m, "a", "b", "winner", iters = 3)
      .orderBy("rnk")
  }

  // ROUGE-2 over lead-extract summaries: candidate = first-25-token
  // extract (the lead baseline of summarization eval), reference = the
  // full document; every 13th doc's extract is token-reversed (kills
  // bigram overlap, keeps unigrams) and every 19th is empty (null-metric
  // path). Clipped-count P/R/F1 as micro-floored rationals — hash
  // oracle over the full metric row.
  register(
    "t57_rouge2",
    """WITH w AS (
      |  SELECT doc_id AS pair_id,
      |         list_filter(string_split_regex(lower(text), '\s+'),
      |                     x -> x != '') AS toks
      |  FROM documents),
      |p AS (
      |  SELECT pair_id,
      |         CASE WHEN pair_id % 19 = 0 THEN []::VARCHAR[]
      |              WHEN pair_id % 13 = 0 THEN list_reverse(list_slice(toks, 1, 25))
      |              ELSE list_slice(toks, 1, 25) END AS ct,
      |         toks AS rt
      |  FROM w),
      |cg AS (
      |  SELECT pair_id, g, count(*) AS cc FROM (
      |    SELECT pair_id, unnest(list_transform(
      |      generate_series(1, greatest(len(ct) - 1, 0)),
      |      i -> ct[i] || ' ' || ct[i+1])) AS g FROM p) GROUP BY 1, 2),
      |rg AS (
      |  SELECT pair_id, g, count(*) AS rc FROM (
      |    SELECT pair_id, unnest(list_transform(
      |      generate_series(1, greatest(len(rt) - 1, 0)),
      |      i -> rt[i] || ' ' || rt[i+1])) AS g FROM p) GROUP BY 1, 2),
      |m AS (
      |  SELECT c.pair_id, CAST(sum(least(c.cc, r.rc)) AS BIGINT) AS mg
      |  FROM cg c JOIN rg r ON r.pair_id = c.pair_id AND r.g = c.g
      |  GROUP BY 1),
      |agg AS (
      |  SELECT p.pair_id,
      |         CAST(greatest(len(ct) - 1, 0) AS BIGINT) AS cand_grams,
      |         CAST(greatest(len(rt) - 1, 0) AS BIGINT) AS ref_grams,
      |         coalesce(m.mg, 0) AS match_grams
      |  FROM p LEFT JOIN m ON m.pair_id = p.pair_id),
      |micro AS (
      |  SELECT pair_id, cand_grams, ref_grams, match_grams,
      |         CASE WHEN cand_grams > 0 THEN CAST(floor(CAST(match_grams AS
      |           DOUBLE) * 1000000.0 / cand_grams + 0.5) AS BIGINT) END AS pm,
      |         CASE WHEN ref_grams > 0 THEN CAST(floor(CAST(match_grams AS
      |           DOUBLE) * 1000000.0 / ref_grams + 0.5) AS BIGINT) END AS rm
      |  FROM agg)
      |SELECT pair_id, cand_grams, ref_grams, match_grams,
      |       pm / 1000000.0 AS rouge_p, rm / 1000000.0 AS rouge_r,
      |       CASE WHEN pm IS NOT NULL AND rm IS NOT NULL THEN
      |         CASE WHEN pm + rm > 0 THEN
      |           floor(CAST(pm * rm * 2 AS DOUBLE) / (pm + rm) + 0.5)
      |             / 1000000.0
      |         ELSE 0.0 END END AS rouge_f1
      |FROM micro ORDER BY pair_id""".stripMargin) { (s, dir) =>
    val toksCol = TextAnalysis.tokens(lower(col("text")))
    val p = t(s, dir, "documents")
      .select(col("doc_id").as("pair_id"), toksCol.as("toks"))
      .select(col("pair_id"),
        array_join(
          when(col("pair_id") % 19 === 0, array().cast("array<string>"))
            .when(col("pair_id") % 13 === 0, reverse(slice(col("toks"), 1, 25)))
            .otherwise(slice(col("toks"), 1, 25)), " ").as("cand"),
        array_join(col("toks"), " ").as("ref"))
    Eval.rougeN(p, "pair_id", "cand", "ref", n = 2)
      .orderBy("pair_id")
  }

  // BLEU-4 with brevity penalty: candidate = first 30 tokens (reversed
  // for every 11th doc — order destroyed, unigram precision kept),
  // reference = first 40 tokens, so BP = exp(1 - 40/30) is active on
  // every full-length pair. "+1" smoothing on orders 2-4; the geometric
  // mean runs on IEEE-exact sqrt over micro longs in BOTH engines; bp
  // and bleu are the two round-6 columns (ln/exp precedent of t12/t25).
  register(
    "t58_bleu",
    """WITH w AS (
      |  SELECT doc_id AS pair_id,
      |         list_filter(string_split_regex(lower(text), '\s+'),
      |                     x -> x != '') AS toks
      |  FROM documents),
      |p AS (
      |  SELECT pair_id,
      |         CASE WHEN pair_id % 11 = 0
      |              THEN list_reverse(list_slice(toks, 1, 30))
      |              ELSE list_slice(toks, 1, 30) END AS ct,
      |         list_slice(toks, 1, 40) AS rt
      |  FROM w),
      |n4 AS (SELECT unnest([1, 2, 3, 4]) AS n),
      |cg AS (
      |  SELECT pair_id, n, g, count(*) AS cc FROM (
      |    SELECT pair_id, n, unnest(list_transform(
      |      generate_series(1, greatest(len(ct) - n + 1, 0)),
      |      i -> array_to_string(list_slice(ct, i, i + n - 1), ' '))) AS g
      |    FROM p, n4) GROUP BY 1, 2, 3),
      |rg AS (
      |  SELECT pair_id, n, g, count(*) AS rc FROM (
      |    SELECT pair_id, n, unnest(list_transform(
      |      generate_series(1, greatest(len(rt) - n + 1, 0)),
      |      i -> array_to_string(list_slice(rt, i, i + n - 1), ' '))) AS g
      |    FROM p, n4) GROUP BY 1, 2, 3),
      |m AS (
      |  SELECT c.pair_id, c.n, CAST(sum(least(c.cc, r.rc)) AS BIGINT) AS mg
      |  FROM cg c JOIN rg r ON r.pair_id = c.pair_id AND r.n = c.n
      |                     AND r.g = c.g
      |  GROUP BY 1, 2),
      |tot AS (
      |  SELECT pair_id, n,
      |         CAST(greatest(len(ct) - n + 1, 0) AS BIGINT) AS cn,
      |         CAST(greatest(len(rt) - n + 1, 0) AS BIGINT) AS rn
      |  FROM p, n4),
      |pn AS (
      |  SELECT t.pair_id, t.n, t.cn, t.rn, coalesce(m.mg, 0) AS mg
      |  FROM tot t LEFT JOIN m ON m.pair_id = t.pair_id AND m.n = t.n),
      |pm AS (
      |  SELECT pair_id,
      |    max(CASE WHEN n = 1 THEN cn END) AS c1,
      |    max(CASE WHEN n = 1 THEN rn END) AS r1,
      |    max(CASE WHEN n = 1 THEN CASE WHEN cn > 0 THEN
      |      CAST(floor(CAST(mg AS DOUBLE) * 1000000.0 / cn + 0.5) AS BIGINT)
      |      ELSE 0 END END) AS p1m,
      |    max(CASE WHEN n = 2 THEN CAST(floor(CAST(mg + 1 AS DOUBLE)
      |      * 1000000.0 / (cn + 1) + 0.5) AS BIGINT) END) AS p2m,
      |    max(CASE WHEN n = 3 THEN CAST(floor(CAST(mg + 1 AS DOUBLE)
      |      * 1000000.0 / (cn + 1) + 0.5) AS BIGINT) END) AS p3m,
      |    max(CASE WHEN n = 4 THEN CAST(floor(CAST(mg + 1 AS DOUBLE)
      |      * 1000000.0 / (cn + 1) + 0.5) AS BIGINT) END) AS p4m
      |  FROM pn GROUP BY 1)
      |SELECT pair_id, c1 AS cand_len, r1 AS ref_len,
      |       p1m / 1000000.0 AS p1, p2m / 1000000.0 AS p2,
      |       p3m / 1000000.0 AS p3, p4m / 1000000.0 AS p4,
      |       round(CASE WHEN c1 = 0 THEN 0.0 WHEN c1 >= r1 THEN 1.0
      |             ELSE exp(1.0 - CAST(r1 AS DOUBLE) / c1) END, 6) AS bp,
      |       CASE WHEN c1 > 0 THEN round(
      |         (CASE WHEN c1 = 0 THEN 0.0 WHEN c1 >= r1 THEN 1.0
      |               ELSE exp(1.0 - CAST(r1 AS DOUBLE) / c1) END) *
      |         sqrt(sqrt(CAST(p1m * p2m AS DOUBLE)) *
      |              sqrt(CAST(p3m * p4m AS DOUBLE))) / 1000000.0, 6)
      |       ELSE 0.0 END AS bleu
      |FROM pm ORDER BY pair_id""".stripMargin) { (s, dir) =>
    val toksCol = TextAnalysis.tokens(lower(col("text")))
    val p = t(s, dir, "documents")
      .select(col("doc_id").as("pair_id"), toksCol.as("toks"))
      .select(col("pair_id"),
        array_join(
          when(col("pair_id") % 11 === 0, reverse(slice(col("toks"), 1, 30)))
            .otherwise(slice(col("toks"), 1, 30)), " ").as("cand"),
        array_join(slice(col("toks"), 1, 40), " ").as("ref"))
    Eval.bleu(p, "pair_id", "cand", "ref")
      .orderBy("pair_id")
  }

  // ROUGE-L via the codegen'd LCS expression, on a PLANTED construction
  // whose LCS is analytic (the d2c planted-twin pattern): the candidate
  // is a kept-subsequence of the reference interleaved with md5 noise
  // tokens (proven absent from the corpus vocabulary — no token matches
  // ^[0-9a-f]{32}$ at any SF), so LCS = |kept| exactly; the doubled
  // branch gives LCS = |ref|, the empty branch 0. The oracle computes
  // the analytic values; EvalSpec proves the DP against a reference
  // implementation on randomized inputs.
  register(
    "t61_rouge_l_planted",
    """WITH w AS (
      |  SELECT doc_id AS pair_id,
      |         list_filter(string_split_regex(lower(text), '\s+'),
      |                     x -> x != '') AS toks
      |  FROM documents),
      |b AS (SELECT pair_id, list_slice(toks, 1, 40) AS rt FROM w),
      |k AS (SELECT pair_id, rt,
      |             list_filter(rt, (x, i) -> i % 3 != 0) AS kept FROM b),
      |a AS (
      |  SELECT pair_id, CAST(len(rt) AS BIGINT) AS ref_len,
      |         CASE WHEN pair_id % 7 = 0 THEN CAST(0 AS BIGINT)
      |              WHEN pair_id % 5 = 0 THEN CAST(2 * len(rt) AS BIGINT)
      |              ELSE CAST(len(kept) + 2 AS BIGINT) END AS cand_len,
      |         CASE WHEN pair_id % 7 = 0 THEN CAST(0 AS BIGINT)
      |              WHEN pair_id % 5 = 0 THEN CAST(len(rt) AS BIGINT)
      |              ELSE CAST(len(kept) AS BIGINT) END AS lcs
      |  FROM k),
      |micro AS (
      |  SELECT pair_id, cand_len, ref_len, lcs,
      |         CASE WHEN cand_len > 0 THEN CAST(floor(CAST(lcs AS DOUBLE)
      |           * 1000000.0 / cand_len + 0.5) AS BIGINT) END AS pm,
      |         CASE WHEN ref_len > 0 THEN CAST(floor(CAST(lcs AS DOUBLE)
      |           * 1000000.0 / ref_len + 0.5) AS BIGINT) END AS rm
      |  FROM a)
      |SELECT pair_id, cand_len, ref_len, lcs,
      |       pm / 1000000.0 AS rouge_p, rm / 1000000.0 AS rouge_r,
      |       CASE WHEN pm IS NOT NULL AND rm IS NOT NULL THEN
      |         CASE WHEN pm + rm > 0 THEN
      |           floor(CAST(pm * rm * 2 AS DOUBLE) / (pm + rm) + 0.5)
      |             / 1000000.0
      |         ELSE 0.0 END END AS rouge_f1
      |FROM micro ORDER BY pair_id""".stripMargin) { (s, dir) =>
    val toksCol = TextAnalysis.tokens(lower(col("text")))
    val k = t(s, dir, "documents")
      .select(col("doc_id").as("pair_id"), slice(toksCol, 1, 40).as("rt"))
      .select(col("pair_id"), col("rt"),
        filter(col("rt"), (_, i) => (i + 1) % 3 =!= 0).as("kept"))
    val noise = md5(col("pair_id").cast("string"))
    val candArr = when(col("pair_id") % 7 === 0,
        array().cast("array<string>"))
      .when(col("pair_id") % 5 === 0, concat(col("rt"), col("rt")))
      .otherwise(concat(array(noise), slice(col("kept"), 1, 10),
        array(noise),
        slice(col("kept"), lit(11), greatest(size(col("kept")) - 10, lit(0)))))
    val p = k.select(col("pair_id"), array_join(candArr, " ").as("cand"),
      array_join(col("rt"), " ").as("ref"))
    Eval.rougeL(p, "pair_id", "cand", "ref").orderBy("pair_id")
  }

  // Chat-template rendering with loss-mask spans: events become ordered
  // conversation turns (the t53 role assignment), each rendered as
  // <|role|>\ncontent<|end|>\n; assistant spans emit as 0-based
  // "start:end;…" char offsets (null when a conversation has no
  // assistant turn). Hash oracle over the FULL rendered text and the
  // span string — any off-by-one in the offsets breaks the hash.
  register(
    "t59_chat_template",
    """WITH r AS (
      |  SELECT user_id AS conv_id,
      |         CASE WHEN event_type IN ('purchase', 'signup') THEN 'user'
      |              ELSE 'assistant' END AS role,
      |         event_type || '#' || CAST(event_id AS VARCHAR) AS content,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY epoch_us(ts), event_id) AS rn
      |  FROM events),
      |p AS (
      |  SELECT conv_id, rn, role,
      |         '<|' || role || '|>' || chr(10) || content || '<|end|>' ||
      |           chr(10) AS part
      |  FROM r),
      |o AS (
      |  SELECT conv_id, rn, role, part,
      |         CAST(coalesce(sum(len(part)) OVER (PARTITION BY conv_id
      |           ORDER BY rn ROWS BETWEEN UNBOUNDED PRECEDING AND 1
      |           PRECEDING), 0) AS BIGINT) AS st
      |  FROM p)
      |SELECT conv_id,
      |       CAST(count(*) AS BIGINT) AS n_turns,
      |       CAST(sum(len(part)) AS BIGINT) AS n_chars,
      |       string_agg(part, '' ORDER BY rn) AS text,
      |       string_agg(CASE WHEN role = 'assistant' THEN
      |         CAST(st + len(role) + 5 AS VARCHAR) || ':' ||
      |         CAST(st + len(part) AS VARCHAR) END, ';' ORDER BY rn)
      |         AS assistant_spans,
      |       CAST(coalesce(sum(CASE WHEN role = 'assistant'
      |         THEN len(part) - len(role) - 5 END), 0) AS BIGINT)
      |         AS assistant_chars
      |FROM o GROUP BY conv_id ORDER BY conv_id""".stripMargin) { (s, dir) =>
    graft.operators.Behavior.renderChatTemplate(t(s, dir, "events"),
        "user_id", "ts",
        when(col("event_type").isin("purchase", "signup"), "user")
          .otherwise("assistant"),
        concat(col("event_type"), lit("#"), col("event_id").cast("string")),
        "event_id")
      .orderBy("conv_id")
  }

  // Reliability diagram + ECE over a synthetic miscalibrated classifier:
  // conf cycles 0.00-1.00, outcomes land at ~0.8x the stated confidence
  // (systematic overconfidence), so every bin carries a real gap and the
  // ECE is material. Confidences micro-quantize scan-side before any
  // sum, so the whole report is exact integer arithmetic — hash oracle.
  register(
    "t60_calibration_ece",
    """WITH s AS (
      |  SELECT CAST((doc_id * 37) % 101 AS DOUBLE) / 100.0 AS conf,
      |         CASE WHEN (doc_id * 53) % 100 <
      |                   ((doc_id * 37) % 101) * 0.8
      |              THEN 1 ELSE 0 END AS y
      |  FROM documents),
      |m AS (SELECT CAST(floor(conf * 1000000.0 + 0.5) AS BIGINT) AS cm, y
      |      FROM s),
      |b AS (SELECT least(CAST(floor(CAST(cm * 10 AS DOUBLE) / 1000000.0)
      |        AS BIGINT), 9) AS bin, cm, y FROM m),
      |g AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
      |             CAST(sum(cm) AS BIGINT) AS cs,
      |             CAST(sum(y) AS BIGINT) AS ys
      |      FROM b GROUP BY 1),
      |mm AS (SELECT bin, n,
      |         CAST(floor(CAST(cs AS DOUBLE) / n + 0.5) AS BIGINT)
      |           AS confm,
      |         CAST(floor(CAST(ys AS DOUBLE) * 1000000.0 / n + 0.5)
      |           AS BIGINT) AS accm
      |       FROM g),
      |gg AS (SELECT bin, n, confm, accm, abs(accm - confm) AS gap FROM mm),
      |e AS (SELECT CAST(floor(CAST(sum(n * gap) AS DOUBLE) / sum(n) + 0.5)
      |        AS BIGINT) AS ecem FROM gg)
      |SELECT bin, n, confm / 1000000.0 AS avg_conf,
      |       accm / 1000000.0 AS accuracy, gap / 1000000.0 AS gap,
      |       ecem / 1000000.0 AS ece
      |FROM gg, e ORDER BY bin""".stripMargin) { (s, dir) =>
    val scored = t(s, dir, "documents").select(
      (((col("doc_id") * 37) % 101).cast("double") / 100.0).as("conf"),
      when((col("doc_id") * 53) % 100 <
        ((col("doc_id") * 37) % 101) * 0.8, 1).otherwise(0).as("y"))
    Eval.calibrationReport(scored, "conf", "y", bins = 10)
      .orderBy("bin")
  }

  // URL canonicalization — the dedup-key normalizer of web-corpus
  // pipelines. One synthetic URL per doc cycles through the adversarial
  // branches (default port + www + tracking params + unsorted query +
  // fragment + trailing slash; http:80; a kept non-default port;
  // non-URL passthrough), and both engines apply the IDENTICAL
  // RE2-compatible regex/list pipeline — hash oracle on the canonical
  // strings themselves.
  register(
    "t52_url_canonicalize",
    """WITH raw AS (
      |  SELECT doc_id, CASE CAST(doc_id % 4 AS INT)
      |    WHEN 0 THEN 'HTTPS://WWW.Example' || (doc_id % 7) || '.com:443/Path'
      |                || (doc_id % 5) || '/?utm_source=x&b=2&a=1&fbclid=z#frag'
      |    WHEN 1 THEN 'http://Site' || (doc_id % 7) || '.org:80/a'
      |    WHEN 2 THEN 'http://site' || (doc_id % 7) || '.org:8080/a?z=1&y=2'
      |    ELSE 'not a url ' || doc_id END AS url
      |  FROM documents),
      |s1 AS (SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS nofrag
      |       FROM raw),
      |s2 AS (SELECT *,
      |         lower(regexp_extract(nofrag,
      |           '^([a-zA-Z][a-zA-Z0-9+.-]*)://.*$', 1)) AS scheme,
      |         lower(regexp_extract(nofrag, '^[^:]+://([^/?]*).*', 1)) AS auth0,
      |         regexp_extract(nofrag, '^[^:]+://[^/?]*(.*)', 1) AS rest
      |       FROM s1),
      |s3 AS (SELECT *, regexp_replace(auth0, '^www\.', '') AS auth1 FROM s2),
      |s4 AS (SELECT *,
      |         CASE WHEN scheme = 'http' THEN regexp_replace(auth1, ':80$', '')
      |              WHEN scheme = 'https' THEN regexp_replace(auth1, ':443$', '')
      |              ELSE auth1 END AS host,
      |         regexp_extract(rest, '^([^?]*)', 1) AS path0,
      |         regexp_extract(rest, '\?(.*)$', 1) AS query
      |       FROM s3),
      |s5 AS (SELECT *,
      |         CASE WHEN len(path0) > 1 THEN regexp_replace(path0, '/$', '')
      |              ELSE path0 END AS path,
      |         array_to_string(list_sort(list_filter(string_split(query, '&'),
      |           p -> p != '' AND NOT regexp_matches(p,
      |             '^(utm_[^=]*|gclid|fbclid)(=|$)'))), '&') AS joined
      |       FROM s4)
      |SELECT doc_id, url,
      |       CASE WHEN scheme = '' THEN url
      |            ELSE scheme || '://' || host || path ||
      |                 CASE WHEN len(joined) > 0 THEN '?' || joined
      |                      ELSE '' END END AS canon
      |FROM s5 ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val raw = t(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 4 === 0,
        concat(lit("HTTPS://WWW.Example"), col("doc_id") % 7,
          lit(".com:443/Path"), col("doc_id") % 5,
          lit("/?utm_source=x&b=2&a=1&fbclid=z#frag")))
        .when(col("doc_id") % 4 === 1,
          concat(lit("http://Site"), col("doc_id") % 7, lit(".org:80/a")))
        .when(col("doc_id") % 4 === 2,
          concat(lit("http://site"), col("doc_id") % 7,
            lit(".org:8080/a?z=1&y=2")))
        .otherwise(concat(lit("not a url "), col("doc_id"))).as("url"))
    raw.select(col("doc_id"), col("url"),
        TextAnalysis.canonicalizeUrl(col("url")).as("canon"))
      .orderBy("doc_id")
  }

  // URL-keyed dedup — canonicalize, group, keep the smallest doc_id: the
  // first dedup tier of every web-corpus pipeline (crawls re-fetch the
  // same page under www/port/tracking-param/fragment noise). The
  // construction plants exactly that noise: doc_id % 50 picks the true
  // page, doc_id % 4 the noise variant, so each canonical key collapses
  // ~10 fetches to one keeper. Hash oracle over (doc_id, canon, keep).
  register(
    "d19_url_dedup",
    """WITH raw AS (
      |  SELECT doc_id,
      |    CASE CAST(doc_id % 4 AS INT)
      |      WHEN 0 THEN 'https://www.site' || (doc_id % 50) || '.com/page/'
      |      WHEN 1 THEN 'HTTPS://Site' || (doc_id % 50) || '.com:443/page'
      |      WHEN 2 THEN 'https://site' || (doc_id % 50) || '.com/page?utm_k=9'
      |      ELSE 'https://site' || (doc_id % 50) || '.com/page#sec2' END AS url
      |  FROM documents),
      |s1 AS (SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS nofrag
      |       FROM raw),
      |s2 AS (SELECT *,
      |         lower(regexp_extract(nofrag,
      |           '^([a-zA-Z][a-zA-Z0-9+.-]*)://.*$', 1)) AS scheme,
      |         lower(regexp_extract(nofrag, '^[^:]+://([^/?]*).*', 1)) AS auth0,
      |         regexp_extract(nofrag, '^[^:]+://[^/?]*(.*)', 1) AS rest
      |       FROM s1),
      |s3 AS (SELECT *, regexp_replace(auth0, '^www\.', '') AS auth1 FROM s2),
      |s4 AS (SELECT *,
      |         CASE WHEN scheme = 'http' THEN regexp_replace(auth1, ':80$', '')
      |              WHEN scheme = 'https' THEN regexp_replace(auth1, ':443$', '')
      |              ELSE auth1 END AS host,
      |         regexp_extract(rest, '^([^?]*)', 1) AS path0,
      |         regexp_extract(rest, '\?(.*)$', 1) AS query
      |       FROM s3),
      |s5 AS (SELECT *,
      |         CASE WHEN len(path0) > 1 THEN regexp_replace(path0, '/$', '')
      |              ELSE path0 END AS path,
      |         array_to_string(list_sort(list_filter(string_split(query, '&'),
      |           p -> p != '' AND NOT regexp_matches(p,
      |             '^(utm_[^=]*|gclid|fbclid)(=|$)'))), '&') AS joined
      |       FROM s4),
      |c AS (SELECT doc_id,
      |        CASE WHEN scheme = '' THEN url
      |             ELSE scheme || '://' || host || path ||
      |                  CASE WHEN len(joined) > 0 THEN '?' || joined
      |                       ELSE '' END END AS canon
      |      FROM s5)
      |SELECT doc_id, canon,
      |       doc_id = min(doc_id) OVER (PARTITION BY canon) AS keep
      |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val raw = t(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 4 === 0,
        concat(lit("https://www.site"), col("doc_id") % 50, lit(".com/page/")))
        .when(col("doc_id") % 4 === 1,
          concat(lit("HTTPS://Site"), col("doc_id") % 50, lit(".com:443/page")))
        .when(col("doc_id") % 4 === 2,
          concat(lit("https://site"), col("doc_id") % 50,
            lit(".com/page?utm_k=9")))
        .otherwise(concat(lit("https://site"), col("doc_id") % 50,
          lit(".com/page#sec2"))).as("url"))
    val canon = raw.select(col("doc_id"),
      TextAnalysis.canonicalizeUrl(col("url")).as("canon"))
    canon.withColumn("keep",
        col("doc_id") === min(col("doc_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("canon")))
      .orderBy("doc_id")
  }

  // Variable-length exact-substring dedup (Lee et al. 2022 suffix-array
  // semantics, relational form): flag every token inside a >= 8-token
  // substring occurring >= 2 times corpus-wide, at ANY offset and ANY
  // length — the tier d8's fixed chunk grid cannot express. The oracle
  // recomputes the IDENTICAL algebra (positional md5 8-gram anchors →
  // global repeat filter → per-doc interval union), so the organic run
  // is hash-proven END-TO-END; d20b proves the extension boundaries
  // analytically. Both engines zip two equal-length unnests / one
  // posexplode — integer positions and md5 strings only.
  register(
    "d20_repeated_substrings",
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS t
      |  FROM documents),
      |g AS (
      |  SELECT doc_id,
      |         CAST(unnest(range(1, greatest(len(t) - 6, 1))) AS BIGINT) - 1 AS pos,
      |         unnest(list_transform(range(1, greatest(len(t) - 6, 1)),
      |           i -> md5(array_to_string(t[i:i+7], ' ')))) AS gh
      |  FROM toks),
      |rep AS (SELECT gh FROM g GROUP BY gh HAVING count(*) >= 2),
      |cov AS (SELECT g.doc_id, g.pos, g.pos + 7 AS e FROM g JOIN rep USING (gh)),
      |m AS (SELECT doc_id, pos, e,
      |        max(e) OVER (PARTITION BY doc_id ORDER BY pos
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      |      FROM cov),
      |f AS (SELECT doc_id, pos, e,
      |        CASE WHEN pm IS NULL OR pos > pm + 1 THEN 1 ELSE 0 END AS nw
      |      FROM m),
      |gr AS (SELECT doc_id, pos, e,
      |         sum(nw) OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM f),
      |sp AS (SELECT doc_id, min(pos) AS s, max(e) AS e2
      |       FROM gr GROUP BY doc_id, grp),
      |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
      |          CAST(sum(e2 - s + 1) AS BIGINT) AS dup_tokens,
      |          string_agg(s || ':' || e2, ';' ORDER BY s) AS dup_spans
      |        FROM sp GROUP BY doc_id)
      |SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
      |       coalesce(a.n_dup_spans, CAST(0 AS BIGINT)) AS n_dup_spans,
      |       coalesce(a.dup_tokens, CAST(0 AS BIGINT)) AS dup_tokens,
      |       coalesce(a.dup_spans, '') AS dup_spans
      |FROM toks t LEFT JOIN agg a USING (doc_id)
      |ORDER BY t.doc_id""".stripMargin) { (s, dir) =>
    Dedup.repeatedSubstringSpans(t(s, dir, "documents"), "text", "doc_id",
      minLen = 8)
      .withColumn("dup_spans", coalesce(col("dup_spans"), lit("")))
      .orderBy("doc_id")
  }

  // Planted twin with ANALYTIC extension boundaries: 60 docs of globally
  // unique filler tokens d{i}t{j} share one 24-token block blk0..blk23,
  // inserted at token offset 10 (even ids) or 17 (odd) — the offset-
  // by-anything case d8's aligned chunks miss by construction. With
  // minLen=8 the repeated 8-gram starts are exactly o..o+16, whose
  // interval union is the single maximal span [o, o+23]: grams
  // straddling a block edge carry doc-unique filler, so extension
  // provably stops at the block boundary. The oracle is the closed
  // form — 64 tokens, one span of 24, '10:33' / '17:40'.
  register(
    "d20b_repeated_substrings_planted",
    """SELECT CAST(i AS BIGINT) AS doc_id, CAST(64 AS BIGINT) AS n_tokens,
      |       CAST(1 AS BIGINT) AS n_dup_spans, CAST(24 AS BIGINT) AS dup_tokens,
      |       CASE WHEN i % 2 = 0 THEN '10:33' ELSE '17:40' END AS dup_spans
      |FROM (SELECT unnest(range(0, 60)) AS i) ORDER BY doc_id""".stripMargin) {
    (s, dir) =>
      val off = when(col("i") % 2 === 0, lit(10)).otherwise(lit(17))
      val uniq = (j: Column) =>
        concat(lit("d"), col("i"), lit("t"), j)
      val planted = s.range(60).select(col("id").as("i"))
        .select(col("i").as("doc_id"),
          array_join(concat(
            transform(sequence(lit(0), off - 1), j => uniq(j)),
            transform(sequence(lit(0), lit(23)), j => concat(lit("blk"), j)),
            transform(sequence(off, lit(39)), j => uniq(j))), " ").as("text"))
      Dedup.repeatedSubstringSpans(planted, "text", "doc_id", minLen = 8)
        .withColumn("dup_spans", coalesce(col("dup_spans"), lit("")))
        .orderBy("doc_id")
  }

  // Character-entropy quality signal: gibberish and encoded blobs sit
  // outside natural text's entropy band. Order-free fixed-point term
  // summation (floor(p·ln p·1e9 + 0.5) integer sums) makes the value
  // partitioning- and engine-exact — hash oracle.
  register(
    "t51_char_entropy",
    """WITH ch AS (
      |  SELECT doc_id, unnest(string_split(lower(text), '')) AS ch
      |  FROM documents),
      |c AS (SELECT doc_id, ch, count(*) AS c FROM ch
      |      WHERE ch != '' GROUP BY doc_id, ch),
      |tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
      |               CAST(count(*) AS BIGINT) AS k
      |        FROM c GROUP BY doc_id),
      |u AS (SELECT c.doc_id, tot.n, tot.k,
      |             CAST(floor((CAST(c.c AS DOUBLE) / tot.n) *
      |                        ln(CAST(c.c AS DOUBLE) / tot.n) *
      |                        1000000000.0 + 0.5) AS BIGINT) AS u
      |      FROM c JOIN tot USING (doc_id)),
      |s AS (SELECT doc_id, max(n) AS n_chars, max(k) AS distinct_chars,
      |             round(-CAST(sum(u) AS DOUBLE) / 1000000000.0, 6)
      |               AS entropy_nats
      |      FROM u GROUP BY doc_id)
      |SELECT d.doc_id,
      |       coalesce(s.n_chars, 0) AS n_chars,
      |       coalesce(s.distinct_chars, 0) AS distinct_chars,
      |       coalesce(s.entropy_nats, 0.0) AS entropy_nats
      |FROM (SELECT DISTINCT doc_id FROM documents) d
      |LEFT JOIN s USING (doc_id)
      |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.charEntropy(t(s, dir, "documents"), "text", "doc_id")
      .orderBy("doc_id")
  }

  // Surgical span decontamination: benchmark snippets = the first five
  // tokens of every doc_id % 97 == 0 document, so hits exist by
  // construction (those docs lose their opening span; any other doc
  // sharing a 5-gram is cleaned too) while most of the corpus passes
  // untouched. Exact set logic over positional grams -> hash oracle,
  // including the reassembled clean_text bytes.
  register(
    "t49_surgical_decontaminate",
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
      |                             x -> x != '') AS toks
      |  FROM documents),
      |sg AS (
      |  SELECT DISTINCT md5(array_to_string(toks[1 : 5], ' ')) AS gram_key
      |  FROM t WHERE doc_id % 97 = 0 AND len(toks) >= 5),
      |d AS (
      |  SELECT doc_id, toks,
      |         CASE WHEN len(toks) >= 5 THEN
      |           list_transform(range(1, len(toks) - 5 + 2),
      |                          s -> md5(array_to_string(toks[s : s + 4], ' ')))
      |         ELSE [] END AS gkeys
      |  FROM t),
      |starts AS (
      |  SELECT doc_id, generate_subscripts(gkeys, 1) AS s,
      |         unnest(gkeys) AS gram_key
      |  FROM d),
      |covered AS (
      |  SELECT DISTINCT starts.doc_id, starts.s + o.off AS pos
      |  FROM starts JOIN sg USING (gram_key)
      |  CROSS JOIN (SELECT unnest(range(0, 5)) AS off) o),
      |dt AS (SELECT doc_id, unnest(toks) AS tok,
      |              generate_subscripts(toks, 1) AS pos
      |       FROM t),
      |kept AS (
      |  SELECT dt.doc_id, dt.tok, dt.pos FROM dt
      |  ANTI JOIN covered ON covered.doc_id = dt.doc_id
      |                   AND covered.pos = dt.pos),
      |agg AS (
      |  SELECT doc_id, array_to_string(list(tok ORDER BY pos), ' ') AS clean_text,
      |         count(*) AS n_kept
      |  FROM kept GROUP BY doc_id)
      |SELECT t.doc_id, coalesce(agg.clean_text, '') AS clean_text,
      |       CAST(len(t.toks) AS BIGINT) AS n_tokens,
      |       CAST(len(t.toks) - coalesce(agg.n_kept, 0) AS BIGINT) AS n_removed
      |FROM t LEFT JOIN agg USING (doc_id)
      |ORDER BY t.doc_id""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val snippets = docs.where(col("doc_id") % 97 === 0)
      .select(concat_ws(" ",
        slice(TextAnalysis.tokens(lower(col("text"))), 1, 5)).as("snip"))
    TextAnalysis.removeContaminatedSpans(docs, "text", "doc_id",
        snippets, "snip", n = 5)
      .orderBy("doc_id")
  }

  // Temperature-scaled source sampling (the multilingual "sampling
  // temperature": p_s ∝ n_s^alpha flattens the source distribution so
  // low-resource sources are not drowned; alpha = 0.5 here — sqrt is
  // correctly-rounded IEEE, so unlike pow() it is bit-identical across
  // engines). Weights lift to integer micro-units before the normalizing
  // sum (exact under any partitioning), making the probabilities and the
  // per-source token allocation for a 1M-token epoch one fixed double
  // expression over exact integers — hash oracle.
  register(
    "t47_temperature_mix",
    """WITH c AS (
      |  SELECT source,
      |         CAST(sum(len(list_filter(string_split_regex(lower(text), '\s+'),
      |                                  x -> x != ''))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY source),
      |w AS (SELECT source, n_tokens,
      |             CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000 + 0.5)
      |               AS BIGINT) AS wu
      |      FROM c),
      |tot AS (SELECT CAST(sum(wu) AS BIGINT) AS wt FROM w)
      |SELECT source, n_tokens,
      |       round(CAST(wu AS DOUBLE) / wt, 6) AS p_temp,
      |       CAST(floor(CAST(wu AS DOUBLE) / wt * 1000000 + 0.5) AS BIGINT)
      |         AS epoch_tokens
      |FROM w CROSS JOIN tot ORDER BY source""".stripMargin) { (s, dir) =>
    val counts = t(s, dir, "documents")
      .groupBy("source")
      .agg(sum(size(TextAnalysis.tokens(lower(col("text")))))
        .cast("long").as("n_tokens"))
      .withColumn("wu",
        floor(sqrt(col("n_tokens").cast("double")) * 1000000 + 0.5).cast("long"))
    counts.crossJoin(broadcast(counts.agg(sum(col("wu")).cast("long").as("wt"))))
      .select(col("source"), col("n_tokens"),
        round(col("wu").cast("double") / col("wt"), 6).as("p_temp"),
        floor(col("wu").cast("double") / col("wt") * 1000000 + 0.5)
          .cast("long").as("epoch_tokens"))
      .orderBy("source")
  }

  // Padding-waste audit for length-bucketed batching: each document
  // rounds up to the smallest bucket that holds it (cap-truncated at the
  // top bucket), and the per-bucket padded-token overhead is what the
  // batching scheme wastes — the statistic that picks bucket boundaries.
  // Exact integer token counts -> hash oracle.
  register(
    "t48_padding_waste",
    """WITH d AS (
      |  SELECT doc_id,
      |         len(list_filter(string_split_regex(lower(text), '\s+'),
      |                         x -> x != '')) AS n
      |  FROM documents),
      |b AS (SELECT doc_id, least(n, 1024) AS eff,
      |             CASE WHEN n <= 64 THEN 64 WHEN n <= 128 THEN 128
      |                  WHEN n <= 256 THEN 256 WHEN n <= 512 THEN 512
      |                  ELSE 1024 END AS bucket
      |      FROM d)
      |SELECT CAST(bucket AS BIGINT) AS bucket,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(eff) AS BIGINT) AS real_tokens,
      |       CAST(sum(bucket - eff) AS BIGINT) AS pad_tokens,
      |       round(CAST(sum(bucket - eff) AS DOUBLE) /
      |             (CAST(count(*) AS BIGINT) * bucket), 6) AS waste_ratio
      |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, dir) =>
    val d = t(s, dir, "documents")
      .select(col("doc_id"),
        size(TextAnalysis.tokens(lower(col("text")))).as("n"))
    val b = d.select(col("doc_id"), least(col("n"), lit(1024)).as("eff"),
      when(col("n") <= 64, 64).when(col("n") <= 128, 128)
        .when(col("n") <= 256, 256).when(col("n") <= 512, 512)
        .otherwise(1024).as("bucket"))
    b.groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("eff")).cast("long").as("real_tokens"),
        sum(col("bucket") - col("eff")).cast("long").as("pad_tokens"))
      .select(col("bucket").cast("long").as("bucket"), col("n_docs"),
        col("real_tokens"), col("pad_tokens"),
        round(col("pad_tokens").cast("double") /
          (col("n_docs") * col("bucket")), 6).as("waste_ratio"))
      .orderBy("bucket")
  }

  // Tokenizer APPLICATION over the realistic corpus: learn 8 merges, then
  // count per-document BPE tokens under the learned table — the
  // token-budget statistic (learn → encode is the full tokenizer loop).
  // No SQL oracle (the table comes from the iterative loop); t45b is the
  // planted hash twin, BpeSpec pins the encode algebra.
  registerNoOracle("t45_bpe_encode") { (s, dir) =>
    val docs = t(s, dir, "documents")
    val rules = TextAnalysis.bpeLearn(docs, "text", merges = 8)
    TextAnalysis.bpeTokenCounts(docs, "text", "doc_id", rules)
      .orderBy("doc_id")
  }

  // Encode planted twin: the t44b corpus (abab/abc/bc by doc_id % 3)
  // under the FIXED table [(a,b), (ab,ab)] has an analytic encoding —
  // abab -> [abab] (both rules fire), abc -> [ab, c], bc -> [b, c] — so
  // the vocabulary-encode + join-back + per-doc rollup machinery gets an
  // exact hash oracle.
  register(
    "t45b_bpe_encode_planted",
    """SELECT doc_id, CAST(1 AS BIGINT) AS n_words,
      |       CAST(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 2 END AS BIGINT)
      |         AS n_tokens
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val planted = t(s, dir, "documents").select(col("doc_id"),
      when(col("doc_id") % 3 === 0, "abab")
        .when(col("doc_id") % 3 === 1, "abc")
        .otherwise("bc").as("text"))
    val spark = s
    import spark.implicits._
    val rules = Seq((1L, "a", "b"), (2L, "ab", "ab"))
      .toDF("rank", "lhs", "rhs")
    TextAnalysis.bpeTokenCounts(planted, "text", "doc_id", rules)
      .orderBy("doc_id")
  }

  // DSIR importance weights: log p_target − log p_raw under unigram LMs;
  // target LM = the src0/src1 slice, raw LM = the whole corpus.
  register(
    "t22_dsir_weights",
    """WITH toks AS (
      |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                                    x -> x != '')) AS tok
      |  FROM documents),
      |ttoks AS (
      |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                            x -> x != '')) AS tok
      |  FROM documents WHERE source IN ('src0', 'src1')),
      |rf AS (SELECT tok, count(*) AS nr FROM toks GROUP BY tok),
      |tf AS (SELECT tok, count(*) AS nt FROM ttoks GROUP BY tok),
      |tot AS (SELECT (SELECT CAST(sum(nr) AS DOUBLE) FROM rf) AS totr,
      |               (SELECT CAST(sum(nt) AS DOUBLE) FROM tf) AS tott),
      |dc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok)
      |SELECT dc.doc_id, CAST(sum(dc.c) AS BIGINT) AS n_tokens,
      |       round(sum(dc.c * (ln(coalesce(CAST(tf.nt AS DOUBLE), 0.5) / tot.tott)
      |                       - ln(coalesce(CAST(rf.nr AS DOUBLE), 0.5) / tot.totr))),
      |             6) AS log_weight
      |FROM dc LEFT JOIN rf USING (tok) LEFT JOIN tf USING (tok), tot
      |GROUP BY dc.doc_id ORDER BY dc.doc_id""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    TextAnalysis.dsirWeights(docs, "text", "doc_id",
      target = docs.where(col("source").isin("src0", "src1")))
      .orderBy("doc_id")
  }

  // Vocabulary drift audit: top-30 tokens by pointwise KL contribution
  // between two source cohorts — every value per-term arithmetic, so the
  // report hash-matches (no cross-term float sums).
  register(
    "t24_vocab_drift",
    """WITH ta AS (
      |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                            x -> x != '')) AS tok
      |  FROM documents WHERE source IN ('src0','src1','src2','src3','src4')),
      |tb AS (
      |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                            x -> x != '')) AS tok
      |  FROM documents
      |  WHERE source NOT IN ('src0','src1','src2','src3','src4')),
      |fa AS (SELECT tok, count(*) AS n_a FROM ta GROUP BY tok),
      |fb AS (SELECT tok, count(*) AS n_b FROM tb GROUP BY tok),
      |tot AS (SELECT (SELECT CAST(sum(n_a) AS DOUBLE) FROM fa) AS tta,
      |               (SELECT CAST(sum(n_b) AS DOUBLE) FROM fb) AS ttb)
      |SELECT fa.tok, fa.n_a, coalesce(fb.n_b, 0) AS n_b,
      |       round((fa.n_a / tot.tta) * ln((fa.n_a / tot.tta) /
      |             (coalesce(CAST(fb.n_b AS DOUBLE), 0.5) / tot.ttb)), 9)
      |         AS kl_contrib
      |FROM fa LEFT JOIN fb USING (tok), tot
      |ORDER BY kl_contrib DESC, tok ASC LIMIT 30""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val aSrc = Seq("src0", "src1", "src2", "src3", "src4")
    TextAnalysis.vocabDriftTopK(
      docs.where(col("source").isin(aSrc: _*)),
      docs.where(!col("source").isin(aSrc: _*)),
      "text", k = 30)
  }

  // Bigram-LM surprisal with stupid backoff: LM trained on the src0 slice
  // only, scoring the whole corpus — cross-source bigrams genuinely miss,
  // so the backoff leg (0.4 · p_unigram, OOV-floored) is exercised for
  // real, not just reachable.
  register(
    "t25_bigram_surprisal",
    """WITH w AS (
      |  SELECT doc_id, source,
      |         list_filter(string_split_regex(lower(text), '\s+'),
      |                     x -> x != '') AS toks
      |  FROM documents),
      |refw AS (SELECT toks FROM w WHERE source = 'src0' AND len(toks) >= 2),
      |refbg AS (
      |  SELECT bg.w1 AS w1, bg.w2 AS w2, count(*) AS nb FROM (
      |    SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
      |      i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS bg
      |    FROM refw) GROUP BY 1, 2),
      |ctx AS (SELECT w1, CAST(sum(nb) AS DOUBLE) AS nc FROM refbg GROUP BY w1),
      |uni AS (SELECT tok, count(*) AS nu
      |        FROM (SELECT unnest(toks) AS tok FROM refw) GROUP BY tok),
      |tot AS (SELECT CAST(sum(nu) AS DOUBLE) AS total FROM uni),
      |docbg AS (
      |  SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2, count(*) AS c FROM (
      |    SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
      |      i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS bg
      |    FROM w WHERE len(toks) >= 2) GROUP BY 1, 2, 3),
      |scored AS (
      |  SELECT d.doc_id, d.c,
      |         CASE WHEN refbg.nb IS NOT NULL THEN -ln(refbg.nb / ctx.nc)
      |              ELSE -ln(0.4 * coalesce(CAST(uni.nu AS DOUBLE), 0.5) /
      |                       tot.total) END AS s
      |  FROM docbg d
      |  LEFT JOIN refbg ON d.w1 = refbg.w1 AND d.w2 = refbg.w2
      |  LEFT JOIN ctx ON d.w1 = ctx.w1
      |  LEFT JOIN uni ON d.w2 = uni.tok, tot)
      |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
      |       round(sum(c * s) / sum(c), 6) AS avg_surprisal
      |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    TextAnalysis.bigramSurprisal(docs, "text", "doc_id",
      refCorpus = Some(docs.where(col("source") === "src0")))
      .orderBy("doc_id")
  }

  // Interpolated Kneser-Ney bigram surprisal: the LM trains on the EVEN
  // doc_ids and scores the whole corpus, so odd docs genuinely exercise
  // every smoothing leg — discounted seen bigrams, unseen-bigram
  // continuation interpolation, unseen contexts backing off to P_cont,
  // and never-seen continuation words on the OOV floor. The probability
  // is one fixed-shape double expression over exact integer counts
  // (parenthesized identically here and in TextAnalysis.knSurprisal);
  // per-bigram-type surprisal micro-floors before the per-doc
  // occurrence-weighted integer sum.
  register(
    "t74_kneser_ney",
    """WITH w AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(lower(text), '\s+'),
      |                     x -> x != '') AS toks
      |  FROM documents),
      |refw AS (SELECT toks FROM w WHERE doc_id % 2 = 0 AND len(toks) >= 2),
      |refbg AS (
      |  SELECT bg.w1 AS w1, bg.w2 AS w2, count(*) AS nb FROM (
      |    SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
      |      i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS bg
      |    FROM refw) GROUP BY 1, 2),
      |ctx AS (SELECT w1, CAST(sum(nb) AS BIGINT) AS nc,
      |               CAST(count(*) AS BIGINT) AS n1 FROM refbg GROUP BY w1),
      |cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS nw FROM refbg GROUP BY w2),
      |nbbt AS (SELECT CAST(count(*) AS BIGINT) AS nbb FROM refbg),
      |docbg AS (
      |  SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2, count(*) AS c FROM (
      |    SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
      |      i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS bg
      |    FROM w WHERE len(toks) >= 2) GROUP BY 1, 2, 3),
      |scored AS (
      |  SELECT d.doc_id, d.c,
      |    CAST(floor(-ln(
      |      CASE WHEN ctx.nc IS NOT NULL THEN
      |        ((CASE WHEN refbg.nb IS NOT NULL
      |               THEN CAST(refbg.nb AS DOUBLE) - 0.75 ELSE 0.0 END)
      |         + ((0.75 * ctx.n1) *
      |            (coalesce(CAST(cont.nw AS DOUBLE), 0.5) / nbbt.nbb)))
      |        / ctx.nc
      |      ELSE coalesce(CAST(cont.nw AS DOUBLE), 0.5) / nbbt.nbb END
      |    ) * 1000000.0 + 0.5) AS BIGINT) AS s
      |  FROM docbg d
      |  LEFT JOIN refbg ON d.w1 = refbg.w1 AND d.w2 = refbg.w2
      |  LEFT JOIN ctx ON d.w1 = ctx.w1
      |  LEFT JOIN cont ON d.w2 = cont.w2, nbbt)
      |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
      |       floor(CAST(sum(c * s) AS DOUBLE) / sum(c) + 0.5) / 1000000.0
      |         AS avg_surprisal
      |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    TextAnalysis.knSurprisal(docs, "text", "doc_id",
      refCorpus = Some(docs.where(col("doc_id") % 2 === 0)))
      .orderBy("doc_id")
  }

  // Per-source quality calibration: keep each source's exact top-30% by
  // quality score. The cutoff is an order statistic computed over the
  // per-source score HISTOGRAM (distinct rounded scores), never a
  // corpus-cardinality window — ties at the cutoff all kept.
  register(
    "t26_quality_calibration",
    """WITH scored AS (
      |  SELECT doc_id, source, round(
      |    greatest(0.0,
      |      least(length(text) / 500.0, 1.0) * 0.4 +
      |      least((len(list_filter(string_split_regex(lower(text), '\s+'),
      |              x -> x IN ('the','a','of','and','to','in'))) ::DOUBLE /
      |             greatest(len(list_filter(string_split_regex(lower(text), '\s+'),
      |              x -> x != '')), 1)) * 3.0, 1.0) * 0.4 +
      |      (1.0 - least(len(regexp_extract_all(text, '[^\w\s]'))::DOUBLE /
      |                   greatest(length(text), 1) * 5.0, 1.0)) * 0.2), 6) AS quality
      |  FROM documents),
      |hist AS (SELECT source, quality, count(*) AS n FROM scored GROUP BY 1, 2),
      |cum AS (SELECT source, quality,
      |        sum(n) OVER (PARTITION BY source ORDER BY quality DESC) AS cum FROM hist),
      |tot AS (SELECT source, sum(n) AS total FROM hist GROUP BY 1),
      |cut AS (SELECT c.source, max(c.quality) AS cutoff
      |        FROM cum c JOIN tot t ON c.source = t.source
      |        WHERE c.cum >= ceil(t.total * 0.3) GROUP BY 1)
      |SELECT s.doc_id, s.source, s.quality
      |FROM scored s JOIN cut ON s.source = cut.source
      |WHERE s.quality >= cut.cutoff ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.qualityCalibration(t(s, dir, "documents"), keepFraction = 0.3)
      .orderBy("doc_id")
  }

  // Token-budget corpus assembly: per-source budgets consumed in
  // deterministic md5(id) order — kept iff the running token sum including
  // the doc still fits. The Spark side is the two-level (shard-prefix)
  // exact prefix sum; the oracle's single running sum is the same order
  // because the shard key is a PREFIX of the hash.
  register(
    "t27_token_budget_mix",
    """WITH base AS (
      |  SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h,
      |         CAST(len(list_filter(string_split_regex(text, '\s+'),
      |              x -> x != '')) AS BIGINT) AS tokens,
      |         CASE source WHEN 'src0' THEN 800 WHEN 'src3' THEN 900
      |                     WHEN 'src7' THEN 500 END AS b
      |  FROM documents),
      |runs AS (
      |  SELECT doc_id, source, tokens, b,
      |         sum(tokens) OVER (PARTITION BY source ORDER BY h) AS cum
      |  FROM base WHERE b IS NOT NULL)
      |SELECT doc_id, source, tokens FROM runs WHERE cum <= b
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.tokenBudgetAssemble(t(s, dir, "documents"),
      budgets = Map("src0" -> 800L, "src3" -> 900L, "src7" -> 500L))
      .orderBy("doc_id")
  }

  // Multinomial Naive Bayes classifier (fasttext-style curation gate):
  // self-supervised on the documents table with `lang` as the class —
  // the model is three aggregate tables, prediction a per-doc argmax.
  // Scores round to 6 dp after the per-(doc,class) sum (t12 pattern);
  // argmax tie-breaks on the label so both engines agree.
  register(
    "t28_nb_classifier",
    """WITH toks AS (
      |  SELECT doc_id, lang AS lbl,
      |         unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                            x -> x != '')) AS tok
      |  FROM documents),
      |tc AS (SELECT lbl, tok, count(*) AS nwc FROM toks GROUP BY lbl, tok),
      |ct AS (SELECT lbl, CAST(sum(nwc) AS DOUBLE) AS nc FROM tc GROUP BY lbl),
      |v AS (SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v FROM tc),
      |pri AS (SELECT lang AS lbl, count(*) AS docs FROM documents GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS DOUBLE) AS totdocs FROM documents),
      |cs AS (SELECT pri.lbl, ct.nc, v.v,
      |              ln(CAST(pri.docs AS DOUBLE) / tot.totdocs) AS prior
      |       FROM pri JOIN ct USING (lbl) CROSS JOIN v CROSS JOIN tot),
      |dt AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok),
      |scored AS (
      |  SELECT dt.doc_id, cs.lbl,
      |         round(cs.prior + sum(dt.c *
      |           ln((coalesce(CAST(tc.nwc AS DOUBLE), 0.0) + 1.0) /
      |              (cs.nc + 1.0 * cs.v))), 6) AS score
      |  FROM dt CROSS JOIN cs
      |       LEFT JOIN tc ON tc.tok = dt.tok AND tc.lbl = cs.lbl
      |  GROUP BY dt.doc_id, cs.lbl, cs.prior),
      |ranked AS (
      |  SELECT doc_id, lbl, score,
      |         row_number() OVER (PARTITION BY doc_id
      |                            ORDER BY score DESC, lbl) AS rn
      |  FROM scored)
      |SELECT r.doc_id, r.lbl AS predicted, r.score,
      |       (r.lbl = d.lang) AS correct
      |FROM ranked r JOIN documents d ON d.doc_id = r.doc_id
      |WHERE rn = 1 ORDER BY r.doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.naiveBayesClassify(t(s, dir, "documents"), "text", "doc_id",
      "lang")
      .orderBy("doc_id")
  }

  // Sketch percentiles with a hash-pinned rank-error bound (the q16b
  // construction for order statistics): per-source GK-sketch median of
  // token counts, claimed within ±2/accuracy rank error of the exact
  // order statistics; the oracle computes the exact interpolated median
  // (bit-identical on integers) and folds the claim constant-TRUE.
  register(
    "t30_approx_quantile_bound",
    """SELECT source, count(*) AS n,
      |  round(quantile_cont(CAST(len(list_filter(
      |    string_split_regex(text, '\s+'), x -> x != '')) AS BIGINT),
      |    0.5), 6) AS exact_p50,
      |  TRUE AS approx_within_eps
      |FROM documents GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    TextAnalysis.lengthQuantileSketchBound(t(s, dir, "documents"), "text",
      "source", q = 0.5, accuracy = 100, margin = 2.0)
      .orderBy("source")
  }

  // Misra–Gries heavy hitters with the sketch guarantee hash-pinned
  // (the q16b construction): the custom TypedImperativeAggregate
  // summarizes the token stream with k=64 counters (partial-aggregated —
  // only k-entry sketches cross the exchange, never the vocabulary), and
  // the row claims the MG theorem held on this corpus: every token with
  // exact frequency > n/65 is present in the sketch, no estimate
  // overcounts, and no estimate undercounts by more than n/65. The
  // sketch's tail below the guarantee line is stream-order dependent, so
  // the pinned row is the order-independent guarantee plus the exact
  // heavy-hitter count, which DuckDB recomputes exactly.
  register(
    "t31_heavy_hitters_bound",
    """WITH toks AS (
      |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                x -> x != '')) AS tok
      |  FROM documents),
      |c AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
      |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM toks)
      |SELECT CAST((SELECT count(*) FROM c, n
      |             WHERE CAST(cnt AS DOUBLE) > n / 65.0) AS BIGINT) AS heavy_count,
      |       TRUE AS bound_met""".stripMargin) { (s, dir) =>
    val k = 64
    val toks = t(s, dir, "documents")
      .select(explode(TextAnalysis.tokens(lower(col("text")))).as("tok"))
    val sketch = toks.agg(
      graft.functions.MisraGriesAgg.misra_gries(col("tok"), k).as("hh"))
    val tot = toks.agg(count(lit(1)).cast("double").as("n"))
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    exact.crossJoin(broadcast(tot))
      .where(col("cnt").cast("double") > col("n") / (k + 1))
      .crossJoin(broadcast(sketch))
      .withColumn("__m",
        filter(col("hh"), x => x.getField("item") === col("tok")))
      .withColumn("__est",
        when(size(col("__m")) === 1, element_at(col("__m"), 1).getField("est")))
      .agg(
        count(lit(1)).cast("long").as("heavy_count"),
        // empty heavy set → vacuous-true on both engines (ADVICE r8)
        coalesce(bool_and(col("__est").isNotNull &&
          col("__est") <= col("cnt") &&
          (col("cnt") - col("__est")).cast("double") <= col("n") / (k + 1)),
          lit(true)).as("bound_met"))
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

  // Count-Min sketch with the guarantee hash-pinned (the t31
  // construction): the custom TypedImperativeAggregate folds the token
  // stream into a 4×8192 counter array (linear — partial-aggregated
  // map-side, only sketches cross the exchange), the Column-side
  // cm_estimate reads it back with pure built-in functions, and the row
  // claims the CM theorem held on this corpus for every token with exact
  // count >= 50: estimates never undercount, and overcount stays under
  // the measured envelope (see floor comment). DuckDB recomputes the
  // exact queried-token count and constant-folds the claims TRUE.
  register(
    "t34_count_min_bound",
    """WITH toks AS (
      |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                x -> x != '')) AS tok
      |  FROM documents),
      |c AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok)
      |SELECT CAST((SELECT count(*) FROM c WHERE cnt >= 50) AS BIGINT)
      |         AS n_queried,
      |       TRUE AS never_undercounts, TRUE AS within_bound""".stripMargin) { (s, dir) =>
    val depth = 4; val width = 8192
    val toks = t(s, dir, "documents")
      .select(explode(TextAnalysis.tokens(lower(col("text")))).as("tok"))
    val sketch = toks.agg(
      graft.functions.CountMinAgg.count_min(col("tok"), depth, width).as("cm"))
    val tot = toks.agg(count(lit(1)).cast("double").as("n"))
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") >= 50)
    exact.crossJoin(broadcast(sketch)).crossJoin(broadcast(tot))
      .withColumn("__est", graft.functions.CountMinAgg
        .cm_estimate(col("cm"), col("tok"), depth, width))
      .agg(
        count(lit(1)).cast("long").as("n_queried"),
        coalesce(bool_and(col("__est") >= col("cnt")), lit(true))
          .as("never_undercounts"),
        // measured max overcount is 0 at sf0.01 AND sf0.1 (few hundred
        // distinct tokens vs width 8192 — min-over-4-rows kills the rare
        // collisions); pin the textbook ε = 2n/w envelope, which leaves
        // the full theorem margin against data drift
        coalesce(bool_and((col("__est") - col("cnt")).cast("double") <=
          lit(2.0) * col("n") / width), lit(true)).as("within_bound"))
  }

  // PMI collocation mining (Church & Hanks 1990): top-30 adjacent pairs
  // by pointwise mutual information, pair count >= 5. Per-pair arithmetic
  // only (no cross-pair float sums), identical expression nesting both
  // engines, ties broken on (w1, w2).
  register(
    "t29_pmi_collocations",
    """WITH w AS (
      |  SELECT list_filter(string_split_regex(lower(text), '\s+'),
      |                     x -> x != '') AS toks
      |  FROM documents),
      |uni AS (SELECT tok, count(*) AS n
      |        FROM (SELECT unnest(toks) AS tok FROM w) GROUP BY tok),
      |bg AS (
      |  SELECT b.w1 AS w1, b.w2 AS w2, count(*) AS pair_count FROM (
      |    SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
      |      i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS b
      |    FROM w WHERE len(toks) >= 2) GROUP BY 1, 2),
      |tot AS (SELECT (SELECT CAST(sum(n) AS DOUBLE) FROM uni) AS nt,
      |               (SELECT CAST(sum(pair_count) AS DOUBLE) FROM bg) AS np)
      |SELECT bg.w1, bg.w2, pair_count,
      |       round(ln((CAST(pair_count AS DOUBLE) / np) /
      |                ((CAST(u1.n AS DOUBLE) / nt) *
      |                 (CAST(u2.n AS DOUBLE) / nt))), 6) AS pmi
      |FROM bg JOIN uni u1 ON u1.tok = bg.w1
      |        JOIN uni u2 ON u2.tok = bg.w2, tot
      |WHERE pair_count >= 5
      |ORDER BY pmi DESC, bg.w1, bg.w2 LIMIT 30""".stripMargin) { (s, dir) =>
    TextAnalysis.pmiCollocations(t(s, dir, "documents"), "text", k = 30,
      minCount = 5L)
  }

  // Deterministic train/val/test split: md5-interval assignment
  // (0.8/0.1/0.1) — reproducible across engines, runs, and cluster sizes.
  register(
    "t23_split_assign",
    """SELECT doc_id,
      |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'cccccccc' THEN 'train'
      |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'e6666666' THEN 'val'
      |       ELSE 'test' END AS split
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.splitAssign(t(s, dir, "documents"), "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split")
      .orderBy("doc_id")
  }

  // Token-bounded chunking with overlap (context-window prep): chunk i
  // covers words [i*48, i*48+64), every word covered, zero shuffle.
  register(
    "t5_chunking",
    """WITH w AS (
      |  SELECT doc_id,
      |         list_filter(string_split_regex(text, '\s+'), x -> x != '') AS words
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, words,
      |         unnest(generate_series(0, greatest(len(words) - 17, 0) // 48)) AS chunk_idx
      |  FROM w)
      |SELECT doc_id, chunk_idx,
      |       array_to_string(list_slice(words, chunk_idx*48 + 1, chunk_idx*48 + 64), ' ')
      |         AS chunk_text,
      |       least(len(words) - chunk_idx*48, 64) AS chunk_words
      |FROM c""".stripMargin) { (s, dir) =>
    TextAnalysis.chunkDocuments(t(s, dir, "documents"), "text", "doc_id",
      chunkWords = 64, overlapWords = 16)
  }

  // Text analysis: token counts (whitespace + BPE-ish), punctuation ratio.
  register(
    "t1_token_counts",
    """SELECT doc_id,
      |  len(list_filter(string_split_regex(text, '\s+'), x -> x != '')) AS n_tokens,
      |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpeish
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    t(s, dir, "documents").select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tokens"),
      TextAnalysis.bpeishTokenCount(col("text")).as("n_bpeish"))
      .orderBy("doc_id")
  }

  // Quality scoring: length/stopword/punctuation composite.
  register(
    "t2_quality_score",
    """SELECT doc_id, round(
      |  greatest(0.0,
      |    least(length(text) / 500.0, 1.0) * 0.4 +
      |    least((len(list_filter(string_split_regex(lower(text), '\s+'),
      |            x -> x IN ('the','a','of','and','to','in'))) ::DOUBLE /
      |           greatest(len(list_filter(string_split_regex(lower(text), '\s+'),
      |            x -> x != '')), 1)) * 3.0, 1.0) * 0.4 +
      |    (1.0 - least(len(regexp_extract_all(text, '[^\w\s]'))::DOUBLE /
      |                 greatest(length(text), 1) * 5.0, 1.0)) * 0.2), 6) AS quality
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    t(s, dir, "documents").select(
      col("doc_id"),
      TextAnalysis.qualityScore(col("text"),
        Seq("the", "a", "of", "and", "to", "in")).as("quality"))
      .orderBy("doc_id")
  }

  // Language ID: stopword-hit argmax (leftmost wins).
  register(
    "t3_langid",
    """WITH toks AS (
      |  SELECT doc_id, list_distinct(list_filter(
      |    string_split_regex(lower(text), '\s+'), x -> x != '')) AS t
      |  FROM documents),
      |scores AS (
      |  SELECT doc_id,
      |    len(list_intersect(t, ['the','a','and','scan','join'])) AS s_en,
      |    len(list_intersect(t, ['el','la','que','datos'])) AS s_es,
      |    len(list_intersect(t, ['der','die','und','das'])) AS s_de
      |  FROM toks)
      |SELECT doc_id, CASE
      |  WHEN s_en >= s_es AND s_en >= s_de THEN 'en'
      |  WHEN s_es >= s_de THEN 'es' ELSE 'de' END AS langid
      |FROM scores ORDER BY doc_id""".stripMargin) { (s, dir) =>
    t(s, dir, "documents").select(
      col("doc_id"),
      TextAnalysis.langId(col("text"), Seq(
        "en" -> Seq("the", "a", "and", "scan", "join"),
        "es" -> Seq("el", "la", "que", "datos"),
        "de" -> Seq("der", "die", "und", "das"))).as("langid"))
      .orderBy("doc_id")
  }

  // Document fingerprinting (md5 oracle path; the codegen'd polynomial
  // rolling hash is covered by PipelineOpsSpec).
  register(
    "t4_fingerprint",
    """SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
    t(s, dir, "documents").select(
      col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")
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

  /** The native array<string> aggregation behind q17 — kept separately so
    * PipelineOpsSpec can prove the list-through-parquet path (Spark
    * array<string> → parquet → read-back) even though the driver's oracle
    * hashes the string projection.
    */
  def q17Native(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events").groupBy("user_id")
      .agg(
        array_sort(collect_set(col("event_type"))).as("event_types"),
        count(lit(1)).as("n_events"))

  // Domain extraction: per-domain reference counts (the blocklist /
  // source-mix audit). URLs are synthesized onto the corpus text so every
  // row exercises the extractor, mirroring the t6 augmentation pattern.
  register(
    "t11_url_domains",
    """WITH aug AS (
      |  SELECT 'see https://site' || CAST(doc_id % 20 AS VARCHAR) ||
      |         '.example.com/p/' || CAST(doc_id AS VARCHAR) || ' ' || text AS t
      |  FROM documents),
      |d AS (
      |  SELECT unnest(regexp_extract_all(lower(t), 'https?://([a-z0-9.-]+)', 1))
      |    AS domain
      |  FROM aug)
      |SELECT domain, count(*) AS n
      |FROM d GROUP BY domain ORDER BY domain""".stripMargin) { (s, dir) =>
    val aug = concat(lit("see https://site"), (col("doc_id") % 20).cast("string"),
      lit(".example.com/p/"), col("doc_id").cast("string"), lit(" "), col("text"))
    TextAnalysis.domainCounts(
      t(s, dir, "documents").select(aug.as("t")), "t")
      .orderBy("domain")
  }

  // Corpus vocabulary: token-frequency top-k (one pre-aggregated shuffle).
  register(
    "t10_vocab_topk",
    """WITH toks AS (
      |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                            x -> x != '')) AS tok
      |  FROM documents)
      |SELECT tok, count(*) AS n FROM toks
      |GROUP BY tok ORDER BY n DESC, tok LIMIT 100""".stripMargin) { (s, dir) =>
    TextAnalysis.vocabularyTopK(t(s, dir, "documents"), "text", 100)
  }

  // Repetition signal: repeated-bigram fraction for quality filtering.
  register(
    "t9_repetition",
    """WITH w AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
      |                             x -> x != '') AS words
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, CASE WHEN len(words) >= 2
      |    THEN list_transform(generate_series(1, len(words) - 1),
      |                        i -> words[i] || ' ' || words[i + 1])
      |    ELSE [] END AS grams
      |  FROM w)
      |SELECT doc_id, CASE WHEN len(grams) > 0
      |  THEN round(1.0 - len(list_distinct(grams))::DOUBLE / len(grams), 6)
      |  ELSE 0.0 END AS rep_frac
      |FROM g ORDER BY doc_id""".stripMargin) { (s, dir) =>
    t(s, dir, "documents").select(
      col("doc_id"),
      TextAnalysis.repetitionFraction(col("text"), 2).as("rep_frac"))
      .orderBy("doc_id")
  }

  // PII redaction: regexp_replace chain over RE2-compatible patterns. The
  // corpus text is augmented with synthesized contact strings so every row
  // exercises all three pattern classes; counts are attributed on the
  // progressively-redacted text exactly as TextAnalysis.piiCounts does.
  register(
    "t6_pii_redact",
    """WITH aug AS (
      |  SELECT doc_id,
      |    text || ' contact user' || CAST(doc_id AS VARCHAR) ||
      |    '@example.com from 10.' || CAST(doc_id % 200 AS VARCHAR) ||
      |    '.0.1 ref ' || CAST(1234567 + doc_id AS VARCHAR) AS t
      |  FROM documents),
      |r1 AS (SELECT doc_id, t,
      |  regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
      |    '<EMAIL>', 'g') AS te FROM aug),
      |r2 AS (SELECT doc_id, t, te,
      |  regexp_replace(te, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
      |    '<IPV4>', 'g') AS ti FROM r1)
      |SELECT doc_id,
      |  regexp_replace(ti, '\b\d{7,}\b', '<NUMID>', 'g') AS redacted,
      |  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
      |  len(regexp_extract_all(te, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
      |  len(regexp_extract_all(ti, '\b\d{7,}\b')) AS n_numid
      |FROM r2 ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val aug = concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
      lit("@example.com from 10."), (col("doc_id") % 200).cast("string"),
      lit(".0.1 ref "), (lit(1234567) + col("doc_id")).cast("string"))
    val counts = TextAnalysis.piiCounts(aug)
    t(s, dir, "documents").select(
      col("doc_id"),
      TextAnalysis.piiRedact(aug).as("redacted"),
      counts(0)._2.as("n_email"),
      counts(1)._2.as("n_ipv4"),
      counts(2)._2.as("n_numid"))
      .orderBy("doc_id")
  }

  // Deterministic stratified sampling: md5-hex keep-threshold per stratum —
  // reproducible across engines/cluster sizes, verified bit-for-bit by the
  // oracle running the same arithmetic.
  register(
    "t7_stratified_sample",
    """SELECT doc_id, lang FROM documents
      |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <
      |  CASE lang WHEN 'en' THEN '40000000' WHEN 'es' THEN '80000000'
      |            WHEN 'fr' THEN '33333333' ELSE '00000000' END
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.stratifiedHashSample(t(s, dir, "documents"), "doc_id", "lang",
      Map("en" -> 0.25, "es" -> 0.5, "fr" -> 0.2))
      .select("doc_id", "lang").orderBy("doc_id")
  }

  // Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
  // k smallest deterministic exponential keys -ln(u)/w with u from the
  // md5-uniform family (13 hex chars = 52 bits, exact in a double) —
  // the oracle runs the IDENTICAL key arithmetic, so the selected id
  // set hash-compares exactly. Weight = n_chars: longer docs
  // proportionally likelier, the usual curation-mix primitive.
  register(
    "t32_weighted_sample",
    """SELECT doc_id, n_chars FROM (
      |  SELECT doc_id, n_chars,
      |    -ln((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || 'es1'),
      |                                  1, 13)) AS BIGINT) + 0.5)
      |        / 4503599627370496.0) / n_chars AS ekey
      |  FROM documents WHERE n_chars > 0
      |  ORDER BY ekey LIMIT 25)
      |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.weightedSample(t(s, dir, "documents"), "doc_id",
        col("n_chars"), k = 25, seed = "es1")
      .select("doc_id", "n_chars").orderBy("doc_id")
  }

  // Composite curation v2 — the round-9 operators chained end-to-end the
  // way a real corpus build runs them: exact dedup (md5 keep-min) →
  // EXACT PPJoin near-dup drop at τ=0.8 (drop the higher id of every
  // pair among exact survivors) → Bloom-pruned 5-gram decontamination
  // (drop any doc colliding with the benchmark snippets) → stratified
  // A-ES sample (15 per language by n_chars). Every stage is
  // individually hash-proven (d1/d14/t33/t32b); this row pins the
  // COMPOSITION, stage ordering included, against one DuckDB program.
  register(
    "p1_curation_v2",
    """WITH fp AS (
      |  SELECT doc_id, lang, n_chars, text,
      |         md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS f
      |  FROM documents),
      |s1 AS (  -- exact dedup survivors (keep min id per fingerprint)
      |  SELECT * FROM fp WHERE doc_id IN (SELECT min(doc_id) FROM fp GROUP BY f)),
      |toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x != '') AS t
      |  FROM s1),
      |sh AS (
      |  SELECT doc_id, CASE WHEN len(t) >= 2
      |    THEN list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1]))
      |    ELSE [array_to_string(t, ' ')] END AS s
      |  FROM toks),
      |neardup_b AS (  -- higher id of every >=0.8 pair among s1
      |  SELECT DISTINCT b.doc_id FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |  WHERE len(list_intersect(a.s, b.s))::DOUBLE /
      |        len(list_distinct(list_concat(a.s, b.s))) >= 0.8),
      |s2 AS (SELECT * FROM s1 WHERE doc_id NOT IN (SELECT doc_id FROM neardup_b)),
      |grams AS (
      |  SELECT s2.doc_id, unnest(list_distinct(
      |    CASE WHEN len(t.t) >= 5
      |      THEN list_transform(generate_series(1, len(t.t) - 4),
      |             i -> t.t[i] || ' ' || t.t[i+1] || ' ' || t.t[i+2] ||
      |                  ' ' || t.t[i+3] || ' ' || t.t[i+4])
      |      ELSE [] END)) AS gram
      |  FROM s2 JOIN toks t ON t.doc_id = s2.doc_id),
      |snips AS (
      |  SELECT DISTINCT substr(text, 1, 100) AS snip FROM documents
      |  WHERE doc_id % 41 = 0 AND length(text) >= 100),
      |sgrams AS (
      |  SELECT DISTINCT unnest(list_distinct(
      |    CASE WHEN len(words) >= 5
      |      THEN list_transform(generate_series(1, len(words) - 4),
      |             i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2] ||
      |                  ' ' || words[i+3] || ' ' || words[i+4])
      |      ELSE [] END)) AS gram
      |  FROM (SELECT list_filter(string_split_regex(lower(snip), '\s+'),
      |                           x -> x != '') AS words FROM snips)),
      |contaminated AS (SELECT DISTINCT g.doc_id FROM grams g JOIN sgrams USING (gram)),
      |s3 AS (SELECT * FROM s2
      |       WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
      |         AND n_chars > 0)
      |SELECT doc_id, lang, n_chars FROM (
      |  SELECT doc_id, lang, n_chars, row_number() OVER (PARTITION BY lang ORDER BY
      |    -ln((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || 'cur1'),
      |                                  1, 13)) AS BIGINT) + 0.5)
      |        / 4503599627370496.0) / n_chars) AS rn
      |  FROM s3)
      |WHERE rn <= 15 ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val s1 = Dedup.dropExactDuplicates(docs, "text", "doc_id")
      .localCheckpoint() // three downstream stages read the survivor set
    val dropB = Dedup.similarityJoin(s1, "text", "doc_id",
      shingleWords = 2, threshold = 0.8).select(col("id_b").as("doc_id"))
    val s2 = s1.join(dropB, Seq("doc_id"), "left_anti")
    val snips = docs.where(col("doc_id") % 41 === 0 && length(col("text")) >= 100)
      .select(substring(col("text"), 1, 100).as("snip")).distinct()
    val contaminated = TextAnalysis.ngramContaminationBloom(
      s2, "text", "doc_id", snips, "snip", n = 5).select("doc_id")
    val s3 = s2.join(contaminated, Seq("doc_id"), "left_anti")
    TextAnalysis.weightedSamplePerGroup(s3, "doc_id", "lang",
        col("n_chars"), k = 15, seed = "cur1")
      .select("doc_id", "lang", "n_chars").orderBy("doc_id")
  }

  // Stratified A-ES: 10 docs per language, weighted by n_chars — the
  // per-stratum window variant of t32 (rank over the same deterministic
  // exponential keys).
  register(
    "t32b_weighted_sample_per_group",
    """SELECT doc_id, lang FROM (
      |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang ORDER BY
      |    -ln((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || 'es2'),
      |                                  1, 13)) AS BIGINT) + 0.5)
      |        / 4503599627370496.0) / n_chars) AS rn
      |  FROM documents WHERE n_chars > 0)
      |WHERE rn <= 10 ORDER BY doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.weightedSamplePerGroup(t(s, dir, "documents"), "doc_id",
        "lang", col("n_chars"), k = 10, seed = "es2")
      .select("doc_id", "lang").orderBy("doc_id")
  }

  // Duplicate-cluster labeling: prefix-fingerprint chain edges → min-label
  // propagation to fixpoint (Dedup.connectedComponents). The oracle computes
  // the same clusters independently via a window over the fingerprint —
  // verifying the distributed graph algorithm against a declarative spec.
  register(
    "d6_dedup_clusters",
    """WITH fp AS (
      |  SELECT doc_id,
      |    substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 80) AS f
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, min(doc_id) OVER (PARTITION BY f) AS cluster_id,
      |         count(*) OVER (PARTITION BY f) AS n
      |  FROM fp)
      |SELECT doc_id AS id, cluster_id FROM g WHERE n > 1 ORDER BY id""".stripMargin) { (s, dir) =>
    Dedup.exactDupClusters(t(s, dir, "documents"), "text", "doc_id", prefixLen = 80)
      .orderBy("id")
  }

  // Cluster-aware split assignment — the FIX for the leakage p2 detects:
  // hash the dedup CLUSTER id (d6's fingerprint clusters), not the doc
  // id, so near-identical docs can never straddle train/test. The
  // cross-split duplicate-pair count is computed for real in both
  // engines and must be exactly 0 (fingerprint-equal => same cluster =>
  // same md5 bucket) — the invariant rides the hash.
  register(
    "p10_cluster_split",
    """WITH fp AS (
      |  SELECT doc_id,
      |    substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 80) AS f
      |  FROM documents),
      |cl AS (SELECT f, CAST(min(doc_id) AS BIGINT) AS cluster_id
      |       FROM fp GROUP BY f),
      |d AS (
      |  SELECT fp.doc_id, fp.f, cl.cluster_id,
      |    CASE WHEN substr(md5(CAST(cl.cluster_id AS VARCHAR)), 1, 8)
      |              < 'cccccccc' THEN 'train'
      |         WHEN substr(md5(CAST(cl.cluster_id AS VARCHAR)), 1, 8)
      |              < 'e6666666' THEN 'val'
      |         ELSE 'test' END AS split
      |  FROM fp JOIN cl ON fp.f = cl.f),
      |x AS (SELECT CAST(count(*) AS BIGINT) AS cross_split_dup_pairs
      |      FROM d a JOIN d b ON a.f = b.f AND a.doc_id < b.doc_id
      |        AND a.split != b.split)
      |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
      |       x.cross_split_dup_pairs
      |FROM d, x GROUP BY split, x.cross_split_dup_pairs
      |ORDER BY split""".stripMargin) { (s, dir) =>
    val fp = t(s, dir, "documents").select(col("doc_id"),
      substring(regexp_replace(lower(col("text")), "[^a-z0-9]", ""), 1, 80)
        .as("f"))
    val cl = fp.groupBy("f").agg(min(col("doc_id")).as("cluster_id"))
    val d = TextAnalysis.splitAssign(fp.join(cl, "f"), "cluster_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).localCheckpoint()
    val cross = broadcast(d.as("a").join(d.as("b"),
        col("a.f") === col("b.f") && col("a.doc_id") < col("b.doc_id") &&
          col("a.split") =!= col("b.split"))
      .agg(count(lit(1)).as("cross_split_dup_pairs")))
    d.groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("cluster_id")).as("n_clusters"))
      .crossJoin(cross)
      .orderBy("split")
  }

  // Benchmark decontamination: exact-substring containment of a broadcast
  // snippet set (the first tier of train/test-overlap filtering).
  register(
    "t8_decontaminate",
    """WITH s AS (
      |  SELECT DISTINCT substr(text, 1, 60) AS snip FROM documents
      |  WHERE doc_id % 50 = 0 AND length(text) >= 60)
      |SELECT d.doc_id, count(*) AS n_matches
      |FROM documents d JOIN s ON contains(d.text, s.snip)
      |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val snips = docs.where(col("doc_id") % 50 === 0 && length(col("text")) >= 60)
      .select(substring(col("text"), 1, 60).as("snip")).distinct()
    TextAnalysis.contaminatedDocs(docs, "text", "doc_id", snips, "snip")
      .orderBy("doc_id")
  }

  // N-gram-overlap decontamination: the scale path beyond t8's broadcast
  // substring scan — both sides explode to distinct 5-grams and meet in an
  // equi-join (corpus ships (doc_id, md5(gram)) only).
  register(
    "t8b_ngram_decontaminate",
    """WITH grams AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    CASE WHEN len(words) >= 5
      |      THEN list_transform(generate_series(1, len(words) - 4),
      |             i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2] ||
      |                  ' ' || words[i+3] || ' ' || words[i+4])
      |      ELSE [] END)) AS gram
      |  FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
      |                                   x -> x != '') AS words
      |        FROM documents)),
      |snips AS (
      |  SELECT DISTINCT substr(text, 1, 120) AS snip FROM documents
      |  WHERE doc_id % 37 = 0 AND length(text) >= 120),
      |sgrams AS (
      |  SELECT DISTINCT unnest(list_distinct(
      |    CASE WHEN len(words) >= 5
      |      THEN list_transform(generate_series(1, len(words) - 4),
      |             i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2] ||
      |                  ' ' || words[i+3] || ' ' || words[i+4])
      |      ELSE [] END)) AS gram
      |  FROM (SELECT list_filter(string_split_regex(lower(snip), '\s+'),
      |                           x -> x != '') AS words
      |        FROM snips))
      |SELECT g.doc_id, count(*) AS n_gram_hits
      |FROM grams g JOIN sgrams s USING (gram)
      |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val snips = docs.where(col("doc_id") % 37 === 0 && length(col("text")) >= 120)
      .select(substring(col("text"), 1, 120).as("snip")).distinct()
    TextAnalysis.ngramContamination(docs, "text", "doc_id", snips, "snip", n = 5)
      .orderBy("doc_id")
  }

  // Bloom-pruned n-gram decontamination: identical semantics to t8b but
  // the corpus grams probe a constant bloom (built from the snippet
  // grams, ~10 bits/item) in the scan-side filter, so only suspected
  // hits reach the exchange; the exact md5 equi-join then kills the
  // false positives. The oracle is the SAME exact ground truth — the
  // bloom is a pruning layer, not an approximation, so the row must
  // hash-match the unpruned semantics bit-for-bit.
  register(
    "t33_bloom_decontaminate",
    """WITH grams AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    CASE WHEN len(words) >= 5
      |      THEN list_transform(generate_series(1, len(words) - 4),
      |             i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2] ||
      |                  ' ' || words[i+3] || ' ' || words[i+4])
      |      ELSE [] END)) AS gram
      |  FROM (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
      |                                   x -> x != '') AS words
      |        FROM documents)),
      |snips AS (
      |  SELECT DISTINCT substr(text, 1, 100) AS snip FROM documents
      |  WHERE doc_id % 41 = 0 AND length(text) >= 100),
      |sgrams AS (
      |  SELECT DISTINCT unnest(list_distinct(
      |    CASE WHEN len(words) >= 5
      |      THEN list_transform(generate_series(1, len(words) - 4),
      |             i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2] ||
      |                  ' ' || words[i+3] || ' ' || words[i+4])
      |      ELSE [] END)) AS gram
      |  FROM (SELECT list_filter(string_split_regex(lower(snip), '\s+'),
      |                           x -> x != '') AS words
      |        FROM snips))
      |SELECT g.doc_id, count(*) AS n_gram_hits
      |FROM grams g JOIN sgrams s USING (gram)
      |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents")
    val snips = docs.where(col("doc_id") % 41 === 0 && length(col("text")) >= 100)
      .select(substring(col("text"), 1, 100).as("snip")).distinct()
    TextAnalysis.ngramContaminationBloom(docs, "text", "doc_id", snips, "snip",
        n = 5)
      .orderBy("doc_id")
  }

  // Unigram-LM surprisal (perplexity-proxy quality filter): frequencies
  // trained on the corpus itself, docs scored by mean -ln p(token).
  register(
    "t12_unigram_surprisal",
    """WITH toks AS (
      |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                                    x -> x != '')) AS tok
      |  FROM documents),
      |dc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok),
      |freq AS (SELECT tok, count(*) AS n FROM toks GROUP BY tok),
      |tot AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM freq)
      |SELECT dc.doc_id, CAST(sum(dc.c) AS BIGINT) AS n_tokens,
      |       round(sum(dc.c * -ln(freq.n / tot.total)) / sum(dc.c), 6)
      |         AS avg_surprisal
      |FROM dc JOIN freq USING (tok), tot
      |GROUP BY dc.doc_id ORDER BY dc.doc_id""".stripMargin) { (s, dir) =>
    TextAnalysis.unigramSurprisal(t(s, dir, "documents"), "text", "doc_id")
      .orderBy("doc_id")
  }

  // Span-level corpus dedup (C4-style): non-overlapping 8-token spans,
  // corpus-wide keep-first, documents reassembled from survivors.
  register(
    "d8_span_dedup",
    """WITH w AS (
      |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
      |                             x -> x != '') AS words
      |  FROM documents),
      |flat AS (
      |  SELECT doc_id, sp.span_idx AS span_idx, sp.span AS span
      |  FROM (SELECT doc_id, unnest(list_transform(
      |          generate_series(0, CAST(ceil(len(words) / 8.0) AS BIGINT) - 1),
      |          i -> struct_pack(span_idx := i,
      |                 span := array_to_string(words[i*8+1:i*8+8], ' ')))) AS sp
      |        FROM w)
      |  WHERE length(sp.span) > 0),
      |keep AS (
      |  SELECT doc_id, span_idx, span,
      |         row_number() OVER (PARTITION BY span
      |                            ORDER BY doc_id, span_idx) AS rn
      |  FROM flat)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans_kept,
      |       string_agg(span, ' ' ORDER BY span_idx) AS dedup_text
      |FROM keep WHERE rn = 1
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Dedup.spanDedup(t(s, dir, "documents"), "text", "doc_id", spanWords = 8)
      .orderBy("doc_id")
  }

  // Intra-document span dedup (the C4 page-LOCAL rule): the keep-first
  // window scopes to (doc, span) — a span repeated inside one document
  // collapses, but documents never affect each other.
  register(
    "d11_intradoc_span_dedup",
    """WITH w AS (
      |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
      |                             x -> x != '') AS words
      |  FROM documents),
      |flat AS (
      |  SELECT doc_id, sp.span_idx AS span_idx, sp.span AS span
      |  FROM (SELECT doc_id, unnest(list_transform(
      |          generate_series(0, CAST(ceil(len(words) / 8.0) AS BIGINT) - 1),
      |          i -> struct_pack(span_idx := i,
      |                 span := array_to_string(words[i*8+1:i*8+8], ' ')))) AS sp
      |        FROM w)
      |  WHERE length(sp.span) > 0),
      |keep AS (
      |  SELECT doc_id, span_idx, span,
      |         row_number() OVER (PARTITION BY doc_id, span
      |                            ORDER BY doc_id, span_idx) AS rn
      |  FROM flat)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans_kept,
      |       string_agg(span, ' ' ORDER BY span_idx) AS dedup_text
      |FROM keep WHERE rn = 1
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Dedup.spanDedup(t(s, dir, "documents"), "text", "doc_id", spanWords = 8,
      withinDoc = true)
      .orderBy("doc_id")
  }

  // Semantic dedup: nearest-centroid cluster assignment + keep-one
  // representative per cluster (embedding-space analogue of d1/d2's
  // lexical keep-one; centroid matrix rides the ivf one-row broadcast).
  register(
    "d7_semantic_dedup",
    """WITH c AS (
      |  SELECT CAST(label AS VARCHAR) AS grp, pos, avg(v) AS centroid
      |  FROM (SELECT label, unnest(embedding) AS v,
      |               generate_subscripts(embedding, 1) AS pos FROM embeddings)
      |  GROUP BY 1, pos),
      |d AS (
      |  SELECT e.vec_id, c.grp,
      |         round(sum((CAST(e.v AS DOUBLE) - c.centroid) *
      |                   (CAST(e.v AS DOUBLE) - c.centroid)), 6) AS d2
      |  FROM (SELECT vec_id, unnest(embedding) AS v,
      |               generate_subscripts(embedding, 1) AS pos FROM embeddings) e
      |  JOIN c USING (pos)
      |  GROUP BY e.vec_id, c.grp),
      |a AS (
      |  SELECT vec_id, grp AS cluster, d2,
      |         row_number() OVER (PARTITION BY vec_id ORDER BY d2, grp) AS rn
      |  FROM d),
      |asn AS (SELECT vec_id, cluster, d2 FROM a WHERE rn = 1),
      |r AS (
      |  SELECT vec_id, cluster,
      |         row_number() OVER (PARTITION BY cluster ORDER BY d2, vec_id) AS rnk
      |  FROM asn)
      |SELECT vec_id, cluster, rnk = 1 AS keep FROM r ORDER BY vec_id""".stripMargin) { (s, dir) =>
    val e = t(s, dir, "embeddings")
    val cents = Similarity.centroids(
      e.withColumn("grp", col("label").cast("string")), "embedding", "grp")
    Similarity.semanticDedup(e, cents).orderBy("vec_id")
  }

  // Multimodal perceptual-hash near-dup: the pigeonhole machinery over a
  // 64-bit media hash (stub = md5-derived, so only byte-identical media
  // collide — which is exactly what the oracle can pin; a real pHash slots
  // into the same pipeline).
  register(
    "mm_phash_neardup",
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 97 = 0),
      |h AS (SELECT doc_id, md5(text) AS m FROM corpus)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b, 0 AS hamming
      |FROM h a JOIN h b ON a.m = b.m AND a.doc_id < b.doc_id
      |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
    val docs = t(s, dir, "documents").select("doc_id", "text")
    // plant byte-identical "media" (re-ingested copies) so the pair output
    // is non-empty and the oracle pins them exactly
    val corpus = docs.unionAll(docs.where(col("doc_id") % 97 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
    val media = Multimodal.asMediaTable(corpus, "doc_id", "text", "image")
    Multimodal.phashNearDups(media)
      .select(col("id_a"), col("id_b"), col("hamming").cast("int").as("hamming"))
      .orderBy("id_a", "id_b")
  }

  // Multimodal: binary media table with typed metadata + stub frame sampling
  // (decode itself is stubbed; schema/partitioning/batch shape are real).
  register(
    "mm_media_frames",
    """SELECT doc_id AS media_id, f AS frame_idx,
      |       (f * length(text)) // 4 AS byte_offset,
      |       md5(text || CAST(f AS VARCHAR)) AS frame_md5
      |FROM documents, range(4) r(f) ORDER BY media_id, frame_idx""".stripMargin) { (s, dir) =>
    val media = Multimodal.asMediaTable(t(s, dir, "documents"), "doc_id", "text", "image")
    Multimodal.stubFrameSample(media, 4)
      .select("media_id", "frame_idx", "byte_offset", "frame_md5")
      .orderBy("media_id", "frame_idx")
  }

  // Scene-change detection over the sampled frames: consecutive frame
  // hashes' hamming distance against a threshold — the shot-segmentation
  // primitive for video corpora (threshold 30 splits the stub hash's
  // random ~30-bit median, so both verdicts occur; a real pHash makes it
  // a visual knob). One lag window per media.
  register(
    "mm_scene_changes",
    """WITH f AS (
      |  SELECT doc_id AS media_id, f AS frame_idx,
      |         CAST(('0x' || substr(md5(text || CAST(f AS VARCHAR)), 1, 15))
      |              AS BIGINT) AS h
      |  FROM documents, range(4) r(f)),
      |l AS (SELECT media_id, frame_idx, h,
      |             lag(h) OVER (PARTITION BY media_id ORDER BY frame_idx) AS ph
      |      FROM f)
      |SELECT media_id, frame_idx,
      |       CAST(bit_count(xor(h, ph)) AS BIGINT) AS hamming,
      |       bit_count(xor(h, ph)) > 30 AS is_scene_change
      |FROM l WHERE ph IS NOT NULL
      |ORDER BY media_id, frame_idx""".stripMargin) { (s, dir) =>
    val media = Multimodal.asMediaTable(t(s, dir, "documents"), "doc_id",
      "text", "video")
    Multimodal.sceneChanges(Multimodal.stubFrameSample(media, 4),
        hammingThreshold = 30)
      .orderBy("media_id", "frame_idx")
  }

  // Voice-activity segmentation over the sampled frames: runs of
  // consecutive "speech" frames (stub energy = md5 hex lexically >= 'c',
  // ~25% of frames) collapse to segments — the gaps-and-islands
  // run-length grouping every audio corpus needs before transcription.
  // The window partitions by media_id over the frame-count-bounded frame
  // set, never a corpus-cardinality key.
  register(
    "mm_audio_vad",
    """WITH f AS (
      |  SELECT doc_id AS media_id, f AS frame_idx,
      |         md5(text || CAST(f AS VARCHAR)) AS h
      |  FROM documents, range(8) r(f)),
      |sp AS (SELECT media_id, frame_idx,
      |              row_number() OVER (PARTITION BY media_id
      |                                 ORDER BY frame_idx) AS rn
      |       FROM f WHERE h >= 'c')
      |SELECT media_id, min(frame_idx) AS seg_start,
      |       max(frame_idx) AS seg_end,
      |       CAST(count(*) AS BIGINT) AS n_frames
      |FROM sp GROUP BY media_id, frame_idx - rn
      |ORDER BY media_id, seg_start""".stripMargin) { (s, dir) =>
    val media = Multimodal.asMediaTable(t(s, dir, "documents"), "doc_id",
      "text", "audio")
    Multimodal.vadSegments(Multimodal.stubFrameSample(media, 8),
        speechThresholdHex = "c")
      .orderBy("media_id", "seg_start")
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

  // ---------------------------------------------------------------------------
  // Public accessors for SparkEntry
  // ---------------------------------------------------------------------------

  lazy val registry: Map[String, Q] = entries.map { case (k, (f, _)) => k -> f }.toMap
  lazy val oracles: Map[String, String] =
    entries.collect { case (k, (_, Some(o))) => k -> o }.toMap
}
