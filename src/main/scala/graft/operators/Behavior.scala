package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Behavioral event-sequence analytics — the funnel/cohort staples a
  * scheduled-query surface is expected to answer over the historical
  * store (the reference delegates these shapes to Athena SQL;
  * sample/athena.py runs windowed per-entity aggregations of the same
  * family).
  *
  * Both operators work in integer epoch arithmetic end-to-end
  * (unix_micros — exactly DuckDB's epoch_us over the normalized
  * timestamps), so results are engine- and partitioning-independent.
  */
object Behavior {

  /** Ordered funnel conversion: how many users reached step 1, then step
    * 2 STRICTLY AFTER their step-1 time, then step 3 after step 2, …
    *
    * Shape: step i is a conditional min — filter to step-i events, join
    * the (user, t_{i-1}) frame, keep events after t_{i-1}, min per user.
    * Each hop shuffles only (user, micros) pairs for ONE event type; no
    * per-user event array is ever collected, so a power user with
    * millions of events costs the same as anyone else (contrast the
    * collect_list-then-fold funnel, which OOMs on skew). The final
    * counts are one row per step, unpivoted from a single aggregate.
    *
    * Returns (step_idx, step, n_users) with step_idx 1-based. */
  def funnelCounts(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String],
      stepWithinMicros: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val e = events.select(col(userCol).as("user"),
      unix_micros(col(tsCol)).as("tus"), col(typeCol).as("typ"))
    // (user, t_i) per step: t_i = min step-i event time after t_{i-1}
    // (and within the optional per-step conversion window)
    val upperBound = stepWithinMicros
      .map(w => col("e.tus") <= col("p.t") + w).getOrElse(lit(true))
    val reached: Seq[DataFrame] = steps.zipWithIndex
      .scanLeft(Option.empty[DataFrame]) { case (prev, (step, _)) =>
        Some(prev match {
          case None =>
            e.where(col("typ") === step)
              .groupBy("user").agg(min(col("tus")).as("t"))
          case Some(p) =>
            e.where(col("typ") === step).as("e")
              .join(p.as("p"), col("e.user") === col("p.user") &&
                col("e.tus") > col("p.t") && upperBound)
              .groupBy(col("e.user")).agg(min(col("e.tus")).as("t"))
        })
      }.flatten
    // one wide row of per-step user counts, then unpivot to rows
    val base = reached.head.select(col("user"), col("t").as("t0"))
    val wide = reached.tail.zipWithIndex.foldLeft(base) {
      case (acc, (r, i)) =>
        acc.join(r.select(col("user"), col("t").as(s"t${i + 1}")),
          Seq("user"), "left")
    }
    val countCols = steps.indices.map(i => count(col(s"t$i")).as(s"n$i"))
    val stepRows = steps.zipWithIndex.map { case (step, i) =>
      struct(lit(i + 1).as("step_idx"), lit(step).as("step"),
        col(s"n$i").cast("long").as("n_users"))
    }
    wide.agg(countCols.head, countCols.tail: _*)
      .select(explode(array(stepRows: _*)).as("r"))
      .select(col("r.step_idx"), col("r.step"), col("r.n_users"))
  }

  /** Chat-transcript FORMAT validation — the instruction-data QA gate:
    * a multi-turn dialogue ships to training only if roles strictly
    * alternate, the conversation opens with the user and closes with the
    * assistant. `roleCol` must evaluate to 'user'/'assistant' per turn;
    * turns order by (tsCol, tieCol) — the tie column (an event/turn id)
    * makes the ordering total, so verdicts are engine-exact.
    *
    * Scale shape: ONE hash exchange on the conversation key serves all
    * three windows (lag + first-rank + last-rank — same partitioning,
    * the SCD2 shared-exchange pattern), then one pre-combined agg;
    * per-conversation partitions are turn-count-bounded. Returns
    * (conv_id, n_turns, n_repeats, starts_user, ends_assistant,
    * valid). */
  def validateDialogues(events: DataFrame, convCol: String, tsCol: String,
      roleCol: Column, tieCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wAsc = Window.partitionBy(col("conv_id"))
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    val wDesc = Window.partitionBy(col("conv_id"))
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    events
      .select(col(convCol).as("conv_id"), col(tsCol), col(tieCol),
        roleCol.as("__role"))
      .withColumn("__prev", lag(col("__role"), 1).over(wAsc))
      .withColumn("__rn", row_number().over(wAsc))
      .withColumn("__rnd", row_number().over(wDesc))
      .groupBy("conv_id")
      .agg(count(lit(1)).as("n_turns"),
        sum(when(col("__prev") === col("__role"), 1).otherwise(0))
          .cast("long").as("n_repeats"),
        max(when(col("__rn") === 1, col("__role"))).as("__first"),
        max(when(col("__rnd") === 1, col("__role"))).as("__last"))
      .select(col("conv_id"), col("n_turns"), col("n_repeats"),
        (col("__first") === "user").as("starts_user"),
        (col("__last") === "assistant").as("ends_assistant"),
        (col("n_repeats") === 0 && col("__first") === "user" &&
          col("__last") === "assistant").as("valid"))
  }

  /** Chat-template rendering with loss-mask spans — the SFT-data prep
    * step that turns ordered conversation turns into one packed training
    * string plus the character spans a trainer unmasks (assistant
    * content + end marker only, the standard SFT loss mask). Each turn
    * renders as `<|role|>\ncontent<|end|>\n`; a turn's assistant span
    * starts after its role header (`len(role) + 5` chars in) and runs to
    * the end of the rendered turn. Spans emit as a `"start:end;…"`
    * 0-based char-offset string (null when a conversation has no
    * assistant turn), so the result stays flat and hash-comparable.
    *
    * Scale shape: ONE shuffle — turns group to their conversation (text
    * must colocate to concatenate; that is the operator's essential
    * cost), then rendering, prefix-sum offsets, and span extraction are
    * all scan-side array expressions on turn-count-bounded rows. No
    * window functions, no UDFs, no second exchange.
    *
    * Reference: rendering mirrors the alert-to-payload template pass
    * (streamalert/alert_processor/outputs/output_base.py formats ordered
    * record fields into one publishable body); the loss-mask span
    * emission is the training-pipeline extension. */
  def renderChatTemplate(events: DataFrame, convCol: String, tsCol: String,
      roleCol: Column, contentCol: Column, tieCol: String): DataFrame = {
    val conv = events
      .select(col(convCol).as("conv_id"), col(tsCol).as("__ts"),
        col(tieCol).as("__tie"), roleCol.as("__role"),
        contentCol.as("__content"))
      .groupBy("conv_id")
      .agg(sort_array(collect_list(struct(col("__ts"), col("__tie"),
        col("__role").as("role"), col("__content").as("content"))))
        .as("__turns"))
    val parts = transform(col("__turns"), t => concat(lit("<|"),
      t.getField("role"), lit("|>\n"), t.getField("content"),
      lit("<|end|>\n")))
    val withParts = conv.select(col("conv_id"), col("__turns"),
      parts.as("__parts"))
    // prefix starts [0, l1, l1+l2, …]: n+1 entries, last = total chars
    val offs = aggregate(col("__parts"), array(lit(0L)),
      (acc, p) => concat(acc, array(element_at(acc, -1) +
        length(p).cast("long"))))
    val enriched = withParts.select(col("conv_id"), col("__turns"),
      col("__parts"), offs.as("__offs"))
    val spans = zip_with(col("__turns"),
      zip_with(col("__parts"), slice(col("__offs"), lit(1), size(col("__parts"))),
        (p, st) => struct(st.as("st"),
          (st + length(p).cast("long")).as("en"))),
      (t, se) => struct(t.getField("role").as("role"),
        (se.getField("st") + length(t.getField("role")).cast("long") + 5L)
          .as("cs"),
        se.getField("en").as("en")))
    val aspans = filter(spans, s => s.getField("role") === "assistant")
    enriched.select(
      col("conv_id"),
      size(col("__turns")).cast("long").as("n_turns"),
      element_at(col("__offs"), -1).as("n_chars"),
      array_join(col("__parts"), "").as("text"),
      nullif(array_join(transform(aspans,
        s => concat(s.getField("cs").cast("string"), lit(":"),
          s.getField("en").cast("string"))), ";"), lit("")).as("assistant_spans"),
      aggregate(aspans, lit(0L),
        (a, s) => a + (s.getField("en") - s.getField("cs")))
        .as("assistant_chars"))
  }

  /** First-order Markov transition matrix over per-user event sequences:
    * for each ordered (prev_type → next_type) adjacent pair, the count and
    * the transition probability P(next | prev).
    *
    * Shape: ONE window shuffle keyed by user (lead over (micros, event id)
    * — the id tie-break makes simultaneous events deterministic), then one
    * pre-combined (prev, next) count agg; the per-prev total folds back as
    * a window over the event-type-cardinality matrix, so nothing after
    * the first window is corpus-sized. Probability = count/total computed
    * by one double division over exact integer counts, rounded at 6 dp —
    * engine-identical.
    *
    * Returns (prev_type, next_type, n, p) ordered by (prev, next). */
  def markovTransitions(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user").orderBy(col("tus"), col("id"))
    val pairs = events
      .select(col(userCol).as("user"), unix_micros(col(tsCol)).as("tus"),
        col(idCol).as("id"), col(typeCol).as("typ"))
      .withColumn("next_type", lead(col("typ"), 1).over(w))
      .where(col("next_type").isNotNull)
      .groupBy(col("typ").as("prev_type"), col("next_type"))
      .agg(count(lit(1)).as("n"))
    val perPrev = Window.partitionBy("prev_type")
    pairs
      .withColumn("p", round(col("n").cast("double") /
        sum(col("n")).over(perPrev).cast("double"), 6))
      .orderBy("prev_type", "next_type")
  }

  /** Weekly cohort retention: users are cohorted by the epoch-week of
    * their FIRST event; for each (cohort_week, week_offset ≤ maxOffset)
    * cell, the count of distinct cohort members active that week.
    * Epoch weeks are integer micros divided by 604800e6 — no calendar
    * functions, so Spark and any SQL engine agree bit-for-bit.
    *
    * Shape: one (user → min week) aggregate, one skinny (user, week)
    * join back, one grouped count-distinct — shuffles carry ids and
    * 8-byte week numbers only. */
  def retentionCohorts(events: DataFrame, userCol: String, tsCol: String,
      maxOffset: Int = 3): DataFrame = {
    // SQL `div` = exact integer floor division, matching DuckDB's `//`
    val weeks = events
      .select(col(userCol).as("user"), unix_micros(col(tsCol)).as("tus"))
      .select(col("user"), expr("tus div 604800000000").as("wk")).distinct()
    val cohorts = weeks.groupBy("user").agg(min(col("wk")).as("cohort_wk"))
    weeks.join(cohorts, "user")
      .withColumn("week_offset", col("wk") - col("cohort_wk"))
      .where(col("week_offset") <= maxOffset)
      .groupBy("cohort_wk", "week_offset")
      .agg(count_distinct(col("user")).as("n_users"))
  }
}
