"""User-journey analytics: multi-touch attribution and recency-decay
scoring over the event stream.

A KG/curation pipeline consumes event journeys twice: attribution
assigns conversion credit to the touch channels that preceded it (the
provenance question "which source earned this outcome"), and
recency-decay scoring ranks entities/users by exponentially
down-weighted recent activity (the freshness prior a crawl scheduler
or source-mixture planner feeds on; reference DeepIE weights relation
evidence per sentence occurrence, rnnRE.py:564-581 — these are the
stream-level analogues).

Engine-portability:

* attribution's linear credit 1/n per touch is a sum of divisions
  over an UNORDERED journey set → the fixed-point rule:
  Σ floor(2^bits·m/n) per channel is an order-free exact long
  (the link_prediction / ANOVA pattern).
* decay weights are EXACT POWERS OF TWO: w = 2^(cap − q) with
  q = age_days div halflife capped at ``cap`` — the weighted sum
  Σ v·2^(cap−q) is a pure exact-long accumulator with denominator
  2^cap, so the final score is one IEEE divide (no pow/exp; libm's
  last-ulp divergence never enters, the weighted_sample rule).

Scale: journeys ride per-USER keyed windows (per-user volume is
bounded in any real event stream — the user_sessions precedent);
every aggregate is a map-side-combinable hash agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def multi_touch_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    scale_bits: int = 20,
) -> DataFrame:
    """First-touch / last-touch / linear attribution per touch channel.

    A *journey* is the run of non-conversion events between two
    conversions of one user (journey j = number of conversions
    strictly before the event, a per-user running count); a journey
    earns credit only if a conversion closes it.  First/last credits
    are exact integer counts via min/max over struct((ts, id), type);
    linear credit 1/n_touches accumulates as
    floor(2^bits·m_channel/n_touches) per (journey, channel) — an
    order-free exact long whose quantization (< journeys·2^−bits) is
    deterministic and engine-identical."""
    is_conv = (F.col(type_col) == conversion_type).cast("long")
    e = events.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).cast("timestamp").alias("t"),
        F.col(id_col).alias("eid"),
        F.col(type_col).alias("ch"),
        is_conv.alias("cv"),
    ).withColumn(
        "journey",
        (
            F.coalesce(
                F.sum("cv").over(
                    W.partitionBy("u")
                    .orderBy(F.col("t"), F.col("eid"))
                    .rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
        ).cast("long"),
    )
    closed = (
        e.filter(F.col("cv") == 1)
        .select("u", "journey")
        .distinct()
    )
    touches = e.filter(F.col("cv") == 0).join(
        closed, ["u", "journey"], "left_semi"
    )
    per_j = touches.groupBy("u", "journey").agg(
        F.count(F.lit(1)).cast("long").alias("n_t"),
        F.min(F.struct("t", "eid", "ch")).alias("first_s"),
        F.max(F.struct("t", "eid", "ch")).alias("last_s"),
    )
    firsts = per_j.groupBy(F.col("first_s.ch").alias("channel")).agg(
        F.count(F.lit(1)).cast("long").alias("first_touch")
    )
    lasts = per_j.groupBy(F.col("last_s.ch").alias("channel")).agg(
        F.count(F.lit(1)).cast("long").alias("last_touch")
    )
    mul = 1 << scale_bits
    per_jc = touches.groupBy("u", "journey", "ch").agg(
        F.count(F.lit(1)).cast("long").alias("m")
    )
    linear = (
        per_jc.join(per_j.select("u", "journey", "n_t"), ["u", "journey"])
        .groupBy(F.col("ch").alias("channel"))
        .agg(
            # exact integer DIV: (m·2^bits) div n — never
            # float-divide-then-floor (CLAUDE.md rule)
            F.sum(F.expr(f"(m * {mul}) div n_t"))
            .cast("long")
            .alias("linear_fp"),
            F.sum("m").cast("long").alias("n_touches"),
        )
    )
    out = (
        linear.join(firsts, "channel", "left")
        .join(lasts, "channel", "left")
        .select(
            "channel",
            "n_touches",
            F.coalesce(F.col("first_touch"), F.lit(0))
            .cast("long")
            .alias("first_touch"),
            F.coalesce(F.col("last_touch"), F.lit(0))
            .cast("long")
            .alias("last_touch"),
            "linear_fp",
            F.round(F.col("linear_fp") / F.lit(float(mul)), 6).alias(
                "linear_credit"
            ),
        )
    )
    return out.orderBy("channel")


def decay_scores(
    events: DataFrame,
    halflife_days: int = 7,
    cap: int = 20,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key exponential recency-decay score with a power-of-two
    half-life: weight = 2^(−age_days div halflife), age relative to
    the global max event day (a broadcast 1-row agg, no driver
    action).  Carried as exact longs Σ cents·2^(cap−q) with q capped
    at ``cap`` (events older than cap·halflife all get the floor
    weight 2^−cap); score = fp/2^cap, one IEEE divide.  Overflow
    bound: Σ cents·2^cap must fit int64 — cents·events_per_key below
    ~2^43·2^−cap; raise halflife or lower cap for larger keys."""
    e = events.select(
        F.col(key_col).alias("k"),
        F.to_date(F.col(ts_col).cast("timestamp")).alias("day"),
        F.round(F.col(value_col) * 100).cast("long").alias("cents"),
    )
    mx = e.agg(F.max("day").alias("maxd"))
    # integer DIV, never float-divide-then-truncate (CLAUDE.md rule)
    q = F.least(
        F.expr(f"datediff(maxd, day) div {halflife_days}").cast("long"),
        F.lit(cap),
    )
    wgt = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST({cap} - _q AS INT))"
    )
    scored = (
        e.crossJoin(F.broadcast(mx))
        .withColumn("_q", q)
        .withColumn("_w", wgt)
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.col("cents") * F.col("_w"))
            .cast("long")
            .alias("decay_fp"),
        )
    )
    return scored.select(
        F.col("k").alias(key_col),
        "n_events",
        "decay_fp",
        F.round(F.col("decay_fp") / F.lit(float(1 << cap)), 6).alias(
            "decay_score"
        ),
    ).orderBy(key_col)


def journey_latency(
    events: DataFrame,
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Time-to-convert per first-touch channel: for every CLOSED
    journey (≥1 touch, ended by a conversion), the latency from the
    first touch to the conversion, aggregated by the first touch's
    channel.  Durations are exact epoch-second longs
    (unix_timestamp floors — the events_moving_avg rule; the DuckDB
    twin must floor(epoch(ts))), the mean one IEEE divide."""
    is_conv = (F.col(type_col) == conversion_type).cast("long")
    e = events.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).cast("timestamp").alias("t"),
        F.col(id_col).alias("eid"),
        F.col(type_col).alias("ch"),
        is_conv.alias("cv"),
    ).withColumn(
        "journey",
        F.coalesce(
            F.sum("cv").over(
                W.partitionBy("u")
                .orderBy(F.col("t"), F.col("eid"))
                .rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("long"),
    )
    conv = e.filter(F.col("cv") == 1).select(
        "u", "journey", F.col("t").alias("conv_t")
    )
    firsts = (
        e.filter(F.col("cv") == 0)
        .groupBy("u", "journey")
        .agg(F.min(F.struct("t", "eid", "ch")).alias("fs"))
        .select(
            "u",
            "journey",
            F.col("fs.t").alias("first_t"),
            F.col("fs.ch").alias("channel"),
        )
    )
    j = firsts.join(conv, ["u", "journey"]).select(
        "channel",
        (
            F.unix_timestamp("conv_t") - F.unix_timestamp("first_t")
        )
        .cast("long")
        .alias("sec"),
    )
    return (
        j.groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_journeys"),
            F.sum("sec").cast("long").alias("total_sec"),
            F.min("sec").cast("long").alias("min_sec"),
            F.max("sec").cast("long").alias("max_sec"),
        )
        .select(
            "channel",
            "n_journeys",
            "total_sec",
            "min_sec",
            "max_sec",
            F.round(F.col("total_sec") / F.col("n_journeys"), 6).alias(
                "mean_sec"
            ),
        )
        .orderBy("channel")
    )


def conversion_lift(
    events: DataFrame,
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-channel conversion lift: for every non-conversion channel,
    P(converted | exposed to channel) / P(converted | not exposed) —
    the exposure-association audit over user-level flags.  Every count
    is an exact long (user flags via distinct (user, channel));
    unexposed counts derive from broadcast totals; rates and lift are
    single IEEE divides over exact longs, NULL-guarded when a side is
    empty or the unexposed rate is zero."""
    uc = events.select(
        F.col(user_col).alias("u"), F.col(type_col).alias("ch")
    ).distinct()
    conv = (
        uc.filter(F.col("ch") == conversion_type)
        .select("u")
        .withColumn("cv", F.lit(1))
    )
    flags = (
        uc.filter(F.col("ch") != conversion_type)
        .join(conv.select("u", "cv"), "u", "left")
        .select("u", "ch", F.coalesce("cv", F.lit(0)).alias("cv"))
    )
    per_ch = flags.groupBy(F.col("ch").alias("channel")).agg(
        F.count(F.lit(1)).cast("long").alias("n_exposed"),
        F.sum("cv").cast("long").alias("n_exposed_conv"),
    )
    totals = (
        events.select(F.col(user_col).alias("u"))
        .distinct()
        .join(conv.select("u", "cv"), "u", "left")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.coalesce(F.sum("cv"), F.lit(0))
            .cast("long")
            .alias("n_conv"),
        )
    )
    j = per_ch.crossJoin(F.broadcast(totals)).select(
        "channel",
        "n_exposed",
        "n_exposed_conv",
        (F.col("n_users") - F.col("n_exposed"))
        .cast("long")
        .alias("n_unexposed"),
        (F.col("n_conv") - F.col("n_exposed_conv"))
        .cast("long")
        .alias("n_unexposed_conv"),
    )
    rate_exp = F.col("n_exposed_conv") / F.col("n_exposed")
    rate_un = F.col("n_unexposed_conv") / F.col("n_unexposed")
    return j.select(
        "channel",
        "n_exposed",
        "n_exposed_conv",
        "n_unexposed",
        "n_unexposed_conv",
        F.when(F.col("n_exposed") > 0, F.round(rate_exp, 6)).alias(
            "rate_exposed"
        ),
        F.when(F.col("n_unexposed") > 0, F.round(rate_un, 6)).alias(
            "rate_unexposed"
        ),
        F.when(
            (F.col("n_exposed") > 0)
            & (F.col("n_unexposed") > 0)
            & (F.col("n_unexposed_conv") > 0),
            F.round(rate_exp / rate_un, 6),
        ).alias("lift"),
    ).orderBy("channel")


def viterbi_decode(
    events: DataFrame,
    emit0: dict[str, int] | None = None,
    emit1: dict[str, int] | None = None,
    stay_score: int = 2,
    switch_score: int = 0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Viterbi MAP decoding of a 2-state HMM over each user's ordered
    event-type sequence — the batch sequence-decoding analogue of the
    reference's per-sentence tag decoding (DeepIE tags each token with
    the argmax label along the sentence, rnnRE.py:500-563; here the
    hidden state is a latent user mode, e.g. browse vs buy-intent,
    and the observation is the event type).

    All scores are INTEGER log-domain weights (emission tables +
    stay/switch transition bonuses), so the forward max-product
    recursion v_t(s) = max_s'(v_{t-1}(s') + tr(s',s)) + em(s, x_t)
    stays in exact longs end-to-end and the DuckDB twin (a recursive
    CTE carrying v0/v1 as columns) is hash-exact.  Emitted per user:
    the two terminal scores, the winning score and state (tie → state
    0, the deterministic convention).

    Plan: ONE groupBy(user) building the array_sort'ed (ts, event_id,
    type) sequence, then a map-only in-row ``aggregate`` fold — no
    per-step shuffle, no window; per-user volume is bounded (the
    journeys-module contract).  At 100 TB the same fold runs
    unchanged — state is O(states) per user, not O(steps)."""
    emit0 = emit0 or {
        "view": 2, "click": 2, "error": 1, "signup": 1, "purchase": 0,
    }
    emit1 = emit1 or {
        "purchase": 3, "signup": 2, "click": 1, "view": 0, "error": 0,
    }

    def emit_expr(table: dict[str, int], x):
        e = F.lit(0).cast("long")
        for k in sorted(table):
            if table[k]:
                e = F.when(x == k, F.lit(table[k]).cast("long")).otherwise(e)
        return e

    seq = (
        events.select(
            F.col(user_col).alias("user_id"),
            F.struct(
                F.col(ts_col).cast("timestamp").alias("ts"),
                F.col(id_col).alias("eid"),
                F.col(type_col).alias("et"),
            ).alias("ev"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.array_sort(F.collect_list("ev")).alias("seq"),
        )
    )
    stay = F.lit(stay_score).cast("long")
    switch = F.lit(switch_score).cast("long")
    fold = F.aggregate(
        F.col("seq"),
        F.struct(
            F.lit(0).cast("long").alias("v0"),
            F.lit(0).cast("long").alias("v1"),
        ),
        lambda acc, x: F.struct(
            (
                F.greatest(acc["v0"] + stay, acc["v1"] + switch)
                + emit_expr(emit0, x["et"])
            ).alias("v0"),
            (
                F.greatest(acc["v0"] + switch, acc["v1"] + stay)
                + emit_expr(emit1, x["et"])
            ).alias("v1"),
        ),
    )
    return seq.select(
        "user_id",
        "n_events",
        fold["v0"].alias("v0"),
        fold["v1"].alias("v1"),
    ).select(
        "user_id",
        "n_events",
        "v0",
        "v1",
        F.greatest(F.col("v0"), F.col("v1")).alias("best_score"),
        F.when(F.col("v1") > F.col("v0"), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("best_state"),
    )


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    conversion_type: str = "purchase",
) -> DataFrame:
    """Batch sessionization by inactivity gap (the batch twin of
    streaming/sessions.py's native session_window): per user, a new
    session starts when the gap to the previous event exceeds
    ``gap_seconds``; emits one row per session with exact-long epoch
    bounds, duration, event and conversion counts.

    Classic gaps-and-islands (the user_scd2 pattern): one per-user
    lag + one per-user running sum of the session-break flags — both
    KEYED windows (bounded per-user volume, never single-partition) —
    then one hash agg.  Timestamps ride unix_timestamp (floors; the
    DuckDB twin must floor(epoch(ts)) — the events_moving_avg rule),
    so every output value is an exact long."""
    w = W.partitionBy("u").orderBy("ets", "eid")
    e = events.select(
        F.col(user_col).alias("u"),
        F.unix_timestamp(F.col(ts_col).cast("timestamp"))
        .cast("long")
        .alias("ets"),
        F.col(id_col).alias("eid"),
        (F.col(type_col) == conversion_type).cast("long").alias("is_conv"),
    )
    flagged = e.withColumn(
        "brk",
        F.when(
            F.lag("ets").over(w).isNull()
            | ((F.col("ets") - F.lag("ets").over(w)) > gap_seconds),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long"),
    ).withColumn("session_idx", F.sum("brk").over(w).cast("long"))
    return (
        flagged.groupBy("u", "session_idx")
        .agg(
            F.min("ets").cast("long").alias("session_start"),
            F.max("ets").cast("long").alias("session_end"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("is_conv").cast("long").alias("n_conversions"),
        )
        .select(
            F.col("u").alias(user_col),
            "session_idx",
            "session_start",
            "session_end",
            (F.col("session_end") - F.col("session_start"))
            .cast("long")
            .alias("duration_sec"),
            "n_events",
            "n_conversions",
        )
    )


def ordered_funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Strictly-ordered funnel completion: per user, the EARLIEST
    chain of events matching ``steps`` in order, each step strictly
    after the previous one in (ts, event_id) order (the greedy
    earliest chain — optimal for ordered funnels: taking the earliest
    feasible step never forecloses a later one).  Emits only users
    who complete every step, with per-step exact-long epochs and the
    total latency — the completion-latency companion to
    event_funnel's reach counts.

    Plan: one filtered argmin agg per step (k−1 broadcast-sized
    per-user joins, no window, no self-join explosion); step
    ordering uses lexicographic struct comparison, portable as
    DuckDB row comparison."""
    if len(steps) < 2:
        raise ValueError("need at least 2 funnel steps")
    e = events.select(
        F.col(user_col).alias("u"),
        F.unix_timestamp(F.col(ts_col).cast("timestamp"))
        .cast("long")
        .alias("ets"),
        F.col(id_col).alias("eid"),
        F.col(type_col).alias("et"),
    )
    cur = (
        e.filter(F.col("et") == steps[0])
        .groupBy("u")
        .agg(F.min(F.struct("ets", "eid")).alias("k0"))
    )
    for i, step in enumerate(steps[1:], start=1):
        nxt = e.filter(F.col("et") == step).select(
            "u", F.struct("ets", "eid").alias("cand")
        )
        cur = (
            nxt.join(cur, "u")
            .filter(F.col("cand") > F.col(f"k{i - 1}"))
            .groupBy("u", *[f"k{j}" for j in range(i)])
            .agg(F.min("cand").alias(f"k{i}"))
        )
    out_cols = [F.col("u").alias(user_col)]
    for i, step in enumerate(steps):
        out_cols.append(F.col(f"k{i}")["ets"].alias(f"t_{step}"))
    out_cols.append(
        (
            F.col(f"k{len(steps) - 1}")["ets"] - F.col("k0")["ets"]
        ).cast("long").alias("latency_sec")
    )
    return cur.select(*out_cols)
