"""Journey analytics (attribution, decay), rank statistics (Kendall
τ-b, Kruskal-Wallis), KMV sketches and MAP@k — python-twin exactness
plus property checks.
"""

import pytest
from pyspark.sql import functions as F

from deepie_spark.functions.text import BASE, MOD


def _py_hash(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * BASE + ord(ch)) % MOD
    return h


# ---------------------------------------------------------------- stats


def test_kendall_tau_b_python_twin(spark):
    from deepie_spark.operators.stats import kendall_tau_b

    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]
    ys = [2, 7, 1, 8, 2, 8, 1, 8, 2, 8, 4]
    df = spark.createDataFrame(
        [(x, y) for x, y in zip(xs, ys)], "x long, y long"
    )
    r = kendall_tau_b(df, "x", "y").collect()[0]
    n = len(xs)
    conc = disc = 0
    for i in range(n):
        for j in range(i + 1, n):
            s = (xs[i] - xs[j]) * (ys[i] - ys[j])
            conc += s > 0
            disc += s < 0
    tie_x2 = sum(
        t * (t - 1) for t in __import__("collections").Counter(xs).values()
    )
    tie_y2 = sum(
        t * (t - 1) for t in __import__("collections").Counter(ys).values()
    )
    assert (r.n, r.conc, r.disc) == (n, conc, disc)
    assert (r.tie_x2, r.tie_y2) == (tie_x2, tie_y2)
    n0 = n * (n - 1) // 2
    tau = (conc - disc) / ((n0 - tie_x2 // 2) * (n0 - tie_y2 // 2)) ** 0.5
    # operator rounds to 6; the twin's halved-vs-doubled formulation
    # may differ in the last ulp before rounding
    assert abs(r.tau_b - tau) < 1e-6


def test_kendall_tau_b_perfect_orders(spark):
    from deepie_spark.operators.stats import kendall_tau_b

    df = spark.createDataFrame(
        [(i, i * 10) for i in range(20)], "x long, y long"
    )
    assert kendall_tau_b(df, "x", "y").collect()[0].tau_b == 1.0
    rev = spark.createDataFrame(
        [(i, -i) for i in range(20)], "x long, y long"
    )
    assert kendall_tau_b(rev, "x", "y").collect()[0].tau_b == -1.0


def test_kruskal_wallis_python_twin(spark):
    from deepie_spark.operators.stats import kruskal_wallis

    groups = {
        "a": [12, 15, 15, 20, 22, 15],
        "b": [25, 30, 12, 28, 15],
        "c": [18, 19, 20, 21, 22, 23, 24],
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    r = kruskal_wallis(df, "g", "v").collect()[0]
    # python twin with average ranks
    allv = sorted(v for vs in groups.values() for v in vs)
    n = len(allv)
    import collections

    cnt = collections.Counter(allv)
    avg_rank = {}
    lo = 1
    for v in sorted(cnt):
        c = cnt[v]
        avg_rank[v] = (lo + lo + c - 1) / 2
        lo += c
    h = 12 / (n * (n + 1)) * sum(
        sum(avg_rank[v] for v in vs) ** 2 / len(vs)
        for vs in groups.values()
    ) - 3 * (n + 1)
    ties = sum(c**3 - c for c in cnt.values())
    h_adj = h / (1 - ties / (n**3 - n))
    assert r.k == 3 and r.n == n and r.tie_sum == ties
    # fixed-point quantization < k·2^-20 in the Σ R²/n term → H
    # matches the float twin well inside round-6
    assert abs(r.h_stat - h) < 1e-4
    assert abs(r.h_adj - h_adj) < 1e-4


def test_kruskal_wallis_identical_groups_zero(spark):
    from deepie_spark.operators.stats import kruskal_wallis

    rows = [(g, v) for g in ("a", "b") for v in (1, 2, 3, 4, 5)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = kruskal_wallis(df, "g", "v").collect()[0]
    assert abs(r.h_stat) < 1e-4  # identical distributions → H ≈ 0


# ----------------------------------------------------------------- kmv


def test_kmv_exact_sets(spark):
    from deepie_spark.operators.sketches import kmv_compare

    a = [f"tok{i}" for i in range(40)]
    b = [f"tok{i}" for i in range(20, 60)]  # |A∩B| = 20, |A∪B| = 60
    rows = [("A", t) for t in a] + [("B", t) for t in b]
    df = spark.createDataFrame(rows, "g string, k string")
    out = kmv_compare(df, "g", "k", k=64).collect()
    assert len(out) == 1
    r = out[0]
    # both sets smaller than k → the sketches ARE the sets: every
    # estimate exact
    assert (r.sk_a, r.sk_b) == (40, 40)
    assert (r.est_a, r.est_b) == (40.0, 40.0)
    assert r.union_n == 60 and r.n_both == 20
    assert r.jaccard_est == round(20 / 60, 6)
    # kth = true max hash of each set
    assert r.kth_a == max(_py_hash(t) for t in a)
    assert r.kth_b == max(_py_hash(t) for t in b)


def test_kmv_bottom_k_matches_python(spark):
    from deepie_spark.operators.sketches import kmv_compare

    k = 16
    a = [f"w{i}" for i in range(200)]
    b = [f"w{i}" for i in range(100, 300)]
    rows = [("A", t) for t in a] + [("B", t) for t in b]
    df = spark.createDataFrame(rows, "g string, k string")
    r = kmv_compare(df, "g", "k", k=k).collect()[0]
    ha = sorted({_py_hash(t) for t in a})[:k]
    hb = sorted({_py_hash(t) for t in b})[:k]
    assert r.kth_a == ha[-1] and r.kth_b == hb[-1]
    assert r.est_a == round((k - 1) * MOD / ha[-1], 6)
    union_k = sorted(set(ha) | set(hb))[:k]
    both = sum(1 for h in union_k if h in set(ha) and h in set(hb))
    assert r.union_n == len(union_k) and r.n_both == both


# --------------------------------------------------------------- map@k


def test_map_at_k_hand_example(spark):
    from deepie_spark.operators.retrieval import map_at_k

    # ranking by score desc: doc1(rel), doc2, doc3(rel), doc4, doc5
    cand = spark.createDataFrame(
        [
            (1, 1, 5.0),
            (2, 0, 4.0),
            (3, 1, 3.0),
            (4, 0, 2.0),
            (5, 0, 1.0),
        ],
        "doc_id long, rel long, score double",
    )
    r = map_at_k([("q", cand)], k=10).collect()[0]
    # AP = (1/1 + 2/3) / 2 = 5/6
    assert r.r_total == 2
    assert r.ap_num == 2520 + 2 * (2520 // 3)
    assert r.ap_den == 2520 * 2
    assert r.ap == round(5 / 6, 6)


def test_map_at_k_no_relevant_null(spark):
    from deepie_spark.operators.retrieval import map_at_k

    cand = spark.createDataFrame(
        [(1, 0, 2.0), (2, 0, 1.0)], "doc_id long, rel long, score double"
    )
    r = map_at_k([("q", cand)], k=10).collect()[0]
    assert r.ap is None and r.ap_num == 0


def test_map_at_k_perfect_ranking(spark):
    from deepie_spark.operators.retrieval import map_at_k

    rows = [(i, 1 if i <= 3 else 0, 100.0 - i) for i in range(1, 21)]
    cand = spark.createDataFrame(rows, "doc_id long, rel long, score double")
    r = map_at_k([("q", cand)], k=10).collect()[0]
    assert r.ap == 1.0  # all 3 relevant docs ranked first


# --------------------------------------------------------- attribution


def _ev(uid, sec, eid, etype):
    import datetime

    return (
        eid,
        datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=sec),
        uid,
        etype,
        1.0,
    )


_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double"
)


def test_attribution_hand_journey(spark):
    from deepie_spark.operators.journeys import multi_touch_attribution

    rows = [
        # user 1, journey 0: view, click, view → purchase
        _ev(1, 10, 1, "view"),
        _ev(1, 20, 2, "click"),
        _ev(1, 30, 3, "view"),
        _ev(1, 40, 4, "purchase"),
        # user 1, journey 1: click → purchase
        _ev(1, 50, 5, "click"),
        _ev(1, 60, 6, "purchase"),
        # user 1 trailing touches, never converted → no credit
        _ev(1, 70, 7, "view"),
        # user 2: touches with no purchase at all → no credit
        _ev(2, 10, 8, "click"),
    ]
    df = spark.createDataFrame(rows, _EV_SCHEMA)
    out = {
        r.channel: r
        for r in multi_touch_attribution(df, "purchase").collect()
    }
    assert set(out) == {"view", "click"}
    # journey 0: first=view(1), last=view(3); journey 1: click both
    assert out["view"].first_touch == 1
    assert out["view"].last_touch == 1
    assert out["click"].first_touch == 1
    assert out["click"].last_touch == 1
    # linear: j0 view 2/3, click 1/3; j1 click 1
    m = 1 << 20
    assert out["view"].linear_fp == (2 * m) // 3
    assert out["click"].linear_fp == (1 * m) // 3 + m
    assert out["view"].n_touches == 2 and out["click"].n_touches == 2


def test_attribution_conversion_first_event(spark):
    from deepie_spark.operators.journeys import multi_touch_attribution

    # purchase with NO preceding touches → zero credit rows
    rows = [_ev(1, 10, 1, "purchase"), _ev(1, 20, 2, "view")]
    df = spark.createDataFrame(rows, _EV_SCHEMA)
    assert multi_touch_attribution(df, "purchase").collect() == []


def test_decay_scores_hand_example(spark):
    from deepie_spark.operators.journeys import decay_scores

    import datetime

    def ev(uid, day, eid, cents):
        return (
            eid,
            datetime.datetime(2024, 1, day),
            uid,
            "view",
            cents / 100.0,
        )

    rows = [
        ev(1, 30, 1, 100),  # age 0  → q=0 → weight 1
        ev(1, 22, 2, 100),  # age 8  → q=1 → weight 1/2
        ev(1, 1, 3, 100),   # age 29 → q=4 → weight 1/16
        ev(2, 30, 4, 700),  # age 0
    ]
    df = spark.createDataFrame(rows, _EV_SCHEMA)
    out = {r.user_id: r for r in decay_scores(df).collect()}
    m = 1 << 20
    assert out[1].decay_fp == 100 * m + 100 * (m // 2) + 100 * (m // 16)
    assert out[1].decay_score == round(100 + 50 + 6.25, 6)
    assert out[2].decay_fp == 700 * m and out[2].decay_score == 700.0


# ------------------------------------------------------------- simrank


def test_simrank_square_graph(spark):
    from deepie_spark.operators.graph import simrank_pairs

    # 4-cycle a-b-c-d-a: the textbook SimRank example.  Only the two
    # diagonals share neighbors; every degree is 2.  C = 1/4.
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")],
        "src string, dst string",
    )
    out = {(r.node_a, r.node_b): r
           for r in simrank_pairs(edges).collect()}
    assert set(out) == {("a", "c"), ("b", "d")}
    r = out[("a", "c")]
    # s1 = C·|common|/(d_a·d_c) = 0.25·2/4 = 0.125
    assert r.common == 2
    assert r.s1_fp == (2 * (1 << 40)) // (4 * 2 * 2)
    # s2 = C·(1 + 0.125 + 0.125 + 1)/4 = 0.140625
    s1 = r.s1_fp
    s_sum = 2 * (1 << 40) + 2 * s1
    assert r.s2_fp == s_sum // (4 * 2 * 2)
    assert abs(r.s2 - 0.140625) < 1e-6


def test_simrank_star_graph(spark):
    from deepie_spark.operators.graph import simrank_pairs

    # star: leaves all share the hub → pairwise s1 = C = 1/4 exactly
    edges = spark.createDataFrame(
        [("h", "l1"), ("h", "l2"), ("h", "l3")], "src string, dst string"
    )
    out = {(r.node_a, r.node_b): r
           for r in simrank_pairs(edges).collect()}
    assert len(out) == 3  # leaf pairs only
    for r in out.values():
        assert r.s1_fp == (1 << 40) // 4
        # s2: N(l_i)={h} → S = s1full(h,h) = 2^40 → s2 = C again
        assert r.s2_fp == (1 << 40) // 4


# ------------------------------------------------------------ soundex


def _py_soundex(name: str):
    import re

    sl = re.sub(r"[^A-Za-z]", "", name).lower()
    if not sl:
        return None
    body = sl[0] + re.sub(r"[hw]", "", sl[1:])
    smap = "01230120022455012623010202"
    codes = [smap[ord(c) - 97] for c in body]
    collapsed = [
        c for i, c in enumerate(codes) if i == 0 or c != codes[i - 1]
    ]
    digits = [c for c in collapsed[1:] if c != "0"]
    return sl[0].upper() + "".join(digits[:3]).ljust(3, "0")


def test_soundex_textbook_examples(spark):
    from deepie_spark.functions.text import soundex_key

    cases = {
        "Robert": "R163",
        "Rupert": "R163",
        "Ashcraft": "A261",
        "Ashcroft": "A261",
        "Tymczak": "T522",
        "Pfister": "P236",
        "Honeyman": "H555",
        "a": "A000",
        "123": None,
    }
    df = spark.createDataFrame([(k,) for k in cases], "name string")
    got = {
        r.name: r.key
        for r in df.select(
            "name", soundex_key(F.col("name")).alias("key")
        ).collect()
    }
    for name, want in cases.items():
        assert got[name] == want, (name, got[name], want)
        assert _py_soundex(name) == want


def test_soundex_python_twin_randomized(spark):
    import random

    from deepie_spark.functions.text import soundex_key

    rng = random.Random(7)
    names = [
        "".join(
            rng.choice("abcdefghijklmnopqrstuvwxyz")
            for _ in range(rng.randint(1, 12))
        )
        for _ in range(200)
    ]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = {
        r.name: r.key
        for r in df.select(
            "name", soundex_key(F.col("name")).alias("key")
        ).collect()
    }
    for n in set(names):
        assert got[n] == _py_soundex(n), n


# ----------------------------------------------------- journey latency


def test_journey_latency_hand(spark):
    from deepie_spark.operators.journeys import journey_latency

    rows = [
        _ev(1, 10, 1, "view"),
        _ev(1, 40, 2, "purchase"),  # latency 30s, first touch view
        _ev(1, 100, 3, "click"),
        _ev(1, 130, 4, "view"),
        _ev(1, 160, 5, "purchase"),  # latency 60s, first touch click
        _ev(2, 10, 6, "purchase"),  # no touches → excluded
    ]
    df = spark.createDataFrame(rows, _EV_SCHEMA)
    out = {r.channel: r for r in journey_latency(df).collect()}
    assert set(out) == {"view", "click"}
    assert out["view"].n_journeys == 1 and out["view"].total_sec == 30
    assert out["click"].n_journeys == 1 and out["click"].total_sec == 60
    assert out["click"].mean_sec == 60.0


# ------------------------------------------------------------ ccf/ewma


def test_ccf_detects_lead(spark):
    from deepie_spark.operators.stats import ccf_exact

    # y is x shifted forward by 2: perfect correlation at lag +2
    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9, 3]
    n = len(xs)
    sx = spark.createDataFrame(
        [(i + 1, v) for i, v in enumerate(xs)], "idx long, y long"
    )
    sy = spark.createDataFrame(
        [(i + 3, v) for i, v in enumerate(xs)], "idx long, y long"
    )
    out = {r.lag: r for r in ccf_exact(sx, sy, "idx", "y", 3).collect()}
    assert out[2].ccf == 1.0
    assert out[2].n == n  # full overlap at the true lag
    # python-twin check at lag 0
    import statistics

    pairs = [
        (xs[i], xs[i - 2]) for i in range(2, n)
    ]  # y_{i} = x_{i-2} on the shared index
    px = [a for a, _ in pairs]
    py = [b for _, b in pairs]
    r0 = out[0]
    mxp = statistics.correlation(px, py)
    assert abs(r0.ccf - mxp) < 1e-6  # operator rounds to 6


def test_ewma_hand_example(spark):
    from deepie_spark.operators.stats import ewma_smooth

    vals = [4, 8, 2, 6]
    s = spark.createDataFrame(
        [(i + 1, v) for i, v in enumerate(vals)], "idx long, y long"
    )
    out = {r.idx: r for r in ewma_smooth(s, "idx", "y", window=4).collect()}
    # idx 4: num = 6·2^3 + 2·2^2 + 8·2^1 + 4·2^0 = 48+8+16+4 = 76
    assert out[4].num == 76 and out[4].n_terms == 4
    assert out[4].ewma == round(76 / 16, 6)
    # idx 1: only one term, weight 2^3
    assert out[1].num == 4 * 8 and out[1].n_terms == 1


def test_ewma_window_validation(spark):
    from deepie_spark.operators.stats import ewma_smooth

    s = spark.createDataFrame([(1, 1)], "idx long, y long")
    with pytest.raises(ValueError):
        ewma_smooth(s, "idx", "y", window=0)
    with pytest.raises(ValueError):
        ewma_smooth(s, "idx", "y", window=63)


# ------------------------------------------------------- collocations


def test_logdice_hand_corpus(spark):
    import math

    from deepie_spark.operators.skipgram import collocations_logdice

    docs = spark.createDataFrame(
        [("hash join runs fast",)] * 5 + [("hash table",)] * 3,
        "text string",
    )
    out = {
        (r.x, r.y): r
        for r in collocations_logdice(docs, min_count=5).collect()
    }
    assert ("hash", "join") in out
    r = out[("hash", "join")]
    assert (r.f_xy, r.f_x, r.f_y) == (5, 8, 5)
    want = 14.0 + math.log2(2 * 5 / (8 + 5))
    assert abs(r.logdice - want) < 1e-6
    # below min_count is excluded
    assert ("hash", "table") not in out


# ---------------------------------------------------- conversion lift


def test_conversion_lift_hand(spark):
    from deepie_spark.operators.journeys import conversion_lift

    rows = [
        # users 1, 2 saw clicks; user 1 converted
        _ev(1, 10, 1, "click"),
        _ev(1, 20, 2, "purchase"),
        _ev(2, 10, 3, "click"),
        # users 3, 4 no click; user 3 converted
        _ev(3, 10, 4, "view"),
        _ev(3, 20, 5, "purchase"),
        _ev(4, 10, 6, "view"),
    ]
    df = spark.createDataFrame(rows, _EV_SCHEMA)
    out = {r.channel: r for r in conversion_lift(df).collect()}
    ck = out["click"]
    assert (ck.n_exposed, ck.n_exposed_conv) == (2, 1)
    assert (ck.n_unexposed, ck.n_unexposed_conv) == (2, 1)
    assert ck.lift == 1.0  # same rate both sides
    vw = out["view"]
    assert (vw.n_exposed, vw.n_exposed_conv) == (2, 1)
    assert (vw.n_unexposed, vw.n_unexposed_conv) == (2, 1)


# ------------------------------------------------------ hop histogram


def test_hop_histogram_path_graph(spark):
    from deepie_spark.operators.graph import hop_histogram

    # path a-b-c-d: hop 1 ×3, hop 2 ×2, hop 3 ×1
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string"
    )
    out = {r.hop: r for r in hop_histogram(edges, max_hops=4).collect()}
    assert {h: out[h].n_pairs for h in out} == {1: 3, 2: 2, 3: 1}
    assert out[3].cum_pairs == 6 and out[3].total == 6
    assert out[3].share == 1.0 and out[3].reach90
    assert not out[2].reach90  # 5/6 < 0.9
    assert out[1].share == 0.5


def test_viterbi_hand_sequence(spark):
    """Hand-decoded 2-state HMM: default tables, stay=2/switch=0.
    Sequence view,click,purchase,purchase for one user."""
    from datetime import datetime

    from deepie_spark.operators.journeys import viterbi_decode

    ts = lambda m: datetime(2026, 1, 1, 0, m)  # noqa: E731
    rows = [
        (1, ts(0), 7, "view"),
        (1, ts(1), 8, "click"),
        (1, ts(2), 9, "purchase"),
        (1, ts(3), 10, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    # forward max-product by hand:
    # t1 view:      v0 = max(0+2,0+0)+2 = 4;  v1 = max(0+0,0+2)+0 = 2
    # t2 click:     v0 = max(4+2,2+0)+2 = 8;  v1 = max(4+0,2+2)+1 = 5
    # t3 purchase:  v0 = max(8+2,5+0)+0 = 10; v1 = max(8+0,5+2)+3 = 11
    # t4 purchase:  v0 = max(10+2,11+0)+0 = 12; v1 = max(10,13)+3 = 16
    r = viterbi_decode(df).collect()[0]
    assert (r.v0, r.v1) == (12, 16)
    assert r.best_score == 16 and r.best_state == 1
    assert r.n_events == 4


def test_viterbi_python_twin_random(spark):
    """Random event streams vs a reference python Viterbi; also
    pins partition invariance (fold is per-user in-row)."""
    import random
    from datetime import datetime, timedelta

    from deepie_spark.operators.journeys import viterbi_decode

    emit0 = {"view": 2, "click": 2, "error": 1, "signup": 1, "purchase": 0}
    emit1 = {"purchase": 3, "signup": 2, "click": 1, "view": 0, "error": 0}
    types = sorted(emit0)
    rng = random.Random(11)
    rows = []
    eid = 0
    for u in range(9):
        for k in range(rng.randint(1, 25)):
            rows.append(
                (
                    u,
                    datetime(2026, 2, 1) + timedelta(minutes=eid),
                    eid,
                    rng.choice(types),
                )
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )

    def pyviterbi(seq):
        v0 = v1 = 0
        for t in seq:
            v0, v1 = (
                max(v0 + 2, v1 + 0) + emit0[t],
                max(v0 + 0, v1 + 2) + emit1[t],
            )
        return v0, v1

    want = {}
    for u in range(9):
        seq = [t for (uu, _, _, t) in sorted(rows) if uu == u]
        want[u] = pyviterbi(seq)
    got = {r.user_id: (r.v0, r.v1) for r in viterbi_decode(df).collect()}
    assert got == want
    got7 = {
        r.user_id: (r.v0, r.v1)
        for r in viterbi_decode(df.repartition(7)).collect()
    }
    assert got7 == want


def test_sessionize_hand_gaps(spark):
    """Two users; gaps > 30 min split sessions; bounds/durations and
    conversion counts are exact."""
    from datetime import datetime, timedelta

    from deepie_spark.operators.journeys import sessionize

    t0 = datetime(2026, 4, 1, 12, 0, 0)
    m = lambda k: t0 + timedelta(minutes=k)  # noqa: E731
    rows = [
        (1, m(0), 1, "view"),
        (1, m(10), 2, "purchase"),
        (1, m(41), 3, "click"),      # 31 min gap -> new session
        (2, m(0), 4, "view"),
        (2, m(30), 5, "view"),       # exactly 1800 s -> SAME session
        (2, m(61), 6, "purchase"),   # 31 min -> new session
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    got = {(r.user_id, r.session_idx): r for r in sessionize(df).collect()}
    assert len(got) == 4
    s11 = got[(1, 1)]
    assert s11.n_events == 2 and s11.n_conversions == 1
    assert s11.duration_sec == 600
    assert got[(1, 2)].n_events == 1
    s21 = got[(2, 1)]
    assert s21.n_events == 2 and s21.duration_sec == 1800
    assert got[(2, 2)].n_conversions == 1


def test_ordered_funnel_greedy_and_strictness(spark):
    """Steps must be strictly after the previous step; users missing
    a step are absent; the chain is the greedy earliest one."""
    from datetime import datetime, timedelta

    from deepie_spark.operators.journeys import ordered_funnel

    t0 = datetime(2026, 4, 2)
    m = lambda k: t0 + timedelta(minutes=k)  # noqa: E731
    rows = [
        # user 1 completes; the view BEFORE signup must be skipped
        (1, m(0), 1, "view"),
        (1, m(1), 2, "signup"),
        (1, m(2), 3, "view"),
        (1, m(3), 4, "click"),
        (1, m(9), 5, "view"),      # later view irrelevant (greedy)
        (1, m(10), 6, "purchase"),
        # user 2 never clicks
        (2, m(0), 7, "signup"),
        (2, m(1), 8, "view"),
        (2, m(2), 9, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = ordered_funnel(
        df, ["signup", "view", "click", "purchase"]
    ).collect()
    assert len(out) == 1 and out[0].user_id == 1
    r = out[0]
    assert r.t_view - r.t_signup == 60
    assert r.latency_sec == 9 * 60
    import pytest

    with pytest.raises(ValueError):
        ordered_funnel(df, ["signup"])
