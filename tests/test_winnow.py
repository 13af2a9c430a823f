"""Winnowing fingerprints (Schleimer et al. 2003): python-twin parity,
the w+k-1 shared-substring detection guarantee, and the map-only plan.
"""

import random

import __spark_entry__ as entry
from pyspark.sql import functions as F

from deepie_spark.functions.text import BASE, MOD, winnow_fingerprints

K, W = 3, 4


def _py_poly(s: str) -> int:
    h = 0
    for c in s:
        h = (h * BASE + ord(c)) % MOD
    return h


def _py_winnow(tokens: list[str], k: int = K, w: int = W) -> set:
    if len(tokens) >= k:
        sh = [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]
    else:
        sh = [" ".join(tokens)]
    hs = [_py_poly(s) for s in sh]
    sel = set()
    if len(hs) >= w:
        for j in range(len(hs) - w + 1):
            win = hs[j : j + w]
            v = min(win)
            # rightmost minimal (robust winnowing)
            pos = j + max(i for i, x in enumerate(win) if x == v)
            sel.add((pos, v))
    else:
        v = min(hs)
        sel.add((max(i for i, x in enumerate(hs) if x == v), v))
    return sel


def test_winnow_matches_python_twin(spark):
    rng = random.Random(97)
    vocab = [f"w{i}" for i in range(30)]
    docs = [
        (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 60))))
        for d in range(120)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = (
        df.select(
            "doc_id",
            F.explode(
                winnow_fingerprints(F.split("text", r"\s+"), k=K, w=W)
            ).alias("s"),
        )
        .select("doc_id", "s.pos", "s.fp")
        .collect()
    )
    by_doc: dict[int, set] = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], set()).add((r["pos"], r["fp"]))
    for d, text in docs:
        assert by_doc[d] == _py_winnow(text.split()), f"doc {d}"


def test_winnow_detection_guarantee(spark):
    """Any shared token run of length ≥ w+k-1 must produce at least one
    shared fingerprint VALUE between the two docs."""
    rng = random.Random(13)
    vocab = [f"t{i}" for i in range(50)]
    shared = [rng.choice(vocab) for _ in range(W + K - 1)]
    rows = []
    for d in range(40):
        pre = [rng.choice(vocab) for _ in range(rng.randint(0, 20))]
        post = [rng.choice(vocab) for _ in range(rng.randint(0, 20))]
        rows.append((d, " ".join(pre + shared + post)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = (
        df.select(
            "doc_id",
            F.explode(
                winnow_fingerprints(F.split("text", r"\s+"), k=K, w=W)
            ).alias("s"),
        )
        .select("doc_id", F.col("s.fp").alias("fp"))
        .collect()
    )
    by_doc: dict[int, set] = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    common = set.intersection(*by_doc.values())
    assert common, "shared w+k-1 run produced no common fingerprint"


def test_winnow_query_is_map_only(spark, sf_dir):
    """Map-only modulo the one ensure_parallelism input rebalance (the
    local parquet is 1-2 splits): no hash/range shuffle, no Python."""
    df = entry.q_winnow_fingerprints(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "Exchange hashpartitioning" not in final
    assert "Exchange rangepartitioning" not in final
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
