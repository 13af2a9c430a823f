"""corrupt_objects (operators/negatives.py) vs a pure-python twin."""

from deepie_spark.functions.text import BASE, MOD
from deepie_spark.operators.negatives import corrupt_objects

CANDS = ["alpha", "beta", "gamma", "delta", "obj0"]


def _py_hash(s: str) -> int:
    h = 0
    for c in s:
        h = (h * BASE + ord(c)) % MOD
    return h


def _py_corrupt(rows, cands, k):
    n = len(cands)
    out = []
    for doc_id, pos1, pos2, subj, pred, obj in rows:
        for i in range(k):
            key = "|".join(
                [str(doc_id), str(pos1), str(pos2), subj, pred, obj, str(i)]
            )
            idx = _py_hash(key) % n
            neg = cands[idx]
            if neg == obj:
                neg = cands[(idx + 1) % n]
            out.append((doc_id, pos1, pos2, subj, pred, obj, i, neg))
    return sorted(out)


def _rows():
    return [
        (d, p, p + 3, f"s{d % 4}", "PHYS", CANDS[d % len(CANDS)])
        for d in range(40)
        for p in range(3)
    ]


def test_corrupt_objects_matches_python_twin(spark):
    rows = _rows()
    df = spark.createDataFrame(
        rows, "doc_id long, pos1 long, pos2 long, subj string, "
        "pred string, obj string"
    )
    got = sorted(
        tuple(r) for r in corrupt_objects(df, CANDS, k=2).collect()
    )
    assert got == _py_corrupt(rows, CANDS, 2)
    # filtered sampling: a negative never equals the true object
    assert all(r[7] != r[5] for r in got)
    # repartition invariance (map-only, hash-derived)
    got2 = sorted(
        tuple(r)
        for r in corrupt_objects(df.repartition(7), CANDS, k=2).collect()
    )
    assert got2 == got


def test_corrupt_objects_is_map_only(spark):
    df = spark.createDataFrame(
        _rows(), "doc_id long, pos1 long, pos2 long, subj string, "
        "pred string, obj string"
    )
    out = corrupt_objects(df, CANDS, k=2)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "Python" not in plan  # pure codegen, no UDF
