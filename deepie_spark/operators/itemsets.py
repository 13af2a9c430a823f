"""Frequent-itemset mining and association rules (distributed a-priori).

Market-basket analytics over (transaction, item) pairs — in the KG
pipeline the transactions are documents and the items their linked
entities, so L2/L3 itemsets are the "entities that co-occur more than
chance" sets feeding relation-rule induction, and association rules
rank directional co-occurrence (entity A's pages almost always also
mention B) — a complement to PMI (operators/graph.py cooccurrence_pmi,
pointwise and pairwise-only) with explicit support thresholds and
3-itemsets.

Distributed a-priori (Agrawal & Srikant, VLDB 1994, the two-round
SON/park-chen-yu family shape):

- L1 is ONE hash aggregation (map-side combinable).
- Each transaction's frequent items ride as a sorted in-row array;
  candidate 2- and 3-itemsets are generated IN-ROW (nested
  ``transform``/``slice`` — the collection argument is a plain column,
  not a derived expression, so the HOF-CSE trap of winnow_fingerprints
  does not apply), then counted with one hash aggregation per size.
  No pair/triple self-join of the transaction table — the candidate
  space per transaction is C(k,2)/C(k,3) over its own FREQUENT items
  only, the quantity a-priori bounds.
- Monotonicity prunes the 3-itemset stage twice: arrays are first
  narrowed to PAIR-frequent items, and exploded candidates are
  semi-joined against broadcast L2 on each of the three sub-pairs
  before the count — both pure optimizations (a superset of true L3
  always survives; support counting decides membership), so the
  DuckDB twin can use the naive three-way self-join formulation.

All supports are exact longs; rule confidence = supp(ab)/supp(a) and
lift = supp(ab)·N / (supp(a)·supp(b)) are single IEEE divisions of
exact-integer products (engine-portable, the mixture/jaccard rule).
Itemsets render as '|'-joined sorted strings (never array columns in
gated output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PAIRS_EXPR = (
    "flatten(transform(items, (x, i) -> "
    "transform(slice(items, i + 2, size(items)), "
    "y -> struct(x AS a, y AS b))))"
)

# absolute 0-based index of y is i+1+j, so elements strictly after y
# start at 1-based position i+j+3; slice past the end yields []
_TRIPLES_EXPR = (
    "flatten(flatten(transform(items, (x, i) -> "
    "transform(slice(items, i + 2, size(items)), (y, j) -> "
    "transform(slice(items, i + j + 3, size(items)), "
    "z -> struct(x AS a, y AS b, z AS c))))))"
)


def _tx_arrays(
    tx: DataFrame, key: str, item: str, keep: DataFrame
) -> DataFrame:
    """Per-transaction sorted array of its items ∩ ``keep`` (a
    1-column broadcastable ``item`` frame)."""
    return (
        tx.join(F.broadcast(keep), item)
        .groupBy(key)
        .agg(F.sort_array(F.collect_set(item)).alias("items"))
    )


def frequent_itemsets(
    tx: DataFrame,
    key: str = "tid",
    item: str = "item",
    min_support: int = 2,
    max_size: int = 3,
) -> DataFrame:
    """All itemsets of size 1..``max_size`` (≤ 3) with support ≥
    ``min_support``: rows ``(itemset, size, support)`` where
    ``itemset`` is the '|'-joined sorted member list."""
    if not 1 <= max_size <= 3:
        raise ValueError("max_size must be 1, 2 or 3")
    t = tx.select(key, item).distinct()
    l1 = (
        t.groupBy(item)
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
        .localCheckpoint()
    )
    out = l1.select(
        F.col(item).alias("itemset"),
        F.lit(1).alias("size"),
        "support",
    )
    if max_size == 1:
        return out
    arr1 = _tx_arrays(t, key, item, l1.select(item))
    l2 = (
        arr1.select(F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
        .groupBy("p.a", "p.b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
        .localCheckpoint()
    )
    out = out.unionByName(
        l2.select(
            F.concat_ws("|", "a", "b").alias("itemset"),
            F.lit(2).alias("size"),
            "support",
        )
    )
    if max_size == 2:
        return out
    pf = (
        l2.select(F.col("a").alias(item))
        .unionByName(l2.select(F.col("b").alias(item)))
        .distinct()
    )
    cand = (
        _tx_arrays(t, key, item, pf)
        .select(F.explode(F.expr(_TRIPLES_EXPR)).alias("s"))
        .select("s.a", "s.b", "s.c")
    )
    for pair in (("a", "b"), ("a", "c"), ("b", "c")):
        cand = cand.join(
            F.broadcast(
                l2.select(
                    F.col("a").alias(pair[0]), F.col("b").alias(pair[1])
                )
            ),
            list(pair),
            "left_semi",
        )
    l3 = (
        cand.groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )
    return out.unionByName(
        l3.select(
            F.concat_ws("|", "a", "b", "c").alias("itemset"),
            F.lit(3).alias("size"),
            "support",
        )
    )


def association_rules(
    tx: DataFrame,
    key: str = "tid",
    item: str = "item",
    min_support: int = 2,
    min_confidence: float = 0.0,
) -> DataFrame:
    """Directional rules A → B from frequent pairs: rows
    ``(antecedent, consequent, support, confidence, lift)``.  N (the
    lift denominator's transaction count) is the DISTINCT transaction
    count of the full input, riding the plan as a broadcast 1-row
    aggregate."""
    t = tx.select(key, item).distinct()
    n1 = t.select(key).distinct().agg(
        F.count(F.lit(1)).alias("n_tx")
    )
    l1 = (
        t.groupBy(item)
        .agg(F.count(F.lit(1)).alias("s1"))
        .filter(F.col("s1") >= min_support)
        .localCheckpoint()
    )
    arr1 = _tx_arrays(t, key, item, l1.select(item))
    l2 = (
        arr1.select(F.explode(F.expr(_PAIRS_EXPR)).alias("p"))
        .groupBy("p.a", "p.b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )
    both = l2.unionByName(
        l2.select(
            F.col("b").alias("a"), F.col("a").alias("b"), "support"
        )
    )
    scored = (
        both.join(
            F.broadcast(
                l1.select(F.col(item).alias("a"), F.col("s1").alias("sa"))
            ),
            "a",
        )
        .join(
            F.broadcast(
                l1.select(F.col(item).alias("b"), F.col("s1").alias("sb"))
            ),
            "b",
        )
        .crossJoin(F.broadcast(n1))
    )
    conf = F.col("support") / F.col("sa")
    lift = (F.col("support") * F.col("n_tx")) / (
        F.col("sa") * F.col("sb")
    )
    return (
        scored.filter(conf >= F.lit(min_confidence))
        .select(
            F.col("a").alias("antecedent"),
            F.col("b").alias("consequent"),
            "support",
            F.round(conf, 6).alias("confidence"),
            F.round(lift, 6).alias("lift"),
        )
    )


def sequential_patterns(
    df: DataFrame,
    seq_col: str,
    item_col: str,
    pos_col: str,
    support_num: int = 1,
    support_den: int = 5,
) -> DataFrame:
    """Frequent sequential patterns of length 2 and 3 (the PrefixSpan
    / GSP family, Pei et al. 2001 — gap-insensitive subsequences):
    a sequence CONTAINS pattern a→b iff some a-position precedes some
    b-position, and a→b→c iff a b-position lies strictly between an
    a- and a c-position.  Support = number of sequences containing
    the pattern; patterns with support·den ≥ num·n_seqs survive (the
    RELATIVE-support integer rule of frequent_itemsets).

    The containment test needs no subsequence enumeration — the
    first/last-occurrence reduction (standard in the episode-mining
    literature):

        contains(a→b)   ⟺  first(a) < last(b)
        contains(a→b→c) ⟺  ∃ pos(b) ∈ (first(a), last(c))

    (sound AND complete: any witness i<j<k implies first(a) ≤ i < j
    and j < k ≤ last(c); conversely first(a)/last(c) ARE witnesses).
    So the plan is: one (seq, item) agg for first/last, an
    item²-per-sequence pair join, and for triples one join of the
    bounded pair frame back to the position rows — every stage keyed
    on the sequence id, never a corpus-wide self-join; per-sequence
    cost is O(k² + k·len) for k distinct items, the blowup the naive
    3-way join formulation (the ORACLE) pays globally.

    ``pos_col`` must be a total order within each sequence (ties
    pre-broken — e.g. row_number over (ts, event_id)).

    Output: (pattern, length, support) with pattern 'a>b' / 'a>b>c'.
    """
    pos = df.select(
        F.col(seq_col).alias("s"),
        F.col(item_col).alias("it"),
        F.col(pos_col).cast("long").alias("p"),
    )
    fl = pos.groupBy("s", "it").agg(
        F.min("p").alias("first_p"), F.max("p").alias("last_p")
    )
    n_seq = fl.select("s").distinct().agg(
        F.count(F.lit(1)).cast("long").alias("n_seqs")
    )
    a = fl.select("s", F.col("it").alias("a"), "first_p")
    c = fl.select("s", F.col("it").alias("c"), "last_p")
    pairs = a.join(c, "s").filter(F.col("first_p") < F.col("last_p"))
    sup2 = pairs.groupBy(
        F.concat_ws(">", "a", "c").alias("pattern")
    ).agg(F.count(F.lit(1)).cast("long").alias("support"))
    mid = pos.select("s", F.col("it").alias("b"), F.col("p").alias("bp"))
    tri = (
        pairs.join(mid, "s")
        .filter(
            (F.col("bp") > F.col("first_p"))
            & (F.col("bp") < F.col("last_p"))
        )
        .select("s", "a", "b", "c")
        .distinct()
    )
    sup3 = tri.groupBy(
        F.concat_ws(">", "a", "b", "c").alias("pattern")
    ).agg(F.count(F.lit(1)).cast("long").alias("support"))
    out = sup2.select(
        "pattern", F.lit(2).cast("long").alias("length"), "support"
    ).unionByName(
        sup3.select(
            "pattern", F.lit(3).cast("long").alias("length"), "support"
        )
    )
    return (
        out.crossJoin(F.broadcast(n_seq))
        .filter(
            F.col("support") * support_den
            >= F.lit(support_num) * F.col("n_seqs")
        )
        .select("pattern", "length", "support")
    )
