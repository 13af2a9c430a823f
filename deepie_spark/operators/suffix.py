"""Distributed suffix array + repeated-substring extraction.

Exact substring deduplication (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better") is built on ONE data
structure: the suffix array of the concatenated corpus — every
substring duplicated anywhere in the corpus shows up as a pair of
ADJACENT suffixes sharing a long common prefix.  The single-node
tooling (suffix automata, SA-IS) is inherently sequential; the
distributed construction here is **prefix doubling** (Manber–Myers /
Larsson–Sadakane, the formulation every Pregel/MapReduce SA paper
uses): rank suffixes by their first 2^k characters, then combine
(rank(i), rank(i+2^k)) pairs into ranks for 2^(k+1), O(log n) rounds.

Every round is two hash joins plus one global dense rank — and the
dense rank is ``rank_in_order`` (operators/dictionary.py), the
bucketed prefix-offset scheme with NO single-partition window, so
nothing in the construction serializes at 100 TB.  Rank tables at
each power of two are retained; the longest-common-prefix of any two
suffixes then resolves in O(log n) by the standard descending-power
walk (the sparse-table trick), again as bounded joins.

Sentinel convention: a missing right context ranks −1 (below every
real rank), which makes the order identical to plain lexicographic
comparison where a shorter suffix sorts before its extensions — i.e.
identical to ``ORDER BY suffix`` in any binary-collation SQL engine,
which is exactly how the DuckDB oracle ranks them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deepie_spark.operators.dictionary import rank_in_order
from deepie_spark.operators.sweep import prefix_sum_in_order


def corpus_chars(
    docs: DataFrame,
    doc_id: str = "doc_id",
    text_col: str = "text",
    max_chars: int | None = None,
    sep: str = "|",
) -> DataFrame:
    """Explode documents into the global character table
    ``(gpos, ch)`` of their concatenation in ``doc_id`` order, each
    doc (optionally truncated to ``max_chars``) followed by ``sep``.

    The concatenated string is NEVER materialized: per-doc global
    offsets come from ``prefix_sum_in_order`` (the bucketed running
    sum — no unpartitioned window), and characters explode in-row.
    """
    t = F.substring(F.col(text_col), 1, int(max_chars)) if max_chars \
        else F.col(text_col)
    d = docs.select(
        F.col(doc_id).alias("_did"), F.concat(t, F.lit(sep)).alias("_t")
    )
    lens = d.select("_did", F.length("_t").cast("long").alias("_len"))
    offs = prefix_sum_in_order(lens, "_did", "_len", out_col="_cum").select(
        "_did", (F.col("_cum") - F.col("_len")).alias("_off")
    )
    return (
        d.join(offs, "_did")
        .select(
            F.posexplode(F.split("_t", "")).alias("_p", "ch"),
            F.col("_off"),
        )
        .filter(F.col("ch") != "")  # split('') yields a trailing empty
        .select((F.col("_off") + F.col("_p")).cast("long").alias("gpos"),
                "ch")
    )


def _char_ranks(chars: DataFrame, pos: str, ch: str) -> DataFrame:
    alphabet = chars.select(F.col(ch).alias("_c")).distinct()
    # alphabet is bounded by the encoding (≤ a few thousand even for
    # full unicode text) — the broadcast hint is justified, not a guess
    ranked = rank_in_order(alphabet, "_c", id_col="_r")
    return (
        chars.join(F.broadcast(ranked), F.col(ch) == F.col("_c"))
        .select(
            F.col(pos).cast("long").alias("gpos"),
            F.col("_r").cast("long").alias("r"),
        )
    )


def suffix_array_levels(
    chars: DataFrame,
    pos: str = "gpos",
    ch: str = "ch",
    max_rounds: int = 48,
) -> tuple[DataFrame, dict[int, DataFrame], int]:
    """Prefix-doubling core: returns ``(final_ranks, levels, n)``
    where ``final_ranks`` is ``(gpos, r)`` with ``r`` the exact
    suffix-array rank (0-based, all distinct) and ``levels[2^k]`` the
    retained rank table after comparing 2^k characters.

    Positions must be dense ``0..n−1``.  Each round: one shifted
    self-join to form (rank, rank+k) pairs, one DISTINCT, one
    ``rank_in_order`` dense rank over the packed pair key, one join
    back — all hash exchanges, ``localCheckpoint`` per round (the
    iterative-consumer rule).  Terminates when all ranks are distinct
    or the compared context reaches n; ≤ ⌈log₂ n⌉ rounds.
    """
    n = chars.count()
    if n == 0:
        spark = chars.sparkSession
        empty = spark.createDataFrame([], "gpos long, r long")
        return empty, {1: empty}, 0
    if n > 3_000_000_000:
        # the packed pair key is r*(n+2)+rk+1 < (n+2)² — past ~3·10⁹
        # positions it would overflow a long; switch the pair ranking
        # to a two-column range partition before lifting this
        raise ValueError("suffix_array: corpus exceeds packed-key range")
    r = _char_ranks(chars, pos, ch).localCheckpoint(eager=True)
    levels: dict[int, DataFrame] = {1: r}
    m = r.select("r").distinct().count()
    k = 1
    rounds = 0
    while m < n and k < n:
        if rounds >= int(max_rounds):
            raise RuntimeError(
                f"suffix_array did not converge in {max_rounds} rounds"
            )
        shifted = r.select(
            (F.col("gpos") - k).alias("gpos"), F.col("r").alias("rk")
        )
        pairs = (
            r.join(shifted, "gpos", "left")
            .select(
                "gpos",
                "r",
                F.coalesce("rk", F.lit(-1)).cast("long").alias("rk"),
            )
        )
        dp = (
            pairs.select("r", "rk")
            .distinct()
            .withColumn("_key", F.col("r") * (n + 2) + F.col("rk") + 1)
        )
        ranked = rank_in_order(dp, "_key", id_col="_nr").select(
            "r", "rk", "_nr"
        )
        r = (
            pairs.join(ranked, ["r", "rk"])
            .select("gpos", F.col("_nr").cast("long").alias("r"))
            .localCheckpoint(eager=True)
        )
        k *= 2
        levels[k] = r
        m = dp.count()
        rounds += 1
    return r, levels, n


def suffix_array(
    chars: DataFrame, pos: str = "gpos", ch: str = "ch"
) -> DataFrame:
    """Suffix-array ranks ``(gpos, rank)`` of the character table:
    ``rank`` = the lexicographic position (0-based) of the suffix
    starting at ``gpos``, identical to ``row_number() OVER (ORDER BY
    suffix) − 1`` under binary collation (the oracle formulation)."""
    r, _, _ = suffix_array_levels(chars, pos=pos, ch=ch)
    return r.select("gpos", F.col("r").alias("rank"))


def bwt(chars: DataFrame, pos: str = "gpos", ch: str = "ch") -> DataFrame:
    """Burrows–Wheeler transform column ``(rank, ch)`` — the character
    PRECEDING each suffix in suffix-array order (cyclic: rank of the
    whole string takes the last character).  The suffix-array BWT
    variant (equals the rotation BWT when the text ends in a unique
    sentinel; our corpus separator plays that role per document).
    BWT run-length is the standard compressibility/repetitiveness
    measure next to the distinct-substring count.  One join against
    the char table — nothing beyond the SA construction itself.
    """
    _, levels, n = suffix_array_levels(chars, pos=pos, ch=ch)
    sa = levels[max(levels)]
    prev = chars.select(
        ((F.col(pos) + 1) % n).cast("long").alias("gpos"),
        F.col(ch).alias("_pc"),
    )
    return (
        sa.join(prev, "gpos")
        .select(F.col("r").alias("rank"), F.col("_pc").alias("ch"))
    )


def distinct_substring_stats(
    chars: DataFrame, pos: str = "gpos", ch: str = "ch"
) -> DataFrame:
    """One-row corpus-repetitiveness summary from the suffix array:
    ``(n_chars, total_lcp, n_distinct_substrings)`` exact longs, via
    the classic identity  #distinct substrings = n(n+1)/2 − Σ
    LCP(adjacent suffixes)  (every substring is a prefix of exactly
    one suffix; the LCP sum counts the prefixes already contributed
    by the previous suffix in SA order).  The duplication-saturation
    scalar a curation pipeline tracks per shard — falls as boilerplate
    grows.  Cost: the adjacent-LCP table (O(log n) joins) + one agg.
    """
    pairs = repeated_substring_pairs(chars, min_len=0, pos=pos, ch=ch)
    n_row = chars.agg(F.count(F.lit(1)).alias("_n"))
    return (
        pairs.agg(F.coalesce(F.sum("lcp"), F.lit(0)).alias("total_lcp"))
        .crossJoin(F.broadcast(n_row))
        .select(
            F.col("_n").cast("long").alias("n_chars"),
            F.col("total_lcp").cast("long").alias("total_lcp"),
            (
                # integer div keeps the count exact past 2^53
                F.expr("_n * (_n + 1) div 2") - F.col("total_lcp")
            ).cast("long").alias("n_distinct_substrings"),
        )
    )


def repeated_substring_pairs(
    chars: DataFrame,
    min_len: int,
    pos: str = "gpos",
    ch: str = "ch",
) -> DataFrame:
    """Adjacent-suffix LCP table, filtered to ``lcp ≥ min_len``:
    ``(gpos_a, gpos_b, lcp)`` where the suffixes ranked t and t+1
    share a common prefix of exactly ``lcp`` characters.  Any
    substring of length L that occurs twice anywhere in the corpus
    implies an ADJACENT pair with lcp ≥ L (suffixes sharing a prefix
    are contiguous in SA order), so this table is a complete
    duplicated-span index — the exact structure Lee et al. scan.

    LCP via the retained power-of-two rank tables: walk levels in
    descending order; where both advanced positions carry EQUAL
    level-k ranks, the suffixes share those 2^k characters — add k
    and advance both cursors (the greedy binary decomposition of the
    true LCP).  O(log n) bounded joins; no per-row Python anywhere.
    """
    sa, levels, n = suffix_array_levels(chars, pos=pos, ch=ch)
    if n == 0:
        return chars.sparkSession.createDataFrame(
            [], "gpos_a long, gpos_b long, lcp long"
        )
    a = sa.select(F.col("r").alias("t"), F.col("gpos").alias("pa"))
    b = sa.select((F.col("r") - 1).alias("t"), F.col("gpos").alias("pb"))
    state = (
        a.join(b, "t")
        .select(
            "pa",
            "pb",
            F.col("pa").alias("ca"),
            F.col("pb").alias("cb"),
            F.lit(0).cast("long").alias("lcp"),
        )
        .localCheckpoint(eager=True)
    )
    for k in sorted(levels, reverse=True):
        rk = levels[k]
        ra = rk.select(F.col("gpos").alias("ca"), F.col("r").alias("_ra"))
        rb = rk.select(F.col("gpos").alias("cb"), F.col("r").alias("_rb"))
        eq = (
            F.col("_ra").isNotNull()
            & F.col("_rb").isNotNull()
            & (F.col("_ra") == F.col("_rb"))
        )
        state = (
            state.join(ra, "ca", "left")
            .join(rb, "cb", "left")
            .select(
                "pa",
                "pb",
                F.when(eq, F.col("ca") + k).otherwise(F.col("ca"))
                .alias("ca"),
                F.when(eq, F.col("cb") + k).otherwise(F.col("cb"))
                .alias("cb"),
                F.when(eq, F.col("lcp") + k).otherwise(F.col("lcp"))
                .alias("lcp"),
            )
            .localCheckpoint(eager=True)
        )
    return (
        state.filter(F.col("lcp") >= int(min_len))
        .select(
            F.col("pa").alias("gpos_a"),
            F.col("pb").alias("gpos_b"),
            F.col("lcp"),
        )
    )
