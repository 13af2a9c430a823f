"""Truth discovery: iterative source-reliability estimation.

Web-scale KG construction fuses the SAME fact from many conflicting
extractions — different pages, different extraction rules, different
feeds (the reference fuses per-pair expert scores with a product of
experts, rnnRE.py product-of-experts menu; at corpus scale the same
fusion problem appears one level up, across SOURCES).  Truth-discovery
algorithms (TruthFinder, Yin et al. 2008; Pasternack & Roth 2010's
Sums/Average·Log family; Knowledge Vault's extractor reliability)
iterate two coupled estimates: a value is credible when reliable
sources assert it, a source is reliable when its assertions are
credible.

This implements the voting fixpoint:

  round r:  conf_r(e, v)  = Σ_{s asserts (e,v)} trust_{r-1}(s)
            resolved_r(e) = argmax_v conf_r(e, v)   (tie → min value)
            trust_r(s)    = |claims of s matching resolved_r| / |claims of s|

with trust_0 uniform.  Engine portability (what makes it
oracle-gateable): trusts are ratios of exact longs; the confidence
sum folds the per-source trusts in SORTED source order (the bm25
fixed-order rule — never an FP sum over arbitrary row order), so the
doubles are bit-identical in both engines and the argmax (with its
min-value tie-break) picks the same winner everywhere.

Scale shape per round: one source-keyed join of the claim table
against the source-sized trust table (un-hinted — AQE broadcasts it
when small), one (entity, value) agg with map-side combine, one
entity-keyed argmax agg, one entity-keyed join-back, one source agg.
No window, no cartesian, no driver collect; ``localCheckpoint`` per
round cuts the iterative lineage (the pagerank/CC rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def truth_discovery(
    claims: DataFrame,
    source_col: str = "source",
    key_col: str = "entity",
    value_col: str = "value",
    rounds: int = 2,
) -> DataFrame:
    """Per-source reliability after ``rounds`` voting iterations.

    ``claims`` rows are (source, entity, value) assertions; duplicate
    assertions collapse (a source saying the same thing twice is one
    vote, but a source asserting TWO values for one entity holds two
    claims — self-contradiction counts against it).  Returns
    ``(source, n_claims, n_correct, trust)`` where ``n_correct``
    counts claims agreeing with the final round's resolved values and
    ``trust = n_correct / n_claims`` (rounded to 6 for the float
    convention).
    """
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    cl = (
        claims.select(
            F.col(source_col).alias("source"),
            F.col(key_col).alias("entity"),
            F.col(value_col).alias("value"),
        )
        .distinct()
        .localCheckpoint()
    )
    trust = cl.select("source").distinct().select(
        "source", F.lit(1.0).alias("trust")
    )
    out: DataFrame | None = None
    for _ in range(int(rounds)):
        conf = (
            cl.join(trust, "source")
            .groupBy("entity", "value")
            .agg(
                F.sort_array(
                    F.collect_list(F.struct("source", "trust"))
                ).alias("ts")
            )
            .select(
                "entity",
                "value",
                F.aggregate(
                    "ts",
                    F.lit(0.0),
                    lambda acc, x: acc + x["trust"],
                ).alias("conf"),
            )
        )
        resolved = (
            conf.groupBy("entity")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("conf")).alias("nc"),
                        F.col("value").alias("v"),
                    )
                ).alias("m")
            )
            .select("entity", F.col("m.v").alias("r_value"))
        )
        out = (
            cl.join(resolved, "entity")
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_claims"),
                F.sum(
                    F.when(
                        F.col("value") == F.col("r_value"), 1
                    ).otherwise(0)
                ).cast("long").alias("n_correct"),
            )
            .select(
                "source",
                "n_claims",
                "n_correct",
                # exact-long division — bit-identical across engines;
                # iterate on the UNROUNDED ratio, round only on output
                (
                    F.col("n_correct").cast("double")
                    / F.col("n_claims").cast("double")
                ).alias("trust"),
            )
            .localCheckpoint()
        )
        trust = out.select("source", "trust")
    assert out is not None
    return out.select(
        "source",
        "n_claims",
        "n_correct",
        F.round("trust", 6).alias("trust"),
    )
