"""Mention detection against a broadcast alias catalog.

North-star stage 2: BIO-style mention tagging via an alias dictionary
broadcast as a sorted trie — the web-scale analog of the reference's
dictionary probe per token (rnnRE.py:77-80) and of its entity-tag parsing
(``B-PER.NAM#1`` markers, rnn_process_onlyExtra.py:346-396).  The
*last-token-position rule* is preserved: a mention's position is the
index of its final token (data/readMe.md:31).

Two implementations:

* :func:`detect_mentions` — greedy longest-match over the token stream
  inside ``mapInPandas`` with the trie broadcast once per executor.
  No shuffle, no join: the catalog rides the closure, each page is
  processed where it was read.  This is the scale path (catalog ≪ data).
* :func:`detect_mentions_single` — the single-token special case as a
  pure relational plan (posexplode + broadcast hash join), used for the
  DuckDB-oracle correctness gate.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from deepie_spark.datagen.catalog import ENTITY_CATALOG, build_alias_trie
from deepie_spark.functions.text import py_tokenize, tokenize

MENTION_STRUCT = T.StructType(
    [
        T.StructField("start", T.IntegerType()),
        T.StructField("pos", T.IntegerType()),  # last token (readMe.md:31)
        T.StructField("entity_id", T.LongType()),
        T.StructField("alias", T.StringType()),
        T.StructField("entity_type", T.StringType()),
        T.StructField("subtype", T.StringType()),
        T.StructField("prior", T.DoubleType()),
    ]
)

MENTIONS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("tokens", T.ArrayType(T.StringType())),
        T.StructField("mentions", T.ArrayType(MENTION_STRUCT)),
    ]
)

MENTIONS_SCHEMA_SLIM = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("mentions", T.ArrayType(MENTION_STRUCT)),
    ]
)


def greedy_match(tokens: list[str], trie: dict) -> list[tuple]:
    """Greedy longest-match scan; a token consumed by a longer alias is
    not re-matched as a shorter one (standard gazetteer semantics)."""
    out = []
    i, n = 0, len(tokens)
    while i < n:
        node = trie
        j = i
        best = None  # (end_exclusive, payload)
        while j < n and tokens[j] in node:
            node = node[tokens[j]]
            j += 1
            if "$" in node:
                best = (j, node["$"])
        if best is not None:
            end, (eid, alias, etype, subtype, prior) = best
            out.append((i, end - 1, eid, alias, etype, subtype, prior))
            i = end
        else:
            i += 1
    return out


def compile_matcher(trie: dict):
    """Compile the trie into the fast matcher used on the hot path:
    single-token aliases become one dict probe, multi-token aliases a
    first-token-indexed candidate list tried longest-first — semantics
    identical to :func:`greedy_match` (parity-tested), ~1.4x faster on
    real token streams (the python stage is the pipeline's hot loop)."""
    single: dict = {}
    multi: dict = {}

    def walk(node, path):
        for tok, child in node.items():
            if tok == "$":
                if len(path) == 1:
                    single[path[0]] = child
                else:
                    multi.setdefault(path[0], []).append((path, child))
            else:
                walk(child, path + [tok])

    walk(trie, [])
    for cands in multi.values():
        cands.sort(key=lambda c: len(c[0]), reverse=True)

    def match(tokens: list[str]) -> list[tuple]:
        out = []
        i, n = 0, len(tokens)
        while i < n:
            t = tokens[i]
            cands = multi.get(t)
            if cands is not None:
                matched = False
                for parts, payload in cands:
                    L = len(parts)
                    if i + L <= n and tokens[i : i + L] == parts:
                        out.append((i, i + L - 1) + payload)
                        i += L
                        matched = True
                        break
                if matched:
                    continue
            p = single.get(t)
            if p is not None:
                out.append((i, i) + p)
            i += 1
        return out

    return match


def detect_mentions(
    pages: DataFrame, trie: dict | None = None, include_tokens: bool = False
) -> DataFrame:
    """pages(url, text, …) → (url[, tokens], mentions[]) via broadcast trie.

    The trie is shipped in the task closure (it is tiny); for a large
    catalog use ``spark.sparkContext.broadcast`` and read
    ``trie_bc.value`` inside the iterator instead.  ``include_tokens``
    ships the token array back through Arrow — only ask for it when the
    downstream stage (feature encoding) needs it; the pair-generation
    path does not, and at 100 TB the token column dwarfs the mentions.
    """
    trie = trie or build_alias_trie(ENTITY_CATALOG)
    # compile on the driver: the compiled dicts ride the serialized
    # closure, so tasks pay zero per-partition trie-walk/sort cost
    match = compile_matcher(trie)

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks_col, men_col = [], []
            for text in pdf["text"]:
                toks = py_tokenize(text)
                if include_tokens:
                    toks_col.append(toks)
                men_col.append(match(toks))
            out = {"url": pdf["url"]}
            if include_tokens:
                out["tokens"] = toks_col
            out["mentions"] = men_col
            yield pd.DataFrame(out)

    schema = MENTIONS_SCHEMA if include_tokens else MENTIONS_SCHEMA_SLIM
    return pages.select("url", "text").mapInPandas(run, schema)


def detect_mentions_single(pages: DataFrame, catalog: DataFrame) -> DataFrame:
    """Single-token mention detection as a relational plan.

    posexplode(tokens) ⋈ broadcast(catalog) — Catalyst keeps the scan
    pruned to (url, text) and the join build side is the tiny catalog.
    Returns one row per mention (url, pos, alias, entity_id, entity_type).
    """
    toks = pages.select(
        "url", F.posexplode(tokenize(F.col("text"))).alias("pos", "token")
    )
    single = catalog.filter(~F.col("alias").contains(" "))
    return (
        toks.join(F.broadcast(single), toks.token == single["alias"])
        .select(
            "url",
            "pos",
            "alias",
            "entity_id",
            "entity_type",
            "subtype",
            "prior",
        )
    )
