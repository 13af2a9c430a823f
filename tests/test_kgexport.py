"""KG serialization operators: entity cards + per-doc entity salience
(operators/kgexport.py) — hand-computed twins on small frames, plus the
determinism property the in-row sort buys (partitioning-invariant card
strings)."""

import math

import pytest
from pyspark.sql import functions as F

from deepie_spark.operators.kgexport import entity_cards, entity_salience


def _triples(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def test_entity_cards_sorted_and_distinct(spark):
    rows = [
        ("a", "p2", "y"),
        ("a", "p1", "x"),
        ("a", "p1", "x"),  # duplicate fact collapses
        ("a", "p1", "w"),
        ("a", "loop", "a"),  # self-loop fact is KEPT (serializer ships all)
        ("b", "p1", "x"),
    ]
    out = {r.entity: r for r in entity_cards(_triples(spark, rows)).collect()}
    a = out["a"]
    assert a.n_facts == 4 and a.n_preds == 3
    assert a.card == "loop=a|p1=w|p1=x|p2=y"
    b = out["b"]
    assert (b.n_facts, b.n_preds, b.card) == (1, 1, "p1=x")


def test_entity_cards_partitioning_invariant(spark):
    rows = [("e", f"p{i % 3}", f"o{i}") for i in range(40)]
    t = _triples(spark, rows)
    one = entity_cards(t.coalesce(1)).collect()[0].card
    many = entity_cards(t.repartition(7)).collect()[0].card
    assert one == many


def _mentions(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, pos long, alias string")


def test_entity_salience_tf_idf(spark):
    m = _mentions(
        spark,
        [
            (1, 0, "spark"),
            (1, 4, "spark"),
            (1, 2, "table"),
            (2, 1, "table"),
        ],
    )
    # D = 3: doc 3 has no mentions but counts toward idf
    nd = spark.createDataFrame([(3,)], "d long")
    out = {(r.doc_id, r.alias): r for r in entity_salience(m, nd).collect()}
    r = out[(1, "spark")]
    assert (r.n_mentions, r.first_pos, r.df) == (2, 0, 1)
    assert r.salience == round(2 * (math.log(3) - math.log(1)), 6)
    r2 = out[(1, "table")]
    assert (r2.n_mentions, r2.df) == (1, 2)
    assert r2.salience == round(1 * (math.log(3) - math.log(2)), 6)


def test_entity_salience_ubiquitous_entity_scores_zero(spark):
    m = _mentions(spark, [(1, 0, "the"), (2, 0, "the")])
    nd = spark.createDataFrame([(2,)], "d long")
    out = entity_salience(m, nd).collect()
    assert all(r.salience == 0.0 for r in out)
