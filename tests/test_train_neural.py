"""Neural training (M21): gradient correctness, reference-exact
optimizer semantics, and the trained-model e2e P/R gate.

The backprop is hand-derived — the only acceptable proof is a numerical
gradient check on every parameter of both flagship graphs.  The e2e
test then trains on the fixture corpus and requires the *distributed*
inference path (mapInPandas, broadcast trained weights) to reach triple
P/R ≥ 0.95 against the gold labels — the VERDICT round-1 gap: the P/R
gate previously only ever exercised seeded-random neural weights.
"""

import numpy as np
import pytest

from deepie_spark.model.infer import (
    classify_mentions_neural,
    init_neural_weights,
    neural_forward,
    triples_from_predictions,
)
from deepie_spark.model.train_neural import (
    adadelta_step,
    adadelta_state,
    forward_backward,
    train_neural,
)
from deepie_spark.operators.dictionary import build_reference_dictionaries
from deepie_spark.sources.tsv_corpus import (
    main_corpus_records,
    parse_line,
    read_corpus,
)
from tests.conftest import REFERENCE_DATA
from tests.test_parser import all_lines


@pytest.fixture(scope="module")
def setup(spark):
    mentions = read_corpus(spark, REFERENCE_DATA).cache()
    dicts = {
        name: {r["value"]: r["id"] for r in df.collect()}
        for name, df in build_reference_dictionaries(mentions).items()
    }
    records = [
        parse_line(c, line)
        for c, _, line in all_lines()
        if c in ("bn_nw", "bc0", "bc1", "cts", "wl")
    ]
    m_len = max(len(r["tokens"]) for r in records)
    label_names = [None] * len(dicts["label"])
    for k, v in dicts["label"].items():
        label_names[v] = k
    labels = np.array([dicts["label"][r["label"]] for r in records])
    return {
        "mentions": mentions,
        "dicts": dicts,
        "records": records,
        "m_len": m_len,
        "num_position": 2 * m_len + 2,
        "labels": label_names,
        "y": labels,
    }


def _tiny_weights(setup, model):
    dict_sizes = {k: max(d.values()) for k, d in setup["dicts"].items()}
    return init_neural_weights(
        dict_sizes,
        setup["num_position"],
        word_dim=5,
        feat_dim=3,
        hidden=4,
        windows=(2,),
        maps=3,
        n_classes=len(setup["labels"]),
        model=model,
    )


@pytest.mark.parametrize("model", ["convolute", "gruHead"])
def test_gradcheck(setup, model):
    """Analytic grads match central-difference numericals on every
    parameter family (sampled entries; float64 math)."""
    recs = setup["records"][:5]
    y = setup["y"][:5]
    w = _tiny_weights(setup, model)
    # float64 copies for a clean numerical check
    w = {
        k: (v.astype(np.float64) if not k.startswith("_") else v)
        for k, v in w.items()
    }
    loss, grads, _ = forward_backward(
        recs, setup["dicts"], w, y, setup["m_len"], setup["num_position"]
    )
    rng = np.random.RandomState(0)
    h = 1e-6
    for name, g in grads.items():
        flat = w[name].reshape(-1)
        gflat = np.asarray(g).reshape(-1)
        # check entries that actually receive gradient, plus randoms
        cand = np.nonzero(np.abs(gflat) > 1e-12)[0]
        pick = cand[rng.permutation(len(cand))[:4]] if len(cand) else []
        for i in list(pick) + [rng.randint(len(flat))]:
            orig = flat[i]
            flat[i] = orig + h
            lp, _, _ = forward_backward(
                recs, setup["dicts"], w, y,
                setup["m_len"], setup["num_position"],
            )
            flat[i] = orig - h
            lm, _, _ = forward_backward(
                recs, setup["dicts"], w, y,
                setup["m_len"], setup["num_position"],
            )
            flat[i] = orig
            num = (lp - lm) / (2 * h)
            assert num == pytest.approx(gflat[i], rel=2e-3, abs=1e-7), (
                model, name, i
            )


@pytest.mark.parametrize("model", ["convolute", "gruHead"])
def test_forward_matches_inference_path(setup, model):
    """The training forward must be the SAME function the distributed
    inference runs — otherwise trained weights drive a different graph."""
    recs = setup["records"][:12]
    w = _tiny_weights(setup, model)
    _, _, p_train = forward_backward(
        recs, setup["dicts"], w, setup["y"][:12],
        setup["m_len"], setup["num_position"],
    )
    _, p_infer = neural_forward(
        recs, setup["dicts"], w, setup["m_len"], setup["num_position"]
    )
    assert np.allclose(p_train, p_infer, atol=1e-5)


def test_adadelta_semantics():
    """Max-norm applies to the UPDATED 2-D params (not word tables),
    pad row of every embedding table resets to zero."""
    w = {
        "T_word": np.ones((4, 3), np.float32),
        "T_dist1": np.ones((4, 3), np.float32),
        "cls_W": np.full((3, 2), 10.0, np.float32),
        "cls_b": np.zeros(2, np.float32),
    }
    g = {k: np.ones_like(v, dtype=np.float64) for k, v in w.items()}
    st = adadelta_state(w)
    adadelta_step(w, g, st, norm_lim=9.0)
    # cls_W columns projected to norm <= 3.0
    assert np.all(np.sqrt((w["cls_W"] ** 2).sum(axis=0)) <= 3.0 + 1e-5)
    # word table NOT projected (columns stay ~sqrt(4)*1 > would-be cap
    # only if cap applied; just assert unchanged except the tiny update)
    assert np.all(np.abs(w["T_word"][1:] - 1.0) < 0.1)
    # pad rows reset
    assert not w["T_word"][0].any()
    assert not w["T_dist1"][0].any()


@pytest.mark.parametrize("model", ["convolute", "gruHead"])
def test_training_reduces_loss(setup, model):
    w = _tiny_weights(setup, model)
    losses = train_neural(
        setup["records"], setup["dicts"], w, setup["y"],
        setup["m_len"], setup["num_position"], epochs=8,
    )
    assert losses[-1] < losses[0]


@pytest.mark.parametrize("model", ["convolute", "gruHead"])
def test_e2e_trained_neural_pr(spark, setup, model):
    """The north-rule P/R gate with a TRAINED neural model: fit the
    fixture corpus driver-side (adadelta), broadcast the weights, run
    the distributed mapInPandas inference, emit triples, and score
    against the gold-label triples — P/R ≥ 0.95 (BASELINE.json)."""
    dict_sizes = {k: max(d.values()) for k, d in setup["dicts"].items()}
    w = init_neural_weights(
        dict_sizes,
        setup["num_position"],
        n_classes=len(setup["labels"]),
        model=model,
    )
    losses = train_neural(
        setup["records"], setup["dicts"], w, setup["y"],
        setup["m_len"], setup["num_position"],
        epochs=200 if model == "convolute" else 120,
        batch=25,
    )
    assert losses[-1] < 0.1, f"underfit: {losses[-5:]}"

    preds = classify_mentions_neural(
        main_corpus_records(setup["mentions"]),
        w,
        setup["dicts"],
        setup["labels"],
        setup["m_len"],
        setup["num_position"],
    )
    got = {
        (r["rel_id"], r["corpus"], r["subj"], r["pred"], r["obj"])
        for r in triples_from_predictions(preds).select(
            "rel_id", "corpus", "subj", "pred", "obj"
        ).collect()
    }
    # gold triples from the gold labels through the same emission rule
    want = set()
    for r in setup["records"]:
        lab = r["label"]
        if lab == "NONE":
            continue
        subj = r["tokens"][r["pos1"]]
        obj = r["tokens"][r["pos2"]]
        if lab.endswith("(e2,e1)"):
            subj, obj = obj, subj
        pred = lab.replace("(e1,e2)", "").replace("(e2,e1)", "")
        want.add((r["rel_id"], r["corpus"], subj, pred, obj))
    tp = len(got & want)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(want) if want else 0.0
    assert precision >= 0.95 and recall >= 0.95, (
        model, precision, recall, len(got), len(want)
    )


@pytest.mark.parametrize("model", ["convolute", "gruHead"])
def test_gradcheck_with_fixed_dropout_mask(setup, model):
    """Backprop stays exact under dropout when the binomial mask is held
    fixed (the train-time graph of mainModel rnnReModels.py:743-766)."""
    recs = setup["records"][:5]
    y = setup["y"][:5]
    w = _tiny_weights(setup, model)
    w = {
        k: (v.astype(np.float64) if not k.startswith("_") else v)
        for k, v in w.items()
    }
    # probe feature width, then pin a mask with real zeros in it
    loss0, grads0, p0 = forward_backward(
        recs, setup["dicts"], w, y, setup["m_len"], setup["num_position"]
    )
    mask = np.random.RandomState(7).binomial(
        1, 0.5, size=(len(recs), w["cls_W"].shape[0])
    ).astype(np.float64)
    assert (mask == 0).any() and (mask == 1).any()

    def fb():
        return forward_backward(
            recs, setup["dicts"], w, y,
            setup["m_len"], setup["num_position"],
            dropout=0.5, dropout_mask=mask,
        )

    loss, grads, _ = fb()
    rng = np.random.RandomState(0)
    h = 1e-6
    for name, g in grads.items():
        flat = w[name].reshape(-1)
        gflat = np.asarray(g).reshape(-1)
        cand = np.nonzero(np.abs(gflat) > 1e-12)[0]
        pick = cand[rng.permutation(len(cand))[:3]] if len(cand) else []
        for i in list(pick) + [rng.randint(len(flat))]:
            orig = flat[i]
            flat[i] = orig + h
            lp, _, _ = fb()
            flat[i] = orig - h
            lm, _, _ = fb()
            flat[i] = orig
            num = (lp - lm) / (2 * h)
            assert num == pytest.approx(gflat[i], rel=2e-3, abs=1e-7), (
                model, name, i
            )


def test_dropout_train_vs_inference_scaling(setup):
    """Pin the reference's train/inference consistency (rnnReModels.py
    :766-768): E[mask] = (1−p), so the mask-averaged train logits equal
    the inference logits computed with (1−p)-scaled classifier weights."""
    recs = setup["records"][:6]
    y = setup["y"][:6]
    model = "convolute"
    w = _tiny_weights(setup, model)
    w = {
        k: (v.astype(np.float64) if not k.startswith("_") else v)
        for k, v in w.items()
    }
    p_drop = 0.4
    d = w["cls_W"].shape[0]
    # exact expectation: mask == (1-p) everywhere gives the scaled path
    mask = np.full((len(recs), d), 1.0 - p_drop)
    _, _, p_scaled = forward_backward(
        recs, setup["dicts"], w, y, setup["m_len"], setup["num_position"],
        dropout=p_drop, dropout_mask=mask,
    )
    w_inf = dict(w)
    w_inf["cls_W"] = w["cls_W"] * (1.0 - p_drop)
    _, p_clean = neural_forward(
        recs, setup["dicts"], w_inf, setup["m_len"], setup["num_position"]
    )
    assert np.allclose(p_scaled, p_clean, atol=1e-6)


def test_sgd_training_reduces_loss_under_dropout(setup):
    """SGD + binomial dropout still learns the fixture task."""
    from deepie_spark.model.train_neural import train_neural

    recs = setup["records"]
    w = _tiny_weights(setup, "convolute")
    losses = train_neural(
        recs, setup["dicts"], w, setup["y"],
        setup["m_len"], setup["num_position"],
        epochs=8, batch=10, dropout=0.5, optimizer="sgd", lr=0.1,
    )
    assert len(losses) == 8
    assert losses[-1] < losses[0]


def test_sgd_decay_halves_lr_and_stops(monkeypatch, setup):
    """decay (rnnRE.py:999-1000): once the best epoch is ≥10 behind,
    lr halves each epoch and training breaks below 1e-5.  A constant
    loss pins best_epoch at 0: halving starts at epoch 10
    (16e-5 → 8,4,2,1,0.5e-5) so exactly 15 epochs run."""
    import deepie_spark.model.train_neural as tn

    def fake_fb(recs, dicts, w, labels, m_len, np_, dropout=0.0,
                drop_rng=None, dropout_mask=None):
        return 1.0, {}, None

    monkeypatch.setattr(tn, "forward_backward", fake_fb)
    w = _tiny_weights(setup, "convolute")
    losses = tn.train_neural(
        setup["records"][:4], setup["dicts"], w, setup["y"][:4],
        setup["m_len"], setup["num_position"],
        epochs=60, batch=4, optimizer="sgd", lr=16e-5, decay=True,
    )
    assert len(losses) == 15
    # without decay the run goes the full distance
    losses2 = tn.train_neural(
        setup["records"][:4], setup["dicts"], w, setup["y"][:4],
        setup["m_len"], setup["num_position"],
        epochs=20, batch=4, optimizer="sgd", lr=16e-5, decay=False,
    )
    assert len(losses2) == 20
