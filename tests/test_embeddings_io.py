"""Embedding reader tests (S2/S3) + OOV fill + table alignment."""

import numpy as np
import pytest

from deepie_spark.sources.embeddings import (
    add_unknown_words,
    get_W,
    load_bin_vec,
    load_text_vec,
    write_bin_vec,
)

VECS = {
    "cat": np.array([0.1, 0.2, 0.3], dtype=np.float32),
    "dog": np.array([-1.5, 0.0, 2.25], dtype=np.float32),
    "outside": np.array([9.0, 9.0, 9.0], dtype=np.float32),
}


def test_bin_roundtrip_with_vocab_filter(tmp_path):
    path = str(tmp_path / "w2v.bin")
    write_bin_vec(path, VECS, 3)
    dim, got = load_bin_vec(path, vocab={"cat", "dog", "unseen"})
    assert dim == 3
    assert set(got) == {"cat", "dog"}  # 'outside' filtered, 'unseen' absent
    assert np.allclose(got["cat"], VECS["cat"])
    assert np.allclose(got["dog"], VECS["dog"])
    assert got["cat"].dtype == np.float32


def test_text_reader_with_and_without_header(tmp_path):
    with_header = tmp_path / "wh.txt"
    with_header.write_text(
        "3 3\ncat 0.1 0.2 0.3\ndog -1.5 0.0 2.25\n"
    )
    dim, got = load_text_vec(str(with_header), {"cat", "dog"})
    assert dim == 3 and set(got) == {"cat", "dog"}

    no_header = tmp_path / "nh.txt"
    no_header.write_text("cat 0.1 0.2 0.3\ndog -1.5 0.0 2.25\n")
    dim2, got2 = load_text_vec(str(no_header), {"cat"})
    assert dim2 == 3 and set(got2) == {"cat"}
    assert np.allclose(got2["cat"], [0.1, 0.2, 0.3])


def test_text_reader_dim_mismatch_fails(tmp_path):
    bad = tmp_path / "bad.txt"
    bad.write_text("cat 0.1 0.2 0.3\ndog 1.0 2.0\n")
    with pytest.raises(ValueError, match="dim"):
        load_text_vec(str(bad), {"cat", "dog"})


def test_add_unknown_words_deterministic():
    ids = {"cat": 1, "new1": 2, "new2": 3}
    a = add_unknown_words({"cat": VECS["cat"].copy()}, ids, 3, seed=8989)
    b = add_unknown_words({"cat": VECS["cat"].copy()}, ids, 3, seed=8989)
    assert np.array_equal(a["new1"], b["new1"])
    assert np.array_equal(a["new2"], b["new2"])
    assert not np.array_equal(a["new1"], a["new2"])
    assert (np.abs(a["new1"]) <= 0.25).all()
    # seeded fill ignores already-present words
    assert np.allclose(a["cat"], VECS["cat"])


def test_get_W_layout():
    ids = {"cat": 1, "dog": 2}
    vecs = {k: VECS[k] for k in ids}
    W = get_W(vecs, ids, 3)
    assert W.shape == (3, 3)
    assert not W[0].any()  # pad row zero
    assert np.allclose(W[1], VECS["cat"])
    assert np.allclose(W[2], VECS["dog"])
    with pytest.raises(ValueError, match="pad"):
        get_W(vecs, {"cat": 0}, 3)


def test_corpus_vocab_alignment(tmp_path):
    """End-to-end S2→get_W against the fixture corpus vocabulary ids."""
    from deepie_spark.sources.tsv_corpus import parse_line
    from tests.test_dictionary import SEEDS, record_streams
    from tests.test_parser import all_lines

    word_ids: dict[str, int] = {}
    nxt = 1
    for corpus, _, line in all_lines():
        rec = parse_line(corpus, line)
        for stream in record_streams(rec)["word"]:
            for w in stream:
                if w not in word_ids:
                    word_ids[w] = nxt
                    nxt += 1
    some = dict(list(word_ids.items())[:50])
    file_vecs = {
        w: np.full(4, i, dtype=np.float32) for i, w in enumerate(some)
    }
    path = str(tmp_path / "v.bin")
    write_bin_vec(path, file_vecs, 4)
    dim, vecs = load_bin_vec(path, set(word_ids))
    vecs = add_unknown_words(vecs, word_ids, dim)
    W = get_W(vecs, word_ids, dim)
    assert W.shape == (len(word_ids) + 1, 4)
    for w, i in list(word_ids.items())[:50]:
        assert np.allclose(W[i], vecs[w])
