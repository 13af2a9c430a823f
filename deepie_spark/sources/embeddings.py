"""Word-embedding file readers (S2/S3) + vocabulary alignment.

Brand-new implementations of the reference's embedding-ingestion
semantics (``load_bin_vec`` rnn_process_onlyExtra.py:576-601,
``load_text_vec`` :603-627, ``add_unknown_words`` :629-636, ``get_W``
:666-669):

* **binary** (Mikolov word2vec format): header ``"<vocab> <dim>\\n"``,
  then per word: space-terminated token bytes followed by ``dim``
  little-endian float32s; only in-corpus-vocab words are kept;
* **text**: one ``word v1 v2 …`` line each, optional ``"<n> <dim>"``
  header line (detected when the first line has 2 fields), dim inferred
  from the first data row otherwise;
* **OOV fill**: vocabulary words absent from the file get
  uniform(-0.25, 0.25) vectors from a seeded RNG (reference seeds numpy
  with 8989 at :639) — deterministic given the iteration order, which we
  pin to the vocabulary's id order;
* **get_W**: dense (n+1, dim) float32 matrix; row 0 is the all-zero pad
  vector (:567), row ``id`` is word ``id``'s vector — the broadcastable
  artifact consumed by J2 gathers in the inference UDFs.

Embedding files are driver-side artifacts (vocabulary-sized, not
corpus-sized), so these are plain-python readers; the *distributed*
piece is the vocab semi-join (J3) done on the corpus side
(operators.dictionary) and the ``SparkContext.broadcast`` of the final
matrix.
"""

from __future__ import annotations

import struct

import numpy as np


def load_bin_vec(path: str, vocab: set[str]) -> tuple[int, dict[str, np.ndarray]]:
    """Mikolov binary reader; keeps only words in ``vocab``."""
    vecs: dict[str, np.ndarray] = {}
    with open(path, "rb") as f:
        header = f.readline().split()
        n_words, dim = int(header[0]), int(header[1])
        width = 4 * dim
        for _ in range(n_words):
            chars = []
            while True:
                c = f.read(1)
                if c == b" ":
                    break
                if c == b"":
                    raise ValueError("truncated word2vec binary file")
                if c != b"\n":  # some writers prepend \n to each record
                    chars.append(c)
            word = b"".join(chars).decode("utf-8", errors="replace")
            buf = f.read(width)
            if len(buf) != width:
                raise ValueError("truncated vector payload")
            if word in vocab:
                vecs[word] = np.frombuffer(buf, dtype="<f4").copy()
    return dim, vecs


def load_text_vec(path: str, vocab: set[str]) -> tuple[int, dict[str, np.ndarray]]:
    """Text-format reader; dim from header line or first data row."""
    vecs: dict[str, np.ndarray] = {}
    dim = 0
    with open(path, encoding="utf-8") as f:
        first = f.readline().rstrip("\n")
        parts = first.split()
        if len(parts) == 2 and all(p.isdigit() for p in parts):
            dim = int(parts[1])
        else:
            dim = len(parts) - 1
            word, vals = parts[0], parts[1:]
            if word in vocab:
                vecs[word] = np.array(vals, dtype=np.float32)
        for line in f:
            parts = line.rstrip("\n").split()
            if not parts:
                continue
            word, vals = parts[0], parts[1:]
            if len(vals) != dim:
                raise ValueError(
                    f"row dim {len(vals)} != {dim} for word {word!r}"
                )
            if word in vocab:
                vecs[word] = np.array(vals, dtype=np.float32)
    return dim, vecs


def add_unknown_words(
    vecs: dict[str, np.ndarray],
    word_ids: dict[str, int],
    dim: int,
    seed: int = 8989,
) -> dict[str, np.ndarray]:
    """OOV fill: uniform(-0.25, 0.25) per missing vocab word, drawn in
    ascending word-id order so the result is partition/scan invariant."""
    rng = np.random.RandomState(seed)
    for word, _ in sorted(word_ids.items(), key=lambda kv: kv[1]):
        if word not in vecs:
            vecs[word] = rng.uniform(-0.25, 0.25, dim).astype(np.float32)
    return vecs


def get_W(
    vecs: dict[str, np.ndarray], word_ids: dict[str, int], dim: int
) -> np.ndarray:
    """(max_id + 1, dim) float32 table, row 0 = zero pad vector."""
    n = max(word_ids.values())
    W = np.zeros((n + 1, dim), dtype=np.float32)
    for word, i in word_ids.items():
        if i == 0:
            raise ValueError("word id 0 is reserved for the pad row")
        W[i] = vecs[word]
    return W


def write_bin_vec(path: str, vecs: dict[str, np.ndarray], dim: int) -> None:
    """Mikolov-binary writer (fixture generation for tests)."""
    with open(path, "wb") as f:
        f.write(f"{len(vecs)} {dim}\n".encode())
        for word, v in vecs.items():
            f.write(word.encode("utf-8") + b" ")
            f.write(struct.pack(f"<{dim}f", *np.asarray(v, dtype=np.float32)))
