#!/usr/bin/env python
"""Build the 150×150 ADE20K label-similarity asset from word embeddings.

The ADPST paper (arXiv:1901.03915 §3.2) gates semantic class merging on
word-embedding similarity of the label NAMES; this environment has no
network, so the matrix ships as an offline-built asset (the same
workflow as the weight bundles). Obtain any word-vector file elsewhere —
GloVe/word2vec TEXT format: one `token v1 v2 … vD` line per word — and
run

    python tools/make_similarity_matrix.py glove.6B.300d.txt \
        weights/similarity_matrix.npz

dpst_tpu picks it up automatically (semantic_merge.py:_external_matrix,
or $DPST_SIMILARITY_MATRIX); select it at run time with
`--similarity-metric embedding` (it also takes precedence for the
built-in metric names while present).

Label embedding: each ADE20K label's synonyms (split on `|`) are
tokenized on spaces; the label vector is the mean of all known token
vectors. Similarity is cosine. Labels with NO known token keep only
self-similarity 1 (the loader's threshold semantics then route them to
the global fallback class, matching the built-in metrics' behavior for
unknown labels).
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dpst_tpu.semantic_merge import ADE20K_LABELS, N_CLASSES  # noqa: E402


def load_vectors(path: str, vocab: set[str]) -> dict[str, np.ndarray]:
    """Read only the needed tokens from a GloVe/word2vec text file."""
    vecs: dict[str, np.ndarray] = {}
    with open(path, encoding="utf-8") as f:
        first = f.readline()
        parts = first.rstrip("\n").split(" ")
        # word2vec text files start with a "count dim" header line
        if not (len(parts) == 2 and parts[0].isdigit()):
            if parts[0] in vocab:
                vecs[parts[0]] = np.asarray(parts[1:], np.float32)
        for line in f:
            tok, _, rest = line.partition(" ")
            if tok in vocab:
                vecs[tok] = np.asarray(rest.split(), np.float32)
    return vecs


def label_tokens(label: str) -> list[str]:
    return [t for syn in label.split("|") for t in syn.split()]


def build_matrix(vecs: dict[str, np.ndarray]
                 ) -> tuple[np.ndarray, int]:
    dim = len(next(iter(vecs.values()))) if vecs else 1
    emb = np.zeros((N_CLASSES, dim), np.float32)
    known = np.zeros(N_CLASSES, bool)
    for i, label in enumerate(ADE20K_LABELS):
        toks = [vecs[t] for t in label_tokens(label) if t in vecs]
        if toks:
            emb[i] = np.mean(toks, axis=0)
            known[i] = True
    norms = np.linalg.norm(emb, axis=1, keepdims=True)
    unit = np.divide(emb, norms, out=np.zeros_like(emb),
                     where=norms > 0)
    sim = unit @ unit.T
    sim[~known, :] = 0.0
    sim[:, ~known] = 0.0
    np.fill_diagonal(sim, 1.0)
    return ((sim + sim.T) / 2.0).astype(np.float32), int(known.sum())


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src", help="GloVe/word2vec text vectors")
    ap.add_argument("dst", help="output .npz path")
    args = ap.parse_args(argv)

    vocab = {t for lbl in ADE20K_LABELS for t in label_tokens(lbl)}
    vecs = load_vectors(args.src, vocab)
    sim, n_known = build_matrix(vecs)
    np.savez(args.dst, similarity=sim)
    print(f"wrote {args.dst}: {n_known}/{N_CLASSES} labels embedded, "
          f"{len(vecs)}/{len(vocab)} tokens found")
    return 0


if __name__ == "__main__":
    sys.exit(main())
