"""Generate a same-process scaled `documents` table for scaling probes.

The driver ships sf0.001/0.01/0.1 only; measuring a scaling EXPONENT
(e.g. dd19's candidate-volume growth) needs a third decade. This
reproduces the testdata documents process as measured from the shipped
files (TESTDATA.md corpus, read-only): fixed 31-word vocabulary,
uniform word draw, word count uniform in [10, 100], langs/sources
categorical, plus ~4.5%% near-dup clone-mutations (the shipped corpora
put ~9.5%% of docs in dd02's near-dup pair graph at every sf). Output
goes under .scratch/ (derived data, regenerable, never committed).

Caveat recorded in SCALE.md: the FIXED tiny vocabulary makes every
gram's df grow linearly with corpus size — a saturation stress case.
Real text has Heaps-law vocabulary growth that keeps rare-gram dfs
bounded, so exponents measured here upper-bound production behavior.

Usage: python tools/gen_scale_docs.py [n_docs] [out_dir]
(defaults 50000 -> .scratch/scaledocs/sf1.0)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VOCAB = (
    "the,column,order,a,vector,part,scan,slow,agg,key,window,table,merge,"
    "join,query,row,stream,spark,fast,customer,batch,data,line,small,group,"
    "sort,value,hash,filter,big,dup"
).split(",")
LANGS = ["en", "en", "en", "en", "en", "en", "zh", "fr", "de", "es"]
N_SOURCES = 20
CLONE_P = 0.045  # ~9.5% of docs end up in near-dup pairs
MUT_P = 0.10  # fraction of words substituted in a substitution clone
TRUNC_P = 0.62  # fraction of clones that are contiguous-subspan cuts
# (calibrated against the shipped sf0.1: substitution clones reproduce
# dd02's Jaccard pairs, subspan clones reproduce dd19's asymmetric
# containment pairs — the real corpus clearly injects both kinds)


def _heaps_vocab(n_docs: int) -> np.ndarray:
    """Heaps-law vocabulary for --heaps mode: V = K·tokens^0.5 synthetic
    words (natural text grows its vocabulary with corpus size — this is
    what keeps rare-gram dfs bounded as N grows, the regime the fixed
    31-word corpus deliberately violates)."""
    tokens = 55 * n_docs  # mean doc length
    v = max(len(VOCAB), int(3 * tokens**0.5))
    return np.array([f"w{i}" for i in range(v)])


def generate(n_docs: int, seed: int = 42, heaps: bool = False):
    rng = np.random.default_rng(seed)
    if heaps:
        vocab = _heaps_vocab(n_docs)
        # Zipfian draw (s=1.1): hot head words + a long rare tail, the
        # natural-text shape; rare words keep prefix-gram dfs O(1)
        ranks = np.arange(1, len(vocab) + 1, dtype=np.float64)
        p = ranks**-1.1
        p /= p.sum()
    else:
        vocab = np.array(VOCAB)
        p = None
    texts: list[str] = []
    i = 0
    def draw(n: int) -> np.ndarray:
        if p is None:
            return vocab[rng.integers(0, len(vocab), n)]
        return rng.choice(vocab, size=n, p=p)

    while len(texts) < n_docs:
        n_words = int(rng.integers(10, 101))
        words = draw(n_words)
        texts.append(" ".join(words))
        i += 1
        if len(texts) < n_docs and rng.random() < CLONE_P:
            if rng.random() < TRUNC_P:
                # contained clone: a contiguous subspan of the original
                keep = max(6, int(n_words * rng.uniform(0.5, 0.9)))
                start = int(rng.integers(0, n_words - keep + 1))
                mut = words[start : start + keep]
            else:
                mut = words.copy()
                flips = rng.random(n_words) < MUT_P
                mut[flips] = draw(int(flips.sum()))
            texts.append(" ".join(mut))
    doc_id = np.arange(n_docs, dtype=np.int64)
    lang = [LANGS[int(k)] for k in rng.integers(0, len(LANGS), n_docs)]
    source = [f"src{int(k)}" for k in rng.integers(0, N_SOURCES, n_docs)]
    n_chars = np.array([len(t) for t in texts], dtype=np.int64)
    return pa.table(
        {
            "doc_id": doc_id,
            "text": texts,
            "lang": lang,
            "source": source,
            "n_chars": n_chars,
        }
    )


def main() -> None:
    heaps = "--heaps" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--heaps"]
    n_docs = int(args[0]) if args else 50_000
    out_dir = (
        args[1]
        if len(args) > 1
        else os.path.join(REPO, ".scratch", "scaledocs", "sf1.0")
    )
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "documents.parquet")
    pq.write_table(generate(n_docs, heaps=heaps), out)
    print(f"wrote {out} ({n_docs} docs, heaps={heaps})")


if __name__ == "__main__":
    main()
