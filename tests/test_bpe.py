"""BPE trainer (operators/bpe.py) vs an independent pure-Python
reference, on a corpus crafted to exercise the two merge-fold traps:

- chains: ``aaaa`` under merge (a,a) must become ``aa aa`` (leftmost
  non-overlapping), not ``aa a a``;
- symbol boundaries: once (a,b) merged, word ``abc`` is ``ab|c`` and
  a later (b,c) merge must NOT fire inside the ``ab`` symbol.
"""

from __future__ import annotations

from data_ingestion_task_spark.functions.cache import release_frame
from data_ingestion_task_spark.operators.bpe import _SEP, train_bpe


def _ref_bpe(word_counts: dict[str, int], n_merges: int):
    vocab = {tuple(w): c for w, c in word_counts.items() if len(w) >= 2}
    merges = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        # engine order: count desc, then pair-string (a␟b) asc
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0] + _SEP + kv[0][1]))
        if best[1] < 2:
            break
        (a, b), _n = best
        merges.append((a, b))
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges, vocab


WORD_COUNTS = {"ab": 10, "abc": 3, "xbc": 6, "aaaa": 4}
# round 1: (a,b)=13 wins over (a,a)=12
# round 2: (a,a)=12 wins (chain: aaaa -> aa|aa, leftmost non-overlap)
# round 3: (b,c)=6 ties (x,b)=6, pair-string asc -> (b,c); must not
#          touch ab|c ("abc" stays ab|c - the boundary guard)
# round 4: (x,bc)=6
EXPECTED_MERGES = [("a", "b"), ("a", "a"), ("b", "c"), ("x", "bc")]


def test_train_bpe_matches_reference(spark):
    text = " ".join(w for w, c in WORD_COUNTS.items() for _ in range(c))
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")

    merges, vocab = train_bpe(spark, docs, n_merges=4)
    ref_merges, ref_vocab = _ref_bpe(WORD_COUNTS, 4)

    assert merges == EXPECTED_MERGES == ref_merges
    got = {r["sym_str"]: r["wc"] for r in vocab.collect()}
    release_frame(vocab)  # caller owns the returned frame's lifetime
    want = {_SEP.join(syms): c for syms, c in ref_vocab.items()}
    assert got == want
    # the two trap words, explicitly
    assert got[_SEP.join(("aa", "aa"))] == 4
    assert got[_SEP.join(("ab", "c"))] == 3


def test_train_bpe_stops_when_dry(spark):
    docs = spark.createDataFrame(
        [(1, "ab cd ef")], "doc_id long, text string"
    )  # every pair count is 1 -> no merge meets the >=2 floor
    merges, vocab = train_bpe(spark, docs, n_merges=5)
    assert merges == []
    assert vocab.count() == 3
    release_frame(vocab)
