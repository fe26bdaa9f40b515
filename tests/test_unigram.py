"""Unigram-LM tokenizer (operators/unigram.py) vs a plain-Python
replica of the SAME contract: probability-space Viterbi with exact
integer-ratio piece probabilities, longest-final-piece tie-break,
single-char cnt>=1 coverage floor, hard-EM recounts. Like the BPE
suite, these tests check that the Spark plan computes the declared
contract — the registry oracle then proves the contract is
engine-portable."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_streams_examples_spark.operators import unigram as U


def _toks(t):
    return [w for w in re.split(r"\s+", (t or "").lower()) if w]


def _py_seed(wc, keep, max_len):
    cand = Counter()
    for w, c in wc.items():
        for s in range(len(w)):
            for k in range(1, min(max_len, len(w) - s) + 1):
                cand[w[s:s + k]] += c
    singles = {p: c for p, c in cand.items() if len(p) == 1}
    multis = sorted(((p, c) for p, c in cand.items() if len(p) >= 2),
                    key=lambda pc: (-pc[1], pc[0]))[:keep]
    pieces = dict(singles)
    pieces.update(dict(multis))
    return pieces, set(singles)


def _py_viterbi(word, pieces, tot, max_len):
    """dist[m] = max over k of dist[m-k] * cnt/tot; strict-> replacement
    in k-descending order (ties -> longest final piece); unseen single
    chars fall back to cnt=1."""
    dp = [(1.0, 0)]
    for m in range(1, len(word) + 1):
        best = (-1.0, -1)
        for k in range(min(max_len, m), 0, -1):
            i = m - k
            cnt = pieces.get(word[i:m], 1 if k == 1 else 0)
            c = dp[i][0] * (float(cnt) / float(tot))
            if c > best[0]:
                best = (c, i)
        dp.append(best)
    ps, pos = [], len(word)
    while pos > 0:
        bp = dp[pos][1]
        ps.insert(0, word[bp:pos])
        pos = bp
    return ps


def _py_train(texts, keep=40, iters=2, max_len=4):
    wc = Counter(w for t in texts for w in _toks(t))
    pieces, singles = _py_seed(wc, keep, max_len)
    for _ in range(iters):
        tot = sum(pieces.values())
        cnts = Counter()
        for w, c in wc.items():
            for p in _py_viterbi(w, pieces, tot, max_len):
                cnts[p] += c
        pieces = {p: c for p, c in cnts.items() if len(p) >= 2}
        for ch in singles:
            pieces[ch] = max(cnts.get(ch, 0), 1)
    return pieces, wc


def _py_encode(texts, pieces, max_len=4):
    tot = sum(pieces.values())
    idmap = {p: i + 1 for i, p in enumerate(sorted(pieces))}
    out = {}
    for d, t in texts:
        ws = _toks(t)
        ids, ntok = [], 0
        for w in ws:
            ps = _py_viterbi(w, pieces, tot, max_len)
            ntok += len(ps)
            ids.extend(str(idmap.get(p, U.UNK_ID)) for p in ps)
        out[d] = (len(ws), ntok, ",".join(ids))
    return out


CORPUS = [
    (1, "the cat sat on the mat"),
    (2, "the cat ate the rat and the bat"),
    (3, "concatenation of cats in a catalogue"),
    (4, "aaaa abab ababab banana bandana"),
    (5, None),
    (6, "   "),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_unigram_train_matches_python_replica(docs):
    pieces, _ = _py_train([t for _, t in CORPUS])
    tot = sum(pieces.values())
    want = sorted((p, c, math.floor(c / tot * 1e6 + 0.5) / 1e6)
                  for p, c in pieces.items())
    got = sorted((r.piece, r.cnt, r.prob)
                 for r in U.unigram_train(docs).collect())
    assert got == want


def test_unigram_encode_matches_python_replica(docs):
    pieces, _ = _py_train([t for _, t in CORPUS])
    want = _py_encode(CORPUS, pieces)
    got = {r.doc_id: (r.n_words, r.n_tokens, r.token_ids)
           for r in U.unigram_encode(docs).collect()}
    assert got == want


def test_segmentation_round_trip(docs):
    """Every word's Viterbi pieces concatenate back to the word, and no
    piece exceeds max_len (full-coverage contract of the char floor)."""
    from kafka_streams_examples_spark.operators.bpe import word_counts
    pieces, _ = U._em_rounds(docs, 40, 2, 4, "text")
    seg = U.segment_words(word_counts(docs), pieces, max_len=4)
    for r in seg.collect():
        assert "".join(r.pieces) == r.word
        assert all(1 <= len(p) <= 4 for p in r.pieces)


def test_apply_unigram_oov_char_is_unk(spark, docs):
    """A character absent from training still segments (cnt=1 fallback
    keeps a positive-cost path) and encodes as UNK_ID 0; known pieces
    around it keep their trained ids."""
    codec = U.unigram_codec(docs)
    new = spark.createDataFrame([(99, "the zzz cat")],
                                "doc_id long, text string")
    row = U.apply_unigram(new, codec).collect()[0]
    assert row.n_words == 3
    ids = row.token_ids.split(",")
    assert "0" in ids  # the z's are UNK
    assert all(i == "0" or int(i) > 0 for i in ids)
    # train-side replica agrees on the whole encoding
    pieces, _ = _py_train([t for _, t in CORPUS])
    want = _py_encode([(99, "the zzz cat")], pieces)[99]
    assert (row.n_words, row.n_tokens, row.token_ids) == want


def test_unigram_empty_corpus(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert U.unigram_train(empty).count() == 0
    assert U.unigram_encode(empty).count() == 0


_words = st.lists(st.text(alphabet="abc", min_size=1, max_size=7),
                  min_size=1, max_size=10)


@settings(max_examples=6, deadline=None)
@given(st.lists(_words, min_size=1, max_size=4))
def test_unigram_property_random_corpora(spark, corpora):
    """Random tiny corpora over a 3-letter alphabet — dense with
    repeated substrings and ties, exactly where the tie-break or the
    coverage floor would diverge from the replica."""
    texts = [" ".join(ws) for ws in corpora]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    pieces, _ = _py_train(texts, keep=10, iters=2, max_len=3)
    tot = sum(pieces.values())
    want = sorted((p, c, math.floor(c / tot * 1e6 + 0.5) / 1e6)
                  for p, c in pieces.items())
    got = sorted((r.piece, r.cnt, r.prob) for r in
                 U.unigram_train(docs, keep=10, iters=2,
                                 max_len=3).collect())
    assert got == want
    want_e = _py_encode(list(enumerate(texts)), pieces, max_len=3)
    got_e = {r.doc_id: (r.n_words, r.n_tokens, r.token_ids) for r in
             U.unigram_encode(docs, keep=10, iters=2,
                              max_len=3).collect()}
    assert got_e == want_e


def test_apply_unigram_join_equals_broadcast_byte_for_byte(spark):
    """The crossover contract of the size-thresholded strategies: the
    word-memoized TABLE applied via the shuffle_hash equi-join must
    reproduce the broadcast-map encode exactly — including empty
    documents (the (0, 0, '') fallbacks) and UNK characters."""
    docs = spark.createDataFrame(
        [(0, "abc abc de"), (1, ""), (2, "   "), (3, "de f abc"),
         (4, "zzz"), (5, "abc zzz de de")],   # z unseen chars stay; dup words
        "doc_id long, text string")
    codec = U.unigram_codec(docs, keep=6, iters=1, max_len=3)
    b = sorted(map(tuple, U.apply_unigram(
        docs, codec, max_len=3).collect()))
    j = sorted(map(tuple, U.apply_unigram(
        docs, codec, max_len=3, strategy="join").collect()))
    assert b == j
    # auto: a forced 1-word limit must dispatch to the join path and
    # still agree; a huge limit stays on broadcast
    a = sorted(map(tuple, U.apply_unigram(
        docs, codec, max_len=3, strategy="auto", word_limit=1).collect()))
    assert a == b


def test_apply_unigram_rejects_unknown_strategy(spark):
    docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    codec = U.unigram_codec(docs, keep=2, iters=1, max_len=2)
    with pytest.raises(ValueError, match="strategy"):
        U.apply_unigram(docs, codec, strategy="nope")
