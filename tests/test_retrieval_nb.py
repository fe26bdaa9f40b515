"""Unit tests for sparse lexical retrieval (operators/retrieval.py),
cross-document line dedup and the NB quality filter (operators/text.py).
"""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from kafka_streams_examples_spark.operators import retrieval as RET
from kafka_streams_examples_spark.operators.text import line_dedup, nb_quality

K1, B = RET.K1, RET.B


def _bm25_python(rows: list[tuple[int, str]], n_queries: int, k: int):
    """Plain-Python replica of the module's integer-quantized BM25
    contract (idf -> micro-nat int per term, impact -> int per posting,
    doc score = int sum; ties rank by (s6 desc, c_id asc))."""
    toks = {d: t.lower().split() for d, t in rows}
    tf = {d: Counter(ws) for d, ws in toks.items()}
    dl = {d: sum(c.values()) for d, c in tf.items()}
    n = len([d for d in dl if dl[d] > 0])
    avgdl = sum(dl.values()) / n
    df = Counter(w for c in tf.values() for w in c)
    idf6 = {w: math.floor(math.log(1.0 + (n - df[w] + 0.5) / (df[w] + 0.5))
                          * 1e6 + 0.5) for w in df}

    def w6(d, w):
        t = float(tf[d][w])
        comp = t * (K1 + 1.0) / (t + K1 * ((1.0 - B) + B * (dl[d] / avgdl)))
        return math.floor(float(idf6[w]) * comp + 0.5)

    out = {}
    for q in range(n_queries):
        scores = {}
        for c in tf:
            if c == q:
                continue
            s6 = sum(w6(c, w) for w in set(toks[q]) if w in tf[c])
            if s6:
                scores[c] = s6
        ranked = sorted(scores.items(), key=lambda x: (-x[1], x[0]))[:k]
        out[q] = [(c, math.floor(s / 1e6 * 1e4 + 0.5) / 1e4, r + 1)
                  for r, (c, s) in enumerate(ranked)]
    return out


CORPUS = [
    (0, "spark shuffle join spark"),
    (1, "join window agg"),
    (2, "spark spark spark filter"),
    (3, "window window shuffle agg filter"),
    (4, "filter agg join shuffle spark window"),
    (5, "shuffle shuffle shuffle"),
]


def test_bm25_topk_matches_python_replica(spark):
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    got = {q: [] for q in range(2)}
    for r in RET.bm25_topk(docs, k=3, n_queries=2).collect():
        got[r.q_id].append((r.c_id, r.score, r.rnk))
    for q in got:
        got[q].sort(key=lambda x: x[2])
    assert got == _bm25_python(CORPUS, n_queries=2, k=3)


def test_bm25_pruned_equals_exact_when_index_uncut(spark):
    # r_floor covers every posting list -> candidates == all matching
    # docs, and the exact rerank must reproduce bm25_topk verbatim
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    exact = sorted(map(tuple, RET.bm25_topk(docs, k=3, n_queries=2).collect()))
    pruned = sorted(map(tuple,
                        RET.bm25_pruned(docs, k=3, n_queries=2,
                                        r_floor=100).collect()))
    assert pruned == exact


def test_bm25_recall_is_one_when_index_uncut(spark):
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    rows = RET.bm25_recall(docs, k=3, n_queries=2, r_floor=100).collect()
    assert len(rows) == 2
    assert all(r.recall_at_k == 1.0 for r in rows)


def test_bm25_self_excluded_and_rank_contract(spark):
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    rows = RET.bm25_topk(docs, k=5, n_queries=3).collect()
    assert all(r.c_id != r.q_id for r in rows)
    per_q = {}
    for r in rows:
        per_q.setdefault(r.q_id, []).append(r)
    for q, rs in per_q.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        # scores non-increasing in rank
        assert all(a.score >= b.score for a, b in zip(rs, rs[1:]))


# --- line dedup -----------------------------------------------------------

W12A = " ".join(f"a{i}" for i in range(12))   # a shared 12-word line
W12B = " ".join(f"b{i}" for i in range(12))
W12C = " ".join(f"c{i}" for i in range(12))


def test_line_dedup_removes_cross_doc_lines_keeps_order(spark):
    docs = spark.createDataFrame(
        [(0, W12A + " " + W12B),    # line0 = A (dup), line1 = B (unique)
         (1, W12A + " " + W12C),    # line0 = A (dup), line1 = C (unique)
         (2, W12C.replace("c", "d"))],  # untouched singleton
        ["doc_id", "text"])
    got = {r.doc_id: r for r in line_dedup(docs).collect()}
    assert (got[0].n_lines, got[0].n_kept, got[0].clean_text) == (2, 1, W12B)
    assert (got[1].n_lines, got[1].n_kept, got[1].clean_text) == (2, 1, W12C)
    assert got[2].n_kept == got[2].n_lines == 1


def test_line_dedup_all_lines_removed_yields_empty_text(spark):
    docs = spark.createDataFrame(
        [(0, W12A), (1, W12A)], ["doc_id", "text"])
    got = {r.doc_id: r for r in line_dedup(docs).collect()}
    for d in (0, 1):
        assert (got[d].n_lines, got[d].n_kept, got[d].clean_text) == (1, 0, "")


def test_line_dedup_min_docs_threshold(spark):
    docs = spark.createDataFrame(
        [(0, W12A), (1, W12A), (2, W12B)], ["doc_id", "text"])
    got = {r.doc_id: r for r in line_dedup(docs, min_docs=3).collect()}
    assert all(got[d].n_kept == 1 for d in (0, 1, 2))


def test_line_dedup_survivors_rejoin_in_original_order(spark):
    # doc 0: unique, DUP, unique -> clean text must be line0 \n line2
    docs = spark.createDataFrame(
        [(0, W12B + " " + W12A + " " + W12C), (1, W12A)],
        ["doc_id", "text"])
    got = {r.doc_id: r for r in line_dedup(docs).collect()}
    assert got[0].clean_text == W12B + "\n" + W12C
    assert (got[0].n_lines, got[0].n_kept) == (3, 2)


# --- NB quality filter ----------------------------------------------------

TGT_TEXT = "alpha beta alpha beta alpha beta gamma alpha beta"
RAW_TEXT = "delta eps delta eps delta eps zeta delta eps"


def _nb_rows():
    # train docs (id % 5 != 0) carry the dialect split; held-out docs
    # (id % 5 == 0) test generalization: doc 10 is target-dialect but
    # NOT from a target source, doc 15 is off-dialect
    return [
        (1, TGT_TEXT, "src0"), (2, TGT_TEXT, "src1"),
        (3, RAW_TEXT, "src9"), (4, RAW_TEXT, "src8"),
        (6, TGT_TEXT, "src2"), (7, RAW_TEXT, "src7"),
        (10, TGT_TEXT, "src9"),   # held out, target dialect
        (15, RAW_TEXT, "src9"),   # held out, raw dialect
        (20, "single", "src9"),   # held out, <2 tokens -> prior only
    ]


def test_nb_quality_generalizes_to_held_out_dialect(spark):
    docs = spark.createDataFrame(_nb_rows(), ["doc_id", "text", "source"])
    got = {r.doc_id: r for r in nb_quality(docs).collect()}
    assert not got[10].is_train and not got[10].is_target
    assert got[10].pred_target        # learned dialect, not the label rule
    assert not got[15].pred_target
    assert got[10].score > got[15].score
    # <2 tokens: no features, score == quantized prior (3 target vs 3
    # raw train docs -> prior 0 -> pred false)
    assert got[20].score == 0.0 and not got[20].pred_target


def test_nb_quality_matches_python_replica(spark):
    rows = _nb_rows()
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {r.doc_id: r for r in nb_quality(docs).collect()}

    def grams(t):
        ws = t.lower().split()
        return [f"{a} {b}" for a, b in zip(ws, ws[1:])]

    tgt_srcs = {"src0", "src1", "src2", "src3", "src4"}
    c1, c0 = Counter(), Counter()
    n1 = n0 = 0
    for d, t, s in rows:
        if d % 5 == 0:
            continue
        if s in tgt_srcs:
            n1 += 1
            c1.update(grams(t))
        else:
            n0 += 1
            c0.update(grams(t))
    vocab = set(c1) | set(c0)
    tot1, tot0, v = sum(c1.values()), sum(c0.values()), len(vocab)
    w6 = {w: math.floor(math.log(((c1[w] + 1) * (tot0 + v))
                                 / ((c0[w] + 1) * (tot1 + v)))
                        * 1e6 + 0.5) for w in vocab}
    p6 = math.floor(math.log(n1 / n0) * 1e6 + 0.5)
    for d, t, s in rows:
        s6 = p6 + sum(w6.get(g, 0) for g in grams(t))
        exp = math.floor(s6 / 1e6 * 1e4 + 0.5) / 1e4
        assert got[d].score == exp, d
        assert got[d].pred_target == (s6 > 0), d


def test_nb_quality_single_class_collapses_to_zero(spark):
    docs = spark.createDataFrame(
        [(1, TGT_TEXT, "src9"), (2, RAW_TEXT, "src8"), (5, TGT_TEXT, "src9")],
        ["doc_id", "text", "source"])   # no target-source doc in train
    rows = nb_quality(docs).collect()
    assert all(r.score == 0.0 and not r.pred_target for r in rows)


# --- persisted index + hybrid fusion --------------------------------------

def test_bm25_index_persisted_equals_inline(spark, tmp_path):
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    RET.build_bm25_index(docs, str(tmp_path / "idx"), r_floor=2,
                         keep_denom=3)
    got = sorted(map(tuple,
                     RET.query_bm25_index(spark, str(tmp_path / "idx"),
                                          docs.filter("doc_id < 2"),
                                          k=3).collect()))
    want = sorted(map(tuple,
                      RET.bm25_pruned(docs, k=3, n_queries=2, r_floor=2,
                                      keep_denom=3).collect()))
    assert got == want


def test_bm25_index_serving_reads_zero_corpus_text(spark, tmp_path):
    sf_docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    RET.build_bm25_index(sf_docs, str(tmp_path / "idx"))
    queries = spark.createDataFrame(
        [(9001, "spark join window"), (9002, "filter agg")],
        ["doc_id", "text"])
    res = RET.query_bm25_index(spark, str(tmp_path / "idx"), queries)
    files = res.inputFiles()
    assert files, "plan should read the persisted index"
    assert all("/idx/" in f for f in files)   # never documents.parquet
    assert res.count() > 0


def test_bm25_index_scan_partitioned_by_word_bucket(spark, tmp_path):
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    RET.build_bm25_index(docs, str(tmp_path / "idx"))
    import os
    parts = [d for d in os.listdir(str(tmp_path / "idx" / "postings"))
             if d.startswith("wb=")]
    assert parts, "postings must be partitioned by the word-hash bucket"
    plan = (RET.query_bm25_index(spark, str(tmp_path / "idx"),
                                 docs.filter("doc_id < 1"))
            ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters" in plan or "dynamicpruning" in plan


def _rrf_python(dense, sparse, k=5, kc=60):
    import math
    cand = {}
    for (q, c, r) in dense:
        cand[(q, c)] = cand.get((q, c), 0) + math.floor(1e6 / (kc + r) + 0.5)
    for (q, c, r) in sparse:
        cand[(q, c)] = cand.get((q, c), 0) + math.floor(1e6 / (kc + r) + 0.5)
    out = {}
    for q in {q for q, _ in cand}:
        rows = sorted(((s, c) for (qq, c), s in cand.items() if qq == q),
                      key=lambda x: (-x[0], x[1]))[:k]
        out[q] = [(c, s / 1e6, i + 1) for i, (s, c) in enumerate(rows)]
    return out


def test_hybrid_rrf_matches_python_replica(spark):
    dense = [(0, 10, 1), (0, 11, 2), (1, 20, 1)]
    sparse = [(0, 11, 1), (0, 12, 2), (1, 21, 1)]
    ddf = spark.createDataFrame(dense, ["q_id", "c_id", "rnk"])
    sdf = spark.createDataFrame(sparse, ["q_id", "c_id", "rnk"])
    got = {}
    for r in RET.hybrid_rrf(ddf, sdf, k=5).collect():
        got.setdefault(r.q_id, []).append((r.c_id, r.rrf_score, r.rnk))
    for q in got:
        got[q].sort(key=lambda x: x[2])
    assert got == _rrf_python(dense, sparse)
    # the doc both tiers agree on outranks every single-tier doc
    assert got[0][0][0] == 11


def test_hybrid_rrf_missing_tier_contributes_zero(spark):
    ddf = spark.createDataFrame([(0, 10, 1)], ["q_id", "c_id", "rnk"])
    sdf = spark.createDataFrame([(0, 11, 1)], ["q_id", "c_id", "rnk"])
    rows = sorted(RET.hybrid_rrf(ddf, sdf, k=5).collect(),
                  key=lambda r: r.rnk)
    # equal single-tier contributions: tie breaks to the lower c_id
    assert [r.c_id for r in rows] == [10, 11]
    assert rows[0].rrf_score == rows[1].rrf_score


def test_apply_nb_equals_nb_quality_scores(spark):
    from kafka_streams_examples_spark.operators.text import apply_nb, nb_model
    docs = spark.createDataFrame(_nb_rows(), ["doc_id", "text", "source"])
    model = nb_model(docs)
    got = {r.doc_id: (r.score, r.pred_target)
           for r in apply_nb(docs, model).collect()}
    want = {r.doc_id: (r.score, r.pred_target)
            for r in nb_quality(docs).collect()}
    assert got == want


def test_bm25_family_empty_and_blank_corpora_yield_empty(spark):
    # empty relation: the stats aggregation produces no row, so the
    # avgdl division never evaluates (no ANSI divide error) and every
    # tier returns 0 rows; same for all-whitespace documents
    empty = spark.createDataFrame([], "doc_id long, text string")
    blank = spark.createDataFrame([(0, ""), (1, "  ")],
                                  "doc_id long, text string")
    for docs in (empty, blank):
        assert RET.bm25_topk(docs).count() == 0
        assert RET.bm25_pruned(docs).count() == 0
        assert RET.bm25_recall(docs).count() == 0
    assert line_dedup(empty).count() == 0


def test_apply_line_filter_equals_line_dedup(spark, sf_dir):
    from kafka_streams_examples_spark.operators.text import (
        apply_line_filter, boiler_codec,
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(map(tuple,
                     apply_line_filter(docs, boiler_codec(docs)).collect()))
    want = sorted(map(tuple, line_dedup(docs).collect()))
    assert got == want and got


def test_bm25_gate_flags_near_copy_not_unrelated(spark):
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    index = RET.bm25_gate_index(docs, r_floor=100)
    new = spark.createDataFrame(
        [(9001, "spark shuffle join spark"),        # copy of doc 0
         (9002, "zzz yyy xxx www")],                # shares nothing
        ["doc_id", "text"])
    rows = RET.bm25_gate(new, index, tau=1.0).collect()
    by_new = {}
    for r in rows:
        by_new.setdefault(r.new_id, set()).add(r.c_id)
    assert 0 in by_new.get(9001, set())     # the near-copy is flagged
    assert 9002 not in by_new               # no-overlap doc passes clean
    # exactly-once per (new, c) pair despite several shared words
    assert len(rows) == len({(r.new_id, r.c_id) for r in rows})


def test_bm25_gate_score_matches_pruned_map_sum(spark):
    import math
    docs = spark.createDataFrame(CORPUS, ["doc_id", "text"])
    index = RET.bm25_gate_index(docs, r_floor=100)
    new = spark.createDataFrame([(9001, "spark shuffle join spark")],
                                ["doc_id", "text"])
    got = {r.c_id: r.score for r in RET.bm25_gate(new, index, tau=0.1).collect()}
    # with the index uncut (r_floor covers all postings), the gate score
    # equals the exact BM25 sum over shared terms — replicate in python
    rep = _bm25_python(CORPUS + [(9001, "spark shuffle join spark")],
                       n_queries=1, k=10)
    # replica ranks query 0 == doc 0's text == the new doc's text; its
    # scored candidates (excluding doc 0 itself handled by gate) match
    want = {}
    toks = {d: t.lower().split() for d, t in CORPUS}
    # rebuild expected from the replica machinery over the ORIGINAL corpus
    from collections import Counter
    tf = {d: Counter(ws) for d, ws in toks.items()}
    dl = {d: sum(c.values()) for d, c in tf.items()}
    n = len(dl); avgdl = sum(dl.values()) / n
    df = Counter(w for c in tf.values() for w in c)
    idf6 = {w: math.floor(math.log(1.0 + (n - df[w] + 0.5) / (df[w] + 0.5))
                          * 1e6 + 0.5) for w in df}
    def w6(d, w):
        t = float(tf[d][w])
        comp = t * (K1 + 1.0) / (t + K1 * ((1.0 - B) + B * (dl[d] / avgdl)))
        return math.floor(float(idf6[w]) * comp + 0.5)
    qterms = set("spark shuffle join spark".split())
    for c in tf:
        s6 = sum(w6(c, w) for w in qterms if w in tf[c])
        if s6 >= 100_000:   # tau = 0.1
            want[c] = math.floor(s6 / 1e6 * 1e4 + 0.5) / 1e4
    assert got == want


def test_bm25_gate_batch_equals_stream(spark, sf_dir):
    """r14: the aggregation-form batch probe (bm25_gate_batch — what the
    batch ingest funnel now runs) must emit row-identical
    (new_id, c_id, score) to the stateless stream-probe form, over the
    real fixture corpus and at a tau low enough to keep plenty of rows
    on both sides of the threshold."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    index = RET.bm25_gate_index(docs.filter("doc_id % 10 != 7"),
                                r_floor=128, keep_denom=None) \
               .localCheckpoint(eager=True)
    new = docs.filter("doc_id % 10 = 7")
    for tau in (0.1, 3.0):
        got = sorted(map(tuple,
                         RET.bm25_gate_batch(new, index, tau).collect()))
        want = sorted(map(tuple, RET.bm25_gate(new, index, tau).collect()))
        assert got == want and got


def test_bm25_gate_postings_equals_index_shape(spark, sf_dir):
    """r15: bm25_gate_batch accepts either index shape — the narrow
    (word, c_id, w6) postings (what the batch ingest funnel feeds it,
    no map assembly / no index self-join) or the stream-form c_map
    index — and must score row-identically through both."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter("doc_id % 10 != 7")
    new = docs.filter("doc_id % 10 = 7")
    narrow = RET.bm25_gate_postings(corpus, r_floor=128, keep_denom=None)
    mapped = RET.bm25_gate_index(corpus, r_floor=128, keep_denom=None)
    for tau in (0.1, 3.0):
        got = sorted(map(tuple,
                         RET.bm25_gate_batch(new, narrow, tau).collect()))
        want = sorted(map(tuple,
                          RET.bm25_gate_batch(new, mapped, tau).collect()))
        assert got == want and got


def test_bm25_gate_runs_on_stream_equals_batch(spark, sf_dir, tmp_path):
    from kafka_streams_examples_spark.streaming.core import run_to_memory
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    index = RET.bm25_gate_index(docs).localCheckpoint(eager=True)
    new = docs.filter("doc_id < 5") \
              .select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    new.coalesce(1).write.parquet(str(tmp_path / "new"))
    stream = (spark.readStream.schema("doc_id long, text string")
              .parquet(str(tmp_path / "new")))
    name, q = run_to_memory(RET.bm25_gate(stream, index, tau=3.0),
                            mode="append")
    got = {tuple(r) for r in spark.table(name).collect()}
    q.stop()
    want = {tuple(r) for r in
            RET.bm25_gate(spark.read.parquet(str(tmp_path / "new")),
                          index, tau=3.0).collect()}
    assert got == want and got


from hypothesis import given, settings, strategies as st

_vocab_word = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])
_doc = st.lists(_vocab_word, min_size=1, max_size=10)


@settings(max_examples=6, deadline=None)
@given(st.lists(_doc, min_size=2, max_size=6))
def test_bm25_property_random_corpora(spark, corpora):
    """Random tiny corpora over a 6-word vocabulary (dense term overlap
    — maximal posting-list collisions and tf variation, the integer-
    quantization contract's hard cases) must match the plain-Python
    BM25 replica exactly: idf micro-nat floors, per-posting impact
    floors, integer score sums, and (s6 desc, c_id) rank ties."""
    rows = [(i, " ".join(ws)) for i, ws in enumerate(corpora)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    nq = min(2, len(rows))
    got = {q: [] for q in range(nq)}
    for r in RET.bm25_topk(docs, k=4, n_queries=nq).collect():
        got[r.q_id].append((r.c_id, r.score, r.rnk))
    for q in got:
        got[q].sort(key=lambda x: x[2])
    assert got == _bm25_python(rows, n_queries=nq, k=4)


def test_corpus_report_metrics(spark):
    from kafka_streams_examples_spark.operators.text import corpus_report
    docs = spark.createDataFrame(
        [(0, "aa bb cc dd", "en", "s1"),
         (1, "aa bb cc dd", "en", "s1"),      # exact duplicate of 0
         (2, "ee ff gg", "de", "s2")],
        ["doc_id", "text", "lang", "source"])
    got = {r.metric: r.value for r in corpus_report(docs).collect()}
    assert got["n_docs"] == 3.0
    assert got["total_tokens"] == 11.0
    assert got["distinct_words"] == 7.0
    assert got["n_sources"] == 2.0
    assert got["exact_dup_rate"] == round(1 - 2 / 3, 6)
    assert abs(got["frac_lang_en"] - 2 / 3) < 1e-5
    assert abs(got["frac_lang_de"] - 1 / 3) < 1e-5
    assert got["wordgate_pass_rate"] == 0.0       # all docs under 50 words
    # docs 0 and 1 share their single 12-word-wrapped line -> 2 of the
    # corpus's 3 derived lines are boilerplate
    assert abs(got["boiler_line_rate"] - 2 / 3) < 1e-5


def test_kn_surprisal_matches_python_replica(spark):
    import math
    from collections import Counter
    from kafka_streams_examples_spark.operators.text import kn_surprisal

    rows = [(0, "aa bb aa bb cc"), (1, "aa bb aa"), (2, "cc dd cc dd"),
            (3, "one"), (4, "")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: (r.n_bigrams, r.surprisal)
           for r in kn_surprisal(docs).collect()}

    bgs = {}
    c12 = Counter()
    for d, t in rows:
        ws = t.split()
        bgs[d] = list(zip(ws, ws[1:]))
        c12.update(bgs[d])
    c1, n1f, n1b = Counter(), Counter(), Counter()
    for (w1, w2), c in c12.items():
        c1[w1] += c
        n1f[w1] += 1
        n1b[w2] += 1
    t = len(c12)
    for d, _ in rows:
        if not bgs[d]:
            assert got[d] == (0, 0.0)
            continue
        s6 = 0
        for (w1, w2) in bgs[d]:
            p = (max(c12[(w1, w2)] - 0.75, 0.0) / c1[w1]
                 + (0.75 * n1f[w1] / c1[w1]) * (n1b[w2] / t))
            s6 += math.floor(-math.log(p) * 1e6 + 0.5)
        exp = math.floor(s6 / (len(bgs[d]) * 1e6) * 1e4 + 0.5) / 1e4
        assert got[d] == (len(bgs[d]), exp), d


def test_kn_continuation_ranks_burst_above_diverse(spark):
    """The KN property MLE interpolation lacks: 'york' occurs MANY
    times but only ever after 'new' (one history), while 'house' has
    the same total count spread over many histories. In a NOVEL
    context ('the york' vs 'the house'), KN's continuation probability
    N1+(., w2) makes york the surprise, even though raw unigram
    counts are equal."""
    from kafka_streams_examples_spark.operators.text import kn_surprisal
    burst = " ".join(["new york"] * 6)                  # york: 1 history
    diverse = "a house b house c house d house e house f house"
    docs = spark.createDataFrame(
        [(0, burst), (1, diverse),
         (2, "the york the house the york the house")],  # novel contexts
        ["doc_id", "text"])
    # per-position check via two probe docs built from the same corpus
    probes = spark.createDataFrame(
        [(10, "the york"), (11, "the house")], ["doc_id", "text"])
    scored = {r.doc_id: r.surprisal
              for r in kn_surprisal(docs.union(probes)).collect()}
    assert scored[10] > scored[11]


def test_apply_nb_table_equals_broadcast_byte_for_byte(spark):
    """Crossover contract of the NB scoring strategies: the TABLE-form
    model (nb_weights_table) scored through apply_nb_table's
    feature-keyed join must reproduce apply_nb over the folded codec
    exactly — including <2-token documents (prior-only) and documents
    whose bigrams are all out-of-model."""
    from kafka_streams_examples_spark.operators import text as T
    docs = spark.createDataFrame(
        [(i, t, "src0" if i % 2 else "other")
         for i, t in enumerate(
             ["aa bb aa bb", "bb cc", "one", "", "dd ee dd",
              "aa bb cc dd", "zz yy xx ww", "bb aa bb aa"])],
        "doc_id long, text string, source string")
    w, p = T.nb_weights_table(docs, target_sources=("src0",))
    b = sorted(map(tuple, T.apply_nb(docs, T.fold_nb_codec(w, p)).collect()))
    j = sorted(map(tuple, T.apply_nb_table(docs, w, p).collect()))
    assert b == j
    # the dispatcher: forced-tiny limit -> join path; huge limit ->
    # broadcast path; both agree with the direct forms
    a1 = sorted(map(tuple, T.score_nb(
        docs, w, p, strategy="auto", feature_limit=1).collect()))
    a2 = sorted(map(tuple, T.score_nb(
        docs, w, p, strategy="auto", feature_limit=10**9).collect()))
    assert a1 == b and a2 == b


def test_kn3_surprisal_matches_python_replica(spark):
    import math
    from collections import Counter
    from kafka_streams_examples_spark.operators.text import kn3_surprisal

    rows = [(0, "aa bb cc aa bb cc dd"), (1, "aa bb cc"), (2, "xx yy"),
            (3, "one"), (4, ""), (5, "cc dd ee cc dd ee")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: (r.n_trigrams, r.surprisal)
           for r in kn3_surprisal(docs).collect()}

    tgs, c123 = {}, Counter()
    for d, t in rows:
        ws = t.split()
        tgs[d] = list(zip(ws, ws[1:], ws[2:]))
        c123.update(tgs[d])
    c12, n12f, cont23 = Counter(), Counter(), Counter()
    for (w1, w2, w3), c in c123.items():
        c12[(w1, w2)] += c
        n12f[(w1, w2)] += 1
        cont23[(w2, w3)] += 1          # distinct-w1 types per (w2,w3)
    c2dot, n2f, n3b = Counter(), Counter(), Counter()
    for (w2, w3), c in cont23.items():
        c2dot[w2] += c
        n2f[w2] += 1
        n3b[w3] += 1
    t = len(cont23)
    d_ = 0.75
    for d, _ in rows:
        if not tgs[d]:
            assert got[d] == (0, 0.0)
            continue
        s6 = 0
        for (w1, w2, w3) in tgs[d]:
            p2 = (max(cont23[(w2, w3)] - d_, 0.0) / c2dot[w2]
                  + (d_ * n2f[w2] / c2dot[w2]) * (n3b[w3] / t))
            p = (max(c123[(w1, w2, w3)] - d_, 0.0) / c12[(w1, w2)]
                 + (d_ * n12f[(w1, w2)] / c12[(w1, w2)]) * p2)
            s6 += math.floor(-math.log(p) * 1e6 + 0.5)
        exp = math.floor(s6 / (len(tgs[d]) * 1e6) * 1e4 + 0.5) / 1e4
        assert got[d] == (len(tgs[d]), exp), d


def test_kn3_continuation_ranks_burst_above_diverse(spark):
    """The order-3 version of the KN property: the trigram-tail bigram
    'big apple' occurs MANY times but only ever after 'the' (one
    history), while 'nice house' has the same total count spread over
    many histories. In a NOVEL context, the recursive continuation
    backoff makes the bursty tail the surprise even though raw counts
    are equal."""
    from kafka_streams_examples_spark.operators.text import kn3_surprisal
    burst = " ".join(["the big apple"] * 6)      # (big,apple): 1 history
    diverse = " ".join(f"{h} nice house" for h in "abcdef")
    docs = spark.createDataFrame(
        [(0, burst), (1, diverse),
         (2, "zz big apple zz nice house zz big apple zz nice house")],
        ["doc_id", "text"])
    probes = spark.createDataFrame(
        [(10, "zz big apple"), (11, "zz nice house")], ["doc_id", "text"])
    scored = {r.doc_id: r.surprisal
              for r in kn3_surprisal(docs.union(probes)).collect()}
    assert scored[10] > scored[11]


def _kn_replica(rows, order, d_=0.75):
    """Order-n interpolated-KN python replica (the kn_surprisal /
    kn3_surprisal replicas generalized): raw counts at the top order,
    Chen-Goodman continuation TYPE counts derived level by level."""
    import math
    from collections import Counter
    n = order
    grams = {}
    lvl = {n: Counter()}
    for d, t in rows:
        ws = t.split()
        grams[d] = list(zip(*[ws[i:] for i in range(n)]))
        lvl[n].update(grams[d])
    for m in range(n - 1, 1, -1):
        lvl[m] = Counter(k[1:] for k in lvl[m + 1])
    cdot, nf = {}, {}
    for m in range(n, 1, -1):
        cdot[m], nf[m] = Counter(), Counter()
        for k, c in lvl[m].items():
            cdot[m][k[:-1]] += c
            nf[m][k[:-1]] += 1
    n1b = Counter(k[-1] for k in lvl[2])
    t = len(lvl[2])
    out = {}
    for d, _ in rows:
        if not grams[d]:
            out[d] = (0, 0.0)
            continue
        s6 = 0
        for g in grams[d]:
            p = n1b[g[-1]] / t
            for m in range(2, n + 1):
                key = g[n - m:]
                p = (max(lvl[m][key] - d_, 0.0) / cdot[m][key[:-1]]
                     + (d_ * nf[m][key[:-1]] / cdot[m][key[:-1]]) * p)
            s6 += math.floor(-math.log(p) * 1e6 + 0.5)
        out[d] = (len(grams[d]),
                  math.floor(s6 / (len(grams[d]) * 1e6) * 1e4 + 0.5) / 1e4)
    return out


def test_kn_ngram_orders_4_and_5_match_python_replica(spark):
    """The parameterized derivation at orders the hand-written code
    never had: order 4 (two continuation levels) and order 5 (the
    registry query / CCNet's production order). Also pins the replica
    against the existing code at orders 2/3 so one generalized replica
    covers the family."""
    from kafka_streams_examples_spark.operators.text import (
        kn3_surprisal, kn_ngram_surprisal, kn_surprisal,
    )
    rows = [(0, "aa bb cc dd aa bb cc dd ee"), (1, "aa bb cc dd"),
            (2, "xx yy zz ww xx yy zz"), (3, "one two three"),
            (4, ""), (5, "cc dd ee ff cc dd ee ff gg hh")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    for order in (4, 5):
        col = f"n_{order}grams"
        got = {r.doc_id: (r[col], r.surprisal)
               for r in kn_ngram_surprisal(docs, order).collect()}
        assert got == _kn_replica(rows, order), order
    # delegation sanity: orders 2/3 through the generalized step equal
    # the wrappers (same Column tree, but pin it)
    a2 = sorted(map(tuple, kn_surprisal(docs).collect()))
    g2 = sorted(map(tuple, kn_ngram_surprisal(docs, 2).collect()))
    assert a2 == g2
    a3 = sorted(map(tuple, kn3_surprisal(docs).collect()))
    g3 = sorted(map(tuple, kn_ngram_surprisal(docs, 3).collect()))
    assert a3 == g3


def _kn_pruned_replica(rows, order, prune, d_=0.75):
    """Pruned-ladder replica (VERDICT r13 item 6): the TOP raw-count
    table drops count<=prune rows, lower levels derive from the pruned
    table above (no threshold on continuation counts), contexts
    recompute from the pruned tables (exact renormalization), missing
    context passes p through, base-pruned words take the
    1/greatest(T,1) <unk> floor."""
    import math
    from collections import Counter
    n = order
    grams, raw = {}, Counter()
    for d, t in rows:
        ws = t.split()
        grams[d] = list(zip(*[ws[i:] for i in range(n)]))
        raw.update(grams[d])
    lvl = {n: Counter({k: c for k, c in raw.items() if c > prune})}
    for m in range(n - 1, 1, -1):
        lvl[m] = Counter(k[1:] for k in lvl[m + 1])
    cdot, nf = {}, {}
    for m in range(n, 1, -1):
        cdot[m], nf[m] = Counter(), Counter()
        for k, c in lvl[m].items():
            cdot[m][k[:-1]] += c
            nf[m][k[:-1]] += 1
    n1b = Counter(k[-1] for k in lvl[2])
    t = len(lvl[2])
    out = {}
    for d, _ in rows:
        if not grams[d]:
            out[d] = (0, 0.0)
            continue
        s6 = 0
        for g in grams[d]:
            p = (n1b[g[-1]] if g[-1] in n1b else 1) / max(t, 1)
            for m in range(2, n + 1):
                key = g[n - m:]
                if key[:-1] not in cdot[m]:
                    continue                      # unseen context: pass
                c = lvl[m].get(key, 0)
                p = (max(c - d_, 0.0) / cdot[m][key[:-1]]
                     + (d_ * nf[m][key[:-1]] / cdot[m][key[:-1]]) * p)
            s6 += math.floor(-math.log(p) * 1e6 + 0.5)
        out[d] = (len(grams[d]),
                  math.floor(s6 / (len(grams[d]) * 1e6) * 1e4 + 0.5) / 1e4)
    return out


def test_kn_pruned_matches_python_replica(spark):
    """kn_ngram_surprisal(prune=t) against the pruned replica at
    orders 3/4/5 and thresholds 1/2 — the fixture is built so pruning
    BITES (repeated runs survive, hapax runs fall to backoff) and so
    some words vanish from the base (the <unk> floor path runs)."""
    from kafka_streams_examples_spark.operators.text import (
        kn_ngram_surprisal,
    )
    import pytest as _pytest
    rows = [(0, "aa bb cc dd aa bb cc dd ee aa bb cc dd"),
            (1, "aa bb cc dd qq"),
            (2, "xx yy zz ww xx yy zz ww vv"),
            (3, "one two three four"),
            (4, ""), (5, "cc dd ee ff cc dd ee ff gg hh")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    for order in (3, 4, 5):
        for prune in (1, 2):
            col = f"n_{order}grams" if order > 3 else "n_trigrams"
            got = {r.doc_id: (r[col], r.surprisal)
                   for r in kn_ngram_surprisal(
                       docs, order, prune=prune).collect()}
            want = _kn_pruned_replica(rows, order, prune)
            assert got == want, (order, prune)
    with _pytest.raises(ValueError, match="order >= 3"):
        kn_ngram_surprisal(docs, 2, prune=1)


def test_kn_pruned_sql_matches_replica_and_guards():
    """The generated pruned oracle (registry._kn_sql(order, prune))
    evaluates to the same replica outputs on DuckDB alone — the same
    tiny corpus, so both engines and the replica agree three ways."""
    import duckdb
    import pytest as _pytest

    from kafka_streams_examples_spark.registry import _kn_sql
    rows = [(0, "aa bb cc dd aa bb cc dd ee aa bb cc dd"),
            (1, "aa bb cc dd qq"),
            (2, "xx yy zz ww xx yy zz ww vv"),
            (3, "one two three four"),
            (4, ""), (5, "cc dd ee ff cc dd ee ff gg hh")]
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM (VALUES "
                + ", ".join(f"({i}, '{t}')" for i, t in rows)
                + ") AS t(doc_id, text)")
    for order in (3, 5):
        for prune in (1, 2):
            alias = "n_trigrams" if order == 3 else f"n_{order}grams"
            got = {r[0]: (r[1], r[2]) for r in con.execute(
                _kn_sql(order, prune=prune)
                + " ORDER BY doc_id").fetchall()}
            assert got == _kn_pruned_replica(rows, order, prune), \
                (order, prune, alias)
    with _pytest.raises(ValueError, match="order >= 3"):
        _kn_sql(2, prune=1)


def test_kn_sql_generator_matches_handwritten_oracles():
    """registry._kn_sql(order) is the oracle for ANY order; at orders
    2/3 it must agree with the hand-written kn_surprisal /
    kn3_surprisal oracles row-for-row (DuckDB vs DuckDB, no Spark)."""
    import duckdb

    from kafka_streams_examples_spark.registry import QUERIES, _kn_sql
    con = duckdb.connect()
    con.execute("""CREATE VIEW documents AS SELECT * FROM (VALUES
        (0, 'aa bb cc aa bb cc dd ee aa bb'),
        (1, 'aa bb cc dd ee ff'),
        (2, 'xx yy'), (3, 'one'), (4, ''),
        (5, 'cc dd ee cc dd ee ff gg'))
        AS t(doc_id, text)""")
    for name, order in [("kn_surprisal", 2), ("kn3_surprisal", 3)]:
        a = con.execute(QUERIES[name].oracle + " ORDER BY doc_id").fetchall()
        b = con.execute(_kn_sql(order) + " ORDER BY doc_id").fetchall()
        assert a == b, name


def test_nb_hashed_collision_tolerance_matches_python_replica(spark):
    """The bounded-feature NB (nb_bucket hashing trick): with a TINY
    bucket count (4 — guaranteed collisions on any real vocabulary)
    the Spark model must still EXACTLY match a python replica of the
    bucketed math — collisions merge class counts identically in both,
    which is the whole correctness claim of the hashing trick. Also
    pins the artifact-size bound (weights rows <= n_buckets at any
    corpus) and the broadcast/join crossover under hashing."""
    import hashlib
    import math
    from collections import Counter

    from kafka_streams_examples_spark.operators import text as T

    nb = 4
    rows = [(i, t, "src0" if i % 2 else "other")
            for i, t in enumerate(
                ["aa bb aa bb cc", "bb cc dd", "one", "", "dd ee dd aa",
                 "aa bb cc dd ee ff", "zz yy xx ww", "bb aa bb aa cc"])]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string")
    got = {r.doc_id: (r.is_train, r.is_target, r.score, r.pred_target)
           for r in T.nb_quality(docs, target_sources=("src0",),
                                 n_buckets=nb).collect()}

    def bucket(bigram: str) -> int:
        return int(hashlib.md5(bigram.encode()).hexdigest()[:15], 16) % nb

    feats = {d: [bucket(f"{a} {b}")
                 for a, b in zip(t.split(), t.split()[1:])]
             for d, t, _ in rows}
    is_train = {d: d % 5 != 0 for d, _, _ in rows}
    is_tgt = {d: srel == "src0" for d, _, srel in rows}
    c1, c0 = Counter(), Counter()
    for d, _, _ in rows:
        if is_train[d]:
            (c1 if is_tgt[d] else c0).update(feats[d])
    vocab = set(c1) | set(c0)
    v, tot1, tot0 = len(vocab), sum(c1.values()), sum(c0.values())
    n1 = sum(1 for d in is_train if is_train[d] and is_tgt[d])
    n0 = sum(1 for d in is_train if is_train[d] and not is_tgt[d])
    both = n1 > 0 and n0 > 0
    w6 = {f: (math.floor(math.log(((c1[f] + 1) * (tot0 + v))
                                  / ((c0[f] + 1) * (tot1 + v)))
                         * 1e6 + 0.5) if both else 0)
          for f in vocab}
    p6 = (math.floor(math.log(n1 / n0) * 1e6 + 0.5) if both else 0)
    for d, _, _ in rows:
        s6 = p6 + sum(w6.get(f, 0) for f in feats[d])
        exp = (is_train[d], is_tgt[d],
               math.floor(s6 / 1e6 * 1e4 + 0.5) / 1e4, s6 > 0)
        assert got[d] == exp, d

    # artifact-size bound: the weight table can never exceed n_buckets
    w, p = T.nb_weights_table(docs, target_sources=("src0",), n_buckets=nb)
    assert w.count() <= nb
    # crossover under hashing: folded-codec scan == table-form join
    b = sorted(map(tuple, T.apply_nb(
        docs, T.fold_nb_codec(w, p), n_buckets=nb).collect()))
    j = sorted(map(tuple, T.apply_nb_table(
        docs, w, p, n_buckets=nb).collect()))
    assert b == j


def test_ingest_persisted_equals_inline(spark, tmp_path):
    """build_ingest_artifacts + ingest_gate_flags_from/_funnel_from
    (the train-once serve-many production form) must equal the inline
    train-per-invocation forms row-for-row over the same corpus
    snapshot — the test_bm25_index_persisted_equals_inline pattern."""
    from kafka_streams_examples_spark.operators import text as T
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    existing = docs.filter("doc_id % 10 != 7")
    arriving = docs.filter("doc_id % 10 = 7")
    T.build_ingest_artifacts(existing, str(tmp_path / "ing"))
    got = sorted(map(tuple, T.ingest_gate_flags_from(
        spark, str(tmp_path / "ing"), arriving, tau=5.5).collect()))
    want = sorted(map(tuple, T.ingest_gate_flags(
        arriving, existing, tau=5.5).collect()))
    assert got == want
    f_got = T.ingest_funnel_from(spark, str(tmp_path / "ing"),
                                 arriving, tau=5.5).collect()
    f_want = T.ingest_funnel(arriving, existing, tau=5.5).collect()
    assert f_got == f_want
    # hashed-model form: build AND serve with the same n_buckets (the
    # bounded persisted codec); inline twin composed from the same
    # hashed model through the shared composition
    from kafka_streams_examples_spark.operators.retrieval import (
        bm25_gate_index,
    )
    T.build_ingest_artifacts(existing, str(tmp_path / "ing_h"),
                             n_buckets=256)
    h_got = sorted(map(tuple, T.ingest_gate_flags_from(
        spark, str(tmp_path / "ing_h"), arriving, tau=5.5,
        n_buckets=256).collect()))
    h_want_df = T._gate_flags_with(
        arriving, T.boiler_codec(existing),
        T.nb_model(existing, n_buckets=256),
        bm25_gate_index(existing, r_floor=128, keep_denom=None),
        tau=5.5, n_buckets=256)
    h_want = sorted(map(tuple, h_want_df.collect()))
    assert h_got == h_want
    # the build-time n_buckets travels IN the artifact dir ({path}/meta,
    # ADVICE r13): serving with no explicit n_buckets auto-applies it...
    h_auto = sorted(map(tuple, T.ingest_gate_flags_from(
        spark, str(tmp_path / "ing_h"), arriving, tau=5.5).collect()))
    assert h_auto == h_want
    # ...the funnel form (which exposes no n_buckets knob) therefore
    # cannot score raw bigrams against the bucket-keyed weights
    hf_got = T.ingest_funnel_from(spark, str(tmp_path / "ing_h"),
                                  arriving, tau=5.5).collect()
    hf_want = T._funnel_agg(h_want_df).collect()
    assert hf_got == hf_want
    # ...and a conflicting explicit value is rejected loudly instead of
    # silently collapsing every NB score to the prior
    import pytest as _pytest
    with _pytest.raises(ValueError, match="n_buckets=256"):
        T.ingest_gate_flags_from(spark, str(tmp_path / "ing_h"),
                                 arriving, tau=5.5, n_buckets=64)
    with _pytest.raises(ValueError, match="n_buckets=None"):
        T.ingest_gate_flags_from(spark, str(tmp_path / "ing"),
                                 arriving, tau=5.5, n_buckets=64)


def test_ingest_persisted_serving_reads_zero_training_bytes(spark, tmp_path):
    """Per-batch serving from a build_ingest_artifacts directory must
    read ONLY artifact bytes plus the arriving batch: zero corpus text,
    zero training jobs (the query_bm25_index inputFiles contract)."""
    from kafka_streams_examples_spark.operators import text as T
    existing = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").filter("doc_id % 10 != 7")
    T.build_ingest_artifacts(existing, str(tmp_path / "ing"))
    arriving = spark.createDataFrame(
        [(9001, "the spark join window aggregate " * 8),
         (9002, "zz yy")], ["doc_id", "text"])
    res = T.ingest_gate_flags_from(spark, str(tmp_path / "ing"), arriving)
    files = res.inputFiles()
    assert files, "plan should read the persisted artifacts"
    assert all("/ing/" in f for f in files)   # never documents.parquet
    assert res.count() == 2
    # the on-disk gate index keeps the bm25 word-bucket layout
    import os
    parts = [d for d in os.listdir(str(tmp_path / "ing" / "gate_index"))
             if d.startswith("wb=")]
    assert parts, "gate index must be partitioned by the word-hash bucket"
