"""BPE trainer + mixture-weight operators vs plain-Python references.

The python reference below implements the SAME contract as
operators/bpe.py (space-joined segmentation, two-pass non-overlapping
literal replace, count-desc/lex-asc tie-break) so the test checks the
Spark plan computes the contract, not that the contract equals some
third definition.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from kafka_streams_examples_spark.operators import bpe as BPE
from kafka_streams_examples_spark.operators.sampling import source_mixture


def _py_bpe(words: Counter, merges: int):
    """Reference trainer on a word->count table."""
    vocab = {w: " ".join(w) for w in words}
    out = []
    for _ in range(merges):
        pc = Counter()
        for w, seq in vocab.items():
            syms = seq.split(" ")
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += words[w]
        if not pc:
            break
        top = max(pc.values())
        l, r = min(p for p, c in pc.items() if c == top)
        out.append((l, r, top))
        pat, rep = f" {l} {r} ", f" {l}{r} "
        vocab = {w: (" " + s + " ").replace(pat, rep).replace(pat, rep).strip()
                 for w, s in vocab.items()}
    return out, vocab


CORPUS = [
    "low low low low low lower lower newest newest newest",
    "newest newest newest widest widest widest new new banana",
    "aaaaa abab abab bb bb bb",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t, f"src{i % 2}") for i, t in enumerate(CORPUS)],
        ["doc_id", "text", "source"])


def test_bpe_train_matches_python_reference(docs):
    words = Counter(w for t in CORPUS for w in t.split())
    expected, _ = _py_bpe(words, 5)
    got = [(r.lhs, r.rhs, r.cnt) for r in
           BPE.bpe_train(docs, merges=5).orderBy("merge_rank").collect()]
    assert got == expected


def test_bpe_vocab_matches_python_reference(docs):
    words = Counter(w for t in CORPUS for w in t.split())
    _, exp_vocab = _py_bpe(words, 5)
    got = {r.word: r.seq for r in BPE.bpe_vocab(docs, merges=5).collect()}
    assert got == exp_vocab
    # counts survive untouched
    cnts = {r.word: r.cnt for r in BPE.bpe_vocab(docs, merges=5).collect()}
    assert cnts == dict(words)


def test_two_pass_replace_contract_on_identical_runs(docs):
    # 'aaaaa' after merging (a,a) must group as (aa) a (aa) — the documented
    # two-pass contract, not canonical greedy's (aa)(aa) a
    spark = docs.sparkSession
    one = spark.createDataFrame([(0, "aaaaa", "s")],
                                ["doc_id", "text", "source"])
    v = {r.word: r.seq for r in BPE.bpe_vocab(one, merges=1).collect()}
    assert v == {"aaaaa": "aa a aa"}


def test_fertility_consistency(docs):
    fert = {r.source: r for r in BPE.bpe_fertility(docs, merges=5).collect()}
    all_words = Counter(w for t in CORPUS for w in t.split())
    _, vocab = _py_bpe(all_words, 5)
    for src in ("src0", "src1"):
        texts = [t for i, t in enumerate(CORPUS) if f"src{i % 2}" == src]
        ws = [w for t in texts for w in t.split()]
        syms = sum(len(vocab[w].split(" ")) for w in ws)
        assert fert[src].n_words == len(ws)
        assert fert[src].n_symbols == syms
        # fertility passes through stable_round(4)
        assert abs(fert[src].fertility - syms / len(ws)) < 5.1e-5


def _py_encode(texts, merges):
    """Reference encoder: per doc, each word's trained segmentation
    mapped through dense lexicographic symbol ids."""
    words = Counter(w for t in texts for w in t.lower().split())
    _, vocab = _py_bpe(words, merges)
    syms = sorted({s for seq in vocab.values() for s in seq.split(" ")})
    ids = {s: i + 1 for i, s in enumerate(syms)}
    out = []
    for t in texts:
        ws = t.lower().split()
        tok = [ids[s] for w in ws for s in vocab[w].split(" ")]
        out.append((len(ws), len(tok), ",".join(map(str, tok))))
    return out


def test_bpe_encode_matches_python_reference(docs):
    exp = _py_encode(CORPUS, 5)
    got = {r.doc_id: (r.n_words, r.n_tokens, r.token_ids)
           for r in BPE.bpe_encode(docs, merges=5).collect()}
    assert got == {i: e for i, e in enumerate(exp)}


def test_bpe_encode_fertility_equivalence(docs):
    """The verdict-#4 consistency gate: fertility computed FROM the
    encoder's per-doc token counts must equal bpe_fertility's trained
    numbers exactly — encode and the fertility diagnostic are the same
    segmentation viewed from two plans."""
    enc = BPE.bpe_encode(docs, merges=5)
    per_src = (docs.select("doc_id", "source").join(enc, "doc_id")
                   .groupBy("source")
                   .agg(F.sum("n_words").alias("w"),
                        F.sum("n_tokens").alias("s"))
                   .collect())
    fert = {r.source: r for r in BPE.bpe_fertility(docs, merges=5).collect()}
    assert {r.source for r in per_src} == set(fert)
    for r in per_src:
        assert (r.w, r.s) == (fert[r.source].n_words,
                              fert[r.source].n_symbols)


def test_bpe_encode_degenerate_docs(spark):
    rows = {r.doc_id: r for r in BPE.bpe_encode(
        spark.createDataFrame(
            [(0, "", "s"), (1, None, "s"), (2, "  ", "s"), (3, "ab ab", "s")],
            ["doc_id", "text", "source"]),
        merges=1).collect()}
    assert len(rows) == 4
    for i in (0, 1, 2):
        assert (rows[i].n_words, rows[i].n_tokens, rows[i].token_ids) \
            == (0, 0, "")
    # one merge on 'ab ab' -> single symbol 'ab' (id 1), twice
    assert (rows[3].n_words, rows[3].n_tokens, rows[3].token_ids) \
        == (2, 2, "1,1")


def test_apply_bpe_oov_inference(docs):
    """True-inference OOV contract: a codec trained on one corpus applied
    to another segments unseen WORDS correctly via the merge fold (no
    vocabulary lookup to miss), and symbols containing never-seen CHARS
    encode as the reserved UNK id 0 instead of being silently dropped."""
    spark = docs.sparkSession
    codec = BPE.bpe_codec(docs, merges=5)
    # 'lowest': unseen word, but chars + ('lo','w'->'low','es','est') style
    # merges re-derive a valid segmentation with every symbol in-map;
    # 'zzz': 'z' never seen in training -> all-UNK, count preserved
    other = spark.createDataFrame([(0, "lowest zzz", "s")],
                                  ["doc_id", "text", "source"])
    r = BPE.apply_bpe(other, codec).collect()[0]
    assert r.n_words == 2
    toks = r.token_ids.split(",")
    assert len(toks) == r.n_tokens > 2
    # the zzz word contributes exactly 3 UNK ids, the OOV word none
    assert toks.count("0") == 3
    assert all(t.isdigit() for t in toks)


def test_pack_counts_bpe_composition(docs):
    """pack_sequences_bpe's core property: packing the encoder's counts
    tiles the global token stream exactly — every BPE token position
    covered once, per-doc spans contiguous from 0 to n_tokens."""
    from kafka_streams_examples_spark.operators.text import pack_counts

    enc_rows = BPE.bpe_encode(docs, merges=5).collect()
    n_by_doc = {r.doc_id: r.n_tokens for r in enc_rows}
    total = sum(n_by_doc.values())
    enc = BPE.bpe_encode(docs, merges=5).select("doc_id", "n_tokens")
    rows = pack_counts(enc, budget=7).collect()
    covered = set()
    spans: dict = {}
    for r in rows:
        g = r.seq_id * 7 + r.seq_off
        covered.update(range(g, g + (r.tok_to - r.tok_from)))
        spans.setdefault(r.doc_id, []).append((r.tok_from, r.tok_to))
    assert covered == set(range(total))
    for d, sp in spans.items():
        sp.sort()
        assert sp[0][0] == 0 and sp[-1][1] == n_by_doc[d]
        assert all(b == c for (_, b), (c, _) in zip(sp, sp[1:]))


def test_source_mixture_weights(docs):
    rows = source_mixture(docs, alpha=0.5).collect()
    # weights normalize (quantization leaves ~1e-6 slack) and upweight
    # the smaller source relative to its token share
    tot = sum(r.weight for r in rows)
    assert abs(tot - 1.0) < 1e-4
    by_src = {r.source: r for r in rows}
    lo = min(by_src.values(), key=lambda r: r.n_tokens)
    hi = max(by_src.values(), key=lambda r: r.n_tokens)
    if lo.n_tokens != hi.n_tokens:
        assert lo.weight / hi.weight > lo.n_tokens / hi.n_tokens
    assert {r.n_docs for r in rows} == {2, 1}


def test_bpe_empty_corpus(spark):
    empty = spark.createDataFrame([], "doc_id long, text string, source string")
    assert BPE.bpe_train(empty, merges=3).count() == 0


from hypothesis import given, settings, strategies as st

_words = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=6),
    min_size=1, max_size=12)


@settings(max_examples=6, deadline=None)
@given(st.lists(_words, min_size=1, max_size=4))
def test_bpe_property_random_corpora(spark, corpora):
    """Random tiny corpora over a 3-letter alphabet (dense with repeated
    pairs and identical-symbol runs — the two-pass-replace contract's
    hard cases) must match the plain-Python reference exactly."""
    texts = [" ".join(ws) for ws in corpora]
    docs = spark.createDataFrame(
        [(i, t, "s") for i, t in enumerate(texts)],
        "doc_id long, text string, source string")
    words = Counter(w for t in texts for w in t.split())
    exp_merges, exp_vocab = _py_bpe(words, 3)
    got = [(r.lhs, r.rhs, r.cnt) for r in
           BPE.bpe_train(docs, merges=3).orderBy("merge_rank").collect()]
    assert got == exp_merges
    got_vocab = {r.word: r.seq for r in BPE.bpe_vocab(docs, merges=3).collect()}
    assert got_vocab == exp_vocab
    # the encoder's whole-document merge fold (WORD_SEP-separated, two-pass
    # replace per merge in training order) must reproduce each word's
    # TRAINED segmentation in place — the identical-symbol runs these
    # corpora are dense with are exactly where a separator or ordering bug
    # would surface
    syms = sorted({s for seq in exp_vocab.values() for s in seq.split(" ")})
    ids = {s: j + 1 for j, s in enumerate(syms)}
    enc = {r.doc_id: r for r in BPE.bpe_encode(docs, merges=3).collect()}
    for i, t in enumerate(texts):
        ws = t.split()
        want = [ids[s] for w in ws for s in exp_vocab[w].split(" ")]
        assert enc[i].n_words == len(ws)
        assert enc[i].token_ids == ",".join(map(str, want))


def test_bpe_zero_merges_returns_typed_empty(docs):
    df = BPE.bpe_train(docs, merges=0)
    assert df.count() == 0
    assert df.schema.simpleString() == (
        "struct<merge_rank:int,lhs:string,rhs:string,"
        "merged:string,cnt:bigint>")


def test_funnel_tolerates_degenerate_documents(spark):
    """Empty and whitespace-only docs must fail gates, not abort the
    aggregate with DIVIDE_BY_ZERO under ANSI mode."""
    from kafka_streams_examples_spark.registry import QUERIES
    import tempfile, os
    rows = [(0, ""), (1, "   "), (2, "x " * 30)]
    d = spark.createDataFrame(rows, ["doc_id", "text"]) \
             .withColumn("lang", F.lit("en")) \
             .withColumn("source", F.lit("s")) \
             .withColumn("n_chars", F.length("text").cast("long"))
    with tempfile.TemporaryDirectory() as td:
        d.coalesce(1).write.parquet(os.path.join(td, "documents.parquet"))
        out = QUERIES["pipeline_funnel"].spark(spark, td).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_total == 3 and r.n_len == 1


def test_dsir_scores_target_dialect_higher(spark):
    """Docs written in the target sources' dialect must outscore docs in
    the off-target dialect, and a python replica of the hashed-bigram
    importance model must agree on the exact values."""
    from collections import Counter as C
    import hashlib
    import math

    from kafka_streams_examples_spark.operators.text import dsir_score

    tgt_text = "alpha beta alpha beta alpha beta gamma alpha beta"
    raw_text = "delta eps delta eps delta eps zeta delta eps"
    rows = [(0, tgt_text, "src0"), (1, tgt_text, "src1"),
            (2, raw_text, "src9"), (3, raw_text, "src8"),
            (4, tgt_text, "src7"),   # target-dialect doc OUTSIDE the target set
            (5, "single",  "src9"),  # <2 tokens -> (0, 0.0)
            (6, "  " + tgt_text + " ", "src0")]  # padded: no phantom bigrams
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {r.doc_id: r for r in
           dsir_score(docs, target_sources=("src0", "src1"),
                      buckets=64).collect()}

    def h64(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def grams(t):
        ws = t.lower().split()
        return [f"{a} {b}" for a, b in zip(ws, ws[1:])]

    raw_c, tgt_c = C(), C()
    for d, t, s in rows:
        for g in grams(t):
            bk = h64(g) % 64
            raw_c[bk] += 1
            if s in ("src0", "src1"):
                tgt_c[bk] += 1
    nr, nt = sum(raw_c.values()), sum(tgt_c.values())
    for d, t, s in rows:
        gs = grams(t)
        if not gs:
            assert got[d].n_bigrams == 0 and got[d].dsir == 0.0
            continue
        s6 = 0
        for g in gs:
            bk = h64(g) % 64
            x = ((tgt_c[bk] + 1) * (nr + 64.0)) / ((raw_c[bk] + 1) * (nt + 64.0))
            s6 += math.floor(math.log(x) * 1e6 + 0.5)
        exp = math.floor(s6 / (len(gs) * 1e6) * 1e4 + 0.5) / 1e4
        assert got[d].n_bigrams == len(gs)
        assert got[d].dsir == exp
    # the discriminating property DSIR exists for:
    assert got[4].dsir > got[2].dsir   # target dialect beats raw dialect
    assert got[0].dsir > got[3].dsir


def test_dsir_resample_keeps_top_quantile(spark):
    # the composed pipeline (registry dsir_resample): selection must be
    # exactly "dsir >= exact interpolated p75", every survivor carries a
    # distinct deterministic order key, and the kept fraction is ~25%
    # (>= by ties at the threshold, bounded by the left tail)
    from kafka_streams_examples_spark.registry import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["dsir_resample"].spark(spark, sf).collect()
    from kafka_streams_examples_spark.catalog import table
    n_docs = table(spark, sf, "documents").count()
    assert n_docs * 0.20 <= len(rows) <= n_docs * 0.35
    assert len({r.ord for r in rows}) == len(rows)
    # recompute the threshold independently and check the cut is exact
    from kafka_streams_examples_spark.operators.text import dsir_score
    scores = [r.dsir for r in
              dsir_score(table(spark, sf, "documents"))
              .select("dsir").collect()]
    scores.sort()
    h = (len(scores) - 1) * 0.75
    lo, hi = int(h), min(int(h) + 1, len(scores) - 1)
    thr = scores[lo] + (h - lo) * (scores[hi] - scores[lo])
    kept = [r.dsir for r in rows]
    assert min(kept) >= thr - 1e-12
    assert sum(1 for s in scores if s >= thr) == len(rows)


def test_bpe_encode_vocab_table_equals_fold_apply(spark):
    """r14: bpe_encode now reads segmentations off the trainer's final
    vocabulary (vocab_word_table + encode_with_word_map/-table) instead
    of re-running the K-merge fold per document. All three strategies
    must stay byte-identical to the historical apply_bpe(bpe_codec)
    fold over the same corpus — empty/None/whitespace docs included."""
    from kafka_streams_examples_spark.operators import bpe as B
    docs = spark.createDataFrame(
        [(0, "low lower lowest"), (1, ""), (2, None), (3, "  "),
         (4, "low low newest"), (5, "widest wide wide")],
        "doc_id long, text string")
    want = sorted(map(tuple,
                      B.apply_bpe(docs, B.bpe_codec(docs, merges=4))
                       .collect()))
    for strategy in ("broadcast", "join", "auto"):
        got = sorted(map(tuple,
                         B.bpe_encode(docs, merges=4,
                                      strategy=strategy).collect()))
        assert got == want, strategy


def test_apply_bpe_join_equals_broadcast_byte_for_byte(spark):
    """Crossover contract of apply_bpe's strategies: the word-memoized
    TABLE (bpe_word_table) applied via encode_with_word_table must
    reproduce the scan-side broadcast encode exactly — empty documents,
    repeated words, and never-seen characters (UNK id 0) included."""
    from kafka_streams_examples_spark.operators import bpe as B
    docs = spark.createDataFrame(
        [(0, "low lower lowest"), (1, ""), (2, "  "),
         (3, "low low qqq"), (4, "newest widest")],
        "doc_id long, text string")
    codec = B.bpe_codec(docs, merges=4)
    b = sorted(map(tuple, B.apply_bpe(docs, codec).collect()))
    j = sorted(map(tuple,
                   B.apply_bpe(docs, codec, strategy="join").collect()))
    assert b == j
    a = sorted(map(tuple, B.apply_bpe(
        docs, codec, strategy="auto", word_limit=1).collect()))
    assert a == b
