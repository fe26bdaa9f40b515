"""Guards for the measurement-hygiene tooling (r14): the artifact
completeness checker (tools/check_artifacts.py — the chain's final gate,
since `set -e` is suppressed by the harness's `&&` wrapper and a
mid-chain tool death leaves CHAIN_DONE printing with exit 0) and the
gauge-aware bench comparator (tools/bench_compare.py — the mechanical
form of the r12→r14 cross-round forensics)."""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))


PROBE = {"start": {"size_mb": 256, "passes_mb_s": [100.0, 200.0],
                   "best_mb_s": 200.0},
         "end": {"size_mb": 256, "passes_mb_s": [150.0, 300.0],
                 "best_mb_s": 300.0}}


def _write_round(repo: Path, r: int, n_queries: int = 3) -> None:
    qs = {f"q{i}": {"sec_sf0.1": 1.0} for i in range(n_queries)}
    (repo / f"SCALE_r{r:02d}.json").write_text(json.dumps(
        {"queries": qs, "streaming": {"pipelines": {"wordcount": {}}},
         "disk_mb_s": PROBE}))
    (repo / f"SCALE10_r{r:02d}.json").write_text(json.dumps(
        {"queries": qs,
         "streaming_sf10": {"pipelines": {"wordcount": {}}},
         "disk_mb_s": PROBE}))
    (repo / f"INGESTWIRE_r{r:02d}.json").write_text(json.dumps(
        {"pipelines": {"gate_only": {}}, "batch_forms": {"x": 1},
         "disk_mb_s": PROBE}))
    (repo / f"BENCH_SELF_r{r:02d}.json").write_text(json.dumps(
        {"value": 10.0, "queries": {"q0": 1.0},
         "streaming": {"wordcount": {"rows_per_sec": 1.0}},
         "disk_mb_s": PROBE, "canary": {"last_sec": 0.2},
         "noise_gauge": {"median_ratio": 1.0}}))


@pytest.fixture()
def check_mod(tmp_path, monkeypatch):
    import check_artifacts
    monkeypatch.setattr(check_artifacts, "REPO", str(tmp_path))
    return check_artifacts, tmp_path


def test_complete_round_passes(check_mod):
    mod, repo = check_mod
    _write_round(repo, 14)
    assert mod.check_round(14) == []


def test_missing_section_is_named(check_mod):
    # the exact r14 failure mode: the sf10 streaming replay died mid-chain
    # and SCALE10 lacked its streaming_sf10 section while every other
    # artifact looked healthy
    mod, repo = check_mod
    _write_round(repo, 14)
    p = repo / "SCALE10_r14.json"
    doc = json.loads(p.read_text())
    del doc["streaming_sf10"]
    p.write_text(json.dumps(doc))
    errs = mod.check_round(14)
    assert any("streaming_sf10" in e and "SCALE10_r14" in e for e in errs)
    assert not any("BENCH_SELF" in e for e in errs)


def test_missing_file_and_bad_json_fail(check_mod):
    mod, repo = check_mod
    _write_round(repo, 14)
    (repo / "INGESTWIRE_r14.json").unlink()
    (repo / "SCALE_r14.json").write_text("{not json")
    errs = mod.check_round(14)
    assert any("INGESTWIRE_r14.json: MISSING" in e for e in errs)
    assert any("unparseable" in e for e in errs)


def test_shrunk_roster_vs_previous_round_fails(check_mod):
    mod, repo = check_mod
    _write_round(repo, 13, n_queries=5)
    _write_round(repo, 14, n_queries=3)
    errs = mod.check_round(14)
    assert any("3 query rows < previous round's 5" in e for e in errs)


def _bench(queries, streaming=None, **extra):
    doc = {"value": sum(queries.values()), "queries": queries,
           "disk_mb_s": PROBE, "canary": {"last_sec": 0.2},
           "noise_gauge": {"median_ratio": 1.0}}
    if streaming:
        doc["streaming"] = {k: {"rows_per_sec": v}
                            for k, v in streaming.items()}
    doc.update(extra)
    return doc


def test_compare_concentrated_outlier(capsys):
    # one query eats the whole delta (the r14 run2 shape): the comparator
    # must surface it as the top contributor AND an outlier
    from bench_compare import compare
    qa = {f"q{i}": 2.0 for i in range(10)}
    qb = dict(qa, q3=27.0)
    rep = compare(_bench(qa), _bench(qb))
    assert rep["batch_delta_sec"] == pytest.approx(25.0)
    assert rep["top_contributors"][0]["query"] == "q3"
    assert rep["outliers"][0] == {"query": "q3", "ratio": 13.5}
    # everything else held flat -> median ~1
    assert rep["ratio_median"] == pytest.approx(1.0)


def test_compare_uniform_drift_and_jitter_floor():
    from bench_compare import compare
    qa = {f"q{i}": 2.0 for i in range(8)}
    qa["tiny"] = 0.05                      # sub-floor row
    qb = {k: v * 1.3 for k, v in qa.items()}
    rep = compare(_bench(qa), _bench(qb))
    assert rep["ratio_median"] == pytest.approx(1.3)
    # jitter floor: 0.05s -> 0.065s is excluded from the distribution
    # (its ratio would be identical here, but its key must not appear
    # in outliers even if it swung wildly)
    qb2 = dict(qb, tiny=0.2)               # 4x swing, still tiny
    rep2 = compare(_bench(qa), _bench(qb2))
    assert all(d["query"] != "tiny" for d in rep2["outliers"])


def test_compare_roster_diff_and_streaming():
    from bench_compare import compare
    rep = compare(
        _bench({"a": 1.0, "b": 2.0}, streaming={"wordcount": 100.0}),
        _bench({"b": 2.0, "c": 3.0}, streaming={"wordcount": 90.0}))
    assert rep["only_in_a"] == ["a"] and rep["only_in_b"] == ["c"]
    assert rep["shared_queries"] == 1
    assert rep["streaming_throughput_b_over_a"]["wordcount"] == 0.9


def test_real_round_artifacts_are_complete():
    # the committed r14 artifacts must satisfy the contract the checker
    # enforces going forward (r13 and earlier predate the probe fields)
    import check_artifacts
    assert check_artifacts.check_round(14) == []
