"""Compare two bench artifacts with the honesty gauges attached — the
mechanical form of the r12→r14 cross-round forensics.

Usage:
    python tools/bench_compare.py BENCH_SELF_r13.json BENCH_SELF_r14.json

Prints, for A → B:
  - each run's gauges: headline, start load1, canary warm floor,
    noise gauge, and the conservative disk read (min over the start/end
    probes' best pass, MB/s) — so the reader sees the MACHINE state of
    both runs before reading any ratio;
  - the wall delta decomposed into its top contributors (the r14 run2
    lesson: a 40s headline swing was ONE disk-heavy query plus noise —
    per-query concentration separates "a query regressed" from "the box
    changed speed");
  - the per-query ratio distribution (median / p25 / p75) for batch, and
    per-pipeline throughput ratios for the streaming section. A median
    far from 1 with tight quartiles is UNIFORM drift (machine); a median
    near 1 with fat outliers is concentrated (code or a throttle window
    hitting one query's shuffle/checkpoint path — check the probes).

Queries slower than MIN_SEC in both runs are excluded from the ratio
distribution (sub-100ms rows are scheduling jitter) but still count in
the delta decomposition.
"""

from __future__ import annotations

import json
import sys

MIN_SEC = 0.3   # ratio distribution floor; below this it's jitter
TOP_N = 6       # contributors shown in the delta decomposition


def _disk_floor(doc: dict):
    probe = doc.get("disk_mb_s")
    if not isinstance(probe, dict):
        return None
    bests = [v.get("best_mb_s") for v in probe.values()
             if isinstance(v, dict) and v.get("best_mb_s") is not None]
    return min(bests) if bests else None


def _gauges(doc: dict) -> str:
    load = doc.get("loadavg")
    load1 = (load.get("start") if isinstance(load, dict) else load)
    load1 = load1[0] if isinstance(load1, list) and load1 else None
    canary = (doc.get("canary") or {}).get("last_sec")
    noise = (doc.get("noise_gauge") or {}).get("median_ratio")
    disk = _disk_floor(doc)
    return (f"headline {doc.get('value')}s  load1 {load1}  "
            f"canary-floor {canary}s  noise {noise}  "
            f"disk {disk if disk is not None else 'n/a'} MB/s")


def _quartiles(ratios: list[float]):
    rs = sorted(ratios)
    n = len(rs)
    return rs[n // 4], rs[n // 2], rs[(3 * n) // 4]


def compare(a: dict, b: dict) -> dict:
    qa, qb = a.get("queries", {}), b.get("queries", {})
    shared = [k for k in qa if k in qb]
    delta = sum(qb[k] for k in shared) - sum(qa[k] for k in shared)
    contrib = sorted(shared, key=lambda k: -abs(qb[k] - qa[k]))[:TOP_N]
    ratios = {k: qb[k] / qa[k] for k in shared
              if max(qa[k], qb[k]) >= MIN_SEC and qa[k] > 0}
    p25, med, p75 = _quartiles(list(ratios.values())) if ratios else (
        None, None, None)
    out = {
        "shared_queries": len(shared),
        "only_in_a": sorted(set(qa) - set(qb)),
        "only_in_b": sorted(set(qb) - set(qa)),
        "batch_delta_sec": round(delta, 2),
        "top_contributors": [
            {"query": k, "a_sec": qa[k], "b_sec": qb[k],
             "delta_sec": round(qb[k] - qa[k], 2)} for k in contrib],
        "ratio_p25": round(p25, 3) if p25 else None,
        "ratio_median": round(med, 3) if med else None,
        "ratio_p75": round(p75, 3) if p75 else None,
        "outliers": sorted(
            ({"query": k, "ratio": round(r, 2)}
             for k, r in ratios.items() if r > 1.5 or r < 1 / 1.5),
            key=lambda d: -d["ratio"]),
    }
    sa, sb = a.get("streaming") or {}, b.get("streaming") or {}
    streams = {}
    for k, va in sa.items():
        vb = sb.get(k)
        ra = va.get("rows_per_sec") if isinstance(va, dict) else None
        rb = vb.get("rows_per_sec") if isinstance(vb, dict) else None
        if ra and rb:
            streams[k] = round(rb / ra, 3)
    if streams:
        out["streaming_throughput_b_over_a"] = streams
    return out


def main() -> None:
    if len(sys.argv) != 3:
        sys.exit("usage: python tools/bench_compare.py A.json B.json")
    with open(sys.argv[1]) as f:
        a = json.load(f)
    with open(sys.argv[2]) as f:
        b = json.load(f)
    print(f"A  {sys.argv[1]}: {_gauges(a)}")
    print(f"B  {sys.argv[2]}: {_gauges(b)}")
    rep = compare(a, b)
    print(f"\nbatch delta {rep['batch_delta_sec']:+}s over "
          f"{rep['shared_queries']} shared queries; ratio median "
          f"{rep['ratio_median']} (p25 {rep['ratio_p25']} / p75 "
          f"{rep['ratio_p75']})")
    print("top contributors to the delta:")
    for c in rep["top_contributors"]:
        print(f"  {c['query']:28s} {c['a_sec']:8.2f} -> {c['b_sec']:8.2f}"
              f"  ({c['delta_sec']:+.2f}s)")
    if rep["outliers"]:
        print(f"ratio outliers (>1.5x either way): "
              + ", ".join(f"{d['query']} {d['ratio']}"
                          for d in rep["outliers"]))
    for side in ("only_in_a", "only_in_b"):
        if rep[side]:
            print(f"{side}: {', '.join(rep[side])}")
    streams = rep.get("streaming_throughput_b_over_a")
    if streams:
        print("streaming throughput B/A: "
              + ", ".join(f"{k} {v}" for k, v in streams.items()))
    base = sum(a.get("queries", {}).values()) or 1.0
    if abs(rep["batch_delta_sec"]) < 0.05 * base:
        verdict = "flat (delta under 5% of A's batch wall" + (
            "; outliers are small in absolute terms)"
            if rep["outliers"] else ")")
    elif (rep["ratio_median"] and abs(rep["ratio_median"] - 1) > 0.15
          and len(rep["outliers"]) <= 2):
        verdict = ("UNIFORM drift — suspect the machine (compare the "
                   "disk and canary lines above)")
    elif rep["outliers"]:
        verdict = ("concentrated — check the outlier queries' paths "
                   "and the probes around them")
    else:
        verdict = "flat"
    print(f"read: {verdict}")


if __name__ == "__main__":
    main()
