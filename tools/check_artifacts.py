"""Assert a round's measurement artifacts are complete — the chain's
final gate.

Measurement chains run as `( set -e; tool1; tool2; ... )` in a background
shell, but the harness wraps commands in an `&&` list, and POSIX `set -e`
is suppressed inside any compound command that is part of an AND-OR
list's condition. Net effect: a mid-chain tool can die (r14: the sf10
streaming replay OOM'd the driver at the old 8g default) and the chain
still prints its done-marker with exit 0, leaving an artifact silently
missing a section. `CHAIN_DONE` therefore proves nothing; this tool does.

Usage:
    python tools/check_artifacts.py 14            # full round close
    python tools/check_artifacts.py 14 --scale    # after the scale stage

Checks (full mode): each expected file exists, parses as JSON, and
carries the sections the round's tooling should have merged — the batch
curve's `streaming` section (tools/stream_bench.py --scale), the decade
curve's `streaming_sf10` (--scale10), the disk probe everywhere
(bench.disk_probe, r14), and a non-empty query table sized at least as
large as the previous round's (a shrunk roster is a silent-truncation
smell, SCALE10_r12's dropped-sections precedent). Exits non-zero with
one line per failure; prints OK per artifact otherwise.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(path: str, errs: list[str]):
    if not os.path.exists(path):
        errs.append(f"{os.path.basename(path)}: MISSING")
        return None
    try:
        with open(path) as f:
            return json.load(f)
    except ValueError as e:
        errs.append(f"{os.path.basename(path)}: unparseable JSON ({e})")
        return None


def _require(doc: dict | None, path: str, keys: list[str],
             errs: list[str]) -> None:
    if doc is None:
        return
    name = os.path.basename(path)
    for key in keys:
        node = doc
        for part in key.split("."):
            if not isinstance(node, dict) or part not in node:
                errs.append(f"{name}: missing section '{key}'")
                node = None
                break
            node = node[part]
        if isinstance(node, dict) and not node:
            errs.append(f"{name}: section '{key}' is EMPTY")


def _min_rows(doc: dict | None, path: str, prev_path: str,
              errs: list[str]) -> None:
    """A roster smaller than last round's means rows were silently
    dropped (crash mid-write, or a merge that clobbered sections)."""
    if doc is None or not os.path.exists(prev_path):
        return
    try:
        with open(prev_path) as f:
            prev = json.load(f)
    except ValueError:
        return
    n_now = len(doc.get("queries", {}))
    n_prev = len(prev.get("queries", {}))
    if n_now < n_prev:
        errs.append(f"{os.path.basename(path)}: {n_now} query rows < "
                    f"previous round's {n_prev} — rows silently dropped?")


def check_round(round_no: int, stage: str = "full") -> list[str]:
    errs: list[str] = []
    r, p = f"r{round_no:02d}", f"r{round_no - 1:02d}"

    scale = os.path.join(REPO, f"SCALE_{r}.json")
    doc = _load(scale, errs)
    _require(doc, scale, ["queries", "streaming.pipelines", "disk_mb_s"],
             errs)
    _min_rows(doc, scale, os.path.join(REPO, f"SCALE_{p}.json"), errs)
    if doc is not None and not errs:
        print(f"OK {os.path.basename(scale)} "
              f"({len(doc['queries'])} rows + streaming)")
    if stage == "--scale":
        return errs

    scale10 = os.path.join(REPO, f"SCALE10_{r}.json")
    doc = _load(scale10, errs)
    _require(doc, scale10,
             ["queries", "streaming_sf10.pipelines", "disk_mb_s"], errs)
    _min_rows(doc, scale10, os.path.join(REPO, f"SCALE10_{p}.json"), errs)
    if doc is not None and all(scale10 not in e and
                               os.path.basename(scale10) not in e
                               for e in errs):
        print(f"OK {os.path.basename(scale10)} "
              f"({len(doc['queries'])} rows + streaming_sf10)")

    wire = os.path.join(REPO, f"INGESTWIRE_{r}.json")
    doc = _load(wire, errs)
    _require(doc, wire, ["pipelines", "batch_forms", "disk_mb_s"], errs)
    if doc is not None and all(os.path.basename(wire) not in e
                               for e in errs):
        print(f"OK {os.path.basename(wire)}")

    bench = os.path.join(REPO, f"BENCH_SELF_{r}.json")
    doc = _load(bench, errs)
    _require(doc, bench,
             ["queries", "streaming", "disk_mb_s", "canary",
              "noise_gauge"], errs)
    if doc is not None and all(os.path.basename(bench) not in e
                               for e in errs):
        print(f"OK {os.path.basename(bench)} "
              f"({doc.get('value')}s / {len(doc['queries'])} queries)")
    return errs


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    stage = next((a for a in sys.argv[1:] if a.startswith("--")), "full")
    if not args:
        sys.exit("usage: python tools/check_artifacts.py <round> [--scale]")
    errs = check_round(int(args[0]), stage)
    if errs:
        for e in errs:
            print(f"FAIL {e}", file=sys.stderr)
        sys.exit(1)
    print("all artifacts complete")


if __name__ == "__main__":
    main()
