"""Recompute the driver-window signature table from CORRECTNESS_r*.json.

The freshness policy in __spark_entry__.py orders queries by how stale
their latest driver signature is; its `_SIGNED_ROUND` table must be
updated from each round's CORRECTNESS file. This tool derives the table
mechanically (latest round with a full hash-match row per query) and
reports the drift against what __spark_entry__.py currently declares, so
the start-of-round update is a diff check instead of judgment:

    python tools/update_window.py          # report drift + next window
    python tools/update_window.py --emit   # print the table as python

`_CODE_CHANGED_SINCE_SIGNATURE` stays manual by design — it encodes the
round's diff, which no artifact records.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def signed_rounds() -> dict[str, int]:
    table: dict[str, int] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", path).group(1))
        with open(path) as f:
            data = json.load(f)
        for name, row in data.items():
            if (isinstance(row, dict) and row.get("hash_match")
                    and not row.get("err")):
                table[name] = max(table.get(name, 0), rnd)
    return table


def main() -> None:
    import __spark_entry__ as E
    from kafka_streams_examples_spark.registry import QUERIES

    actual = signed_rounds()
    declared = dict(E._SIGNED_ROUND)
    drift = {n: (declared.get(n), actual.get(n))
             for n in set(actual) | set(declared)
             if declared.get(n) != actual.get(n)}
    if drift:
        print("DRIFT (declared != artifact):")
        for n, (d, a) in sorted(drift.items()):
            print(f"  {n}: declared r{d} vs artifact r{a}")
    else:
        print("declared _SIGNED_ROUND matches the CORRECTNESS artifacts")
    never = [n for n in QUERIES if n not in actual]
    print(f"{len(actual)} signed / {len(QUERIES)} registry; "
          f"never-signed: {never or 'none'}")
    stale = E.stale_names()
    print(f"stale set: {len(stale)} (window capacity 50); "
          f"next window fronts: {list(E.queries())[:5]} ...")
    if "--emit" in sys.argv:
        by_round: dict[int, list[str]] = {}
        for n, r in actual.items():
            by_round.setdefault(r, []).append(n)
        print("\n# paste into __spark_entry__.py:")
        for r in sorted(by_round):
            names = ", ".join(f'"{n}"' for n in sorted(by_round[r]))
            print(f"_R{r:02d} = ({names},)")


if __name__ == "__main__":
    main()
