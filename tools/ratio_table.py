#!/usr/bin/env python
"""Join a bench.py JSON line with a bench_oracle.py JSON line into a
per-entry spark/oracle ratio table (markdown), the SCALE.md scale-proof
artifact.

    python tools/ratio_table.py BENCH_sf1.json ORACLE_sf1.json
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    bench = json.load(open(sys.argv[1]))
    oracle = json.load(open(sys.argv[2]))
    bq = bench["queries"]
    # oracle keys are full names; bench keys are qNN prefixes
    oq: dict[str, float] = {}
    for name, sec in oracle["queries"].items():
        oq[name.split("_")[0]] = sec
    rows = []
    for q, s in sorted(bq.items()):
        o = oq.get(q)
        ratio = (s / o) if o and o > 0 else None
        rows.append((q, s, o, ratio))
    print("| entry | spark s | oracle s | ratio |")
    print("|---|---|---|---|")
    over2 = []
    for q, s, o, r in rows:
        rs = f"{r:.2f}x" if r is not None else "—"
        print(f"| {q} | {s:.2f} | {o if o is not None else '—'} | {rs} |")
        if r is not None and r > 2.0:
            over2.append((q, r))
    ts, to = sum(b for _, b, _, _ in rows), sum(o for _, _, o, _ in rows if o)
    print(f"| **total** | **{ts:.1f}** | **{to:.1f}** | **{ts / to:.2f}x** |")
    print()
    if over2:
        print(f"entries over 2x: {', '.join(f'{q} ({r:.2f}x)' for q, r in over2)}")
    else:
        print("no entry over 2x")


if __name__ == "__main__":
    main()
