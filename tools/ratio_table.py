#!/usr/bin/env python
"""Join a bench.py JSON line with a bench_oracle.py JSON line into a
per-entry spark/oracle ratio table (markdown), the SCALE.md scale-proof
artifact.

    python tools/ratio_table.py BENCH_sf1.json ORACLE_sf1.json

A driver entry can be a COMBO (UNION ALL of several internal member
queries); its fair denominator is the SUM of its members' oracle
timings, so the combo membership is read from the registry instead of
prefix-matching (prefix-matching charges a 6-member suite against one
member's oracle and overstates the ratio).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def entry_members() -> dict[str, list[str]]:
    from etl_pipelines_spark.queries import combos

    out = {name: [name] for name in combos._STANDALONE}
    for name, members in combos.COMBO_MEMBERS.items():
        out[name] = list(members)
    return out


def main() -> None:
    bench = json.load(open(sys.argv[1]))
    oracle = json.load(open(sys.argv[2]))
    bq = bench["queries"]
    oq = dict(oracle["queries"].items())
    members = entry_members()
    long_name = {n.split("_")[0]: n for n in members}
    rows = []
    for q, s in sorted(bq.items()):
        mlist = members.get(long_name.get(q, q), [])
        osum = sum(oq[m] for m in mlist if m in oq)
        missing = [m for m in mlist if m not in oq]
        ratio = (s / osum) if osum > 0 else None
        rows.append((q, s, osum if osum > 0 else None, ratio, missing))
    print("| entry | spark s | oracle s (member sum) | ratio |")
    print("|---|---|---|---|")
    over2 = []
    for q, s, o, r, missing in rows:
        rs = f"{r:.2f}x" if r is not None else "—"
        os_ = f"{o:.2f}" if o is not None else "—"
        note = f" ({len(missing)} member(s) rows-only)" if missing else ""
        print(f"| {q} | {s:.2f} | {os_}{note} | {rs} |")
        if r is not None and r > 2.0:
            over2.append((q, r))
    # the total ratio is computed over ORACLE-TIMED entries only: an
    # entry with no oracle timing would contribute spark seconds to the
    # numerator with nothing in the denominator, skewing the bottom
    # line upward. Excluded entries are counted in the total row note.
    ts_timed = sum(b for _, b, o, _, _ in rows if o)
    to = sum(o for _, _, o, _, _ in rows if o)
    ts_all = sum(b for _, b, _, _, _ in rows)
    n_excl = sum(1 for _, _, o, _, _ in rows if not o)
    note = (
        f" ({n_excl} oracle-less entr{'y' if n_excl == 1 else 'ies'}, "
        f"{ts_all - ts_timed:.1f} spark s, excluded)"
        if n_excl
        else ""
    )
    if to:
        print(
            f"| **total (oracle-timed)** | **{ts_timed:.1f}**{note} | "
            f"**{to:.1f}** | **{ts_timed / to:.2f}x** |"
        )
    else:
        print(f"| **total** | **{ts_all:.1f}**{note} | — | — |")
    print()
    if over2:
        print(f"entries over 2x: {', '.join(f'{q} ({r:.2f}x)' for q, r in over2)}")
    else:
        print("no entry over 2x")


if __name__ == "__main__":
    main()
