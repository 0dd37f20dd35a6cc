"""Round-over-round bench comparison: flag per-query regressions.

Usage: python tools/bench_compare.py BASELINE.json CURRENT.json [ratio]

Reads two bench.py output JSON lines (e.g. BENCH_r01.json vs a fresh
run) and prints per-query deltas, flagging anything slower than
``ratio`` x baseline (default 1.5). Renamed/merged queries appear as
added/removed rather than regressions. Exit code 1 when a regression
is flagged — but note run-to-run variance on this box is ~±25%, so a
flag means "re-run and look", not "definitely slower".
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    """Accept either a raw bench.py JSON line or the driver's BENCH_r{N}
    wrapper (bench line under the 'parsed' key)."""
    with open(path, encoding="utf-8") as f:
        doc = json.loads(f.read())
    return doc.get("parsed", doc)


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    base = load(sys.argv[1])
    cur = load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    bq, cq = base.get("queries", {}), cur.get("queries", {})
    flagged = []
    print(f"{'query':<32} {'base':>8} {'cur':>8} {'ratio':>6}")
    for name in sorted(set(bq) | set(cq)):
        b, c = bq.get(name), cq.get(name)
        # fault-isolated bench records failed queries as {"err": ...}
        if isinstance(b, dict):
            b = None
        if isinstance(c, dict):
            print(f"{name:<32} {'-':>8} {'ERR':>8}    {c.get('err', '')[:60]}")
            flagged.append(name)
            continue
        if b is None:
            print(f"{name:<32} {'-':>8} {c:>8.2f}    new")
        elif c is None:
            print(f"{name:<32} {b:>8.2f} {'-':>8}    removed")
        else:
            r = c / b if b else float("inf")
            mark = "  <-- REGRESSION" if r > ratio else ""
            print(f"{name:<32} {b:>8.2f} {c:>8.2f} {r:>5.2f}x{mark}")
            if r > ratio:
                flagged.append(name)
    print(
        f"\nsuite: {base.get('value')}s -> {cur.get('value')}s"
        f" ({len(flagged)} regression(s) > {ratio}x)"
    )
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
