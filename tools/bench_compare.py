"""Compare two bench JSON outputs (BENCH_r*.json or raw bench.py lines).

Usage: python tools/bench_compare.py OLD NEW [--top N]

Accepts either the driver's wrapper JSON ({"parsed": {...}}) or the raw
one-line bench.py output. Prints totals, the shared-query subtotal
(the honest round-over-round number — new queries excluded), and the
biggest per-query regressions/improvements.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:
        d = d["parsed"]
    return d


def main() -> int:
    argv = sys.argv[1:]
    top = 8
    if "--top" in argv:
        i = argv.index("--top")
        top = int(argv[i + 1])
        del argv[i : i + 2]
    args = argv
    if len(args) != 2:
        print(__doc__)
        return 2
    old, new = load(args[0]), load(args[1])
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    print(f"old total {old['value']:8.1f}s over {len(oq)} queries")
    print(f"new total {new['value']:8.1f}s over {len(nq)} queries")
    os_, ns = sum(oq[k] for k in shared), sum(nq[k] for k in shared)
    ratio = ns / os_ if os_ else float("nan")
    print(f"shared-{len(shared)} subtotal: {os_:.1f}s -> {ns:.1f}s  ({ratio:.2f}x)")
    only_new = sorted(set(nq) - set(oq))
    if only_new:
        print(f"new-only queries ({len(only_new)}): "
              f"{sum(nq[k] for k in only_new):.1f}s total")
    deltas = sorted(shared, key=lambda k: nq[k] - oq[k])
    print(f"\nbiggest regressions (of shared, top {top}):")
    for k in reversed(deltas[-top:]):
        if nq[k] > oq[k]:
            print(f"  {k:28s} {oq[k]:7.2f} -> {nq[k]:7.2f}  (+{nq[k]-oq[k]:.2f}s)")
    print(f"\nbiggest improvements (top {top}):")
    for k in deltas[:top]:
        if nq[k] < oq[k]:
            print(f"  {k:28s} {oq[k]:7.2f} -> {nq[k]:7.2f}  ({nq[k]-oq[k]:.2f}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
