"""Static cross-engine NULL-ordering sweep (r12 verdict item 2b).

Spark's ascending sort default is NULLS FIRST where DuckDB's is NULLS
LAST (descending agrees: both NULLS LAST) — so any window/sort
``orderBy`` on a nullable column silently diverges between a declared
query and its DuckDB oracle. Two near-misses were caught by hand in
round 12 (event_paths, benjamini_hochberg); this sweep makes the hunt
structural: every ``.orderBy(...)`` call site in the package and the
entry module is fingerprinted as ``relpath::normalized-args``, and a
NEW site that neither spells an explicit null ordering
(``asc_nulls_last()`` / ``desc_nulls_last()`` / ``NULLS LAST``) nor
appears in the audited allowlist fails the suite.

The allowlist (tests/orderby_allowlist.json) encodes the 119 existing
sites, each audited in the round-12 package-wide NULL-ordering review
(SURVEY.md round-12 notes): they order fixture keys proven NULL-free
(primary keys, row_numbers, generated ids) or derived non-null
expressions. Adding a new entry is an explicit audited act: either
prove the order key NULL-free and regenerate
(``python tests/orderby_sweep.py --regen``), or — the default — spell
the ordering explicitly on BOTH engines.

No Spark session needed; pure text scan.
"""

from __future__ import annotations

import json
import pathlib
import re

ROOT = pathlib.Path(__file__).resolve().parent.parent
ALLOWLIST = pathlib.Path(__file__).resolve().parent / "orderby_allowlist.json"
EXPLICIT = ("nulls_last", "nulls_first", "NULLS LAST", "NULLS FIRST")


def scan_files() -> list[pathlib.Path]:
    return sorted(ROOT.glob("centimators_spark/**/*.py")) + [
        ROOT / "__spark_entry__.py"
    ]


def orderby_sites(text: str, relpath: str) -> list[str]:
    """Every ``.orderBy(...)`` call's raw fingerprint: relpath + the
    whitespace-normalized argument text (line-move tolerant; any
    argument edit re-fingerprints the site, forcing a re-audit)."""
    sites = []
    for m in re.finditer(r"\.orderBy\(", text):
        i, depth, buf = m.end(), 1, []
        while i < len(text) and depth:
            c = text[i]
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            if depth:
                buf.append(c)
            i += 1
        args = re.sub(r"\s+", " ", "".join(buf)).strip()
        sites.append(f"{relpath}::{args}")
    return sites


def unsafe_sites() -> list[str]:
    """Counted fingerprints (``relpath::args::xN``) of orderBy sites
    with NO explicit null ordering. The occurrence count is part of
    the fingerprint so a NEW site whose argument text happens to
    match an already-audited site in the same file still trips the
    sweep (without the count, 119 raw sites shadowed down to 95
    unique texts and a copy-paste of an audited orderBy onto a
    nullable column would pass unaudited)."""
    from collections import Counter

    raw = []
    for f in scan_files():
        for fp in orderby_sites(f.read_text(), str(f.relative_to(ROOT))):
            args = fp.split("::", 1)[1]
            if not any(tok in args for tok in EXPLICIT):
                raw.append(fp)
    return [f"{fp}::x{n}" for fp, n in Counter(raw).items()]


def load_allowlist() -> list[str]:
    return json.loads(ALLOWLIST.read_text())


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        sites = sorted(set(unsafe_sites()))
        ALLOWLIST.write_text(json.dumps(sites, indent=1) + "\n")
        print(f"wrote {len(sites)} audited sites to {ALLOWLIST}")
    else:
        new = sorted(set(unsafe_sites()) - set(load_allowlist()))
        print(f"{len(new)} unaudited sites")
        for fp in new:
            print("  " + fp)
