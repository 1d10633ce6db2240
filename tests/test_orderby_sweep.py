"""The static NULL-ordering sweep (r12 verdict item 2b) — fails when a
NEW ``.orderBy`` site in the package or entry module orders without an
explicit null ordering and without an allowlist audit. No Spark."""

import orderby_sweep


def test_no_unaudited_implicit_null_ordering_sites():
    new = sorted(set(orderby_sweep.unsafe_sites())
                 - set(orderby_sweep.load_allowlist()))
    assert new == [], (
        "New .orderBy sites with IMPLICIT null ordering (Spark asc "
        "default = NULLS FIRST, DuckDB = NULLS LAST — silent oracle "
        "divergence on nullable keys). Either spell asc_nulls_last()/"
        "desc_nulls_last() on BOTH engines, or audit the key NULL-free "
        "and `python tests/orderby_sweep.py --regen`:\n  "
        + "\n  ".join(new)
    )


def test_sweep_allowlist_has_no_stale_entries():
    """Deleted/edited sites must leave the allowlist too — keeps the
    audited set tight (regenerate after refactors)."""
    stale = sorted(set(orderby_sweep.load_allowlist())
                   - set(orderby_sweep.unsafe_sites()))
    assert stale == [], (
        "Allowlist entries no longer present in source — regenerate "
        "with `python tests/orderby_sweep.py --regen`:\n  "
        + "\n  ".join(stale)
    )


def test_sweep_counts_catch_shadowed_duplicates():
    """A NEW unsafe orderBy whose argument text matches an audited
    site in the same file must still trip the sweep: the occurrence
    count is part of the fingerprint (review finding, round 13)."""
    from collections import Counter

    text = (
        "w1 = Window.partitionBy('a').orderBy(F.col('ts'))\n"
        "w2 = Window.partitionBy('b').orderBy(F.col('ts'))\n"
    )
    raw = orderby_sweep.orderby_sites(text, "probe.py")
    counted = [f"{fp}::x{n}" for fp, n in Counter(raw).items()]
    assert counted == ["probe.py::F.col('ts')::x2"]
    # the allowlist built when only ONE such site existed would hold
    # ::x1 — the second, text-identical site changes the fingerprint
    assert counted != ["probe.py::F.col('ts')::x1"]
    # and every live allowlist entry carries a count suffix
    assert all("::x" in e for e in orderby_sweep.load_allowlist())


def test_sweep_detects_a_synthetic_unsafe_site():
    """The scanner itself must flag an implicit-ascending orderBy and
    pass an explicit one (guards against regex rot)."""
    text = (
        "df.groupBy('k').count()\n"
        "w = Window.partitionBy('u').orderBy(F.col('ts'))\n"
        "w2 = Window.orderBy(F.col('ts').asc_nulls_last(),\n"
        "                    F.col('id').asc_nulls_last())\n"
    )
    sites = orderby_sweep.orderby_sites(text, "probe.py")
    assert sites == [
        "probe.py::F.col('ts')",
        "probe.py::F.col('ts').asc_nulls_last(), F.col('id').asc_nulls_last()",
    ]
    unsafe = [
        fp
        for fp in sites
        if not any(tok in fp.split("::", 1)[1]
                   for tok in orderby_sweep.EXPLICIT)
    ]
    assert unsafe == ["probe.py::F.col('ts')"]
