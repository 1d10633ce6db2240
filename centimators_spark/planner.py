"""Join-strategy advisor — composes the round-12 measurement pair
(:func:`profile.join_skew_audit` + :func:`sketches.cms_join_size`)
into a DECISION: broadcast the dim, run the plain shuffle join, or
split hot keys with :func:`operators.skew.salted_join` (r12 verdict
item 4 — "measure, then choose" is what a 100 TB deployment does
before committing a shuffle).

The decision tree mirrors what a cost-based planner does with catalog
statistics, computed instead from the live frames:

1. ``dim`` small enough → **broadcast** (no shuffle at all; the
   map-side hash join is strictly better whenever the build side
   fits). Measured by one bounded count.
2. else, fact-side key skew: the hottest key's share ≥
   ``skew_share_milli`` → **salted** (one key owns the join — AQE's
   skew split may save the sort-merge join at runtime, but the
   deterministic salt is the planner-level guarantee; see
   operators/skew.py). Measured by ONE fact scan via join_skew_audit.
3. otherwise → **plain** (let Catalyst/AQE pick the physical join).

Optionally the AMS/CMS join-size estimate (est ≥ exact always) rides
along so the caller can abort a join whose OUTPUT would explode —
the third number a planner wants before a 100 TB shuffle.

Every measurement is a bounded driver-side scalar (a count and a
|key|-row audit collect) — the planner is a plan-time actor by
nature, exactly like the optimizer's own stats lookups. The chosen
strategy NEVER changes the result: all three return the identical
join multiset (the salted-join contract, pinned by the
plan_join_contract gate query and tests/test_joins.py).

No reference counterpart — SURVEY.md §2.2 join-taxonomy extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BROADCAST_ROW_LIMIT = 500_000
SKEW_SHARE_MILLI = 200


def plan_join_decision(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    *,
    broadcast_row_limit: int = BROADCAST_ROW_LIMIT,
    skew_share_milli: int = SKEW_SHARE_MILLI,
    n_salts: int = 8,
    estimate_size: bool = False,
) -> dict:
    """Measure, then decide. Returns a dict with ``strategy`` in
    {'broadcast', 'plain', 'salted'} plus the numbers that drove it:
    ``dim_rows``, and (when the dim is not broadcast-able)
    ``top1_share_milli`` / ``skew_milli`` / ``top_key`` from the
    fact-side audit; ``est_pairs``/``exact_pairs`` when
    ``estimate_size`` (two extra pruned key scans — a production
    caller derives both from its ingest-time key-count table)."""
    from centimators_spark.profile import join_skew_audit

    decision: dict = {"on": on, "n_salts": int(n_salts)}
    dim_rows = dim.count()
    decision["dim_rows"] = int(dim_rows)
    if dim_rows <= broadcast_row_limit:
        decision["strategy"] = "broadcast"
    else:
        audit = {
            r["key_name"]: r
            for r in join_skew_audit(fact, [on]).collect()
        }
        row = audit.get(on)
        if row is None:  # every fact key NULL: nothing ever matches
            decision.update(
                {"strategy": "plain", "top1_share_milli": 0,
                 "skew_milli": 0, "top_key": None}
            )
        else:
            decision.update(
                {
                    "top1_share_milli": int(row["top1_share_milli"]),
                    "skew_milli": int(row["skew_milli"]),
                    "top_key": row["top_key"],
                }
            )
            decision["strategy"] = (
                "salted"
                if row["top1_share_milli"] >= skew_share_milli
                else "plain"
            )
    if estimate_size:
        from centimators_spark.sketches import cms_join_size

        [sz] = cms_join_size(fact, on, dim, on).collect()
        decision["est_pairs"] = int(sz["est_pairs"])
        decision["exact_pairs"] = int(sz["exact_pairs"])
    return decision


def plan_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    *,
    how: str = "inner",
    broadcast_row_limit: int = BROADCAST_ROW_LIMIT,
    skew_share_milli: int = SKEW_SHARE_MILLI,
    n_salts: int = 8,
) -> tuple[DataFrame, dict]:
    """Execute the advised strategy. Returns ``(joined, decision)``;
    the joined frame's columns are fact ∪ (dim − key) under every
    strategy, and the row multiset is identical to the plain join
    (the contract each strategy must keep — broadcast and plain by
    construction, salted by operators/skew.py's salt-replica
    pairing).

    ``how`` is restricted to 'inner'/'left' UP FRONT — salted_join
    supports only those, and validating lazily would make the same
    call crash or succeed depending on the measured skew (a
    data-dependent failure mode an advisor must never have). For
    right/outer joins swap the arguments or pick a strategy
    manually."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"plan_join supports how='inner'|'left' (every strategy "
            f"must be able to run), got {how!r}"
        )
    decision = plan_join_decision(
        fact,
        dim,
        on,
        broadcast_row_limit=broadcast_row_limit,
        skew_share_milli=skew_share_milli,
        n_salts=n_salts,
    )
    strategy = decision["strategy"]
    if strategy == "broadcast":
        out = fact.join(F.broadcast(dim), on, how)
    elif strategy == "salted":
        from centimators_spark.operators.skew import salted_join

        out = salted_join(fact, dim, on, n_salts=n_salts, how=how)
    else:
        out = fact.join(dim, on, how)
    return out, decision
