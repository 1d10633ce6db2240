"""Headline benchmark. Runs every __spark_entry__ query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS].

Output contract (learned the hard way in round 3, where the single
JSON line carrying a 96-entry per-query map outran the driver's stdout
tail buffer and BENCH_r03 recorded ``parsed: null``): the per-query
map is written to BENCH_DETAIL.json and printed as an EARLY stdout
line; the LAST stdout line is a compact machine-parsable summary —
{"metric", "value", "unit", "queries", "sf"} with ``queries`` limited
to the slowest 10 — so tail truncation can never eat the number the
driver parses.

Each query is executed with a count-style action (foreach noop via
``write.format("noop")``) so measured time is plan execution, not
driver-side collection.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from centimators_spark.session import get_spark  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("centimators-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    timings: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warm (JIT, file listing)
        runs = []
        for _ in range(2):  # best-of-2 to damp worker-churn variance
            t0 = time.perf_counter()
            df2 = fn(spark, sf_dir)
            df2.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        # a >2x disagreement means one run absorbed a full-GC/host stall
        # (the decimal-Gram queries are bimodal under heap pressure) —
        # one adaptive third run recovers the plan's real cost without
        # paying 3x wall for the whole suite
        if max(runs) > 2 * min(runs):
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            df2 = fn(spark, sf_dir)
            df2.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        best = min(runs)
        timings[name] = round(best, 3)
        # release this query's JVM-side state (localCheckpoint blocks,
        # broadcasts) promptly: dropping the py4j refs lets the
        # ContextCleaner free them now instead of during a later query's
        # timing window (heap pressure showed up as one random query per
        # run absorbing a multi-second full GC)
        df = df2 = None
        gc.collect()
        # drop any persist() blocks a query leaked past its own
        # unpersist (iterative fixpoints unpersist on their happy path,
        # but anything left pinned inflates heap pressure for EVERY
        # later query — round-7 saw three 10-16x inflated readings from
        # exactly this long-session state). clearCache() empties the SQL
        # CacheManager only: the deterministic localCheckpoint artifacts
        # the shared-index contracts pin (RDD-level blocks) survive.
        spark.catalog.clearCache()
        # the py4j refs are gone — now force the JVM full GC OUTSIDE the
        # next query's timing window (heap garbage from heavy queries —
        # decimal agg buffers, checkpoint blocks — otherwise lands as a
        # multi-second stall inside whichever query runs next)
        spark.sparkContext._jvm.System.gc()

    total = round(sum(timings.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    # verification queries (hash-contract twins whose cost is dominated
    # by the oracle side — brute-force recall baselines, kernel-vs-twin
    # double executions) vs the product operator surface: the
    # 2x-of-baseline comparison should track the latter (round-5
    # verdict item 9). Tag by naming convention plus the two
    # expression-twin queries that predate the _contract suffix.
    def _is_contract(name: str) -> bool:
        return (
            name.endswith("_contract")
            or name.endswith("_recall")
            or name in {"neutralizer_full_expr", "pca_project_expr"}
        )

    contracts = {n: t for n, t in timings.items() if _is_contract(n)}
    operators = {n: t for n, t in timings.items() if not _is_contract(n)}
    subtotals = {
        "operators_sec": round(sum(operators.values()), 3),
        "contracts_sec": round(sum(contracts.values()), 3),
        "n_operators": len(operators),
        "n_contracts": len(contracts),
    }
    full = {
        "metric": "total_query_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "n_queries": len(timings),
        "subtotals": subtotals,
    }
    # full per-query map: to a sidecar file + an EARLY stdout line (so a
    # human or tools/bench_compare.py can always find it) ...
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    try:
        with open(detail_path, "w") as fh:
            json.dump(full, fh)
            fh.write("\n")
    except OSError:
        pass  # read-only checkout: the stdout copy below still lands
    print(json.dumps(full))
    # ... and the LAST stdout line stays short enough that no tail
    # buffer can truncate it: top-10 slowest queries only
    top = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    print(
        json.dumps(
            {
                "metric": "total_query_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": top,
                "sf": sf_val,
                "n_queries": len(timings),
                "subtotals": subtotals,
                "detail": "BENCH_DETAIL.json",
            }
        )
    )


if __name__ == "__main__":
    main()
