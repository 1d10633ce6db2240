"""Command-line interface — the standalone-engine entry points for the
operational tools (profiling, validation, corpus reports) over any
parquet path, no notebook required:

    python -m centimators_spark profile  /path/to/table.parquet
    python -m centimators_spark validate /path/to/table.parquet \\
        --not-null id --unique id --in-range "price:0:"
    python -m centimators_spark corpus-report /path/to/docs.parquet \\
        --text-col text --id-col doc_id
    python -m centimators_spark heavy-hitters /path/to/t.parquet --col k

Each subcommand builds one of the engine's audited plans and prints a
small result table; exit code 1 when a validation check fails (CI
gate semantics).
"""

from __future__ import annotations

import argparse
import sys


def _spark(cpus: str):
    from centimators_spark.session import get_spark

    return get_spark("centimators-cli", cpus=cpus)


def _show(df, n: int = 50) -> None:
    df.show(n, truncate=False)


def cmd_profile(args) -> int:
    from centimators_spark.profile import table_profile

    spark = _spark(args.cpus)
    df = spark.read.parquet(args.path)
    cols = args.cols.split(",") if args.cols else None
    _show(table_profile(df, cols, exact=args.exact))
    return 0


def cmd_validate(args) -> int:
    from centimators_spark import validate as V

    spark = _spark(args.cpus)
    df = spark.read.parquet(args.path)
    # exit-code contract: 0 = all checks pass, 1 = a check FAILED,
    # 2 = usage error — a malformed spec must be 2, never 1 (a CI gate
    # reading 1 would mistake the typo for a data-quality failure)
    try:
        checks = []
        for c in args.not_null or []:
            checks.append(V.not_null(c))
        for c in args.unique or []:
            checks.append(V.unique(c))
        for spec in args.in_range or []:
            col, lo, hi = (spec.split(":") + ["", ""])[:3]
            checks.append(
                V.in_range(
                    col,
                    float(lo) if lo else None,
                    float(hi) if hi else None,
                )
            )
        for spec in args.in_set or []:
            col, vals = spec.split(":", 1)
            checks.append(V.in_set(col, vals.split(",")))
        for spec in args.matches or []:
            col, regex = spec.split(":", 1)
            checks.append(V.matches(col, regex))
    except (ValueError, IndexError) as e:
        print(f"bad check spec: {e}", file=sys.stderr)
        return 2
    if not checks:
        print("no checks given", file=sys.stderr)
        return 2
    # one execution: collect, then print and gate from the same rows
    rows = V.validate(df, checks).collect()
    for r in rows:
        print(f"{r.check:12s} {r.column:24s} "
              f"{'pass' if r.passed else 'FAIL'} "
              f"violations={r.n_violations}")
    return 0 if all(r.passed for r in rows) else 1


def cmd_corpus_report(args) -> int:
    from pyspark.sql import functions as F

    from centimators_spark.text.analysis import char_entropy, quality_score
    from centimators_spark.text.line_filters import corpus_line_dedup
    from centimators_spark.text.repetition import repetition_signals

    spark = _spark(args.cpus)
    df = spark.read.parquet(args.path)
    t, i = args.text_col, args.id_col
    q = quality_score(df, t, i).select("doc_id", "quality")
    e = char_entropy(df, t, i).select("doc_id", "entropy")
    r = repetition_signals(df, t, i).select("doc_id", "dup_ngram_char_frac")
    ld = corpus_line_dedup(df, t, i).select("doc_id", "dup_line_frac")
    # two actions read this four-scan join — materialize it once
    joined = q.join(e, "doc_id").join(r, "doc_id").join(ld, "doc_id")
    if args.per_doc:
        joined = joined.persist()
    _show(
        joined.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
            F.round(F.avg("entropy"), 4).alias("avg_entropy"),
            F.round(F.avg("dup_ngram_char_frac"), 4).alias("avg_rep_frac"),
            F.round(F.avg("dup_line_frac"), 4).alias("avg_dup_line_frac"),
        )
    )
    if args.per_doc:
        _show(joined.orderBy("doc_id"), args.per_doc)
    return 0


def cmd_drift(args) -> int:
    """PSI drift report: current parquet vs reference parquet, per
    numeric (binned) and/or categorical column. Exit 1 when any
    column's PSI crosses --threshold (CI gate shape, like validate)."""
    from centimators_spark.operators.drift import (
        psi_drift,
        psi_drift_categorical,
    )

    from pyspark.sql import functions as F

    spark = _spark(args.cpus)
    ref = spark.read.parquet(args.reference).withColumn("__side", F.lit(True))
    cur = spark.read.parquet(args.current).withColumn("__side", F.lit(False))
    num = [c for c in (args.num or "").split(",") if c]
    cat = [c for c in (args.cat or "").split(",") if c]
    if not num and not cat:
        print("pass --num and/or --cat column lists", flush=True)
        return 2
    both = ref.select(*num, *cat, "__side").unionByName(
        cur.select(*num, *cat, "__side")
    )
    frames = []
    if num:
        # default = mergeable approx_percentile sketch (the 100 TB
        # path); --exact opts into the oracle-parity single-buffer sort
        frames.append(
            psi_drift(
                both, num, F.col("__side"), n_bins=args.bins,
                exact=args.exact,
            ).select("feature", "n_ref", "n_cur", "psi")
        )
    if cat:
        frames.append(
            psi_drift_categorical(both, cat, F.col("__side")).select(
                "feature", "n_ref", "n_cur", "psi"
            )
        )
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    rows = out.collect()
    _show(out)
    worst = max((r.psi for r in rows), default=0.0)
    print(f"max_psi={worst}")
    return 1 if worst > args.threshold else 0


def cmd_diff(args) -> int:
    """Table reconciliation: exit 1 when any column disagrees or rows
    are missing from either side (CI gate shape)."""
    from centimators_spark.reconcile import table_diff

    spark = _spark(args.cpus)
    a = spark.read.parquet(args.table_a)
    b = spark.read.parquet(args.table_b)
    keys = args.keys.split(",")
    cols = (
        args.cols.split(",")
        if args.cols
        else [c for c in a.columns if c not in keys and c in b.columns]
    )
    rows = table_diff(a, b, keys, cols).collect()
    clean = True
    for r in rows:
        if r.column == "__rows__":
            print(f"{'rows':24s} only_a={r.n_only_a} only_b={r.n_only_b} "
                  f"both={r.n_both}")
            clean &= (r.n_only_a == 0 and r.n_only_b == 0)
        else:
            print(f"{r.column:24s} equal={r.n_equal} diff={r.n_diff}")
            clean &= r.n_diff == 0
    return 0 if clean else 1


def cmd_benford(args) -> int:
    from centimators_spark.profile import benford_check

    spark = _spark(args.cpus)
    df = spark.read.parquet(args.path)
    rows = benford_check(df, args.col).orderBy("digit").collect()
    chi2 = sum(r.chi2_term for r in rows)
    for r in rows:
        print(f"digit {r.digit}: n={r.n} share={r.share} "
              f"expected={r.expected}")
    print(f"chi2={round(chi2, 4)} (df=8; ~15.5 is the 5% line)")
    return 1 if chi2 > args.threshold else 0


def cmd_heavy_hitters(args) -> int:
    from centimators_spark.profile import heavy_hitters

    spark = _spark(args.cpus)
    df = spark.read.parquet(args.path)
    _show(
        heavy_hitters(
            df, args.col, min_share=args.min_share, exact=not args.sketch
        )
    )
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="centimators_spark")
    p.add_argument("--cpus", default="8")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("profile", help="per-column SUMMARIZE")
    sp.add_argument("path")
    sp.add_argument("--cols", default=None, help="comma-separated subset")
    sp.add_argument("--exact", action="store_true")
    sp.set_defaults(fn=cmd_profile)

    sv = sub.add_parser("validate", help="declarative checks (exit 1 on fail)")
    sv.add_argument("path")
    sv.add_argument("--not-null", action="append")
    sv.add_argument("--unique", action="append")
    sv.add_argument("--in-range", action="append", metavar="COL:LO:HI")
    sv.add_argument("--in-set", action="append", metavar="COL:V1,V2")
    sv.add_argument("--matches", action="append", metavar="COL:REGEX")
    sv.set_defaults(fn=cmd_validate)

    sc = sub.add_parser("corpus-report", help="quality/entropy/dup summary")
    sc.add_argument("path")
    sc.add_argument("--text-col", default="text")
    sc.add_argument("--id-col", default="doc_id")
    sc.add_argument("--per-doc", type=int, default=0, metavar="N")
    sc.set_defaults(fn=cmd_corpus_report)

    sd = sub.add_parser(
        "drift", help="PSI report: current vs reference parquet (exit 1 over threshold)"
    )
    sd.add_argument("current")
    sd.add_argument("reference")
    sd.add_argument("--num", default=None, help="comma-separated numeric cols")
    sd.add_argument("--cat", default=None, help="comma-separated categorical cols")
    sd.add_argument("--bins", type=int, default=10)
    sd.add_argument("--threshold", type=float, default=0.25)
    sd.add_argument(
        "--exact",
        action="store_true",
        help="exact percentile boundaries (single-buffer sort per "
        "feature — oracle parity mode; the default is the scalable "
        "approx_percentile sketch)",
    )
    sd.set_defaults(fn=cmd_drift)

    sf = sub.add_parser(
        "diff", help="reconcile two parquet tables (exit 1 on any diff)"
    )
    sf.add_argument("table_a")
    sf.add_argument("table_b")
    sf.add_argument("--keys", required=True, help="comma-separated key cols")
    sf.add_argument("--cols", default=None, help="compare cols (default: shared non-keys)")
    sf.set_defaults(fn=cmd_diff)

    sb = sub.add_parser("benford", help="first-digit audit (exit 1 over chi2 threshold)")
    sb.add_argument("path")
    sb.add_argument("--col", required=True)
    sb.add_argument("--threshold", type=float, default=15.51)
    sb.set_defaults(fn=cmd_benford)

    sh = sub.add_parser("heavy-hitters", help="frequent values of a column")
    sh.add_argument("path")
    sh.add_argument("--col", required=True)
    sh.add_argument("--min-share", type=float, default=0.01)
    sh.add_argument("--sketch", action="store_true")
    sh.set_defaults(fn=cmd_heavy_hitters)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
