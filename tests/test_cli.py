"""CLI subcommands drive the audited plans end-to-end; validate's exit
code gates CI."""

from centimators_spark.cli import main

SF = "/root/testdata/sf0.001"


def test_cli_validate_exit_codes(spark, capsys):
    ok = main([
        "validate", f"{SF}/orders.parquet",
        "--not-null", "o_orderkey",
        "--unique", "o_orderkey",
        "--in-set", "o_orderstatus:F,O,P",
    ])
    assert ok == 0
    out = capsys.readouterr().out
    assert "not_null" in out and "pass" in out

    bad = main([
        "validate", f"{SF}/orders.parquet",
        "--in-set", "o_orderstatus:F",  # O/P rows violate
    ])
    assert bad == 1
    assert main(["validate", f"{SF}/orders.parquet"]) == 2  # no checks
    # malformed spec is a USAGE error (2), never a data failure (1)
    assert main([
        "validate", f"{SF}/orders.parquet", "--in-range", "o_totalprice",
    ]) == 2
    assert main([
        "validate", f"{SF}/orders.parquet", "--in-set", "o_orderstatus",
    ]) == 2


def test_cli_profile_heavy_hitters_corpus(spark, capsys):
    assert main([
        "profile", f"{SF}/documents.parquet", "--cols", "doc_id,lang",
        "--exact",
    ]) == 0
    assert "n_distinct" in capsys.readouterr().out

    assert main([
        "heavy-hitters", f"{SF}/customer.parquet",
        "--col", "c_mktsegment", "--min-share", "0.1",
    ]) == 0
    assert "share" in capsys.readouterr().out

    assert main([
        "corpus-report", f"{SF}/documents.parquet", "--per-doc", "3",
    ]) == 0
    out = capsys.readouterr().out
    assert "avg_quality" in out and "avg_dup_line_frac" in out
