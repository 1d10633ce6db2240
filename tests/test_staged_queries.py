"""Driver-gate mimic for the STAGED (next-round) contract queries —
same compare the driver runs, so promotion into queries() is zero-risk."""

import duckdb
import numpy as np

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = ("lineitem", "orders", "customer", "documents")


def test_staged_queries_match_oracles(spark):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    queries = entrymod.staged_queries()
    oracles = entrymod.staged_oracle_sql()
    assert set(queries) == set(oracles)
    for name, fn in queries.items():
        sdf = fn(spark, SF).toPandas()
        odf = con.execute(oracles[name]).fetchdf()
        assert sorted(sdf.columns) == sorted(odf.columns), name
        assert len(sdf) == len(odf), name
        cols = sorted(sdf.columns)
        s = sdf[cols].sort_values(cols, na_position="first").reset_index(drop=True)
        o = odf[cols].sort_values(cols, na_position="first").reset_index(drop=True)
        for c in cols:
            if s[c].dtype.kind == "f" or o[c].dtype.kind == "f":
                np.testing.assert_allclose(
                    s[c].astype(float), o[c].astype(float),
                    rtol=0, atol=0, equal_nan=True, err_msg=f"{name}.{c}",
                )
            else:
                assert (
                    s[c].astype(str).tolist() == o[c].astype(str).tolist()
                ), (name, c)
