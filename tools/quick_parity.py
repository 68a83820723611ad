"""Ad-hoc parity runner for iterating on new registry rows.

Usage: python tools/quick_parity.py row1 [row2 ...] [--sf DIR]
Runs each named registry row on Spark AND its DuckDB oracle, compares
row count / column names / sorted values exactly, prints a verdict.
"""

import sys

sys.path.insert(0, ".")

import duckdb  # noqa: E402

from datafusion_uba_spark.queries import REGISTRY  # noqa: E402
from datafusion_uba_spark.session import get_spark  # noqa: E402
from datafusion_uba_spark.sources import TESTDATA_TABLES  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = "/root/testdata/sf0.01"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]
    spark = get_spark()
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    rc = 0
    for name in args:
        fn, sql = REGISTRY[name]
        spdf = fn(spark, sf).toPandas()
        opdf = con.sql(sql).df()
        cols_s, cols_o = sorted(spdf.columns), sorted(opdf.columns)
        ok_cols = cols_s == cols_o
        ok_rows = len(spdf) == len(opdf)
        ok_vals = False
        if ok_cols and ok_rows:
            a = sorted(
                spdf[cols_s].itertuples(index=False, name=None), key=repr
            )
            b = sorted(
                opdf[cols_o].itertuples(index=False, name=None), key=repr
            )
            ok_vals = all(repr(x) == repr(y) for x, y in zip(a, b))
            if not ok_vals:
                bad = [(x, y) for x, y in zip(a, b) if repr(x) != repr(y)]
                print(f"  first diffs: {bad[:3]}")
        print(
            f"{name}: rows={len(spdf)}/{len(opdf)} cols_ok={ok_cols} "
            f"vals_ok={ok_vals}"
        )
        if not ok_cols:
            print(f"  spark cols={cols_s}\n  oracle cols={cols_o}")
        if not (ok_cols and ok_rows and ok_vals):
            rc = 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
