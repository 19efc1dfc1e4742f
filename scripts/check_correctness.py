"""Local mimic of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01; compare
row count, column names, and order-insensitive values."""

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

import __spark_entry__ as entrymod
from ssgp_toolbox_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def table_repr(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def main():
    spark = get_spark("correctness-check", master="local[8]",
                      extra_confs={"spark.sql.shuffle.partitions": "16"})
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            failures.append((name, f"spark error: {ex}"))
            print(f"FAIL {name}: spark error {str(ex)[:200]}")
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows  ({time.time()-t0:.1f}s)")
            if len(srows) == 0:
                failures.append((name, "0 rows"))
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            failures.append((name, f"duckdb error: {ex}"))
            print(f"FAIL {name}: duckdb error {str(ex)[:200]}")
            continue
        sc, sv = table_repr(scols, srows)
        dc, dv = table_repr(dcols, drows)
        if sc != dc:
            failures.append((name, f"columns {sc} vs {dc}"))
            print(f"FAIL {name}: column mismatch {sc} vs {dc}")
        elif len(sv) != len(dv):
            failures.append((name, f"rowcount {len(sv)} vs {len(dv)}"))
            print(f"FAIL {name}: rowcount {len(sv)} vs {len(dv)}")
        elif sv != dv:
            diff = [(a, b) for a, b in zip(sv, dv) if a != b][:3]
            failures.append((name, f"values differ, e.g. {diff}"))
            print(f"FAIL {name}: values differ; first diffs {diff}")
        else:
            print(f"OK   {name}: {len(sv)} rows  ({time.time()-t0:.1f}s)")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries pass")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
