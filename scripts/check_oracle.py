"""Driver-compare rehearsal: run every ``queries()`` entry on Spark and
its ``oracle_sql()`` twin on DuckDB, compare row count / schema /
order-insensitive values, print a pass-fail table.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entrymod
from pdf_parser_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bool):
        return f"bool:{v}"
    return repr(v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in idx) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        sql = sqls.get(name)
        if sql is None:
            print(f"pass {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            n_pass += 1
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: DUCKDB ERROR {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        if sorted(scols) != sorted(ocols):
            ok = False
            msgs.append(f"schema spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            ok = False
            msgs.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if ok:
            a = norm_rows(scols, srows)
            b = norm_rows(ocols, orows)
            if a != b:
                ok = False
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                sa, sb = set(a), set(b)
                only_a = list(sa - sb)[:2]
                only_b = list(sb - sa)[:2]
                msgs.append(f"values differ: first_pairdiff={diff} only_spark={only_a} only_oracle={only_b}")
        if ok:
            print(f"pass {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL {name}: " + " | ".join(msgs))
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
