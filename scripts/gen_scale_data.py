"""Derive a 10x (sf1-equivalent) dataset from /root/testdata/sf0.1 for
scaling-curve measurement (r6 verdict item 1: back the 100 TB design
claims with a measured sf0.1 -> sf1 exponent per headline query).

R replicas of every fact table with disjoint key ranges; dimension
tables (region, nation) stay fixed, as they would at any scale.
Document text is passed through a per-replica character permutation
(vowel rotation, + 'st' swap for replicas 5-9) so cross-replica texts
share almost no 5-gram shingles: duplicate/near-dup STRUCTURE is
preserved within each replica (every replica applies one consistent
transform), while the corpus-wide pair count grows linearly in R, the
realistic growth model — naive text copies would grow verified-pair
workloads quadratically in R and measure a workload change, not a
scale-up. Embeddings keep their vectors (the ANN query contract pins
the query side to vec_id < 5, so brute-force cost grows linearly in N).

Usage: python scripts/gen_scale_data.py [R] [out_dir]
Defaults: R=10, out_dir=/root/repo/.scale/sf1
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"

# key strides chosen >> max key at sf0.1 so replica ranges are disjoint
STRIDES = {
    "c_custkey": 1_000_000,
    "s_suppkey": 100_000,
    "p_partkey": 1_000_000,
    "o_orderkey": 100_000_000,
    "l_orderkey": 100_000_000,
    "l_partkey": 1_000_000,
    "l_suppkey": 100_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 100_000,
}

VOWELS = "aeiou"


def _perm(k: int) -> tuple[str, str]:
    """Per-replica text transform: rotate vowels by k%5; replicas >= 5
    additionally swap s<->t. k=0 is the identity."""
    r = k % 5
    src, dst = VOWELS, VOWELS[r:] + VOWELS[:r]
    if k >= 5:
        src, dst = src + "st", dst + "ts"
    return src, dst


def main() -> int:
    r = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scale/sf1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def copy(table: str, select: str) -> None:
        con.sql(
            f"COPY ({select}) TO '{out}/{table}.parquet'"
            " (FORMAT parquet, COMPRESSION zstd)"
        )
        n = con.sql(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")

    for t in ("region", "nation"):
        copy(t, f"SELECT * FROM '{SRC}/{t}.parquet'")

    reps = f"(SELECT unnest(generate_series(0, {r - 1})) AS __k)"

    copy(
        "customer",
        f"""SELECT c_custkey + __k * {STRIDES['c_custkey']} AS c_custkey,
                   c_name, c_nationkey, c_acctbal, c_mktsegment
            FROM '{SRC}/customer.parquet' CROSS JOIN {reps}""",
    )
    copy(
        "supplier",
        f"""SELECT s_suppkey + __k * {STRIDES['s_suppkey']} AS s_suppkey,
                   s_name, s_nationkey, s_acctbal
            FROM '{SRC}/supplier.parquet' CROSS JOIN {reps}""",
    )
    copy(
        "part",
        f"""SELECT p_partkey + __k * {STRIDES['p_partkey']} AS p_partkey,
                   p_name, p_brand, p_type, p_size, p_retailprice
            FROM '{SRC}/part.parquet' CROSS JOIN {reps}""",
    )
    copy(
        "orders",
        f"""SELECT o_orderkey + __k * {STRIDES['o_orderkey']} AS o_orderkey,
                   o_custkey + __k * {STRIDES['c_custkey']} AS o_custkey,
                   o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM '{SRC}/orders.parquet' CROSS JOIN {reps}""",
    )
    copy(
        "lineitem",
        f"""SELECT l_orderkey + __k * {STRIDES['l_orderkey']} AS l_orderkey,
                   l_partkey + __k * {STRIDES['l_partkey']} AS l_partkey,
                   l_suppkey + __k * {STRIDES['l_suppkey']} AS l_suppkey,
                   l_linenumber, l_quantity, l_extendedprice, l_discount,
                   l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM '{SRC}/lineitem.parquet' CROSS JOIN {reps}""",
    )
    copy(
        "events",
        f"""SELECT event_id + __k * {STRIDES['event_id']} AS event_id,
                   ts,
                   user_id + __k * {STRIDES['user_id']} AS user_id,
                   event_type, value, props
            FROM '{SRC}/events.parquet' CROSS JOIN {reps}""",
    )
    doc_arms = "\nUNION ALL\n".join(
        f"""SELECT doc_id + {k * STRIDES['doc_id']} AS doc_id,
                   translate(text, '{_perm(k)[0]}', '{_perm(k)[1]}') AS text,
                   lang, source, n_chars
            FROM '{SRC}/documents.parquet'"""
        for k in range(r)
    )
    copy("documents", doc_arms)
    copy(
        "embeddings",
        f"""SELECT vec_id + __k * {STRIDES['vec_id']} AS vec_id,
                   embedding, label
            FROM '{SRC}/embeddings.parquet' CROSS JOIN {reps}""",
    )
    print(f"wrote {out} (R={r})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
