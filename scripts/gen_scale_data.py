"""Derive scaled datasets from /root/testdata/sf0.1 for scaling-curve
measurement (r6 verdict item 1; r7 verdict item 2: a SECOND growth
decade and organic distinct-value growth; r7 verdict item 5: a
Zipf-skewed derivative for the skew-defense arm).

R replicas of every fact table with disjoint key ranges; dimension
tables (region, nation) stay fixed, as they would at any scale.

Document text goes through a PER-REPLICA ALPHABET BIJECTION (Caesar
rotation of a-z, reversed for the second band of 26) so that
  * duplicate/near-dup STRUCTURE is preserved within each replica
    (every replica applies one consistent transform);
  * cross-replica texts share essentially no shingles, so corpus-wide
    pair counts grow linearly in R (naive copies would grow verified-
    pair workloads quadratically and measure a workload change);
  * the DISTINCT-VALUE state grows ~R x — vocabulary, BPE pair
    tables, and shingle universes are disjoint across replicas, the
    organic-growth model the r7 vowel-rotation transform under-grew
    (r7 verdict item 2: "replication-with-permutation under-grows
    distinct-value state ... exactly the state that breaks at 100 TB").
Embeddings keep their vectors (the ANN query contract pins the query
side to a fixed budget, so brute-force cost grows linearly in N).

--skew additionally plants the two adversarial hot spots the skew arm
measures (r7 verdict item 5):
  * lineitem: ~6k rows are remapped into 2 HOT ORDERS (~3,000-line
    baskets vs the TPC-H max of 7, ~4.5M pair-combinations each) —
    the celebrity-basket case whose pair explosion serializes the
    naive rel_copurchase self-join onto two tasks;
  * documents: ~0.5% of docs are rewritten as one giant near-dup
    family (shared boilerplate + tiny per-doc tail) — the hub-cluster
    case that stresses p4_leakage_safe_split's LSH band join and the
    connected-components step.

Usage: python scripts/gen_scale_data.py [R] [out_dir] [--skew]
Defaults: R=10, out_dir=/root/repo/.scale/sf1
Second decade: python scripts/gen_scale_data.py 30 /root/repo/.scale/sf3
"""

from __future__ import annotations

import os
import string
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

# hot keys for --skew live far above every replica range
HOT_ORDER_BASE = 9_000_000_000
N_HOT_ORDERS = 2
HOT_ORDER_LINE_MOD = 1000  # ~1/1000 of lineitem rows join a hot basket
HOT_DOC_MOD = 200  # ~0.5% of docs join the boilerplate family


def _perm(k: int) -> tuple[str, str]:
    """Per-replica text bijection: rotate a-z by k%26; the second band
    of 26 replicas uses the REVERSED rotation so all transforms up to
    R=52 are distinct. k=0 is the identity. Upper case maps
    consistently."""
    a = string.ascii_lowercase
    rot = a[k % 26:] + a[: k % 26]
    if (k // 26) % 2 == 1:
        rot = rot[::-1]
    return a + a.upper(), rot + rot.upper()


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--skew"]
    skew = "--skew" in sys.argv[1:]
    r = int(args[0]) if args else 10
    out = args[1] if len(args) > 1 else "/root/repo/.scale/sf1"
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
    li_orderkey = f"l_orderkey + __k * {STRIDES['l_orderkey']}"
    if skew:
        # deterministic ~1/HOT_ORDER_LINE_MOD of rows land in one of
        # N_HOT_ORDERS celebrity baskets (hash on replica+key+line so
        # the hot rows are spread over the whole file, like real skew)
        h = (
            "CAST(hash(__k * 131071 + l_orderkey * 7 + l_linenumber)"
            " % 1000000007 AS BIGINT)"
        )
        li_orderkey = (
            f"CAST(CASE WHEN {h} % {HOT_ORDER_LINE_MOD} = 0"
            f" THEN {HOT_ORDER_BASE} + ({h} // {HOT_ORDER_LINE_MOD})"
            f" % {N_HOT_ORDERS}"
            f" ELSE l_orderkey + __k * {STRIDES['l_orderkey']} END AS BIGINT)"
        )
    copy(
        "lineitem",
        f"""SELECT {li_orderkey} AS l_orderkey,
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
    doc_text = "translate(text, '{src}', '{dst}')"
    if skew:
        # one giant near-dup family: a long shared boilerplate plus a
        # tiny per-doc tail so true Jaccard stays high (a real hub
        # cluster), for ~1/HOT_DOC_MOD of docs across ALL replicas
        boiler = (
            "the quick brown fox jumps over the lazy dog while every "
            "good boy deserves fudge and the five boxing wizards jump "
            "quickly over the glib jocks who quiz nymphs to vex dwarf "
        ) * 3
        doc_text = (
            f"CASE WHEN hash(__k * 524287 + doc_id) % {HOT_DOC_MOD} = 7"
            f" THEN '{boiler}' || CAST(doc_id AS VARCHAR)"
            f" ELSE {doc_text} END"
        )
    # n_chars is recomputed from the PRODUCED text so the column stays
    # consistent on skew-rewritten hub docs (r8 review; the bijection
    # arm preserves length, so this only changes hub rows)
    doc_arms = "\nUNION ALL\n".join(
        "SELECT doc_id + {off} AS doc_id, {text} AS text,"
        " lang, source, CAST(length({text}) AS BIGINT) AS n_chars"
        " FROM '{src_dir}/documents.parquet'"
        " CROSS JOIN (SELECT {k} AS __k)".format(
            off=k * STRIDES["doc_id"],
            text=doc_text.format(src=_perm(k)[0], dst=_perm(k)[1]),
            src_dir=SRC,
            k=k,
        )
        for k in range(r)
    )
    copy("documents", doc_arms)
    copy(
        "embeddings",
        f"""SELECT vec_id + __k * {STRIDES['vec_id']} AS vec_id,
                   embedding, label
            FROM '{SRC}/embeddings.parquet' CROSS JOIN {reps}""",
    )
    print(f"wrote {out} (R={r}, skew={skew})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
