"""Adversarial-skew fixtures (r4 verdict item 4): every skew defense in
the heavy joins was only exercised on uniform synthetic data. These
fixtures plant a hot key holding ~30% of the rows — the boilerplate
shingle / celebrity user / crowded IVF cell / hub node cases that
dominate real corpora — and assert the BOUNDED behavior each defense
promises: join fan-out removed by the DF cap, output linear in the
horizon (not quadratic in the hot user's events), rank stays salted,
hub wedge-work oriented away, all while results stay exact.
"""

import pytest
from pyspark.sql import functions as F


# --------------------------------------------------------------- E1 contamination


def _contamination_fixture(spark):
    """30 train docs; docs 0..9 (~33%) share a boilerplate opener
    (dozens of hot character-5-gram shingles, each with train-DF 10).
    The rest of every doc is an independent random string (no cross-doc
    grams). Eval 100 copies train doc 15 verbatim; eval 101 shares ONLY
    the boilerplate."""
    import random

    rng = random.Random(11)

    def rand_text(n=60):
        return "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(n))

    boiler = "terms and conditions apply to all users of this service"
    train_rows = []
    for i in range(30):
        unique = rand_text()
        text = f"{boiler} {unique}" if i < 10 else unique
        train_rows.append((i, text))
    copied = train_rows[15][1]
    eval_rows = [
        (100, copied),
        (101, f"{boiler} {rand_text()}"),
    ]
    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    ev = spark.createDataFrame(eval_rows, "doc_id long, text string")
    return train, ev


def test_contamination_df_cap_removes_hot_shingle_fanout(spark):
    from tensorflow_recorder_spark.operators.dedup import contamination_pairs

    train, ev = _contamination_fixture(spark)
    capped = {
        (r["eval_id"], r["train_id"])
        for r in contamination_pairs(
            train, ev, "text", "doc_id", max_shingle_df=5
        ).collect()
    }
    # only the true verbatim copy survives; the boilerplate-only eval
    # doc produces ZERO pairs because its sole shared shingles are hot
    assert capped == {(100, 15)}

    uncapped = {
        (r["eval_id"], r["train_id"])
        for r in contamination_pairs(train, ev, "text", "doc_id").collect()
    }
    # without the cap the hot shingles fan eval 101 out against every
    # boilerplate train doc — the quadratic term the cap exists to cut
    assert {(101, i) for i in range(10)} <= uncapped
    assert len(uncapped) == 11


# ------------------------------------------------------------------ E4 attribution


def test_attribution_hot_user_output_is_horizon_bounded(spark):
    """One user holds 30 of 100 click events (and 30 of 100
    conversions). The equi-join's range residual must keep the hot
    user's output linear (2 conversions per click at this spacing /
    horizon), never the 30 x 30 cross product a pure key join gives."""
    from tensorflow_recorder_spark.operators.events import attribution_join

    clicks, convs = [], []
    base = 1709287200  # 2024-03-01 10:00:00 UTC
    from datetime import datetime, timezone

    def ts(sec):
        return datetime.fromtimestamp(base + sec, tz=timezone.utc).strftime(
            "%Y-%m-%d %H:%M:%S"
        )

    # hot user 0: clicks every 200s, conversions 50s after each click
    for i in range(30):
        clicks.append((0, 1000 + i, ts(200 * i)))
        convs.append((0, 2000 + i, ts(200 * i + 50)))
    # 70 cold users: one click + one in-horizon conversion each
    for u in range(1, 71):
        clicks.append((u, 3000 + u, ts(0)))
        convs.append((u, 4000 + u, ts(100)))
    from_df = spark.createDataFrame(
        clicks, "user_id long, event_id long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    to_df = spark.createDataFrame(
        convs, "user_id long, event_id long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))

    out = attribution_join(from_df, to_df, horizon_seconds=400).collect()
    hot = [r for r in out if r["user"] == 0]
    # click i (t=200i) reaches conversions j=i (t+50) and j=i+1 (t+250);
    # the last click has no j+1 -> 29*2 + 1 = 59 rows, NOT 900
    assert len(hot) == 59
    assert len(out) == 59 + 70
    # exact lag set pins the residual predicate
    assert {r["lag_us"] for r in hot} == {50_000_000, 250_000_000}


# --------------------------------------------------------------------- E2 IVF ANN


def test_ivf_topk_hot_cell_exact_and_salted(spark):
    """~30% of the corpus lands in ONE IVF cell. The probe must still
    return the exact per-cell top-k (verified against a NumPy oracle),
    and the final rank must stay salted — no unpartitioned window may
    appear even under cell skew."""
    import numpy as np

    from tensorflow_recorder_spark.operators.similarity import ivf_topk
    from test_plan_windows import _unpartitioned_windows

    rng = np.random.RandomState(7)
    rows = []
    # hot cell around (1, 0): 60 of 100 vectors
    for i in range(60):
        ang = 0.10 * rng.rand()
        rows.append((i, [float(np.cos(ang)), float(np.sin(ang))]))
    # two cold cells
    for i in range(60, 80):
        ang = np.pi / 2 + 0.10 * rng.rand()
        rows.append((i, [float(np.cos(ang)), float(np.sin(ang))]))
    for i in range(80, 100):
        ang = np.pi + 0.10 * rng.rand()
        rows.append((i, [float(np.cos(ang)), float(np.sin(ang))]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    centroids = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [-1.0, 0.0])],
        "centroid_id long, embedding array<double>",
    )
    queries = emb.where(F.col("vec_id") == 3)

    plan_df = ivf_topk(emb, centroids, queries, k=5)
    assert _unpartitioned_windows(plan_df) == []

    got = [
        (r["neighbor_id"], r["rank"])
        for r in plan_df.orderBy("rank").collect()
    ]
    # NumPy oracle: cosine within the hot cell only, same rounding
    vecs = {i: np.array(v) for i, v in rows}
    q = vecs[3]
    scored = []
    for i in range(60):  # hot cell members
        if i == 3:
            continue
        s = float(q @ vecs[i] / (np.linalg.norm(q) * np.linalg.norm(vecs[i])))
        scored.append((round(s, 4), -i))
    scored.sort(reverse=True)
    want = [(-neg, rk + 1) for rk, (_, neg) in enumerate(scored[:5])]
    assert got == want


# ------------------------------------------------------------------- E1 triangles


def _brute_triangles(edge_set, nodes):
    import itertools

    tri = {n: 0 for n in nodes}
    for a, b, c in itertools.combinations(sorted(nodes), 3):
        if (
            ((a, b) in edge_set)
            and ((b, c) in edge_set)
            and ((a, c) in edge_set)
        ):
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    return tri


def test_triangle_counts_celebrity_hub_exact(spark):
    """A hub node adjacent to 40 leaves (star holding most edges) plus
    embedded triangles: compact-forward orientation must keep results
    exact — the hub's wedge work is oriented AWAY from it — and the
    plan must not contain a cartesian product."""
    from tensorflow_recorder_spark.operators.graph import triangle_counts

    edges = [(0, i) for i in range(1, 41)]  # hub 0, 40 leaves
    extra = [(1, 2), (3, 4), (10, 11), (11, 12), (10, 12), (41, 42)]
    edges += extra
    edge_set = {(min(a, b), max(a, b)) for a, b in edges}
    nodes = {n for e in edge_set for n in e}

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = triangle_counts(df)
    assert "CartesianProduct" not in out._jdf.queryExecution().executedPlan().toString()
    got = {r["node"]: (r["degree"], r["n_triangles"]) for r in out.collect()}

    deg = {n: 0 for n in nodes}
    for a, b in edge_set:
        deg[a] += 1
        deg[b] += 1
    want_tri = _brute_triangles(edge_set, nodes)
    assert {n: (deg[n], want_tri[n]) for n in nodes} == got
    # hub clustering coefficient: tiny despite huge degree
    hub = [r for r in out.collect() if r["node"] == 0][0]
    assert hub["degree"] == 40 and hub["n_triangles"] == 5
    assert hub["clustering"] == pytest.approx(5 / (40 * 39 / 2), abs=1e-6)


# ------------------------------------------------- E1 connected components (CC)


@pytest.mark.parametrize("threshold", [1_000_000, 0])
def test_duplicate_clusters_adversarial_shapes(spark, threshold):
    """Diameter-18 path (one short of the default 20-round cap), a
    merged double chain, and a hub component — the driver union-find
    and the distributed min-label loop must agree exactly and converge
    inside the cap."""
    from tensorflow_recorder_spark.operators.dedup import duplicate_clusters

    edges = [(i, i + 1) for i in range(18)]  # path 0..18
    edges += [(100 + i, 100 + i + 1) for i in range(6)]  # chain A
    edges += [(200 + i, 200 + i + 1) for i in range(6)]  # chain B
    edges += [(106, 206)]  # merge A+B mid-chain
    edges += [(300, 300 + i) for i in range(1, 9)]  # hub
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        (r["id"], r["cluster_id"])
        for r in duplicate_clusters(pairs, driver_threshold=threshold).collect()
    }
    want = {(i, 0) for i in range(19)}
    want |= {(100 + i, 100) for i in range(7)}
    want |= {(200 + i, 100) for i in range(7)}
    want |= {(300 + i, 300) for i in range(9)}
    assert got == want
