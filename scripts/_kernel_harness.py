"""Ad-hoc giant-bucket kernel breakdown harness (optimization round 11).

Replicates the fused fuzzy-dedup front end (signatures + hashed
shingles + band explode) in plain Python on the sf0.1 documents table,
then times each internal stage of the m x m matrix bucket_verify path
on the real giant bucket. No Spark; relative timings only.
"""
import hashlib
import sys
import time

import numpy as np
import pyarrow.parquet as pq

NH, BANDS, K = 8, 4, 5
RPB = NH // BANDS
MIN_EST, THR = 0.25, 0.3

t = pq.read_table(sys.argv[1] if len(sys.argv) > 1 else
                  "/root/testdata/sf0.1/documents.parquet")
ids_all = np.asarray(t.column("doc_id").to_pylist(), dtype=np.int64)
texts = t.column("text").to_pylist()

md5 = hashlib.md5
nd = (NH + 3) // 4
salts = [f"{d}:".encode() for d in range(nd)]
be_u32 = np.dtype(">u4")

t0 = time.perf_counter()
vocab: dict[str, int] = {}
doc_idx = []
for txt in texts:
    txt = txt.lower()
    m = max(len(txt) - K + 1, 1)
    sh = dict.fromkeys(txt[i:i + K] for i in range(m))
    doc_idx.append(np.fromiter((vocab.setdefault(g, len(vocab)) for g in sh),
                               dtype=np.int64, count=len(sh)))
buf = b"".join(md5(salts[d] + s.encode()).digest()
               for s in vocab for d in range(nd))
H = np.frombuffer(buf, dtype=be_u32).reshape(len(vocab), nd * 4)[:, :NH]
vbuf = b"".join(md5(g.encode()).digest()[:4] for g in vocab)
V = np.frombuffer(vbuf, dtype=be_u32).astype(np.int64)
sigs = np.empty((len(texts), NH), dtype=np.int64)
sh_arrays = []
for r, idxs in enumerate(doc_idx):
    sigs[r] = H[idxs].min(axis=0)
    sh_arrays.append(V[idxs])
print(f"combo pass: {time.perf_counter()-t0:.3f}s  vocab={len(vocab)}")

# band explode -> group docs per (band_idx, band_key)
t0 = time.perf_counter()
groups: dict[tuple, list] = {}
for r in range(len(texts)):
    for b in range(BANDS):
        key = md5(",".join(str(sigs[r, b * RPB + j]) for j in range(RPB))
                  .encode()).hexdigest()
        groups.setdefault((b, key), []).append(r)
sizes = sorted(((len(v), k) for k, v in groups.items()), reverse=True)
print(f"banding: {time.perf_counter()-t0:.3f}s  n_groups={len(groups)}")
print("top groups:", sizes[:8])

sys.path.insert(0, "/root/repo")
from tensorflow_recorder_spark.operators.dedup import (  # noqa: E402
    _intersect_counts_csr,
)


def verify_timed(rows, band_idx):
    tm = {}

    def tick(name, t0):
        tm[name] = tm.get(name, 0.0) + (time.perf_counter() - t0)
        return time.perf_counter()

    m = len(rows)
    ids = ids_all[rows]
    t0 = time.perf_counter()
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    rows = np.asarray(rows)[order]
    M8 = sigs[rows]
    arrs = [sh_arrays[r] for r in rows]
    lens = np.fromiter((len(a) for a in arrs), np.int64, m)
    flat = np.concatenate(arrs)
    vocab_, indices = np.unique(flat, return_inverse=True)
    indices = indices.astype(np.int64)
    indptr = np.zeros(m + 1, dtype=np.int64)
    np.cumsum(lens, out=indptr[1:])
    sizes_ = lens.astype(np.float64)
    t0 = tick("prep(unique/csr)", t0)

    A = np.zeros((m, m), dtype=np.uint8)
    for j in range(NH):
        vals = M8[:, j]
        order2 = np.argsort(vals, kind="stable")
        sv = vals[order2]
        starts = np.flatnonzero(np.concatenate(([True], sv[1:] != sv[:-1])))
        bounds = np.concatenate((starts, [m]))
        for k in range(len(starts)):
            grp = order2[bounds[k]:bounds[k + 1]]
            if len(grp) > 1:
                A[np.ix_(grp, grp)] += 1
    t0 = tick("A-matrix paint", t0)

    Km = (A.astype(np.float64) / float(NH)) >= MIN_EST
    t0 = tick("est floor", t0)
    for b in range(band_idx):
        cols = [M8[:, b * RPB + r_] for r_ in range(RPB)]
        order2 = np.lexsort(cols[::-1])
        same = np.ones(m, dtype=bool)
        same[0] = False
        for c in cols:
            sc = c[order2]
            same[1:] &= sc[1:] == sc[:-1]
        starts = np.flatnonzero(~same)
        bounds = np.concatenate((starts, [m]))
        for k in range(len(starts)):
            grp = order2[bounds[k]:bounds[k + 1]]
            if len(grp) > 1:
                Km[np.ix_(grp, grp)] = False
    t0 = tick("earlier-band dedup", t0)
    Km = np.triu(Km, k=1)
    ai, bi = np.nonzero(Km)
    t0 = tick("triu+nonzero", t0)
    ai = ai.astype(np.int64)
    bi = bi.astype(np.int64)
    est = A[ai, bi].astype(np.float64) / float(NH)
    nv = len(vocab_)
    csr_cost = 13.0 * (int(lens[bi].sum()) if len(bi) else 0)
    blas_cost = m * m * nv * 0.04
    budget_ok = m * nv * 4 <= (256 << 20)
    t0 = tick("pair gather", t0)
    if budget_ok and blas_cost < csr_cost:
        Mf32 = np.zeros((m, nv), dtype=np.float32)
        rws = np.repeat(np.arange(m, dtype=np.int64), lens)
        Mf32[rws, indices] = 1.0
        t0 = tick("dense build", t0)
        G = Mf32 @ Mf32.T
        t0 = tick("sgemm", t0)
        inter = G[ai, bi].astype(np.int64).astype(np.float64)
        t0 = tick("G gather", t0)
        kernel = "blas"
    else:
        inter = _intersect_counts_csr(indptr, indices, ai, bi).astype(np.float64)
        t0 = tick("csr kernel", t0)
        kernel = "csr"
    jac = inter / (sizes_[ai] + sizes_[bi] - inter)
    keep2 = jac >= THR
    n_out = int(keep2.sum())
    t0 = tick("jaccard+filter", t0)
    return m, len(ai), n_out, kernel, tm


for (sz, key) in sizes[:4]:
    rows = groups[key]
    t_all = time.perf_counter()
    m, npairs, nout, kern, tm = verify_timed(rows, key[0])
    total = time.perf_counter() - t_all
    print(f"\nbucket m={m} band={key[0]} pairs_surv_est={npairs} out={nout} "
          f"kernel={kern} total={total:.3f}s")
    for k_, v in sorted(tm.items(), key=lambda x: -x[1]):
        print(f"  {k_:22s} {v:.3f}s")
