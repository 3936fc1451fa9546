#!/usr/bin/env python3
"""Reproduce the ANN recall measurements behind the gate-query invariant
floors (n5_ann_lsh recall@3 >= 0.70, n5_ann_ivf recall@5 >= 0.60, and the
cosineNearDupPairs >= 0.70 spec floor).

Reimplements the engine's deterministic constructions independently of
Spark — FNV-1a-seeded Box-Muller Gaussian hyperplanes (Graft.hyperplane),
16 tables x 4 planes sign buckets (Graft.annLshTopK defaults), and IVF with
16 k-means cells (md5-ordered seeds, 2 micro-unit Lloyd rounds) probed at
nprobe=8 (Graft.annIvfTopK / Graft.kmeansCentroids) — then measures recall
against exact cosine top-k.

Usage: python3 scripts/measure_ann_recall.py [sfDir ...]

Measured when the floors were chosen (2026-08, seed-42 testdata):
  sf0.001  LSH recall@3 = 1.000   IVF recall@5 = 0.82   neardup = 1.000
  sf0.01   LSH recall@3 = 0.900   IVF recall@5 = 0.76   neardup = 0.929
  sf0.1    LSH recall@3 = 1.000   IVF recall@5 = 0.88   neardup = 0.944

The IVF ceiling is a property of the corpus, not the quantizer: the
synthetic embeddings are near-uniform on the sphere (no cosine cluster
structure), so recall ≈ probed fraction (8/16) × a ~1.5 locality factor.
An earlier revision seeded centroids with the first 16 ids — which overlap
the 10 query ids — and measured 0.92: query-as-centroid leakage, removed.

Also reproduces the cube-uniform-plane pathology that motivated Gaussian
planes: pass --cube to see recall collapse to ~0.13-0.23.
"""
import hashlib
import sys
import duckdb
import numpy as np
from collections import defaultdict

TABLES, PLANES = 16, 4  # Graft.annLshTopK / cosineNearDupPairs defaults
CELLS, NPROBE, KM_ITERS = 16, 8, 2  # Graft.annIvfTopK defaults


def fnv1a64(b):
    h = 0xcbf29ce484222325
    for x in b:
        h = ((h ^ x) * 0x100000001b3) & 0xFFFFFFFFFFFFFFFF
    return h


def gauss_planes(tag, n_planes, dim):
    P = np.zeros((n_planes, dim))
    for j in range(n_planes):
        for k in range(dim):
            u1 = ((fnv1a64(f"plane:{tag}:{j}:{k}:u1".encode()) >> 11) + 1) / float((1 << 53) + 1)
            u2 = (fnv1a64(f"plane:{tag}:{j}:{k}:u2".encode()) >> 11) / float(1 << 53)
            P[j, k] = np.sqrt(-2 * np.log(u1)) * np.cos(2 * np.pi * u2)
    return P


def cube_planes(tag, n_planes, dim):  # the rejected variant
    return np.array([[(fnv1a64(f"plane:{tag}:{j}:{k}".encode()) >> 11) / float(1 << 53) * 2 - 1
                      for k in range(dim)] for j in range(n_planes)])


def measure(sf_dir, plane_fn):
    emb = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchnumpy()
    V = np.stack([np.array(e, dtype=np.float64) for e in emb["embedding"]])
    ids = emb["vec_id"]
    n, dim = V.shape
    norm = V / np.linalg.norm(V, axis=1, keepdims=True)
    cos = norm @ norm.T
    iu = np.triu_indices(n, 1)
    neardup_pairs = set((i, j) for i, j in zip(*iu) if cos[i, j] >= 0.45)
    np.fill_diagonal(cos, -2)

    def topk(q, k, cand=None):
        pool = range(n) if cand is None else sorted(cand)
        return set(ids[i] for i in sorted(pool, key=lambda i: (-cos[q][i], ids[i]))[:k] if i != q)

    exact3 = {q: topk(q, 3) for q in range(10)}
    exact5 = {q: topk(q, 5) for q in range(10)}

    buckets = []
    for t in range(TABLES):
        P = plane_fn(t, PLANES, dim)
        buckets.append(((V @ P.T >= 0) * (1 << np.arange(PLANES))).sum(axis=1))

    lsh_recalls = []
    for q in range(10):
        cand = set()
        for t in range(TABLES):
            cand |= {i for i in range(n) if buckets[t][i] == buckets[t][q] and i != q}
        got = topk(q, 3, cand) if cand else set()
        lsh_recalls.append(len(got & exact3[q]) / 3)

    found = set()
    for t in range(TABLES):
        d = defaultdict(list)
        for i, b in enumerate(buckets[t]):
            d[b].append(i)
        for members in d.values():
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    if cos[members[x]][members[y]] >= 0.45:
                        found.add(tuple(sorted((members[x], members[y]))))
    nd_recall = len(found & neardup_pairs) / len(neardup_pairs) if neardup_pairs else 1.0

    # k-means cells, mirroring Graft.kmeansCentroids exactly: seeds are the
    # CELLS ids with the smallest md5(str(id)); each Lloyd round assigns by
    # max cosine (ties -> lower cell id) and recomputes the element-wise
    # mean in integer micro-units (HALF_UP like Spark's round(), NOT
    # np.round's half-even), cast to float32; cells that lose every member
    # drop out (the Scala groupBy emits no row for them)
    def round_half_up(x):
        return np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5))
    Vf = V.astype(np.float32)
    seed_order = sorted(range(n), key=lambda i: (hashlib.md5(str(ids[i]).encode()).hexdigest(), ids[i]))
    C = Vf[seed_order[:CELLS]].astype(np.float64)
    alive = np.ones(len(C), dtype=bool)
    for _ in range(KM_ITERS):
        Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
        sim_c = np.where(alive, norm @ Cn.T, -np.inf)
        assign = np.argmax(sim_c, axis=1)  # argmax keeps the lowest index on ties
        newC = np.array(C)
        for c in range(CELLS):
            # assign never points at dead cells (their sim is -inf)
            members = Vf[assign == c]
            if len(members):
                s = round_half_up(members.astype(np.float64) * 1e6).sum(axis=0)
                newC[c] = (s / len(members) / 1e6).astype(np.float32)
            else:
                alive[c] = False
        C = newC
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    sim_c = np.where(alive, norm @ Cn.T, -np.inf)
    assign = np.argmax(sim_c, axis=1)
    ivf_recalls = []
    for q in range(10):
        probe = set(np.argsort(-sim_c[q], kind="stable")[:NPROBE])
        cand = {i for i in range(n) if assign[i] in probe and i != q}
        got = topk(q, 5, cand) if cand else set()
        ivf_recalls.append(len(got & exact5[q]) / 5)

    print(f"{sf_dir}: LSH recall@3={np.mean(lsh_recalls):.3f} "
          f"IVF recall@5={np.mean(ivf_recalls):.3f} "
          f"neardup_recall={nd_recall:.3f} (n={n}, pairs={len(neardup_pairs)})")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    plane_fn = cube_planes if "--cube" in sys.argv else gauss_planes
    for sf in args or ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
        measure(sf, plane_fn)
