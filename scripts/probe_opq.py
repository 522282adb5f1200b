"""Offline OPQ-rotation probe (round 10, verdict item 4).

Question: the shipped PQ-ADC ordering is NON-MONOTONE in IVF probe depth
at sf0.1 (recall@5 0.30 at probe 6 vs 0.18 at 45 — deeper probes add
DISTORTED competitors that outrank true neighbors under the quantized
metric). Would an OPQ-style rotation of the (normalized) vectors before
subspace slicing reduce that distortion enough to ship?

Method: replicate the engine's PQ/IVF pipeline in numpy (same corpus,
same md5-top-K deterministic seeding, same K/nprobe derivation, same
KM_ITERS=2 Lloyd rounds, same normalize-then-slice, same ADC ranking and
tie rules — float64 instead of DECIMAL partials, which moves recall by
<1 hit at these scales) and measure the ADC recall frontier under
rotation configs:

  identity      — the shipped pipeline (baseline; must reproduce the
                  engine's non-monotone shape to validate the probe)
  rand_qr_17/23 — seeded random orthogonal rotations (QR of a Gaussian;
                  the classic cheap OPQ stand-in: decorrelates subspace
                  energy without training)
  pca_balanced  — OPQ-P initialization (Ge et al., CVPR 2013): rotate
                  into the PCA eigenbasis, then allocate eigendirections
                  to subspaces round-robin by decreasing eigenvalue so
                  per-subspace variance balances

Rotations act AFTER normalization and only on the PQ encode side —
orthogonal maps preserve norms and cosines, so the ground truth and the
IVF cell structure are untouched; any recall change is pure quantizer
distortion. Run: PYTHONPATH=/root/repo python scripts/probe_opq.py
"""

from __future__ import annotations

import hashlib
import math
import sys

import duckdb
import numpy as np

PQ_M = 16
PQ_SUBK = 32
KM_ITERS = 2
N_QUERIES = 10
TOP_K = 5


def load(sf_dir: str):
    con = duckdb.connect()
    rows = con.execute(
        "SELECT vec_id, CAST(embedding AS DOUBLE[]) FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    x = np.array([r[1] for r in rows], dtype=np.float64)
    return ids, x


def md5_order(ids: np.ndarray) -> np.ndarray:
    """Row order of the engine's deterministic seeder: ascending
    md5(str(vec_id)), vec_id tiebreak (similarity._seed_rows)."""
    key = sorted(
        range(len(ids)),
        key=lambda i: (hashlib.md5(str(int(ids[i])).encode()).hexdigest(), int(ids[i])),
    )
    return np.array(key, dtype=np.int64)


def kmeans(x: np.ndarray, seed_rows: np.ndarray, iters: int):
    """Lloyd's with the engine's tie rule (min (d2, cid)): centroids kept
    sorted by cid so argmin's first-hit IS the smallest cid; empty cells
    drop (the engine's groupBy does the same)."""
    cents = x[seed_rows].copy()
    cids = seed_rows.copy()
    order = np.argsort(cids)
    cents, cids = cents[order], cids[order]
    for _ in range(iters):
        d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        keep, new_cents = [], []
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                keep.append(c)
                new_cents.append(members.mean(axis=0))
        cents = np.array(new_cents)
        cids = cids[keep]
    return cents, cids


def ivf_levels(n: int):
    k = min(max(math.ceil(2.0 * math.sqrt(n)), 8), 65536)
    return k, tuple(
        sorted({(k + 15) // 16, (k + 7) // 8, (k + 3) // 4, (k + 2) // 3, (k + 1) // 2})
    )


def rotations(xn: np.ndarray) -> dict[str, np.ndarray]:
    dim = xn.shape[1]
    out = {"identity": np.eye(dim)}
    for seed in (17, 23):
        g = np.random.RandomState(seed).standard_normal((dim, dim))
        q, r = np.linalg.qr(g)
        q *= np.sign(np.diag(r))  # canonical sign fix
        out[f"rand_qr_{seed}"] = q
    # OPQ-P: eigenbasis ordered by decreasing variance, round-robin to
    # subspaces (eigendirection e_j -> subspace j % M) so each subspace
    # carries one slice of every variance tier
    cov = np.cov(xn, rowvar=False)
    w, v = np.linalg.eigh(cov)
    eig_order = np.argsort(w)[::-1]
    basis = v[:, eig_order]  # columns: decreasing variance
    sub_dim = dim // PQ_M
    perm = np.zeros(dim, dtype=np.int64)
    pos = 0
    for offset in range(sub_dim):
        for m in range(PQ_M):
            perm[m * sub_dim + offset] = pos
            pos += 1
    out["pca_balanced"] = basis[:, perm].T  # x' = R x puts dim i = e_perm[i]·x
    return out


def frontier(sf_dir: str):
    ids, x = load(sf_dir)
    n = len(ids)
    k, levels = ivf_levels(n)
    seeds = md5_order(ids)

    # ground truth: exact cosine top-5 per query (rotation-invariant)
    norms = np.linalg.norm(x, axis=1)
    xn = x / norms[:, None]
    q_idx = np.where(ids < N_QUERIES)[0]
    truth = {}
    for qi in q_idx:
        cos = xn @ xn[qi]
        cos[qi] = -np.inf
        top = np.argsort(-np.round(cos, 6) + ids * 1e-12)[:TOP_K]  # tie: vec_id asc
        order = sorted(range(n), key=lambda j: (-round(cos[j], 6), ids[j]))[:TOP_K]
        truth[int(ids[qi])] = {int(ids[j]) for j in order}

    # coarse quantizer on RAW vectors (the engine trains on v, ranks by cosine)
    cents, _ = kmeans(x, seeds[:k], KM_ITERS)
    ccos = (x @ cents.T) / (norms[:, None] * np.linalg.norm(cents, axis=1)[None, :])
    ccos = np.round(ccos, 6)
    cell_rank = np.argsort(-ccos, axis=1, kind="stable")  # tie: cid asc = col order
    assign1 = cell_rank[:, 0]

    results = {}
    for name, rot in rotations(xn).items():
        xr = xn @ rot.T
        # per-subspace codebooks from the SAME md5-top-SUBK seed rows
        codes = np.zeros((n, PQ_M), dtype=np.int64)
        subcents = []
        sub_dim = xr.shape[1] // PQ_M
        for m in range(PQ_M):
            sv = xr[:, m * sub_dim : (m + 1) * sub_dim]
            sc, _ = kmeans(sv, seeds[:PQ_SUBK], KM_ITERS)
            subcents.append(sc)
            d2 = ((sv[:, None, :] - sc[None, :, :]) ** 2).sum(axis=2)
            codes[:, m] = d2.argmin(axis=1)
        per_level = {}
        for lvl in levels:
            hits = tot = 0
            for qi in q_idx:
                probe_cells = set(cell_rank[qi, :lvl])
                cand = [j for j in range(n) if assign1[j] in probe_cells and j != qi]
                if not cand:
                    tot += TOP_K
                    continue
                adc = np.zeros(len(cand))
                for m in range(PQ_M):
                    sv_q = xr[qi, m * sub_dim : (m + 1) * sub_dim]
                    qd2 = ((subcents[m] - sv_q) ** 2).sum(axis=1)
                    adc += qd2[codes[cand, m]]
                order = sorted(
                    range(len(cand)), key=lambda t: (adc[t], ids[cand[t]])
                )[:TOP_K]
                got = {int(ids[cand[t]]) for t in order}
                hits += len(got & truth[int(ids[qi])])
                tot += TOP_K
            per_level[lvl] = round(hits / tot, 3)
        results[name] = per_level
    return k, levels, results


def main() -> int:
    for sf_dir in sys.argv[1:] or (
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ):
        k, levels, res = frontier(sf_dir)
        print(f"\n== {sf_dir}  (K={k}, ADC recall@5 by IVF probe level)")
        header = "config".ljust(14) + "".join(f"p{l:<6}" for l in levels)
        print(header)
        for name, per in res.items():
            print(name.ljust(14) + "".join(f"{per[l]:<7}" for l in levels))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
