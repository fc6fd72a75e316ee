#!/usr/bin/env python3
"""PQ ADC shortlist-size sweep (dev calibration, not shipped).

Recomputes sim_topk_pqadc's two-stage recall@5 vs exact cosine for a
range of shortlist sizes R, using the same codebook convention (block
slices of the first 16 vectors) and the same stable tie-breaks as the
Spark/DuckDB implementations. Reproduces the oracle-ranked cells in
BASELINE.md's "PQ ADC serving recall" table exactly.

Usage: python3 tools/pq_sweep.py [sfDir ...]
"""
import sys
import duckdb
import numpy as np

NB, SUB, NDONOR = 8, 8, 16


def sweep(sf_dir, rs=(100, 200, 300, 500)):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id").fetchall()
    ids = np.array([r[0] for r in rows])
    V = np.array([r[1] for r in rows], dtype=np.float64)
    n = len(V)
    recon = np.zeros_like(V)
    for b in range(NB):
        lo, hi = b * SUB, (b + 1) * SUB
        Xb, C = V[:, lo:hi], V[:NDONOR, lo:hi]
        recon[:, lo:hi] = C[((Xb[:, None, :] - C[None, :, :]) ** 2).sum(2).argmin(1)]
    q_idx = np.where(ids % 50 == 0)[0]
    norms = np.linalg.norm(V, axis=1)
    for R in rs:
        rec = []
        for q in q_idx:
            qv = V[q]
            # both engines rank round(score, 6) with vec_id tie-breaks;
            # stable argsort on the rounded values reproduces that order
            adc = np.round(((qv[None, :] - recon) ** 2).sum(1), 6)
            adc[q] = np.inf
            short = set(np.argsort(adc, kind="stable")[:R])
            cos = np.round((V @ qv) / (norms * norms[q]), 6)
            cos[q] = -np.inf
            true5 = set(np.argsort(-cos, kind="stable")[:5])
            rec.append(len(true5 & short) / 5)
        print(f"{sf_dir} n={n} R={R} (R/n={R/n:.1%}): recall@5={np.mean(rec):.3f}")


if __name__ == "__main__":
    for d in sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
        sweep(d)
