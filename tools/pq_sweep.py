#!/usr/bin/env python3
"""PQ ADC shortlist-size sweep (dev calibration, not shipped).

Recomputes sim_topk_pqadc's two-stage recall@5 vs exact cosine for a
range of shortlist sizes R, using the same codebook convention (first-16
seeds refined by 2 deterministic scaled-integer Lloyd steps, mirroring
Similarity.pqCodebook) and the same stable tie-breaks as the Spark/DuckDB
implementations. Reproduces the oracle-ranked cells in BASELINE.md's
"PQ ADC serving recall" table exactly.

Usage: python3 tools/pq_sweep.py [sfDir ...]
"""
import math
import sys
from decimal import Decimal, ROUND_HALF_UP
import duckdb
import numpy as np

NB, SUB, NDONOR = 8, 8, 16
SCALE = float(1 << 30)
LLOYD_ITERS = 2

_Q6 = Decimal("0.000001")


def r6(x):
    """round-half-up at 6 dp on the shortest decimal rendering of the
    double — Spark's round() is BigDecimal HALF_UP (and DuckDB rounds
    half away from zero), while Python's built-in round / np.round are
    half-to-EVEN: a dyadic score like 1/128 = 0.0078125 rounds to
    .007813 in the engines but .007812 here, flipping an argmin tie."""
    return float(Decimal(repr(float(x))).quantize(_Q6, rounding=ROUND_HALF_UP))


def seq_dot(a, b):
    """Left-to-right sequential double dot — the exact accumulation order
    of the engines' VectorDot / list_dot_product, so every score below is
    bit-identical to theirs (ADVICE r9: the algebraically-equal
    round(exact ||q-recon||^2) form can differ in the last ulp and flip a
    tie at the rounding boundary or the shortlist cutoff)."""
    s = 0.0
    for x, y in zip(a, b):
        s += x * y
    return s


def refine(V):
    """Mirror of Similarity.pqCodebook: first-16 seeds, LLOYD_ITERS
    deterministic steps — rounded-score argmin (lowest-cid ties), exact
    floor(x*2^30) int sums (order-independent, both engines), empty
    clusters keep their centroid."""
    cbs = [V[:NDONOR, b * SUB:(b + 1) * SUB].copy() for b in range(NB)]
    for _ in range(LLOYD_ITERS):
        for b in range(NB):
            X = V[:, b * SUB:(b + 1) * SUB]
            C = cbs[b]
            cc = [seq_dot(c, c) for c in C]
            sums = [[0] * SUB for _ in range(NDONOR)]  # python ints: exact
            cnt = [0] * NDONOR
            for x in X:
                a = int(np.argmin([r6(cc[j] - 2.0 * seq_dot(x, C[j]))
                                   for j in range(NDONOR)]))
                cnt[a] += 1
                for i in range(SUB):
                    sums[a][i] += int(math.floor(x[i] * SCALE))
            newC = C.copy()
            for j in range(NDONOR):
                if cnt[j]:
                    newC[j] = np.array([(float(sums[j][i]) / SCALE) / cnt[j]
                                        for i in range(SUB)])
            cbs[b] = newC
    return cbs


def sweep(sf_dir, rs=(100, 200, 300, 500)):
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id").fetchall()
    ids = np.array([r[0] for r in rows])
    V = np.array([r[1] for r in rows], dtype=np.float64)
    n = len(V)
    cbs = refine(V)
    # engine code assignment: per block argmin over s_b = c.c - 2*(x.c)
    # (rank-equivalent of the block distance), lowest donor on ties —
    # np.argmin takes the first minimum, i.e. the lowest donor id.
    codes = np.zeros((n, NB), dtype=np.int64)
    for b in range(NB):
        lo, hi = b * SUB, (b + 1) * SUB
        C = cbs[b]
        cc = [seq_dot(c, c) for c in C]
        for i in range(n):
            x = V[i, lo:hi]
            codes[i, b] = int(np.argmin(
                [r6(cc[j] - 2.0 * seq_dot(x, C[j])) for j in range(NDONOR)]))
    q_idx = np.where(ids % 50 == 0)[0]
    norms = np.linalg.norm(V, axis=1)
    for R in rs:
        rec = []
        for q in q_idx:
            qv = V[q]
            # ADC in the engines' exact term order: qq + sum_b lut(b, code_b)
            # evaluated left-to-right, where lut(b,c) = c.c - 2*(q_b . c_b);
            # both engines then rank round(adc, 6) with vec_id tie-breaks —
            # stable argsort on the identical rounded values reproduces that.
            lut = np.empty((NB, NDONOR))
            for b in range(NB):
                lo, hi = b * SUB, (b + 1) * SUB
                C = cbs[b]
                qb = qv[lo:hi]
                for j in range(NDONOR):
                    lut[b, j] = seq_dot(C[j], C[j]) - 2.0 * seq_dot(qb, C[j])
            adc = np.full(n, seq_dot(qv, qv))
            for b in range(NB):
                adc = adc + lut[b, codes[:, b]]
            adc = np.array([r6(v) for v in adc])
            adc[q] = np.inf
            short = set(np.argsort(adc, kind="stable")[:R])
            cos = np.array([r6(v) for v in (V @ qv) / (norms * norms[q])])
            cos[q] = -np.inf
            true5 = set(np.argsort(-cos, kind="stable")[:5])
            rec.append(len(true5 & short) / 5)
        print(f"{sf_dir} n={n} R={R} (R/n={R/n:.1%}): recall@5={np.mean(rec):.3f}")


if __name__ == "__main__":
    for d in sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
        sweep(d)
