#!/usr/bin/env python3
"""Dev-only parameter sweep for the ev_ts_similarity E2LSH calibration.

Reproduces EventOps' profile vectors and plane matrix exactly, then
evaluates (tables, projections, width) combos for top-20 recall and
candidate selectivity at both sf0.01 (spec floor) and sf0.1 (bench SF).
Not part of the shipped library.
"""
import duckdb
import numpy as np

MASK = (1 << 64) - 1

def lcg(x):
    return ((x * 6364136223846793005 + 1442695040888963407) & MASK) & 0x7fffffffffffffff

def planes(nproj, dim=24):
    return np.array([[(lcg(h * dim + d + 7) % 2001 - 1000) / 1000.0
                      for d in range(dim)] for h in range(nproj)])

def profiles(sf):
    con = duckdb.connect()
    rows = con.sql(f"""
        WITH prof AS (
          SELECT user_id, CAST(extract(hour FROM ts) AS INT) AS h,
                 round(sum(value), 2) AS v
          FROM '/root/testdata/{sf}/events.parquet' GROUP BY 1, 2
        )
        SELECT user_id, h, v FROM prof ORDER BY user_id, h""").fetchall()
    users = sorted(set(r[0] for r in rows))
    uidx = {u: i for i, u in enumerate(users)}
    m = np.zeros((len(users), 24))
    for u, h, v in rows:
        m[uidx[u], h] = v
    return np.array(users), m

def top20(users, m):
    d2 = ((m[:, None, :] - m[None, :, :]) ** 2).sum(axis=2)
    n = len(users)
    iu = np.triu_indices(n, 1)
    dists = np.sqrt(d2[iu])
    order = np.argsort(dists, kind="stable")[:20]
    return set((users[iu[0][k]], users[iu[1][k]]) if users[iu[0][k]] < users[iu[1][k]]
               else (users[iu[1][k]], users[iu[0][k]]) for k in order)

def evaluate(users, m, exact, pt, pk, w):
    P = planes(pt * pk)
    q = np.floor(m @ P.T / w).astype(np.int64)  # users x (pt*pk)
    n = len(users)
    cand = set()
    for t in range(pt):
        keys = {}
        for i in range(n):
            key = tuple(q[i, t * pk:(t + 1) * pk])
            keys.setdefault(key, []).append(i)
        for members in keys.values():
            for a in range(len(members)):
                for b in range(a + 1, len(members)):
                    i, j = members[a], members[b]
                    cand.add((users[i], users[j]) if users[i] < users[j]
                             else (users[j], users[i]))
    recall = len(cand & exact) / len(exact)
    allp = n * (n - 1) // 2
    return recall, len(cand), len(cand) / allp

for sf in ["sf0.01", "sf0.1"]:
    users, m = profiles(sf)
    exact = top20(users, m)
    print(f"== {sf}: {len(users)} users")
    for (pt, pk, w) in [(12, 3, 600), (12, 3, 400), (12, 3, 300), (12, 3, 200),
                        (12, 4, 600), (12, 4, 400), (16, 4, 400), (24, 4, 300),
                        (16, 4, 300), (24, 4, 400), (16, 5, 500), (24, 5, 400)]:
        r, c, sel = evaluate(users, m, exact, pt, pk, w)
        print(f"  PT={pt:2d} PK={pk} W={w:4d}  recall={r:.2f} cand={c:8d} sel={sel:.4f}")
