#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query result parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB (with each testdata table
registered as a view), sorts columns by name and rows by all columns, and
compares values exactly. Reports per-query PASS/FAIL with first diffs.
Dev tool only — not part of the shipped library.
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # The driver's row hash is byte-sensitive: -0.0 and +0.0 compare
        # equal in python but hash differently (bit us in r09's
        # sim_pq_codes). Surface the sign so the local gate matches.
        if v == 0.0 and math.copysign(1.0, v) < 0:
            return "-0.0"
        return v
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    # In-memory DuckDB cannot spill (no temp_directory), so its default
    # memory budget OOMs on the ladder oracles' 1e8-pair intermediate
    # relations at rung-active corpus sizes (the 150k-user E2LSH check).
    # The driver's gate runs at sf0.01 where this is irrelevant; for
    # local rung-activation checks give it a spill dir + the host's RAM.
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    # ORACLE_MEM is interpolated into SQL — validate its shape so a typo
    # ('96 GB') or stray text yields a clear fallback, not a confusing
    # DuckDB parse error (ADVICE r19).
    import re
    mem = os.environ.get('ORACLE_MEM', '96GB')
    if not re.fullmatch(r'\d+(\.\d+)?(GiB|GB|MiB|MB)', mem):
        print(f"WARN  ORACLE_MEM={mem!r} malformed (want e.g. '96GB'); using 96GB",
              file=sys.stderr)
        mem = '96GB'
    con.sql(f"SET memory_limit='{mem}'")
    # Bound the spill (r16): the 132k trained-Lloyd chain spilled past
    # the host's 79 GB free disk and took / to 100% — a capped spill
    # fails THAT query with a clean error instead of wedging the host.
    # Override via ORACLE_SPILL_CAP for a bigger-disk host.
    con.sql(f"SET max_temp_directory_size='{os.environ.get('ORACLE_SPILL_CAP', '40GB')}'")
    # Fewer threads = fewer per-thread operator buffers for the
    # window/list-agg-heavy ladder oracles (correctness unaffected).
    con.sql(f"SET threads TO {os.environ.get('ORACLE_THREADS', '8')}")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            # Spark-written table (a directory of part files), e.g. the
            # MakeScale sf1 replica — glob the parts.
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        got = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        if name not in oracles:
            print(f"SKIP  {name:30s} rows={len(got.fetchall())} (no oracle, rows-only)")
            n_skip += 1
            continue
        exp = con.sql(oracles[name])
        gcols = sorted(got.columns)
        ecols = sorted(exp.columns)
        if gcols != ecols:
            print(f"FAIL  {name:30s} SCHEMA got={gcols} exp={ecols}")
            n_fail += 1
            continue
        # Type sweep: the driver's row hash is TYPE-CLASS-sensitive even
        # when values compare equal in python — DuckDB sum(BIGINT) ->
        # HUGEINT bit us twice (r03), while int/float WIDTHS normalize out
        # in the driver's compare (Spark INT vs DuckDB BIGINT was green).
        # So compare width-normalized classes, and fail HUGEINT outright.
        def tclass(t):
            t = str(t)
            if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT"):
                return "int"
            if t in ("FLOAT", "REAL", "DOUBLE"):
                return "float"
            return t
        gtypes = dict(zip(got.columns, [tclass(t) for t in got.types]))
        etypes = dict(zip(exp.columns, [tclass(t) for t in exp.types]))
        tdiff = {c: (gtypes[c], etypes[c]) for c in gtypes
                 if gtypes[c] != etypes[c]}
        huge = [c for c, t in zip(exp.columns, exp.types)
                if "HUGEINT" in str(t)]
        if tdiff or huge:
            n_fail += 1
            if tdiff:
                print(f"FAIL  {name:30s} TYPES (spark, oracle) = {tdiff}")
            if huge:
                print(f"FAIL  {name:30s} oracle yields HUGEINT for {huge} "
                      f"— CAST the aggregate to BIGINT in the oracle SQL")
            continue
        grows = sorted([tuple(norm(v) for v in r) for r in
                        got.select(*gcols).fetchall()])
        erows = sorted([tuple(norm(v) for v in r) for r in
                        exp.select(*ecols).fetchall()])
        if grows == erows:
            print(f"PASS  {name:30s} rows={len(grows)}")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL  {name:30s} rows got={len(grows)} exp={len(erows)} cols={gcols}")
            diffs = 0
            for i in range(max(len(grows), len(erows))):
                g = grows[i] if i < len(grows) else None
                e = erows[i] if i < len(erows) else None
                if g != e:
                    print(f"      [{i}] got={g}")
                    print(f"      [{i}] exp={e}")
                    diffs += 1
                    if diffs >= 3:
                        break
    print(f"\n{n_pass} pass / {n_fail} fail / {n_skip} rows-only")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
