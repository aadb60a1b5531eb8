#!/usr/bin/env python3
"""Local replica of the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [only1,only2,...]
Sweep: python3 tools/check_oracle.py <sfA>:<outA>,<sfB>:<outB>[,...]

For each query with an oracleSql entry: run the SQL in DuckDB (tables
registered as views over <sfDir>/*.parquet), read the Spark result parquet,
sort columns by name, sort rows, and compare values exactly.

Round-15 close doctrine (round-14 verdict #6): the off-label tri-sf sweep
caught 5 real latent -0.0 oracle bugs at round-14 close that sf0.01 could
never surface, so sweeps are first-class: pass comma-separated sfDir:outDir
pairs (each outDir a graft.Verify dump at that sf) and every pair runs with
one summary + a combined exit code. The PINNED_SF001 rows carry sf0.01
model literals by doctrine (trainers stay live so drift flips them red at
the pin scale); at any OTHER sf they report `SKIP pinned-scale`, never
FAIL — an off-label sweep failing them would be reporting the tripwire as
a bug (round-14 advice #4).

Budget gate (round-14, after CORRECTNESS_r13 zeroed): the driver's compare
runs inside a ~600 s window, so this local replica enforces a 2x-margin
budget — any single oracle > PER_QUERY_BUDGET seconds or a total >
TOTAL_BUDGET seconds FAILS the gate even if every value matches. A slow
oracle is a broken oracle: a green query nobody can afford to check is not
a green query. Per-query wall time is printed on every line so a new
pathological oracle is visible the moment it lands.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

PER_QUERY_BUDGET = 10.0   # seconds; worst legitimate oracle ~8 s (v8)
TOTAL_BUDGET = 300.0      # seconds; half the driver's observed ~600 s window

# Oracles whose decision literals are PINNED at sf0.01 (live trainers +
# pinned models: drift flips them red AT THE PIN SCALE). At any other sf
# the mismatch is the designed scale coupling, not a bug — sweeps skip.
PINNED_SF001 = {"q_bpe_apply", "q_cluster_sizes", "q_ter_shift",
                "q_unigram_soft", "q_pq_topk", "q_pq_refined",
                # round-15 sketch pins (SketchPins.scala); q_image_dedup /
                # q_audio_dedup pins are sf-INDEPENDENT and not listed
                "q_minhash_lsh", "q_simhash",
                # per-lang stub-width sums pinned at sf0.01
                "q_media_features",
                # OutputPins.scala: training/sketch/deflate output pins +
                # the murmur3 partition routing of the packing replay
                "q_bpe_learn", "q_unigram_learn", "q_hll", "q_compression",
                "q_pack_shards"}
PIN_SCALE = "sf0.01"


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_ok = n_bad = n_skip = 0
    total_t = 0.0
    over_budget = []
    # EXACT token match, not substring (round-15 advice): 'sf0.015'
    # contains 'sf0.01' but is NOT the pin scale, and a dir named without
    # any sfX.YZ token (symlink 'small') cannot be assumed to be it either
    # — anything other than a basename exactly equal to PIN_SCALE treats
    # pinned rows as off-scale and skips them.
    off_pin_scale = sf_dir.rstrip("/").split("/")[-1] != PIN_SCALE
    for name, sql in sorted(oracle.items()):
        if off_pin_scale and name in PINNED_SF001:
            print(f"SKIP {name}: pinned-scale oracle ({PIN_SCALE} literals; "
                  f"this sweep is {sf_dir.rstrip('/').split('/')[-1]})")
            n_skip += 1
            continue
        t0 = time.monotonic()
        try:
            exp = norm(con.execute(sql).fetchdf())
            got = norm(con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf())
        except Exception as e:
            dt = time.monotonic() - t0
            total_t += dt
            print(f"FAIL {name} [{dt:.1f}s]: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        dt = time.monotonic() - t0
        total_t += dt
        if dt > PER_QUERY_BUDGET:
            over_budget.append((name, dt))
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name} [{dt:.1f}s]: columns exp={list(exp.columns)} got={list(got.columns)}")
            n_bad += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name} [{dt:.1f}s]: rows exp={len(exp)} got={len(got)}")
            n_bad += 1
            continue
        diff_cols = []
        for c in exp.columns:
            ev, gv = exp[c], got[c]
            # No pandas .equals short-circuit: numpy treats -0.0 == 0.0,
            # but the driver hashes string reprs, where they differ. Always
            # compare astype(str) so the local gate matches the driver's
            # (stricter) semantics for repr-level divergence.
            neq = (ev.astype(str) != gv.astype(str))
            if neq.any():
                i = neq.idxmax()
                diff_cols.append((c, int(neq.sum()), ev[i], gv[i]))
        if diff_cols:
            print(f"FAIL {name} [{dt:.1f}s]: value diffs {diff_cols[:3]}")
            n_bad += 1
        else:
            print(f"OK   {name} [{dt:.1f}s] ({len(exp)} rows)")
            n_ok += 1
    skip_note = f", {n_skip} pinned-scale skip" if n_skip else ""
    print(f"\n{n_ok} ok, {n_bad} fail{skip_note}, "
          f"{len(oracle)} oracled / {len(TABLES)} tables, "
          f"total {total_t:.1f}s")
    budget_bad = False
    for name, dt in over_budget:
        print(f"BUDGET FAIL {name}: {dt:.1f}s > {PER_QUERY_BUDGET:.0f}s per-query budget")
        budget_bad = True
    # total budget only meaningful on a full run (no `only` filter)
    if not only and total_t > TOTAL_BUDGET:
        print(f"BUDGET FAIL total: {total_t:.1f}s > {TOTAL_BUDGET:.0f}s suite budget")
        budget_bad = True
    if budget_bad:
        print("BUDGET GATE FAILED — materialize the offending oracle's "
              "multiply-referenced CTEs (see BASELINE.md, oracle-cost discipline)")
    return 1 if (n_bad or budget_bad) else 0


if __name__ == "__main__":
    if ":" in sys.argv[1]:  # sweep mode: sfA:outA,sfB:outB[,...]
        rc = 0
        for pair in sys.argv[1].split(","):
            sf, out = pair.split(":", 1)
            print(f"\n=== sweep {sf} -> {out} ===")
            rc |= main(sf, out, None)
        sys.exit(rc)
    only_arg = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only_arg))
