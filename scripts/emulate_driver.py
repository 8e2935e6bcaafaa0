"""Driver emulation at arbitrary sf: run selected __ray_entry__ queries
against their DuckDB oracles (rows + schema + value compare, mirroring
CORRECTNESS_r{N}.json) with per-query timings, so reordering queries()
never puts an unvetted entry in front of the driver.

Usage:
    python scripts/emulate_driver.py [--sf /root/testdata/sf0.01] [names...]

With no names: every oracled query. Prints one line per query and a
JSON summary at the end.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import pandas as pd

# python scripts/emulate_driver.py puts scripts/ (not the repo root) on
# sys.path; the repo root is where __ray_entry__ and the package live
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _to_pandas(result):
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    import ray

    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "16")),
             include_dashboard=False, ignore_reinit_error=True,
             logging_level="ERROR", log_to_driver=False)

    import __ray_entry__ as entry

    qs = entry.queries()
    sql = entry.oracle_sql()
    names = args or [k for k in qs if k in sql]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    results = {}
    for name in names:
        t0 = time.time()
        status = "PASS"
        detail = ""
        try:
            ray_df = _normalize(_to_pandas(qs[name](sf_dir)))
            t_ray = time.time() - t0
            t1 = time.time()
            if name in sql:
                # driver-comparator discipline: the driver's value hash
                # distinguishes bool True from BIGINT 1 (webtext_clean
                # failed r4 exactly this way) and null from ''. The
                # lenient assert_frame_equal below masks both, so fail
                # them explicitly here.
                bool_cols = [c for c in ray_df.columns
                             if pd.api.types.is_bool_dtype(ray_df[c])]
                if bool_cols:
                    results[name] = {
                        "status": "BOOL_COLS", "detail": str(bool_cols),
                        "rows": len(ray_df),
                        "t_ray": round(t_ray, 2), "t_sql": 0.0,
                    }
                    r = results[name]
                    print(f"{name:32s} {r['status']:9s} rows={r['rows']:>7} "
                          f"ray={r['t_ray']:>6.2f}s sql={r['t_sql']:>6.2f}s "
                          f"{r['detail'][:80]}", file=sys.stderr, flush=True)
                    continue
                sql_df = _normalize(con.execute(sql[name]).df())
                t_sql = time.time() - t1
                if list(ray_df.columns) != list(sql_df.columns):
                    status, detail = "SCHEMA", f"{list(ray_df.columns)} != {list(sql_df.columns)}"
                elif len(ray_df) != len(sql_df):
                    status, detail = "ROWS", f"{len(ray_df)} != {len(sql_df)}"
                else:
                    try:
                        pd.testing.assert_frame_equal(
                            ray_df, sql_df, check_dtype=False,
                            check_exact=False, rtol=1e-9, atol=1e-9)
                    except AssertionError as exc:
                        status, detail = "VALUES", str(exc).splitlines()[0]
            else:
                t_sql = 0.0
                status = "ROWS_ONLY"
            results[name] = {
                "status": status, "detail": detail,
                "rows": len(ray_df),
                "t_ray": round(t_ray, 2), "t_sql": round(t_sql, 2),
            }
        except Exception as exc:  # noqa: BLE001 — survey harness
            results[name] = {
                "status": "ERROR", "detail": f"{type(exc).__name__}: {exc}"[:200],
                "rows": -1, "t_ray": round(time.time() - t0, 2), "t_sql": 0.0,
            }
        r = results[name]
        print(f"{name:32s} {r['status']:9s} rows={r['rows']:>7} "
              f"ray={r['t_ray']:>6.2f}s sql={r['t_sql']:>6.2f}s {r['detail'][:80]}",
              file=sys.stderr, flush=True)

    n_pass = sum(1 for r in results.values() if r["status"] == "PASS")
    print(json.dumps({"sf": sf_dir, "n": len(results), "pass": n_pass,
                      "fail": [k for k, r in results.items()
                               if r["status"] not in ("PASS", "ROWS_ONLY")],
                      "results": results}))
    ray.shutdown()
    return 0 if n_pass + sum(1 for r in results.values()
                             if r["status"] == "ROWS_ONLY") == len(results) else 1


if __name__ == "__main__":
    sys.exit(main())
