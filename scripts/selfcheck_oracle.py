"""Driver-style correctness self-check.

Mirrors the round driver's contract: import ``__ray_entry__`` by FILE PATH
(from whatever cwd), run every ``queries()`` entry at sf0.01, run the
matching ``oracle_sql()`` in DuckDB over the same parquet tables, compare
row count + schema + order-insensitive value hash. Queries without an
oracle get a rows-only check.

Usage:  python scripts/selfcheck_oracle.py [sf_dir] [query ...]
(default sf0.01, all queries; extra args restrict to the named queries)
Writes /tmp/selfcheck_oracle.json and prints one summary line per query.
"""

from __future__ import annotations

import hashlib
import importlib.util
import json
import os
import sys
import time
import traceback

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon_hash(df: pd.DataFrame) -> str:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            df[c] = col.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(col):
            df[c] = col.round(6).map(lambda v: f"{v:.6f}")
        else:
            df[c] = col.astype(str)
    rows = sorted(df.itertuples(index=False, name=None))
    h = hashlib.md5()
    for r in rows:
        h.update(("|".join(map(str, r)) + "\n").encode())
    return h.hexdigest()


def to_pandas(obj):
    if isinstance(obj, pd.DataFrame):
        return obj
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    raise TypeError(type(obj))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 16)),
                 include_dashboard=False)

    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", os.path.join(REPO, "__ray_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["__ray_entry__"] = mod
    spec.loader.exec_module(mod)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = mod.queries()
    oracles = mod.oracle_sql()
    if len(sys.argv) > 2:
        want = set(sys.argv[2:])
        unknown = want - set(qs)
        if unknown:
            print(f"unknown queries: {sorted(unknown)}", file=sys.stderr)
            return 2
        qs = {k: v for k, v in qs.items() if k in want}
    results = {}
    n_pass = n_fail = 0
    for name, fn in qs.items():
        t0 = time.time()
        rec: dict = {"query": name}
        try:
            ours = to_pandas(fn(sf_dir))
            rec["rows"] = len(ours)
            rec["cols"] = sorted(ours.columns)
            if name in oracles:
                ref = con.execute(oracles[name]).df()
                rec["oracle_rows"] = len(ref)
                rec["oracle_cols"] = sorted(ref.columns)
                ok = (len(ours) == len(ref)
                      and sorted(ours.columns) == sorted(ref.columns)
                      and canon_hash(ours) == canon_hash(ref))
                rec["match"] = bool(ok)
                rec["status"] = "pass" if ok else "HASH-MISMATCH"
            else:
                rec["status"] = "rows-only pass" if len(ours) >= 0 else "empty"
            n_pass += 1 if "pass" in rec["status"] else 0
            n_fail += 0 if "pass" in rec["status"] else 1
        except Exception as e:  # noqa: BLE001
            rec["status"] = "ERROR"
            rec["error"] = f"{type(e).__name__}: {e}"
            rec["trace"] = traceback.format_exc()[-2000:]
            n_fail += 1
        rec["sec"] = round(time.time() - t0, 2)
        results[name] = rec
        print(f"{name:28s} {rec['status']:16s} rows={rec.get('rows', '-'):>7} "
              f"{rec['sec']:6.1f}s", flush=True)

    summary = {"pass": n_pass, "fail": n_fail, "total": len(qs),
               "sf_dir": sf_dir, "results": results}
    with open("/tmp/selfcheck_oracle.json", "w") as f:
        json.dump(summary, f, indent=1, default=str)
    print(f"\n{n_pass}/{len(qs)} pass, {n_fail} fail -> /tmp/selfcheck_oracle.json")
    ray.shutdown()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
