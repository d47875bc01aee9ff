"""Local replica of the driver's correctness gate: runs every queries()
entry at sf0.01 and compares row-count / schema / order-insensitive value
hash against oracle_sql() via DuckDB. Queries with no SQL oracle are
checked against pinned GOLDENS (frozen row-count + value hash per sf dir,
stored in tools/goldens_<sf>.json) so regressions in the non-SQL-expressible
pipelines are visible in this gate too, not just in pytest. Usage:

    python tools/check_oracles.py [sf_dir]              # check
    python tools/check_oracles.py --update-goldens [sf_dir]  # re-pin
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    df = df[sorted(df.columns)]
    rows = sorted(
        tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None)
    )
    return hashlib.sha1(repr(rows).encode()).hexdigest()[:16]


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--update-goldens"]
    update_goldens = "--update-goldens" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    golden_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"goldens_{os.path.basename(sf_dir.rstrip('/'))}.json",
    )
    goldens: dict = {}
    if os.path.exists(golden_path):
        with open(golden_path) as f:
            goldens = json.load(f)
    import ray

    ray.init(
        address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR"
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        t0 = time.monotonic()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: query raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        wall = time.monotonic() - t0
        if name not in oracles:
            h = value_hash(mine)
            if update_goldens:
                goldens[name] = {"rows": len(mine), "hash": h}
                print(f"PIN  {name}: {len(mine)} rows, hash {h}, {wall:.1f}s")
            elif name in goldens:
                g = goldens[name]
                if g["rows"] != len(mine) or g["hash"] != h:
                    print(
                        f"FAIL {name}: golden mismatch "
                        f"(rows {len(mine)} vs {g['rows']}, "
                        f"hash {h} vs {g['hash']})"
                    )
                    failures += 1
                else:
                    print(
                        f"GOLDEN {name}: {len(mine)} rows match pinned "
                        f"golden, {wall:.1f}s"
                    )
            else:
                print(
                    f"ok   {name}: rows-only (NO GOLDEN PINNED), "
                    f"{len(mine)} rows, {wall:.1f}s"
                )
            continue
        want = con.sql(oracles[name]).df()
        msgs = []
        if len(mine) != len(want):
            msgs.append(f"rows {len(mine)} != {len(want)}")
        if sorted(mine.columns) != sorted(want.columns):
            msgs.append(f"cols {sorted(mine.columns)} != {sorted(want.columns)}")
        elif value_hash(mine) != value_hash(want):
            msgs.append("value hash mismatch")
        if msgs:
            print(f"FAIL {name}: {'; '.join(msgs)}")
            failures += 1
        else:
            print(f"OK   {name}: {len(mine)} rows match oracle, {wall:.1f}s")
    if update_goldens:
        with open(golden_path, "w") as f:
            json.dump(goldens, f, indent=1, sort_keys=True)
        print(f"wrote {golden_path} ({len(goldens)} goldens)")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
