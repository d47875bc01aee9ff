"""Local replica of the driver's correctness gate: runs every queries()
entry at sf0.01 and compares row-count / schema / order-insensitive value
hash against oracle_sql() via DuckDB. Usage:

    python tools/check_oracles.py [sf_dir]
"""

from __future__ import annotations

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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
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
            print(f"ok   {name}: rows-only, {len(mine)} rows, {wall:.1f}s")
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
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
