"""Shard the sf0.1 testdata into multi-file tables.

Every shipped table is ONE parquet file, so every scan is one input
split — multi-split behavior (parallel scans, per-file footers,
``fan_out``'s no-op path, split-respecting DuckDB oracles) is never
exercised.  This script rewrites each table as a DIRECTORY of ~32 part
files via pyarrow row-slicing: values, row order (per concatenated
read), and timestamp encodings stay bit-identical to the source — no
engine round-trip, no tz reinterpretation.

Usage: python scripts/gen_sharded.py [src_sf_dir] [dest_dir] [n_shards]
Defaults: /root/testdata/sf0.1 → /tmp/mrfs_sf0.1_sharded, 32 shards.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from map_reduce_framework_spark.sources.tables import TABLES  # noqa: E402


def main() -> None:
    import pyarrow.parquet as pq

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dest = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mrfs_sf0.1_sharded"
    n_shards = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    os.makedirs(dest, exist_ok=True)
    for name in TABLES:
        table = pq.read_table(os.path.join(src, f"{name}.parquet"))
        out_dir = os.path.join(dest, f"{name}.parquet")
        if os.path.exists(out_dir):
            shutil.rmtree(out_dir)
        os.makedirs(out_dir)
        n = table.num_rows
        shards = min(n_shards, max(n, 1))
        per = (n + shards - 1) // shards
        written = 0
        for i in range(shards):
            chunk = table.slice(i * per, per)
            if chunk.num_rows == 0:
                break
            pq.write_table(
                chunk, os.path.join(out_dir, f"part-{i:05d}.parquet")
            )
            written += 1
        print(f"{name}: {n} rows -> {written} files")


if __name__ == "__main__":
    main()
