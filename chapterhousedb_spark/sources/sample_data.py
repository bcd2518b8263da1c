"""Generator for the reference's sample fixture family.

Reproduces the datasets written by the reference's create_sample_data
binary (reference src/bin/create_sample_data.rs:113-230): schema
`id int32 (sequential), value1 utf8 (random lowercase, fixed length),
value2 float32 (uniform [0, 100))`, split into fixed-size parquet files
(create_sample_data.rs:165-169 for the schema, 135-155/113-133 for the
per-dataset row counts and file sizes). Deterministic via numpy seed.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# name -> (rows, value1 length, rows per file)  [create_sample_data.rs:113-155]
SPECS: dict[str, tuple[int, int, int]] = {
    "simple": (100, 8, 33),
    "simple_wide_string": (100, 100, 33),
    "large_simple": (10_000, 8, 1_000),
    "huge_simple": (1_000_000, 8, 10_000),
}


def generate_sample_data(
    base_dir: str, datasets: list[str] | None = None, seed: int = 42
) -> str:
    """Write each dataset under `<base_dir>/<name>/data_<i>.parquet`."""
    rng = np.random.default_rng(seed)
    for name in datasets or list(SPECS):
        n, slen, per_file = SPECS[name]
        ids = np.arange(n, dtype=np.int32)
        letters = rng.integers(97, 123, size=(n, slen), dtype=np.uint8)
        value1 = letters.view(f"S{slen}").ravel().astype(f"U{slen}")
        value2 = (rng.random(n, dtype=np.float32) * 100).astype(np.float32)
        d = os.path.join(base_dir, name)
        os.makedirs(d, exist_ok=True)
        for fi, start in enumerate(range(0, n, per_file)):
            sl = slice(start, min(start + per_file, n))
            table = pa.table(
                {
                    "id": pa.array(ids[sl], pa.int32()),
                    "value1": pa.array(value1[sl], pa.string()),
                    "value2": pa.array(value2[sl], pa.float32()),
                }
            )
            pq.write_table(table, os.path.join(d, f"data_{fi}.parquet"))
    return base_dir
