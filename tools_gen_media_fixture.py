"""Deterministic binary-media fixture generator.

Writes ``fixtures/media_blobs.parquet``: 64 rows of (media_id BIGINT,
payload BLOB) where each payload is a BMP-like fixed-layout header
followed by pixel bytes — the fixture behind the
``multimodal_header_parse`` query entry, which parses these headers
ENTIRELY JVM-side (hex slicing + conv; no Python in the decode path)
and is oracle-checked against DuckDB blob functions over this same
file. Keeping generation out of the query plan means the parser is
exercised on bytes it did not construct.

Layout (little-endian, 14-byte header):

    bytes  1-2   magic        "BM" (rows 60-63 carry "XX" — corrupt)
    bytes  3-6   width        uint32 LE
    bytes  7-10  height       uint32 LE
    bytes 11-12  bit depth    uint16 LE
    bytes 13-14  frame count  uint16 LE
    bytes 15-    pixel bytes  (id*31 + i*7) % 256, i = 0..n_pix-1

All field values are pure functions of media_id (below), so tests can
recompute ground truth without reading this file. Re-running this
script is byte-stable.

Run: ``python tools_gen_media_fixture.py`` (from the repo root).
"""

from __future__ import annotations

import os
import struct

N_ROWS = 64
N_CORRUPT = 4  # last 4 rows get a bad magic


def row_fields(media_id: int) -> dict:
    """Ground-truth header fields for a media_id (shared with tests)."""
    return {
        "magic": b"XX" if media_id >= N_ROWS - N_CORRUPT else b"BM",
        "width": 16 + (media_id * 7) % 240,
        "height": 16 + (media_id * 13) % 180,
        "depth": (8, 16, 24, 32)[media_id % 4],
        "n_frames": 1 + media_id % 5,
        "n_pix": 8 + media_id % 17,
    }


def payload_bytes(media_id: int) -> bytes:
    f = row_fields(media_id)
    header = f["magic"] + struct.pack(
        "<IIHH", f["width"], f["height"], f["depth"], f["n_frames"]
    )
    pixels = bytes((media_id * 31 + i * 7) % 256 for i in range(f["n_pix"]))
    return header + pixels


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")
    os.makedirs(out_dir, exist_ok=True)
    table = pa.table(
        {
            "media_id": pa.array(range(N_ROWS), pa.int64()),
            "payload": pa.array(
                [payload_bytes(i) for i in range(N_ROWS)], pa.binary()
            ),
        }
    )
    pq.write_table(
        table, os.path.join(out_dir, "media_blobs.parquet"), compression="snappy"
    )
    print(f"wrote {out_dir}/media_blobs.parquet ({N_ROWS} rows)")


if __name__ == "__main__":
    main()
