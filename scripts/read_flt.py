#!/usr/bin/env python
"""Parse raw TomoSAR FLT binaries into xyz .npy arrays.

Capability parity: reference scripts/read_flt.py:9-44 — 8 x int32 header,
float32 records, endianness detected from a sane header range, 1-D (records of
`width` floats) and 3-D (x/y/z triplet records) variants.
"""

from __future__ import annotations

import argparse
import struct

import numpy as np

HEADER_INTS = 8


def _detect_endianness(buf: bytes) -> str:
    for e in ("<", ">"):
        vals = struct.unpack_from(e + "i" * HEADER_INTS, buf, 0)
        if all(0 <= v < 10 ** 8 for v in vals):
            return e
    raise ValueError("Cannot detect FLT endianness (header out of range)")


def read_flt_1d(path: str) -> np.ndarray:
    """Read a single-band FLT: header [.., n_rows, n_cols, ..] then float32 rows."""
    with open(path, "rb") as f:
        buf = f.read()
    e = _detect_endianness(buf)
    header = struct.unpack_from(e + "i" * HEADER_INTS, buf, 0)
    n_rows, n_cols = header[1], header[2]
    data = np.frombuffer(buf, dtype=e + "f4", offset=HEADER_INTS * 4,
                         count=n_rows * n_cols)
    return data.reshape(n_rows, n_cols).astype(np.float32)


def read_flt_3d(path: str) -> np.ndarray:
    """Read an xyz FLT: float32 records of (x, y, z) after the int32 header."""
    with open(path, "rb") as f:
        buf = f.read()
    e = _detect_endianness(buf)
    n = (len(buf) - HEADER_INTS * 4) // (3 * 4)
    data = np.frombuffer(buf, dtype=e + "f4", offset=HEADER_INTS * 4, count=3 * n)
    return data.reshape(n, 3).astype(np.float64)


def write_flt_3d(path: str, points: np.ndarray):
    """Writer counterpart (for fixtures): little-endian header + xyz float32."""
    pts = np.asarray(points, dtype="<f4")
    header = struct.pack("<" + "i" * HEADER_INTS, 1, pts.shape[0], 3, 0, 0, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(header)
        f.write(pts.tobytes())


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("output", help=".npy output")
    ap.add_argument("--mode", choices=["1d", "3d"], default="3d")
    a = ap.parse_args()
    arr = read_flt_3d(a.input) if a.mode == "3d" else read_flt_1d(a.input)
    np.save(a.output, arr)
    print(f"{a.input}: {arr.shape} -> {a.output}")
