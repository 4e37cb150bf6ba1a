"""Minimal PCD reader (pypcd replacement for the converters).

Supports ascii and binary PCD v0.7 with the x/y/z/intensity(+extras) layout
TUMTraf uses. The reference shells out to pypcd (a9coop_converter.py:359-374)
and writes .bin rows (x, y, z, intensity/256, 0).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

_TYPEMAP = {
    ("F", 4): np.float32, ("F", 8): np.float64,
    ("I", 1): np.int8, ("I", 2): np.int16, ("I", 4): np.int32,
    ("U", 1): np.uint8, ("U", 2): np.uint16, ("U", 4): np.uint32,
}


def read_pcd(path: str) -> Dict[str, np.ndarray]:
    """Returns {field_name: (N,) array}."""
    with open(path, "rb") as f:
        header: Dict[str, List[str]] = {}
        while True:
            line = f.readline().decode("ascii", "ignore").strip()
            if not line or line.startswith("#"):
                continue
            key, *vals = line.split()
            header[key.upper()] = vals
            if key.upper() == "DATA":
                break
        fields = header["FIELDS"]
        sizes = [int(x) for x in header["SIZE"]]
        types = header["TYPE"]
        counts = [int(x) for x in header.get("COUNT", ["1"] * len(fields))]
        n = int(header["POINTS"][0])
        fmt = header["DATA"][0].lower()

        dtype_fields = []
        for name, t, s, c in zip(fields, types, sizes, counts):
            base = _TYPEMAP[(t, s)]
            if c == 1:
                dtype_fields.append((name, base))
            else:
                dtype_fields.append((name, base, (c,)))
        dt = np.dtype(dtype_fields)

        if fmt == "ascii":
            raw = np.loadtxt(f, dtype=np.float64, max_rows=n)
            out = {}
            col = 0
            for name, t, s, c in zip(fields, types, sizes, counts):
                out[name] = raw[:, col].astype(_TYPEMAP[(t, s)])
                col += c
            return out
        elif fmt == "binary":
            raw = np.frombuffer(f.read(dt.itemsize * n), dtype=dt, count=n)
            return {name: np.asarray(raw[name]) for name in fields}
        elif fmt == "binary_compressed":
            import lzf  # pragma: no cover - not in image
            raise NotImplementedError("binary_compressed PCD")
        raise ValueError(f"unknown PCD data format {fmt}")


def pcd_to_bin(pcd_path: str, bin_path: str) -> np.ndarray:
    """PCD -> (N, 5) float32 .bin rows (x, y, z, intensity/256, 0), the
    reference's save_lidar layout (a9coop_converter.py:359-374)."""
    data = read_pcd(pcd_path)
    n = len(data["x"])
    inten = data.get("intensity", np.zeros(n))
    out = np.stack([
        data["x"].astype(np.float32),
        data["y"].astype(np.float32),
        data["z"].astype(np.float32),
        (inten.astype(np.float32)) / 256.0,
        np.zeros(n, np.float32),
    ], axis=-1)
    out.astype(np.float32).tofile(bin_path)
    return out
