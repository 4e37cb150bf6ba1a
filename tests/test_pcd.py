"""PCD reader tests: ascii / binary / binary_compressed parity.

The reference reads all three encodings through pypcd
(a9coop_converter.py:359-374); real TUMTraf archives ship
binary_compressed clouds, so the lzf path must decode them.
"""
import numpy as np
import pytest

from cmtcoop_tpu.data.converters.pcd import (
    lzf_compress_literal,
    lzf_decompress,
    pcd_to_bin,
    read_pcd,
)


def _cloud(n=257, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "x": rng.normal(size=n).astype(np.float32),
        "y": rng.normal(size=n).astype(np.float32),
        "z": rng.normal(size=n).astype(np.float32),
        "intensity": rng.uniform(0, 255, size=n).astype(np.float32),
    }


def _header(n, fmt):
    return (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\nFIELDS x y z intensity\nSIZE 4 4 4 4\n"
        "TYPE F F F F\nCOUNT 1 1 1 1\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
        f"POINTS {n}\nDATA {fmt}\n"
    ).encode("ascii")


def _write_ascii(path, c):
    rows = np.stack([c["x"], c["y"], c["z"], c["intensity"]], -1)
    with open(path, "wb") as f:
        f.write(_header(len(c["x"]), "ascii"))
        np.savetxt(f, rows, fmt="%.9g")


def _write_binary(path, c):
    n = len(c["x"])
    rec = np.zeros(n, dtype=[(k, np.float32) for k in c])
    for k in c:
        rec[k] = c[k]
    with open(path, "wb") as f:
        f.write(_header(n, "binary"))
        f.write(rec.tobytes())


def _write_binary_compressed(path, c):
    # field-major (SoA) payload, lzf stream, uint32 sizes prefix
    buf = b"".join(c[k].tobytes() for k in ("x", "y", "z", "intensity"))
    comp = lzf_compress_literal(buf)
    with open(path, "wb") as f:
        f.write(_header(len(c["x"]), "binary_compressed"))
        f.write(np.array([len(comp), len(buf)], np.uint32).tobytes())
        f.write(comp)


def test_lzf_roundtrip_literal():
    rng = np.random.default_rng(1)
    raw = rng.integers(0, 256, size=1000, dtype=np.uint8).tobytes()
    assert lzf_decompress(lzf_compress_literal(raw), len(raw)) == raw


def test_lzf_backreference_and_overlap():
    # hand-built stream: literal "abc" then a back-ref of length 6 at
    # distance 3 (overlapping copy -> "abcabcabc")
    stream = bytes([0x02]) + b"abc" + bytes([(4 << 5) | 0x00, 0x02])
    assert lzf_decompress(stream, 9) == b"abcabcabc"


def test_lzf_long_match_extension_byte():
    # length field 7 -> extension byte; match of 7+3+2=12 bytes at dist 1
    stream = bytes([0x00]) + b"q" + bytes([(7 << 5) | 0x00, 0x03, 0x00])
    assert lzf_decompress(stream, 13) == b"q" * 13


def test_lzf_corrupt_backref_raises():
    stream = bytes([(4 << 5) | 0x00, 0x02])  # back-ref with empty window
    with pytest.raises(ValueError):
        lzf_decompress(stream, 6)


def test_pcd_three_encodings_parity(tmp_path):
    c = _cloud()
    paths = {}
    for fmt, writer in (
        ("ascii", _write_ascii),
        ("binary", _write_binary),
        ("binary_compressed", _write_binary_compressed),
    ):
        p = tmp_path / f"cloud_{fmt}.pcd"
        writer(str(p), c)
        paths[fmt] = p

    ref = read_pcd(str(paths["ascii"]))
    for fmt in ("binary", "binary_compressed"):
        got = read_pcd(str(paths[fmt]))
        for k in c:
            np.testing.assert_allclose(got[k], ref[k], rtol=1e-6, atol=1e-7)


def test_pcd_to_bin_compressed(tmp_path):
    c = _cloud(64, seed=3)
    p = tmp_path / "c.pcd"
    _write_binary_compressed(str(p), c)
    out = pcd_to_bin(str(p), str(tmp_path / "c.bin"))
    assert out.shape == (64, 5)
    np.testing.assert_allclose(out[:, 3], c["intensity"] / 256.0, rtol=1e-6)
    raw = np.fromfile(tmp_path / "c.bin", np.float32).reshape(-1, 5)
    np.testing.assert_array_equal(raw, out.astype(np.float32))
