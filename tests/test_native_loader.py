"""Native C++ frame loader: PNM decode + prefetch ring."""

import numpy as np
import pytest

from openvo_tpu.io.native_loader import FrameLoader, decode_pnm, write_pgm


def test_decode_pgm_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(48, 64), dtype=np.uint8)
    p = str(tmp_path / "a.pgm")
    write_pgm(p, img)
    with open(p, "rb") as f:
        out = decode_pnm(f.read())
    np.testing.assert_array_equal(out, img)


def test_decode_ppm_with_comments():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    buf = b"P6\n# a comment\n7 5\n# another\n255\n" + img.tobytes()
    out = decode_pnm(buf)
    np.testing.assert_array_equal(out, img)


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        decode_pnm(b"JUNKJUNKJUNKJUNK")
    with pytest.raises(ValueError):
        decode_pnm(b"P5\n10 10\n255\nshort")  # truncated payload


def test_frame_loader_streams_in_order(tmp_path):
    rng = np.random.default_rng(2)
    paths = []
    imgs = []
    for i in range(9):
        img = rng.integers(0, 256, size=(32, 40), dtype=np.uint8)
        p = str(tmp_path / f"f{i:03d}.pgm")
        write_pgm(p, img)
        paths.append(p)
        imgs.append(img)
    loader = FrameLoader(paths, ring_capacity=3)
    got = list(loader)
    assert len(got) == 9
    for a, b in zip(got, imgs):
        np.testing.assert_array_equal(a, b)
    loader.close()


def test_frame_loader_bad_file_raises(tmp_path):
    p = str(tmp_path / "bad.pgm")
    with open(p, "wb") as f:
        f.write(b"not a pnm at all")
    loader = FrameLoader([p])
    with pytest.raises(ValueError):
        next(loader)
    loader.close()
