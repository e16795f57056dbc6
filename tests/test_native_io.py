"""Native (C++) I/O module parity tests vs the pure-Python reader."""
import os

import numpy as np
import pytest

import conftest
from pisces_tpu.io import bgzf
from pisces_tpu.io.bam import BamReader
from pisces_tpu.io import native

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native library not built")

BAMS = ["PhiX_S3.bam", "Bcereus_S4.bam", "Chr17Chr19.bam", "small_S1.bam"]


@pytest.mark.parametrize("name", BAMS)
def test_native_matches_python(name):
    path = conftest.shared_bam(name)
    nb = native.NativeBamReader(path)
    pb = BamReader(path)
    assert nb.header.ref_names == pb.header.ref_names
    assert nb.header.ref_lengths == pb.header.ref_lengths
    b1 = nb.fetch(None)
    b2 = pb.fetch(None)
    assert b1.n == b2.n
    for f in ("ref_id", "pos", "mapq", "flag", "cigar_off", "cigar_ops",
              "cigar_lens", "seq_off", "seq", "qual", "end_pos"):
        np.testing.assert_array_equal(getattr(b1, f), getattr(b2, f),
                                      err_msg=f"{name}:{f}")


def test_native_per_chromosome_fetch():
    path = conftest.shared_bam("Chr17Chr19.bam")
    nb = native.NativeBamReader(path)
    pb = BamReader(path)
    for rid in range(len(nb.header.ref_names)):
        b1 = nb.fetch(rid)
        b2 = pb.fetch(rid)
        assert b1.n == b2.n
        np.testing.assert_array_equal(b1.pos, b2.pos)
        np.testing.assert_array_equal(b1.seq, b2.seq)


def test_native_bgzf_roundtrip(tmp_path):
    lib = native.get_lib()
    payload = os.urandom(300000) + b"x" * 100000
    compressed = bgzf.compress(payload)
    import ctypes
    n = len(compressed)
    buf = (ctypes.c_uint8 * n).from_buffer_copy(compressed)
    lib.bgzf_decompress_size.restype = ctypes.c_int64
    size = lib.bgzf_decompress_size(buf, n)
    assert size == len(payload)
    out = (ctypes.c_uint8 * size)()
    rc = lib.bgzf_decompress(buf, n, out, size, 4)
    assert rc == 0
    assert bytes(out) == payload
