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


def test_parallel_bgzf_writer_matches_streaming(tmp_path):
    """The multithreaded BGZF writer path (BamWriterMultithreaded
    counterpart) produces byte-identical BAM + .bai to the streaming
    writer."""
    import numpy as np
    from pisces_tpu.io.native import get_lib
    if get_lib() is None:
        import pytest
        pytest.skip("native library unavailable")
    from pisces_tpu.io.bam_write import BamRecord, BamWriter, parse_cigar_string

    rng = np.random.default_rng(7)
    def build(path):
        w = BamWriter(str(path), ["chr1", "chr2"], [100000, 50000])
        cig = parse_cigar_string("50M")
        for i in range(5000):
            p = int(rng.integers(0, 90000))
            seq = "".join("ACGT"[b] for b in rng.integers(0, 4, 50))
            w.add(BamRecord(f"r{i}", i % 2, p, 60, 0x10 if i & 1 else 0,
                            cig, seq, [30] * 50))
        return w

    rng = np.random.default_rng(7)
    w1 = build(tmp_path / "a.bam")
    w1._write_parallel_disabled = True
    # force streaming path by monkeypatching
    orig = BamWriter._write_parallel
    BamWriter._write_parallel = lambda self, b: False
    try:
        w1.write(sort=True, index=True)
    finally:
        BamWriter._write_parallel = orig
    rng = np.random.default_rng(7)
    w2 = build(tmp_path / "b.bam")
    w2.write(sort=True, index=True)

    a = open(tmp_path / "a.bam", "rb").read()
    b = open(tmp_path / "b.bam", "rb").read()
    assert a == b
    assert (open(tmp_path / "a.bam.bai", "rb").read()
            == open(tmp_path / "b.bam.bai", "rb").read())


def test_cat_bams_merges_shards_byte_level(tmp_path):
    """cat_bams (samtools-cat analog) concatenates shard record bytes
    verbatim, and its rebuilt .bai serves indexed region queries."""
    import numpy as np
    from pisces_tpu.io.bam import BamReader
    from pisces_tpu.io.bam_write import (
        BamRecord, BamWriter, cat_bams, parse_cigar_string,
    )

    refs = (["chr1", "chr2"], [200000, 100000])
    cig = parse_cigar_string("50M")
    rng = np.random.default_rng(3)

    def shard(path, ref_id, n, tags=None):
        w = BamWriter(str(path), *refs)
        for i in range(n):
            p = int(rng.integers(0, 150000 if ref_id == 0 else 60000))
            seq = "".join("ACGT"[b] for b in rng.integers(0, 4, 50))
            w.add(BamRecord(f"c{ref_id}r{i}", ref_id, p, 60, 0, cig, seq,
                            [30] * 50, tags=tags))
        w.write(sort=True)
        return str(path)

    s1 = shard(tmp_path / "s1.bam", 0, 400, tags={"XD": "50F"})
    s2 = shard(tmp_path / "s2.bam", 1, 300)
    out = cat_bams([s1, s2], str(tmp_path / "m.bam"), *refs)

    m = BamReader(out).fetch(parse_tags=True)
    assert m.n == 700
    assert np.all(m.ref_id[:400] == 0) and np.all(m.ref_id[400:] == 1)
    # tags survive verbatim (the object-path merge used to re-encode)
    assert m.xd_tags[0] == "50F"
    # the rebuilt .bai answers region queries
    lazy = BamReader(out, lazy=True)
    region = lazy.fetch_region(0, 50000, 100000)
    expect = np.count_nonzero((m.ref_id == 0) & (m.end_pos >= 50000)
                              & (m.pos < 100000))
    got = np.count_nonzero((region.end_pos >= 50000) & (region.pos < 100000)
                           & (region.ref_id == 0))
    assert got == expect and expect > 0


def test_native_pos_tuples_match_counts(tmp_path):
    """The C++ per-position scoring tuples equal a recomputation from the
    dense count tensor (sup/cov by direction + N total)."""
    import numpy as np
    from pisces_tpu.io.native import open_bam, native_pileup, get_lib
    if get_lib() is None:
        import pytest
        pytest.skip("native library unavailable")
    import conftest
    import os
    from pisces_tpu.io.fasta import Genome
    from pisces_tpu.io.bam import filter_batch
    from pisces_tpu.domain.types import BASE_TO_ALLELE

    bam = open_bam(conftest.shared_bam("PhiX_S3.bam"))
    gdir = os.path.join(conftest.shared_genome("PhiX"), "WholeGenomeFasta")
    chrom = Genome(gdir).get_chr_reference("phix")
    batch = bam.fetch(ref_id=0)
    keep = filter_batch(batch, 1, True, False)
    pc, mm = native_pileup(bam, keep, 20, 5, 1000, None, None,
                           ref_codes=BASE_TO_ALLELE[chrom.sequence])
    assert pc.pos_tuples is not None
    nb = len(pc.block_keys)
    c = pc.counts_t.reshape(nb * 1000, 6, 3)
    positions = ((pc.block_keys[:, None] - 1) * 1000
                 + np.arange(1000)[None, :] + 1).reshape(-1)
    in_ref = positions <= len(chrom.sequence)
    rc = np.where(in_ref, BASE_TO_ALLELE[
        chrom.sequence[np.minimum(positions, len(chrom.sequence)) - 1]], -1)
    cov = c[:, [0, 1, 2, 3, 5], :].sum(axis=1)
    sup = np.where(rc[:, None] >= 0,
                   c[np.arange(len(c)), np.maximum(rc, 0), :], 0)
    n_tot = c[:, 4, :].sum(axis=1)
    assert np.array_equal(pc.pos_tuples[:, :3], sup)
    assert np.array_equal(pc.pos_tuples[:, 3:6], cov)
    assert np.array_equal(pc.pos_tuples[:, 6], n_tot)


@pytest.mark.parametrize("name", BAMS + ["../../Pisces.Tests/TestData/collapsed.test.stitched.bam"])
def test_native_tag_decode_matches_python(name):
    """Typed tag decode (XD/XN/XR/XU strings, XV/XW ints — TagUtils analog)
    must produce exactly the Python reader's xd/xn/extra tag lists."""
    path = conftest.shared_bam(name) if not name.startswith("..") else \
        os.path.normpath(os.path.join(conftest.SHARED_BAMS, name))
    nb = native.NativeBamReader(path)
    pb = BamReader(path)
    b1 = nb.fetch(None, parse_tags=True)
    b2 = pb.fetch(None, parse_tags=True)
    assert b1.n == b2.n
    assert b1.xd_tags == b2.xd_tags
    assert b1.xn_tags == b2.xn_tags
    assert b1.extra_tags == b2.extra_tags


@pytest.mark.parametrize("name", ["Chr17Chr19.bam", "Bcereus_S4.bam"])
def test_native_lazy_region_fetch_matches_python(name):
    """Lazy .bai region fetch (C++ chunk inflate + overlap filter) returns
    exactly the Python lazy reader's region batch."""
    path = conftest.shared_bam(name)
    nb = native.NativeBamReader(path, lazy=True)
    pb = BamReader(path, lazy=True)
    length = pb.header.ref_lengths[0]
    for rid in range(len(pb.header.ref_names)):
        for beg, end in ((0, 1000), (1000, 5000), (0, length),
                         (length // 2, length // 2 + 2500)):
            b1 = nb.fetch_region(rid, beg, end, parse_tags=True)
            b2 = pb.fetch_region(rid, beg, end, parse_tags=True)
            assert b1.n == b2.n, (name, rid, beg, end)
            for f in ("ref_id", "pos", "end_pos", "mapq", "flag",
                      "cigar_ops", "cigar_lens", "seq", "qual"):
                np.testing.assert_array_equal(
                    getattr(b1, f), getattr(b2, f),
                    err_msg=f"{name}:{rid}:{beg}-{end}:{f}")
            assert b1.xd_tags == b2.xd_tags
            assert b1.extra_tags == b2.extra_tags
