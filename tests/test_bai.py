"""BAM .bai index tests: SAMv1 binning math, reading indexes shipped with
the reference test BAMs (produced by samtools — interoperability check),
indexed region fetch vs full-decode masking, and write-side index building
(reference: Alignment.IO BamIndex/BamReader.Jump, BamIndex.cs:1-697)."""
import os

import numpy as np
import pytest

import conftest
from pisces_tpu.io.bai import BaiBuilder, read_bai, reg2bin, reg2bins, write_bai
from pisces_tpu.io.bam import BamReader, subset_batch
from pisces_tpu.io.bam_write import BamRecord, BamWriter, parse_cigar_string


class TestBinning:
    def test_reg2bin_levels(self):
        assert reg2bin(0, 1) == 4681            # first 16kb bin
        assert reg2bin(0, 1 << 14) == 4681
        assert reg2bin(0, (1 << 14) + 1) == 585  # spills to 128kb level
        assert reg2bin(1 << 14, (1 << 14) + 1) == 4682
        assert reg2bin(0, 1 << 29) == 0          # whole-axis bin

    def test_reg2bins_contains_reg2bin(self):
        rng = np.random.default_rng(0)
        for _ in range(200):
            beg = int(rng.integers(0, 1 << 28))
            end = beg + int(rng.integers(1, 1 << 16))
            assert reg2bin(beg, end) in reg2bins(beg, end)


def _mapped(batch):
    return subset_batch(batch, (batch.flag & 0x4) == 0)


@pytest.mark.parametrize("bam_name", ["Chr17Chr19.bam", "Bcereus_S4.bam"])
def test_shipped_bai_region_fetch(bam_name):
    """Indexes written by samtools are read correctly: lazy indexed region
    fetch returns exactly the mapped reads a full decode + overlap mask
    does, per chromosome and for narrow windows."""
    path = conftest.shared_bam(bam_name)
    eager = BamReader(path)
    lazy = BamReader(path, lazy=True)
    assert lazy.index() is not None
    for ref_id, _name in enumerate(eager.header.ref_names):
        full = _mapped(eager.fetch(ref_id, parse_tags=True))
        if full.n == 0:
            continue
        lo, hi = int(full.pos.min()), int(full.end_pos.max()) + 1
        got = _mapped(lazy.fetch_region(ref_id, lo, hi, parse_tags=True))
        assert got.n == full.n
        for fld in ("pos", "flag", "mapq", "end_pos", "seq", "qual",
                    "cigar_ops", "cigar_lens"):
            assert np.array_equal(getattr(got, fld), getattr(full, fld)), fld
        assert got.xd_tags == full.xd_tags
        mid = (lo + hi) // 2
        b0, e0 = max(lo, mid - 400), mid + 400
        got_w = _mapped(lazy.fetch_region(ref_id, b0, e0))
        exp_w = subset_batch(full, (full.pos < e0) & (full.end_pos >= b0))
        assert got_w.n == exp_w.n
        assert np.array_equal(got_w.pos, exp_w.pos)
        assert np.array_equal(got_w.seq, exp_w.seq)


def test_write_index_roundtrip(tmp_path):
    """BamWriter(index=True) emits a .bai our reader can jump with."""
    rng = np.random.default_rng(7)
    L = 300_000
    w = BamWriter(str(tmp_path / "t.bam"), ["c1", "c2"], [L, L])
    cig = parse_cigar_string("50M")
    for i in range(3000):
        rid = int(rng.integers(0, 2))
        pos = int(rng.integers(0, L - 50))
        w.records.append(BamRecord(f"r{i}", rid, pos, 60, 0, cig,
                                   "A" * 50, [30] * 50))
    w.write(index=True)
    assert os.path.exists(tmp_path / "t.bam.bai")

    idx = read_bai(str(tmp_path / "t.bam.bai"))
    assert idx.refs[0].mapped + idx.refs[1].mapped == 3000

    eager = BamReader(str(tmp_path / "t.bam"))
    lazy = BamReader(str(tmp_path / "t.bam"), lazy=True)
    for rid in (0, 1):
        full = eager.fetch(rid)
        for b0, e0 in [(0, L), (100_000, 120_000), (L - 60, L)]:
            got = lazy.fetch_region(rid, b0, e0)
            exp = subset_batch(full, (full.pos < e0) & (full.end_pos >= b0))
            assert got.n == exp.n, (rid, b0, e0)
            assert np.array_equal(got.pos, exp.pos)
            assert np.array_equal(got.qual, exp.qual)

    # bai round-trip through our writer too
    write_bai(idx, str(tmp_path / "copy.bai"))
    idx2 = read_bai(str(tmp_path / "copy.bai"))
    for r1, r2 in zip(idx.refs, idx2.refs):
        assert r1.bins == r2.bins
        assert r1.linear == r2.linear
        assert (r1.mapped, r1.unmapped) == (r2.mapped, r2.unmapped)


def test_empty_region_and_no_reads(tmp_path):
    w = BamWriter(str(tmp_path / "e.bam"), ["c1", "c2"], [10000, 10000])
    w.add_read("r0", "c1", 100, "10M", "ACGTACGTAC")
    w.write(index=True)
    lazy = BamReader(str(tmp_path / "e.bam"), lazy=True)
    assert lazy.fetch_region(0, 5000, 6000).n == 0
    assert lazy.fetch_region(1, 0, 10000).n == 0
    got = lazy.fetch_region(0, 0, 200)
    assert got.n == 1 and got.pos[0] == 99


def test_parse_all_tags_roundtrip(tmp_path):
    """General typed tag decode (TagUtils analog): every tag written comes
    back with its type."""
    import struct
    from pisces_tpu.io.bam import BamReader
    from pisces_tpu.io.bam_write import BamRecord, BamWriter

    bam = str(tmp_path / "t.bam")
    w = BamWriter(bam, ["chr1"], [1000])
    rec = BamRecord("r1", 0, 9, 30, 0, [(0, 6)], "ACGTAC", [30] * 6,
                    tags={"XD": "3F3R", "XN": "amp1"})
    w.add(rec)
    w.write(sort=False)

    r = BamReader(bam)
    offsets = r._scan_record_offsets()
    d = r._data
    off = int(offsets[0])
    block_size = struct.unpack_from("<i", d, off)[0]
    l_rn = d[off + 12]
    n_cigar = struct.unpack_from("<H", d, off + 16)[0]
    l_seq = struct.unpack_from("<i", d, off + 20)[0]
    p = off + 36 + l_rn + 4 * n_cigar + (l_seq + 1) // 2 + l_seq
    tags = BamReader.parse_all_tags(d, p, off + 4 + block_size)
    assert tags == {"XD": "3F3R", "XN": "amp1"}
