"""AlignmentPairFilter + BamRewriter port tests (Alignment.Logic.Tests
scenarios: pairing by name, skip/blacklist hooks, unpaired flushing)."""
import os

import pytest

from pisces_tpu.io.bam import BamReader
from pisces_tpu.io.bam_write import BamWriter
from pisces_tpu.io.pair_filter import (
    AlignmentPairFilter, PairedRead, rewrite_bam,
)


def _read(name, pos1=10, flag=0x1 | 0x40, mapq=30):
    return PairedRead(name, 0, pos1 - 1, mapq, flag,
                      [(0, 6)], "ACGTAC", [30] * 6)


class TestTryPair:
    def test_pairs_by_name(self):
        f = AlignmentPairFilter()
        assert f.try_pair(_read("a", flag=0x1 | 0x40)) is None
        pair = f.try_pair(_read("a", pos1=30, flag=0x1 | 0x80))
        assert pair is not None
        assert pair.read1 is not None and pair.read2 is not None
        assert f.pairs_paired == 1

    def test_skip_read_hook(self):
        f = AlignmentPairFilter(should_skip_read=lambda r: r.mapq < 20)
        assert f.try_pair(_read("a", mapq=5)) is None
        assert f.try_pair(_read("a", flag=0x1 | 0x80)) is None  # mate waits
        assert f.reads_skipped == 1

    def test_skip_pair_hook(self):
        f = AlignmentPairFilter(
            should_skip_pair=lambda p: p.read1.pos0 == p.read2.pos0)
        f.try_pair(_read("a", pos1=10, flag=0x1 | 0x40))
        assert f.try_pair(_read("a", pos1=10, flag=0x1 | 0x80)) is None
        assert f.pairs_skipped == 1

    def test_blacklist_removes_waiting_mate(self):
        f = AlignmentPairFilter(should_blacklist=lambda r: r.mapq == 0)
        f.try_pair(_read("a", flag=0x1 | 0x40))
        assert f.try_pair(_read("a", flag=0x1 | 0x80, mapq=0)) is None
        # mate was evicted: re-arrival of first mate starts a fresh wait
        assert f.try_pair(_read("a", flag=0x1 | 0x40, mapq=0)) is None
        assert not f.unpaired_reads()

    def test_unpaired_flush(self):
        f = AlignmentPairFilter()
        f.try_pair(_read("solo"))
        left = f.unpaired_reads()
        assert [r.name for r in left] == ["solo"]
        assert f.unpaired_reads() == []


def test_rewrite_bam(tmp_path):
    bam = str(tmp_path / "in.bam")
    w = BamWriter(bam, ["chr1"], [1000])
    w.add_read("p1", "chr1", 10, "6M", "ACGTAC", flag=0x1 | 0x40)
    w.add_read("p1", "chr1", 40, "6M", "ACGTAC", flag=0x1 | 0x80 | 0x10)
    w.add_read("lowq", "chr1", 20, "6M", "ACGTAC", flag=0x1 | 0x40, mapq=1)
    w.add_read("lowq", "chr1", 50, "6M", "ACGTAC", flag=0x1 | 0x80, mapq=1)
    w.add_read("solo", "chr1", 30, "6M", "ACGTAC", flag=0x1 | 0x40)
    w.write()

    out = rewrite_bam(bam, str(tmp_path / "out.bam"),
                      AlignmentPairFilter(
                          should_skip_pair=lambda p: p.read1.mapq < 10))
    batch = BamReader(out).fetch(parse_names=True)
    names = sorted(batch.names)
    # lowq pair dropped; p1 pair kept; solo flushed unpaired
    assert names == ["p1", "p1", "solo"]
