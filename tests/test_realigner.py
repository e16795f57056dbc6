"""Realigner + Gemini pipeline tests."""
import numpy as np
import pytest

from pisces_tpu.preprocessing.realigner import (
    CandidateIndel, can_coexist, realign_read,
)
from pisces_tpu.preprocessing.gemini import (
    GeminiOptions, process_chromosome, run_gemini,
)
from pisces_tpu.io.bam_write import BamWriter
from pisces_tpu.io.bam import BamReader

from util import parse_cigar, refseq


def cig(s):
    ops, lens = parse_cigar(s)
    return list(zip(ops.tolist(), lens.tolist()))


REF = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"  # 40bp


class TestRealigner:
    def test_deletion_rescues_mismatches(self):
        # read matches ref[0:10] + ref[13:23] (3bp deletion after pos 10)
        ref = refseq(REF)
        read = REF[0:10] + REF[13:23]
        # aligned naively as 20M at pos 1 -> many mismatches
        target = CandidateIndel("chr1", 10, REF[9:13], REF[9])
        res = realign_read(1, cig("20M"), read, ref, [target])
        assert res is not None
        assert res.pos1 == 1
        assert res.cigar == [(0, 10), (2, 3), (0, 10)]
        assert res.num_mismatches == 0

    def test_insertion_rescues_mismatches(self):
        ref = refseq(REF)
        read = REF[0:10] + "GGG" + REF[10:17]
        target = CandidateIndel("chr1", 10, REF[9], REF[9] + "GGG")
        res = realign_read(1, cig("20M"), read, ref, [target])
        assert res is not None
        assert res.cigar == [(0, 10), (1, 3), (0, 7)]
        assert res.num_mismatches == 0

    def test_no_improvement_returns_none(self):
        ref = refseq(REF)
        read = REF[0:20]  # perfect alignment
        target = CandidateIndel("chr1", 10, REF[9:13], REF[9])
        assert realign_read(1, cig("20M"), read, ref, [target]) is None

    def test_wrong_target_rejected(self):
        ref = refseq(REF)
        read = REF[0:20]
        read = read[:15] + "T" + read[16:]  # single SNV only
        target = CandidateIndel("chr1", 5, REF[4:7], REF[4])
        assert realign_read(1, cig("20M"), read, ref, [target]) is None

    def test_can_coexist(self):
        d1 = CandidateIndel("chr1", 10, "ACGT", "A")
        d2 = CandidateIndel("chr1", 12, "GTAC", "G")
        assert not can_coexist(d1, d2)
        d3 = CandidateIndel("chr1", 20, "GT", "G")
        assert can_coexist(d1, d3)


class TestGeminiPipeline:
    def _make_genome(self, tmp_path, seq):
        gdir = tmp_path / "genome"
        gdir.mkdir()
        with open(gdir / "chr1.fa", "w") as f:
            f.write(">chr1\n" + seq + "\n")
        with open(gdir / "chr1.fa.fai", "w") as f:
            f.write(f"chr1\t{len(seq)}\t6\t{len(seq)}\t{len(seq)+1}\n")
        with open(gdir / "GenomeSize.xml", "w") as f:
            f.write('<sequenceSizes genomeName="t">\n'
                    f'\t<chromosome fileName="chr1.fa" contigName="chr1" '
                    f'totalBases="{len(seq)}" isCircular="false" md5="x" '
                    'ploidy="2" knownBases="40" />\n</sequenceSizes>')
        return str(gdir)

    def test_end_to_end_realignment(self, tmp_path):
        gdir = self._make_genome(tmp_path, REF)
        bam_path = str(tmp_path / "in.bam")
        w = BamWriter(bam_path, ["chr1"], [len(REF)])
        # 5 reads with a correctly-cigared 3bp deletion (the evidence)
        del_read = REF[0:10] + REF[13:23]
        for i in range(5):
            w.add_read(f"good{i}", "chr1", 1, "10M3D10M", del_read)
        # 3 reads with the same deletion but aligned as mismatches
        for i in range(3):
            w.add_read(f"bad{i}", "chr1", 1, "20M", del_read)
        w.write()

        out = run_gemini(bam_path, gdir, str(tmp_path / "out.bam"),
                         GeminiOptions(stitch_pairs=False))
        rb = BamReader(out)
        batch = rb.fetch(0)
        assert batch.n == 8
        # all 8 reads should now carry the deletion cigar
        n_del = 0
        for i in range(batch.n):
            s, e = batch.cigar_off[i], batch.cigar_off[i + 1]
            ops = batch.cigar_ops[s:e].tolist()
            if 2 in ops:
                n_del += 1
        assert n_del == 8

    def test_end_to_end_stitching(self, tmp_path):
        gdir = self._make_genome(tmp_path, REF)
        bam_path = str(tmp_path / "in.bam")
        w = BamWriter(bam_path, ["chr1"], [len(REF)])
        # overlapping mate pair: R1 1-20, R2 11-30
        w.add_read("pair1", "chr1", 1, "20M", REF[0:20], flag=0x1 | 0x2 | 0x40)
        w.add_read("pair1", "chr1", 11, "20M", REF[10:30],
                   flag=0x1 | 0x2 | 0x80 | 0x10)
        w.write()
        out = run_gemini(bam_path, gdir, str(tmp_path / "out.bam"),
                         GeminiOptions(realign=False))
        rb = BamReader(out)
        batch = rb.fetch(ref_id=0, parse_tags=True)
        assert batch.n == 1  # one stitched read
        assert batch.seq_off[1] == 30
        assert batch.xd_tags[0] == "10F10S10R"


def test_gemini_multi_matches_single(tmp_path):
    """GeminiMulti-equivalent per-chromosome fan-out + native merge produces
    the same reads as single-process Gemini, sorted and indexed."""
    import conftest
    import os
    import shutil
    from pisces_tpu.io.bam import BamReader as _BR
    from pisces_tpu.preprocessing.gemini import run_gemini, run_gemini_multi

    src = conftest.shared_bam("Chr17Chr19.bam")
    gdir = conftest.shared_genome("chr19")
    bam = str(tmp_path / "in.bam")
    shutil.copy(src, bam)
    single = run_gemini(bam, gdir, str(tmp_path / "single.bam"))
    multi = run_gemini_multi(bam, gdir, str(tmp_path / "multi.bam"),
                             n_processes=2)
    assert os.path.exists(multi + ".bai")
    a = _BR(single).fetch(parse_tags=True)
    b = _BR(multi).fetch(parse_tags=True)
    assert a.n == b.n
    assert np.array_equal(a.pos, b.pos)
    assert np.array_equal(a.seq, b.seq)
    assert np.array_equal(a.cigar_ops, b.cigar_ops)
    assert a.xd_tags == b.xd_tags
