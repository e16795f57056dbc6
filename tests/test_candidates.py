"""Candidate-finder CIGAR scenarios.

Mirrors the reference scenario matrix in
src/test/Pisces.Domain.Tests/UnitTests/Logic/VariantFinderTests.cs
(SnvTests, MnvTests, DeletionTests, InsertionTests, OpenEndedness).
"""
import numpy as np
import pytest

from pisces_tpu.domain.types import AlleleCategory
from pisces_tpu.pileup.candidates import find_candidates_batch

from util import make_batch, refseq

Q = 20  # quality cutoff
START = 10


def find(ref, reads, min_bq=Q, call_mnvs=False, max_mnv=3, max_gap=1):
    batch = make_batch(reads)
    keep = np.ones(batch.n, dtype=bool)
    cands, _ = find_candidates_batch("chr1", refseq(ref), batch, keep, min_bq,
                                     call_mnvs, max_mnv, max_gap)
    return sorted(cands, key=lambda c: (c.position, c.alt_allele))


def pad_ref(core: str, start: int) -> str:
    """Place `core` so its first base is at 1-based position `start`."""
    return "A" * (start - 1) + core


class TestSnv:
    def test_simple_snv(self):
        ref = "T" * 9 + "G" + "T" * 20
        c = find(ref, [dict(pos1=START, cigar="1M", seq="T", qual=Q)])
        assert len(c) == 1
        assert (c[0].position, c[0].ref_allele, c[0].alt_allele) == (START, "G", "T")
        assert c[0].category == AlleleCategory.SNV

    def test_low_quality_suppresses(self):
        ref = "T" * 9 + "G" + "T" * 20
        assert find(ref, [dict(pos1=START, cigar="1M", seq="T", qual=Q - 1)]) == []

    def test_match_yields_nothing(self):
        ref = "T" * 9 + "G" + "T" * 20
        assert find(ref, [dict(pos1=START, cigar="1M", seq="G", qual=Q)]) == []

    def test_n_read_base_suppresses(self):
        ref = pad_ref("AG", START)
        assert find(ref, [dict(pos1=START, cigar="2M", seq="AN", qual=Q)]) == []

    def test_n_ref_base_suppresses(self):
        ref = pad_ref("AN", START)
        assert find(ref, [dict(pos1=START, cigar="2M", seq="AT", qual=Q)]) == []

    def test_second_position_snv(self):
        ref = pad_ref("AG", START) + "C" * 10
        c = find(ref, [dict(pos1=START, cigar="2M", seq="AT", qual=Q)])
        assert len(c) == 1
        assert (c[0].position, c[0].ref_allele, c[0].alt_allele) == (START + 1, "G", "T")


class TestMnv:
    def test_simple_mnv(self):
        ref = pad_ref("GCC", START) + "T" * 10
        c = find(ref, [dict(pos1=START, cigar="3M", seq="TAA", qual=Q)],
                 call_mnvs=True)
        assert len(c) == 1
        assert (c[0].position, c[0].ref_allele, c[0].alt_allele) == (START, "GCC", "TAA")
        assert c[0].category == AlleleCategory.MNV
        # MNV covering the whole read is open on both ends
        assert c[0].open_on_left and c[0].open_on_right

    def test_mnv_with_intervening_ref(self):
        # GCCTA -> TAATC with 1 intervening ref allowed: full 5-base MNV
        ref = pad_ref("GCCTA", START) + "G" * 10
        c = find(ref, [dict(pos1=START, cigar="5M", seq="TAATC", qual=Q)],
                 call_mnvs=True, max_mnv=20, max_gap=1)
        assert len(c) == 1
        assert (c[0].ref_allele, c[0].alt_allele) == ("GCCTA", "TAATC")

    def test_mnv_trailing_refs_popped(self):
        ref = pad_ref("GCCGG", START) + "T" * 10
        c = find(ref, [dict(pos1=START, cigar="5M", seq="TAAGG", qual=Q)],
                 call_mnvs=True, max_mnv=20, max_gap=1)
        assert len(c) == 1
        assert (c[0].ref_allele, c[0].alt_allele) == ("GCC", "TAA")
        assert c[0].open_on_left and not c[0].open_on_right

    @pytest.mark.parametrize("max_gap,expect_combined", [
        (2, False), (5, True), (4, True), (3, False)])
    def test_gap_threshold(self, max_gap, expect_combined):
        # AAA TTTT GGG vs ref TTT TTTT TTT (4 intervening refs)
        ref = pad_ref("TTTTTTTTTT", START) + "C" * 5
        c = find(ref, [dict(pos1=START, cigar="10M", seq="AAATTTTGGG", qual=Q)],
                 call_mnvs=True, max_mnv=20, max_gap=max_gap)
        if expect_combined:
            assert len(c) == 1
            assert (c[0].ref_allele, c[0].alt_allele) == ("TTTTTTTTTT", "AAATTTTGGG")
        else:
            assert len(c) == 2
            assert (c[0].ref_allele, c[0].alt_allele, c[0].position) == ("TTT", "AAA", START)
            assert c[0].open_on_left and not c[0].open_on_right
            assert (c[1].ref_allele, c[1].alt_allele, c[1].position) == ("TTT", "GGG", START + 7)
            assert not c[1].open_on_left and c[1].open_on_right

    def test_mnv_disabled_yields_snvs(self):
        ref = pad_ref("GCC", START) + "T" * 10
        c = find(ref, [dict(pos1=START, cigar="3M", seq="TAA", qual=Q)],
                 call_mnvs=False)
        assert len(c) == 3
        assert all(x.category == AlleleCategory.SNV for x in c)


class TestDeletion:
    def test_simple_deletion(self):
        ref = pad_ref("GCT", START) + "A" * 10
        c = find(ref, [dict(pos1=START, cigar="1M1D1M", seq="GT", qual=Q)])
        assert len(c) == 1
        assert (c[0].position, c[0].ref_allele, c[0].alt_allele) == (START, "GC", "G")
        assert c[0].category == AlleleCategory.DELETION
        assert not c[0].open_on_left and not c[0].open_on_right

    @pytest.mark.parametrize("quals,expected", [
        ([Q, Q], 1), ([Q - 1, Q - 1], 0), ([Q - 1, Q], 0), ([Q, Q - 1], 0)])
    def test_deletion_flank_quality(self, quals, expected):
        ref = pad_ref("GCT", START) + "A" * 10
        c = find(ref, [dict(pos1=START, cigar="1M1D1M", seq="GT", qual=quals)])
        assert len(c) == expected

    def test_multibase_deletion(self):
        ref = pad_ref("AAGACTA", START) + "C" * 10
        c = find(ref, [dict(pos1=START, cigar="3M2D2M", seq="AAGTA", qual=Q)])
        assert len(c) == 1
        assert (c[0].position, c[0].ref_allele, c[0].alt_allele) == (START + 2, "GAC", "G")

    def test_deletion_bookend_quality_only(self):
        ref = pad_ref("AAGACTA", START) + "C" * 10
        quals = [Q - 1, Q - 1, Q, Q, Q - 1]
        c = find(ref, [dict(pos1=START, cigar="3M2D2M", seq="AAGTA", qual=quals)])
        assert len(c) == 1


class TestInsertion:
    def test_simple_insertion(self):
        ref = pad_ref("GT", START) + "A" * 10
        c = find(ref, [dict(pos1=START, cigar="1M2I1M", seq="GCCT", qual=Q)])
        assert len(c) == 1
        assert (c[0].position, c[0].ref_allele, c[0].alt_allele) == (START, "G", "GCC")
        assert c[0].category == AlleleCategory.INSERTION

    def test_insertion_first_base_quality_gate(self):
        ref = pad_ref("GT", START) + "A" * 10
        c = find(ref, [dict(pos1=START, cigar="1M2I1M", seq="GCCT",
                            qual=[Q, Q - 1, Q, Q])])
        assert len(c) == 0

    def test_insertion_with_n(self):
        # only first inserted base quality checked; N bases allowed in alt
        ref = pad_ref("GT", START) + "A" * 10
        c = find(ref, [dict(pos1=START, cigar="1M2I1M", seq="GNCT", qual=Q)])
        assert len(c) == 1
        assert c[0].alt_allele == "GNC"


class TestOpenEndedness:
    """OpenEndedness scenarios (VariantFinderTests.cs:1342-1376)."""

    REF = "AAAAAAAAAAAAAAA"

    def _check(self, seq, cigar, open_ended):
        # reference test sets BamAlignment.Position=1 (0-based) -> 1-based 2
        c = find(self.REF, [dict(pos1=2, cigar=cigar, seq=seq, qual=Q)],
                 min_bq=0, call_mnvs=True, max_mnv=3, max_gap=0)
        c = sorted(c, key=lambda x: x.position)
        assert c, "expected candidates"
        assert c[0].open_on_left == open_ended
        assert c[-1].open_on_right == open_ended

    def test_ends(self):
        self._check("TAAAAAAAAC", "10M", True)      # snv at both ends
        self._check("TTTAAAACCC", "10M", True)      # mnv at both ends
        self._check("TTTAAAACCC", "3I4M3I", True)   # insertions at ends

    def test_one_off_from_end(self):
        self._check("ATAAAAAACA", "10M", False)
        self._check("ATTTAACCCA", "10M", False)
        self._check("ATTAAAACCA", "1M2I4M2I1M", False)
        self._check("AAAAAAAAAA", "1M3D8M2D1M", False)

    def test_with_soft_clipping(self):
        self._check("TTAAAAAAAACC", "1S10M1S", True)
        self._check("TTTTAAAACCCC", "1S10M1S", True)
        self._check("ATTTAAAACCCA", "1S3I4M3I1S", True)


class TestAggregation:
    def test_support_aggregates_across_reads(self):
        ref = "T" * 9 + "G" + "T" * 20
        batch = make_batch([
            dict(pos1=START, cigar="1M", seq="T", qual=Q),
            dict(pos1=START, cigar="1M", seq="T", qual=Q, flag=0x10),  # reverse
            dict(pos1=START - 2, cigar="5M", seq="TTTTT", qual=Q),
        ])
        keep = np.ones(batch.n, dtype=bool)
        cands, _ = find_candidates_batch("chr1", refseq(ref), batch, keep, Q,
                                         track_open_ended=False)
        assert len(cands) == 1
        assert cands[0].support == 3
        assert cands[0].support_by_direction[0] == 2
        assert cands[0].support_by_direction[1] == 1

    def test_well_anchored_support(self):
        # SNV at the very first base of a 1M read: anchor = 0, not well-anchored
        ref = "T" * 9 + "G" + "T" * 20
        batch = make_batch([dict(pos1=START, cigar="1M", seq="T", qual=Q)])
        cands, _ = find_candidates_batch("chr1", refseq(ref), batch,
                                         np.ones(1, bool), Q)
        assert cands[0].well_anchored_support == 0
        # SNV mid-read with >=1 anchor each side: well-anchored (alt len 1)
        batch = make_batch([dict(pos1=START - 2, cigar="5M", seq="TTTTT", qual=Q)])
        cands, _ = find_candidates_batch("chr1", refseq(ref), batch,
                                         np.ones(1, bool), Q)
        assert cands[0].well_anchored_support == 1
