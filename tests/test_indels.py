"""Indel evidence/filtering/contextualization/lookup tests
(modeled on Gemini.Tests: BasicIndelFiltererTests, HashableIndelSourceTests,
ChromosomeIndelSourceTests scenarios)."""
import pytest

from pisces_tpu.preprocessing.indels import (
    BasicIndelFilterer, ChromosomeIndelSource, IndelEvidence, PreIndel,
    compute_rmxn_for_indel, find_read_indels, get_final_indels_for_chromosome,
    get_hashable_indel, indel_key, is_duplication,
    is_in_homopolymer_stretch, is_repeat_with_unit, parse_indel_key,
    record_indel_evidence,
)

REF = ("ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"
       "AAAAAAAAAATTTTTTTTTTCACACACACACAGGGGGGGG")  # 80bp


def cig(s):
    from util import parse_cigar
    ops, lens = parse_cigar(s)
    return list(zip(ops.tolist(), lens.tolist()))


class TestFindReadIndels:
    def test_deletion_with_anchors_and_quality(self):
        read = REF[0:10] + REF[13:23]
        out = find_read_indels("chr1", 1, cig("10M3D10M"), read, [30] * 20,
                               REF)
        assert len(out) == 1
        d = out[0]
        assert d.position == 10
        assert d.ref_allele == REF[9:13]
        assert d.alt_allele == REF[9]
        assert d.left_anchor == 10 and d.right_anchor == 10
        assert d.average_quality == 30

    def test_insertion_quality_gate(self):
        read = REF[0:10] + "GGG" + REF[10:17]
        quals = [30] * 20
        out = find_read_indels("chr1", 1, cig("10M3I7M"), read, quals, REF)
        assert len(out) == 1
        assert out[0].alt_allele == REF[9] + "GGG"
        # >10% of inserted bases below min quality -> dropped
        quals[10] = 2
        out = find_read_indels("chr1", 1, cig("10M3I7M"), read, quals, REF)
        assert out == []

    def test_deletion_low_flank_quality_dropped(self):
        read = REF[0:10] + REF[13:23]
        quals = [30] * 20
        quals[10] = 2  # base after the deletion
        out = find_read_indels("chr1", 1, cig("10M3D10M"), read, quals, REF)
        assert out == []

    def test_key_roundtrip(self):
        p = PreIndel("chr1", 10, "CGTA", "C")
        assert parse_indel_key(p.key()).key() == p.key()


def _evidence(obs=5, left=100, right=100, qual=None, mess=0, fwd=None,
              rev=0, reputable=None):
    ev = IndelEvidence()
    ev.observations = obs
    ev.left_anchor = left
    ev.right_anchor = right
    ev.quality = qual if qual is not None else 30 * obs
    ev.mess = mess
    ev.forward = fwd if fwd is not None else obs
    ev.reverse = rev
    ev.reputable_support = reputable if reputable is not None else obs
    ev.position = 10
    return ev


class TestBasicIndelFilterer:
    KEY = indel_key("chr1", 10, "CGTA", "C")

    def test_kept_above_threshold(self):
        f = BasicIndelFilterer(3, 1)
        out = f.get_realignable_preindels({self.KEY: _evidence(5)}, True)
        assert len(out) == 1
        assert out[0].score > 0
        assert out[0].observations == 5

    def test_below_found_threshold_removed(self):
        f = BasicIndelFilterer(3, 1)
        out = f.get_realignable_preindels({self.KEY: _evidence(2)}, False)
        assert out == []

    def test_strong_indel_rescued(self):
        # below found threshold but pristine evidence -> rescue
        ev = _evidence(3, left=120, right=120, qual=35 * 3, mess=0,
                       fwd=2, rev=1)
        f = BasicIndelFilterer(5, 1)
        out = f.get_realignable_preindels({self.KEY: ev}, True)
        assert len(out) == 1
        assert ev.outcome == "Rescued"
        out = f.get_realignable_preindels({self.KEY: _evidence(3, fwd=2,
                                                               rev=1)}, False)
        assert out == []

    def test_no_reputable_support_removed(self):
        ev = _evidence(5, reputable=0)
        f = BasicIndelFilterer(3, 1)
        assert f.get_realignable_preindels({self.KEY: ev}, True) == []
        assert ev.outcome == "LowReputableSupport"

    def test_poor_single_removed(self):
        ev = _evidence(1, left=3, right=100, qual=30)
        f = BasicIndelFilterer(1, 1)
        assert f.get_realignable_preindels({self.KEY: ev}, True) == []
        assert ev.outcome == "PoorSingle"

    def test_multi_key_marks_in_multi(self):
        k2 = indel_key("chr1", 20, "T", "TAC")
        multi_key = self.KEY + "|" + k2
        f = BasicIndelFilterer(1, 1)
        out = f.get_realignable_preindels(
            {multi_key: _evidence(5)}, True)
        assert len(out) == 2
        assert all(p.in_multi for p in out)
        assert out[0].other_indel == out[1].key()

    def test_super_weak_small_removed(self):
        # single-base indel with tiny observation count
        key = indel_key("chr1", 10, "CG", "C")
        ev = _evidence(2)
        f = BasicIndelFilterer(3, 1)
        assert f.get_realignable_preindels({key: ev}, True) == []
        assert ev.outcome == "SuperWeakSmall"


class TestContextualization:
    def test_repeat_detection(self):
        assert is_repeat_with_unit("ACACAC", 3) == (True, "AC")
        assert is_repeat_with_unit("AAAA", 3) == (True, "A")
        ok, _u = is_repeat_with_unit("ACGTT", 3)
        assert not ok

    def test_rmxn(self):
        # CA repeat region at REF[60:72]
        repeats, unit = compute_rmxn_for_indel(62, "CA", REF, 6)
        assert repeats >= 6
        assert unit in ("CA", "AC")

    def test_duplication(self):
        # insertion that duplicates adjacent reference sequence
        assert is_duplication(REF, 8, False, "", "C" + REF[8:12])
        assert not is_duplication(REF, 8, False, "", "C" + "GGGG")

    # a long homopolymer with unique flanks for the untrustworthy tests
    HREF = "CGTACGTACG" + "A" * 25 + "CGTACGTACG"

    def test_homopolymer_stretch(self):
        assert is_in_homopolymer_stretch(self.HREF, 22)  # deep in the A run
        assert not is_in_homopolymer_stretch(self.HREF, 3)

    def test_hashable_fields(self):
        h = get_hashable_indel(self.HREF, PreIndel("chr1", 22, "AA", "A",
                                                   score=50))
        assert h.ref_allele == "AA" and h.alt_allele == "A"
        assert not h.is_insertion
        assert h.is_repeat and h.repeat_unit == "A"
        assert h.is_untrustworthy_in_repeat_region
        assert h.ref_prefix.endswith("AA")

    def test_untrustworthy_weak_filtered(self):
        # weak 1bp indel in the homopolymer region is dropped; a strong one
        # survives (HashableIndelSource.cs:300-312)
        weak = PreIndel("chr1", 22, "AA", "A", score=10, observations=1)
        strong = PreIndel("chr1", 22, "AA", "A", score=10, observations=50)
        strong2 = PreIndel("chr1", 4, "ACGT", "A", score=10, observations=50)
        out = get_final_indels_for_chromosome([weak, strong2], self.HREF)
        assert len(out) == 1 and out[0].position == 4
        out = get_final_indels_for_chromosome([strong, strong2], self.HREF)
        assert len(out) == 2

    def test_effectively_same_deletion_collapsed(self):
        # two nearby same-length deletions in the CA repeat with the same
        # consequence: the weaker is removed
        a = PreIndel("chr1", 62, REF[61:64], REF[61], score=100,
                     observations=10)
        b = PreIndel("chr1", 64, REF[63:66], REF[63], score=10,
                     observations=10)
        out = get_final_indels_for_chromosome([a, b], REF)
        assert len(out) == 1
        assert out[0].position == 62


class TestChromosomeIndelSource:
    def _h(self, pos, score, length=3):
        ref = REF[pos - 1:pos - 1 + length + 1]
        return get_hashable_indel(
            REF, PreIndel("chr1", pos, ref, ref[0], score=score))

    def test_ranked_by_score(self):
        src = ChromosomeIndelSource([self._h(10, 5), self._h(12, 50)])
        out = src.get_relevant_indels(11)
        assert out[0].score >= out[1].score

    def test_distance_cutoff(self):
        src = ChromosomeIndelSource([self._h(10, 50)])
        assert src.get_relevant_indels(10)
        assert not src.get_relevant_indels(10 + 300)

    def test_top_n_cap(self):
        hs = [self._h(10 + i, 10 + i) for i in range(8)]
        src = ChromosomeIndelSource(hs)
        out = src.get_relevant_indels(12)
        assert len(out) == ChromosomeIndelSource.MAX_TOP

    def test_any_indels_nearby(self):
        src = ChromosomeIndelSource([self._h(10, 50)])
        assert src.any_indels_nearby(500)
        assert not src.any_indels_nearby(5000)
        assert not ChromosomeIndelSource([]).any_indels_nearby(10)
