"""Stitcher tests (StitchingLogic scenario matrix style)."""
import numpy as np
import pytest

from pisces_tpu.preprocessing.stitcher import (
    bridge_anchored, is_repeat, stitch_reads,
)

from util import parse_cigar


def cig(s):
    ops, lens = parse_cigar(s)
    return list(zip(ops.tolist(), lens.tolist()))


def stitch(p1, c1, s1, p2, c2, s2, q1=30, q2=30, **kw):
    q1 = [q1] * len(s1) if isinstance(q1, int) else q1
    q2 = [q2] * len(s2) if isinstance(q2, int) else q2
    return stitch_reads(p1, cig(c1), s1, q1, p2, cig(c2), s2, q2, **kw)


class TestBasicStitching:
    def test_perfect_overlap(self):
        # R1 1-10, R2 6-15, agree in overlap
        r = stitch(1, "10M", "ACGTACGTAC", 6, "10M", "CGTACGTACG")
        assert r is not None
        assert r.pos1 == 1
        assert r.seq == "ACGTACGTACGTACG"
        assert r.cigar == [(0, 15)]
        assert r.xd == "5F5S5R"
        assert r.num_agreements == 5
        # overlap quality summed
        assert r.qual[5] == 60
        assert r.qual[0] == 30

    def test_disagreement_nified(self):
        r = stitch(1, "10M", "ACGTACGTAC", 6, "10M", "CGTAAGTACG")
        assert r is not None
        assert r.seq[9] == "N"
        assert r.qual[9] == 0
        assert r.num_disagreements == 1

    def test_no_overlap_returns_none(self):
        r = stitch(1, "5M", "ACGTA", 100, "5M", "ACGTA")
        assert r is None

    def test_matching_insertion_stitches(self):
        # both reads contain 2I at the same spot
        r = stitch(1, "5M2I5M", "ACGTATTACGTA", 3, "3M2I5M", "GTATTACGTA")
        assert r is not None
        assert (1, 2) in [(op, ln) for op, ln in r.cigar]  # 2I kept
        assert r.seq.count("TT") >= 1

    def test_conflicting_insertion_fails(self):
        # R2 lacks the insertion present in R1's overlap region
        r = stitch(1, "5M2I5M", "ACGTATTACGTA", 3, "8M", "GTAACGTA")
        assert r is None

    def test_matching_deletion_stitches(self):
        r = stitch(1, "5M2D5M", "ACGTAACGTA", 3, "3M2D5M", "GTAACGTA")
        assert r is not None
        assert (2, 2) in r.cigar

    def test_homopolymer_bridge_rejected(self):
        # overlap is AAAAA -> repeat, cannot reliably stitch
        r = stitch(1, "10M", "CGTCGAAAAA", 6, "10M", "AAAAACGTCG")
        assert r is None

    def test_homopolymer_allowed_when_disabled(self):
        r = stitch(1, "10M", "CGTCGAAAAA", 6, "10M", "AAAAACGTCG",
                   dont_stitch_homopolymer_bridge=False)
        assert r is not None

    def test_n_mismatch_nified(self):
        # reference semantics: with NifyDisagreements on, even a base-vs-N
        # mismatch is N-ified (CigarReconciler.cs simple path), but it
        # counts as an N-disagreement, not a regular one
        r = stitch(1, "10M", "ACGTACGTAC", 6, "10M", "CGTNCGTACG")
        assert r is not None
        assert r.seq[8] == "N"
        assert r.qual[8] == 0
        assert r.num_n_disagreements == 1
        assert r.num_disagreements == 0

    def test_n_mismatch_quality_winner_when_not_nifying(self):
        # without nify: equal quals -> first mate's base; loser qual >= min
        # zeroes the kept quality ("dangerous high-Q disagreement")
        r = stitch(1, "10M", "ACGTACGTAC", 6, "10M", "CGTNCGTACG",
                   nify_disagreements=False)
        assert r is not None
        assert r.seq[8] == "A"
        assert r.qual[8] == 0
        assert r.num_n_disagreements == 1


class TestRepeatDetection:
    def test_homopolymer(self):
        assert is_repeat("AAAAA")
        assert is_repeat("ATATAT")
        assert is_repeat("ACGACGACG")
        assert not is_repeat("ACGTACGA")

    def test_bridge_anchored(self):
        assert bridge_anchored("ACT")  # short overlaps always ok
        assert bridge_anchored("ACGTAGCT")
        assert not bridge_anchored("TTTTTT")


# ---------------------------------------------------------------------------
# Reference scenario matrices (StitchingLogic.Tests/BasicStitcherTests.cs)
# ---------------------------------------------------------------------------

def _cigar_str(cigar):
    ops = "MIDNSHP=X"
    return "".join(f"{ln}{ops[op]}" for op, ln in cigar)


def merge(pos1, c1, pos2, c2, ignore_probe_softclips=True,
          r1_bases=None, r2_bases=None, max_read_length=1024):
    """TestMerge harness (BasicStitcherTests.cs:864-921): all-'A' bases,
    q30, read1 forward first-mate, read2 reverse, minBQ 10, nify on,
    homopolymer gate off."""
    n1 = sum(l for op, l in cig(c1) if op in (0, 1, 4, 7, 8))
    n2 = sum(l for op, l in cig(c2) if op in (0, 1, 4, 7, 8))
    s1 = r1_bases or "A" * n1
    s2 = r2_bases or "A" * n2
    return stitch_reads(pos1, cig(c1), s1, [30] * n1,
                        pos2, cig(c2), s2, [30] * n2,
                        r1_is_reverse=False, min_base_quality=10,
                        nify_disagreements=True,
                        dont_stitch_homopolymer_bridge=False,
                        ignore_probe_softclips=ignore_probe_softclips,
                        r1_is_first_mate=True,
                        max_read_length=max_read_length)


MERGE_SCENARIOS = [
    # (pos1, cigar1, pos2, cigar2, expected_pos, expected_cigar, expected_xd,
    #  ignore_probe_softclips)
    # -- TryStitch_SoftclipDeletionOverlaps (PICS-341 matrix)
    (2, "1S3M1S", 3, "2M2D1M2S", 2, "1S3M2D1M2S", "2F5S2R", True),
    (2, "1S3M2S", 3, "3M2D1M2S", 2, "1S4M2D1M2S", "2F6S2R", True),
    (2, "1S1M2D5M", 5, "2S3M2S", 2, "1S1M2D5M", "1R6S2F", True),
    (3, "2S2M2D2S", 2, "3M2D1M2S", 2, "1S3M2D1M2S", "1F1R5S1F1R", True),
    (2, "1S1M2D4M", 4, "1S1D4M1S", 2, "1S1M2D4M1S", "1F7S1R", True),
    (1, "4M2S", 2, "3M2D3M", 1, "4M2D3M", "1F7S1R", True),
    (1, "2M2D4M", 4, "1S1D5M", 1, "2M2D5M", "1F7S1R", True),
    # -- TryStitch_KissingReads
    (2, "1S1M2S", 3, "1M2S", 2, "1S2M2S", "2F1S1F1R", True),
    # -- TryStitch_InsertionEndingInSoftclip
    (2, "1S2M2I1M", 2, "2M2I2S", 2, "1S2M2I1M1S", "1F4S1F1R", True),
    (4, "3S2M1S", 4, "2M2I2S", 4, "3S2M2I2S", "3F3S3R", True),
    # -- TryStitch_IgnoreProbeSoftclips
    (3, "2S4M", 1, "6M", 1, "6M", "2R4S", True),
    (1, "6M", 3, "2S4M", 1, "6M", "6S", True),
    (1, "6M", 3, "4M2S", 1, "6M2S", "2F4S2R", True),
    (3, "2S4M", 3, "4M1S", 3, "2S4M1S", "2F4S1R", True),
    (2, "1S6M", 5, "2S3M2S", 2, "1S6M2S", "2F5S2R", True),
    (3, "2S4M", 3, "1S4M1S", 3, "2S4M1S", "1F1R4S1R", True),
    # -- RedistributeSoftclipPrefixes
    (5, "2I3M", 5, "2S3M", 5, "2I3M", "5S", True),
    (5, "2S3M", 5, "2I3M", 5, "2I3M", "2R3S", True),
    (5, "2I3M", 5, "2S3M", 5, "2I3M", "5S", False),
    # -- RedistributeSoftclipSuffixes
    (1, "3M1S", 1, "3M1I1M", 1, "3M1I1M", "4S1R", False),
    (1, "3M1S", 1, "3M1I1M", 1, "3M1I1M", "4S1R", True),
    (1, "3M1S", 1, "4M", 1, "4M", "4S", False),
    (1, "3M1S", 1, "4M", 1, "4M", "4S", True),
    (1, "3M2S", 1, "5M", 1, "5M", "5S", False),
    (1, "3M2S", 1, "5M", 1, "5M", "5S", True),
    (1, "3M2S", 1, "4M1S", 1, "4M1S", "5S", False),
    (1, "3M2S", 1, "4M1S", 1, "4M1S", "4S1F", True),
    (1, "3M2S", 1, "4M2S", 1, "4M2S", "5S1R", False),
    (1, "3M2S", 1, "4M2S", 1, "4M2S", "4S1F1R", True),
    (1, "3M5S", 1, "3M2I1M", 1, "3M2I1M2S", "6S2F", False),
    (1, "3M5S", 1, "3M2I1M", 1, "3M2I1M2S", "6S2F", True),
]

NO_MERGE_SCENARIOS = [
    # TryStitch_NoOverlap
    (1, "1M2S", 3, "3M1S"),
    (1, "1M2S", 4, "3M1S"),
    (1, "1M3S", 3, "1S3M1S"),
]


class TestReferenceMergeMatrix:
    @pytest.mark.parametrize(
        "pos1,c1,pos2,c2,epos,ecigar,exd,probe", MERGE_SCENARIOS)
    def test_merge(self, pos1, c1, pos2, c2, epos, ecigar, exd, probe):
        r = merge(pos1, c1, pos2, c2, ignore_probe_softclips=probe)
        assert r is not None
        assert r.pos1 == epos
        assert _cigar_str(r.cigar) == ecigar
        assert r.xd == exd

    @pytest.mark.parametrize("pos1,c1,pos2,c2", NO_MERGE_SCENARIOS)
    def test_no_merge(self, pos1, c1, pos2, c2):
        assert merge(pos1, c1, pos2, c2) is None

    def test_softclipped_deletion_bases(self):
        r = merge(2, "1M2D5M", 5, "2S4M", r1_bases="ABCDEF",
                  r2_bases="123456")
        assert r is not None
        assert r.pos1 == 2
        assert _cigar_str(r.cigar) == "1S1M2D5M"
        assert r.xd == "1R7S1F"

    def test_above_max_length_rejected(self):
        r = merge(148506283, "20S7M5803D2I72M", 148512084, "9M2I71M19S",
                  max_read_length=100)
        assert r is None


def stitching(c1, s1, c2, s2, delta, ecigar, exd, eseq,
              use_softclips=False, nify=False, ignore_probe=True):
    """TestStitching harness (BasicStitcherTests.cs:335-354): read1 fwd
    first-mate at 1000, read2 reverse at 1000+delta, q30, minBQ 10,
    homopolymer gate off."""
    r = stitch_reads(1000, cig(c1), s1, [30] * len(s1),
                     1000 + delta, cig(c2), s2, [30] * len(s2),
                     r1_is_reverse=False, min_base_quality=10,
                     nify_disagreements=nify,
                     use_softclipped_bases=use_softclips,
                     dont_stitch_homopolymer_bridge=False,
                     ignore_probe_softclips=ignore_probe,
                     r1_is_first_mate=True)
    assert r is not None
    assert _cigar_str(r.cigar) == ecigar
    assert r.xd == exd
    assert r.seq == eseq


class TestMatchSectionGap:
    """GenerateConsensus_MatchSectionGap (BasicStitcherTests.cs:231-333)."""

    def test_cigars_match_in_overlaps(self):
        for sc in (False, True):
            stitching("2S2M", "ABCD", "1M2S", "def", 1,
                      "2S2M2S", "3F1S2R", "ABCDef", sc)
            stitching("2S1M", "ABC", "2M2S", "cdef", 0,
                      "2S2M2S", "2F1S3R", "ABCdef", sc)
            stitching("2S2M2S", "ABCDEF", "1M2S", "def", 1,
                      "2S2M2S", "3F1S2F", "ABCDEF", sc)
            stitching("1M2S", "DEF", "2S2M2S", "abcdef", -1,
                      "2S2M2S", "3R1S2F", "abcDEF", sc)
            stitching("1M2S", "DEF", "2S2M1S", "abcde", -1,
                      "2S2M2S", "3R1S2F", "abcDEF", sc)
            stitching("2S2M1S", "ABCDE", "1M2S", "def", 1,
                      "2S2M2S", "3F1S1F1R", "ABCDEf", sc)

    def test_softclip_overlapping_match(self):
        stitching("2S2M", "ABCD", "1S1M1S", "bcd", 0,
                  "2S2M", "1F1R1S1F", "AbCD", False)
        stitching("2S2M", "ABCD", "1S1M1S", "bcd", 0,
                  "2S2M", "1F1R1S1F", "AbCD", True)
        stitching("2S2M", "ABCD", "1S1M1S", "bcd", 0,
                  "2S2M", "1F3S", "ABCD", True, ignore_probe=False)

        stitching("2S2M", "ABCD", "1M3S", "cdef", 0,
                  "2S2M2S", "2F1S1F2R", "ABCDef", False)
        stitching("2S2M", "ABCD", "1M3S", "cdef", 0,
                  "2S2M2S", "2F1S1F2R", "ABCDef", True)
        stitching("2S2M", "ABCD", "1M3S", "cdef", 0,
                  "2S2M2S", "2F2S2R", "ABCDef", True, ignore_probe=False)

        stitching("1M3S", "CDEF", "2S2M", "abcd", 0,
                  "2S2M2S", "2R1S1R2F", "abCdEF", False)
        stitching("1M3S", "CDEF", "2S2M", "abcd", 0,
                  "2S2M2S", "2R2S2F", "abCDEF", True)
        stitching("1M3S", "CDEF", "2S2M", "abcd", 0,
                  "2S2M2S", "2R2S2F", "abCDEF", True, ignore_probe=False)

        stitching("2S3M2S", "BCDEFGH", "2S3M2S", "abcdefg", -1,
                  "2S4M2S", "1R1S1R2S1F1S1F", "aBcDEFGH", False,
                  ignore_probe=False)
        stitching("2S3M2S", "BCDEFGH", "2S3M2S", "abcdefg", -1,
                  "2S4M2S", "3R2S3F", "abcDEFGH", False, ignore_probe=True)
        stitching("2S3M2S", "BCDEFGH", "2S3M2S", "abcdefg", -1,
                  "2S4M2S", "3R2S3F", "abcDEFGH", True)
        stitching("2S3M2S", "BCDEFGH", "2S3M2S", "abcdefg", -1,
                  "2S4M2S", "1R6S1F", "aBCDEFGH", True, ignore_probe=False)

        stitching("2S3M2S", "ABCDEFG", "2S3M2S", "bcdefgh", 1,
                  "2S4M2S", "1F1R1F2S1R1F1R", "AbCDEfGh", False)
        stitching("2S3M2S", "ABCDEFG", "2S3M2S", "bcdefgh", 1,
                  "2S4M2S", "1F1R4S1F1R", "AbCDEFGh", True)
        stitching("2S3M2S", "ABCDEFG", "2S3M2S", "bcdefgh", 1,
                  "2S4M2S", "1F6S1R", "ABCDEFGh", True, ignore_probe=False)
