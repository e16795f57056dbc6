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

    def test_n_on_one_side_takes_other(self):
        r = stitch(1, "10M", "ACGTACGTAC", 6, "10M", "CGTNCGTACG")
        assert r is not None
        assert r.seq[8] == "A"  # R1 base wins over the N
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
