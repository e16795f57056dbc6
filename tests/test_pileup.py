"""Pileup count-tensor tests: event generation, anchor typing, deletion
handling, host/device agreement (RegionStateManager.AddAlleleCounts and
AlleleCountHelper semantics)."""
import numpy as np
import pytest

from pisces_tpu.domain.types import AlleleType, DirectionType
from pisces_tpu.pileup.counts import (
    anchor_window_sum, build_counts_device, build_counts_host,
)
from pisces_tpu.pileup.events import anchor_indexes, build_base_events
from pisces_tpu.calling.source import AlleleSource

from util import make_batch

A = AlleleType
D = DirectionType


def build(reads, min_bq=20, anchor_size=5, device=False):
    batch = make_batch(reads)
    keep = np.ones(batch.n, dtype=bool)
    ev = build_base_events(batch, keep, min_bq, anchor_size)
    builder = build_counts_device if device else build_counts_host
    return ev, builder(ev, anchor_size=anchor_size)


def count(pc, pos, allele, direction, **kw):
    return AlleleSource(pc).get_allele_count(pos, int(allele), int(direction), **kw)


class TestBasicCounts:
    def test_simple_match_counts(self):
        _, pc = build([dict(pos1=100, cigar="5M", seq="ACGTA", qual=30)])
        assert count(pc, 100, A.A, D.FORWARD) == 1
        assert count(pc, 101, A.C, D.FORWARD) == 1
        assert count(pc, 102, A.G, D.FORWARD) == 1
        assert count(pc, 103, A.T, D.FORWARD) == 1
        assert count(pc, 104, A.A, D.FORWARD) == 1
        assert count(pc, 100, A.A, D.REVERSE) == 0

    def test_reverse_strand_direction(self):
        _, pc = build([dict(pos1=100, cigar="3M", seq="AAA", qual=30, flag=0x10)])
        assert count(pc, 100, A.A, D.REVERSE) == 1
        assert count(pc, 100, A.A, D.FORWARD) == 0

    def test_low_quality_counts_as_n(self):
        _, pc = build([dict(pos1=100, cigar="3M", seq="AAA", qual=[30, 10, 30])])
        assert count(pc, 101, A.A, D.FORWARD) == 0
        assert count(pc, 101, A.N, D.FORWARD) == 1

    def test_softclip_not_counted(self):
        _, pc = build([dict(pos1=100, cigar="2S3M", seq="CCAAA", qual=30)])
        assert count(pc, 98, A.C, D.FORWARD) == 0
        assert count(pc, 100, A.A, D.FORWARD) == 1

    def test_insertion_bases_not_counted(self):
        _, pc = build([dict(pos1=100, cigar="2M2I2M", seq="AACCAA", qual=30)])
        for p in (100, 101, 102, 103):
            assert count(pc, p, A.A, D.FORWARD) == 1
        assert pc.counts_t[..., int(A.C), :].sum() == 0

    def test_deletion_gap_counts(self):
        _, pc = build([dict(pos1=100, cigar="2M3D2M", seq="AAAA", qual=30)])
        for p in (102, 103, 104):
            assert count(pc, p, A.DELETION, D.FORWARD) == 1
        assert count(pc, 101, A.DELETION, D.FORWARD) == 0

    def test_deletion_gap_skipped_when_low_quality(self):
        _, pc = build([dict(pos1=100, cigar="2M3D2M", seq="AAAA",
                            qual=[30, 10, 30, 30])])
        assert count(pc, 102, A.DELETION, D.FORWARD) == 0

    def test_terminal_deletion(self):
        _, pc = build([dict(pos1=100, cigar="3M2D", seq="AAA", qual=30)])
        assert count(pc, 103, A.DELETION, D.FORWARD) == 1
        assert count(pc, 104, A.DELETION, D.FORWARD) == 1

    def test_terminal_deletion_before_softclip(self):
        _, pc = build([dict(pos1=100, cigar="3M2D2S", seq="AAACC", qual=30)])
        assert count(pc, 103, A.DELETION, D.FORWARD) == 1
        assert count(pc, 104, A.DELETION, D.FORWARD) == 1

    def test_qual_sums(self):
        _, pc = build([dict(pos1=100, cigar="2M", seq="AA", qual=[20, 30])])
        src = AlleleSource(pc)
        assert src.get_sum_of_base_qualities(100, int(A.A), 0) == pytest.approx(0.01)
        assert src.get_sum_of_base_qualities(101, int(A.A), 0) == pytest.approx(0.001)


class TestAnchors:
    def test_anchor_index_vector(self):
        # read at [100, 109] (10 bases), anchor size 5
        gpos = np.arange(100, 110, dtype=np.int64)
        idx = anchor_indexes(gpos, np.full(10, 100), np.full(10, 109), 5)
        # left anchors 0..4; from index 5 on the right side is smaller
        # (right anchor 4..0 -> index 2A-right = 6..10); nothing is
        # well-anchored in a 10bp read with A=5
        assert list(idx) == [0, 1, 2, 3, 4, 6, 7, 8, 9, 10]

    def test_anchor_window_sum_brute_force(self):
        rng = np.random.default_rng(0)
        vec = rng.integers(0, 10, size=11).astype(np.int64)
        a = 5
        k = 11

        def brute(min_anchor, max_anchor, from_end, symmetric):
            well = a
            true_min = min(well, min_anchor)
            if max_anchor is None:
                initial_max = well
            elif max_anchor >= well:
                initial_max = well - 1
            else:
                initial_max = max_anchor
            tot = 0
            if from_end:
                for i in range(true_min, initial_max + 1):
                    tot += vec[k - i - 1]
                if max_anchor is None:
                    for i in range(true_min if symmetric else 0, initial_max):
                        tot += vec[i]
            else:
                for i in range(true_min, initial_max + 1):
                    tot += vec[i]
                if max_anchor is None:
                    for i in range(initial_max + 1,
                                   (k - true_min) if symmetric else k):
                        tot += vec[i]
            return tot

        for min_anchor in range(0, 7):
            for max_anchor in [None, 0, 2, 5, 6]:
                for from_end in (False, True):
                    for symmetric in (False, True):
                        got = anchor_window_sum(vec, a, min_anchor, max_anchor,
                                                from_end, symmetric)
                        want = brute(min_anchor, max_anchor, from_end, symmetric)
                        assert got == want, (min_anchor, max_anchor, from_end,
                                             symmetric)


class TestDeviceParity:
    def test_host_device_counts_agree(self):
        rng = np.random.default_rng(1)
        reads = []
        for _ in range(100):
            pos = int(rng.integers(1, 3000))
            reads.append(dict(
                pos1=pos,
                cigar=rng.choice(["10M", "5M2D5M", "4M2I4M", "3S7M", "8M2D"]),
                seq="ACGTACGTACGT"[:10],
                qual=int(rng.integers(10, 40)),
                flag=int(rng.choice([0, 0x10]))))
        ev, pc_host = build(reads)
        _, pc_dev = build(reads, device=True)
        np.testing.assert_array_equal(pc_host.block_keys, pc_dev.block_keys)
        np.testing.assert_array_equal(pc_host.counts_t, pc_dev.counts_t)
        np.testing.assert_allclose(pc_host.qual_t, pc_dev.qual_t,
                                   rtol=1e-5, atol=1e-7)


class TestBlockTiling:
    def test_block_boundaries(self):
        # read straddling the block edge at 1000/1001
        _, pc = build([dict(pos1=998, cigar="6M", seq="AAAAAA", qual=30)])
        assert set(pc.block_keys) == {1, 2}
        for p in (998, 999, 1000, 1001, 1002, 1003):
            assert count(pc, p, A.A, D.FORWARD) == 1
        assert count(pc, 1004, A.A, D.FORWARD) == 0


class TestExactCoverage:
    def test_spanning_deletion_counts_reads(self):
        from pisces_tpu.domain.types import AlleleCategory
        from pisces_tpu.ops.exact_coverage import (
            build_read_summaries, exact_spanning_coverage,
        )
        from pisces_tpu.calling.source import AlleleSource
        # 3 reads spanning a 2bp deletion at 105-106, 1 read not spanning
        reads = [
            dict(pos1=100, cigar="5M2D5M", seq="AAAAAAAAAA", qual=30),
            dict(pos1=101, cigar="4M2D6M", seq="AAAAAAAAAA", qual=30),
            dict(pos1=100, cigar="12M", seq="AAAAAAAAAAAA", qual=30,
                 flag=0x10),
            dict(pos1=108, cigar="5M", seq="AAAAA", qual=30),  # starts after
        ]
        batch = make_batch(reads)
        keep = np.ones(batch.n, bool)
        ev = build_base_events(batch, keep, 20, 5)
        pc = build_counts_host(ev)
        src = AlleleSource(pc)
        summaries = build_read_summaries(batch, keep)
        cov_dir, total, ref_sup, _ = exact_spanning_coverage(
            src, summaries, AlleleCategory.DELETION, 104, 2, 2)
        assert total == 3
        assert cov_dir[0] == 2 and cov_dir[1] == 1
        assert ref_sup == 1
