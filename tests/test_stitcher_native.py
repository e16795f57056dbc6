"""Differential tests: native stitcher (io/_native/stitch.cpp) vs the
Python reference implementation in preprocessing/stitcher.py.

The native port must be observationally IDENTICAL — same StitchedRead
fields, same None results, same raised errors — across the reference
scenario matrix shapes, randomized fuzz pairs, and every mate pair of the
reference's shipped real BAM (Chr17Chr19.bam)."""
import random

import numpy as np
import pytest

from pisces_tpu.preprocessing import stitcher
from pisces_tpu.preprocessing.stitcher import stitch_reads

pytestmark = pytest.mark.skipif(
    stitcher._get_native() is None,
    reason="native stitcher not built (make -C pisces_tpu/io/_native)")


def both_ways(*args, **kwargs):
    """Run stitch_reads with the native path then the Python path."""
    old = stitcher.USE_NATIVE
    try:
        stitcher.USE_NATIVE = True
        try:
            native = ("ok", stitch_reads(*args, **kwargs))
        except Exception as e:  # noqa: BLE001 - compare error behavior too
            native = ("err", type(e).__name__)
        stitcher.USE_NATIVE = False
        try:
            py = ("ok", stitch_reads(*args, **kwargs))
        except Exception as e:  # noqa: BLE001
            py = ("err", type(e).__name__)
    finally:
        stitcher.USE_NATIVE = old
    return native, py


def assert_same(native, py, ctx=""):
    assert native[0] == py[0], f"{ctx}: {native} vs {py}"
    if native[0] == "err":
        assert native[1] == py[1], ctx
        return
    n, p = native[1], py[1]
    if p is None:
        assert n is None, f"{ctx}: native stitched where python returned None"
        return
    assert n is not None, f"{ctx}: native None where python stitched"
    assert n.pos1 == p.pos1, ctx
    assert n.cigar == p.cigar, ctx
    assert n.seq == p.seq, ctx
    assert list(n.qual) == list(p.qual), ctx
    assert n.xd == p.xd, ctx
    assert n.num_agreements == p.num_agreements, ctx
    assert n.num_disagreements == p.num_disagreements, ctx
    assert n.num_n_disagreements == p.num_n_disagreements, ctx


def _rand_cigar(rng, read_len):
    """Random cigar over MIDS covering exactly read_len read bases."""
    ops = []
    remaining = read_len
    # optional prefix clip
    if rng.random() < 0.4:
        n = rng.randint(1, max(1, remaining // 3))
        ops.append((4, n))
        remaining -= n
    while remaining > 0:
        r = rng.random()
        if r < 0.6 or not ops or ops[-1][0] != 0:
            n = rng.randint(1, remaining)
            ops.append((0, n))
            remaining -= n
        elif r < 0.75:
            ops.append((2, rng.randint(1, 3)))  # D consumes no read bases
        elif r < 0.9:
            n = rng.randint(1, min(3, remaining))
            ops.append((1, n))
            remaining -= n
        else:
            n = rng.randint(1, remaining)
            ops.append((4, n))
            remaining -= n
            break
    # merge adjacent duplicates so cigars are well-formed-ish (python path
    # accepts either; keep both shapes in the mix)
    if rng.random() < 0.5:
        merged = []
        for op, ln in ops:
            if merged and merged[-1][0] == op:
                merged[-1] = (op, merged[-1][1] + ln)
            else:
                merged.append((op, ln))
        ops = merged
    return ops


def _read_span_of(cigar):
    return sum(ln for op, ln in cigar if op in (0, 1, 4))


class TestScenarios:
    def test_perfect_m_overlap(self):
        n, p = both_ways(100, [(0, 10)], "ACGTACGTAC", [30] * 10,
                         105, [(0, 10)], "CGTACGTACG", [30] * 10)
        assert_same(n, p)
        assert n[1] is not None

    def test_softclip_over_m(self):
        n, p = both_ways(100, [(0, 8), (4, 2)], "ACGTACGTAC", [30] * 10,
                         104, [(4, 2), (0, 8)], "ACGTACGTAC", [25] * 10)
        assert_same(n, p)

    def test_insertion_pair(self):
        n, p = both_ways(100, [(0, 4), (1, 2), (0, 4)], "ACGTTTACGT",
                         [30] * 10,
                         102, [(0, 2), (1, 2), (0, 6)], "GTTTACGTAA",
                         [30] * 10)
        assert_same(n, p)

    def test_deletion_pair(self):
        n, p = both_ways(100, [(0, 5), (2, 2), (0, 5)], "ACGTAACGTA",
                         [30] * 10,
                         103, [(0, 2), (2, 2), (0, 8)], "TAACGTACCA",
                         [30] * 10)
        assert_same(n, p)

    def test_disagreements_all_flag_combos(self):
        for nify in (True, False):
            for first in (True, False):
                for rev in (True, False):
                    n, p = both_ways(
                        100, [(0, 10)], "ACGTACGTAC", [30] * 10,
                        105, [(0, 10)], "CGTACTTACG", [20] * 10,
                        r1_is_reverse=rev, nify_disagreements=nify,
                        r1_is_first_mate=first)
                    assert_same(n, p, f"nify={nify} first={first} rev={rev}")

    def test_n_disagreement(self):
        n, p = both_ways(100, [(0, 10)], "ACGTACGTAC", [30] * 10,
                         105, [(0, 10)], "CGTANGTACG", [20] * 10,
                         nify_disagreements=False)
        assert_same(n, p)

    def test_threshold(self):
        for thresh in (0, 1, 2, None):
            n, p = both_ways(100, [(0, 10)], "ACGTACGTAC", [30] * 10,
                             105, [(0, 10)], "CTTACGAACG", [20] * 10,
                             threshold_num_disagreeing_bases=thresh,
                             nify_disagreements=False)
            assert_same(n, p, f"thresh={thresh}")

    def test_homopolymer_bridge(self):
        n, p = both_ways(100, [(0, 10)], "ACGTAAAAAA", [30] * 10,
                         104, [(0, 10)], "AAAAAATGCA", [30] * 10)
        assert_same(n, p)

    def test_swapped_input_order(self):
        n, p = both_ways(105, [(0, 10)], "CGTACGTACG", [30] * 10,
                         100, [(0, 10)], "ACGTACGTAC", [30] * 10,
                         r1_is_reverse=True)
        assert_same(n, p)


class TestFuzz:
    def test_random_pairs(self):
        rng = random.Random(1234)
        bases = "ACGTN"
        n_cases = 0
        n_stitched = 0
        for trial in range(3000):
            len1 = rng.randint(5, 40)
            len2 = rng.randint(5, 40)
            c1 = _rand_cigar(rng, len1)
            c2 = _rand_cigar(rng, len2)
            len1 = _read_span_of(c1)
            len2 = _read_span_of(c2)
            s1 = "".join(rng.choice(bases) for _ in range(len1))
            s2 = "".join(rng.choice(bases) for _ in range(len2))
            q1 = [rng.randint(0, 45) for _ in range(len1)]
            q2 = [rng.randint(0, 45) for _ in range(len2)]
            p1 = 1000
            p2 = 1000 + rng.randint(-15, 30)
            kwargs = dict(
                r1_is_reverse=rng.random() < 0.5,
                min_base_quality=rng.choice([10, 20, 30]),
                nify_disagreements=rng.random() < 0.5,
                use_softclipped_bases=rng.random() < 0.8,
                dont_stitch_homopolymer_bridge=rng.random() < 0.8,
                r1_is_first_mate=rng.random() < 0.5,
                ignore_probe_softclips=rng.random() < 0.8,
                threshold_num_disagreeing_bases=rng.choice([None, 0, 2, 50]),
                count_ns_toward_disagreements=rng.random() < 0.5,
            )
            n, p = both_ways(p1, c1, s1, q1, p2, c2, s2, q2, **kwargs)
            assert_same(n, p, f"trial={trial} c1={c1} c2={c2} p2={p2} "
                              f"kwargs={kwargs}")
            n_cases += 1
            if n[0] == "ok" and n[1] is not None:
                n_stitched += 1
        assert n_cases == 3000
        assert n_stitched > 100  # the fuzz actually exercises stitching


class TestRealBam:
    def test_chr17chr19_pairs(self):
        from collections import defaultdict

        from pisces_tpu.io.bam import BamReader
        from pisces_tpu.preprocessing.gemini import _read_tuple

        bam = ("/root/reference/src/test/SharedData/Bams/Chr17Chr19.bam")
        reader = BamReader(bam)
        batch = reader.fetch(None, parse_names=True)
        names = batch.names
        by_name = defaultdict(list)
        for i in range(batch.n):
            # the shipped BAM carries the same 500 fragments on chr17 AND
            # chr19 — key by (contig, name) so each entry is one mate pair
            by_name[(int(batch.ref_id[i]), names[i])].append(i)
        n_pairs = 0
        n_stitched = 0
        for name, members in by_name.items():
            if len(members) != 2:
                continue
            i1, i2 = members
            p1, c1, s1, q1 = _read_tuple(batch, i1)
            p2, c2, s2, q2 = _read_tuple(batch, i2)
            if p2 < p1:
                (p1, c1, s1, q1), (p2, c2, s2, q2) = \
                    (p2, c2, s2, q2), (p1, c1, s1, q1)
                i1, i2 = i2, i1
            rev = bool(batch.flag[i1] & 0x10)
            first = bool(batch.flag[i1] & 0x40)
            n, p = both_ways(p1, c1, s1, q1, p2, c2, s2, q2,
                             r1_is_reverse=rev, r1_is_first_mate=first)
            assert_same(n, p, name)
            n_pairs += 1
            if n[0] == "ok" and n[1] is not None:
                n_stitched += 1
        assert n_pairs == 1000
        assert n_stitched > 300
