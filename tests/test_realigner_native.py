"""Differential test: native GetAlignmentSummary (io/_native/stitch.cpp
aln_summary) vs the Python reference port in preprocessing/realigner.py."""
import random

import pytest

from pisces_tpu.preprocessing import realigner as R

pytestmark = pytest.mark.skipif(
    R._get_aln_native() is None,
    reason="native aln_summary not built (make -C pisces_tpu/io/_native)")


def _rand_cigar(rng, read_len):
    ops = []
    rem = read_len
    if rng.random() < 0.4:
        n = rng.randint(1, 10)
        ops.append((4, n))
        rem -= n
    while rem > 0:
        r = rng.random()
        if r < 0.6:
            n = rng.randint(1, rem)
            ops.append((0, n))
            rem -= n
        elif r < 0.72:
            ops.append((2, rng.randint(1, 4)))
        elif r < 0.84:
            n = rng.randint(1, min(4, rem))
            ops.append((1, n))
            rem -= n
        else:
            n = rng.randint(1, rem)
            ops.append((4, n))
            rem -= n
            break
    return ops


FIELDS = ("num_matches", "num_mismatches", "num_mismatches_incl_softclip",
          "num_indels", "num_inserted_bases", "num_deleted_bases",
          "num_indel_bases", "num_softclips", "num_non_n_softclips",
          "anchor_length", "cigar")


def test_native_matches_python_fuzz():
    lib = R._get_aln_native()
    rng = random.Random(3)
    ref = "".join(rng.choice("ACGT") for _ in range(3000))
    for t in range(8000):
        rl = rng.randint(5, 60)
        cig = _rand_cigar(rng, rl)
        span = sum(ln for op, ln in cig if op in (0, 1, 4))
        seq = "".join(rng.choice("ACGTN") for _ in range(span))
        start = rng.randint(-5, 2990)
        check_sc = rng.random() < 0.7
        old = R._aln_native
        R._aln_native = False
        try:
            py = R.get_alignment_summary(start, cig, ref, seq, check_sc)
        finally:
            R._aln_native = old
        nat = R._summary_native(lib, start, cig, ref, seq, check_sc)
        if py is None:
            assert nat is None, (t, cig, start)
            continue
        assert nat is not None, (t, cig, start)
        for f in FIELDS:
            assert getattr(py, f) == getattr(nat, f), (t, f, cig, start)
