"""Columnar batch stitcher (stitch_pairs_columnar / native
stitch_pairs_batch) differential test: one batched native call must give
byte-identical results to the per-pair stitch_reads path for every pair,
across randomized cigars/sequences and the real Chr17Chr19 corpus (the
per-pair native path is itself differentially pinned to the Python port
in test_stitcher_native.py)."""
import random

import numpy as np
import pytest

import conftest  # noqa: F401
from pisces_tpu.io.bam import ReadBatch
from pisces_tpu.preprocessing import stitcher
from pisces_tpu.preprocessing.stitcher import (
    stitch_pairs_columnar, stitch_reads,
)
from test_stitcher_native import _rand_cigar, _read_span_of

_CODE = {"A": 0, "G": 1, "C": 2, "T": 3, "N": 4}


def _make_batch(reads):
    """reads: list of (pos1, cigar, seq_str, quals, flag)."""
    n = len(reads)
    cigar_off = [0]
    seq_off = [0]
    ops, lens, codes, quals = [], [], [], []
    pos = []
    flags = []
    for p1, cig, s, q, fl in reads:
        pos.append(p1 - 1)
        flags.append(fl)
        for op, ln in cig:
            ops.append(op)
            lens.append(ln)
        cigar_off.append(len(ops))
        codes.extend(_CODE[c] for c in s)
        quals.extend(q)
        seq_off.append(len(codes))
    return ReadBatch(
        n=n,
        ref_id=np.zeros(n, np.int32),
        pos=np.array(pos, np.int32),
        mapq=np.full(n, 60, np.uint8),
        flag=np.array(flags, np.uint16),
        cigar_off=np.array(cigar_off, np.int64),
        cigar_ops=np.array(ops, np.uint8),
        cigar_lens=np.array(lens, np.int32),
        seq_off=np.array(seq_off, np.int64),
        seq=np.array(codes, np.int8),
        qual=np.array(quals, np.uint8),
        end_pos=np.array(pos, np.int32),
    )


def test_batch_matches_per_pair_random():
    if stitcher._get_native() is None:
        pytest.skip("native library unavailable")
    rng = random.Random(77)
    bases = "ACGTN"
    reads = []
    pairs = []
    for t in range(400):
        len1 = rng.randint(5, 40)
        len2 = rng.randint(5, 40)
        c1 = _rand_cigar(rng, len1)
        c2 = _rand_cigar(rng, len2)
        len1, len2 = _read_span_of(c1), _read_span_of(c2)
        s1 = "".join(rng.choice(bases) for _ in range(len1))
        s2 = "".join(rng.choice(bases) for _ in range(len2))
        q1 = [rng.randint(0, 45) for _ in range(len1)]
        q2 = [rng.randint(0, 45) for _ in range(len2)]
        p1 = 1000
        p2 = 1000 + rng.randint(0, 30)
        f1 = (0x10 if rng.random() < 0.5 else 0) \
            | (0x40 if rng.random() < 0.5 else 0)
        reads.append((p1, c1, s1, q1, f1))
        reads.append((p2, c2, s2, q2, 0x10 ^ (f1 & 0x10)))
        pairs.append((len(reads) - 2, len(reads) - 1))
    batch = _make_batch(reads)
    idx1 = np.array([a for a, b in pairs], np.int64)
    idx2 = np.array([b for a, b in pairs], np.int64)
    ok, results = stitch_pairs_columnar(batch, idx1, idx2,
                                        min_base_quality=20)
    assert ok is not None
    n_stitched = 0
    for p, (a, b) in enumerate(pairs):
        p1, c1, s1, q1, f1 = reads[a]
        p2, c2, s2, q2, _ = reads[b]
        try:
            want = stitch_reads(p1, c1, s1, q1, p2, c2, s2, q2,
                                bool(f1 & 0x10), 20,
                                r1_is_first_mate=bool(f1 & 0x40))
            err = None
        except ValueError:
            want, err = None, "probe"
        rc = int(ok[p])
        got = results[p]
        if err == "probe":
            assert rc == -2, (p, rc)
            continue
        if rc < 0:
            # unsupported in native: per-pair path must also have fallen
            # back to Python — compare against that result is moot here
            continue
        if want is None:
            assert rc == 0, (p, rc, got)
        else:
            assert rc == 1, (p, rc)
            n_stitched += 1
            assert got.pos1 == want.pos1
            assert got.cigar == want.cigar
            assert got.seq == want.seq
            assert got.qual == want.qual
            assert got.xd == want.xd
            assert (got.num_agreements, got.num_disagreements,
                    got.num_n_disagreements) == \
                (want.num_agreements, want.num_disagreements,
                 want.num_n_disagreements)
    assert n_stitched > 50


def test_batch_matches_per_pair_chr17chr19():
    """Every real mate pair of the shipped Chr17Chr19 BAM through the
    batched call equals the per-pair path."""
    if stitcher._get_native() is None:
        pytest.skip("native library unavailable")
    from collections import defaultdict

    from pisces_tpu.io.bam import BamReader
    bam = conftest.shared_bam("Chr17Chr19.bam")
    reader = BamReader(bam)
    # per-chromosome like the gemini flow: a name pairs up WITHIN a
    # chromosome (this corpus maps every fragment on both chr17 and chr19)
    rid = reader.header.ref_index("chr19")
    b = reader.fetch(ref_id=rid, parse_names=True)
    by_name = defaultdict(list)
    for i in range(b.n):
        if b.flag[i] & 0x1:
            by_name[b.names[i]].append(i)
    pairs = [(m[0], m[1]) if b.pos[m[0]] <= b.pos[m[1]] else (m[1], m[0])
             for m in by_name.values() if len(m) == 2]
    assert len(pairs) >= 400
    idx1 = np.array([a for a, _ in pairs], np.int64)
    idx2 = np.array([c for _, c in pairs], np.int64)
    ok, results = stitch_pairs_columnar(b, idx1, idx2)
    from pisces_tpu.preprocessing.gemini import _read_tuple
    n_st = 0
    for p, (a, c) in enumerate(pairs):
        p1, c1, s1, q1 = _read_tuple(b, a)
        p2, c2, s2, q2 = _read_tuple(b, c)
        want = stitch_reads(p1, c1, s1, list(q1), p2, c2, s2, list(q2),
                            bool(b.flag[a] & 0x10),
                            r1_is_first_mate=bool(b.flag[a] & 0x40))
        rc = int(ok[p])
        if want is None:
            assert rc == 0, (p, rc)
        else:
            assert rc == 1
            got = results[p]
            n_st += 1
            assert (got.pos1, got.cigar, got.seq, got.qual, got.xd) == \
                (want.pos1, want.cigar, want.seq, want.qual, want.xd)
    assert n_st >= 400
