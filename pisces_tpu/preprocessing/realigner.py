"""Targeted indel realignment.

Functional port of the ReadRealignmentLogic layer (ReadRealigner.Realign
tries candidate indel placements against both anchors,
BasicAlignmentComparer scores by mismatch/indel counts) used by the
Gemini-equivalent preprocessing pipeline: reads near candidate indels are
re-laid-out against each indel (and coexisting pairs) and the best-scoring
alignment wins if strictly better than the original.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

from pisces_tpu.domain.types import AlleleCategory

OP_M, OP_I, OP_D, OP_N, OP_S = 0, 1, 2, 3, 4
HIGH_FREQUENCY_INDEL_CUTOFF = 0.3


@dataclass(frozen=True)
class CandidateIndel:
    """A candidate indel target (position is the 1-based vcf coordinate of
    the base before the event)."""
    chromosome: str
    position: int
    ref_allele: str
    alt_allele: str

    @property
    def category(self) -> AlleleCategory:
        return (AlleleCategory.INSERTION if len(self.alt_allele) > len(self.ref_allele)
                else AlleleCategory.DELETION)

    @property
    def length(self) -> int:
        return abs(len(self.alt_allele) - len(self.ref_allele))

    @property
    def bases(self) -> str:
        return (self.alt_allele[1:] if self.category == AlleleCategory.INSERTION
                else self.ref_allele[1:])


@dataclass
class RealignmentResult:
    pos1: int
    cigar: List[Tuple[int, int]]
    num_mismatches: int
    num_indels: int
    num_softclips: int
    accepted_indels: List[CandidateIndel]

    def score(self) -> Tuple[int, int, int]:
        return (self.num_mismatches, self.num_indels, self.num_softclips)


def _count_mismatches_layout(seq: str, pos1: int, segments, refseq) -> Optional[int]:
    """Count mismatches for a layout of (op, length) segments at pos1.
    Returns None if the layout runs off the reference."""
    mism = 0
    ref_i = pos1 - 1
    read_i = 0
    n_ref = len(refseq)
    for op, ln in segments:
        if op == OP_M:
            if ref_i + ln > n_ref or ref_i < 0:
                return None
            for k in range(ln):
                if seq[read_i + k] != chr(refseq[ref_i + k]):
                    mism += 1
            ref_i += ln
            read_i += ln
        elif op == OP_I:
            read_i += ln
        elif op == OP_D:
            ref_i += ln
        elif op == OP_S:
            read_i += ln
    return mism


def _evaluate_original(pos1: int, cigar, seq: str, refseq) -> RealignmentResult:
    mism = _count_mismatches_layout(seq, pos1, cigar, refseq)
    n_indels = sum(1 for op, _ in cigar if op in (OP_I, OP_D))
    n_soft = sum(ln for op, ln in cigar if op == OP_S)
    return RealignmentResult(pos1, list(cigar), mism if mism is not None else 1 << 30,
                             n_indels, n_soft, [])


def _layout_with_indels(pos1: int, read_len: int,
                        indels: Sequence[CandidateIndel],
                        anchor_left: bool) -> Optional[Tuple[int, List[Tuple[int, int]]]]:
    """Build a (start, cigar) layout placing `indels` (sorted by position)
    inside a read of read_len bases, anchored at pos1 on the chosen side.
    For anchor_left, pos1 is the first reference position of the read; for
    anchor_right, pos1 is the LAST reference position of the read."""
    indels = sorted(indels, key=lambda c: c.position)
    if anchor_left:
        start = pos1
        segs: List[Tuple[int, int]] = []
        read_used = 0
        ref_cursor = start
        for ind in indels:
            m = ind.position - ref_cursor + 1  # bases up to and incl. anchor base
            if m <= 0 or read_used + m >= read_len:
                return None
            segs.append((OP_M, m))
            read_used += m
            ref_cursor += m
            if ind.category == AlleleCategory.INSERTION:
                ins = min(ind.length, read_len - read_used)
                if ins <= 0:
                    return None
                segs.append((OP_I, ins))
                read_used += ins
                if ins < ind.length:
                    break
            else:
                segs.append((OP_D, ind.length))
                ref_cursor += ind.length
        rest = read_len - read_used
        if rest > 0:
            segs.append((OP_M, rest))
        elif segs and segs[-1][0] == OP_D:
            return None  # can't end in deletion
        return start, segs
    else:
        # anchor right: build from the end backwards
        end = pos1
        segs_rev: List[Tuple[int, int]] = []
        read_used = 0
        ref_cursor = end
        for ind in sorted(indels, key=lambda c: -c.position):
            if ind.category == AlleleCategory.INSERTION:
                m = ref_cursor - ind.position  # bases after the insertion point
                if m <= 0 or read_used + m >= read_len:
                    return None
                segs_rev.append((OP_M, m))
                read_used += m
                ref_cursor -= m
                ins = min(ind.length, read_len - read_used)
                if ins <= 0:
                    return None
                segs_rev.append((OP_I, ins))
                read_used += ins
            else:
                m = ref_cursor - (ind.position + ind.length)
                if m <= 0 or read_used + m >= read_len:
                    return None
                segs_rev.append((OP_M, m))
                read_used += m
                ref_cursor -= m
                segs_rev.append((OP_D, ind.length))
                ref_cursor -= ind.length
        rest = read_len - read_used
        if rest <= 0:
            return None
        segs_rev.append((OP_M, rest))
        start = ref_cursor - rest + 1
        return start, list(reversed(segs_rev))


def can_coexist(i1: CandidateIndel, i2: CandidateIndel) -> bool:
    """ReadRealigner.CanCoexist: indels must not overlap."""
    if i1.position > i2.position:
        i1, i2 = i2, i1
    end1 = i1.position + (i1.length if i1.category == AlleleCategory.DELETION else 0)
    return end1 < i2.position


def realign_read(pos1: int, cigar, seq: str, refseq: np.ndarray,
                 targets: List[CandidateIndel],
                 max_indel_size: int = 50,
                 try_two: bool = True) -> Optional[RealignmentResult]:
    """Try realigning one read against candidate indels; returns the new
    alignment when strictly better than the original (fewer mismatches,
    then fewer softclips), else None."""
    read_len = len(seq)
    lead_clip = cigar[0][1] if cigar and cigar[0][0] == OP_S else 0
    left = pos1 - lead_clip - 3 * max_indel_size
    right = pos1 + read_len + 3 * max_indel_size
    proximal = [t for t in targets if left <= t.position <= right]
    if not proximal:
        return None

    original = _evaluate_original(pos1, cigar, seq, refseq)
    # realignment candidates use the full read incl. softclip bases as M
    unclipped_start = pos1 - lead_clip

    best: Optional[RealignmentResult] = None

    def consider(indels, anchor_left):
        nonlocal best
        anchor = unclipped_start if anchor_left else unclipped_start + read_len - 1
        lay = _layout_with_indels(anchor, read_len, indels, anchor_left)
        if lay is None:
            return
        start, segs = lay
        # indel must actually be inside the read
        mism = _count_mismatches_layout(seq, start, segs, refseq)
        if mism is None:
            return
        n_indels = sum(1 for op, _ in segs if op in (OP_I, OP_D))
        res = RealignmentResult(start, segs, mism, n_indels, 0, list(indels))
        if best is None or res.score() < best.score():
            best = res

    for t in proximal:
        consider([t], True)
        consider([t], False)
    if try_two and len(proximal) > 1:
        for i in range(len(proximal)):
            for j in range(i + 1, len(proximal)):
                if can_coexist(proximal[i], proximal[j]):
                    consider([proximal[i], proximal[j]], True)
                    consider([proximal[i], proximal[j]], False)

    if best is None:
        return None
    # BasicAlignmentComparer acceptance: strictly fewer mismatches wins;
    # equal mismatches wins only by absorbing softclips without extra indels
    if best.num_mismatches < original.num_mismatches:
        return best
    if (best.num_mismatches == original.num_mismatches
            and best.num_softclips < original.num_softclips
            and best.num_indels <= original.num_indels):
        return best
    return None
