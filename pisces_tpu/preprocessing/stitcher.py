"""Read-pair stitching: merge overlapping R1/R2 into one stitched read.

Port of the StitchingLogic layer (BasicStitcher.TryStitch
BasicStitcher.cs:68-211, CigarReconciler site-by-site reconciliation,
ReadMerger base/quality consensus with N-ify of disagreements,
OverlapEvaluator homopolymer-bridge rejection). The stitched read carries an
XD direction string (F/S/R segments) consumed by the caller's stitched
pileup path.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

MAX_BASE_QUALITY = 93
OP_M, OP_I, OP_D, OP_N, OP_S = 0, 1, 2, 3, 4


@dataclass
class StitchedRead:
    pos1: int                 # 1-based leftmost mapped position
    cigar: List[Tuple[int, int]]
    seq: str
    qual: List[int]
    xd: str                   # direction string over expanded read
    num_agreements: int
    num_disagreements: int
    num_n_disagreements: int


@dataclass
class _Item:
    """One expanded base/op slot keyed by reference walk position."""
    key: Tuple[int, int, int]   # (ref_pos, phase, ins_index); phase orders I before M at same pos boundary
    op: int
    base: Optional[str]
    qual: Optional[int]


def _expand(pos1: int, cigar: List[Tuple[int, int]], seq: str,
            quals, use_softclipped: bool) -> List[_Item]:
    """Expand a read to reference-anchored items. Softclips get imputed
    (clip-adjusted) reference positions so they can participate in overlap."""
    items: List[_Item] = []
    ref = pos1  # next reference position to consume
    idx = 0
    for op, ln in cigar:
        if op == OP_S:
            # impute positions: leading clips anchor before `ref`
            start = ref - ln
            for k in range(ln):
                items.append(_Item((start + k, 1, 0),
                                   OP_S if not use_softclipped else OP_M,
                                   seq[idx], int(quals[idx])))
                idx += 1
            # trailing softclip: ref already advanced past the M ops;
            # start = ref - ln is wrong for trailing. Handled by caller
            # passing leading/trailing separately? Simpler: leading iff
            # items empty before this op; we fix trailing below.
        elif op in (OP_M, 7, 8):
            for k in range(ln):
                items.append(_Item((ref, 1, 0), OP_M, seq[idx], int(quals[idx])))
                ref += 1
                idx += 1
        elif op == OP_I:
            for k in range(ln):
                items.append(_Item((ref, 0, k), OP_I, seq[idx], int(quals[idx])))
                idx += 1
        elif op in (OP_D, OP_N):
            for k in range(ln):
                items.append(_Item((ref, 1, 0), OP_D, None, None))
                ref += 1
    return items


def _expand_fix_clips(pos1, cigar, seq, quals, use_softclipped):
    """Correct trailing softclip anchoring after naive expansion."""
    items = _expand(pos1, cigar, seq, quals, use_softclipped)
    # find trailing soft-clip run in cigar to re-anchor
    if cigar and cigar[-1][0] == OP_S:
        ln = cigar[-1][1]
        tail = items[-ln:]
        ref_end = max((it.key[0] for it in items[:-ln] if it.op != OP_I),
                      default=pos1 - 1)
        for k, it in enumerate(tail):
            it.key = (ref_end + 1 + k, it.key[1], it.key[2])
    return items


def stitch_reads(pos1_r1: int, cigar1, seq1: str, qual1,
                 pos1_r2: int, cigar2, seq2: str, qual2,
                 r1_is_reverse: bool = False,
                 min_base_quality: int = 20,
                 nify_disagreements: bool = True,
                 use_softclipped_bases: bool = True,
                 dont_stitch_homopolymer_bridge: bool = True,
                 max_read_length: int = 1024) -> Optional[StitchedRead]:
    """Attempt to stitch two overlapping mates; None if unstitchable.

    cigar: list of (op_code, length). r1 is the leftmost mate by position.
    """
    # order mates so read A is leftmost
    if pos1_r2 < pos1_r1:
        return stitch_reads(pos1_r2, cigar2, seq2, qual2,
                            pos1_r1, cigar1, seq1, qual1,
                            not r1_is_reverse, min_base_quality,
                            nify_disagreements, use_softclipped_bases,
                            dont_stitch_homopolymer_bridge, max_read_length)

    a = _expand_fix_clips(pos1_r1, list(cigar1), seq1, qual1, use_softclipped_bases)
    b = _expand_fix_clips(pos1_r2, list(cigar2), seq2, qual2, use_softclipped_bases)
    if not a or not b:
        return None

    a_keys = {it.key for it in a}
    b_keys = {it.key for it in b}
    overlap_keys = a_keys & b_keys
    if not overlap_keys:
        return None  # not stitchable

    # reconcile: in the overlap the op structure must agree
    a_by_key = {it.key: it for it in a}
    b_by_key = {it.key: it for it in b}
    for key in overlap_keys:
        if a_by_key[key].op != b_by_key[key].op:
            return None
    # insertion length consistency: an insertion at a shared boundary must
    # have the same length in both reads
    a_ins = {}
    b_ins = {}
    for it in a:
        if it.op == OP_I:
            a_ins[it.key[0]] = a_ins.get(it.key[0], 0) + 1
    for it in b:
        if it.op == OP_I:
            b_ins[it.key[0]] = b_ins.get(it.key[0], 0) + 1
    min_a = min(k[0] for k in b_keys)
    max_b = max(k[0] for k in a_keys)
    for rp, ln in a_ins.items():
        if min_a <= rp <= max_b and rp in b_ins and b_ins[rp] != ln:
            return None
        if min_a < rp <= max_b and rp not in b_ins:
            return None  # insertion missing from the other read's overlap
    for rp, ln in b_ins.items():
        if min_a <= rp < max_b and rp not in a_ins:
            return None

    # merge: union of items in key order; consensus in overlap
    all_keys = sorted(a_keys | b_keys)
    if len(all_keys) > max_read_length:
        return None
    seq_out: List[str] = []
    qual_out: List[int] = []
    cigar_out: List[Tuple[int, int]] = []
    xd_parts: List[str] = []
    n_agree = n_disagree = n_ndis = 0

    dir_a = "R" if r1_is_reverse else "F"
    dir_b = "F" if r1_is_reverse else "R"

    def push_cigar(op):
        if cigar_out and cigar_out[-1][0] == op:
            cigar_out[-1] = (op, cigar_out[-1][1] + 1)
        else:
            cigar_out.append((op, 1))

    def push_xd(d):
        xd_parts.append(d)

    pos_out = None
    for key in all_keys:
        ia = a_by_key.get(key)
        ib = b_by_key.get(key)
        if ia is not None and ib is not None:
            op = ia.op
            d = "S"
            if op == OP_D:
                base, q = None, None
            else:
                b1, q1 = ia.base, ia.qual
                b2, q2 = ib.base, ib.qual
                if b1 == b2:
                    base, q = b1, min(q1 + q2, MAX_BASE_QUALITY)
                    n_agree += 1
                elif b2 == "N" or q2 == 0:
                    base, q = b1, q1
                    n_ndis += 1
                elif b1 == "N" or q1 == 0:
                    base, q = b2, q2
                    n_ndis += 1
                elif nify_disagreements:
                    base, q = "N", 0
                    n_disagree += 1
                else:
                    if q1 >= q2:
                        base, q = b1, (q1 if q2 < min_base_quality else 0)
                    else:
                        base, q = b2, (q2 if q1 < min_base_quality else 0)
                    n_disagree += 1
        else:
            it = ia if ia is not None else ib
            op = it.op
            d = dir_a if ia is not None else dir_b
            base, q = it.base, it.qual

        if op == OP_D:
            push_cigar(OP_D)
            push_xd(d)
            continue
        seq_out.append(base)
        qual_out.append(q)
        push_cigar(OP_M if op in (OP_M, OP_S) else op)
        push_xd(d)
        if pos_out is None and op == OP_M:
            pos_out = key[0]

    if pos_out is None:
        return None

    # homopolymer-bridge rejection (OverlapEvaluator.BridgeAnchored)
    if dont_stitch_homopolymer_bridge:
        overlap_bases = "".join(
            (a_by_key[k].base or "") for k in all_keys
            if k in a_keys and k in b_keys and a_by_key[k].op != OP_D)
        if not bridge_anchored(overlap_bases):
            return None

    # compress XD
    xd = ""
    run_d = None
    run_n = 0
    for d in xd_parts:
        if d == run_d:
            run_n += 1
        else:
            if run_d is not None:
                xd += f"{run_n}{run_d}"
            run_d = d
            run_n = 1
    if run_d is not None:
        xd += f"{run_n}{run_d}"

    # leading/trailing insertions relative to first M become softclips
    return StitchedRead(pos_out, cigar_out, "".join(seq_out), qual_out, xd,
                        n_agree, n_disagree, n_ndis)


def is_repeat(overlap: str, max_unit: int = 3) -> bool:
    """OverlapEvaluator.IsRepeat: overlap consists of tandem repeats of a
    short unit (allowing a trailing partial repeat)."""
    n = len(overlap)
    for unit_len in range(1, min(n - 1, max_unit) + 1):
        for start in range(0, n - unit_len + 1):
            unit = overlap[start:start + unit_len]
            if len(unit) < unit_len:
                continue
            if n == unit_len:
                continue
            whole = n // unit_len
            base_seq = unit * whole
            if overlap == base_seq:
                return True
            if overlap.startswith(base_seq):
                rest = overlap[len(base_seq):]
                if rest and unit.startswith(rest):
                    return True
    return False


def bridge_anchored(overlap_bases: str) -> bool:
    """OverlapEvaluator.BridgeAnchored(string)."""
    if len(overlap_bases) <= 3:
        return True
    return not is_repeat(overlap_bases)
