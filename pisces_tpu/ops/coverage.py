"""Coverage reconciliation (CoverageCalculator semantics).

Single-point coverage (reference alleles / SNVs) and spanning coverage
(deletion / MNV / insertion) per src/lib/Pisces.Calculators/CoverageCalculator.cs.
The dense single-point path is vectorized over positions; the spanning path is
per-candidate (variants are sparse).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from pisces_tpu.domain.types import (
    COVERAGE_CONTRIBUTING_ALLELES, NUM_DIRECTION_TYPES, AlleleCategory,
    AlleleType, DirectionType, get_allele_type,
)
from pisces_tpu.calling.source import AlleleSource

_COV_ALLELES = [int(a) for a in COVERAGE_CONTRIBUTING_ALLELES]


@dataclass
class CoverageResult:
    total_coverage: int = 0
    coverage_by_direction: np.ndarray = field(
        default_factory=lambda: np.zeros(NUM_DIRECTION_TYPES, dtype=np.int64))
    reference_support: int = 0
    num_no_calls: int = 0
    sum_of_base_quality: float = 0.0
    confident_coverage_start: int = 0
    confident_coverage_end: int = 0
    suspicious_coverage_start: int = 0
    suspicious_coverage_end: int = 0
    unanchored_coverage_weight: float = 0.0
    allele_support_adjustment: int = 0  # gapped-mnv adjustment for Reference alleles


def single_point_coverage(source: AlleleSource, position: int, ref_base: str,
                          category: AlleleCategory,
                          allele_support: int) -> CoverageResult:
    """CoverageCalculator.CalculateSinglePoint (cs:49-98)."""
    res = CoverageResult()
    ref_type = int(get_allele_type(ref_base[0]))
    # one row fetch for the position; the loop below preserves the
    # reference's exact accumulation order (float-sum parity)
    rows = source.flat_rows(position)
    if rows is None:
        crow = [[0] * 3 for _ in range(6)]
        qrow = [[0.0] * 3 for _ in range(6)]
    else:
        crow = rows[0].tolist()
        qrow = rows[1].tolist()
    n_type = int(AlleleType.N)
    for d in range(NUM_DIRECTION_TYPES):
        for a in _COV_ALLELES:
            c = crow[a][d]
            res.coverage_by_direction[d] += c
            res.sum_of_base_quality += qrow[a][d]
            if a == ref_type:
                res.reference_support += c
        res.total_coverage += int(res.coverage_by_direction[d])
        res.confident_coverage_start += int(res.coverage_by_direction[d])
        res.confident_coverage_end += int(res.coverage_by_direction[d])
        res.num_no_calls += crow[n_type][d]

    gapped = source.get_gapped_mnv_ref_count(position)
    if category == AlleleCategory.SNV:
        res.reference_support = max(0, res.reference_support - gapped)
    elif category == AlleleCategory.REFERENCE:
        res.allele_support_adjustment = -min(gapped, allele_support)
    return res


def _redistribute_stitched(cov: np.ndarray) -> None:
    st = int(cov[DirectionType.STITCHED])
    cov[DirectionType.FORWARD] += math.ceil(st / 2)
    cov[DirectionType.REVERSE] += st // 2
    cov[DirectionType.STITCHED] = 0


def spanning_coverage(source: AlleleSource, category: AlleleCategory,
                      position: int, ref_allele: str, alt_allele: str,
                      allele_support: int, well_anchored_support: int,
                      consider_anchor_information: bool) -> CoverageResult:
    """CoverageCalculator.CalculateSpanning (cs:171-331)."""
    length = (len(alt_allele) - 1 if category == AlleleCategory.INSERTION
              else len(ref_allele) - 1 if category == AlleleCategory.DELETION
              else len(alt_allele))
    if category == AlleleCategory.DELETION:
        start_pos, end_pos = position + 1, position + length
        presume_anchored = True
    elif category == AlleleCategory.MNV:
        start_pos, end_pos = position, position + length - 1
        presume_anchored = True
    else:  # insertion
        start_pos, end_pos = position, position + 1
        presume_anchored = source.expect_stitched_reads

    res = CoverageResult()
    start_cov = np.zeros(3, dtype=np.int64)
    end_cov = np.zeros(3, dtype=np.int64)
    start_cov_unanch = np.zeros(3, dtype=np.int64)
    end_cov_unanch = np.zeros(3, dtype=np.int64)
    unanch_start_qual = 0.0
    unanch_end_qual = 0.0
    conf_l = conf_r = susp_l = susp_r = 0

    be_picky = consider_anchor_information and category == AlleleCategory.INSERTION
    if be_picky:
        first_base = int(get_allele_type(alt_allele[1]))
        last_base = int(get_allele_type(alt_allele[-1]))
    else:
        first_base = last_base = int(AlleleType.N)

    unanchored_support = allele_support - well_anchored_support

    if not be_picky:
        # all queries are full-range: fetch both rows once and replay the
        # same (d, a) accumulation order (float-sum parity with the
        # per-call path); accumulators are plain ints — the generic path's
        # per-cell numpy scalar in-place adds measured ~1.1s of a 2M-read
        # WGS window sweep on their own
        rs = source.flat_rows(start_pos)
        re_ = source.flat_rows(end_pos)
        zc = [[0] * 3 for _ in range(6)]
        zq = [[0.0] * 3 for _ in range(6)]
        cs, qs = (rs[0].tolist(), rs[1].tolist()) if rs else (zc, zq)
        ce, qe = (re_[0].tolist(), re_[1].tolist()) if re_ else (zc, zq)
        sum_q = res.sum_of_base_quality
        s0 = s1 = s2 = e0 = e1 = e2 = 0
        for a in _COV_ALLELES:
            ca_ = cs[a]
            cb_ = ce[a]
            qa_ = qs[a]
            qb_ = qe[a]
            s0 += ca_[0]
            e0 += cb_[0]
            s1 += ca_[1]
            e1 += cb_[1]
            s2 += ca_[2]
            e2 += cb_[2]
        # float sums keep the reference's (d, a) interleaved order
        for d in range(NUM_DIRECTION_TYPES):
            for a in _COV_ALLELES:
                sum_q += qs[a][d]
                sum_q += qe[a][d]
        res.sum_of_base_quality = sum_q
        conf_l += s0 + s1 + s2
        conf_r += e0 + e1 + e2
        # _redistribute_stitched on plain ints
        s0 += -(-s2 // 2)
        s1 += s2 // 2
        e0 += -(-e2 // 2)
        e1 += e2 // 2
        exact_total = np.float32(0.0)
        for d, (sc_d, ec_d) in enumerate(((s0, e0), (s1, e1))):
            if presume_anchored:
                exact = np.float32(sc_d + ec_d) / np.float32(2.0)
            else:
                exact = np.float32(min(sc_d, ec_d))
            res.coverage_by_direction[d] = int(exact)
            exact_total += exact
        res.total_coverage = int(exact_total)
        res.reference_support = max(0, res.total_coverage - allele_support)
        res.suspicious_coverage_start = susp_l
        res.confident_coverage_start = conf_l
        res.suspicious_coverage_end = susp_r
        res.confident_coverage_end = conf_r
        return res

    for d in range(NUM_DIRECTION_TYPES):
        for a in _COV_ALLELES:
            anchored_only_end = be_picky and a == first_base
            anchored_only_start = be_picky and a == last_base
            min_anchor_end = length if anchored_only_end else 0
            min_anchor_start = length if anchored_only_start else 0

            sc = source.get_allele_count(start_pos, a, d, min_anchor_start)
            start_cov[d] += sc
            ec = source.get_allele_count(end_pos, a, d, min_anchor_end, from_end=True)
            end_cov[d] += ec
            conf_l += sc
            conf_r += ec
            res.sum_of_base_quality += source.get_sum_of_base_qualities(
                start_pos, a, d, min_anchor_start)
            res.sum_of_base_quality += source.get_sum_of_base_qualities(
                end_pos, a, d, min_anchor_end, from_end=True)

            if be_picky and unanchored_support > 0:
                if min_anchor_start > 0:
                    u = source.get_allele_count(start_pos, a, d, 0,
                                                max_anchor=min_anchor_start - 1)
                    start_cov_unanch[d] += u
                    susp_l += u
                    unanch_start_qual += source.get_sum_of_base_qualities(
                        start_pos, a, d, 0, max_anchor=min_anchor_start - 1)
                if min_anchor_end > 0:
                    u = source.get_allele_count(end_pos, a, d, 0, from_end=True,
                                                max_anchor=min_anchor_end - 1)
                    end_cov_unanch[d] += u
                    susp_r += u
                    # NOTE: reference reads the *start* position here
                    # (CoverageCalculator.cs:262-263); reproduced for parity.
                    unanch_end_qual += source.get_sum_of_base_qualities(
                        start_pos, a, d, 0, from_end=True,
                        max_anchor=min_anchor_end - 1)

    if be_picky:
        truly_anchored = ((conf_l - susp_r) + (conf_r - susp_l)) / 2.0
        anchored_vf = 0.0 if truly_anchored <= 0 else well_anchored_support / truly_anchored
        total_susp = susp_l + susp_r
        unanch_vf = 0.0 if total_susp == 0 else unanchored_support / float(total_susp)
        weight = max(0.0, 1.0 if anchored_vf == 0 else min(1.0, unanch_vf / anchored_vf))
        res.unanchored_coverage_weight = weight
        for d in range(NUM_DIRECTION_TYPES):
            start_cov[d] += int(start_cov_unanch[d] * weight)
            end_cov[d] += int(end_cov_unanch[d] * weight)
            # reference adds these inside the direction loop (3x);
            # reproduced for parity (CoverageCalculator.cs:295-297)
            res.sum_of_base_quality += unanch_start_qual * weight
            res.sum_of_base_quality += unanch_end_qual * weight

    _redistribute_stitched(start_cov)
    _redistribute_stitched(end_cov)

    exact_total = np.float32(0.0)
    for d in range(2):
        if presume_anchored:
            exact = np.float32(int(start_cov[d]) + int(end_cov[d])) / np.float32(2.0)
        else:
            exact = np.float32(min(int(start_cov[d]), int(end_cov[d])))
        res.coverage_by_direction[d] = int(exact)
        exact_total += exact

    res.total_coverage = int(exact_total)
    res.reference_support = max(0, res.total_coverage - allele_support)
    res.suspicious_coverage_start = susp_l
    res.confident_coverage_start = conf_l
    res.suspicious_coverage_end = susp_r
    res.confident_coverage_end = conf_r
    return res


def compute_coverage(source: AlleleSource, category: AlleleCategory, position: int,
                     ref_allele: str, alt_allele: str, allele_support: int,
                     well_anchored_support: int,
                     consider_anchor_information: bool) -> CoverageResult:
    """CoverageCalculator.Compute dispatch."""
    if category in (AlleleCategory.REFERENCE, AlleleCategory.SNV):
        return single_point_coverage(source, position, ref_allele, category,
                                     allele_support)
    if category in (AlleleCategory.DELETION, AlleleCategory.MNV,
                    AlleleCategory.INSERTION):
        return spanning_coverage(source, category, position, ref_allele, alt_allele,
                                 allele_support, well_anchored_support,
                                 consider_anchor_information)
    return single_point_coverage(source, position, ref_allele, category,
                                 allele_support)
