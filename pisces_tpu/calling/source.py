"""AlleleSource: query facade over the pileup count tensors.

Provides the reference IAlleleSource contract (GetAlleleCount /
GetSumOfAlleleBaseQualities / GetGappedMnvRefCount) against the block-tiled
PileupCounts (RegionStateManager query side, cs:225-260). Full-anchor-range
queries hit the dense totals; anchor-windowed queries hit the sparse
anchor-resolved rows materialized at candidate positions.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from pisces_tpu.pileup.counts import PileupCounts, anchor_window_sum


class AlleleSource:
    def __init__(self, counts: PileupCounts, expect_stitched_reads: bool = False,
                 amplicon_coverage: Optional[Dict[int, Dict[str, int]]] = None):
        self.pc = counts
        self.expect_stitched_reads = expect_stitched_reads
        self.gapped_mnv_ref_counts: Dict[int, int] = {}
        self.amplicon_coverage = amplicon_coverage or {}
        self._flat_counts, self._flat_quals = counts.totals_flat()

    def get_amplicon_coverage(self, position: int) -> Dict[str, int]:
        """GetCoverageByAmplicon equivalent (RegionState amplicon slots)."""
        return self.amplicon_coverage.get(position, {})

    @staticmethod
    def _is_full_range(min_anchor, max_anchor, from_end, symmetric) -> bool:
        """Anchor windows that reduce to the full anchor-axis sum."""
        return min_anchor == 0 and max_anchor is None

    def get_allele_count(self, position: int, allele_type: int, direction: int,
                         min_anchor: int = 0, max_anchor: Optional[int] = None,
                         from_end: bool = False, symmetric: bool = False) -> int:
        if self._is_full_range(min_anchor, max_anchor, from_end, symmetric):
            row = int(self.pc.pos_index(position))
            if row < 0:
                return 0
            return int(self._flat_counts[row, allele_type, direction])
        ar = self.pc.anchored_row(position)
        if ar < 0:
            return 0
        vec = self.pc.anchored_counts[ar, allele_type, direction]
        return int(anchor_window_sum(vec, self.pc.anchor_size, min_anchor,
                                     max_anchor, from_end, symmetric))

    def get_sum_of_base_qualities(self, position: int, allele_type: int,
                                  direction: int, min_anchor: int = 0,
                                  max_anchor: Optional[int] = None,
                                  from_end: bool = False,
                                  symmetric: bool = False) -> float:
        if self._is_full_range(min_anchor, max_anchor, from_end, symmetric):
            row = int(self.pc.pos_index(position))
            if row < 0:
                return 0.0
            return float(self._flat_quals[row, allele_type, direction])
        ar = self.pc.anchored_row(position)
        if ar < 0:
            return 0.0
        vec = self.pc.anchored_quals[ar, allele_type, direction]
        return float(anchor_window_sum(vec, self.pc.anchor_size, min_anchor,
                                       max_anchor, from_end, symmetric))

    def flat_rows(self, position: int):
        """(counts_row, quals_row) views [6,3] for a position's full-range
        totals, or None when untouched — lets per-variant coverage walks
        (CoverageCalculator.CalculateSpanning/SinglePoint) fetch each
        position ONCE instead of issuing 30+ scalar get_allele_count /
        get_sum_of_base_qualities calls (measured ~270us per spanning
        variant on the messy WGS profile)."""
        row = self.pc.pos_index(position)
        if row < 0:
            return None
        return self._flat_counts[row], self._flat_quals[row]

    def get_gapped_mnv_ref_count(self, position: int) -> int:
        return self.gapped_mnv_ref_counts.get(position, 0)

    def add_gapped_mnv_ref_counts(self, support: Dict[int, int]) -> None:
        for pos, count in support.items():
            self.gapped_mnv_ref_counts[pos] = (
                self.gapped_mnv_ref_counts.get(pos, 0) + count)
