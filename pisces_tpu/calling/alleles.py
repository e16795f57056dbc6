"""CalledAllele model (reference: Pisces.Domain/Models/Alleles/CalledAllele.cs)."""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from pisces_tpu.domain.types import (
    NUM_DIRECTION_TYPES, AlleleCategory, FilterType, Genotype, NOCALL_GENOTYPES,
)
from pisces_tpu.pileup.candidates import Candidate


@dataclass
class CalledAllele:
    chromosome: str
    position: int
    ref_allele: str
    alt_allele: str
    category: AlleleCategory

    allele_support: int = 0
    soft_clip_allele_support: int = 0  # CalledAllele.cs:38 (Scylla clip rescue)
    well_anchored_support: int = 0
    support_by_direction: np.ndarray = field(
        default_factory=lambda: np.zeros(NUM_DIRECTION_TYPES, dtype=np.int64))
    well_anchored_by_direction: np.ndarray = field(
        default_factory=lambda: np.zeros(NUM_DIRECTION_TYPES, dtype=np.int64))

    total_coverage: int = 0
    coverage_by_direction: np.ndarray = field(
        default_factory=lambda: np.zeros(NUM_DIRECTION_TYPES, dtype=np.int64))
    reference_support: int = 0
    num_no_calls: int = 0
    fraction_no_calls: float = 0.0
    sum_of_base_quality: float = 0.0

    variant_qscore: int = 0
    genotype: Genotype = Genotype.HOMOZYGOUS_REF
    genotype_qscore: int = 0
    genotype_posteriors: Optional[np.ndarray] = None
    noise_level_applied: int = 0

    filters: List[FilterType] = field(default_factory=list)
    # C# BiasResults defaults: score/GATK 0.0, BiasAcceptable false -- alleles
    # whose support is 0 skip the SB computation and keep these defaults
    strand_bias_score: float = 0.0
    strand_bias_gatk: float = 0.0
    strand_bias_acceptable: bool = False
    var_present_on_both_strands: bool = False
    cov_present_on_both_strands: bool = False
    amplicon_bias_detected: bool = False

    is_forced_to_report: bool = False
    phase_set_index: int = -1
    read_collapsed_counts_mut: Optional[np.ndarray] = None   # [8] per-candidate
    read_collapsed_count_total: Optional[np.ndarray] = None  # [8] per-position

    confident_coverage_start: int = 0
    confident_coverage_end: int = 0
    suspicious_coverage_start: int = 0
    suspicious_coverage_end: int = 0
    unanchored_coverage_weight: float = 0.0
    _freq_cache: tuple = (-1, -1, 0.0)  # (support, coverage, value)

    @property
    def frequency(self) -> float:
        """float32 semantics (CalledAllele.Frequency). Cached on the
        (support, coverage) pair — the filter/callability path reads it
        several times per allele and the np.float32 scalar math is ~2us."""
        s = self.allele_support
        t = self.total_coverage
        c = self._freq_cache
        if c[0] == s and c[1] == t:
            return c[2]
        if t == 0:
            v = 0.0
        else:
            v = float(min(np.float32(s) / np.float32(t), np.float32(1.0)))
        self._freq_cache = (s, t, v)
        return v

    @property
    def ref_frequency(self) -> float:
        if self.total_coverage == 0:
            return 0.0
        return float(min(np.float32(self.reference_support) / np.float32(self.total_coverage),
                         np.float32(1.0)))

    @property
    def is_ref_type(self) -> bool:
        return self.category == AlleleCategory.REFERENCE

    @property
    def is_nocall(self) -> bool:
        return self.genotype in NOCALL_GENOTYPES

    def add_filter(self, f: FilterType) -> None:
        if f not in self.filters:
            self.filters.append(f)

    def set_fraction_no_calls(self) -> None:
        all_reads = float(self.total_coverage + self.num_no_calls)
        self.fraction_no_calls = 0.0 if all_reads == 0 else self.num_no_calls / all_reads

    def genotype_str(self) -> str:
        from pisces_tpu.domain.types import GENOTYPE_STRINGS
        return GENOTYPE_STRINGS.get(self.genotype, "./.")


def map_candidate(c: Candidate) -> CalledAllele:
    """AlleleHelper.Map(candidate) equivalent."""
    a = CalledAllele(c.chromosome, c.position, c.ref_allele, c.alt_allele, c.category)
    a.allele_support = c.support
    a.well_anchored_support = c.well_anchored_support
    a.support_by_direction = c.support_by_direction.copy()
    a.well_anchored_by_direction = c.well_anchored_by_direction.copy()
    a.is_forced_to_report = c.is_forced
    if getattr(c, "read_collapsed_counts", None) is not None \
            and a.category != AlleleCategory.REFERENCE:
        a.read_collapsed_counts_mut = c.read_collapsed_counts.copy()
    if c.support_by_amplicon:
        a.support_by_amplicon = dict(c.support_by_amplicon)
    if a.category == AlleleCategory.REFERENCE:
        a.genotype = Genotype.HOMOZYGOUS_REF
    else:
        a.genotype = Genotype.HETEROZYGOUS_ALT_REF
    return a


def map_called_to_candidate(a: CalledAllele) -> Candidate:
    """AlleleHelper.Map(called) equivalent."""
    c = Candidate(a.chromosome, a.position, a.ref_allele, a.alt_allele, a.category)
    c.support_by_direction = a.support_by_direction.copy()
    c.well_anchored_by_direction = a.well_anchored_by_direction.copy()
    return c
