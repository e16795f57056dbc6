"""Allele calling orchestration for one chromosome batch.

Port of the AlleleCaller pipeline (exe/Pisces/Logic/VariantCalling/
AlleleCaller.cs:50-264): collapse -> MNV triage/reallocation -> per-candidate
scoring (coverage, Poisson q-score, strand bias) -> filters -> per-locus
genotyping -> deterministic ordering.

This module operates in whole-chromosome batch mode (the streaming block
protocol of RegionStateManager collapses to a single final Call with
upToPosition=None); the sharded runner re-introduces region batching for
multi-device execution.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from pisces_tpu.domain.types import (
    AlleleCategory, DirectionType, FilterType, Genotype, NoiseModel,
    PloidyModel, StrandBiasModel,
)
from pisces_tpu.options import PiscesApplicationOptions
from pisces_tpu.calling.alleles import CalledAllele, map_candidate
from pisces_tpu.calling.collapser import VariantCollapser
from pisces_tpu.calling.mnv_realloc import (
    get_ref_support_from_gapped_mnvs, reallocate_failed_mnvs,
)
from pisces_tpu.calling.repeats import (
    RefSeqStr, compute_indel_repeat_length, rmxn_should_filter,
)
from pisces_tpu.calling.source import AlleleSource
from pisces_tpu.ops import stats
from pisces_tpu.ops.coverage import compute_coverage
from pisces_tpu.pileup.candidates import Candidate
from pisces_tpu.pileup.counts import PileupCounts


@dataclass
class CallerConfig:
    """VariantCallerConfig equivalent (AlleleCaller.cs:267-292)."""

    include_reference_calls: bool = True
    min_coverage: int = 10
    min_frequency: float = 0.01
    max_variant_qscore: int = 100
    min_variant_qscore: int = 20
    variant_qscore_filter_threshold: Optional[int] = 30
    no_call_filter_threshold: Optional[float] = 0.6
    amplicon_bias_filter_threshold: Optional[float] = None
    noise_level_used_for_q_scoring: int = 20
    strand_bias_filter_threshold: float = 0.5
    filter_single_strand_variants: bool = False
    strand_bias_model: StrandBiasModel = StrandBiasModel.EXTENDED
    variant_freq_filter: Optional[float] = 0.01
    low_gtq_filter: Optional[int] = None
    indel_repeat_filter: Optional[int] = None
    low_depth_filter: Optional[int] = 10
    rmxn_max_length_repeat: Optional[int] = 5
    rmxn_min_repetitions: Optional[int] = 9
    rmxn_frequency_limit: Optional[float] = 0.35
    noise_model: NoiseModel = NoiseModel.FLAT
    ploidy_model: PloidyModel = PloidyModel.SOMATIC
    # somatic genotyper params
    min_frequency_filter: float = 0.01
    target_lod_frequency: float = 0.01
    min_gq_score: int = 0
    max_gq_score: int = 100
    min_depth_to_genotype: int = 10
    consider_anchor_information: bool = True
    expect_stitched_source: bool = False
    coverage_method: "CoverageMethod" = None  # CoverageMethod.EXACT enables read-spanning coverage

    @classmethod
    def from_options(cls, options: PiscesApplicationOptions) -> "CallerConfig":
        v = options.variant_calling_parameters
        return cls(
            include_reference_calls=options.vcf_writing_parameters.output_gvcf_file,
            min_coverage=v.minimum_coverage,
            min_frequency=v.minimum_frequency,
            max_variant_qscore=v.maximum_variant_qscore,
            min_variant_qscore=v.minimum_variant_qscore,
            variant_qscore_filter_threshold=v.minimum_variant_qscore_filter,
            no_call_filter_threshold=v.no_call_filter_threshold,
            amplicon_bias_filter_threshold=v.amplicon_bias_filter_threshold,
            noise_level_used_for_q_scoring=v.noise_level_used_for_q_scoring,
            strand_bias_filter_threshold=v.strand_bias_acceptance_criteria,
            filter_single_strand_variants=v.filter_out_variants_present_only_one_strand,
            strand_bias_model=v.strand_bias_model,
            variant_freq_filter=max(v.minimum_frequency_filter, v.minimum_frequency),
            low_gtq_filter=v.low_genotype_quality_filter,
            indel_repeat_filter=v.indel_repeat_filter,
            low_depth_filter=v.low_depth_filter,
            rmxn_max_length_repeat=v.rmxn_filter_max_length_repeat,
            rmxn_min_repetitions=v.rmxn_filter_min_repetitions,
            rmxn_frequency_limit=v.rmxn_filter_frequency_limit,
            noise_model=v.noise_model,
            coverage_method=options.coverage_method,
            ploidy_model=v.ploidy_model,
            min_frequency_filter=max(v.minimum_frequency_filter, v.minimum_frequency),
            target_lod_frequency=max(v.target_lod_frequency,
                                     max(v.minimum_frequency_filter, v.minimum_frequency)),
            min_gq_score=v.minimum_genotype_qscore,
            max_gq_score=v.maximum_genotype_qscore,
            min_depth_to_genotype=v.minimum_coverage,
            consider_anchor_information=options.tracked_anchor_size > 0,
        )


class AlleleCaller:
    def __init__(self, config: CallerConfig, refseq: np.ndarray,
                 collapser: Optional[VariantCollapser] = None,
                 interval_set=None, read_summaries=None):
        self.config = config
        self.refseq = refseq
        self.refseq_str = RefSeqStr(refseq)
        self.collapser = collapser
        self.interval_set = interval_set
        self.read_summaries = read_summaries
        self.forced_alleles: set = set()
        self.total_num_called = 0

    @property
    def total_num_collapsed(self) -> int:
        return 0 if self.collapser is None else self.collapser.total_num_collapsed

    # -- per-variant scoring (ProcessVariant, AlleleCaller.cs:208-234) -------

    def process_variant(self, source: AlleleSource, a: CalledAllele) -> None:
        cfg = self.config
        from pisces_tpu.domain.types import CoverageMethod
        use_exact = (cfg.coverage_method == CoverageMethod.EXACT
                     and self.read_summaries is not None
                     and a.category in (AlleleCategory.DELETION,
                                        AlleleCategory.MNV,
                                        AlleleCategory.INSERTION))
        if use_exact:
            from pisces_tpu.ops.exact_coverage import exact_spanning_coverage
            length = (len(a.alt_allele) - 1
                      if a.category == AlleleCategory.INSERTION
                      else len(a.ref_allele) - 1
                      if a.category == AlleleCategory.DELETION
                      else len(a.alt_allele))
            cov_dir, total, ref_sup, sum_bq = exact_spanning_coverage(
                source, self.read_summaries, a.category, a.position, length,
                a.allele_support)
            a.total_coverage = total
            a.coverage_by_direction = cov_dir
            a.reference_support = ref_sup
            a.sum_of_base_quality = sum_bq
        else:
            cov = compute_coverage(source, a.category, a.position, a.ref_allele,
                                   a.alt_allele, a.allele_support,
                                   a.well_anchored_support,
                                   cfg.consider_anchor_information)
            a.total_coverage = cov.total_coverage
            a.coverage_by_direction = cov.coverage_by_direction
            a.reference_support = cov.reference_support
            a.num_no_calls = cov.num_no_calls
            a.sum_of_base_quality = cov.sum_of_base_quality
            a.confident_coverage_start = cov.confident_coverage_start
            a.confident_coverage_end = cov.confident_coverage_end
            a.suspicious_coverage_start = cov.suspicious_coverage_start
            a.suspicious_coverage_end = cov.suspicious_coverage_end
            a.unanchored_coverage_weight = cov.unanchored_coverage_weight
            if cov.allele_support_adjustment:
                a.allele_support += cov.allele_support_adjustment

        if a.allele_support > 0:
            if cfg.noise_model == NoiseModel.WINDOW and a.total_coverage > 0:
                noise = int(stats.p_to_q(a.sum_of_base_quality / a.total_coverage))
            else:
                noise = cfg.noise_level_used_for_q_scoring
            a.noise_level_applied = noise
            a.variant_qscore = int(stats.compute_variant_qscores(
                np.array([a.allele_support]), np.array([a.total_coverage]),
                cfg.max_variant_qscore, noise)[0])
            sb = stats.compute_strand_bias(
                a.support_by_direction[None, :], a.coverage_by_direction[None, :],
                cfg.noise_level_used_for_q_scoring, cfg.min_frequency,
                cfg.strand_bias_filter_threshold, int(cfg.strand_bias_model))
            a.strand_bias_score = float(sb["bias_score"][0])
            a.strand_bias_gatk = float(sb["gatk_bias_score"][0])
            a.strand_bias_acceptable = bool(sb["bias_acceptable"][0])
            a.var_present_on_both_strands = bool(sb["var_present_on_both_strands"][0])
            a.cov_present_on_both_strands = bool(sb["cov_present_on_both_strands"][0])
            a.sb_detail = sb

            if (cfg.amplicon_bias_filter_threshold is not None
                    and a.category == AlleleCategory.SNV):
                from pisces_tpu.ops.amplicon_bias import calculate_amplicon_bias
                support_by_amp = getattr(a, "support_by_amplicon", None) or {}
                cov_by_amp = source.get_amplicon_coverage(a.position)
                ab = calculate_amplicon_bias(
                    support_by_amp, cov_by_amp,
                    cfg.amplicon_bias_filter_threshold, cfg.max_variant_qscore)
                if ab is not None:
                    a.amplicon_bias_detected = ab["bias_detected"]
                    a.amplicon_bias_results = ab["results"]

        self._apply_filters(a)

    def _apply_filters(self, a: CalledAllele) -> None:
        """AlleleProcessor.Process/ApplyFilters (AlleleProcessor.cs:16-71)."""
        cfg = self.config
        a.set_fraction_no_calls()
        a.filters = []
        if cfg.low_depth_filter is not None and a.total_coverage < cfg.low_depth_filter:
            a.add_filter(FilterType.LOW_DEPTH)
        if (cfg.variant_qscore_filter_threshold is not None
                and a.variant_qscore < cfg.variant_qscore_filter_threshold
                and a.total_coverage != 0):
            a.add_filter(FilterType.LOW_VARIANT_QSCORE)
        if a.category != AlleleCategory.REFERENCE:
            if (cfg.no_call_filter_threshold is not None
                    and a.fraction_no_calls > cfg.no_call_filter_threshold):
                a.add_filter(FilterType.NO_CALL)
            if (not a.strand_bias_acceptable
                    or (cfg.filter_single_strand_variants
                        and not a.var_present_on_both_strands)):
                a.add_filter(FilterType.STRAND_BIAS)
            if (a.amplicon_bias_detected
                    and cfg.amplicon_bias_filter_threshold is not None):
                a.add_filter(FilterType.AMPLICON_BIAS)
            if cfg.indel_repeat_filter is not None and cfg.indel_repeat_filter > 0:
                rep = compute_indel_repeat_length(a.category, a.position,
                                                  a.ref_allele, a.alt_allele,
                                                  self.refseq)
                if cfg.indel_repeat_filter <= rep:
                    a.add_filter(FilterType.INDEL_REPEAT_LENGTH)
            if rmxn_should_filter(a.category, a.position, a.ref_allele, a.alt_allele,
                                  a.frequency, self.refseq_str,
                                  cfg.rmxn_max_length_repeat,
                                  cfg.rmxn_min_repetitions,
                                  cfg.rmxn_frequency_limit):
                a.add_filter(FilterType.RMXN)
            if (cfg.variant_freq_filter is not None
                    and np.float32(a.frequency) < np.float32(cfg.variant_freq_filter)):
                a.add_filter(FilterType.LOW_VARIANT_FREQUENCY)
            if cfg.expect_stitched_source and "N" in a.alt_allele:
                a.add_filter(FilterType.STRAND_BIAS)

    # -- callability (AlleleCaller.cs:236-258) -------------------------------

    def _is_callable(self, a: CalledAllele) -> bool:
        cfg = self.config
        if a.category == AlleleCategory.REFERENCE:
            self.total_num_called += 1
            return True
        if a.total_coverage < cfg.min_coverage and not cfg.include_reference_calls:
            return False
        if (a.total_coverage != 0
                and np.float32(a.frequency) < np.float32(cfg.min_frequency)):
            return False
        if a.variant_qscore < cfg.min_variant_qscore:
            return False
        self.total_num_called += 1
        return True

    def _should_report(self, a: CalledAllele) -> bool:
        if self.interval_set is None:
            return True
        return self.interval_set.contains(a.position)

    def _is_forced(self, a: CalledAllele) -> bool:
        return (a.chromosome, a.position, a.ref_allele, a.alt_allele) in self.forced_alleles

    # -- genotyping (somatic; diploid/haploid/adaptive in genotype/) ---------

    def _set_genotypes(self, alleles: List[CalledAllele]) -> List[CalledAllele]:
        from pisces_tpu.genotype import create_genotype_calculator
        calc = create_genotype_calculator(self.config, alleles[0].chromosome
                                          if alleles else None)
        return calc.set_genotypes(alleles)

    # -- main entry -----------------------------------------------------------

    def call(self, candidates: List[Candidate], source: AlleleSource,
             max_position: Optional[int] = None
             ) -> Dict[int, List[CalledAllele]]:
        """CallForPositions: returns {position: [alleles sorted by ref,alt]}."""
        cfg = self.config
        failed_mnvs: List[CalledAllele] = []
        callable_alleles: List[CalledAllele] = []
        leftover: List[Candidate] = []

        if self.collapser is not None:
            candidates = self.collapser.collapse(list(candidates), source,
                                                 max_position)
            leftover = self.collapser.not_cleared

        for cand in candidates:
            variant = map_candidate(cand)
            if variant.category == AlleleCategory.MNV:
                self.process_variant(source, variant)
                if self._is_callable(variant):
                    callable_alleles.append(variant)
                else:
                    failed_mnvs.append(variant)
            else:
                callable_alleles.append(variant)

        spilled = reallocate_failed_mnvs(failed_mnvs, callable_alleles, max_position)
        # spilled alleles re-enter the next region's candidate pool
        self.spilled_next_region = spilled

        source.add_gapped_mnv_ref_counts(
            get_ref_support_from_gapped_mnvs(callable_alleles))

        for failed in failed_mnvs:
            if self._is_forced(failed):
                callable_alleles.append(failed)

        by_position: Dict[int, List[CalledAllele]] = {}
        for a in callable_alleles:
            self.process_variant(source, a)
            if self._is_forced(a) and not (self._is_callable(a) and self._should_report(a)):
                a.is_forced_to_report = True
                a.add_filter(FilterType.FORCED_REPORT)
            if (self._is_callable(a) and self._should_report(a)) or self._is_forced(a):
                by_position.setdefault(a.position, []).append(a)

        for pos in by_position:
            alleles_at_pos = by_position[pos]
            self._compute_genotype_and_filter(alleles_at_pos)
            self._locus_process(alleles_at_pos)

        return dict(sorted(by_position.items()))

    def _compute_genotype_and_filter(self, alleles: List[CalledAllele]) -> None:
        """ComputeGenotypeAndFilterAllele (AlleleCaller.cs:143-180)."""
        if any(a.category != AlleleCategory.REFERENCE and not a.is_forced_to_report
               for a in alleles):
            alleles[:] = [a for a in alleles if a.category != AlleleCategory.REFERENCE]

        to_prune = self._set_genotypes(
            [a for a in alleles if not a.is_forced_to_report])
        for p in to_prune:
            key = (p.chromosome, p.position, p.ref_allele, p.alt_allele)
            if key not in self.forced_alleles:
                alleles.remove(p)

        if self.config.low_gtq_filter is not None:
            for a in alleles:
                if a.genotype_qscore < self.config.low_gtq_filter:
                    a.add_filter(FilterType.LOW_GENOTYPE_QUALITY)

        alleles.sort(key=lambda a: (a.ref_allele, a.alt_allele))

    def _locus_process(self, alleles: List[CalledAllele]) -> None:
        """Somatic locus processor is a no-op; diploid handles forced alleles
        (DiploidLocusProcessor.cs:539-577)."""
        if self.config.ploidy_model != PloidyModel.DIPLOID_BY_THRESHOLDING:
            return
        forced = [a for a in alleles if FilterType.FORCED_REPORT in a.filters]
        non_forced = [a for a in alleles if FilterType.FORCED_REPORT not in a.filters]
        if not forced:
            return
        is_ref = any(a.is_ref_type for a in non_forced)
        is_nocall = (not non_forced) or any(a.is_nocall for a in non_forced)
        gt = (Genotype.ALT_LIKE_NOCALL if is_nocall
              else (Genotype.HOMOZYGOUS_REF if is_ref else Genotype.OTHERS))
        for a in forced:
            a.genotype = gt
        min_gq = 0 if not non_forced else min(a.genotype_qscore for a in non_forced)
        for a in alleles:
            a.genotype_qscore = min_gq


def make_reference_candidates(chrom: str, refseq: np.ndarray, pc: PileupCounts,
                              intervals=None) -> List[Candidate]:
    """gVCF reference-allele synthesis from count tensors
    (RegionState.GetAllCandidates, cs:383-460), vectorized per block."""
    from pisces_tpu.domain.types import BASE_TO_ALLELE
    out: List[Candidate] = []
    nb = len(pc.block_keys)
    if nb == 0:
        return out
    counts_t = pc.counts_t               # [NB, B, 6, 3]
    total_support = counts_t.sum(axis=(2, 3))  # [NB, B]
    for bi in range(nb):
        key = int(pc.block_keys[bi])
        start = (key - 1) * pc.block_size + 1
        end = key * pc.block_size
        if intervals is not None:
            ranges = intervals.clipped_ranges(start, end)
        else:
            ranges = [(start, end)]
        for (rs, re_) in ranges:
            positions = np.arange(rs, re_ + 1, dtype=np.int64)
            positions = positions[positions <= len(refseq)]
            if len(positions) == 0:
                continue
            in_block = positions - start
            ref_bytes = refseq[positions - 1]
            ref_codes = BASE_TO_ALLELE[ref_bytes]
            sup = total_support[bi, in_block]
            if intervals is None:
                sel = sup > 0
            else:
                sel = np.ones(len(positions), dtype=bool)
            for pos, code, rb, ib in zip(positions[sel], ref_codes[sel],
                                         ref_bytes[sel], in_block[sel]):
                c = Candidate(chrom, int(pos), chr(rb), chr(rb),
                              AlleleCategory.REFERENCE)
                c.support_by_direction = counts_t[bi, ib, code, :].astype(np.int64)
                out.append(c)
    return out
