"""Per-locus scoring math, vectorized host (float64) backend.

This is the parity backend: double-precision formulas that mirror the
reference math exactly:
  - Poisson CDF via regularized incomplete gamma (stats/Poisson.cs:26-143)
  - variant q-score (VariantQualityCalculator.cs:27-65)
  - strand bias (StrandBiasCalculator.cs:21-231)
  - somatic genotype + GQ (Somatic/SomaticGenotyper.cs:51-100,
    SomaticGenotypeQualityCalculator.cs:10-48)

All functions are vectorized over a batch of loci (numpy arrays); the JAX
device backend in ops/jax_scoring.py implements the same contracts in f32
for throughput and is validated against this module.
"""
from __future__ import annotations

import numpy as np
from scipy import special as sp

from pisces_tpu.domain.types import DirectionType, Genotype, StrandBiasModel

LN10 = np.log(10.0)


def q_to_p(q):
    """Phred Q -> probability (MathOperations.QtoP)."""
    return np.power(10.0, -np.asarray(q, dtype=np.float64) / 10.0)


def p_to_q(p):
    """Probability -> phred Q (MathOperations.PtoQ)."""
    return -10.0 * np.log10(p)


def poisson_cdf(k, lam):
    """P(X <= floor(k)) for X ~ Poisson(lam).

    Matches the reference's in-house Poisson.Cdf: Q(floor(k)+1, lam)
    (regularized upper incomplete gamma), including its truncation of
    non-integer k (stats/Poisson.cs:26-29).
    """
    k = np.asarray(k, dtype=np.float64)
    lam = np.asarray(lam, dtype=np.float64)
    a = np.trunc(k + 1.0)
    # Reference returns -1 for invalid input (a <= 0 or x < 0); we clamp instead.
    out = sp.gammaincc(np.maximum(a, 1e-300), np.maximum(lam, 0.0))
    return np.where(a <= 0, -1.0, out)


def assign_raw_poisson_qscore(call_count, coverage, estimated_basecall_quality):
    """Raw (uncapped, float) Poisson q-score.

    p = P(X >= callCount) with X ~ Poisson(errorRate * coverage); if p
    underflows to 0 in double precision, falls back to the log-space
    approximation (VariantQualityCalculator.cs:28-52).
    """
    call_count = np.asarray(call_count, dtype=np.float64)
    coverage = np.asarray(coverage, dtype=np.float64)
    error_rate = q_to_p(estimated_basecall_quality)
    lam = error_rate * coverage
    # The reference computes p = 1 - CDF(callCount-1) by literal f64
    # subtraction (VariantQualityCalculator.cs:38), so cancellation zeroes p
    # near 1e-16 and triggers the log-space fallback well before true f64
    # underflow. Replicate that: CDF(callCount-1) = Q(callCount, lam).
    cdf = sp.gammaincc(np.maximum(call_count, 1e-300), lam)
    p_value = 1.0 - cdf

    q_direct = np.where(p_value > 0, p_to_q(np.where(p_value > 0, p_value, 1.0)), 0.0)

    # log-space fallback: A = log pmf at callCount-1
    k = call_count - 1.0
    log_pmf = k * np.log(np.maximum(lam, 1e-300)) - lam - sp.gammaln(k + 1.0)
    correction = (call_count - lam) / np.maximum(call_count, 1e-300)
    q_fallback = -10.0 * (log_pmf - np.log(np.maximum(2.0 * correction, 1e-300))) / LN10

    return np.where(p_value > 0, q_direct, q_fallback)


def assign_poisson_qscore(call_count, coverage, estimated_basecall_quality, max_qscore):
    """Integer q-score, clamped to [0, max] and banker's-rounded
    (VariantQualityCalculator.AssignPoissonQScore)."""
    call_count = np.asarray(call_count)
    coverage = np.asarray(coverage)
    raw = assign_raw_poisson_qscore(call_count, coverage, estimated_basecall_quality)
    q = np.minimum(np.asarray(max_qscore, dtype=np.float64), raw)
    q = np.maximum(q, 0.0)
    iq = np.round(q).astype(np.int64)  # np.round == round-half-to-even == C# Math.Round
    return np.where((call_count <= 0) | (coverage <= 0), 0, iq)


def compute_variant_qscores(allele_support, total_coverage, max_qscore, noise_level):
    """VariantQualityCalculator.Compute over a batch; returns int q-scores."""
    q = assign_poisson_qscore(allele_support, total_coverage, noise_level, max_qscore)
    return np.where(np.asarray(total_coverage) == 0, 0, q)


# ---------------------------------------------------------------------------
# Strand bias
# ---------------------------------------------------------------------------

def _populate_stats(support, coverage, noise_freq, min_detectable, model: int):
    """Vectorized StrandBiasCalculator.PopulateStats for Poisson/Extended models.

    Returns (chance_false_pos, chance_var_freq_gt_zero, chance_false_neg).
    """
    support = np.asarray(support, dtype=np.float64)
    coverage = np.asarray(coverage, dtype=np.float64)

    zero_support = support == 0

    # support == 0 branch (Extended model; Poisson model kept for completeness)
    if model == int(StrandBiasModel.POISSON):
        z_cvfgz = np.zeros_like(coverage)
        z_cfp = np.ones_like(coverage)
        z_cfn = np.zeros_like(coverage)
    else:
        z_cvfgz = np.power(1.0 - min_detectable, coverage)
        z_cfp = 1.0 - z_cvfgz
        z_cfn = z_cvfgz

    # support > 0 branch
    if model == int(StrandBiasModel.DIPLOID):
        # PopulateDiploidStats (StrandBiasCalculator.cs:151-172)
        from scipy.stats import binom
        with np.errstate(invalid="ignore"):
            freq = np.where(coverage > 0, support / np.maximum(coverage, 1e-300), 0.0)
        obvious = freq >= min_detectable
        cfn_low = np.maximum(
            binom.cdf(np.floor(support), np.maximum(coverage, 0).astype(np.int64),
                      min_detectable), 0.0)
        cfp_low = np.maximum(0.0, 1.0 - poisson_cdf(support, coverage * 0.1))
        nz_cfn = np.where(obvious, 1.0, cfn_low)
        nz_cfp = np.where(obvious, 0.0, cfp_low)
        nz_cvfgz = nz_cfn
    else:
        nz_cvfgz = np.maximum(0.0, poisson_cdf(support - 1.0, coverage * noise_freq))
        nz_cfp = np.maximum(0.0, 1.0 - nz_cvfgz)
        nz_cfn = np.maximum(0.0, poisson_cdf(support, coverage * min_detectable))

    cvfgz = np.where(zero_support, z_cvfgz, nz_cvfgz)
    cfp = np.where(zero_support, z_cfp, nz_cfp)
    cfn = np.where(zero_support, z_cfn, nz_cfn)
    return cfp, cvfgz, cfn


def compute_strand_bias(support_by_dir, coverage_by_dir, q_noise, min_variant_freq,
                        acceptance_criteria, model: int = int(StrandBiasModel.EXTENDED)):
    """Vectorized StrandBiasCalculator.CalculateStrandBiasResults.

    Args:
      support_by_dir: int array [N, 3] (forward, reverse, stitched)
      coverage_by_dir: int array [N, 3]
    Returns dict with bias_score, gatk_bias_score, bias_acceptable,
    var_present_on_both_strands, cov_present_on_both_strands.
    """
    support_by_dir = np.asarray(support_by_dir, dtype=np.int64)
    coverage_by_dir = np.asarray(coverage_by_dir, dtype=np.int64)

    fwd_s = support_by_dir[..., DirectionType.FORWARD]
    rev_s = support_by_dir[..., DirectionType.REVERSE]
    sti_s = support_by_dir[..., DirectionType.STITCHED]
    fwd_c = coverage_by_dir[..., DirectionType.FORWARD]
    rev_c = coverage_by_dir[..., DirectionType.REVERSE]
    sti_c = coverage_by_dir[..., DirectionType.STITCHED]

    error_rate = q_to_p(q_noise)
    min_detectable = error_rate if model != int(StrandBiasModel.DIPLOID) else min_variant_freq

    # int division by 2 (C# semantics) for stitched reallocation
    ov_s, ov_c = fwd_s + rev_s + sti_s, fwd_c + rev_c + sti_c
    fw_s, fw_c = fwd_s + sti_s // 2, fwd_c + sti_c // 2
    rv_s, rv_c = rev_s + sti_s // 2, rev_c + sti_c // 2
    ov_cfp, ov_cvfgz, ov_cfn = _populate_stats(ov_s, ov_c, error_rate,
                                               min_detectable, model)
    fw_cfp, fw_cvfgz, fw_cfn = _populate_stats(fw_s, fw_c, error_rate,
                                               min_detectable, model)
    rv_cfp, rv_cvfgz, rv_cfn = _populate_stats(rv_s, rv_c, error_rate,
                                               min_detectable, model)

    with np.errstate(divide="ignore", invalid="ignore"):
        forward_bias = fw_cvfgz * rv_cfp / ov_cvfgz
        reverse_bias = rv_cvfgz * fw_cfp / ov_cvfgz
    degenerate = ov_cvfgz == 0
    forward_bias = np.where(degenerate, 1.0, forward_bias)
    reverse_bias = np.where(degenerate, 1.0, reverse_bias)

    bias_score = np.maximum(forward_bias, reverse_bias)
    with np.errstate(divide="ignore"):
        gatk = 10.0 * np.log10(bias_score)

    cov_both = (fwd_c + sti_c // 2 > 0) & (rev_c + sti_c // 2 > 0)
    var_both = (fwd_s + sti_s // 2 > 0) & (rev_s + sti_s // 2 > 0)

    bias_score = np.where(cov_both, bias_score, 0.0)
    gatk = np.where(cov_both, gatk, -np.inf)
    acceptable = bias_score < acceptance_criteria

    def _stats(s, c, cfp, cfn):
        with np.errstate(invalid="ignore", divide="ignore"):
            freq = np.where(c > 0, s / np.maximum(c, 1), np.nan)
        return {"support": s, "coverage": c, "frequency": freq,
                "chance_false_pos": cfp, "chance_false_neg": cfn}

    return {
        "bias_score": bias_score,
        "gatk_bias_score": gatk,
        "bias_acceptable": acceptable,
        "var_present_on_both_strands": var_both,
        "cov_present_on_both_strands": cov_both,
        "overall": _stats(ov_s, ov_c, ov_cfp, ov_cfn),
        "forward": _stats(fw_s, fw_c, fw_cfp, fw_cfn),
        "reverse": _stats(rv_s, rv_c, rv_cfp, rv_cfn),
    }


# ---------------------------------------------------------------------------
# Somatic genotype + GQ
# ---------------------------------------------------------------------------

def somatic_genotypes(is_reference, frequency, ref_frequency, total_coverage,
                      min_frequency_filter, min_depth_to_genotype):
    """Vectorized SomaticGenotyper.CalculateSomaticGenotype."""
    is_reference = np.asarray(is_reference, dtype=bool)
    frequency = np.asarray(frequency, dtype=np.float32)
    ref_frequency = np.asarray(ref_frequency, dtype=np.float32)
    total_coverage = np.asarray(total_coverage)
    f_min = np.float32(min_frequency_filter)

    gt = np.full(frequency.shape, int(Genotype.HOMOZYGOUS_REF), dtype=np.int8)

    # variant branch
    var_homalt = (ref_frequency < f_min) & ~((1 - frequency) > f_min)
    var_altnocall = (ref_frequency < f_min) & ((1 - frequency) > f_min)
    gt = np.where(~is_reference,
                  np.where(var_altnocall, int(Genotype.ALT_AND_NOCALL),
                           np.where(var_homalt, int(Genotype.HOMOZYGOUS_ALT),
                                    int(Genotype.HETEROZYGOUS_ALT_REF))),
                  gt)
    # reference branch
    gt = np.where(is_reference & (frequency < f_min), int(Genotype.REF_LIKE_NOCALL), gt)
    gt = np.where(is_reference & ~(frequency < f_min) & ((1 - frequency) > f_min),
                  int(Genotype.REF_AND_NOCALL), gt)

    # low-depth override
    low_depth = total_coverage < min_depth_to_genotype
    gt = np.where(low_depth & is_reference, int(Genotype.REF_LIKE_NOCALL), gt)
    gt = np.where(low_depth & ~is_reference, int(Genotype.ALT_LIKE_NOCALL), gt)
    return gt


def somatic_genotype_qscores(genotype, variant_qscore, frequency, total_coverage,
                             target_lod_vf, min_gq, max_gq):
    """Vectorized SomaticGenotypeQualityCalculator.Compute."""
    genotype = np.asarray(genotype)
    variant_qscore = np.asarray(variant_qscore, dtype=np.float64)
    frequency = np.asarray(frequency, dtype=np.float32)
    total_coverage = np.asarray(total_coverage, dtype=np.float64)

    raw_q = variant_qscore.copy()

    is_hom = (genotype == int(Genotype.HOMOZYGOUS_REF)) | (genotype == int(Genotype.HOMOZYGOUS_ALT))
    # explicit float32 intermediates to mirror reference determinism note
    # (SomaticGenotypeQualityCalculator.cs:27-30)
    non_allele_obs = ((np.float32(1.0) - frequency) * total_coverage.astype(np.float32))
    expected_non_allele = np.float32(target_lod_vf) * total_coverage.astype(np.float32)

    p1 = q_to_p(variant_qscore)
    p2 = poisson_cdf(non_allele_obs.astype(np.float64), expected_non_allele.astype(np.float64))
    hom_q = p_to_q(np.maximum(p1 + p2, 1e-300))
    # if non-allele observations exceed expectation, floor at min GQ
    hom_q = np.where(non_allele_obs >= expected_non_allele, float(min_gq), hom_q)
    raw_q = np.where(is_hom, hom_q, raw_q)

    is_nocall = np.isin(genotype, [int(Genotype.ALT12_LIKE_NOCALL), int(Genotype.ALT_LIKE_NOCALL),
                                   int(Genotype.HEMIZYGOUS_NOCALL), int(Genotype.REF_LIKE_NOCALL)])
    q = np.minimum(float(max_gq), raw_q)
    q = np.maximum(q, float(min_gq))
    iq = np.round(q).astype(np.int64)
    return np.where((total_coverage == 0) | is_nocall, min_gq, iq)
