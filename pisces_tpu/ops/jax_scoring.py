"""Fused per-locus scoring kernels (JAX/XLA device path).

The dense gVCF hot path of the reference — per-position coverage totals,
Poisson q-score, strand bias, somatic genotype + GQ, filter bitmask
(CoverageCalculator / VariantQualityCalculator / StrandBiasCalculator /
SomaticGenotyper semantics) — expressed as one fused elementwise pass over a
padded locus tile so XLA maps it onto the VPU with a single HBM sweep of the
count tensor.

All math is f32 on device; the f64 host backend (ops/stats.py) is the parity
oracle. Integer q-scores agree with the host path except within float
rounding distance of .5 boundaries.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.scipy.special import gammainc, gammaincc, gammaln

from pisces_tpu.domain.types import (
    AlleleType, DirectionType, Genotype,
)
# ScoringParams and the filter-bit constants live in the jax-free
# ops/scoring_params module (host cold-start); re-exported here for the
# device-path callers
from pisces_tpu.ops.scoring_params import (  # noqa: F401
    FILTER_BIT_LOW_DEPTH, FILTER_BIT_LOW_VARIANT_QSCORE,
    FILTER_BIT_STRAND_BIAS, FILTER_BIT_LOW_VARIANT_FREQUENCY,
    FILTER_BIT_NO_CALL, ScoringParams,
)

LN10 = 2.302585092994046
_COV_ALLELES = (int(AlleleType.A), int(AlleleType.C), int(AlleleType.G),
                int(AlleleType.T), int(AlleleType.DELETION))


def q_to_p(q):
    return jnp.power(10.0, -q / 10.0)


def poisson_cdf(k, lam):
    """P(X <= floor(k)); matches host stats.poisson_cdf (upper gamma)."""
    a = jnp.trunc(k + 1.0)
    return gammaincc(jnp.maximum(a, 1e-30), jnp.maximum(lam, 0.0))


def poisson_qscores(call_count, coverage, noise_level, max_qscore):
    """Integer Poisson q-scores (VariantQualityCalculator semantics).

    Computes log10(p) via the lower regularized gamma directly (accurate in
    f32 for every q below the cap) with the reference's log-space pmf
    fallback once p underflows.
    """
    call_count = call_count.astype(jnp.float32)
    coverage = coverage.astype(jnp.float32)
    error_rate = q_to_p(jnp.float32(noise_level))
    lam = error_rate * coverage
    p = gammainc(jnp.maximum(call_count, 1e-30), lam)

    k = call_count - 1.0
    log_pmf = (k * jnp.log(jnp.maximum(lam, 1e-30)) - lam - gammaln(k + 1.0))
    corr = (call_count - lam) / jnp.maximum(call_count, 1e-30)
    q_fallback = -10.0 * (log_pmf - jnp.log(jnp.maximum(2.0 * corr, 1e-30))) / LN10

    q_direct = -10.0 * jnp.log10(jnp.maximum(p, 1e-38))
    q = jnp.where(p > 0, q_direct, q_fallback)
    q = jnp.clip(q, 0.0, jnp.float32(max_qscore))
    iq = jnp.round(q).astype(jnp.int32)
    return jnp.where((call_count <= 0) | (coverage <= 0), 0, iq)


def _sb_stats(support, coverage, noise_freq):
    """Extended-model PopulateStats: returns (cfp, cvfgz)."""
    zero = support == 0
    z_cvfgz = jnp.power(1.0 - noise_freq, coverage)
    nz_cvfgz = jnp.maximum(0.0, poisson_cdf(support - 1.0, coverage * noise_freq))
    cvfgz = jnp.where(zero, z_cvfgz, nz_cvfgz)
    cfp = jnp.where(zero, 1.0 - z_cvfgz, jnp.maximum(0.0, 1.0 - nz_cvfgz))
    return cfp, cvfgz


def strand_bias(support_by_dir, coverage_by_dir, noise_level, acceptance):
    """Extended-model strand bias over [.., 3] arrays.

    Returns (bias_score, gatk_score, acceptable, var_both, cov_both).
    """
    noise_freq = q_to_p(jnp.float32(noise_level))
    fs = support_by_dir[..., 0].astype(jnp.float32)
    rs = support_by_dir[..., 1].astype(jnp.float32)
    ss = support_by_dir[..., 2].astype(jnp.int32)
    fc = coverage_by_dir[..., 0].astype(jnp.float32)
    rc = coverage_by_dir[..., 1].astype(jnp.float32)
    sc = coverage_by_dir[..., 2].astype(jnp.int32)
    half_s = (ss // 2).astype(jnp.float32)
    half_c = (sc // 2).astype(jnp.float32)

    ov_cfp, ov_cvfgz = _sb_stats(fs + rs + ss.astype(jnp.float32),
                                 fc + rc + sc.astype(jnp.float32), noise_freq)
    fw_cfp, fw_cvfgz = _sb_stats(fs + half_s, fc + half_c, noise_freq)
    rv_cfp, rv_cvfgz = _sb_stats(rs + half_s, rc + half_c, noise_freq)

    denom = jnp.where(ov_cvfgz == 0, 1.0, ov_cvfgz)
    fwd = fw_cvfgz * rv_cfp / denom
    rev = rv_cvfgz * fw_cfp / denom
    fwd = jnp.where(ov_cvfgz == 0, 1.0, fwd)
    rev = jnp.where(ov_cvfgz == 0, 1.0, rev)
    score = jnp.maximum(fwd, rev)
    gatk = 10.0 * jnp.log10(jnp.maximum(score, 1e-38))
    gatk = jnp.where(score == 0, -jnp.inf, gatk)

    cov_both = (fc + half_c > 0) & (rc + half_c > 0)
    var_both = (fs + half_s > 0) & (rs + half_s > 0)
    score = jnp.where(cov_both, score, 0.0)
    gatk = jnp.where(cov_both, gatk, -jnp.inf)
    acceptable = score < acceptance
    return score, gatk, acceptable, var_both, cov_both


def somatic_genotypes(is_reference, frequency, ref_frequency, total_coverage,
                      min_freq_filter, min_depth):
    f_min = jnp.float32(min_freq_filter)
    gt = jnp.full(frequency.shape, int(Genotype.HOMOZYGOUS_REF), jnp.int32)
    var_homalt = (ref_frequency < f_min) & ~((1 - frequency) > f_min)
    var_altno = (ref_frequency < f_min) & ((1 - frequency) > f_min)
    gt = jnp.where(~is_reference,
                   jnp.where(var_altno, int(Genotype.ALT_AND_NOCALL),
                             jnp.where(var_homalt, int(Genotype.HOMOZYGOUS_ALT),
                                       int(Genotype.HETEROZYGOUS_ALT_REF))), gt)
    gt = jnp.where(is_reference & (frequency < f_min),
                   int(Genotype.REF_LIKE_NOCALL), gt)
    gt = jnp.where(is_reference & ~(frequency < f_min) & ((1 - frequency) > f_min),
                   int(Genotype.REF_AND_NOCALL), gt)
    low = total_coverage < min_depth
    gt = jnp.where(low & is_reference, int(Genotype.REF_LIKE_NOCALL), gt)
    gt = jnp.where(low & ~is_reference, int(Genotype.ALT_LIKE_NOCALL), gt)
    return gt


def somatic_gq(genotype, variant_qscore, frequency, total_coverage,
               target_lod, min_gq, max_gq):
    cov_f = total_coverage.astype(jnp.float32)
    is_hom = ((genotype == int(Genotype.HOMOZYGOUS_REF))
              | (genotype == int(Genotype.HOMOZYGOUS_ALT)))
    non_allele = (1.0 - frequency) * cov_f
    expected = jnp.float32(target_lod) * cov_f
    p1 = q_to_p(variant_qscore.astype(jnp.float32))
    p2 = poisson_cdf(non_allele, expected)
    hom_q = -10.0 * jnp.log10(jnp.maximum(p1 + p2, 1e-38))
    hom_q = jnp.where(non_allele >= expected, jnp.float32(min_gq), hom_q)
    raw = jnp.where(is_hom, hom_q, variant_qscore.astype(jnp.float32))
    q = jnp.clip(raw, jnp.float32(min_gq), jnp.float32(max_gq))
    iq = jnp.round(q).astype(jnp.int32)
    nocall = ((genotype == int(Genotype.ALT12_LIKE_NOCALL))
              | (genotype == int(Genotype.ALT_LIKE_NOCALL))
              | (genotype == int(Genotype.HEMIZYGOUS_NOCALL))
              | (genotype == int(Genotype.REF_LIKE_NOCALL)))
    return jnp.where((total_coverage == 0) | nocall, min_gq, iq)


@functools.partial(jax.jit, static_argnames=("params",))
def score_reference_tuples(support_by_dir, cov_by_dir, params: ScoringParams):
    """Fused gVCF reference scoring from per-locus direction tuples.

    Every output of the reference-locus kernel is a pure function of the
    (support_by_dir, coverage_by_dir) 6-tuple, so callers can deduplicate
    loci to unique tuples on the host, score U << L rows here, and scatter
    back — shrinking both device FLOPs and device->host readback
    (fast_gvcf.score_reference_positions does exactly this).
    """
    support_by_dir = support_by_dir.astype(jnp.int32)
    cov_by_dir = cov_by_dir.astype(jnp.int32)
    total_cov = cov_by_dir.sum(axis=-1)
    support = support_by_dir.sum(axis=-1)

    q = poisson_qscores(support, total_cov, params.noise_level,
                        params.max_variant_qscore)
    q = jnp.where((total_cov == 0) | (support <= 0), 0, q)

    freq = jnp.where(total_cov == 0, 0.0,
                     jnp.minimum(support.astype(jnp.float32)
                                 / jnp.maximum(total_cov, 1).astype(jnp.float32),
                                 1.0))

    sb_score, sb_gatk, sb_ok, var_both, cov_both = strand_bias(
        support_by_dir, cov_by_dir, params.noise_level, params.sb_acceptance)
    # strand bias only computed when support > 0 (ProcessVariant gate);
    # otherwise C# defaults: gatk 0.0, acceptable False (unused for refs)
    sb_gatk = jnp.where(support > 0, sb_gatk, 0.0)

    is_ref = jnp.ones_like(total_cov, dtype=bool)
    gt = somatic_genotypes(is_ref, freq, freq, total_cov,
                           params.min_frequency_filter, params.min_depth)
    gq = somatic_gq(gt, q, freq, total_cov, params.target_lod,
                    params.min_gq, params.max_gq)

    filter_bits = jnp.zeros_like(total_cov, dtype=jnp.int32)
    filter_bits |= jnp.where(total_cov < params.low_depth_filter,
                             1 << FILTER_BIT_LOW_DEPTH, 0)
    filter_bits |= jnp.where((q < params.variant_qscore_filter) & (total_cov != 0),
                             1 << FILTER_BIT_LOW_VARIANT_QSCORE, 0)

    return {
        "total_coverage": total_cov,
        "support": support,
        "support_by_dir": support_by_dir,
        "coverage_by_dir": cov_by_dir,
        "frequency": freq,
        "variant_qscore": q,
        "genotype": gt,
        "gq": gq,
        "sb_gatk": sb_gatk,
        "filter_bits": filter_bits,
    }


@functools.partial(jax.jit, static_argnames=("params",))
def score_reference_loci(counts, ref_code, params: ScoringParams):
    """Fused gVCF reference-locus scoring over a padded tile.

    Args:
      counts: int32 [L, 6, 3, K] pileup counts (anchor axis K intact)
      ref_code: int8/int32 [L] reference-base allele codes
      params: static ScoringParams
    Returns dict of [L] arrays: total_coverage, support, num_no_calls,
      variant_qscore, genotype, gq, sb_gatk, filter_bits, coverage_by_dir,
      support_by_dir.
    """
    c = counts.sum(axis=-1)  # [L, 6, 3]
    cov_alleles = jnp.array(_COV_ALLELES)
    cov_by_dir = c[:, cov_alleles, :].sum(axis=1)  # [L, 3]
    l_idx = jnp.arange(c.shape[0])
    support_by_dir = c[l_idx, ref_code.astype(jnp.int32), :]  # [L, 3]
    out = dict(score_reference_tuples(support_by_dir, cov_by_dir, params))
    out["num_no_calls"] = c[:, int(AlleleType.N), :].sum(axis=-1)
    return out


@functools.partial(jax.jit, static_argnames=("params",))
def score_snv_loci(support_by_dir, cov_by_dir, ref_support, num_no_calls,
                   total_coverage, params: ScoringParams):
    """Fused SNV-candidate scoring over a padded batch.

    Inputs are gathered host-side from the aggregated candidates + count
    tensors (single-point coverage semantics); this kernel fuses q-score,
    strand bias, genotype, GQ and the dense filter bits.
    """
    support = support_by_dir.sum(axis=-1)
    q = poisson_qscores(support, total_coverage, params.noise_level,
                        params.max_variant_qscore)
    q = jnp.where((total_coverage == 0) | (support <= 0), 0, q)
    freq = jnp.where(total_coverage == 0, 0.0,
                     jnp.minimum(support.astype(jnp.float32)
                                 / jnp.maximum(total_coverage, 1).astype(jnp.float32), 1.0))
    ref_freq = jnp.where(total_coverage == 0, 0.0,
                         jnp.minimum(ref_support.astype(jnp.float32)
                                     / jnp.maximum(total_coverage, 1).astype(jnp.float32), 1.0))
    sb_score, sb_gatk, sb_ok, var_both, cov_both = strand_bias(
        support_by_dir, cov_by_dir, params.noise_level, params.sb_acceptance)
    is_ref = jnp.zeros_like(total_coverage, dtype=bool)
    gt = somatic_genotypes(is_ref, freq, ref_freq, total_coverage,
                           params.min_frequency_filter, params.min_depth)
    gq = somatic_gq(gt, q, freq, total_coverage, params.target_lod,
                    params.min_gq, params.max_gq)

    all_reads = (total_coverage + num_no_calls).astype(jnp.float32)
    frac_nc = jnp.where(all_reads == 0, 0.0, num_no_calls / jnp.maximum(all_reads, 1.0))

    fb = jnp.zeros_like(total_coverage, dtype=jnp.int32)
    fb |= jnp.where(total_coverage < params.low_depth_filter,
                    1 << FILTER_BIT_LOW_DEPTH, 0)
    fb |= jnp.where((q < params.variant_qscore_filter) & (total_coverage != 0),
                    1 << FILTER_BIT_LOW_VARIANT_QSCORE, 0)
    fb |= jnp.where(~sb_ok, 1 << FILTER_BIT_STRAND_BIAS, 0)
    fb |= jnp.where(freq < jnp.float32(params.min_frequency_filter),
                    1 << FILTER_BIT_LOW_VARIANT_FREQUENCY, 0)
    fb |= jnp.where(frac_nc > jnp.float32(params.no_call_filter),
                    1 << FILTER_BIT_NO_CALL, 0)

    return {
        "frequency": freq,
        "variant_qscore": q,
        "genotype": gt,
        "gq": gq,
        "sb_score": sb_score,
        "sb_gatk": sb_gatk,
        "sb_acceptable": sb_ok,
        "sb_var_both": var_both,
        "sb_cov_both": cov_both,
        "filter_bits": fb,
        "fraction_no_calls": frac_nc,
    }
