"""Pallas TPU kernel for fused per-locus scoring.

The XLA path (ops/jax_scoring.py) evaluates 8 incomplete-gamma functions per
locus; XLA lowers `igamma` to a data-dependent while-loop, which serializes
on the VPU. This kernel replaces them with fixed-iteration Poisson tail
series (J=64 multiply-adds, fully vectorized, no divergence):

  upper tail  P(X>=k)   = pmf(k)   * sum_j prod_{i<=j} lam/(k+i)
  lower tail  P(X<=m)   = pmf(m)   * sum_j prod_{i<j}  (m-i)/lam
  log pmf(k) = k*ln lam - lam - lgamma(k+1)     (Stirling + 8-step shift)

selected per-lane by k > lam, so every locus costs the same fixed op count.
Accuracy: the chosen branch's term ratio is max((m)/lam, lam/(k+1)) < 1;
worst case k ~ lam where Q is small and far from every filter threshold;
in the scoring region (Q >= 15) the geometric remainder after 64 terms is
far below integer-Q rounding. Parity with the f64 host oracle is asserted
in tests (Q within +-1 everywhere, byte-exact filter decisions on corpora).

Layout: counts are channel-major [24, L] int32 (rows a*3+d for allele a,
direction d; row 18 = reference allele code; 19-23 zero padding to the
f32 sublane tile), loci ride the 128-wide lane axis, grid tiles of 512.

Reference semantics: VariantQualityCalculator.cs:27-65,
StrandBiasCalculator.cs:21-231, SomaticGenotypeQualityCalculator.cs:10-48.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pisces_tpu.domain.types import AlleleType, Genotype
from pisces_tpu.ops.jax_scoring import (
    FILTER_BIT_LOW_DEPTH, FILTER_BIT_LOW_VARIANT_QSCORE, ScoringParams,
)

TILE = 512           # loci per grid step (multiple of the 128-lane axis)
N_SERIES = 64        # fixed Poisson-tail series terms
LN10 = 2.302585092994046
HALF_LN_2PI = 0.9189385332046727
_COV = (int(AlleleType.A), int(AlleleType.C), int(AlleleType.G),
        int(AlleleType.T), int(AlleleType.DELETION))


def _lgamma1p(k):
    """lgamma(k+1) for k >= 0 via 8-step shift + Stirling (f32, ~1e-6)."""
    z = k + 1.0
    shift = jnp.zeros_like(z)
    for _ in range(8):
        small = z < 8.0
        shift = jnp.where(small, shift - jnp.log(z), shift)
        z = jnp.where(small, z + 1.0, z)
    zi = 1.0 / z
    zi2 = zi * zi
    stir = ((z - 0.5) * jnp.log(z) - z + HALF_LN_2PI
            + zi * (1.0 / 12.0 - zi2 * (1.0 / 360.0 - zi2 / 1260.0)))
    return stir + shift


def _log_pmf(k, lam):
    """ln Poisson pmf(k; lam), safe at k=0 / lam=0."""
    return (k * jnp.log(jnp.maximum(lam, 1e-30)) - lam - _lgamma1p(k))


def _upper_series(k, lam):
    """S = sum_{j>=0} prod_{i=1..j} lam/(k+i)  (>=1; tail = pmf(k)*S)."""
    def body(j, carry):
        term, acc = carry
        term = term * lam / (k + jnp.float32(j))
        return term, acc + term
    _, acc = jax.lax.fori_loop(1, N_SERIES + 1, body,
                               (jnp.ones_like(k), jnp.ones_like(k)))
    return acc

def _lower_series(m, lam):
    """S = sum_{j>=0} prod_{i=0..j-1} (m-i)/lam  (P(X<=m) = pmf(m)*S).
    Terms hit zero once m-i < 0, so small m terminates naturally."""
    safe_lam = jnp.maximum(lam, 1e-30)
    def body(j, carry):
        term, acc = carry
        term = term * jnp.maximum(m - jnp.float32(j - 1), 0.0) / safe_lam
        return term, acc + term
    _, acc = jax.lax.fori_loop(1, N_SERIES + 1, body,
                               (jnp.ones_like(m), jnp.ones_like(m)))
    return acc


def _poisson_tail(k, lam):
    """(tail, log10_tail) where tail = P(X >= k), k >= 1 integral, f32.

    Upper-series branch when k > lam (tail small, log exact via log-pmf);
    lower-series complement when k <= lam (tail near 1)."""
    up_log = (_log_pmf(k, lam) + jnp.log(_upper_series(k, lam))) / LN10
    m = jnp.maximum(k - 1.0, 0.0)
    low = jnp.exp(_log_pmf(m, lam)) * _lower_series(m, lam)
    low_tail = jnp.maximum(1.0 - low, 1e-38)
    use_upper = k > lam
    log10_tail = jnp.where(use_upper, up_log, jnp.log10(low_tail))
    tail = jnp.where(use_upper, jnp.exp(up_log * LN10), low_tail)
    # degenerate inputs: k <= 0 means "always" (tail 1)
    tail = jnp.where(k <= 0.0, 1.0, tail)
    log10_tail = jnp.where(k <= 0.0, 0.0, log10_tail)
    return tail, log10_tail


def _lower_cdf(m, lam):
    """P(X <= trunc(m)) in linear space (used by the GQ Poisson gate)."""
    mt = jnp.trunc(jnp.maximum(m, 0.0))
    low = jnp.exp(_log_pmf(mt, lam)) * _lower_series(mt, lam)
    upper = jnp.exp(_log_pmf(mt + 1.0, lam)) * _upper_series(mt + 1.0, lam)
    return jnp.where(mt + 1.0 > lam, jnp.maximum(1.0 - upper, 0.0),
                     jnp.minimum(low, 1.0))


def _sb_stats(support, coverage, noise_freq, log1m_noise):
    """Extended-model PopulateStats: (chance_false_pos, chance_var_gt_zero)."""
    zero = support <= 0.0
    z_cvfgz = jnp.exp(coverage * log1m_noise)        # (1-noise)^cov
    tail, _lt = _poisson_tail(support, coverage * noise_freq)
    nz_cvfgz = jnp.maximum(0.0, 1.0 - tail)          # P(X <= s-1)
    cvfgz = jnp.where(zero, z_cvfgz, nz_cvfgz)
    cfp = jnp.where(zero, 1.0 - z_cvfgz, jnp.maximum(tail, 0.0))
    return cfp, cvfgz


def _score_rows(params: ScoringParams, sup_dir, cov_dir, num_nc,
                out_i_ref, out_f_ref):
    """Shared reference-locus scoring math over [1, TILE] f32 row vectors.

    sup_dir/cov_dir: 3-element lists (F, R, Stitched); num_nc: N counts.
    Writes the 8+8 output rows (contract of score_reference_loci_pallas).
    """
    f32 = jnp.float32
    noise_freq = f32(10.0 ** (-params.noise_level / 10.0))
    log1m_noise = f32(jnp.log1p(-(10.0 ** (-params.noise_level / 10.0))))

    total = cov_dir[0] + cov_dir[1] + cov_dir[2]
    support = sup_dir[0] + sup_dir[1] + sup_dir[2]

    # ---- Poisson q-score: p = P(X >= support), lam = err * cov ----
    lam = noise_freq * total
    _tail, log10_p = _poisson_tail(support, lam)
    q = jnp.clip(-10.0 * log10_p, 0.0, f32(params.max_variant_qscore))
    qi = jnp.round(q).astype(jnp.int32)
    qi = jnp.where((support <= 0.0) | (total <= 0.0), 0, qi)

    freq = jnp.where(total <= 0.0, 0.0,
                     jnp.minimum(support / jnp.maximum(total, 1.0), 1.0))

    # ---- strand bias (Extended model) ----
    ss = sup_dir[2].astype(jnp.int32)
    sc = cov_dir[2].astype(jnp.int32)
    half_s = (ss // 2).astype(f32)
    half_c = (sc // 2).astype(f32)
    ov_cfp, ov_cvfgz = _sb_stats(support, total, noise_freq, log1m_noise)
    fw_cfp, fw_cvfgz = _sb_stats(sup_dir[0] + half_s, cov_dir[0] + half_c,
                                 noise_freq, log1m_noise)
    rv_cfp, rv_cvfgz = _sb_stats(sup_dir[1] + half_s, cov_dir[1] + half_c,
                                 noise_freq, log1m_noise)
    denom = jnp.where(ov_cvfgz == 0.0, 1.0, ov_cvfgz)
    fwd = jnp.where(ov_cvfgz == 0.0, 1.0, fw_cvfgz * rv_cfp / denom)
    rev = jnp.where(ov_cvfgz == 0.0, 1.0, rv_cvfgz * fw_cfp / denom)
    score = jnp.maximum(fwd, rev)
    cov_both = (cov_dir[0] + half_c > 0.0) & (cov_dir[1] + half_c > 0.0)
    score = jnp.where(cov_both, score, 0.0)
    gatk = jnp.where(score > 0.0,
                     10.0 * jnp.log10(jnp.maximum(score, 1e-38)), -1e38)
    gatk = jnp.where(support > 0.0, gatk, 0.0)

    # ---- somatic genotype (reference loci: is_reference=True) ----
    f_min = f32(params.min_frequency_filter)
    gt = jnp.full(freq.shape, int(Genotype.HOMOZYGOUS_REF), jnp.int32)
    gt = jnp.where(freq < f_min, int(Genotype.REF_LIKE_NOCALL), gt)
    gt = jnp.where((freq >= f_min) & ((1.0 - freq) > f_min),
                   int(Genotype.REF_AND_NOCALL), gt)
    gt = jnp.where(total < f32(params.min_depth),
                   int(Genotype.REF_LIKE_NOCALL), gt)

    # ---- GQ (SomaticGenotypeQualityCalculator, hom branch) ----
    non_allele = (1.0 - freq) * total
    expected = f32(params.target_lod) * total
    p1 = jnp.power(10.0, -qi.astype(f32) / 10.0)
    p2 = _lower_cdf(non_allele, expected)
    hom_q = -10.0 * jnp.log10(jnp.maximum(p1 + p2, 1e-38))
    hom_q = jnp.where(non_allele >= expected, f32(params.min_gq), hom_q)
    is_hom = gt == int(Genotype.HOMOZYGOUS_REF)
    raw = jnp.where(is_hom, hom_q, qi.astype(f32))
    gq = jnp.round(jnp.clip(raw, f32(params.min_gq),
                            f32(params.max_gq))).astype(jnp.int32)
    gq = jnp.where((total <= 0.0) | (gt == int(Genotype.REF_LIKE_NOCALL)),
                   params.min_gq, gq)

    fb = jnp.where(total < f32(params.low_depth_filter),
                   1 << FILTER_BIT_LOW_DEPTH, 0)
    fb = fb | jnp.where((qi < params.variant_qscore_filter) & (total != 0.0),
                        1 << FILTER_BIT_LOW_VARIANT_QSCORE, 0)

    out_i_ref[0:1, :] = total.astype(jnp.int32)
    out_i_ref[1:2, :] = support.astype(jnp.int32)
    out_i_ref[2:3, :] = qi
    out_i_ref[3:4, :] = gt
    out_i_ref[4:5, :] = gq
    out_i_ref[5:6, :] = fb
    out_i_ref[6:7, :] = num_nc.astype(jnp.int32)
    out_i_ref[7:8, :] = jnp.zeros_like(qi)
    out_f_ref[0:1, :] = freq
    out_f_ref[1:2, :] = gatk
    out_f_ref[2:3, :] = cov_dir[0]
    out_f_ref[3:4, :] = cov_dir[1]
    out_f_ref[4:5, :] = cov_dir[2]
    out_f_ref[5:6, :] = sup_dir[0]
    out_f_ref[6:7, :] = sup_dir[1]
    out_f_ref[7:8, :] = sup_dir[2]


def _scoring_kernel(params: ScoringParams, in_ref, out_i_ref, out_f_ref):
    """Counts-input kernel: derive (sup, cov, nc) rows from the 18 count
    channels + ref-code row, then run the shared scoring math."""
    f32 = jnp.float32

    def row(r):
        return in_ref[r:r + 1, :].astype(f32)

    ref_code = in_ref[18:19, :]
    cov_dir = []
    sup_dir = []
    for d in range(3):
        cov = row(_COV[0] * 3 + d)
        sup = jnp.where(ref_code == _COV[0], cov, 0.0)
        for a in _COV[1:]:
            c = row(a * 3 + d)
            cov = cov + c
            sup = sup + jnp.where(ref_code == a, c, 0.0)
        cov_dir.append(cov)
        sup_dir.append(sup)
    num_nc = (row(int(AlleleType.N) * 3) + row(int(AlleleType.N) * 3 + 1)
              + row(int(AlleleType.N) * 3 + 2))
    _score_rows(params, sup_dir, cov_dir, num_nc, out_i_ref, out_f_ref)


def _tuples_kernel(params: ScoringParams, in_ref, out_i_ref, out_f_ref):
    """Tuple-input kernel: rows 0-2 sup (F,R,S), 3-5 cov (F,R,S), 6 N count.
    This is the layout production reference scoring feeds
    (score_reference_tuples contract: everything is a pure function of the
    6-tuple), so the mesh-sharded local step and the unique-tuple fast path
    share one kernel."""
    f32 = jnp.float32

    def row(r):
        return in_ref[r:r + 1, :].astype(f32)

    sup_dir = [row(0), row(1), row(2)]
    cov_dir = [row(3), row(4), row(5)]
    _score_rows(params, sup_dir, cov_dir, row(6), out_i_ref, out_f_ref)


def _out_dict(out_i, out_f, L):
    return {
        "total_coverage": out_i[0, :L],
        "support": out_i[1, :L],
        "variant_qscore": out_i[2, :L],
        "genotype": out_i[3, :L],
        "gq": out_i[4, :L],
        "filter_bits": out_i[5, :L],
        "num_no_calls": out_i[6, :L],
        "frequency": out_f[0, :L],
        "sb_gatk": out_f[1, :L],
        "coverage_by_dir": out_f[2:5, :L].T.astype(jnp.int32),
        "support_by_dir": out_f[5:8, :L].T.astype(jnp.int32),
    }


def _run_pallas(kernel, packed, n_in_rows, Lp, interpret):
    grid = (Lp // TILE,)
    mem = pl.ANY if interpret else pltpu.VMEM
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((n_in_rows, TILE), lambda i: (0, i),
                               memory_space=mem)],
        out_specs=[
            pl.BlockSpec((8, TILE), lambda i: (0, i), memory_space=mem),
            pl.BlockSpec((8, TILE), lambda i: (0, i), memory_space=mem),
        ],
        out_shape=[jax.ShapeDtypeStruct((8, Lp), jnp.int32),
                   jax.ShapeDtypeStruct((8, Lp), jnp.float32)],
        interpret=interpret,
    )(packed)


@functools.partial(jax.jit, static_argnames=("params", "interpret"))
def score_reference_tuples_pallas(support_by_dir, cov_by_dir,
                                  params: ScoringParams,
                                  num_no_calls=None,
                                  interpret: bool = False):
    """Pallas-fused reference scoring from per-locus direction tuples.

    Same contract as jax_scoring.score_reference_tuples (plus num_no_calls
    when given). Inputs [L, 3] int; loci ride the 128-lane axis."""
    L = support_by_dir.shape[0]
    Lp = ((L + TILE - 1) // TILE) * TILE
    packed = jnp.zeros((8, Lp), jnp.int32)
    packed = packed.at[0:3, :L].set(support_by_dir.T.astype(jnp.int32))
    packed = packed.at[3:6, :L].set(cov_by_dir.T.astype(jnp.int32))
    if num_no_calls is not None:
        packed = packed.at[6, :L].set(num_no_calls.astype(jnp.int32))
    out_i, out_f = _run_pallas(functools.partial(_tuples_kernel, params),
                               packed, 8, Lp, interpret)
    return _out_dict(out_i, out_f, L)


@functools.partial(jax.jit, static_argnames=("params", "interpret"))
def score_reference_loci_pallas(counts, ref_code, params: ScoringParams,
                                interpret: bool = False):
    """Pallas-fused gVCF reference scoring.

    Args:
      counts: int32 [L, 6, 3] anchor-summed pileup counts
      ref_code: int32 [L] reference allele codes
    Returns the same dict contract as jax_scoring.score_reference_loci
    (minus the anchor axis, which production counts no longer carry).
    """
    L = counts.shape[0]
    Lp = ((L + TILE - 1) // TILE) * TILE
    ch = counts.reshape(L, 18).T.astype(jnp.int32)      # [18, L]
    packed = jnp.zeros((24, Lp), jnp.int32)
    packed = packed.at[:18, :L].set(ch)
    packed = packed.at[18, :L].set(ref_code.astype(jnp.int32))

    out_i, out_f = _run_pallas(functools.partial(_scoring_kernel, params),
                               packed, 24, Lp, interpret)
    return _out_dict(out_i, out_f, L)
