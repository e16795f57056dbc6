"""Pallas fused scoring kernel vs the XLA kernel (interpret mode on CPU).

The fixed-iteration Poisson-tail series must reproduce the igamma-based
XLA kernel bit-for-bit on integer outputs across the realistic operating
range (the f64 host oracle parity of the XLA kernel is covered in
test_stats/test_functional)."""
import numpy as np
import pytest

import conftest
import jax

from pisces_tpu.ops.jax_scoring import ScoringParams, score_reference_loci
from pisces_tpu.ops.pallas_scoring import score_reference_loci_pallas


def _compare(counts4, ref_code, params=None):
    params = params or ScoringParams()
    counts = counts4.sum(axis=-1).astype(np.int32)
    ref = jax.jit(score_reference_loci, static_argnames=("params",))(
        counts4, ref_code, params)
    pal = score_reference_loci_pallas(counts, ref_code, params,
                                      interpret=True)
    for k in ("total_coverage", "support", "num_no_calls", "variant_qscore",
              "gq", "genotype", "filter_bits"):
        np.testing.assert_array_equal(np.asarray(pal[k]), np.asarray(ref[k]),
                                      err_msg=k)
    sb_r = np.asarray(ref["sb_gatk"])
    sb_p = np.asarray(pal["sb_gatk"])
    fin = np.isfinite(sb_r) & (sb_r > -1e30)
    assert np.allclose(sb_p[fin], sb_r[fin], atol=1e-3)
    np.testing.assert_array_equal(np.asarray(pal["coverage_by_dir"]),
                                  np.asarray(ref["coverage_by_dir"]))
    np.testing.assert_array_equal(np.asarray(pal["support_by_dir"]),
                                  np.asarray(ref["support_by_dir"]))


def test_random_tiles_exact():
    rng = np.random.default_rng(0)
    L = 3000
    counts4 = rng.integers(0, 30, size=(L, 6, 3, 11)).astype(np.int32)
    counts4[:50] = 0              # zero coverage
    counts4[50:60] *= 50          # deep coverage (lam ~ 50)
    ref_code = rng.integers(0, 4, size=(L,)).astype(np.int32)
    _compare(counts4, ref_code)


def test_unpadded_tail_and_small_batches():
    rng = np.random.default_rng(1)
    for L in (1, 7, 511, 513):    # around the 512 tile boundary
        counts4 = rng.integers(0, 12, size=(L, 6, 3, 11)).astype(np.int32)
        ref_code = rng.integers(0, 4, size=(L,)).astype(np.int32)
        _compare(counts4, ref_code)


def test_tuples_kernel_matches_counts_kernel():
    """The tuple-input kernel (production reference-scoring layout) must
    agree with the XLA tuple kernel on every output on random tuples."""
    from pisces_tpu.ops.jax_scoring import score_reference_tuples
    from pisces_tpu.ops.pallas_scoring import score_reference_tuples_pallas

    rng = np.random.default_rng(3)
    L = 2000
    cov = rng.integers(0, 500, size=(L, 3)).astype(np.int32)
    sup = (cov * rng.random((L, 3))).astype(np.int32)
    nc = rng.integers(0, 8, size=L).astype(np.int32)
    params = ScoringParams()
    ref = score_reference_tuples(sup, cov, params)
    pal = score_reference_tuples_pallas(sup, cov, params, num_no_calls=nc,
                                        interpret=True)
    for k in ("total_coverage", "support", "variant_qscore", "gq",
              "genotype", "filter_bits"):
        np.testing.assert_array_equal(np.asarray(pal[k]), np.asarray(ref[k]),
                                      err_msg=k)
    np.testing.assert_array_equal(np.asarray(pal["num_no_calls"]), nc)
    sb_r = np.asarray(ref["sb_gatk"])
    sb_p = np.asarray(pal["sb_gatk"])
    fin = np.isfinite(sb_r) & (sb_r > -1e30)
    # near-zero SB (the gVCF reference-line regime, where this float is
    # emitted) must be tight; the deep-bias tail (< -40 dB, a range only
    # host-f64 variant scoring emits) tolerates series truncation drift
    shallow = fin & (sb_r > -40.0)
    assert np.allclose(sb_p[shallow], sb_r[shallow], atol=1e-3)
    deep = fin & ~shallow
    assert np.allclose(sb_p[deep], sb_r[deep], rtol=0.05)


def test_low_support_noise_band():
    """Loci with support near the noise floor (k ~ lam): the branch-select
    region of the series; integer outputs still agree exactly."""
    rng = np.random.default_rng(2)
    L = 1024
    counts4 = np.zeros((L, 6, 3, 1), dtype=np.int32)
    ref_support = rng.integers(0, 12, L)
    alt = rng.integers(0, 500, L)
    for i in range(L):
        counts4[i, 0, 0, 0] = ref_support[i]          # A = reference
        counts4[i, 2, 1, 0] = alt[i]                  # deep G pileup
    ref_code = np.zeros(L, dtype=np.int32)
    _compare(counts4, ref_code)
