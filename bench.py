"""Benchmark: candidate loci scored/sec/chip (the north-star metric).

Measures steady-state throughput of the fused per-locus scoring kernel
(coverage totals + Poisson q-score + strand bias + somatic GT/GQ + filter
bits) over padded locus tiles on one chip, and compares against the
single-core host (numpy f64) implementation of the same math running on this
machine — the in-repo baseline proxy, since the reference publishes no
throughput numbers (BASELINE.md).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def bench_device(counts, ref_code, iters=20):
    import jax
    import jax.numpy as jnp
    from pisces_tpu.ops.jax_scoring import ScoringParams, score_reference_loci

    params = ScoringParams()
    counts_d = jax.device_put(counts)
    ref_d = jax.device_put(ref_code)

    @jax.jit
    def step(c, r, salt):
        # salt defeats any cross-call caching without changing memory traffic
        out = score_reference_loci(c, r, params)
        return (out["variant_qscore"].sum() + out["gq"].sum()
                + out["filter_bits"].sum() + salt)

    float(step(counts_d, ref_d, 0))  # compile + warm
    t0 = time.perf_counter()
    acc = 0
    for i in range(iters):
        acc += int(step(counts_d, ref_d, i))  # host fetch syncs every step
    dt = time.perf_counter() - t0
    assert acc != 0
    return counts.shape[0] * iters / dt


def bench_host(counts, ref_code, iters=1):
    """Same scoring contract in the f64 numpy parity backend."""
    from pisces_tpu.domain.types import AlleleType
    from pisces_tpu.ops import stats

    cov_alleles = np.array([0, 1, 2, 3, 5])
    t0 = time.perf_counter()
    for _ in range(iters):
        c = counts.sum(axis=-1)
        cov_by_dir = c[:, cov_alleles, :].sum(axis=1)
        total_cov = cov_by_dir.sum(axis=-1)
        sup_by_dir = c[np.arange(len(c)), ref_code, :]
        support = sup_by_dir.sum(axis=-1)
        q = stats.compute_variant_qscores(support, total_cov, 100, 20)
        sb = stats.compute_strand_bias(sup_by_dir, cov_by_dir, 20, 0.01, 0.5, 1)
        freq = np.where(total_cov == 0, 0.0, support / np.maximum(total_cov, 1))
        gt = stats.somatic_genotypes(np.ones(len(c), bool),
                                     freq.astype(np.float32),
                                     freq.astype(np.float32), total_cov, 0.01, 10)
        gq = stats.somatic_genotype_qscores(gt, q, freq.astype(np.float32),
                                            total_cov, 0.01, 0, 100)
    dt = time.perf_counter() - t0
    return counts.shape[0] * iters / dt


def main():
    rng = np.random.default_rng(0)
    L = 1 << 20  # 1M loci per tile
    counts = rng.integers(0, 30, size=(L, 6, 3, 11)).astype(np.int32)
    ref_code = rng.integers(0, 4, size=(L,)).astype(np.int32)

    host_rate = bench_host(counts[: L // 8], ref_code[: L // 8])
    try:
        device_rate = bench_device(counts, ref_code)
    except Exception as e:  # no accelerator available
        print(f"device bench failed ({e}); reporting host rate",
              file=sys.stderr)
        device_rate = host_rate

    print(json.dumps({
        "metric": "candidate loci scored/sec/chip",
        "value": round(device_rate),
        "unit": "loci/s",
        "vs_baseline": round(device_rate / host_rate, 2),
    }))


if __name__ == "__main__":
    main()
