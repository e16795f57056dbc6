"""Multi-device region sharding for the scoring pipeline.

Maps the reference's parallelism inventory (SURVEY §2.5) onto a JAX device
mesh:
  - 'dp' (data parallel)   ~ independent region-tile batches, the analog of
    thread-per-(bam,chr) jobs (BaseGenomeProcessor.cs:40-135)
  - 'sp' (sequence parallel) ~ the genomic position axis within a tile, the
    analog of 1000-bp RegionState blocks streamed in order; block-boundary
    spillover (RegionStateManager.cs:303-314, MnvReallocator peel) becomes a
    ppermute halo exchange between adjacent position shards.

XLA inserts the psum/all_gather collectives from the shardings; the halo
exchange is explicit via shard_map + ppermute.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pisces_tpu.ops.jax_scoring import ScoringParams, score_reference_loci


def factor_mesh(n: int) -> Tuple[int, int]:
    """Factor n devices into (dp, sp), preferring a balanced 2D mesh."""
    best = (1, n)
    for dp in range(1, int(n ** 0.5) + 1):
        if n % dp == 0:
            best = (dp, n // dp)
    return best


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    dp, sp = factor_mesh(len(devices))
    dev_array = np.array(devices).reshape(dp, sp)
    return Mesh(dev_array, axis_names=("dp", "sp"))


def halo_exchange_boundary(cov_by_dir: jnp.ndarray, axis_name: str = "sp"):
    """Exchange block-edge coverage columns with the right neighbor shard.

    cov_by_dir: [L_local, 3] per-position coverage on this position shard.
    Returns next_cov: [L_local, 3] where row i holds coverage of position
    i+1 (the right halo), with the last shard's final row zero-filled.
    This is the spanning-variant reconciliation halo (deletion/MNV coverage
    needs both endpoints; endpoints can live on adjacent shards).
    """
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    shifted = jnp.roll(cov_by_dir, -1, axis=0)
    # first row of the right neighbor replaces our (invalid) last row
    perm = [(i, (i - 1) % n) for i in range(n)]  # receive from right neighbor
    neighbor_first = jax.lax.ppermute(cov_by_dir[:1], axis_name, perm)
    last = jnp.where(idx == n - 1, jnp.zeros_like(neighbor_first), neighbor_first)
    return shifted.at[-1:].set(last[0])


def build_sharded_step(mesh: Mesh, params: ScoringParams):
    """The full distributed scoring step: fused per-locus scoring on every
    shard + halo exchange of boundary coverage + psum'd global summaries."""

    def local_step(counts, ref_code):
        # counts: [L_local, 6, 3, K] on this (dp, sp) shard
        out = score_reference_loci(counts, ref_code, params)
        next_cov = halo_exchange_boundary(out["coverage_by_dir"], "sp")
        # spanning reconciliation estimate: mean of the two endpoints
        span_cov = ((out["coverage_by_dir"][:, :2] + next_cov[:, :2]) // 2)
        # global summary stats over the whole mesh (VQR/AdaptiveGT analog)
        called = jnp.sum(out["variant_qscore"] >= params.min_variant_qscore)
        called = jax.lax.psum(jax.lax.psum(called, "sp"), "dp")
        covered = jax.lax.psum(jax.lax.psum(
            jnp.sum(out["total_coverage"] > 0), "sp"), "dp")
        return (out["variant_qscore"], out["genotype"], out["gq"],
                out["filter_bits"], span_cov, called, covered)

    step = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(("dp",), "sp"), P(("dp",), "sp")),
        out_specs=(P(("dp",), "sp"), P(("dp",), "sp"), P(("dp",), "sp"),
                   P(("dp",), "sp"), P(("dp",), "sp", None), P(), P()),
    )
    return jax.jit(step)


def run_dryrun(mesh: Mesh, params: Optional[ScoringParams] = None,
               tiles_per_dp: int = 2, tile_len: int = 64):
    """Compile + execute one distributed step on tiny shapes."""
    params = params or ScoringParams()
    dp = mesh.shape["dp"]
    sp = mesh.shape["sp"]
    L = dp * tiles_per_dp * sp * tile_len
    rng = np.random.default_rng(0)
    counts = rng.integers(0, 20, size=(L, 6, 3, 11)).astype(np.int32)
    ref_code = rng.integers(0, 4, size=(L,)).astype(np.int32)

    counts = jax.device_put(counts, NamedSharding(mesh, P(("dp",), None)))
    # position-major layout: shard L over dp*sp jointly
    counts = jax.device_put(counts, NamedSharding(mesh, P(("dp", "sp"),)))
    ref_code = jax.device_put(ref_code, NamedSharding(mesh, P(("dp", "sp"),)))

    step = jax.shard_map(
        _dryrun_local(params), mesh=mesh,
        in_specs=(P(("dp", "sp")), P(("dp", "sp"))),
        out_specs=(P(("dp", "sp")), P()),
    )
    q, called = jax.jit(step)(counts, ref_code)
    jax.block_until_ready((q, called))
    return int(called)


def _dryrun_local(params: ScoringParams):
    def local_step(counts, ref_code):
        out = score_reference_loci(counts, ref_code, params)
        cov = out["coverage_by_dir"]
        # halo over the flattened (dp, sp) ring
        n_dp = jax.lax.psum(1, "dp")
        n_sp = jax.lax.psum(1, "sp")
        shifted = jnp.roll(cov, -1, axis=0)
        perm_sp = [(i, (i - 1) % n_sp) for i in range(n_sp)]
        neighbor_first = jax.lax.ppermute(cov[:1], "sp", perm_sp)
        shifted = shifted.at[-1:].set(neighbor_first[0])
        span = (cov[:, :2] + shifted[:, :2]) // 2
        called = jnp.sum(out["variant_qscore"] >= params.min_variant_qscore)
        called = jax.lax.psum(jax.lax.psum(called, "sp"), "dp")
        return out["variant_qscore"] + 0 * span.sum(axis=-1).astype(jnp.int32), called
    return local_step
