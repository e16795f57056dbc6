"""Block-tiled pileup count tensors.

The reference's RegionState holds, per 1000-bp block, dense tensors
  _alleleCounts[blockSize, 6 alleleTypes, 3 directions, 2A+1 anchorIndexes]
  _sumOfAlleleBaseQualities[same shape]
(RegionState.cs:18-66). That layout is already TPU-friendly; here we build it
for all *touched* blocks of a chromosome at once with one scatter-add, either
on device (JAX, default) or host (numpy, for tests/parity).

The anchor-windowed count reductions (AlleleCountHelper.cs:22-80) become
tensor reductions over the last axis.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import numpy as np

from pisces_tpu.domain.types import (
    NUM_ALLELE_TYPES, NUM_DIRECTION_TYPES, AlleleType, num_anchor_indexes,
)
from pisces_tpu.options import REGION_SIZE
from pisces_tpu.pileup.events import BaseEvents


@dataclass
class PileupCounts:
    """Counts for the touched blocks of one chromosome."""

    block_keys: np.ndarray    # int64 [NB] sorted block keys (key k covers
                              # positions (k-1)*B+1 .. k*B, 1-based; RegionStateManager.GetBlockKey)
    block_size: int
    anchor_size: int
    counts: np.ndarray        # int32 [NB, B, 6, 3, 2A+1]
    qual_sums: np.ndarray     # float64/float32 [NB, B, 6, 3, 2A+1]

    def block_slot(self, pos) -> np.ndarray:
        """Map 1-based genomic position(s) to block slot (-1 if untouched)."""
        keys = (np.asarray(pos, dtype=np.int64) + self.block_size - 1) // self.block_size
        slot = np.searchsorted(self.block_keys, keys)
        slot = np.minimum(slot, len(self.block_keys) - 1)
        ok = self.block_keys[slot] == keys
        return np.where(ok, slot, -1)

    def flat_view(self):
        """[NB*B, 6, 3, K] views for position-indexed access."""
        nb = len(self.block_keys)
        k = num_anchor_indexes(self.anchor_size)
        return (self.counts.reshape(nb * self.block_size, NUM_ALLELE_TYPES,
                                    NUM_DIRECTION_TYPES, k),
                self.qual_sums.reshape(nb * self.block_size, NUM_ALLELE_TYPES,
                                       NUM_DIRECTION_TYPES, k))

    def pos_index(self, pos) -> np.ndarray:
        """Row index into flat_view arrays; -1 when position untouched."""
        pos = np.asarray(pos, dtype=np.int64)
        slot = self.block_slot(pos)
        within = (pos - 1) % self.block_size
        return np.where(slot >= 0, slot * self.block_size + within, -1)


def _event_indices(ev: BaseEvents, block_keys: np.ndarray, block_size: int,
                   anchor_size: int):
    """Flatten events to linear indices in the [NB*B*6*3*K] tensor."""
    k = num_anchor_indexes(anchor_size)
    keys = (ev.gpos + block_size - 1) // block_size
    slot = np.searchsorted(block_keys, keys)
    within = (ev.gpos - 1) % block_size
    row = slot * block_size + within
    lin = ((row * NUM_ALLELE_TYPES + ev.allele.astype(np.int64))
           * NUM_DIRECTION_TYPES + ev.direction.astype(np.int64)) * k \
        + ev.anchor.astype(np.int64)
    return lin


def build_counts_host(ev: BaseEvents, block_size: int = REGION_SIZE,
                      anchor_size: int = 5) -> PileupCounts:
    """Host (numpy, f64 qual sums) pileup build - the parity reference."""
    k = num_anchor_indexes(anchor_size)
    if len(ev.gpos) == 0:
        return PileupCounts(np.empty(0, np.int64), block_size, anchor_size,
                            np.zeros((0, block_size, NUM_ALLELE_TYPES,
                                      NUM_DIRECTION_TYPES, k), np.int32),
                            np.zeros((0, block_size, NUM_ALLELE_TYPES,
                                      NUM_DIRECTION_TYPES, k), np.float64))
    keys = (ev.gpos + block_size - 1) // block_size
    block_keys = np.unique(keys)
    nb = len(block_keys)
    lin = _event_indices(ev, block_keys, block_size, anchor_size)
    size = nb * block_size * NUM_ALLELE_TYPES * NUM_DIRECTION_TYPES * k
    counts = np.bincount(lin, minlength=size).astype(np.int32)
    qual_sums = np.bincount(lin, weights=ev.qerr.astype(np.float64), minlength=size)
    shape = (nb, block_size, NUM_ALLELE_TYPES, NUM_DIRECTION_TYPES, k)
    return PileupCounts(block_keys, block_size, anchor_size,
                        counts.reshape(shape), qual_sums.reshape(shape))


def build_counts_device(ev: BaseEvents, block_size: int = REGION_SIZE,
                        anchor_size: int = 5) -> PileupCounts:
    """Device (JAX scatter-add) pileup build.

    The scatter-add runs on the accelerator; results come back as numpy for
    the host orchestration layer. Keeping data on device end-to-end is the
    job of the fused scoring path (ops/jax_scoring.py).
    """
    import jax
    import jax.numpy as jnp

    k = num_anchor_indexes(anchor_size)
    if len(ev.gpos) == 0:
        return build_counts_host(ev, block_size, anchor_size)
    keys = (ev.gpos + block_size - 1) // block_size
    block_keys = np.unique(keys)
    nb = len(block_keys)
    lin = _event_indices(ev, block_keys, block_size, anchor_size)
    size = nb * block_size * NUM_ALLELE_TYPES * NUM_DIRECTION_TYPES * k

    @partial(jax.jit, static_argnums=(2,))
    def scatter(lin_idx, qerr, total):
        counts = jnp.zeros((total,), jnp.int32).at[lin_idx].add(1)
        quals = jnp.zeros((total,), jnp.float32).at[lin_idx].add(qerr)
        return counts, quals

    counts, quals = scatter(jnp.asarray(lin), jnp.asarray(ev.qerr), size)
    shape = (nb, block_size, NUM_ALLELE_TYPES, NUM_DIRECTION_TYPES, k)
    return PileupCounts(block_keys, block_size, anchor_size,
                        np.asarray(counts).reshape(shape),
                        np.asarray(quals, dtype=np.float64).reshape(shape))


# ---------------------------------------------------------------------------
# Anchor-windowed lookups (AlleleCountHelper semantics)
# ---------------------------------------------------------------------------

def anchor_window_sum(arr_last_axis: np.ndarray, anchor_size: int, min_anchor: int,
                      max_anchor: Optional[int], from_end: bool,
                      symmetric: bool = False) -> np.ndarray:
    """Sum counts over the anchor axis per AlleleCountHelper.GetAnchorAdjusted*.

    arr_last_axis: [..., K] with K = 2A+1; returns [...].
    """
    a = anchor_size
    k = num_anchor_indexes(a)
    well = a
    true_min = min(well, min_anchor)
    if max_anchor is None:
        initial_max = well
    elif max_anchor >= well:
        initial_max = well - 1
    else:
        initial_max = max_anchor

    idx = []
    if from_end:
        for i in range(true_min, initial_max + 1):
            idx.append(k - i - 1)
        if max_anchor is None:
            start = true_min if symmetric else 0
            for i in range(start, initial_max):
                idx.append(i)
    else:
        for i in range(true_min, initial_max + 1):
            idx.append(i)
        if max_anchor is None:
            stop = (k - true_min) if symmetric else k
            for i in range(initial_max + 1, stop):
                idx.append(i)
    if not idx:
        return np.zeros(arr_last_axis.shape[:-1], dtype=arr_last_axis.dtype)
    return arr_last_axis[..., np.array(idx, dtype=np.intp)].sum(axis=-1)


def total_counts(pc: PileupCounts):
    """Full anchor-axis sums: counts[NB,B,6,3], qual[NB,B,6,3]."""
    return pc.counts.sum(axis=-1), pc.qual_sums.sum(axis=-1)
