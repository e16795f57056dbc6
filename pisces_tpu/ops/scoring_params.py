"""Scoring configuration shared by the device (ops/jax_scoring) and host
(ops/stats) backends, in a module with no jax dependency: the host-scoring
cold path must not pay the jax.scipy.special import (~25ms of the
Chr17Chr19 cold first-run profile) just to build a parameter tuple.
Reference parameter sources: VariantCallingParameters.cs defaults used by
VariantQualityCalculator / StrandBiasCalculator / SomaticGenotyper."""
from __future__ import annotations

from typing import NamedTuple

# filter bit positions in the output bitmask
FILTER_BIT_LOW_DEPTH = 0
FILTER_BIT_LOW_VARIANT_QSCORE = 1
FILTER_BIT_STRAND_BIAS = 2
FILTER_BIT_LOW_VARIANT_FREQUENCY = 3
FILTER_BIT_NO_CALL = 4


class ScoringParams(NamedTuple):
    """Static scoring configuration baked into the compiled kernel."""

    noise_level: int = 20            # NoiseLevelUsedForQScoring
    max_variant_qscore: int = 100
    min_variant_qscore: int = 20
    variant_qscore_filter: int = 30
    min_frequency: float = 0.01
    min_frequency_filter: float = 0.01
    target_lod: float = 0.01
    min_depth: int = 10
    low_depth_filter: int = 10
    min_gq: int = 0
    max_gq: int = 100
    sb_acceptance: float = 0.5
    no_call_filter: float = 0.6
