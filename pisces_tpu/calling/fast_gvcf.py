"""Columnar gVCF reference-line pipeline (the dense hot path).

gVCF output is O(genome length) (SURVEY: RegionState.GetAllCandidates makes
per-base ref synthesis the dominant volume path). Instead of materializing a
Candidate + CalledAllele object per covered position, this path:

  1. scores every touched position with the fused device kernel
     (ops/jax_scoring.score_reference_loci) in one pass,
  2. formats reference VCF lines columnar on the host,
  3. leaves variant positions to the exact object pipeline and splices the
     two streams by position at write time.

Output is byte-identical to the object path (asserted in tests); positions
needing non-columnar semantics (gapped-MNV ref adjustments) fall back to the
object path.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Set, Tuple

import numpy as np

from pisces_tpu.domain.types import AlleleType, Genotype
from pisces_tpu.options import PiscesApplicationOptions
from pisces_tpu.pileup.counts import PileupCounts
from pisces_tpu.io.vcf_write import VcfWriterConfig, dotnet_format

_GT_STR = {
    int(Genotype.HOMOZYGOUS_REF): "0/0",
    int(Genotype.REF_LIKE_NOCALL): "./.",
    int(Genotype.REF_AND_NOCALL): "0/.",
}


def score_reference_positions(pc: PileupCounts, refseq: np.ndarray,
                              params, use_device: bool = True):
    """Run the fused scoring kernel over all touched positions with
    total support > 0. Returns (positions[int64], outputs dict)."""
    from pisces_tpu.domain.types import BASE_TO_ALLELE

    nb = len(pc.block_keys)
    if nb == 0:
        return np.empty(0, np.int64), None
    block_size = pc.block_size
    starts = (pc.block_keys - 1) * block_size + 1
    positions = (starts[:, None] + np.arange(block_size)[None, :]).reshape(-1)
    # totals with a singleton anchor axis: the fused kernel's anchor-sum
    # reduction is then a no-op
    counts = pc.counts_t.reshape(nb * block_size,
                                 *pc.counts_t.shape[2:])[..., None]
    total_support = counts.sum(axis=(1, 2, 3))
    in_ref = positions <= len(refseq)
    sel = (total_support > 0) & in_ref
    positions = positions[sel]
    counts = counts[sel]
    if len(positions) == 0:
        return positions, None
    ref_codes = BASE_TO_ALLELE[refseq[positions - 1]].astype(np.int32)

    if use_device:
        import jax
        from pisces_tpu.domain.types import COVERAGE_CONTRIBUTING_ALLELES
        from pisces_tpu.ops.jax_scoring import score_reference_tuples
        # dedup to unique (support_by_dir, cov_by_dir) tuples on host:
        # device scores U << L rows and the host scatters back, shrinking
        # both device work and device->host readback
        cov_alleles = np.array([int(a) for a in COVERAGE_CONTRIBUTING_ALLELES])
        c = counts.sum(axis=-1)
        all_cov_by_dir = c[:, cov_alleles, :].sum(axis=1)
        all_support_by_dir = c[np.arange(len(c)), ref_codes, :]
        key = np.concatenate([all_support_by_dir, all_cov_by_dir], axis=1)
        uniq, inv = np.unique(key, axis=0, return_inverse=True)
        u = len(uniq)
        # pad to a power-of-two tile so XLA compiles one kernel per size class
        upad = max(128, 1 << (u - 1).bit_length())
        sup_p = np.zeros((upad, 3), np.int32)
        cov_p = np.zeros((upad, 3), np.int32)
        sup_p[:u] = uniq[:, :3]
        cov_p[:u] = uniq[:, 3:]
        out_u = score_reference_tuples(jax.device_put(sup_p),
                                       jax.device_put(cov_p), params)
        keep_keys = ("total_coverage", "support", "variant_qscore",
                     "frequency", "genotype", "gq", "sb_gatk")
        out = {k: np.asarray(out_u[k])[:u][inv] for k in keep_keys}
    else:
        out = _score_host(counts, ref_codes, params)
    out["ref_base"] = refseq[positions - 1]
    return positions, out


def _score_host(counts, ref_codes, params):
    """Host (f64) equivalent of the fused kernel, for parity testing.

    All outputs are pure functions of the per-position 6-tuple
    (support_by_dir, coverage_by_dir); gVCF reference loci repeat a small
    set of such tuples, so the expensive math (Poisson CDF, strand bias)
    runs once per unique tuple and is scattered back by inverse index.
    """
    from pisces_tpu.domain.types import COVERAGE_CONTRIBUTING_ALLELES
    from pisces_tpu.ops import stats
    cov_alleles = np.array([int(a) for a in COVERAGE_CONTRIBUTING_ALLELES])
    c = counts.sum(axis=-1)
    all_cov_by_dir = c[:, cov_alleles, :].sum(axis=1)
    all_support_by_dir = c[np.arange(len(c)), ref_codes, :]
    key = np.concatenate([all_support_by_dir, all_cov_by_dir], axis=1)
    uniq, inv = np.unique(key, axis=0, return_inverse=True)
    support_by_dir = uniq[:, :3]
    cov_by_dir = uniq[:, 3:]
    total_cov = cov_by_dir.sum(axis=-1)
    support = support_by_dir.sum(axis=-1)
    q = stats.compute_variant_qscores(support, total_cov,
                                      params.max_variant_qscore,
                                      params.noise_level)
    q = np.where((total_cov == 0) | (support <= 0), 0, q)
    freq = np.where(total_cov == 0, 0.0,
                    np.minimum(support.astype(np.float32)
                               / np.maximum(total_cov, 1).astype(np.float32), 1.0))
    sb = stats.compute_strand_bias(support_by_dir, cov_by_dir,
                                   params.noise_level, params.min_frequency,
                                   params.sb_acceptance, 1)
    gatk = np.where(support > 0, sb["gatk_bias_score"], 0.0)
    gt = stats.somatic_genotypes(np.ones(len(uniq), bool), freq, freq,
                                 total_cov, params.min_frequency_filter,
                                 params.min_depth)
    gq = stats.somatic_genotype_qscores(gt, q, freq, total_cov,
                                        params.target_lod, params.min_gq,
                                        params.max_gq)
    return {
        "total_coverage": total_cov[inv],
        "support": support[inv],
        "variant_qscore": q[inv],
        "frequency": freq[inv],
        "genotype": gt[inv],
        "gq": gq[inv],
        "sb_gatk": gatk[inv],
    }


def format_reference_lines(chrom: str, positions: np.ndarray, out: dict,
                           wcfg: VcfWriterConfig,
                           low_depth_filter: int,
                           qscore_filter: int) -> List[str]:
    """Columnar VCF line formatting for reference loci (uncrushed mode,
    FORMAT GT:GQ:AD:DP:VF[:NL:SB])."""
    n = len(positions)
    if n == 0:
        return []
    total = out["total_coverage"]
    support = out["support"]
    q = out["variant_qscore"]
    gq = out["gq"]
    gt = out["genotype"]
    gatk = np.clip(out["sb_gatk"], -100.0, 0.0)
    ref_base = out["ref_base"]
    freq_digits = wcfg.freq_decimals
    include_sb = wcfg.should_output_strand_bias_and_noise_level
    nl = wcfg.estimated_base_call_quality

    # FILTER column
    low_dp = total < low_depth_filter
    low_q = (q < qscore_filter) & (total != 0)

    # VF for refs: 1 - freq (0 when no coverage); freq = support/total in f32
    with np.errstate(invalid="ignore"):
        vf = np.where(total == 0, 0.0,
                      1.0 - np.minimum(
                          support.astype(np.float32)
                          / np.maximum(total, 1).astype(np.float32), 1.0))

    # memoized formatting: VF/SB values repeat heavily (ratios of small ints)
    vf_memo: Dict[float, str] = {}
    sb_memo: Dict[float, str] = {}

    def fmt_vf(x: float) -> str:
        s = vf_memo.get(x)
        if s is None:
            s = dotnet_format(x, freq_digits)
            vf_memo[x] = s
        return s

    def fmt_sb(x: float) -> str:
        s = sb_memo.get(x)
        if s is None:
            s = dotnet_format(x, 4)
            sb_memo[x] = s
        return s

    q_filter_tag = f"q{qscore_filter}"
    filt_lut = ["PASS", q_filter_tag, "LowDP", f"LowDP;{q_filter_tag}"]
    filt_code = (low_dp.astype(np.int8) << 1) | low_q.astype(np.int8)
    gt_lut = {k: v for k, v in _GT_STR.items()}

    pos_l = positions.tolist()
    q_l = q.tolist()
    gq_l = gq.tolist()
    sup_l = support.tolist()
    tot_l = total.tolist()
    gt_l = gt.tolist()
    vf_l = vf.tolist()
    gatk_l = gatk.tolist()
    fc_l = filt_code.tolist()
    base_l = [chr(b) for b in ref_base.tolist()]

    lines: List[str] = []
    append = lines.append
    if include_sb:
        for i in range(n):
            append(f"{chrom}\t{pos_l[i]}\t.\t{base_l[i]}\t.\t{q_l[i]}\t"
                   f"{filt_lut[fc_l[i]]}\tDP={tot_l[i]}\tGT:GQ:AD:DP:VF:NL:SB\t"
                   f"{gt_lut.get(gt_l[i], './.')}:{gq_l[i]}:{sup_l[i]}:"
                   f"{tot_l[i]}:{fmt_vf(vf_l[i])}:{nl}:{fmt_sb(gatk_l[i])}")
    else:
        for i in range(n):
            append(f"{chrom}\t{pos_l[i]}\t.\t{base_l[i]}\t.\t{q_l[i]}\t"
                   f"{filt_lut[fc_l[i]]}\tDP={tot_l[i]}\tGT:GQ:AD:DP:VF\t"
                   f"{gt_lut.get(gt_l[i], './.')}:{gq_l[i]}:{sup_l[i]}:"
                   f"{tot_l[i]}:{fmt_vf(vf_l[i])}")
    return lines
