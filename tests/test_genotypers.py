"""Genotyper golden tests (diploid thresholding GQ, somatic via test_stats,
haploid, adaptive mixture model).

Goldens from src/test/Pisces.Genotyping.Tests/*.cs.
"""
import numpy as np
import pytest

from pisces_tpu.domain.types import AlleleCategory, Genotype
from pisces_tpu.calling.alleles import CalledAllele
from pisces_tpu.genotype.diploid import (
    DiploidThresholdingGenotyper, HaploidGenotyper, diploid_gq,
)
from pisces_tpu.genotype import adaptive


def make_allele(support, coverage, gt=Genotype.HETEROZYGOUS_ALT_REF,
                category=AlleleCategory.SNV, ref="A", alt="T", pos=100):
    a = CalledAllele("chr1", pos, ref, alt, category)
    a.allele_support = support
    a.total_coverage = coverage
    a.reference_support = coverage - support
    a.genotype = gt
    a.variant_qscore = 100
    return a


class TestDiploidGQ:
    """DiploidGenotypeQualityCalculatorTests goldens (from excel)."""

    @pytest.mark.parametrize("freq,expected", zip(
        [0, 0.01, 0.05, 0.10, 0.15, 0.19], [200, 188, 144, 89, 36, 0]))
    def test_hom_ref_depth100(self, freq, expected):
        a = make_allele(int(100 * (1 - freq)), 100, Genotype.HOMOZYGOUS_REF)
        assert diploid_gq(a, 0, 2 ** 31 - 1) == expected

    @pytest.mark.parametrize("freq,expected", zip(
        [0.2, 0.21, 0.25, 0.30, 0.35, 0.45, 0.49, 0.50, 0.51, 0.55, 0.59,
         0.60, 0.61, 0.68, 0.69],
        [0, 0, 18, 57, 96, 174, 205, 212, 201, 156, 122, 99, 88, 9, 0]))
    def test_het_depth100(self, freq, expected):
        a = make_allele(int(100 * freq), 100, Genotype.HETEROZYGOUS_ALT_REF)
        assert diploid_gq(a, 0, 2 ** 31 - 1) == expected

    @pytest.mark.parametrize("freq,expected", zip(
        [0.7, 0.71, 0.75, 0.80, 0.85, 0.90, 0.95, 0.99, 1.0],
        [0, 7, 54, 114, 175, 237, 300, 352, 365]))
    def test_hom_alt_depth100(self, freq, expected):
        a = make_allele(int(100 * freq), 100, Genotype.HOMOZYGOUS_ALT)
        assert diploid_gq(a, 0, 2 ** 31 - 1) == expected

    def test_depth_1000_spot_checks(self):
        a = make_allele(1000, 1000, Genotype.HOMOZYGOUS_REF)
        assert diploid_gq(a, 0, 2 ** 31 - 1) == 2001
        a = make_allele(500, 1000, Genotype.HETEROZYGOUS_ALT_REF)
        assert diploid_gq(a, 0, 2 ** 31 - 1) == 2129
        a = make_allele(1000, 1000, Genotype.HOMOZYGOUS_ALT)
        assert diploid_gq(a, 0, 2 ** 31 - 1) == 3653

    def test_over_100_percent_insertion(self):
        # PICS-849: support exceeding coverage -> H1 impossible -> max
        a = make_allele(119, 100, Genotype.HOMOZYGOUS_ALT)
        assert diploid_gq(a, 0, 2 ** 31 - 1) == 2 ** 31 - 1

    def test_nocall_gets_min(self):
        a = make_allele(50, 100, Genotype.REF_LIKE_NOCALL)
        assert diploid_gq(a, 0, 2 ** 31 - 1) == 0


class _Cfg:
    min_gq_score = 0
    max_gq_score = 100
    min_depth_to_genotype = 10
    diploid_snv_parameters = None
    diploid_indel_parameters = None
    adaptive_parameters = None


class TestDiploidThresholding:
    def _gt(self, alleles):
        g = DiploidThresholdingGenotyper(_Cfg())
        prune = g.set_genotypes(alleles)
        return alleles[0].genotype, prune

    def test_hom_ref(self):
        ref = make_allele(95, 100, category=AlleleCategory.REFERENCE,
                          ref="A", alt="A")
        ref.reference_support = 95
        gt, prune = self._gt([ref])
        assert gt == Genotype.HOMOZYGOUS_REF

    def test_het(self):
        v = make_allele(45, 100)
        gt, prune = self._gt([v])
        assert gt == Genotype.HETEROZYGOUS_ALT_REF
        assert prune == []

    def test_hom_alt(self):
        v = make_allele(95, 100)
        gt, _ = self._gt([v])
        assert gt == Genotype.HOMOZYGOUS_ALT

    def test_low_freq_pruned(self):
        v = make_allele(5, 100)  # 5% < 20% minor VF; ref freq 0.95 -> 0/0
        gt, prune = self._gt([v])
        assert gt == Genotype.HOMOZYGOUS_REF
        assert v in prune

    def test_alt1_alt2(self):
        v1 = make_allele(55, 100, alt="T")
        v2 = make_allele(42, 100, alt="G")
        v1.reference_support = 3  # true ref-base counts, not coverage-support
        v2.reference_support = 3
        gt, _ = self._gt([v1, v2])
        assert gt == Genotype.HETEROZYGOUS_ALT1_ALT2

    def test_low_depth_nocall(self):
        v = make_allele(4, 8)
        gt, _ = self._gt([v])
        assert gt == Genotype.ALT_LIKE_NOCALL


class TestHaploid:
    def test_hemi_alt(self):
        v = make_allele(90, 100)
        g = HaploidGenotyper(_Cfg())
        g.set_genotypes([v])
        assert v.genotype == Genotype.HEMIZYGOUS_ALT

    def test_hemi_ref(self):
        ref = make_allele(95, 100, category=AlleleCategory.REFERENCE,
                          ref="A", alt="A")
        ref.reference_support = 95
        g = HaploidGenotyper(_Cfg())
        g.set_genotypes([ref])
        assert ref.genotype == Genotype.HEMIZYGOUS_REF

    def test_ambiguous_nocall(self):
        v = make_allele(50, 100)
        g = HaploidGenotyper(_Cfg())
        g.set_genotypes([v])
        assert v.genotype == Genotype.HEMIZYGOUS_NOCALL


class TestMixtureModel:
    def _synth(self, n=3000, seed=0):
        rng = np.random.default_rng(seed)
        comps = rng.choice(3, size=n, p=[0.6, 0.3, 0.1])
        true_means = np.array([0.01, 0.45, 0.95])
        dp = rng.integers(50, 300, size=n)
        ad = rng.binomial(dp, true_means[comps])
        return ad, dp, comps, true_means

    def test_em_recovers_means(self):
        ad, dp, comps, true_means = self._synth()
        fit = adaptive.fit_mixture_model(ad, dp)
        assert np.allclose(fit.means, true_means, atol=0.02)
        # clustering should mostly agree with truth
        agree = (fit.clustering == comps).mean()
        assert agree > 0.98

    def test_jax_em_matches_numpy(self):
        ad, dp, _, _ = self._synth(n=2000, seed=1)
        fit = adaptive.fit_mixture_model(ad, dp)
        means_j, weights_j = adaptive.fit_mixture_model_jax(ad, dp)
        assert np.allclose(fit.means, means_j, atol=5e-3)
        assert np.allclose(fit.weights, weights_j, atol=5e-3)

    def test_prefit_model(self):
        ad, dp, comps, _ = self._synth(n=500, seed=2)
        fit = adaptive.use_prefit_model(ad, dp, [0.01, 0.45, 0.95],
                                        [0.6, 0.3, 0.1])
        assert (fit.clustering == comps).mean() > 0.97

    def test_single_site_posteriors(self):
        cat, q, gp = adaptive.calculate_q_and_posteriors(
            50, 100, [0.037, 0.439, 0.976], [0.755, 0.154, 0.0919])
        assert cat == 1  # heterozygous
        assert q > 0
        assert len(gp) == 3
        assert gp[1] < gp[0] and gp[1] < gp[2]  # het most probable (lowest phred)


class TestAdaptiveGenotyper:
    def test_het_site(self):
        v = make_allele(48, 100)
        g = adaptive.DiploidAdaptiveGenotyper(_Cfg())
        prune = g.set_genotypes([v])
        assert v.genotype == Genotype.ALT_AND_NOCALL or \
            v.genotype == Genotype.HETEROZYGOUS_ALT_REF
        assert v.genotype_posteriors is not None

    def test_hom_alt_site(self):
        v = make_allele(98, 100)
        g = adaptive.DiploidAdaptiveGenotyper(_Cfg())
        g.set_genotypes([v])
        assert v.genotype == Genotype.HOMOZYGOUS_ALT
