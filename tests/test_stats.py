"""Math-layer golden tests.

Golden values taken from the reference unit tests
(src/test/Pisces.Calculators.Tests/UnitTests/QualityCalculatorTests.cs,
StrandBiasCalculatorTests.cs) and cross-checked against scipy.
"""
import numpy as np
import pytest

from pisces_tpu.domain.types import Genotype, StrandBiasModel
from pisces_tpu.ops import stats


class TestPoissonQScore:
    def test_qscore_goldens(self):
        # (coverage, support) -> expected Q (QualityCalculatorTests.Compute)
        cases = [
            (100, 0, 0), (100, 1, 2), (100, 5, 24), (200, 10, 43),
            (500, 25, 98), (5000, 250, 890), (10000, 250, 356),
            (10000, 500, 1770), (10000, 9995, 156912),
        ]
        cov = np.array([c for c, _, _ in cases])
        sup = np.array([s for _, s, _ in cases])
        expected = np.array([q for _, _, q in cases])
        got = stats.assign_poisson_qscore(sup, cov, 20, 2 ** 31)
        np.testing.assert_array_equal(got, expected)
        capped = stats.assign_poisson_qscore(sup, cov, 20, 100)
        np.testing.assert_array_equal(capped, np.minimum(expected, 100))

    def test_pvalues(self):
        # Pisces_AssignPValue goldens
        p = stats.assign_raw_poisson_qscore(1, 100, 20)
        # p-value checks: gammainc(k, lam)
        from scipy import special as sp
        assert abs(sp.gammainc(1, 1.0) - 0.6321) < 1e-4
        assert abs(sp.gammainc(5, 1.0) - 0.003659) < 1e-5
        assert abs(sp.gammainc(10, 2.0) - 4.65e-5) < 1e-5
        assert abs(sp.gammainc(25, 5.0) - 1.599e-10) < 1e-10

    def test_bad_input(self):
        assert stats.assign_poisson_qscore(0, 0, 0, 100) == 0
        assert stats.assign_poisson_qscore(0, 0, 20, 100) == 0
        assert stats.assign_poisson_qscore(0, -1, 20, 100) == 0

    def test_underflow_fallback(self):
        # far beyond f64 range: exercised by the log-space fallback
        q = stats.assign_raw_poisson_qscore(9995, 10000, 20)
        assert abs(q - 156912) < 1.0


class TestStrandBias:
    def _run(self, support, coverage, noise_q, min_freq, criteria, model):
        return stats.compute_strand_bias(
            np.array([support]), np.array([coverage]), noise_q, min_freq,
            criteria, int(model))

    def test_somatic_and_diploid_goldens(self):
        # TestSBCalculationsForSomaticAndDiploidSettings
        cov = [10000, 10000, 0]
        # equal 25% both strands: no bias either model
        r = self._run([2500, 2500, 0], cov, 20, 0.01, 0.5, StrandBiasModel.EXTENDED)
        assert r["bias_score"][0] == 0
        assert r["gatk_bias_score"][0] == -np.inf
        assert r["bias_acceptable"][0]
        r = self._run([2500, 2500, 0], cov, 20, 0.20, 0.5, StrandBiasModel.DIPLOID)
        assert r["bias_score"][0] == 0
        assert r["bias_acceptable"][0]

        # 5% fwd / 25% rev: biased for diploid only
        r = self._run([500, 2500, 0], cov, 20, 0.01, 0.5, StrandBiasModel.EXTENDED)
        assert r["bias_score"][0] == 0
        assert r["bias_acceptable"][0]
        r = self._run([500, 2500, 0], cov, 20, 0.20, 0.5, StrandBiasModel.DIPLOID)
        assert abs(np.log10(r["bias_score"][0]) - 74.3) < 0.1
        assert abs(r["gatk_bias_score"][0] - 743.5) < 0.1
        assert not r["bias_acceptable"][0]

        # 2% fwd / 0.5% rev: biased for both
        r = self._run([200, 50, 0], cov, 20, 0.01, 0.5, StrandBiasModel.EXTENDED)
        assert abs(r["bias_score"][0] - 1.000) < 1e-3
        assert abs(r["gatk_bias_score"][0] - 0.002) < 2e-3
        assert not r["bias_acceptable"][0]
        r = self._run([200, 50, 0], cov, 20, 0.20, 0.5, StrandBiasModel.DIPLOID)
        assert abs(r["bias_score"][0] - 1.000) < 1e-3
        assert not r["bias_acceptable"][0]

    def test_single_strand_coverage_is_unbiased(self):
        r = self._run([50, 0, 0], [1000, 0, 0], 20, 0.01, 0.5,
                      StrandBiasModel.EXTENDED)
        assert r["bias_score"][0] == 0
        assert r["gatk_bias_score"][0] == -np.inf
        assert r["bias_acceptable"][0]
        assert not r["cov_present_on_both_strands"][0]

    def test_binomial_dist_goldens(self):
        # TestDistributionFxn: Binomial(0.20, 100) CDF
        from scipy.stats import binom
        assert abs(binom.cdf(15, 100, 0.2) - 0.129) < 1e-3
        assert abs(binom.cdf(20, 100, 0.2) - 0.559) < 1e-3
        assert abs(binom.cdf(25, 100, 0.2) - 0.913) < 1e-3


class TestSomaticGenotyping:
    def test_genotype_assignment(self):
        # variant at 100% freq, 0 ref: HomozygousAlt
        gt = stats.somatic_genotypes(
            np.array([False]), np.array([1.0], np.float32),
            np.array([0.0], np.float32), np.array([100]), 0.01, 10)
        assert gt[0] == int(Genotype.HOMOZYGOUS_ALT)
        # variant at 50% freq with ref present: 0/1
        gt = stats.somatic_genotypes(
            np.array([False]), np.array([0.5], np.float32),
            np.array([0.5], np.float32), np.array([100]), 0.01, 10)
        assert gt[0] == int(Genotype.HETEROZYGOUS_ALT_REF)
        # low depth -> nocall
        gt = stats.somatic_genotypes(
            np.array([False, True]), np.array([0.5, 1.0], np.float32),
            np.array([0.5, 1.0], np.float32), np.array([5, 5]), 0.01, 10)
        assert gt[0] == int(Genotype.ALT_LIKE_NOCALL)
        assert gt[1] == int(Genotype.REF_LIKE_NOCALL)
        # ref with too much non-ref: 0/.
        gt = stats.somatic_genotypes(
            np.array([True]), np.array([0.9], np.float32),
            np.array([0.9], np.float32), np.array([100]), 0.01, 10)
        assert gt[0] == int(Genotype.REF_AND_NOCALL)
        # variant with unexplained residual: 1/.
        gt = stats.somatic_genotypes(
            np.array([False]), np.array([0.9], np.float32),
            np.array([0.005], np.float32), np.array([1000]), 0.01, 10)
        assert gt[0] == int(Genotype.ALT_AND_NOCALL)

    def test_gq_hom_cases(self):
        # hom-alt, freq 1.0, cov 239, q 100, target 0.01:
        # p1 = 1e-10, p2 = Q(1, 2.39) = exp(-2.39) -> GQ ~ 10.4 -> 10
        gq = stats.somatic_genotype_qscores(
            np.array([int(Genotype.HOMOZYGOUS_ALT)]), np.array([100]),
            np.array([1.0], np.float32), np.array([239]), 0.01, 0, 100)
        assert gq[0] == 10
        # het: GQ = variant q
        gq = stats.somatic_genotype_qscores(
            np.array([int(Genotype.HETEROZYGOUS_ALT_REF)]), np.array([47]),
            np.array([0.5], np.float32), np.array([100]), 0.01, 0, 100)
        assert gq[0] == 47
        # nocall -> min GQ
        gq = stats.somatic_genotype_qscores(
            np.array([int(Genotype.ALT_LIKE_NOCALL)]), np.array([47]),
            np.array([0.5], np.float32), np.array([100]), 0.01, 0, 100)
        assert gq[0] == 0
        # hom with non-allele obs >= expected -> min GQ
        gq = stats.somatic_genotype_qscores(
            np.array([int(Genotype.HOMOZYGOUS_ALT)]), np.array([100]),
            np.array([0.9], np.float32), np.array([1000]), 0.01, 0, 100)
        assert gq[0] == 0


class TestConversions:
    def test_q_p_roundtrip(self):
        for q in [0, 10, 20, 47, 100]:
            assert abs(stats.p_to_q(stats.q_to_p(q)) - q) < 1e-9

    def test_poisson_cdf_truncation(self):
        # non-integer k truncates like (int)(k + 1.0)
        from scipy import special as sp
        assert stats.poisson_cdf(2.7, 1.5) == pytest.approx(
            float(sp.gammaincc(3, 1.5)))
        assert stats.poisson_cdf(2.0, 1.5) == pytest.approx(
            float(sp.gammaincc(3, 1.5)))
