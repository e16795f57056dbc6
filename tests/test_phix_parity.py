"""Full-file byte parity vs reference-shipped expected outputs on PhiX.

Port of ForcedGTFxnlTest.RunForcedGT (Pisces.Tests/FunctionalTests/
ForcedGTFxnlTest.cs:10-113): three caller configurations on PhiX_S3.bam
compared line-for-line (TestHelper.CompareFiles semantics: every line
except fileDate/##reference/cmdline/version) against the shipped
PhiX_S3.noisy.vcf / Forced1.vcf / Forced2.vcf. This exercises gVCF, MNV
calling (MaxMNVLength 10, gap 5), forced alleles, amplicon bias, and the
forced noise level end-to-end with zero skipped fields.
"""
import os

import pytest

import conftest
from pisces_tpu.apps.pisces import main as pisces_main

TESTDATA = os.path.join(conftest.REFERENCE_ROOT, "src/test/Pisces.Tests/TestData")
PHIX_BAM = conftest.shared_bam("PhiX_S3.bam")
PHIX_GENOME = os.path.join(conftest.SHARED_GENOMES, "PhiX", "WholeGenomeFasta")
FORCED_INPUT = os.path.join(TESTDATA, "PhiX_S3.forcedGTInput.vcf")

_SKIP = ("filedate", "##reference", "cmdline", "1.0.0.0", "##source",
         "##pisces")


def compare_files(observed: str, expected: str) -> None:
    """TestHelper.CompareFiles (TestUtilities/TestHelper.cs:265-281)."""
    with open(observed) as f:
        obs = f.read().splitlines()
    with open(expected) as f:
        exp = f.read().splitlines()
    assert len(obs) == len(exp)
    for o, e in zip(obs, exp):
        if any(k in e.lower() for k in _SKIP):
            continue
        assert o == e


def run(tmp_path, sub, extra):
    d = tmp_path / sub
    d.mkdir()
    args = ["-g", PHIX_GENOME, "-bam", PHIX_BAM, "-o", str(d),
            "-c", "2", "-minbq", "10", "-minvf", "0.00001", "-nl", "40",
            "-callMNVs", "TRUE", "-maxmnvlength", "10",
            "-maxgapbetweenmnv", "5", "-ncfilter", "1",
            "-abfilter", "0.01"] + extra
    assert pisces_main(args) == 0
    return str(d / "PhiX_S3.genome.vcf")


class TestPhiXForcedGTParity:
    def test_noisy_no_forced(self, tmp_path):
        out = run(tmp_path, "noisy", ["-minvq", "1"])
        compare_files(out, os.path.join(TESTDATA, "PhiX_S3.noisy.vcf"))

    def test_forced1(self, tmp_path):
        out = run(tmp_path, "forced1",
                  ["-minvq", "1", "-forcedalleles", FORCED_INPUT])
        compare_files(out, os.path.join(TESTDATA, "PhiX_S3.Forced1.vcf"))

    def test_forced2(self, tmp_path):
        out = run(tmp_path, "forced2",
                  ["-minvq", "20", "-forcedalleles", FORCED_INPUT])
        compare_files(out, os.path.join(TESTDATA, "PhiX_S3.Forced2.vcf"))
