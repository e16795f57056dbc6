"""End-to-end functional tests against real BAMs + genomes.

Modeled on the reference functional suite (Pisces.Tests/FunctionalTests/
SomaticVariantCallerFunctionalTests.cs): run bam -> vcf against mini-genomes
and assert exact expected alleles. The in-repo expected VCFs that shipped
with the reference (TestData/Chr17again.expected.genome.vcf) were generated
by Pisces 1.0 (2016); fields whose semantics changed since (hom-ref GQ,
zero-coverage line conventions) are asserted against the *current* reference
math instead.
"""
import os

import numpy as np
import pytest

import conftest
from pisces_tpu.io.bam import BamReader
from pisces_tpu.io.fasta import Genome
from pisces_tpu.options import PiscesApplicationOptions
from pisces_tpu.apps.pisces import process_bam

TESTDATA = os.path.join(conftest.REFERENCE_ROOT, "src/test/Pisces.Tests/TestData")


def run_caller(tmp_path, bam, genome_dir, intervals_text=None, gvcf=True,
               use_device=False, configure=None):
    os.makedirs(str(tmp_path), exist_ok=True)
    options = PiscesApplicationOptions()
    options.output_directory = str(tmp_path)
    options.vcf_writing_parameters.output_gvcf_file = gvcf
    if intervals_text is not None:
        ipath = os.path.join(str(tmp_path), "intervals.picard")
        with open(ipath, "w") as f:
            f.write(intervals_text)
        options.interval_paths = [ipath]
    if configure:
        configure(options)
    genome = Genome(genome_dir)
    out = process_bam(options, bam, genome, use_device=use_device)
    with open(out) as f:
        lines = [l.rstrip("\n") for l in f]
    return [l for l in lines if not l.startswith("#")]


@pytest.fixture
def chr19_genome():
    return conftest.shared_genome("chr19")


class TestChr17Again:
    """Chr17again.bam chr19 portion vs reference expected output."""

    INTERVALS = "chr19\t3118880\t3118890\nchr19\t3118942\t3118942\n"

    def _expected_chr19_lines(self):
        with open(os.path.join(TESTDATA, "Chr17again.expected.genome.vcf")) as f:
            return [l.rstrip("\n") for l in f
                    if l.startswith("chr19\t")]

    def test_gvcf_with_intervals(self, tmp_path, chr19_genome):
        got = run_caller(tmp_path, os.path.join(TESTDATA, "Chr17again.bam"),
                         chr19_genome, intervals_text=self.INTERVALS)
        expected = self._expected_chr19_lines()
        assert len(got) == len(expected)

        # the variant line must match byte-for-byte
        variant_expected = [l for l in expected if "\tA\tT\t" in l]
        variant_got = [l for l in got if "\tA\tT\t" in l]
        assert variant_got == variant_expected

        # covered reference lines: exact except GQ (2016-era GQ semantics);
        # current somatic hom-ref GQ at VF=0, DP=1000, LOD 1% is 43
        for g, e in zip(got, expected):
            gf, ef = g.split("\t"), e.split("\t")
            assert gf[0:6] == ef[0:6]  # CHROM..QUAL
            if "DP=0" in e:
                continue  # zero-coverage conventions changed since 1.0
            assert gf[6] == ef[6]      # FILTER
            assert gf[7] == ef[7]      # INFO
            gs, es = gf[9].split(":"), ef[9].split(":")
            # GT:GQ:AD:DP:VF:NL:SB -> compare all but GQ
            assert gs[0] == es[0]
            assert gs[2:] == es[2:]
            if gs[0] == "0/0" and es[1] == "100":
                assert gs[1] == "43"

    def test_zero_coverage_interval_lines(self, tmp_path, chr19_genome):
        got = run_caller(tmp_path, os.path.join(TESTDATA, "Chr17again.bam"),
                         chr19_genome, intervals_text=self.INTERVALS)
        zero = [l for l in got if "DP=0" in l]
        assert len(zero) == 3
        for l in zero:
            fields = l.split("\t")
            assert fields[6] == "LowDP"  # current AlleleProcessor semantics
            assert fields[9].startswith("./.:0:0:0:0.000:0:0.0000")

    def test_device_and_host_paths_agree(self, tmp_path, chr19_genome):
        bam = os.path.join(TESTDATA, "Chr17again.bam")
        got_host = run_caller(tmp_path / "h", bam, chr19_genome,
                              intervals_text=self.INTERVALS, use_device=False)
        got_dev = run_caller(tmp_path / "d", bam, chr19_genome,
                             intervals_text=self.INTERVALS, use_device=True)
        assert got_host == got_dev


class TestSampleS1:
    """Sample_S1.bam: simple SNV chr19:3118942 A>T
    (SomaticVariantCaller_SimpleSnv)."""

    def test_simple_snv_no_gvcf(self, tmp_path, chr19_genome):
        got = run_caller(tmp_path, os.path.join(TESTDATA, "Sample_S1.bam"),
                         chr19_genome, gvcf=False)
        assert len(got) == 1
        f = got[0].split("\t")
        assert (f[0], f[1], f[3], f[4]) == ("chr19", "3118942", "A", "T")

    def test_simple_snv_gvcf_line_count(self, tmp_path, chr19_genome):
        # reference expects 102 alleles with reference calls enabled
        got = run_caller(tmp_path, os.path.join(TESTDATA, "Sample_S1.bam"),
                         chr19_genome, gvcf=True)
        assert len(got) == 102

    def test_interval_restriction(self, tmp_path, chr19_genome):
        # with reference calls and 11-position interval around the variant
        got = run_caller(tmp_path, os.path.join(TESTDATA, "Sample_S1.bam"),
                         chr19_genome, gvcf=True,
                         intervals_text="chr19\t3118937\t3118947\n")
        assert len(got) == 11
        assert any("\tA\tT\t" in l for l in got)

    def test_negative_interval(self, tmp_path, chr19_genome):
        got = run_caller(tmp_path, os.path.join(TESTDATA, "Sample_S1.bam"),
                         chr19_genome, gvcf=True,
                         intervals_text="chr19\t3110000\t3110009\n")
        assert len(got) == 10
        assert not any("\tA\tT\t" in l for l in got)


def test_strand_bias_file_oracle(tmp_path, chr19_genome):
    """StrandBiasFileWriterTests.Write_InFlow (StrandBiasFileWriterTests.cs:
    105-160): calling SBWriter_Sample_S1.bam with -OutputBiasFiles emits a
    ReadStrandBias.txt whose contents byte-match the shipped
    Expected_Sample_S1.ReadStrandBias.txt (every variant row, no ref rows,
    full per-strand stats table)."""
    def configure(options):
        options.output_bias_files = True
    run_caller(tmp_path, os.path.join(TESTDATA, "SBWriter_Sample_S1.bam"),
               chr19_genome, gvcf=True, configure=configure)
    out = os.path.join(str(tmp_path),
                       "SBWriter_Sample_S1.genome.ReadStrandBias.txt")
    assert os.path.exists(out)
    ours = [l.rstrip("\n") for l in open(out)]
    exp = [l.rstrip("\n") for l in open(os.path.join(
        TESTDATA, "Expected_Sample_S1.ReadStrandBias.txt"))]
    assert ours == exp
