"""Stitched+collapsed BAM ground truth: full-file parity.

Port of SomaticVariantCallerFunctionalTests.StitchedCollapsedBamGroundTruth
(cs:680-760): collapsed.test.stitched.bam (UMI-collapsed, stitched source)
called with MNV mode (MaxSizeMNV 100, gap 10), amplicon bias 0.01, RC/TS
count reporting and bias files, against the shipped
test_truth.stitched.genome.vcf — every line compared (the US collapsed-
count column included). The reference harness bypasses options Validate,
leaving LowDepthFilter null (no LowDP filter)."""
import os

import pytest

import conftest
from pisces_tpu.apps.pisces import process_bam
from pisces_tpu.io.fasta import Genome
from pisces_tpu.options import PiscesApplicationOptions

TESTDATA = os.path.join(conftest.REFERENCE_ROOT, "src/test/Pisces.Tests/TestData")
BAM = os.path.join(TESTDATA, "collapsed.test.stitched.bam")
TRUTH = os.path.join(TESTDATA, "test_truth.stitched.genome.vcf")
# inline mock chr1 (SomaticVariantCallerFunctionalTests.cs:730-738)
SEQ = ("GAAGTAACAACGCAGGATGCCCCCTGGGGTGGACTGCCCCATGGAATTCTGGACCAAGGAGGAGAAT"
       "CAGAGCGTTGTGGTTGACTTCCTGCTGCCCACAGGGGTCTACCTGAACTTCCCTGTGTCCCGCAATG"
       "CCAACCTCAGCACCATCAAGCAGGTATGGCCTCCATC")
OFFSET = 9770498


class _NoLowDpOptions(PiscesApplicationOptions):
    def validate(self):
        super().validate()
        self.variant_calling_parameters.low_depth_filter = None


def _write_genome(tmp_path) -> str:
    gdir = tmp_path / "genome"
    gdir.mkdir()
    full = "N" * (OFFSET - 1) + SEQ
    with open(gdir / "chr1.fa", "w") as f:
        f.write(">chr1\n")
        for i in range(0, len(full), 70):
            f.write(full[i:i + 70] + "\n")
    with open(gdir / "chr1.fa.fai", "w") as f:
        f.write(f"chr1\t{len(full)}\t6\t70\t71\n")
    with open(gdir / "GenomeSize.xml", "w") as f:
        f.write('<sequenceSizes genomeName="c">\n\t<chromosome '
                f'fileName="chr1.fa" contigName="chr1" totalBases="{len(full)}" '
                f'isCircular="false" md5="x" ploidy="2" '
                f'knownBases="{len(full)}" />\n</sequenceSizes>')
    return str(gdir)


def test_stitched_collapsed_ground_truth(tmp_path):
    o = _NoLowDpOptions()
    o.output_directory = str(tmp_path / "out")
    os.makedirs(o.output_directory, exist_ok=True)
    o.call_mnvs = True
    o.max_size_mnv = 100
    o.max_gap_between_mnv = 10
    o.output_bias_files = True
    o.vcf_writing_parameters.output_gvcf_file = True
    o.vcf_writing_parameters.report_rc_counts = True
    o.vcf_writing_parameters.report_ts_counts = True
    o.variant_calling_parameters.amplicon_bias_filter_threshold = 0.01
    genome = Genome(_write_genome(tmp_path))
    out = process_bam(o, BAM, genome, use_device=False)
    got = [l for l in open(out) if not l.startswith("##")]
    exp = [l for l in open(TRUTH) if not l.startswith("##")]
    assert got == exp
    assert len(got) > 170
