"""BasicMnvTesting port (SomaticVariantCallerFunctionalTests.cs:380-425):
small_S1.bam against the inline mock chr1 sequence with MNV calling on
(MaxSizeMNV 15, MaxGapBetweenMNV 10, no collapsing) must produce the two
expected MNVs and the SNV."""
import os

import pytest

import conftest
from pisces_tpu.apps.pisces import process_bam
from pisces_tpu.io.fasta import Genome
from pisces_tpu.options import PiscesApplicationOptions

BAM = conftest.shared_bam("small_S1.bam")
SEQ = ("TTGTCAGTGCGCTTTTCCCAACACCACCTGCTCCGACCACCACCAGTTTGTACTCAGTCATTTCACA"
       "CCAGCAAGAACCTGTTGGAAACCAGTAATCAGGGTTAATTGGCGGCG")


def _genome(tmp_path) -> str:
    gdir = tmp_path / "genome"
    gdir.mkdir()
    with open(gdir / "chr1.fa", "w") as f:
        f.write(">chr1\n" + SEQ + "\n")
    with open(gdir / "chr1.fa.fai", "w") as f:
        f.write(f"chr1\t{len(SEQ)}\t6\t{len(SEQ)}\t{len(SEQ) + 1}\n")
    with open(gdir / "GenomeSize.xml", "w") as f:
        f.write('<sequenceSizes genomeName="m">\n\t<chromosome '
                f'fileName="chr1.fa" contigName="chr1" totalBases="{len(SEQ)}"'
                f' isCircular="false" md5="x" ploidy="2" '
                f'knownBases="{len(SEQ)}" />\n</sequenceSizes>')
    return str(gdir)


def test_basic_mnv_calling(tmp_path):
    o = PiscesApplicationOptions()
    o.output_directory = str(tmp_path / "out")
    os.makedirs(o.output_directory, exist_ok=True)
    o.call_mnvs = True
    o.max_size_mnv = 15
    o.max_gap_between_mnv = 10
    o.collapse = False
    o.output_bias_files = True
    o.vcf_writing_parameters.output_gvcf_file = True
    genome = Genome(_genome(tmp_path))
    out = process_bam(o, BAM, genome, use_device=False)
    lines = [l.split("\t") for l in open(out) if not l.startswith("#")]
    found = {(l[1], l[3], l[4]) for l in lines}
    assert ("27", "CCTGCTCCG", "TTTGCTCCA") in found
    assert ("27", "CC", "TT") in found
    assert ("35", "G", "A") in found
