"""CallMNVs=true end-to-end: the reference's edge-of-distribution functional
scenarios (SomaticVariantCallerFunctionalTests.cs:463-612 —
DeletionAtEdgeOfDistribution / InsertionAtEdgeOfDistribution): shipped BAMs
with deep pileups ending mid-variant; MNV mode with MaxSizeMNV=100,
MaxGapBetweenMNV=10 must call the indel and must NOT strand-bias-filter it.
"""
import os

import pytest

import conftest
from pisces_tpu.io.fasta import Genome, create_genome_size_xml
from pisces_tpu.options import PiscesApplicationOptions

TESTDATA = os.path.join(conftest.REFERENCE_ROOT,
                        "src/test/Pisces.Tests/TestData")

EDGE_DEL_CHR7 = ("N" * 62 +
                 "GTTGGTCTTCTATTTTATGCGAATTCTTCTAAGATTCCCAGGTTATTTATCATAAGAATT"
                 "ACATTTACATGGCAAATTTAGTTCTGTTCCTAGAAATATCTCCATGACAACCAAAAGGAA"
                 "CTCCTAATTTCTGGCACACATTACTTCAGGGGT")
EDGE_INS_CHR7 = ("N" * 63 +
                 "GTTGGTCTTCTATTTTATGCGAATTCTTCTAAGATTCCCAGGTTATTTATCATAAGAATT"
                 "ACATTTACATGGCAAATTTAGTTCTGTTCCTAGAAATATCTCCATGACAACCAAAAGGAA"
                 "CTCCTAATTTCTGGCACACATTACTTCAGGGGT")


def _make_genome(tmp_path, name, seq):
    gdir = tmp_path / "genome"
    gdir.mkdir()
    with open(gdir / f"{name}.fa", "w") as f:
        f.write(f">{name}\n")
        for i in range(0, len(seq), 70):
            f.write(seq[i:i + 70] + "\n")
    create_genome_size_xml(str(gdir))
    return Genome(str(gdir))


def _run_mnv_mode(tmp_path, bam, genome):
    from pisces_tpu.apps.pisces import process_bam
    o = PiscesApplicationOptions()
    o.output_directory = str(tmp_path)
    o.vcf_writing_parameters.output_gvcf_file = True
    o.call_mnvs = True
    o.max_size_mnv = 100
    o.max_gap_between_mnv = 10
    v = o.variant_calling_parameters
    v.filter_out_variants_present_only_one_strand = False
    out = process_bam(o, bam, genome, use_device=False)
    lines = [l.rstrip("\n").split("\t") for l in open(out)
             if not l.startswith("#")]
    return {(f[0], int(f[1]), f[3], f[4]): f for f in lines}


def test_deletion_at_edge_of_distribution(tmp_path):
    """ATTT->A deletion at chr7:107 at the edge of the coverage pileup must
    be called PASS, not marked SB (the reference's regression for a bug
    where edge deletions were wrongly strand-bias filtered)."""
    genome = _make_genome(tmp_path, "chr7", EDGE_DEL_CHR7)
    calls = _run_mnv_mode(tmp_path, os.path.join(TESTDATA, "edgeIndel_S2.bam"),
                          genome)
    key = ("chr7", 107, "ATTT", "A")
    assert key in calls, sorted(k for k in calls if k[3] != ".")[:10]
    fields = calls[key]
    assert fields[6] == "PASS", fields
    assert "SB" not in fields[6]


def test_insertion_at_edge_of_distribution(tmp_path):
    """T->TGGG insertion at chr7:110 at the edge of the pileup: called and
    not strand-bias filtered."""
    genome = _make_genome(tmp_path, "chr7", EDGE_INS_CHR7)
    calls = _run_mnv_mode(tmp_path, os.path.join(TESTDATA, "edgeIns_S2.bam"),
                          genome)
    key = ("chr7", 110, "T", "TGGG")
    assert key in calls, sorted(k for k in calls if k[3] != ".")[:10]
    fields = calls[key]
    assert "SB" not in fields[6], fields


def test_mnv_mode_still_calls_snvs(tmp_path):
    """MNV mode on the Chr17Chr19 corpus: the known chr19 SNV is still
    called (MNV build-up must not eat isolated SNVs)."""
    from pisces_tpu.apps.pisces import process_bam
    bam = conftest.shared_bam("Chr17Chr19.bam")
    genome = Genome(conftest.shared_genome("chr19"))
    o = PiscesApplicationOptions()
    o.output_directory = str(tmp_path)
    o.vcf_writing_parameters.output_gvcf_file = False
    o.call_mnvs = True
    o.max_size_mnv = 3
    o.max_gap_between_mnv = 1
    out = process_bam(o, bam, genome, use_device=False)
    variants = [l.split("\t") for l in open(out) if not l.startswith("#")]
    assert any(v[0] == "chr19" and v[1] == "3118942" and v[3] == "A"
               and v[4] == "T" for v in variants), variants[:5]
