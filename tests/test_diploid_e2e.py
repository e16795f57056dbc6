"""Diploid ploidy end-to-end: crushed output (one VCF line per locus) is
derived from the ploidy model (VcfWritingParameters.cs:20-40), and a
1/2 multi-allelic site merges both alts into one record
(VcfFormatter crushed mode + DiploidThresholdingGenotyper)."""
import os

import conftest
from pisces_tpu.domain.types import PloidyModel
from pisces_tpu.io.bam_write import BamWriter
from pisces_tpu.io.fasta import Genome, create_genome_size_xml
from pisces_tpu.options import PiscesApplicationOptions


def _make_genome(tmp_path, seq):
    gdir = tmp_path / "genome"
    gdir.mkdir()
    with open(gdir / "chr1.fa", "w") as f:
        f.write(">chr1\n" + seq + "\n")
    create_genome_size_xml(str(gdir))
    return Genome(str(gdir))


def _write_site_bam(tmp_path, ref, fname, c_mod, t_mod):
    """500 overlapping reads; read i gets C at the site if i%20 < c_mod,
    T if c_mod <= i%20 < t_mod, else reference."""
    bam = str(tmp_path / fname)
    w = BamWriter(bam, ["chr1"], [len(ref)])
    site = 45
    for i in range(500):
        start = 20 + (i % 10)  # 1-based start positions 20..29
        seq = list(ref[start - 1:start - 1 + 50])
        m = i % 20
        alt = "C" if m < c_mod else ("T" if m < t_mod else None)
        if alt:
            seq[site - start] = alt
        w.add_read(f"r{i}", "chr1", start, "50M", "".join(seq),
                   flag=0x10 if i % 2 else 0)
    w.write()
    return bam


def test_diploid_crushed_multiallelic(tmp_path):
    ref = "ACGTACGTAC" * 10  # 100 bp; position 45 (1-based) is 'A'
    genome = _make_genome(tmp_path, ref)
    # 45% C, 45% T, 10% ref at position 45
    bam = _write_site_bam(tmp_path, ref, "d.bam", 9, 18)

    from pisces_tpu.apps.pisces import process_bam
    o = PiscesApplicationOptions()
    o.output_directory = str(tmp_path)
    o.vcf_writing_parameters.output_gvcf_file = False
    o.variant_calling_parameters.ploidy_model = \
        PloidyModel.DIPLOID_BY_THRESHOLDING
    out = process_bam(o, bam, genome, use_device=False)

    o.validate()
    assert o.vcf_writing_parameters.allow_multiple_vcf_lines_per_loci is False

    lines = [l.rstrip("\n").split("\t") for l in open(out)
             if not l.startswith("#")]
    at_site = [l for l in lines if l[1] == "45"]
    assert len(at_site) == 1, at_site  # crushed: ONE line for both alts
    rec = at_site[0]
    assert rec[3] == "A"
    assert sorted(rec[4].split(",")) == ["C", "T"], rec
    fmt = dict(zip(rec[8].split(":"), rec[9].split(":")))
    assert fmt["GT"] == "1/2", fmt
    # for 1/2 with both alts on the line, AD is the two alt supports only
    # (VcfFormatter.cs:396-407 GetAlleleCountString)
    assert fmt["AD"] == "225,225", fmt


def test_diploid_triallelic_nocall(tmp_path):
    """40% C / 40% T / 20% ref: the reference allele is also 'real', so the
    site is tri-allelic -> MultiAllelicSite filter, ./. no-call, pruned to
    one alt (GenotypeCalculatorUtilities tri-allelic rules)."""
    ref = "ACGTACGTAC" * 10
    genome = _make_genome(tmp_path, ref)
    bam = _write_site_bam(tmp_path, ref, "t.bam", 8, 16)
    from pisces_tpu.apps.pisces import process_bam
    o = PiscesApplicationOptions()
    o.output_directory = str(tmp_path)
    o.vcf_writing_parameters.output_gvcf_file = False
    o.variant_calling_parameters.ploidy_model = \
        PloidyModel.DIPLOID_BY_THRESHOLDING
    out = process_bam(o, bam, genome, use_device=False)
    lines = [l.rstrip("\n").split("\t") for l in open(out)
             if not l.startswith("#")]
    at_site = [l for l in lines if l[1] == "45"]
    assert len(at_site) == 1, at_site
    rec = at_site[0]
    assert "MultiAllelicSite" in rec[6]
    fmt = dict(zip(rec[8].split(":"), rec[9].split(":")))
    assert fmt["GT"] == "./."


def test_somatic_stays_uncrushed(tmp_path):
    """Same pileup under the somatic model: two lines at the locus (the
    default multi-line-per-locus mode) with 0/1 genotypes."""
    ref = "ACGTACGTAC" * 10
    genome = _make_genome(tmp_path, ref)
    bam = _write_site_bam(tmp_path, ref, "s.bam", 8, 16)
    from pisces_tpu.apps.pisces import process_bam
    o = PiscesApplicationOptions()
    o.output_directory = str(tmp_path)
    o.vcf_writing_parameters.output_gvcf_file = False
    out = process_bam(o, bam, genome, use_device=False)
    lines = [l.rstrip("\n").split("\t") for l in open(out)
             if not l.startswith("#")]
    at_site = [l for l in lines if l[1] == "45"]
    assert len(at_site) == 2, at_site
    assert {l[4] for l in at_site} == {"C", "T"}
