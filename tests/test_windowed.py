"""Windowed (bounded-memory) chromosome streaming: the .bai-indexed window
path must produce byte-identical output to whole-chromosome processing
(the streaming analog of RegionStateManager block recycling)."""
import os

import pytest

import conftest
from pisces_tpu.apps.pisces import process_bam
from pisces_tpu.io.fasta import Genome
from pisces_tpu.options import PiscesApplicationOptions


@pytest.mark.parametrize("window", [100_000, 1_000_000])
def test_windowed_equals_whole(tmp_path, window):
    bam = conftest.shared_bam("Chr17Chr19.bam")
    genome = Genome(conftest.shared_genome("chr19"))

    def run(sub, win):
        d = tmp_path / sub
        d.mkdir()
        o = PiscesApplicationOptions()
        o.output_directory = str(d)
        o.vcf_writing_parameters.output_gvcf_file = True
        o.window_size = win
        return process_bam(o, bam, genome, use_device=False)

    whole = run("whole", 0)
    windowed = run(f"w{window}", window)
    la = [l for l in open(whole) if not l.startswith("##")]
    lb = [l for l in open(windowed) if not l.startswith("##")]
    assert la == lb
    assert len(la) > 100


def test_pipelined_windows_equal_serial(tmp_path):
    """Window pipelining (worker threads, own reader handles — the SURVEY
    M3 input-overlap mechanism) must be byte-identical to the serial
    windowed path, including the detached-positions copy discipline."""
    from pisces_tpu.apps.pisces import call_chromosome_windowed, write_spliced
    from pisces_tpu.io.native import open_bam
    from pisces_tpu.io.vcf_write import VcfWriter, VcfWriterConfig

    bam = conftest.shared_bam("Chr17Chr19.bam")
    genome = Genome(conftest.shared_genome("chr19"))
    chrom = genome.get_chr_reference("chr19")

    def run(sub, threads):
        d = tmp_path / sub
        d.mkdir()
        o = PiscesApplicationOptions()
        o.output_directory = str(d)
        o.vcf_writing_parameters.output_gvcf_file = True
        o.window_size = 150_000
        o.validate()
        reader = open_bam(bam, lazy=True)
        rid = reader.header.ref_index("chr19")
        out = str(d / "out.vcf")
        writer = VcfWriter(out, VcfWriterConfig(o), "chr19.fa", "S1",
                           contigs=[("chr19", chrom.length)])
        writer.write_header()
        for (w_alleles, w_refs), _w0, _w1 in call_chromosome_windowed(
                o, chrom, reader, rid, None, False, None, None,
                reader_factory=lambda: open_bam(bam, lazy=True),
                pipeline_threads=threads):
            write_spliced(writer, w_alleles, w_refs)
        writer.close()
        return out

    serial = run("serial", 1)
    piped = run("piped", 2)
    la = [l for l in open(serial) if not l.startswith("##")]
    lb = [l for l in open(piped) if not l.startswith("##")]
    assert la == lb
    assert len(la) > 50


def test_window_straddles_pileup(tmp_path):
    """A window boundary inside the covered pileup region: reads spanning
    the boundary contribute to both windows' counts without duplication."""
    bam = conftest.shared_bam("Chr17Chr19.bam")
    genome = Genome(conftest.shared_genome("chr19"))
    # reads sit at ~3118882-3119065; cut right through them
    def run(sub, win):
        d = tmp_path / sub
        d.mkdir()
        o = PiscesApplicationOptions()
        o.output_directory = str(d)
        o.vcf_writing_parameters.output_gvcf_file = True
        o.window_size = win
        return process_bam(o, bam, genome, use_device=False)

    whole = run("whole", 0)
    windowed = run("cut", 3118950)  # boundary inside the pileup
    la = [l for l in open(whole) if not l.startswith("##")]
    lb = [l for l in open(windowed) if not l.startswith("##")]
    assert la == lb


def test_windowed_mnv_mode_equals_whole(tmp_path):
    """MNV mode under windowed streaming: failed-MNV reallocation near
    window boundaries must not change output (the margin supplies the
    spill context the reference's MnvReallocator carries between blocks,
    MnvReallocator.cs:31-50)."""
    bam = conftest.shared_bam("Chr17Chr19.bam")
    genome = Genome(conftest.shared_genome("chr19"))

    def run(sub, win):
        d = tmp_path / sub
        d.mkdir()
        o = PiscesApplicationOptions()
        o.output_directory = str(d)
        o.vcf_writing_parameters.output_gvcf_file = True
        o.call_mnvs = True
        o.max_size_mnv = 10
        o.max_gap_between_mnv = 5
        o.window_size = win
        return process_bam(o, bam, genome, use_device=False)

    whole = run("whole", 0)
    # boundary at 3118900 cuts straight through the covered pileup
    windowed = run("win", 3118900)
    la = [l for l in open(whole) if not l.startswith("##")]
    lb = [l for l in open(windowed) if not l.startswith("##")]
    assert la == lb
    assert len(la) > 100
