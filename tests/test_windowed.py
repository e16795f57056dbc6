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
