"""Stitched direction maps, forced alleles, amplicon bias, bias files."""
import os

import numpy as np
import pytest

import conftest
from pisces_tpu.domain.types import AlleleCategory, DirectionType
from pisces_tpu.ops.amplicon_bias import calculate_amplicon_bias
from pisces_tpu.pileup import directions

from util import make_batch, parse_cigar, refseq


class TestXdParsing:
    def test_expand(self):
        d = directions.expand_xd("3F2S4R")
        assert list(d) == [0, 0, 0, 2, 2, 1, 1, 1, 1]

    def test_sequenced_map_with_deletion(self):
        # 3M2D3M with XD over expanded read (8 entries)
        ops, lens = parse_cigar("3M2D3M")
        dm = directions.sequenced_direction_map("3F2S3R", ops, lens)
        # deletions (entries 3,4 = S) consume XD but not sequenced bases
        assert list(dm) == [0, 0, 0, 1, 1, 1]

    def test_support_direction_snv(self):
        dm = np.array([0, 0, 2, 2, 1, 1], dtype=np.int8)
        assert directions.support_direction(int(AlleleCategory.SNV), dm, 2, 1) == 2
        assert directions.support_direction(int(AlleleCategory.SNV), dm, 5, 1) == 1

    def test_support_direction_insertion_spans_stitch(self):
        # insertion bases at indexes 2..3; stitched inside -> stitched
        dm = np.array([0, 0, 2, 2, 1, 1], dtype=np.int8)
        assert directions.support_direction(
            int(AlleleCategory.INSERTION), dm, 2, 3) == 2  # walks 2..4

    def test_stitched_pileup_counts(self):
        from pisces_tpu.pileup.events import build_base_events
        from pisces_tpu.pileup.counts import build_counts_host
        from pisces_tpu.calling.source import AlleleSource
        batch = make_batch([dict(pos1=100, cigar="6M", seq="AAAAAA", qual=30)])
        batch.xd_tags = ["2F2S2R"]
        batch.xn_tags = [None]
        keep = np.ones(1, dtype=bool)
        base_dirs = directions.batch_base_directions(batch, keep)
        ev = build_base_events(batch, keep, 20, 5, base_dirs=base_dirs)
        pc = build_counts_host(ev)
        src = AlleleSource(pc)
        A = int(DirectionType.FORWARD)
        assert src.get_allele_count(100, 0, int(DirectionType.FORWARD)) == 1
        assert src.get_allele_count(102, 0, int(DirectionType.STITCHED)) == 1
        assert src.get_allele_count(104, 0, int(DirectionType.REVERSE)) == 1


class TestAmpliconBias:
    def test_no_bias_when_one_amplicon(self):
        r = calculate_amplicon_bias({"amp1": 50}, {"amp1": 100}, 0.01, 100)
        assert r is None

    def test_balanced_no_bias(self):
        r = calculate_amplicon_bias({"a": 50, "b": 48}, {"a": 100, "b": 100},
                                    0.01, 100)
        assert r is not None and not r["bias_detected"]

    def test_skewed_bias_detected(self):
        r = calculate_amplicon_bias({"a": 50, "b": 0}, {"a": 100, "b": 100},
                                    0.01, 100)
        assert r is not None and r["bias_detected"]
        assert r["results"]["b"]["bias_detected"]
        assert not r["results"]["a"]["bias_detected"]

    def test_low_coverage_free_pass(self):
        # expected observations < 5 -> no bias even with 0 support
        r = calculate_amplicon_bias({"a": 3, "b": 0}, {"a": 100, "b": 100},
                                    0.01, 100)
        assert r is not None and not r["bias_detected"]


class TestForcedAlleles:
    def test_forced_allele_reported(self, tmp_path):
        from pisces_tpu.apps.pisces import process_bam
        from pisces_tpu.io.fasta import Genome
        from pisces_tpu.options import PiscesApplicationOptions

        forced = str(tmp_path / "forced.vcf")
        with open(forced, "w") as f:
            f.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
            # an allele with zero read support in the bam
            f.write("chr19\t3118920\tG\tG\tC\t.\t.\t.\n".replace("\tG\tG\tC",
                                                                 "\t.\tG\tC"))
        options = PiscesApplicationOptions()
        options.output_directory = str(tmp_path)
        options.vcf_writing_parameters.output_gvcf_file = False
        options.forced_alleles_paths = [forced]
        genome = Genome(conftest.shared_genome("chr19"))
        bam = os.path.join(conftest.REFERENCE_ROOT,
                           "src/test/Pisces.Tests/TestData/Sample_S1.bam")
        out = process_bam(options, bam, genome, use_device=False)
        lines = [l for l in open(out) if not l.startswith("#")]
        forced_lines = [l for l in lines if "\t3118920\t" in l]
        assert forced_lines, "forced allele missing from output"
        assert "ForcedReport" in forced_lines[0]
        # the true variant still reported
        assert any("\t3118942\t" in l for l in lines)


class TestBiasFiles:
    def test_strand_bias_file_written(self, tmp_path):
        from pisces_tpu.apps.pisces import process_bam
        from pisces_tpu.io.fasta import Genome
        from pisces_tpu.options import PiscesApplicationOptions
        options = PiscesApplicationOptions()
        options.output_directory = str(tmp_path)
        options.vcf_writing_parameters.output_gvcf_file = False
        options.output_bias_files = True
        genome = Genome(conftest.shared_genome("chr19"))
        bam = os.path.join(conftest.REFERENCE_ROOT,
                           "src/test/Pisces.Tests/TestData/Sample_S1.bam")
        out = process_bam(options, bam, genome, use_device=False)
        bias_path = out.replace(".vcf", ".ReadStrandBias.txt")
        assert os.path.exists(bias_path)
        lines = open(bias_path).read().splitlines()
        assert lines[0].startswith("Chr\tPosition\tReference\tAlternate")
        assert len(lines) >= 2  # header + the A>T variant
        assert "3118942" in lines[1]
