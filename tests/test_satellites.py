"""Satellite app tests: Psara, ReformatVcf, VQR, VennVcf, AdaptiveGT."""
import os

import numpy as np
import pytest

import conftest
from pisces_tpu.satellites import adaptive_gt, psara, reformat, vennvcf, vqr

TESTDATA = os.path.join(conftest.REFERENCE_ROOT, "src/test/Pisces.Tests/TestData")

HEADER = """##fileformat=VCFv4.1
##source=Pisces 5.2.11.163
##INFO=<ID=DP,Number=1,Type=Integer,Description="Total Depth">
##FILTER=<ID=q30,Description="Quality score less than 30">
##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">
##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="Genotype Quality">
##FORMAT=<ID=AD,Number=.,Type=Integer,Description="Allele Depth">
##FORMAT=<ID=DP,Number=1,Type=Integer,Description="Total Depth">
##FORMAT=<ID=VF,Number=.,Type=Float,Description="Variant Frequency">
##FORMAT=<ID=NL,Number=1,Type=Integer,Description="Noise Level">
##FORMAT=<ID=SB,Number=1,Type=Float,Description="StrandBias">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1
"""


def vcf_line(chrom, pos, ref, alt, q=100, filt="PASS", dp=1000, ad="900,100",
             gt="0/1", gq=100, vf="0.100"):
    return (f"{chrom}\t{pos}\t.\t{ref}\t{alt}\t{q}\t{filt}\tDP={dp}\t"
            f"GT:GQ:AD:DP:VF:NL:SB\t{gt}:{gq}:{ad}:{dp}:{vf}:20:-100.0000")


def write_vcf(path, lines):
    with open(path, "w") as f:
        f.write(HEADER)
        for l in lines:
            f.write(l + "\n")


class TestPsara:
    def test_start_position_filter(self, tmp_path):
        vcf = str(tmp_path / "in.vcf")
        write_vcf(vcf, [
            vcf_line("chr1", 100, "A", "T"),
            vcf_line("chr1", 200, "C", "G"),
            vcf_line("chr1", 300, "G", "A"),
        ])
        roi = str(tmp_path / "roi.picard")
        with open(roi, "w") as f:
            f.write("chr1\t150\t250\n")
        out = str(tmp_path / "out.vcf")
        psara.filter_vcf(vcf, out, roi)
        data = [l for l in open(out) if not l.startswith("#")]
        assert len(data) == 1
        assert "\t200\t" in data[0]

    def test_expanded_mode_keeps_spanning_deletion(self, tmp_path):
        vcf = str(tmp_path / "in.vcf")
        write_vcf(vcf, [
            vcf_line("chr1", 140, "ACCCCCCCCCCCCC", "A"),  # spans into ROI
            vcf_line("chr1", 300, "G", "A"),
        ])
        roi = str(tmp_path / "roi.picard")
        with open(roi, "w") as f:
            f.write("chr1\t150\t250\n")
        out = str(tmp_path / "out.vcf")
        psara.filter_vcf(vcf, out, roi, "expanded")
        data = [l for l in open(out) if not l.startswith("#")]
        assert len(data) == 1
        assert "\t140\t" in data[0]
        # start mode drops it
        psara.filter_vcf(vcf, out, roi, "start")
        data = [l for l in open(out) if not l.startswith("#")]
        assert len(data) == 0


class TestReformat:
    def test_crush_then_uncrush(self, tmp_path):
        vcf = str(tmp_path / "in.vcf")
        write_vcf(vcf, [
            vcf_line("chr1", 100, "A", "T", ad="10,45", vf="0.450"),
            vcf_line("chr1", 100, "A", "G", ad="10,40", vf="0.400"),
            vcf_line("chr1", 200, "C", "G"),
        ])
        crushed = str(tmp_path / "c.vcf")
        reformat.reformat(vcf, crushed, crush=True)
        data = [l for l in open(crushed) if not l.startswith("#")]
        assert len(data) == 2
        assert "T,G" in data[0]
        uncrushed = str(tmp_path / "u.vcf")
        reformat.reformat(crushed, uncrushed, crush=False)
        data = [l.split("\t") for l in open(uncrushed) if not l.startswith("#")]
        assert len(data) == 3
        # uncrushing a multi-allelic locus emits the <M> placeholder for
        # the co-located other allele (VcfFileWriter uncrushed mode)
        assert data[0][4].lstrip("<M>,") == "T" and data[1][4].lstrip("<M>,") == "G"

    def test_reformat_oracle_parity(self, tmp_path):
        """Reformat.Tests ReformatTests.ReformatTest (ReformatTests.cs:10-47):
        a NON-Pisces VCF (Platinum Genomes excerpt with malformed/foreign
        filters and phased GTs) is fully converted into Pisces format both
        crushed and uncrushed, byte-matching the shipped oracles modulo the
        fileDate/source/cmdline header lines TestHelper.CompareFiles skips."""
        import conftest
        SD = os.path.join(conftest.REFERENCE_ROOT,
                          "src/test/Reformat.Tests/TestData")

        def body(path):
            skip = ("##fileDate", "##source", "_cmdline")
            return [l for l in open(path)
                    if not any(s in l[:40] for s in skip)]

        for crush, oracle in ((True, "expected.crushed.vcf"),
                              (False, "expected.uncrushed.vcf")):
            out = str(tmp_path / oracle.replace("expected", "got"))
            reformat.reformat(os.path.join(SD, "CrushedExample.vcf"),
                              out, crush=crush)
            assert body(out) == body(os.path.join(SD, oracle)), oracle


class TestVqr:
    def test_inflated_category_recalibrated(self, tmp_path):
        # build a vcf with strongly inflated C->T counts
        lines = []
        pos = 1000
        rng = np.random.default_rng(0)
        for i in range(300):
            pos += 10
            lines.append(vcf_line("chr1", pos, "C", "T", dp=500, ad="490,10",
                                  vf="0.020"))
        # background categories: a couple each
        for i, (r, a) in enumerate([("A", "C"), ("A", "G"), ("A", "T"),
                                    ("C", "A"), ("C", "G"), ("G", "A"),
                                    ("G", "C"), ("G", "T"), ("T", "A"),
                                    ("T", "C"), ("T", "G")]):
            pos += 10
            lines.append(vcf_line("chr1", pos, r, a, dp=500, ad="490,10",
                                  vf="0.020"))
        # plenty of ref lines to set the denominator
        for i in range(2000):
            pos += 1
            lines.append(vcf_line("chr1", pos, "A", ".", gt="0/0",
                                  ad="500", vf="0.000"))
        vcf = str(tmp_path / "noisy.vcf")
        write_vcf(vcf, lines)
        out = vqr.recalibrate_vcf(vcf, str(tmp_path))
        assert os.path.exists(out)
        recal = [l for l in open(out) if not l.startswith("#")]
        orig = [l for l in open(vcf) if not l.startswith("#")]
        # C->T lines must have dropped q
        ct_recal = [l for l in recal if "\tC\tT\t" in l]
        assert ct_recal, "no C>T lines found"
        for l in ct_recal:
            q = int(l.split("\t")[5])
            assert q < 100
        # other categories untouched
        ag = [l for l in recal if "\tA\tG\t" in l][0]
        assert int(ag.split("\t")[5]) == 100

    def test_counts_file_roundtrip(self, tmp_path):
        counts = vqr.CountData()
        counts.add("CtoT")
        counts.add("CtoT")
        counts.add("Reference")
        path = str(tmp_path / "x.counts")
        vqr.write_counts_file(path, counts)
        back = vqr.read_counts_file(path)
        assert back.counts_by_category["CtoT"] == 2
        assert back.num_possible_variants == 3


class TestVenn:
    def test_self_venn(self, tmp_path):
        vcf = str(tmp_path / "a.vcf")
        write_vcf(vcf, [
            vcf_line("chr1", 100, "A", "T", ad="500,500", vf="0.500"),
            vcf_line("chr1", 200, "C", ".", gt="0/0", ad="1000", vf="0.000"),
        ])
        vcf_b = str(tmp_path / "b.vcf")
        write_vcf(vcf_b, [
            vcf_line("chr1", 100, "A", "T", ad="500,500", vf="0.500"),
            vcf_line("chr1", 300, "G", "A", ad="500,500", vf="0.500"),
        ])
        paths = vennvcf.do_pairwise_venn(vcf, vcf_b, str(tmp_path / "venn"))
        both = [l for l in open(paths["both"]) if not l.startswith("#")]
        a_only = [l for l in open(paths["a_only"]) if not l.startswith("#")]
        b_only = [l for l in open(paths["b_only"]) if not l.startswith("#")]
        assert len(both) == 1 and "\t100\t" in both[0]
        assert len(a_only) == 0
        assert len(b_only) == 1 and "\t300\t" in b_only[0]
        cons = [l for l in open(paths["consensus"]) if not l.startswith("#")]
        agreed = [l for l in cons if "\t100\t" in l]
        assert agreed and "0/1" in agreed[0]
        # depths pooled
        assert "DP=2000" in agreed[0]
        # one-sided call gets the pool-bias filter
        one_sided = [l for l in cons if "\t300\t" in l]
        assert one_sided and "PB" in one_sided[0]


class TestAdaptiveGt:
    def test_recalibrate_synthetic(self, tmp_path):
        rng = np.random.default_rng(0)
        lines = []
        pos = 100
        true_means = [0.01, 0.45, 0.95]
        for i in range(900):
            pos += 7
            comp = rng.choice(3, p=[0.5, 0.35, 0.15])
            dp = int(rng.integers(80, 300))
            ad = int(rng.binomial(dp, true_means[comp]))
            if ad < 2:
                lines.append(vcf_line("chr1", pos, "A", ".", gt="0/0",
                                      ad=str(dp - ad), dp=dp,
                                      vf=f"{ad/dp:.3f}"))
            else:
                gt = "0/1" if comp == 1 else ("1/1" if comp == 2 else "0/1")
                lines.append(vcf_line("chr1", pos, "A", "T", gt=gt,
                                      ad=f"{dp-ad},{ad}", dp=dp,
                                      vf=f"{ad/dp:.3f}"))
        vcf = str(tmp_path / "g.vcf")
        write_vcf(vcf, lines)
        out = adaptive_gt.recalibrate(vcf, str(tmp_path))
        assert os.path.exists(out)
        recal = [l for l in open(out) if not l.startswith("#")]
        # loci the model re-genotypes as hom-ref are deleted in non-gvcf
        # output (LocusProcessor.GetTypeOfUpdate DeleteCompletely); the
        # het/hom-alt components (~50%) survive
        assert 350 < len(recal) < 550
        assert all(l.split("\t")[9].split(":")[0] in ("0/1", "1/1", "1/2")
                   for l in recal)
        # GP column added
        assert all("GP" in l.split("\t")[8] for l in recal)
        # model file written
        model = str(tmp_path / "g.model")
        assert os.path.exists(model)
        models = adaptive_gt.read_model_file(model)
        assert np.allclose(models[0][0], true_means, atol=0.05)

    def test_jax_backend_matches_numpy(self, tmp_path):
        """-backend jax (device EM, chained starting means) produces the
        same recal VCF as the numpy fit (MixtureModel.cs:70,103-119)."""
        rng = np.random.default_rng(5)
        true_means = [0.01, 0.47, 0.97]
        lines = []
        for k in range(600):
            pos = 100 + k
            comp = int(rng.choice(3, p=[0.5, 0.35, 0.15]))
            dp = int(rng.integers(80, 300))
            ad = int(rng.binomial(dp, true_means[comp]))
            if ad < 2:
                lines.append(vcf_line("chr1", pos, "A", ".", gt="0/0",
                                      ad=str(dp - ad), dp=dp,
                                      vf=f"{ad/dp:.3f}"))
            else:
                gt = "0/1" if comp == 1 else ("1/1" if comp == 2 else "0/1")
                lines.append(vcf_line("chr1", pos, "A", "T", gt=gt,
                                      ad=f"{dp-ad},{ad}", dp=dp,
                                      vf=f"{ad/dp:.3f}"))
        d1 = tmp_path / "np_fit"
        d2 = tmp_path / "jax_fit"
        d1.mkdir()
        d2.mkdir()
        v1 = str(d1 / "g.vcf")
        v2 = str(d2 / "g.vcf")
        write_vcf(v1, lines)
        write_vcf(v2, lines)
        out_np = adaptive_gt.recalibrate(v1, str(d1))
        out_jax = adaptive_gt.recalibrate(v2, str(d2), use_jax=True)
        body_np = [l for l in open(out_np) if not l.startswith("#")]
        body_jax = [l for l in open(out_jax) if not l.startswith("#")]
        assert body_np == body_jax
        assert len(body_np) > 200


class TestPsaraShippedExpected:
    """Byte-level comparison against the reference's Psara.Tests expected
    outputs (FunctionalTests.cs): start-position and expanded inclusion
    models, plain and gVCF inputs."""

    SD = os.path.join(conftest.REFERENCE_ROOT, "src/test/Psara.Tests/TestData")

    @pytest.mark.parametrize("inp,model,expected", [
        ("PsaraTestInput.vcf", "start", "Simple.filtered.vcf"),
        ("PsaraTestInput.genome.vcf", "start", "Simple.filtered.genome.vcf"),
        ("PsaraTestInput.vcf", "expanded", "Expanded.filtered.vcf"),
        ("PsaraTestInput.genome.vcf", "expanded",
         "Expanded.filtered.genome.vcf"),
    ])
    def test_matches_expected(self, tmp_path, inp, model, expected):
        out = str(tmp_path / "out.vcf")
        psara.filter_vcf(os.path.join(self.SD, inp), out,
                         os.path.join(self.SD, "roi.txt"), model)
        ours = [l.rstrip("\n") for l in open(out) if not l.startswith("##")]
        exp = [l.rstrip("\n") for l in open(os.path.join(self.SD, expected))
               if not l.startswith("##")]
        assert ours == exp


class TestVqrShippedExpected:
    """VQR against the reference's shipped expected files
    (RecalTests / EdgeIssueRecalTests / SignatureSorter tests)."""

    SD = os.path.join(conftest.REFERENCE_ROOT,
                      "src/test/VariantQualityRecalibration.Tests/TestData")

    @staticmethod
    def _body(path):
        # expected files may carry a double-encoded BOM ("ï»¿##fileformat")
        return [l.rstrip("\n") for l in open(path, encoding="utf-8-sig")
                if not l.lstrip("﻿ï»¿").startswith("#")]

    def test_recalibrate_dirty_vcf(self, tmp_path):
        out = vqr.recalibrate_with_counts(
            os.path.join(self.SD, "TestWithArtifacts.vcf"),
            os.path.join(self.SD, "Dirty.counts"), str(tmp_path),
            z_factor=0, max_q=66, filter_q=0, baseline_q=30)
        assert self._body(out) == self._body(
            os.path.join(self.SD, "ExpectedDirty.vcf.recal"))

    def test_recalibrate_edge_issues(self, tmp_path):
        out = vqr.recalibrate_vcf(
            os.path.join(self.SD, "TestEdgeExample.vcf"), str(tmp_path),
            do_edge=True, extent=2, align_warn_threshold=1)
        assert self._body(out) == self._body(
            os.path.join(self.SD, "ExpectedEdgeExample.vcf.recal"))

    def test_edge_counts_and_suspects(self):
        basic, edge = vqr.strain_vcf(
            os.path.join(self.SD, "FindEdges.vcf"), extent=2)
        expected = {}
        for line in open(os.path.join(self.SD, "Expected.edgecounts")):
            parts = line.rstrip("\n").split("\t")
            if len(parts) == 2 and parts[0] in edge.counts_by_category:
                expected[parts[0]] = float(parts[1])
        for cat, n in expected.items():
            assert edge.counts_by_category[cat] == n, cat
        assert edge.num_possible_variants == 19
        exp_suspects = [tuple(l.split("\t")[:2]) for l in
                        open(os.path.join(self.SD, "Expected.edgevariants"),
                             encoding="utf-8-sig") if l.strip()]
        ours = [(c, str(p)) for c, ps in sorted(edge.suspects.items())
                for p in ps]
        assert sorted(ours) == sorted(exp_suspects)

    def test_basic_counts(self):
        basic, _edge = vqr.strain_vcf(
            os.path.join(self.SD, "TestSignatureSorter.vcf"))
        expected = {"CtoA": 1, "CtoG": 2, "GtoA": 1, "GtoT": 1,
                    "TtoA": 1, "TtoC": 2}
        for cat, n in expected.items():
            assert basic.counts_by_category[cat] == n
        assert basic.num_possible_variants == 10


class TestVennShippedExpected:
    """Pairwise venn + consensus vs the reference's shipped expected files
    (VennProcessorTests.VennVcf_FxnlTest_HG19 and the gVCF ref-squash
    scenario of ExpectedConsensus2)."""

    SD = os.path.join(conftest.REFERENCE_ROOT,
                      "src/test/VennVcf.Tests/TestData")

    @staticmethod
    def _body(path):
        return [l.rstrip("\n") for l in open(path, encoding="utf-8-sig")
                if not l.startswith("#") and l.count("\t") > 5]

    def test_consensus_hg19(self, tmp_path):
        paths = vennvcf.do_pairwise_venn(
            os.path.join(self.SD, "control_S15.vcf"),
            os.path.join(self.SD, "control_S18.vcf"), str(tmp_path),
            debug=True, min_frequency_filter=0.03)
        assert self._body(paths["consensus"]) == self._body(
            os.path.join(self.SD, "ExpectedConsensus.vcf"))

    def test_consensus_gvcf_pair(self, tmp_path):
        paths = vennvcf.do_pairwise_venn(
            os.path.join(self.SD, "C64-Ct-4_S17.genome.vcf"),
            os.path.join(self.SD, "C64-Ct-4_S18.genome.vcf"), str(tmp_path),
            min_frequency_filter=0.03)
        assert self._body(paths["consensus"]) == self._body(
            os.path.join(self.SD, "ExpectedConsensus2.vcf"))


def test_vqr_diploid_crushed_vcf(tmp_path):
    """VcfRewritingTests.TestOnADiploidVcf: crushed diploid lines; multi-alt
    records are skipped (CanSkipVcfLine), SNV rows recalibrated."""
    SD = os.path.join(conftest.REFERENCE_ROOT,
                      "src/test/VariantQualityRecalibration.Tests/TestData")
    out = vqr.recalibrate_with_counts(
        os.path.join(SD, "TestWithDiploidCalls.vcf"),
        os.path.join(SD, "Dirty.counts"), str(tmp_path),
        z_factor=0, max_q=66, filter_q=30, baseline_q=30)
    ours = [l.rstrip("\n") for l in open(out) if not l.startswith("#")]
    exp = [l.rstrip("\n") for l in
           open(os.path.join(SD, "ExpectedDiploidCalls.vcf.recal"),
                encoding="utf-8-sig") if not l.lstrip("﻿ï»¿").startswith("#")]
    assert ours == exp


class TestAdaptiveGtShippedExpected:
    """AdaptiveGT rewrite vs shipped expected files (AdaptiveGtWriterTests).
    The reference's own comparer (CompareVariants.AssertSameVariants_
    QScoreAgnostic) checks genotype+alt of the first colocated group only;
    we additionally match the whole MultiAllelic file's variant set."""

    SD = os.path.join(conftest.REFERENCE_ROOT,
                      "src/test/AdaptiveGenotyper.Tests/TestData")

    @staticmethod
    def _keyset(path):
        out = []
        for l in open(path, encoding="utf-8-sig"):
            if l.startswith("#"):
                continue
            f = l.rstrip("\n").split("\t")
            out.append((f[0], f[1], f[3], f[4], f[9].split(":")[0]))
        return out

    def _run(self, tmp_path, name):
        out = adaptive_gt.recalibrate(
            os.path.join(self.SD, f"{name}.vcf"), str(tmp_path),
            model_file=os.path.join(self.SD, "example.model"))
        return self._keyset(out), self._keyset(
            os.path.join(self.SD, f"{name}.recal.vcf"))

    def test_multiallelic_full_match(self, tmp_path):
        ours, exp = self._run(tmp_path, "MultiAllelicVariantTest")
        assert ours == exp   # incl. crushed 1/2 lines with freq-ordered alts

    @pytest.mark.parametrize("name", ["DeletionVariantTest",
                                      "DeletionSpecialCaseTest"])
    def test_first_locus_genotype_and_alt(self, tmp_path, name):
        ours, exp = self._run(tmp_path, name)
        assert ours[0] == exp[0]
        # ref rows are dropped in non-gvcf mode like the reference
        assert all(k[3] != "." for k in ours)


def test_venn_grch37_five_file_parity(tmp_path):
    """VennProcessorTests.VennVcf_FxnlTest_GRCH37 (VennProcessorTests.cs:
    49-84): the consensus AND all four A/B and/not venn files byte-match
    the shipped oracles. Exercises the UNVALIDATED default
    MinimumFrequencyFilter=-1 (one-sided refs genotype ./.), the
    contig-list chromosome ordering (ChrCompare), per-component debug
    columns (ref components print their ref-supporting VF/AD), and the
    reference's venn file naming (".genome" stripped)."""
    SD = os.path.join(conftest.REFERENCE_ROOT,
                      "src/test/VennVcf.Tests/TestData")
    paths = vennvcf.do_pairwise_venn(
        os.path.join(SD, "GRCH37_S25.bam.genome.vcf"),
        os.path.join(SD, "GRCH37_S30.bam.genome.vcf"),
        str(tmp_path), debug=True)
    assert os.path.basename(paths["both"]) == \
        "GRCH37_S25.bam_and_GRCH37_S30.bam.vcf"
    oracle = {"consensus": "Expected_GRCH37_Consensus.vcf",
              "both": "Expected_GRCH37_S25.bam_and_GRCH37_S30.bam.vcf",
              "a_only": "Expected_GRCH37_S25.bam_not_GRCH37_S30.bam.vcf",
              "b_and": "Expected_GRCH37_S30.bam_and_GRCH37_S25.bam.vcf",
              "b_only": "Expected_GRCH37_S30.bam_not_GRCH37_S25.bam.vcf"}

    def body(path):
        return [l.rstrip("\n") for l in open(path, encoding="utf-8-sig")
                if not l.startswith("#") and l.strip()]

    for key, exp in oracle.items():
        assert body(paths[key]) == body(os.path.join(SD, exp)), key


def test_vqr_counts_file_oracles(tmp_path):
    """SignatureSorter_FFPETests.WriteCountsFile(+GivenLociCounts) and
    SignatureSorter_AlignmentIssueTests.WriteEdgeCountsFile(+GivenLociCounts):
    the emitted counts files byte-match the four shipped oracles, including
    the MutationCounter category order, integral number formatting, and the
    LociCount denominator override for both counters."""
    SD = os.path.join(conftest.REFERENCE_ROOT,
                      "src/test/VariantQualityRecalibration.Tests/TestData")
    cases = [
        ("TestSignatureSorter.vcf", -1, 4, "basic", "Expected.counts"),
        ("TestSignatureSorter.vcf", 1000, 4, "basic",
         "ExpectedGivenLociNum.counts"),
        ("FindEdges.vcf", -1, 2, "edge", "Expected.edgecounts"),
        ("FindEdges.vcf", 1000, 2, "edge", "ExpectedGivenLociNum.edgecounts"),
    ]
    for vcf, loci, extent, which, oracle in cases:
        basic, edge = vqr.strain_vcf(os.path.join(SD, vcf), extent=extent,
                                     loci_count=loci)
        out = str(tmp_path / oracle)
        vqr.write_counts_file(out, basic if which == "basic" else edge)
        ours = open(out).read().splitlines()
        exp = open(os.path.join(SD, oracle)).read().splitlines()
        assert ours == exp, oracle


def test_vqr_rewriter_oracle(tmp_path):
    """ProgramTests.CheckCommandLineArgumentHandling_HappyPath
    (ProgramTests.cs:74-90): default-flag recalibration of
    RewriterTest.phased.genome.vcf matches the shipped .recal oracle,
    including the VQRVcfWriter header adjustment (version + cmdline lines
    after the first four, and the ', by VQR' q30/SB filter lines inserted
    after the last original ##FILTER). The cmdline line embeds the local
    path and is skipped, as TestHelper.CompareFiles does."""
    SD = os.path.join(conftest.REFERENCE_ROOT,
                      "src/test/VariantQualityRecalibration.Tests/TestData")
    src = str(tmp_path / "RewriterTest.phased.genome.vcf")
    import shutil
    shutil.copy(os.path.join(SD, "RewriterTest.phased.genome.vcf"), src)
    assert vqr.main(["-vcf", src]) in (0, None)

    def body(path):
        return [l.rstrip("\n") for l in open(path, encoding="utf-8-sig")
                if "_cmdline=" not in l]

    assert body(src + ".recal") == body(
        os.path.join(SD, "ExpectedRewriterTest.phased.genome.vcf.recal"))
