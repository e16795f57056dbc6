"""Realigner + Gemini pipeline tests (Gemini.Tests scenario style)."""
import numpy as np
import pytest

from pisces_tpu.preprocessing.indels import (
    ChromosomeIndelSource, PreIndel, get_hashable_indel,
)
from pisces_tpu.preprocessing.realigner import (
    GemBasicAlignmentComparer, GeminiReadRealigner, RealignmentEvaluator,
    RealignmentJudger,
)
from pisces_tpu.preprocessing.gemini import (
    GeminiOptions, process_chromosome, run_gemini,
)
from pisces_tpu.io.bam_write import BamWriter
from pisces_tpu.io.bam import BamReader

from util import parse_cigar, refseq


def cig(s):
    ops, lens = parse_cigar(s)
    return list(zip(ops.tolist(), lens.tolist()))


REF = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"  # 40bp


def _realigner():
    comparer = GemBasicAlignmentComparer()
    return GeminiReadRealigner(comparer)


def _hashable(pos, ref, alt, score=100):
    return get_hashable_indel(REF, PreIndel("chr1", pos, ref, alt,
                                            score=score))


def _evaluator(hashables):
    comparer = GemBasicAlignmentComparer()
    realigner = GeminiReadRealigner(comparer)
    judger = RealignmentJudger(comparer)
    return RealignmentEvaluator(ChromosomeIndelSource(list(hashables)),
                                realigner, judger, REF)


class TestRealigner:
    def test_deletion_rescues_mismatches(self):
        # read matches ref[0:10] + ref[13:23] (3bp deletion after pos 10)
        read = REF[0:10] + REF[13:23]
        target = _hashable(10, REF[9:13], REF[9])
        res = _realigner().realign(1, cig("20M"), read, [30] * 20, [target],
                                   REF)
        assert res is not None
        assert res.position == 1
        assert res.cigar == [(0, 10), (2, 3), (0, 10)]
        assert res.num_mismatches == 0
        assert res.accepted_hashables == [target]

    def test_insertion_rescues_mismatches(self):
        read = REF[0:10] + "GGG" + REF[10:17]
        target = _hashable(10, REF[9], REF[9] + "GGG")
        res = _realigner().realign(1, cig("20M"), read, [30] * 20, [target],
                                   REF)
        assert res is not None
        assert res.cigar == [(0, 10), (1, 3), (0, 7)]
        assert res.num_mismatches == 0

    def test_no_improvement_not_accepted(self):
        # perfect read: the evaluator must keep the original alignment
        read = REF[0:20]
        ev = _evaluator([_hashable(10, REF[9:13], REF[9])])
        pos, cigar_out, changed, confirmed, accepted, nified = \
            ev.get_final_alignment(1, cig("20M"), read, [30] * 20,
                                   has_mismatches_or_indels=False)
        assert not changed
        assert pos == 1 and cigar_out == cig("20M")

    def test_wrong_target_rejected(self):
        read = REF[0:20]
        read = read[:15] + "T" + read[16:]  # single SNV only
        ev = _evaluator([_hashable(5, REF[4:7], REF[4])])
        pos, cigar_out, changed, confirmed, accepted, nified = \
            ev.get_final_alignment(1, cig("20M"), read, [30] * 20)
        assert not changed
        assert cigar_out == cig("20M")

    def test_existing_top_indel_confirmed(self):
        # a read that already carries the best-ranked indel is confirmed
        # without realignment (RealignmentEvaluator.cs:171-189)
        target = _hashable(10, REF[9:13], REF[9])
        ev = _evaluator([target])
        read = REF[0:10] + REF[13:23]
        existing = [PreIndel("chr1", 10, REF[9:13], REF[9])]
        pos, cigar_out, changed, confirmed, accepted, nified = \
            ev.get_final_alignment(1, cig("10M3D10M"), read, [30] * 20,
                                   existing_indels=existing)
        assert not changed
        assert confirmed
        assert accepted == [target]
        assert ev.indel_outcomes[target.string_rep][0] == 1

    def test_softclip_unrolled_into_match(self):
        # softclipped tail hides the deletion: fresh layout unrolls the clip
        # and the deletion target explains it (SoftclipReapplier flow)
        read = REF[0:10] + REF[13:23]
        target = _hashable(10, REF[9:13], REF[9])
        res = _realigner().realign(1, cig("10M10S"), read, [30] * 20,
                                   [target], REF)
        assert res is not None
        assert res.cigar == [(0, 10), (2, 3), (0, 10)]

    def test_can_coexist_multi_only(self):
        # only indels observed together in one read (InMulti partners) may
        # coexist in a realignment (GeminiReadRealigner.CanCoexist)
        d1 = _hashable(10, REF[9:13], REF[9])
        d3 = _hashable(20, REF[19:21], REF[19])
        assert not GeminiReadRealigner.can_coexist(d1, d3)
        import dataclasses
        m1 = dataclasses.replace(d1, in_multi=True,
                                 other_indel=d3.string_rep)
        m2 = dataclasses.replace(d3, in_multi=True,
                                 other_indel=d1.string_rep)
        assert GeminiReadRealigner.can_coexist(m1, m2)


class TestGeminiPipeline:
    def _make_genome(self, tmp_path, seq):
        gdir = tmp_path / "genome"
        gdir.mkdir()
        with open(gdir / "chr1.fa", "w") as f:
            f.write(">chr1\n" + seq + "\n")
        with open(gdir / "chr1.fa.fai", "w") as f:
            f.write(f"chr1\t{len(seq)}\t6\t{len(seq)}\t{len(seq)+1}\n")
        with open(gdir / "GenomeSize.xml", "w") as f:
            f.write('<sequenceSizes genomeName="t">\n'
                    f'\t<chromosome fileName="chr1.fa" contigName="chr1" '
                    f'totalBases="{len(seq)}" isCircular="false" md5="x" '
                    'ploidy="2" knownBases="40" />\n</sequenceSizes>')
        return str(gdir)

    def test_end_to_end_realignment(self, tmp_path):
        gdir = self._make_genome(tmp_path, REF)
        bam_path = str(tmp_path / "in.bam")
        w = BamWriter(bam_path, ["chr1"], [len(REF)])
        # 5 reads with a correctly-cigared 3bp deletion (the evidence)
        del_read = REF[0:10] + REF[13:23]
        for i in range(5):
            w.add_read(f"good{i}", "chr1", 1, "10M3D10M", del_read)
        # 3 reads with the same deletion but aligned as mismatches
        for i in range(3):
            w.add_read(f"bad{i}", "chr1", 1, "20M", del_read)
        w.write()

        out = run_gemini(bam_path, gdir, str(tmp_path / "out.bam"),
                         GeminiOptions(stitch_pairs=False))
        rb = BamReader(out)
        batch = rb.fetch(0)
        assert batch.n == 8
        # all 8 reads should now carry the deletion cigar
        n_del = 0
        for i in range(batch.n):
            s, e = batch.cigar_off[i], batch.cigar_off[i + 1]
            ops = batch.cigar_ops[s:e].tolist()
            if 2 in ops:
                n_del += 1
        assert n_del == 8

    def test_end_to_end_stitching(self, tmp_path):
        gdir = self._make_genome(tmp_path, REF)
        bam_path = str(tmp_path / "in.bam")
        w = BamWriter(bam_path, ["chr1"], [len(REF)])
        # overlapping mate pair: R1 1-20, R2 11-30
        w.add_read("pair1", "chr1", 1, "20M", REF[0:20], flag=0x1 | 0x2 | 0x40)
        w.add_read("pair1", "chr1", 11, "20M", REF[10:30],
                   flag=0x1 | 0x2 | 0x80 | 0x10)
        w.write()
        out = run_gemini(bam_path, gdir, str(tmp_path / "out.bam"),
                         GeminiOptions(realign=False))
        rb = BamReader(out)
        batch = rb.fetch(ref_id=0, parse_tags=True)
        assert batch.n == 1  # one stitched read
        assert batch.seq_off[1] == 30
        assert batch.xd_tags[0] == "10F10S10R"


def test_gemini_multi_matches_single(tmp_path):
    """GeminiMulti-equivalent per-chromosome fan-out + native merge produces
    the same reads as single-process Gemini, sorted and indexed."""
    import conftest
    import os
    import shutil
    from pisces_tpu.io.bam import BamReader as _BR
    from pisces_tpu.preprocessing.gemini import run_gemini, run_gemini_multi

    src = conftest.shared_bam("Chr17Chr19.bam")
    gdir = conftest.shared_genome("chr19")
    bam = str(tmp_path / "in.bam")
    shutil.copy(src, bam)
    single = run_gemini(bam, gdir, str(tmp_path / "single.bam"))
    multi = run_gemini_multi(bam, gdir, str(tmp_path / "multi.bam"),
                             n_processes=2)
    assert os.path.exists(multi + ".bai")
    a = _BR(single).fetch(parse_tags=True)
    b = _BR(multi).fetch(parse_tags=True)
    assert a.n == b.n
    assert np.array_equal(a.pos, b.pos)
    assert np.array_equal(a.seq, b.seq)
    assert np.array_equal(a.cigar_ops, b.cigar_ops)
    assert a.xd_tags == b.xd_tags


class TestStreamingBlocks:
    """Block streaming with EdgeState handoff (DataflowReadEvaluator /
    EdgeState analog): streamed output == whole-chromosome output."""

    def test_stream_blocks_partitions_reads_once(self, tmp_path):
        import conftest
        from pisces_tpu.io.bam import BamReader as _BR
        from pisces_tpu.preprocessing.gemini import stream_blocks
        src = conftest.shared_bam("Chr17Chr19.bam")
        lazy = _BR(src, lazy=True)
        rid = lazy.header.ref_index("chr19")
        whole = _BR(src).fetch(rid, parse_names=True)
        seen = []
        # 3118900 cuts straight through the 3118882-3119065 pileup
        for block in stream_blocks(lazy, rid, 3119000, 3118900):
            seen.extend(zip(block.names, block.pos.tolist()))
        assert len(seen) == whole.n
        assert sorted(seen) == sorted(zip(whole.names, whole.pos.tolist()))

    def test_edge_state_carries_boundary_pairs(self, tmp_path):
        # mates straddling a block edge land in the SAME block
        import conftest
        from pisces_tpu.io.bam import BamReader as _BR, FLAG_PAIRED
        from pisces_tpu.preprocessing.gemini import stream_blocks
        src = conftest.shared_bam("Chr17Chr19.bam")
        lazy = _BR(src, lazy=True)
        rid = lazy.header.ref_index("chr19")
        # the block edge at 3118900 cuts through the 3118882-3119065 pileup
        for block in stream_blocks(lazy, rid, 3119000, 3118900):
            by_name = {}
            for i, nm in enumerate(block.names or []):
                if block.flag[i] & FLAG_PAIRED:
                    by_name.setdefault(nm, []).append(i)
            # every paired name present must appear exactly twice (full
            # pair) unless its mate is unmapped/other-chromosome
            for nm, members in by_name.items():
                if len(members) == 1:
                    i = members[0]
                    assert (block.mate_ref_id[i] != rid
                            or block.flag[i] & 0x8), nm

    def test_streamed_equals_whole(self, tmp_path):
        import conftest
        import shutil
        import dataclasses
        from pisces_tpu.io.bam import BamReader as _BR
        src = conftest.shared_bam("Chr17Chr19.bam")
        gdir = conftest.shared_genome("chr19")
        bam = str(tmp_path / "in.bam")
        shutil.copy(src, bam)
        shutil.copy(src + ".bai", bam + ".bai")
        whole = run_gemini(bam, gdir, str(tmp_path / "whole.bam"))
        streamed = run_gemini(bam, gdir, str(tmp_path / "str.bam"),
                              GeminiOptions(region_size=3118900))
        a = _BR(whole).fetch(parse_tags=True)
        b = _BR(streamed).fetch(parse_tags=True)
        assert a.n == b.n
        assert np.array_equal(a.pos, b.pos)
        assert np.array_equal(a.seq, b.seq)
        assert np.array_equal(a.cigar_ops, b.cigar_ops)
        assert a.xd_tags == b.xd_tags

    def test_ten_x_corpus_streamed_bounded(self, tmp_path):
        """Constant-memory streaming on a synthetic multi-chromosome BAM
        ~10x the shared-corpus read count: block-fetch never inflates the
        whole file, and the streamed output equals whole-chromosome mode."""
        from pisces_tpu.io.bam import BamReader as _BR
        from pisces_tpu.io.bam_write import BamWriter as _BW
        from pisces_tpu.io.fasta import Genome

        rng = np.random.default_rng(11)
        L = 60_000
        chroms = ["c1", "c2", "c3"]
        bases = "ACGT"
        seqs = {c: "".join(rng.choice(list(bases), L)) for c in chroms}
        gdir = tmp_path / "genome"
        gdir.mkdir()
        gs_entries = []
        for c in chroms:
            with open(gdir / f"{c}.fa", "w") as f:
                f.write(f">{c}\n")
                for i in range(0, L, 70):
                    f.write(seqs[c][i:i + 70] + "\n")
            with open(gdir / f"{c}.fa.fai", "w") as f:
                n_full = L // 70
                f.write(f"{c}\t{L}\t{len(c) + 2}\t70\t71\n")
            gs_entries.append(
                f'\t<chromosome fileName="{c}.fa" contigName="{c}" '
                f'totalBases="{L}" isCircular="false" md5="x" ploidy="2" '
                f'knownBases="{L}" />')
        with open(gdir / "GenomeSize.xml", "w") as f:
            f.write('<sequenceSizes genomeName="t">\n'
                    + "\n".join(gs_entries) + "\n</sequenceSizes>")

        bam = str(tmp_path / "big.bam")
        w = _BW(bam, chroms, [L] * len(chroms))
        rl = 50
        n_pairs = 3500  # ~21k reads over 3 chromosomes (>10x the corpus)
        for k in range(n_pairs):
            c = chroms[k % 3]
            p1 = 1 + int(rng.integers(0, L - 400))
            p2 = p1 + int(rng.integers(20, 300))
            w.add_read(f"p{k}", c, p1, f"{rl}M", seqs[c][p1 - 1:p1 - 1 + rl],
                       flag=0x1 | 0x2 | 0x40, mate_pos0=p2 - 1)
            w.add_read(f"p{k}", c, p2, f"{rl}M", seqs[c][p2 - 1:p2 - 1 + rl],
                       flag=0x1 | 0x2 | 0x80 | 0x10, mate_pos0=p1 - 1)
        w.write(sort=True, index=True)

        whole = run_gemini(bam, str(gdir), str(tmp_path / "w.bam"))
        streamed = run_gemini(bam, str(gdir), str(tmp_path / "s.bam"),
                              GeminiOptions(region_size=10_000))
        a = _BR(whole).fetch(parse_tags=True)
        b = _BR(streamed).fetch(parse_tags=True)
        assert a.n == b.n and a.n > 0
        assert np.array_equal(a.pos, b.pos)
        assert np.array_equal(a.seq, b.seq)
        assert np.array_equal(a.cigar_ops, b.cigar_ops)


class TestSoftclipAfterIndel:
    """OverlappingIndelHelpers.SoftclipAfterIndel scenarios."""

    def test_forward_clip_after_indel(self):
        from pisces_tpu.preprocessing.realigner import softclip_after_indel
        # 10M 2D 10M at pos 1: clip everything from the deletion onward
        pos, out = softclip_after_indel(1, cig("10M2D10M"), False, 10)
        assert pos == 1
        assert out == cig("10M10S")

    def test_reverse_clip_before_indel(self):
        from pisces_tpu.preprocessing.realigner import softclip_after_indel
        pos, out = softclip_after_indel(1, cig("10M2D10M"), True, 12)
        # leading 10M + the deletion get clipped; position advances past them
        assert out == cig("10S10M")
        assert pos == 13

    def test_evaluator_softclips_unknown_indel(self):
        # an existing weak indel with no sanctioned target nearby gets
        # softclipped out when SoftclipUnknownIndels is on
        comparer = GemBasicAlignmentComparer()
        realigner = GeminiReadRealigner(comparer)
        judger = RealignmentJudger(comparer)
        other = _hashable(30, REF[29:31], REF[29])  # unrelated sanctioned
        ev = RealignmentEvaluator(ChromosomeIndelSource([other]), realigner,
                                  judger, REF, softclip_unknown_indels=True)
        read = REF[0:10] + REF[13:23]
        existing = [PreIndel("chr1", 10, REF[9:13], REF[9],
                             left_anchor=10, right_anchor=10)]
        pos, cigar_out, changed, confirmed, accepted, nified = \
            ev.get_final_alignment(1, cig("10M3D10M"), read, [30] * 20,
                                   existing_indels=existing)
        assert changed
        assert cigar_out == cig("10M10S")


class TestSnowballing:
    """Gemini snowballing (AggregateRegionProcessor.cs:184-255, 597-633):
    snowball categories realign first; their per-indel outcomes filter the
    target set (super-finalization) before the remaining categories
    realign."""

    def _bam(self, tmp_path):
        gdir = TestGeminiPipeline._make_genome(TestGeminiPipeline(),
                                               tmp_path, REF)
        bam_path = str(tmp_path / "in.bam")
        w = BamWriter(bam_path, ["chr1"], [len(REF)])
        del_read = REF[0:10] + REF[13:23]
        for i in range(5):  # cigared deletion evidence -> INDEL_SINGLETON
            w.add_read(f"good{i}", "chr1", 1, "10M3D10M", del_read)
        for i in range(3):  # same bases aligned as mismatches
            w.add_read(f"bad{i}", "chr1", 1, "20M", del_read)
        w.write()
        return bam_path, gdir

    def _n_del(self, out):
        rb = BamReader(out)
        batch = rb.fetch(0)
        return sum(1 for i in range(batch.n)
                   if 2 in batch.cigar_ops[batch.cigar_off[i]:
                                           batch.cigar_off[i + 1]].tolist())

    def test_snowball_confirmed_indel_survives(self, tmp_path):
        """Snowballing on the evidence category: phase 1 confirms the
        deletion, the super-finalized set keeps it, and phase 2 realigns
        the mismatch reads exactly like the non-snowball run."""
        bam_path, gdir = self._bam(tmp_path)
        out = run_gemini(bam_path, gdir, str(tmp_path / "out.bam"),
                         GeminiOptions(
                             stitch_pairs=False,
                             categories_to_snowball=("INDEL_SINGLETON",)))
        assert self._n_del(out) == 8

    def test_snowball_unsupported_indel_dropped(self, tmp_path):
        """RequirePositiveOutcomeForSnowball with a snowball category that
        produced no outcomes for the indel: super-finalization drops it
        (AggregateRegionProcessor.cs:624-630), so phase 2 leaves the
        mismatch reads unrealigned — output genuinely changes."""
        bam_path, gdir = self._bam(tmp_path)
        out = run_gemini(bam_path, gdir, str(tmp_path / "snow.bam"),
                         GeminiOptions(
                             stitch_pairs=False,
                             categories_to_snowball=("UNSTITCH_PERFECT",),
                             require_positive_outcome_for_snowball=True))
        assert self._n_del(out) == 5  # evidence reads keep 3D; bad reads not realigned

    def test_snowball_flag_parsing(self, tmp_path):
        from pisces_tpu.preprocessing.gemini import main as gemini_main
        import inspect
        # CamelCase reference names normalize to our enum members
        import re as _re
        for cam, snake in (("ImperfectStitched", "IMPERFECT_STITCHED"),
                           ("UnstitchIndel", "UNSTITCH_INDEL"),
                           ("Disagree", "DISAGREE")):
            got = _re.sub(r"(?<!^)(?=[A-Z])", "_", cam).upper()
            assert got == snake
