"""Gemini PairClassification decision-tree tests
(ReadPairClassifierAndExtractor.cs semantics, NM derived from the reference
sequence instead of tags)."""
import numpy as np

import conftest
from pisces_tpu.domain.types import BASE_TO_ALLELE
from pisces_tpu.io.bam import BamReader
from pisces_tpu.io.bam_write import BamWriter
from pisces_tpu.preprocessing.classify import (
    PairClassification, classify_batch, extract_features,
)
from util import refseq as make_refseq

REF = "ACGTACGTACGTACGTACGTACGTACGTACGTACGTACGT"  # 40 bp


def _classify(reads, tmp_path, ref=REF):
    """reads: list of (name, pos1, cigar, seq, flag, mapq)."""
    bam = str(tmp_path / "c.bam")
    w = BamWriter(bam, ["chr1"], [len(ref)])
    for name, pos1, cigar, seq, flag, mapq in reads:
        w.add_read(name, "chr1", pos1, cigar, seq, flag=flag, mapq=mapq)
    w.write(sort=False)
    rb = BamReader(bam)
    batch = rb.fetch(0)
    names = [r[0] for r in reads]
    ref_codes = BASE_TO_ALLELE[np.frombuffer(ref.encode(), dtype=np.uint8)]
    return classify_batch(batch, ref_codes, names)


PAIR1 = 0x1 | 0x2 | 0x40
PAIR2 = 0x1 | 0x2 | 0x80 | 0x10


def test_perfect_pair(tmp_path):
    cls = _classify([("p", 1, "20M", REF[0:20], PAIR1, 60),
                     ("p", 11, "20M", REF[10:30], PAIR2, 60)], tmp_path)
    assert cls[0] == PairClassification.UNSTITCH_PERFECT
    assert cls[1] == PairClassification.UNSTITCH_PERFECT


def test_single_mismatch_pair(tmp_path):
    s1 = "T" + REF[1:20]
    cls = _classify([("p", 1, "20M", s1, PAIR1, 60),
                     ("p", 11, "20M", REF[10:30], PAIR2, 60)], tmp_path)
    assert cls[0] == PairClassification.UNSTITCH_SINGLE_MISMATCH


def test_messy_pair_and_suspicious_mapq(tmp_path):
    messy = "TTTT" + REF[4:20]  # 4 mismatches >= messy threshold
    # both mates messy -> UnstitchMessy
    cls = _classify([("p", 1, "20M", messy, PAIR1, 60),
                     ("p", 11, "20M", "GGGG" + REF[14:30], PAIR2, 60)],
                    tmp_path)
    assert cls[0] == PairClassification.UNSTITCH_MESSY
    # low mapq multimapper escalates to suspicious
    cls = _classify([("p", 1, "20M", messy, PAIR1, 20),
                     ("p", 11, "20M", "GGGG" + REF[14:30], PAIR2, 60)],
                    tmp_path)
    assert cls[0] == PairClassification.UNSTITCH_MESSY_SUSPICIOUS_READ
    # one clean mate -> directional messy (messy mate is reverse R2)
    cls = _classify([("p", 1, "20M", REF[0:20], PAIR1, 60),
                     ("p", 11, "20M", "GGGG" + REF[14:30], PAIR2, 60)],
                    tmp_path)
    assert cls[0] == PairClassification.UNSTITCH_REVERSE_MESSY


def test_indel_pair(tmp_path):
    del_read = REF[0:10] + REF[13:23]
    cls = _classify([("p", 1, "10M3D10M", del_read, PAIR1, 60),
                     ("p", 11, "20M", REF[10:30], PAIR2, 60)], tmp_path)
    assert cls[0] == PairClassification.DISAGREE  # clean overlapping mate
    # non-overlapping mate: plain UnstitchIndel
    cls = _classify([("p", 1, "10M3D10M", del_read, PAIR1, 60),
                     ("p", 21, "20M", REF[20:40], PAIR2, 60)], tmp_path)
    assert cls[0] == PairClassification.UNSTITCH_INDEL


def test_duplicate_and_unusable(tmp_path):
    cls = _classify([("p", 1, "20M", REF[0:20], PAIR1 | 0x400, 60),
                     ("p", 11, "20M", REF[10:30], PAIR2 | 0x400, 60)],
                    tmp_path)
    assert cls[0] == PairClassification.DUPLICATE
    # both mates low mapq -> unusable
    cls = _classify([("p", 1, "20M", REF[0:20], PAIR1, 3),
                     ("p", 11, "20M", REF[10:30], PAIR2, 3)], tmp_path)
    assert cls[0] == PairClassification.UNUSABLE


def test_split_quality_pair(tmp_path):
    cls = _classify([("p", 1, "20M", REF[0:20], PAIR1, 60),
                     ("p", 11, "20M", REF[10:30], PAIR2, 3)], tmp_path)
    assert cls[0] == PairClassification.SPLIT


def test_improper_and_singleton(tmp_path):
    improper = 0x1 | 0x40  # paired, not proper
    cls = _classify([("p", 1, "20M", REF[0:20], improper, 60),
                     ("p", 11, "20M", REF[10:30], 0x1 | 0x80 | 0x10, 60)],
                    tmp_path)
    assert cls[0] == PairClassification.IMPROPER
    # unpaired singleton with indel
    del_read = REF[0:10] + REF[13:23]
    cls = _classify([("s", 1, "10M3D10M", del_read, 0x0, 60)], tmp_path)
    assert cls[0] == PairClassification.INDEL_SINGLETON
    # unpaired clean singleton
    cls = _classify([("s", 1, "20M", REF[0:20], 0x0, 60)], tmp_path)
    assert cls[0] == PairClassification.UNSTITCHABLE_AS_SINGLETON


def test_softclip_distrust(tmp_path):
    # long softclip -> messy under softclip distrust
    sc_read = REF[0:12] + "TTTTTTTT"
    cls = _classify([("p", 1, "12M8S", sc_read, PAIR1, 60),
                     ("p", 11, "20M", REF[10:30], PAIR2, 60)], tmp_path)
    assert cls[0] == PairClassification.UNSTITCH_FORWARD_MESSY
    # short softclip, no mismatches -> imperfect
    sc_read = REF[0:18] + "TT"
    cls = _classify([("p", 1, "18M2S", sc_read, PAIR1, 60),
                     ("p", 11, "20M", REF[10:30], PAIR2, 60)], tmp_path)
    assert cls[0] == PairClassification.UNSTITCH_IMPERFECT


def test_long_fragment(tmp_path):
    ref = "ACGT" * 500  # 2000 bp
    cls = _classify([("p", 1, "20M", ref[0:20], 0x1 | 0x40, 60),
                     ("p", 1501, "20M", ref[1500:1520],
                      0x1 | 0x80 | 0x10, 60)], tmp_path, ref=ref)
    assert cls[0] == PairClassification.LONG_FRAGMENT_


class TestSuspiciousMd:
    """UnstitchMessySuspiciousMd upgrade (HasSuspiciousMd,
    ReadPairClassifierAndExtractor.cs:256-330), mismatch composition
    computed against the reference instead of MD tags.  The upgrade only
    applies to UnstitchMessy / UnstitchMessySuspiciousRead pairs
    (cs:241-248), i.e. both mates messy."""

    def _classify_md(self, reads, tmp_path, ref=REF, check_md=True):
        bam = str(tmp_path / "md.bam")
        w = BamWriter(bam, ["chr1"], [len(ref)])
        for name, pos1, cigar, seq, flag, mapq in reads:
            w.add_read(name, "chr1", pos1, cigar, seq, flag=flag, mapq=mapq)
        w.write(sort=False)
        batch = BamReader(bam).fetch(0)
        names = [r[0] for r in reads]
        ref_codes = BASE_TO_ALLELE[
            np.frombuffer(ref.encode(), dtype=np.uint8)]
        return classify_batch(batch, ref_codes, names, check_md=check_md)

    def _messy_read(self, start0, n_mism, length=30, spacing=3, ref=REF,
                    to_base=None):
        s = list(ref[start0:start0 + length])
        for m in range(n_mism):
            idx = m * spacing
            if to_base is not None:
                s[idx] = to_base if s[idx] != to_base else "C"
            else:
                s[idx] = {"A": "C", "C": "A", "G": "T", "T": "G"}[s[idx]]
        return "".join(s)

    def test_lopsided_mismatch_total_flags_md(self, tmp_path):
        # R1 10 spread mismatches, R2 3: both messy -> UnstitchMessy; total
        # 10 > 8 and OneMuchWorse(10, 3, 8) -> suspicious
        ref = REF * 3
        r1 = self._messy_read(0, 10, length=30, spacing=3, ref=ref)
        r2 = self._messy_read(10, 3, length=30, spacing=9, ref=ref)
        cls = self._classify_md(
            [("p", 1, "30M", r1, PAIR1, 60),
             ("p", 11, "30M", r2, PAIR2, 60)], tmp_path, ref=ref)
        assert cls[0] == PairClassification.UNSTITCH_MESSY_SUSPICIOUS_MD

    def test_check_md_off_keeps_messy(self, tmp_path):
        ref = REF * 3
        r1 = self._messy_read(0, 10, length=30, spacing=3, ref=ref)
        r2 = self._messy_read(10, 3, length=30, spacing=9, ref=ref)
        cls = self._classify_md(
            [("p", 1, "30M", r1, PAIR1, 60),
             ("p", 11, "30M", r2, PAIR2, 60)], tmp_path, ref=ref,
            check_md=False)
        assert cls[0] == PairClassification.UNSTITCH_MESSY

    def test_non_overlapping_pair_not_flagged(self, tmp_path):
        # same lopsidedness but mates do not overlap -> DontOverlap
        # short-circuit (no N excess, composition incomparable)
        ref = REF * 4
        r1 = self._messy_read(0, 10, length=30, spacing=3, ref=ref)
        r2 = self._messy_read(100, 3, length=30, spacing=9, ref=ref)
        cls = self._classify_md(
            [("p", 1, "30M", r1, PAIR1, 60),
             ("p", 101, "30M", r2, PAIR2, 60)], tmp_path, ref=ref)
        assert cls[0] == PairClassification.UNSTITCH_MESSY

    def test_excess_ns_flag_md(self, tmp_path):
        # R1 messy with > 3 N bases -> suspicious even without lopsidedness
        ref = REF * 3
        s = list(self._messy_read(0, 4, length=30, spacing=3, ref=ref))
        s[20] = s[22] = s[24] = s[26] = "N"
        r2 = self._messy_read(10, 3, length=30, spacing=9, ref=ref)
        cls = self._classify_md(
            [("p", 1, "30M", "".join(s), PAIR1, 60),
             ("p", 11, "30M", r2, PAIR2, 60)], tmp_path, ref=ref)
        assert cls[0] == PairClassification.UNSTITCH_MESSY_SUSPICIOUS_MD

    def test_mismatch_runs_flag_md(self, tmp_path):
        # 8-long adjacent mismatch run, all substituted toward A ->
        # NumInRuns 8 > 4 and subA lopsided vs the mate -> suspicious
        ref = REF * 3
        s = list(ref[0:30])
        for idx in range(10, 18):
            s[idx] = "A" if s[idx] != "A" else "C"
        r2 = self._messy_read(10, 3, length=30, spacing=9, ref=ref)
        cls = self._classify_md(
            [("p", 1, "30M", "".join(s), PAIR1, 60),
             ("p", 11, "30M", r2, PAIR2, 60)], tmp_path, ref=ref)
        assert cls[0] == PairClassification.UNSTITCH_MESSY_SUSPICIOUS_MD

    def test_balanced_mismatches_not_flagged(self, tmp_path):
        # mates share the same 4 spread mismatches -> balanced composition,
        # no runs, totals <= 8 -> stays messy
        ref = REF * 3
        r1 = self._messy_read(10, 4, length=30, spacing=6, ref=ref)
        cls = self._classify_md(
            [("p", 11, "30M", r1, PAIR1, 60),
             ("p", 11, "30M", r1, PAIR2, 60)], tmp_path, ref=ref)
        assert cls[0] in (PairClassification.UNSTITCH_MESSY,
                          PairClassification.UNSTITCH_MESSY_SUSPICIOUS_READ)


class TestPairFilters:
    """StitcherPairFilter.cs:37-122 read-skip + pair-blacklist rules and
    TreatAbnormalOrientationAsImproper (ReadPairClassifierAndExtractor
    .cs:451, orientation per ReadPair.cs:108-132)."""

    def _batch(self, tmp_path, reads):
        from pisces_tpu.io.bam import BamReader
        from pisces_tpu.io.bam_write import BamWriter
        path = str(tmp_path / "f.bam")
        w = BamWriter(path, ["chr1"], [10_000])
        for kw in reads:
            w.add_read(**kw)
        w.write()
        return BamReader(path).fetch(0, parse_names=True)

    def test_pair_low_mapq_blacklists_both_mates(self, tmp_path):
        from pisces_tpu.preprocessing.gemini import (
            GeminiOptions, gemini_keep_mask,
        )
        batch = self._batch(tmp_path, [
            dict(name="p", chrom="chr1", pos1=100, cigar="20M", seq="A" * 20,
                 flag=0x1 | 0x2 | 0x40, mapq=60, mate_pos0=149),
            dict(name="p", chrom="chr1", pos1=150, cigar="20M", seq="A" * 20,
                 flag=0x1 | 0x2 | 0x80 | 0x10, mapq=3, mate_pos0=99),
            dict(name="solo", chrom="chr1", pos1=300, cigar="20M",
                 seq="A" * 20, mapq=0),
        ])
        o = GeminiOptions(min_map_quality=10)
        keep = gemini_keep_mask(batch, o, batch.names)
        # default FilterPairLowMapQ=true: the low-mapq mate blacklists BOTH
        assert list(keep) == [False, False, True]
        # mapq-0 reads are never mapq-skipped (StitcherPairFilter.cs:39)
        o2 = GeminiOptions(min_map_quality=10, filter_pair_low_mapq=False)
        keep2 = gemini_keep_mask(batch, o2, batch.names)
        # read-level skip only: the good mate survives
        assert list(keep2) == [True, False, True]

    def test_proper_pairs_and_max_length(self, tmp_path):
        from pisces_tpu.preprocessing.gemini import (
            GeminiOptions, gemini_keep_mask,
        )
        batch = self._batch(tmp_path, [
            dict(name="imp", chrom="chr1", pos1=100, cigar="20M",
                 seq="A" * 20, flag=0x1 | 0x40, mapq=60),   # not proper
            dict(name="long", chrom="chr1", pos1=200, cigar="40M",
                 seq="A" * 40, mapq=60),
        ])
        o = GeminiOptions(filter_for_proper_pairs=True)
        assert list(gemini_keep_mask(batch, o, batch.names))[0] is np.False_
        o2 = GeminiOptions(ignore_reads_above_max_length=True,
                           max_read_length=30)
        keep2 = gemini_keep_mask(batch, o2, batch.names)
        assert bool(keep2[1]) is False and bool(keep2[0]) is True

    def test_abnormal_orientation_improper(self, tmp_path):
        from pisces_tpu.domain.types import BASE_TO_ALLELE
        # singleton paired read in RR orientation (mate also reverse):
        # abnormal -> Improper only when the flag is on
        batch = self._batch(tmp_path, [
            dict(name="rr", chrom="chr1", pos1=100, cigar="20M",
                 seq="A" * 20, flag=0x1 | 0x2 | 0x10 | 0x20 | 0x40,
                 mapq=60, mate_pos0=500),
        ])
        refseq = np.frombuffer(b"A" * 10_000, dtype=np.uint8)
        ref_codes = BASE_TO_ALLELE[refseq]
        base = classify_batch(batch, ref_codes, batch.names)
        flagged = classify_batch(batch, ref_codes, batch.names,
                                 abnormal_as_improper=True)
        assert base[0] != PairClassification.IMPROPER
        assert flagged[0] == PairClassification.IMPROPER
