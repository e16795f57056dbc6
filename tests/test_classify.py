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
