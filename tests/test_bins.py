"""Bin-signal gating + silencing (preprocessing/bins.py) tests.

Semantics under test are the reference's BinEvidence/BinConclusions/
UsableBins (Gemini/BinSignalCollection/*) and
AggregateRegionProcessor.ReadsToSilence.
"""
import numpy as np

from pisces_tpu.preprocessing.bins import (
    BinSignalOptions, compute_bin_conclusions, reads_to_silence,
)
from pisces_tpu.preprocessing.classify import PairClassification as PC


def _spans(n, start, width=100):
    starts = np.full(n, start, np.int64)
    return starts, starts + width


def test_usable_requires_mess_and_indel_target():
    # 10 bins of 500bp; depth 10 in bin 4 with 1 messy-indel pair per 10
    opts = BinSignalOptions()
    s, e = _spans(10, 4 * 500 + 10)
    cls = np.full(10, int(PC.UNSTITCH_PERFECT), np.int32)
    cls[0] = int(PC.UNSTITCH_MESSY_INDEL)  # messy AND indel type
    # no indel target -> unusable everywhere
    c = compute_bin_conclusions(5000, s, e, cls, np.array([]), opts)
    assert not c.usable.any()
    assert c.is_messy_enough[3:6].all()  # dilated +-1 around bin 4
    # with a target inside bin 4 -> usable bins 2..6 (two dilations)
    c = compute_bin_conclusions(5000, s, e, cls,
                                np.array([4 * 500 + 100]), opts)
    assert c.usable[3:6].all() and c.usable[2] and c.usable[6]
    assert not c.usable[0] and not c.usable[8]


def test_depth_threshold_gates_messy():
    opts = BinSignalOptions()
    s, e = _spans(4, 100)  # depth 4 < RegionDepthThreshold 5
    cls = np.full(4, int(PC.UNSTITCH_MESSY_INDEL), np.int32)
    c = compute_bin_conclusions(1000, s, e, cls, np.array([150]), opts)
    assert not c.usable.any()
    s, e = _spans(5, 100)
    cls = np.full(5, int(PC.UNSTITCH_MESSY_INDEL), np.int32)
    c = compute_bin_conclusions(1000, s, e, cls, np.array([150]), opts)
    assert c.usable.any()


def test_frequency_thresholds():
    opts = BinSignalOptions()
    # 99 clean reads + 1 indel pair read: pctIndel=0.01 but
    # pctMessy+pctIndel = 0.01 < ImperfectFreqThreshold 0.03 -> clean
    s, e = _spans(100, 50)
    cls = np.full(100, int(PC.UNSTITCH_PERFECT), np.int32)
    cls[0] = int(PC.UNSTITCH_INDEL)
    c = compute_bin_conclusions(1000, s, e, cls, np.array([100]), opts)
    assert not c.usable.any()
    # 3 indel reads out of 100: pctIndel=0.03 >= 0.01, pctMessy+pctIndel
    # >= 0.03 -> messy bin
    cls[:3] = int(PC.UNSTITCH_INDEL)
    c = compute_bin_conclusions(1000, s, e, cls, np.array([100]), opts)
    assert c.usable.any()


def test_non_collect_depth_uses_site_threshold():
    opts = BinSignalOptions(collect_depth=False, messy_site_threshold=2)
    s, e = _spans(3, 100)
    cls = np.array([int(PC.UNSTITCH_MESSY), int(PC.UNSTITCH_PERFECT),
                    int(PC.UNSTITCH_PERFECT)], np.int32)
    c = compute_bin_conclusions(1000, s, e, cls, np.array([150]), opts)
    assert not c.is_messy_enough.any()  # 1 messy hit < threshold 2
    cls[1] = int(PC.UNSTITCH_MESSY)
    c = compute_bin_conclusions(1000, s, e, cls, np.array([150]), opts)
    assert c.is_messy_enough.any()


def test_read_spanning_bins_counts_both():
    opts = BinSignalOptions(region_depth_threshold=1,
                            imperfect_freq_threshold=0.0,
                            indel_region_freq_threshold=0.0)
    starts = np.array([450], np.int64)  # spans bins 0 and 1
    ends = np.array([560], np.int64)
    cls = np.array([int(PC.UNSTITCH_MESSY_INDEL)], np.int32)
    c = compute_bin_conclusions(1500, starts, ends, cls, np.array([]), opts)
    assert c.is_messy_enough[0] and c.is_messy_enough[1]


def test_directional_mess_status_and_silencing():
    opts = BinSignalOptions()
    # one bin: >3 messy hits, all forward-messy -> fwd fraction 1.0 > 0.2
    s, e = _spans(10, 100)
    cls = np.full(10, int(PC.UNSTITCH_FORWARD_MESSY), np.int32)
    c = compute_bin_conclusions(1000, s, e, cls, np.array([]), opts)
    assert c.fwd_messy[0] and not c.rev_messy[0]

    pos0 = {0: 100, 1: 200}
    # forward-messy pair: only the forward mate is silenced
    out = reads_to_silence(int(PC.UNSTITCH_FORWARD_MESSY), 0, 1,
                           lambda k: pos0[k], c, True, False)
    assert out == {0}
    # silencing disabled -> nothing
    out = reads_to_silence(int(PC.UNSTITCH_FORWARD_MESSY), 0, 1,
                           lambda k: pos0[k], c, False, False)
    assert out == set()
    # reverse-messy category in a fwd-only messy bin -> no silencing
    out = reads_to_silence(int(PC.UNSTITCH_REVERSE_MESSY), 0, 1,
                           lambda k: pos0[k], c, True, False)
    assert out == set()


def test_mapq_mess_silences_both():
    opts = BinSignalOptions()
    s, e = _spans(10, 100)
    cls = np.full(10, int(PC.UNSTITCH_MESSY_SUSPICIOUS_READ), np.int32)
    c = compute_bin_conclusions(1000, s, e, cls, np.array([]), opts)
    assert c.mapq_messy[0]
    pos0 = {0: 100, 1: 200}
    out = reads_to_silence(int(PC.UNSTITCH_MESSY_SUSPICIOUS_READ), 0, 1,
                           lambda k: pos0[k], c, False, True)
    assert out == {0, 1}


def test_gemini_pipeline_gating_and_silencing(tmp_path):
    """End-to-end: silencing zeroes quals of the messy un-realigned mate."""
    from pisces_tpu.io.bam import BamReader
    from pisces_tpu.io.bam_write import BamWriter
    from pisces_tpu.preprocessing.gemini import GeminiOptions, run_gemini

    period = "ACGTATGGCTA"
    seq = (period * 60)[:600]
    gdir = tmp_path / "genome"
    gdir.mkdir()
    with open(gdir / "chr1.fa", "w") as f:
        f.write(">chr1\n" + seq + "\n")
    with open(gdir / "chr1.fa.fai", "w") as f:
        f.write(f"chr1\t{len(seq)}\t6\t{len(seq)}\t{len(seq) + 1}\n")
    with open(gdir / "GenomeSize.xml", "w") as f:
        f.write('<sequenceSizes genomeName="t">\n'
                f'\t<chromosome fileName="chr1.fa" contigName="chr1" '
                f'totalBases="{len(seq)}" isCircular="false" md5="x" '
                'ploidy="2" knownBases="600" />\n</sequenceSizes>')

    bam = str(tmp_path / "in.bam")
    w = BamWriter(bam, ["chr1"], [len(seq)])
    # forward-messy pairs: R1 (fwd) has 5 mismatches, R2 (rev) clean
    r1 = list(seq[0:40])
    for k in (3, 9, 15, 21, 27):
        r1[k] = "A" if r1[k] != "A" else "C"
    r1 = "".join(r1)
    for i in range(6):
        w.add_read(f"p{i}", "chr1", 1, "40M", r1, flag=0x1 | 0x2 | 0x40,
                   mapq=60)
        w.add_read(f"p{i}", "chr1", 61, "40M", seq[60:100],
                   flag=0x1 | 0x2 | 0x80 | 0x10, mapq=60)
    w.write()

    out = run_gemini(bam, str(gdir), str(tmp_path / "out.bam"),
                     GeminiOptions(stitch_pairs=False, realign=True,
                                   silence_directional_mess_reads=True))
    rb = BamReader(out)
    batch = rb.fetch(0)
    assert batch.n == 12
    # forward mates (pos 0) silenced; reverse mates untouched
    fwd = np.asarray(batch.pos) == 0
    q = batch.qual
    for i in range(batch.n):
        quals = q[batch.seq_off[i]:batch.seq_off[i + 1]]
        if fwd[i]:
            assert (quals == 0).all(), "forward messy mate must be silenced"
        else:
            assert (quals > 0).all()
