"""Differential fuzz of the native realigner core (io/_native/realign.cpp
realign_anchor) against the Python GeminiReadRealigner path it ports
(preprocessing/realigner.py _realign_for_anchor/_add_indel/
_reapply_softclips). Every realign() outcome — None-ness, position,
cigar, all summary counters, nified/added positions, sketchy flag,
mismatch-quality sum, accepted indels — must match exactly across
randomized references, indel tables (ins/del, repeats, duplications,
coexisting multis) and reads (carriers, softclips, N edges, mismatches),
for both the default and the probe/mask config variants."""
import random

import numpy as np
import pytest

import conftest  # noqa: F401
from pisces_tpu.preprocessing import realigner as R
from pisces_tpu.preprocessing.indels import HashableIndel
from pisces_tpu.preprocessing.realigner import (
    GemBasicAlignmentComparer, GeminiReadRealigner,
)


def _mk_ref(rng, n=400):
    return "".join(rng.choice("ACGT") for _ in range(n))


def _mk_indel(rng, ref, in_multi=False, other=""):
    pos = rng.randint(40, len(ref) - 60)
    L = rng.randint(1, 6)
    if rng.random() < 0.5:  # deletion
        ref_allele = ref[pos - 1:pos + L]
        alt_allele = ref[pos - 1]
        is_ins = False
    else:
        ref_allele = ref[pos - 1]
        alt_allele = ref[pos - 1] + "".join(
            rng.choice("ACGT") for _ in range(L))
        is_ins = True
    is_repeat = rng.random() < 0.4
    unit = "".join(rng.choice("ACGT")
                   for _ in range(rng.randint(1, 3))) if is_repeat else ""
    return HashableIndel(
        chromosome="chrF", position=pos, ref_allele=ref_allele,
        alt_allele=alt_allele, is_insertion=is_ins, length=L,
        score=rng.randint(1, 100), in_multi=in_multi, other_indel=other,
        is_repeat=is_repeat, repeat_unit=unit,
        is_duplication=rng.random() < 0.2,
        ref_suffix=ref[pos + L:pos + L + 12],
        num_bases_in_ref_suffix_before_unique=rng.randint(0, 8),
        num_approx_dups_left=rng.randint(0, 2) if rng.random() < 0.3 else 0,
        num_approx_dups_right=rng.randint(0, 2) if rng.random() < 0.3 else 0)


def _mk_read(rng, ref, indel):
    """A read overlapping the indel; sometimes a carrier, with optional
    softclips, mismatches, and N edges."""
    rl = rng.randint(40, 90)
    start = max(1, indel.position - rng.randint(5, rl - 10))
    seq = list(ref[start - 1:start - 1 + rl])
    if len(seq) < rl:
        start = len(ref) - rl
        seq = list(ref[start - 1:start - 1 + rl])
    cigar = [(0, rl)]
    if rng.random() < 0.7:  # carrier: apply the indel to the read
        off = indel.position - start
        if 5 <= off < rl - 8:
            if indel.is_insertion:
                ins = indel.alt_allele[1:]
                seq = seq[:off + 1] + list(ins) + seq[off + 1:]
                seq = seq[:rl]
                n_ins = min(len(ins), rl - off - 1)
                rest = rl - off - 1 - n_ins
                if rest > 0:
                    cigar = [(0, off + 1), (1, n_ins), (0, rest)]
                else:
                    cigar = [(0, off + 1), (1, n_ins)]
            else:
                L = indel.length
                seq = seq[:off + 1] + seq[off + 1 + L:]
                ext = ref[start - 1 + rl:start - 1 + rl + L]
                seq += list(ext)
                seq = seq[:rl - max(0, L - len(ext))]
                m2 = len(seq) - off - 1
                if m2 > 0:
                    cigar = [(0, off + 1), (2, L), (0, m2)]
    rl = len(seq)
    # mismatches
    for _ in range(rng.randint(0, 3)):
        i = rng.randrange(rl)
        seq[i] = rng.choice("ACGT")
    # N edges
    if rng.random() < 0.2:
        k = rng.randint(1, 4)
        seq[:k] = ["N"] * k
    if rng.random() < 0.2:
        k = rng.randint(1, 4)
        seq[rl - k:] = ["N"] * k
    # softclip edges (turn M into S at the cigar level)
    if rng.random() < 0.4 and cigar[0][0] == 0 and cigar[0][1] > 10:
        k = rng.randint(2, 8)
        cigar = [(4, k), (cigar[0][0], cigar[0][1] - k)] + cigar[1:]
        for i in range(k):
            seq[i] = rng.choice("ACGTN")
        start += k
    if rng.random() < 0.4 and cigar[-1][0] == 0 and cigar[-1][1] > 10:
        k = rng.randint(2, 8)
        cigar = cigar[:-1] + [(cigar[-1][0], cigar[-1][1] - k), (4, k)]
        for i in range(k):
            seq[rl - 1 - i] = rng.choice("ACGTN")
    quals = [rng.randint(2, 41) for _ in range(rl)]
    return start, cigar, "".join(seq), quals


def _result_tuple(r):
    if r is None:
        return None
    return (r.position, tuple(r.cigar), r.num_matches, r.num_mismatches,
            r.num_mismatches_incl_softclip, r.num_indels,
            r.num_inserted_bases, r.num_deleted_bases, r.num_indel_bases,
            r.num_softclips, r.num_non_n_softclips, r.anchor_length,
            r.sum_of_mismatching_qualities, tuple(r.nified_at),
            tuple(r.indels_added_at), r.is_sketchy,
            tuple(r.accepted_indels))


def _both(realigner, pos1, cigar, seq, quals, indels, ref, **kw):
    assert R._get_realign_native() is not None
    R.USE_NATIVE_REALIGN = True
    try:
        nat = realigner.realign(pos1, list(cigar), seq, list(quals),
                                indels, ref, **kw)
        R.USE_NATIVE_REALIGN = False
        py = realigner.realign(pos1, list(cigar), seq, list(quals),
                               indels, ref, **kw)
    finally:
        R.USE_NATIVE_REALIGN = True
    return nat, py


@pytest.mark.parametrize("config", [
    {},
    {"mask_partial_insertion": True, "minimum_unanchored_insertion_length": 3},
    {"keep_probe_softclips": True},
    {"remask_softclips": False},
])
def test_realign_native_matches_python_fuzz(config):
    if R._get_realign_native() is None:
        pytest.skip("native library unavailable")
    import zlib
    # deterministic per-config seed (str hash() is process-salted and
    # would make fuzz failures unreproducible)
    rng = random.Random(zlib.crc32(repr(sorted(config.items())).encode()))
    realigner = GeminiReadRealigner(GemBasicAlignmentComparer(), **config)
    n_some = 0
    for trial in range(400):
        ref = _mk_ref(rng)
        indels = [_mk_indel(rng, ref)
                  for _ in range(rng.randint(1, 3))]
        if rng.random() < 0.3 and len(indels) >= 2:
            import dataclasses
            i0 = dataclasses.replace(indels[0], in_multi=True,
                                     other_indel=indels[1].string_rep)
            i1 = dataclasses.replace(indels[1], in_multi=True,
                                     other_indel=indels[0].string_rep)
            indels[0], indels[1] = i0, i1
        pos1, cigar, seq, quals = _mk_read(rng, ref, indels[0])
        kw = dict(pair_specific=rng.random() < 0.5,
                  is_reverse=rng.random() < 0.5,
                  is_paired=rng.random() < 0.7)
        nat, py = _both(realigner, pos1, cigar, seq, quals, indels, ref,
                        **kw)
        assert _result_tuple(nat) == _result_tuple(py), (
            trial, config, pos1, cigar, seq,
            [(i.position, i.ref_allele, i.alt_allele) for i in indels],
            _result_tuple(nat), _result_tuple(py))
        if nat is not None:
            n_some += 1
    assert n_some > 40  # the fuzz genuinely exercises realignments


def _indel_corpus(tmp_path, n_reads=8000, chrom_len=15_000, read_len=80,
                  seed=21):
    """BAM with RECURRENT planted indels (40% of spanning reads carry the
    same 2bp deletion / 2bp insertion at shared sites, written with clean
    M cigars + shifted tails) so the evidence bar promotes them to
    realignment targets and the realigner actually runs."""
    import os

    from pisces_tpu.io.bam_write import BamWriter, parse_cigar_string
    from pisces_tpu.io.fasta import create_genome_size_xml, write_fai

    rng = random.Random(seed)
    gdir = tmp_path / "genome"
    gdir.mkdir()
    ref = _mk_ref(rng, chrom_len)
    with open(gdir / "chrR.fa", "w") as f:
        f.write(">chrR\n")
        for i in range(0, chrom_len, 70):
            f.write(ref[i:i + 70] + "\n")
    write_fai(str(gdir / "chrR.fa"))
    create_genome_size_xml(str(gdir))
    sites = [(2000 + k * 1200, k % 2 == 0) for k in range(10)]
    ins_of = {p: "".join(rng.choice("ACGT") for _ in range(2))
              for p, is_ins in sites if is_ins}
    bam = str(tmp_path / "r.bam")
    w = BamWriter(bam, ["chrR"], [chrom_len])
    cig = parse_cigar_string(f"{read_len}M")
    for i in range(n_reads):
        p = rng.randint(1, chrom_len - read_len - 4)
        seq = list(ref[p - 1:p - 1 + read_len])
        cigar = f"{read_len}M"
        for sp, is_ins in sites:
            off = sp - p
            if 10 <= off < read_len - 12 and rng.random() < 0.4:
                if is_ins:
                    seq = (seq[:off + 1] + list(ins_of[sp])
                           + seq[off + 1:])[:read_len]
                    if rng.random() < 0.5:  # properly aligned carrier:
                        # these seed the indel target list
                        cigar = (f"{off + 1}M2I{read_len - off - 3}M")
                else:
                    seq = (seq[:off + 1] + seq[off + 3:]
                           + list(ref[p - 1 + read_len:
                                      p - 1 + read_len + 2]))[:read_len]
                    if rng.random() < 0.5:
                        cigar = (f"{off + 1}M2D{read_len - off - 1}M")
                # else: clean-M misaligned shape — what realignment fixes
                break
        quals = [rng.randint(25, 40) for _ in range(read_len)]
        w.add_read(f"r{i}", "chrR", p, cigar, "".join(seq),
                   qual=quals, flag=0x10 if i & 1 else 0)
    w.write()
    return bam, str(gdir)


def test_realign_native_on_corpus(tmp_path):
    """Full gemini preprocess with realignment forced through BOTH paths
    on a recurrent-indel corpus: the realigner must actually engage, and
    the output BAMs must be byte-identical."""
    if R._get_realign_native() is None:
        pytest.skip("native library unavailable")
    import hashlib

    from pisces_tpu.io.fasta import Genome
    from pisces_tpu.io.native import open_bam
    from pisces_tpu.preprocessing.gemini import (
        GeminiOptions, process_chromosome, run_gemini,
    )

    bam, gdir = _indel_corpus(tmp_path)
    reader = open_bam(bam)
    batch = reader.fetch(ref_id=0, parse_names=True)
    g = Genome(gdir)
    # unpaired corpus: disable the bin-signal site gate so singleton reads
    # actually reach the realigner (the gate exists for paired WGS mess)
    opts = GeminiOptions(use_bin_signal=False)
    _recs, stats = process_chromosome(
        "chrR", g.get_chr_reference("chrR").sequence, batch,
        opts, batch.names)
    assert stats.get("indel_targets", 0) > 0, stats
    assert stats.get("realign_attempts", 0) > 100, stats
    assert stats.get("realigned", 0) > 5, stats
    assert stats.get("confirmed", 0) > 5, stats

    from pisces_tpu.preprocessing.gemini import GeminiOptions as _GO
    out1 = run_gemini(bam, gdir, str(tmp_path / "nat.bam"),
                      options=_GO(use_bin_signal=False))
    h1 = hashlib.sha256(open(out1, "rb").read()).hexdigest()
    R.USE_NATIVE_REALIGN = False
    try:
        out2 = run_gemini(bam, gdir, str(tmp_path / "py.bam"),
                          options=_GO(use_bin_signal=False))
    finally:
        R.USE_NATIVE_REALIGN = True
    h2 = hashlib.sha256(open(out2, "rb").read()).hexdigest()
    assert h1 == h2
