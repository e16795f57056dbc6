"""Synthetic read-batch builders: the fake-extractor equivalent of the
reference's TestUtilities/MockAlignmentExtractor (feed synthetic reads into
the full caller without BAMs)."""
import re

import numpy as np

from pisces_tpu.domain.types import BASE_TO_ALLELE
from pisces_tpu.io.bam import CIGAR_OPS, OP_CONSUMES_REF, ReadBatch

_CIG_RE = re.compile(r"(\d+)([MIDNSHP=X])")


def parse_cigar(cigar: str):
    ops, lens = [], []
    for ln, op in _CIG_RE.findall(cigar):
        ops.append(CIGAR_OPS.index(op))
        lens.append(int(ln))
    return np.array(ops, dtype=np.uint8), np.array(lens, dtype=np.int32)


def make_batch(reads):
    """reads: list of dicts with keys pos1 (1-based), cigar, seq, qual
    (int or list), flag (default 0 fwd), mapq (default 30)."""
    n = len(reads)
    ref_id = np.zeros(n, dtype=np.int32)
    pos = np.zeros(n, dtype=np.int32)
    mapq = np.zeros(n, dtype=np.uint8)
    flag = np.zeros(n, dtype=np.uint16)
    cigar_off = np.zeros(n + 1, dtype=np.int64)
    seq_off = np.zeros(n + 1, dtype=np.int64)
    end_pos = np.zeros(n, dtype=np.int32)
    ops_l, lens_l, seq_l, qual_l = [], [], [], []
    for i, r in enumerate(reads):
        ops, lens = parse_cigar(r["cigar"])
        seq = np.frombuffer(r["seq"].encode(), dtype=np.uint8)
        codes = BASE_TO_ALLELE[seq]
        q = r.get("qual", 30)
        if isinstance(q, int):
            q = np.full(len(seq), q, dtype=np.uint8)
        else:
            q = np.asarray(q, dtype=np.uint8)
        pos[i] = r["pos1"] - 1
        mapq[i] = r.get("mapq", 30)
        flag[i] = r.get("flag", 0)
        ops_l.append(ops)
        lens_l.append(lens)
        seq_l.append(codes)
        qual_l.append(q)
        cigar_off[i + 1] = cigar_off[i] + len(ops)
        seq_off[i + 1] = seq_off[i] + len(seq)
        ref_span = int(lens[OP_CONSUMES_REF[ops]].sum()) if len(ops) else 0
        end_pos[i] = pos[i] + max(ref_span, 1) - 1
    return ReadBatch(
        n=n, ref_id=ref_id, pos=pos, mapq=mapq, flag=flag,
        cigar_off=cigar_off,
        cigar_ops=np.concatenate(ops_l) if n else np.empty(0, np.uint8),
        cigar_lens=np.concatenate(lens_l) if n else np.empty(0, np.int32),
        seq_off=seq_off,
        seq=np.concatenate(seq_l) if n else np.empty(0, np.int8),
        qual=np.concatenate(qual_l) if n else np.empty(0, np.uint8),
        end_pos=end_pos)


def refseq(s: str) -> np.ndarray:
    return np.frombuffer(s.encode(), dtype=np.uint8)
