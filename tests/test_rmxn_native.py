"""Differential test: native RMxN scan (io/_native/stitch.cpp
rmxn_min_component) vs the Python reference port in calling/repeats.py."""
import random

import numpy as np
import pytest

from pisces_tpu.calling.repeats import (
    RefSeqStr, compute_component_rmxn_lengths,
)
from pisces_tpu.domain.types import AlleleCategory


def _native_available() -> bool:
    rs = RefSeqStr(np.frombuffer(b"ACGTACGT", np.uint8))
    return rs.rmxn_min_component(AlleleCategory.SNV, 2, "C", "G", 5) is not None


pytestmark = pytest.mark.skipif(not _native_available(),
                                reason="native rmxn not built")


def test_native_matches_python_fuzz():
    rng = random.Random(7)
    bases = "ACGT"
    seq = "".join(rng.choice(bases) for _ in range(5000))
    # inject tandem repeats so the scan loops actually iterate
    seq = (seq[:1000] + "ACACACACACACAC" + seq[1000:2000] + "TTTTTTTTTT"
           + seq[2000:3000] + "AGGAGGAGGAGG" + seq[3000:])
    rs = RefSeqStr(np.frombuffer(seq.encode(), np.uint8))
    for t in range(8000):
        pos = rng.randint(2, len(seq) - 30)
        cat = rng.choice([AlleleCategory.SNV, AlleleCategory.MNV,
                          AlleleCategory.INSERTION, AlleleCategory.DELETION])
        if cat == AlleleCategory.SNV:
            ref, alt = seq[pos - 1], rng.choice(bases)
        elif cat == AlleleCategory.MNV:
            n = rng.randint(2, 4)
            ref = seq[pos - 1:pos - 1 + n]
            alt = "".join(rng.choice(bases) for _ in range(n))
        elif cat == AlleleCategory.INSERTION:
            ref = seq[pos - 1]
            alt = ref + "".join(rng.choice(bases)
                                for _ in range(rng.randint(1, 5)))
        else:
            n = rng.randint(1, 5)
            ref = seq[pos - 1:pos - 1 + n + 1]
            alt = seq[pos - 1]
        mu = rng.choice([3, 5, 8])
        m_native = rs.rmxn_min_component(cat, pos, ref, alt, mu)
        c1, c2 = compute_component_rmxn_lengths(cat, pos, ref, alt, rs, mu)
        assert m_native == min(c1, c2), (t, cat, pos, ref, alt, mu)


def test_repeat_site_filters():
    """Deleting one AC unit inside a long AC repeat hits RMxN (unit repeats
    >= min_repetitions); the same deletion in unique sequence does not."""
    from pisces_tpu.calling.repeats import rmxn_should_filter
    seq = "GATTACAGATC" + "AC" * 20 + "GGTCCATTGCA"
    rs = RefSeqStr(np.frombuffer(seq.encode(), np.uint8))
    # 1-based: pos 11 is the C before the AC run; delete the first AC unit
    assert rmxn_should_filter(AlleleCategory.DELETION, 11, "CAC", "C",
                              0.05, rs, 5, 9, 0.35)
    # unique context: delete TT after pos 3 (GAT|TA...)
    assert not rmxn_should_filter(AlleleCategory.DELETION, 3, "TTA", "T",
                                  0.05, rs, 5, 9, 0.35)
    # frequency at/above the limit bypasses the filter entirely
    assert not rmxn_should_filter(AlleleCategory.DELETION, 11, "CAC", "C",
                                  0.35, rs, 5, 9, 0.35)
