"""No-call fraction semantics (port of NoCallFunctionalTests.Fraction,
Pisces.Tests/FunctionalTests/NoCallFunctionalTests.cs:21-76): N bases at a
variant position count toward FractionNoCalls but not coverage; reference
rows accumulate their own no-call fractions."""
import numpy as np
import pytest

from pisces_tpu.calling.caller import (
    AlleleCaller, CallerConfig, make_reference_candidates,
)
from pisces_tpu.calling.source import AlleleSource
from pisces_tpu.domain.types import AlleleCategory
from pisces_tpu.pileup.candidates import find_candidates_batch
from pisces_tpu.pileup.counts import (
    build_counts_host, candidate_anchor_positions,
)
from pisces_tpu.pileup.events import build_base_events

from util import make_batch, refseq

CHR_SEQ = "ACTCTACTAAGGGGGGACTATCCCG"  # 25 bp


def _reads(specs):
    reads = []
    for copies, p1, s1, p2, s2 in specs:
        for _ in range(copies):
            reads.append({"pos1": p1, "cigar": "6M", "seq": s1, "qual": 30})
            reads.append({"pos1": p2, "cigar": "6M", "seq": s2, "qual": 30})
    return make_batch(reads)


def _call(batch, gvcf: bool):
    ref = refseq(CHR_SEQ)
    keep = np.ones(batch.n, bool)
    candidates, _ = find_candidates_batch("chr", ref, batch, keep, 20)
    ap = candidate_anchor_positions(candidates)
    ev = build_base_events(batch, keep, 20, 5)
    pc = build_counts_host(ev, anchor_size=5, anchored_positions=ap)
    if gvcf:
        candidates = candidates + make_reference_candidates("chr", ref, pc)
    cfg = CallerConfig(min_coverage=0, min_depth_to_genotype=0,
                       low_depth_filter=0,
                       include_reference_calls=gvcf)
    caller = AlleleCaller(cfg, ref)
    by_pos = caller.call(candidates, AlleleSource(pc))
    return [a for alleles in by_pos.values() for a in alleles]


def test_fraction_no_calls():
    # no no-calls, 1 snp (T>C at position 3)
    specs = [(50, 1, "ACTCTA", 20, "ATCCCG"),
             (25, 1, "ACCCTA", 20, "ATCCCG")]
    alleles = _call(_reads(specs), gvcf=False)
    assert len(alleles) == 1
    v = alleles[0]
    assert v.fraction_no_calls == 0
    assert v.total_coverage == 75

    # add no-calls at the snp position
    specs.append((10, 1, "ACNCTA", 20, "ATCCCG"))
    alleles = _call(_reads(specs), gvcf=False)
    assert len(alleles) == 1
    v = alleles[0]
    assert v.total_coverage == 75
    assert v.fraction_no_calls == pytest.approx(np.float32(10) / 85)

    # add no-calls at a reference position (gVCF mode)
    specs.append((40, 1, "ACTCTN", 20, "ATCCCG"))
    alleles = _call(_reads(specs), gvcf=True)
    assert len(alleles) == 12
    variants = [a for a in alleles if a.category != AlleleCategory.REFERENCE]
    assert len(variants) == 1
    assert variants[0].total_coverage == 115
    assert variants[0].fraction_no_calls == pytest.approx(np.float32(10) / 125)
    for ref_allele in alleles:
        if ref_allele.category != AlleleCategory.REFERENCE:
            continue
        expected = (np.float32(40) / 125
                    if ref_allele.position == 6 else 0.0)
        assert ref_allele.fraction_no_calls == pytest.approx(expected)
