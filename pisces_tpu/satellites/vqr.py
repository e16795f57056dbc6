"""VariantQualityRecalibration (VQR).

Port of exe/VariantQualityRecalibration: pass 1 counts mutation-category
rates (FFPE C>T, oxidation G>T, ...) and amplicon-edge suspects from the vcf
(SignatureSorter.cs:39-110, MutationCounter.cs, EdgeIssueCountData.cs); pass
2 z-scores each category against the trimmed-mean baseline and rewrites
variant q-scores (QualityRecalibration.cs:26-380).
"""
from __future__ import annotations

import argparse
import math
import os
import sys
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from pisces_tpu.domain.types import AlleleCategory
from pisces_tpu.ops import stats
from pisces_tpu.io.vcf_read import (
    VcfVariant, classify, parse_vcf_line, read_header_and_variants,
    trim_trailing_bases, update_vcf_loci_by_loci,
)

SNV_CATEGORIES = ["AtoC", "AtoG", "AtoT", "CtoA", "CtoG", "CtoT",
                  "GtoA", "GtoC", "GtoT", "TtoA", "TtoC", "TtoG"]
ALL_CATEGORIES = SNV_CATEGORIES + ["Reference", "Deletion", "Insertion", "Other"]


def mutation_category(ref: str, alt: str, filters: str = "") -> str:
    """MutationCounter.GetMutationCategory."""
    if "ForcedReport" in filters:
        return "Other"
    cat = classify(*trim_trailing_bases(ref, alt)) if alt != "." else AlleleCategory.REFERENCE
    if cat == AlleleCategory.REFERENCE:
        return "Reference"
    if cat == AlleleCategory.DELETION:
        return "Deletion"
    if cat == AlleleCategory.INSERTION:
        return "Insertion"
    if cat == AlleleCategory.SNV:
        name = f"{ref}to{alt}"
        for c in SNV_CATEGORIES:
            if c.lower() == name.lower():
                return c
    return "Other"


@dataclass
class CountData:
    counts_by_category: Dict[str, float] = field(
        default_factory=lambda: {c: 0.0 for c in ALL_CATEGORIES})
    num_possible_variants: float = 0.0

    @property
    def total_mutations(self) -> float:
        return sum(v for k, v in self.counts_by_category.items()
                   if k != "Reference")

    @property
    def observed_mutation_rate(self) -> float:
        if self.num_possible_variants == 0:
            return 0.0
        return self.total_mutations / self.num_possible_variants

    def add(self, category: str) -> bool:
        self.num_possible_variants += 1
        if category != "Reference":
            self.counts_by_category[category] += 1
            return True
        return False


@dataclass
class _BufferedAllele:
    chrom: str
    position: int
    total_coverage: int
    ref: str
    alt: str


class EdgeIssueCountData(CountData):
    """Trailing-window amplicon-edge detection (EdgeIssueCountData.cs)."""

    def __init__(self, extent: int):
        super().__init__()
        self.counts_by_category = {c: 0.0 for c in ALL_CATEGORIES}
        self.num_possible_variants = 0.0
        self.extent = extent
        self.buffer: List[Optional[_BufferedAllele]] = [None] * (2 * extent + 1)
        self.test_index = extent
        self.suspects: Dict[str, List[int]] = {}

    @staticmethod
    def detect_edge(test_index: int, buf: List[Optional[_BufferedAllele]]) -> bool:
        test = buf[test_index]
        if test is None or test.total_coverage == 0:
            return False
        for i, b in enumerate(buf):
            if i == test_index:
                continue
            if b is None:
                return True
            if b.total_coverage < 0.5 * test.total_coverage:
                return True
            if b.chrom != test.chrom:
                return True
            dist = test.position - b.position
            max_allowed = test_index - i
            if max_allowed > 0:
                if dist > max_allowed:
                    return True
            else:
                if dist < max_allowed:
                    return True
        return False

    def add(self, allele: Optional[_BufferedAllele]) -> None:
        self.buffer.pop(0)
        self.buffer.append(allele)
        if self.detect_edge(self.test_index, self.buffer):
            test = self.buffer[self.test_index]
            cat = mutation_category(test.ref, test.alt)
            self.num_possible_variants += 1
            if cat != "Reference":
                self.counts_by_category[cat] += 1
                self.suspects.setdefault(test.chrom, []).append(test.position)


def strain_vcf(vcf_path: str, extent: int = 4, loci_count: int = -1):
    """Pass 1: returns (basic CountData, EdgeIssueCountData)."""
    basic = CountData()
    edge = EdgeIssueCountData(extent)
    _, variants = read_header_and_variants(vcf_path)
    for v in variants:
        for alt in v.alt_allele.split(","):
            if alt in ("<M>", "*"):
                continue
            ref_t, alt_t = (v.ref_allele, alt) if alt == "." else \
                trim_trailing_bases(v.ref_allele, alt)
            cat = mutation_category(ref_t, alt_t, v.filters)
            basic.add(cat)
            dp = int(v.genotypes.get("DP", v.info_fields.get("DP", "0")) or 0)
            edge.add(_BufferedAllele(v.chrom, v.position, dp, ref_t, alt_t))
    for _ in range(extent):
        edge.add(None)
    if loci_count > 0:
        basic.num_possible_variants = loci_count
        edge.num_possible_variants = min(edge.num_possible_variants, loci_count)
    return basic, edge


def write_counts_file(path: str, counts: CountData) -> None:
    with open(path, "w") as f:
        f.write("\nCountsByCategory\n")
        for cat, v in counts.counts_by_category.items():
            f.write(f"{cat}\t{v}\n")
        f.write("\nAllPossibleVariants\t%s\n" % counts.num_possible_variants)
        f.write("VariantsCountedTowardEstimate\t%s\n" % counts.total_mutations)
        f.write("MismatchEstimate(%%)\t%.4f\n" % (counts.observed_mutation_rate * 100))


def read_counts_file(path: str) -> CountData:
    counts = CountData()
    with open(path) as f:
        in_counts = False
        for line in f:
            line = line.strip()
            if line == "CountsByCategory":
                in_counts = True
                continue
            if not line:
                in_counts = False
                continue
            parts = line.split("\t")
            if in_counts and len(parts) == 2:
                counts.counts_by_category[parts[0]] = float(parts[1])
            elif parts[0] == "AllPossibleVariants":
                counts.num_possible_variants = float(parts[1])
    return counts


def get_phred_scaled_calibrated_rates(baseline_q: int, z_factor: float,
                                      counts: CountData) -> Dict[str, int]:
    """GetPhredScaledCalibratedRates: trimmed-mean z-test over the 12 SNV
    categories; over-threshold categories get a phred-scaled noise rate."""
    base_noise = float(stats.q_to_p(baseline_q))
    snv_counts = {c: counts.counts_by_category[c] for c in SNV_CATEGORIES}
    sorted_counts = sorted(snv_counts.values())
    if len(snv_counts) != 12:
        return {}
    trimmed = sorted_counts[2:10]
    avg = sum(trimmed) / 8.0
    var = sum((avg - x) ** 2 for x in trimmed) / 8.0
    threshold = avg + z_factor * math.sqrt(var)
    out = {}
    for cat, count in snv_counts.items():
        if count > threshold:
            observed = (count / counts.num_possible_variants
                        if counts.num_possible_variants > 0 else 0.0)
            out[cat] = int(stats.p_to_q(observed + base_noise))  # floor
    return out


def get_edge_risk_rates(baseline_q: int, warn_threshold: float,
                        basic: CountData, edge: CountData) -> Dict[str, int]:
    """GetPhredScaledCalibratedRatesForEdges."""
    out = {}
    muts_not_edge = basic.total_mutations - edge.total_mutations
    loci_not_edge = basic.num_possible_variants - edge.num_possible_variants
    if loci_not_edge <= 0 or edge.total_mutations <= 0:
        return out
    rate_not_edge = muts_not_edge / loci_not_edge
    null_expected = rate_not_edge * edge.num_possible_variants
    probably_wrong = edge.total_mutations - null_expected
    est_error_rate = probably_wrong / edge.total_mutations
    for cat in edge.counts_by_category:
        proportion = edge.counts_by_category[cat] / edge.total_mutations
        est_by_cat = proportion * est_error_rate
        if est_by_cat > 0:
            out[cat] = int(stats.p_to_q(est_by_cat))
    return out


def _parse_sample_fields(v: VcfVariant):
    return v.format.split(":"), v.sample.split(":")


def _update_line(v: VcfVariant, rates: Dict[str, int], max_q: int,
                 filter_q: int, subsample: bool) -> Optional[str]:
    """UpdateVariantQScoreAndRefilter applied to one SNV line."""
    cat = mutation_category(v.ref_allele, v.alt_allele, v.filters)
    if cat not in rates:
        return None
    gts = v.genotypes
    try:
        orig_q = int(float(v.quality))
    except ValueError:
        return None
    if orig_q < 1:
        return None
    depth = float(gts.get("DP", v.info_fields.get("DP", "0")) or 0)
    ad = gts.get("AD", "").split(",")
    call_count = float(ad[1]) if len(ad) > 1 else 0.0

    rate = rates[cat]
    denominator = float(stats.q_to_p(rate))
    sub_to = 1.0 / denominator if denominator > 0 else 0.0
    if rate == 0 or denominator == 0:
        subsample = False
    if subsample and depth > sub_to:
        call_count = call_count * sub_to / depth
        depth = sub_to

    new_q = int(stats.assign_poisson_qscore(
        np.array([int(call_count)]), np.array([int(depth)]), rate,
        min(orig_q, max_q))[0])

    fields = v.raw_line.split("\t")
    fields[5] = str(new_q)
    fmt_keys, smp_vals = _parse_sample_fields(v)
    for i, k in enumerate(fmt_keys):
        if k == "NL" and i < len(smp_vals):
            smp_vals[i] = str(rate)
        if k == "GQ" and i < len(smp_vals):
            smp_vals[i] = str(new_q)
    fields[9] = ":".join(smp_vals)
    if new_q < filter_q:
        q_tag = f"q{filter_q}"
        existing = fields[6]
        if q_tag not in existing.split(";"):
            fields[6] = q_tag if existing in ("PASS", ".") else existing + ";" + q_tag
    return "\t".join(fields)


def recalibrate_vcf(vcf_path: str, out_dir: Optional[str] = None,
                    z_factor: float = 2.0, max_q: int = 100,
                    filter_q: int = 30, baseline_q: int = 20,
                    do_basic: bool = True, do_edge: bool = False,
                    extent: int = 4, loci_count: int = -1,
                    align_warn_threshold: float = 10.0) -> str:
    out_dir = out_dir or os.path.dirname(vcf_path)
    os.makedirs(out_dir, exist_ok=True)
    basic, edge = strain_vcf(vcf_path, extent, loci_count)

    stem = os.path.basename(vcf_path)
    write_counts_file(os.path.join(out_dir, stem.replace(".vcf", ".counts")),
                      basic)
    if do_edge:
        write_counts_file(os.path.join(out_dir, stem.replace(".vcf", ".edgecounts")),
                          edge)

    basic_rates = get_phred_scaled_calibrated_rates(baseline_q, z_factor, basic) \
        if do_basic else {}
    edge_rates = get_edge_risk_rates(baseline_q, align_warn_threshold, basic,
                                     edge) if (do_basic and do_edge) else {}

    out_path = os.path.join(out_dir, stem + ".recal")

    def update(group: List[VcfVariant]):
        changed = False
        out_lines = []
        for v in group:
            line = None
            # skip refs / non-SNVs / forced (CanSkipVcfLine)
            if (v.alt_allele != "." and len(v.ref_allele) == 1
                    and len(v.alt_allele) == 1
                    and "forcedreport" not in v.filters.lower()):
                if do_basic and basic_rates:
                    line = _update_line(v, basic_rates, max_q, filter_q, False)
                if (do_edge and edge_rates
                        and v.position in edge.suspects.get(v.chrom, [])):
                    base = parse_vcf_line(line) if line else v
                    l2 = _update_line(base, edge_rates, max_q, filter_q, True)
                    line = l2 or line
            if line is not None:
                changed = True
                out_lines.append(line)
            else:
                out_lines.append(v.raw_line)
        return out_lines if changed else None

    update_vcf_loci_by_loci(vcf_path, out_path, update)
    return out_path


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="vqr",
                                description="variant quality recalibration")
    p.add_argument("-vcf", required=True)
    p.add_argument("-o", "--out", default=None)
    p.add_argument("-z", "--ZFactor", type=float, default=2.0)
    p.add_argument("-maxqscore", type=int, default=100)
    p.add_argument("-f", "--filterQScore", type=int, default=30)
    p.add_argument("-b", "--baseQNoise", type=int, default=20)
    p.add_argument("-doedgecounts", default="false")
    p.add_argument("-extentofedgeregion", type=int, default=4)
    p.add_argument("-locicount", type=int, default=-1)
    args = p.parse_args(argv)
    recalibrate_vcf(args.vcf, args.out, args.ZFactor, args.maxqscore,
                    args.filterQScore, args.baseQNoise,
                    do_edge=args.doedgecounts.lower() == "true",
                    extent=args.extentofedgeregion, loci_count=args.locicount)
    return 0


if __name__ == "__main__":
    sys.exit(main())
