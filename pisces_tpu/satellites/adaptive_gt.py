"""AdaptiveGenotyper tool: two-pass germline re-genotyper.

Port of src/tools/AdaptiveGenotyper (Program.cs:10-55, Recalibration.cs:1-104,
VariantReader.cs): reads a Pisces gVCF, fits the binomial MixtureModel to
(AD, DP) observations genome-wide (separately for SNVs and indels), and
rewrites GT/GQ/GP per locus.
"""
from __future__ import annotations

import argparse
import os
import sys
from typing import Dict, List, Optional, Tuple

import numpy as np

from pisces_tpu.domain.types import AlleleCategory
from pisces_tpu.genotype import adaptive
from pisces_tpu.io.vcf_read import (
    VcfVariant, classify, read_header_and_variants, trim_trailing_bases,
    update_vcf_loci_by_loci,
)

GT_STRINGS = {0: "0/0", 1: "0/1", 2: "1/1"}


def _variant_kind(ref: str, alt: str) -> str:
    if alt == ".":
        return "none"
    cat = classify(ref, alt)
    if cat in (AlleleCategory.SNV, AlleleCategory.MNV):
        return "snv"
    if cat in (AlleleCategory.INSERTION, AlleleCategory.DELETION):
        return "indel"
    return "none"


def _observation(v: VcfVariant) -> Optional[Tuple[str, int, int]]:
    """(kind, ad, dp) for a usable locus (VariantReader semantics:
    skip LowDepth, skip forced, use alt support for variants and non-ref
    count for reference loci)."""
    if "LowDP" in v.filters or "ForcedReport" in v.filters:
        return None
    gts = v.genotypes
    try:
        dp = int(gts.get("DP", v.info_fields.get("DP", "0")) or 0)
    except ValueError:
        return None
    if dp == 0:
        return None
    ad = gts.get("AD", "").split(",")
    alt = v.alt_allele.split(",")[0]
    kind = _variant_kind(v.ref_allele, alt)
    if kind == "none":
        # reference line: observation is the non-ref count
        try:
            ref_support = int(ad[0]) if ad and ad[0] else 0
        except ValueError:
            return None
        k = max(dp - ref_support, 0)
        if dp > 0 and k / dp < 0.02:
            pass  # still counted (hom-ref cluster)
        return ("snv", k, dp)
    try:
        k = int(ad[1]) if len(ad) > 1 else 0
    except ValueError:
        return None
    return (kind, k, dp)


def collect_observations(vcf_path: str):
    snv_ad, snv_dp, indel_ad, indel_dp = [], [], [], []
    _, variants = read_header_and_variants(vcf_path)
    last_pos = None
    for v in variants:
        if (v.chrom, v.position) == last_pos:
            continue  # multiallelic: only first allele counted
        last_pos = (v.chrom, v.position)
        obs = _observation(v)
        if obs is None:
            continue
        kind, ad, dp = obs
        ad = min(ad, dp)
        if dp > adaptive.MAX_EFFECTIVE_DEPTH:
            ad = int(ad / dp * adaptive.MAX_EFFECTIVE_DEPTH)
            dp = adaptive.MAX_EFFECTIVE_DEPTH
        if kind == "snv":
            snv_ad.append(ad)
            snv_dp.append(dp)
        else:
            indel_ad.append(ad)
            indel_dp.append(dp)
    return (np.array(snv_ad), np.array(snv_dp),
            np.array(indel_ad), np.array(indel_dp))


def write_model_file(path: str, models) -> None:
    with open(path, "w") as f:
        for means, weights in models:
            f.write(",".join(str(x) for x in means) + "\n")
            f.write(",".join(str(x) for x in weights) + "\n")


def read_model_file(path: str):
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append([float(x) for x in line.split(",")])
    if len(rows) not in (2, 4):
        raise ValueError("Invalid model file")
    models = [(np.array(rows[0]), np.array(rows[1]))]
    if len(rows) == 4:
        models.append((np.array(rows[2]), np.array(rows[3])))
    return models


def recalibrate(vcf_path: str, out_dir: Optional[str] = None,
                model_file: Optional[str] = None, use_jax: bool = False) -> str:
    out_dir = out_dir or os.path.dirname(vcf_path)
    os.makedirs(out_dir, exist_ok=True)
    snv_ad, snv_dp, indel_ad, indel_dp = collect_observations(vcf_path)

    if model_file:
        models = read_model_file(model_file)
        snv_model = models[0]
        indel_model = models[1] if len(models) > 1 else models[0]
    else:
        if use_jax:
            snv_model = adaptive.fit_mixture_model_jax(snv_ad, snv_dp)
            indel_model = (adaptive.fit_mixture_model_jax(indel_ad, indel_dp)
                           if len(indel_ad) > 10 else snv_model)
        else:
            fit = adaptive.fit_mixture_model(snv_ad, snv_dp)
            snv_model = (fit.means, fit.weights)
            if len(indel_ad) > 10:
                ifit = adaptive.fit_mixture_model(indel_ad, indel_dp)
                indel_model = (ifit.means, ifit.weights)
            else:
                indel_model = snv_model
        write_model_file(
            os.path.join(out_dir,
                         os.path.basename(vcf_path).replace(".vcf", ".model")),
            [snv_model, indel_model])

    out_path = os.path.join(out_dir,
                            os.path.basename(vcf_path) + ".recal")

    def update(group: List[VcfVariant]):
        changed = False
        out_lines = []
        for v in group:
            obs = _observation(v)
            if obs is None:
                out_lines.append(v.raw_line)
                continue
            kind, ad, dp = obs
            ad = min(ad, dp)
            if dp > adaptive.MAX_EFFECTIVE_DEPTH:
                ad = int(ad / dp * adaptive.MAX_EFFECTIVE_DEPTH)
                dp = adaptive.MAX_EFFECTIVE_DEPTH
            means, priors = snv_model if kind == "snv" else indel_model
            cat, q, gp = adaptive.calculate_q_and_posteriors(ad, dp, means, priors)
            fields = v.raw_line.split("\t")
            fmt_keys = v.format.split(":")
            smp = v.sample.split(":")
            kv = dict(zip(fmt_keys, smp))
            is_ref_line = v.alt_allele == "."
            gt = GT_STRINGS[0 if is_ref_line and cat == 0 else cat]
            if is_ref_line and cat != 0:
                gt = "./."  # ref line that no longer looks hom-ref
            kv["GT"] = gt
            kv["GQ"] = str(q)
            new_fmt = fmt_keys + (["GP"] if "GP" not in fmt_keys else [])
            kv["GP"] = ",".join(f"{x:.2f}" for x in gp)
            fields[8] = ":".join(new_fmt)
            fields[9] = ":".join(kv.get(k, ".") for k in new_fmt)
            out_lines.append("\t".join(fields))
            changed = True
        return out_lines if changed else None

    def header_fn(line: str):
        if line.startswith("#CHROM"):
            return ('##FORMAT=<ID=GP,Number=G,Type=Float,Description='
                    '"Genotype Posterior">\n' + line)
        return line

    update_vcf_loci_by_loci(vcf_path, out_path, update, header_fn)
    return out_path


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="adaptive-gt")
    p.add_argument("-vcf", required=True)
    p.add_argument("-o", "--out", default=None)
    p.add_argument("-models", default=None)
    p.add_argument("-backend", default="numpy", choices=["numpy", "jax"])
    args = p.parse_args(argv)
    recalibrate(args.vcf, args.out, args.models, use_jax=args.backend == "jax")
    return 0


if __name__ == "__main__":
    sys.exit(main())
