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


def make_locus_update(snv_model, indel_model, output_gvcf: bool = False):
    """Adaptive rewrite of one colocated locus (tools/AdaptiveGenotyper/
    LocusProcessor.cs:15-224): pick the top two alleles by frequency; a
    single variant gets the prefit mixture-model genotype/GQ/GP; a true
    multi-allelic het becomes a crushed 1/2 record with multinomial
    posteriors over both models; hom-ref/ref-no-call loci are deleted
    unless emitting gVCF. chrM stays somatic (untouched)."""
    import numpy as np

    from pisces_tpu.domain.types import AlleleCategory, Genotype, PloidyModel
    from pisces_tpu.io.vcf_read import to_called_alleles
    from pisces_tpu.io.vcf_write import VcfFormatter, VcfWriterConfig
    from pisces_tpu.options import PiscesApplicationOptions

    o = PiscesApplicationOptions()
    o.variant_calling_parameters.ploidy_model = PloidyModel.DIPLOID_BY_ADAPTIVE_GT
    o.validate()
    fmtr = VcfFormatter(VcfWriterConfig(o))

    def model_for(a):
        if a.category in (AlleleCategory.INSERTION, AlleleCategory.DELETION):
            return indel_model
        return snv_model

    def preprocess(a):
        ad = min(a.allele_support, a.total_coverage)
        dp = a.total_coverage
        if a.category == AlleleCategory.REFERENCE:
            ad = a.reference_support
        if dp > adaptive.MAX_EFFECTIVE_DEPTH:
            ad = int(ad / dp * adaptive.MAX_EFFECTIVE_DEPTH)
            dp = adaptive.MAX_EFFECTIVE_DEPTH
        return ad, dp

    def update_genotype(a, cat):
        if cat == 0 or a.category == AlleleCategory.REFERENCE:
            a.genotype = Genotype.HOMOZYGOUS_REF
        elif cat == 1:
            a.genotype = Genotype.HETEROZYGOUS_ALT_REF
        else:
            a.genotype = Genotype.HOMOZYGOUS_ALT

    def format_locus(variants):
        first = variants[0]
        total_depth = fmtr.get_depth_count(variants)
        fmt, smp = fmtr.construct_format_and_sample(variants, total_depth)
        if len(variants) == 1:
            ref_s, alt_s = fmtr.uncrushed_ref_and_alt(first)
        else:
            ref_s, alt_s = fmtr.merge_crushed_ref_and_alt(variants)
        if first.genotype in (Genotype.HOMOZYGOUS_REF,
                              Genotype.REF_LIKE_NOCALL,
                              Genotype.REF_AND_NOCALL):
            alt_s = "."
        joint_q = min(v.variant_qscore for v in variants)
        return (f"{first.chromosome}\t{first.position}\t.\t{ref_s}\t{alt_s}\t"
                f"{joint_q}\t{fmtr.map_filters(variants)}\t"
                f"DP={total_depth}\t{fmt}\t{smp}")

    def update(group: List[VcfVariant]):
        if group[0].chrom.lower() in ("chrm", "mt"):
            return None  # chrM stays somatic (GetPloidyForThisChr)
        alleles = [a for v in group for a in to_called_alleles(v)]
        if not alleles:
            return None
        variants = [a for a in alleles
                    if a.category != AlleleCategory.REFERENCE]
        # GetTopTwoAlleles: keep the second only if it beats the ref vf
        if len(variants) >= 2:
            variants.sort(key=lambda a: -a.frequency)
            ref_vf = 1.0 - sum(a.frequency for a in variants)
            ordered = variants[:2] if ref_vf <= variants[1].frequency \
                else [variants[0]]
        elif variants:
            ordered = [variants[0]]
        else:
            ordered = [alleles[0]]

        if len(ordered) == 1:
            a = ordered[0]
            means, priors = model_for(a)
            ad, dp = preprocess(a)
            cat, q, gp = adaptive.calculate_q_and_posteriors(
                ad, dp, means, priors)
            update_genotype(a, cat)
            a.genotype_qscore = q
            a.genotype_posteriors = gp
            out = [a]
        else:
            a1, a2 = ordered
            means1, _p1 = model_for(a1)
            cat, _q, _gp = adaptive.calculate_q_and_posteriors(
                *preprocess(a1), *model_for(a1))
            if cat != 1:
                update_genotype(a1, cat)
                _c2, q, gp = adaptive.calculate_q_and_posteriors(
                    *preprocess(a1), *model_for(a1))
                a1.genotype_qscore = q
                a1.genotype_posteriors = gp
                out = [a1]
            else:
                dp = a1.total_coverage
                ad2 = a1.allele_support
                ad1 = a2.allele_support
                ad0 = dp - ad1 - ad2
                if ad0 < 0:
                    ad0 = 0
                    dp = ad1 + ad2
                q, gp = adaptive.get_multinomial_qscores(
                    np.array([ad0, ad1, ad2]), dp,
                    [model_for(a1)[0], model_for(a2)[0]])
                for a in (a1, a2):
                    a.genotype = Genotype.HETEROZYGOUS_ALT1_ALT2
                    a.genotype_qscore = q
                    a.genotype_posteriors = gp
                out = [a1, a2]

        if not output_gvcf and out[0].genotype in (
                Genotype.HOMOZYGOUS_REF, Genotype.REF_LIKE_NOCALL):
            return []  # DeleteCompletely
        return [format_locus(out)]

    return update


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

    update = make_locus_update(snv_model, indel_model,
                               output_gvcf=vcf_path.endswith(".genome.vcf"))

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
    p.add_argument("-log", default=None, help="log file name base")
    p.add_argument("-o", "--out", "-outfolder", dest="out", default=None)
    p.add_argument("-models", default=None)
    p.add_argument("-backend", default="numpy", choices=["numpy", "jax"])
    args = p.parse_args(argv)
    recalibrate(args.vcf, args.out, args.models, use_jax=args.backend == "jax")
    return 0


if __name__ == "__main__":
    sys.exit(main())
