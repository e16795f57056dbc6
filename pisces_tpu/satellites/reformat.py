"""ReformatVcf: crush <-> uncrush VCF rewriting.

Port of src/tools/ReformatVcf/Reformat.cs:12-62 via the streaming updater:
crush merges co-located alt lines into one record (VcfFormatter.
MergeCrushedReferenceAndAlt semantics); uncrush splits them back out.
"""
from __future__ import annotations

import argparse
import os
import sys
from typing import List

from pisces_tpu.io.vcf_read import (
    VcfVariant, trim_trailing_bases, update_vcf_loci_by_loci,
)


def _crush_group(group: List[VcfVariant]) -> List[str]:
    variant_lines = [v for v in group if v.alt_allele != "."]
    if len(variant_lines) < 2:
        return None  # nothing to crush
    ref_max = max((v.ref_allele for v in variant_lines), key=len)
    alts = []
    for v in variant_lines:
        rep = v.alt_allele
        if len(ref_max) != len(v.ref_allele):
            rep += ref_max[len(v.ref_allele):]
        alts.append(rep)
    first = variant_lines[0]
    qual = min(int(float(v.quality)) for v in variant_lines
               if v.quality not in (".", ""))
    filters = []
    for v in variant_lines:
        for f in v.filters.split(";"):
            if f and f != "PASS" and f not in filters:
                filters.append(f)
    gts = first.genotypes
    gq = min(int(float(v.genotypes.get("GQ", "0") or 0)) for v in variant_lines)
    ads = [v.genotypes.get("AD", "0,0").split(",") for v in variant_lines]
    ref_support = ads[0][0] if ads and ads[0] else "0"
    alt_supports = [a[1] if len(a) > 1 else "0" for a in ads]
    dp = gts.get("DP", first.info_fields.get("DP", "0"))
    vfs = [v.genotypes.get("VF", "0") for v in variant_lines]
    try:
        vf_sum = sum(float(x) for x in vfs)
        digits = max(len(x.split(".")[-1]) for x in vfs if "." in x)
        vf_str = f"{vf_sum:.{digits}f}"
    except ValueError:
        vf_str = vfs[0]

    fmt_keys = first.format.split(":")
    smp = dict(zip(fmt_keys, first.sample.split(":")))
    smp["GT"] = "1/2"
    smp["GQ"] = str(gq)
    smp["AD"] = ",".join(alt_supports)
    smp["VF"] = vf_str
    if "DP" in smp:
        smp["DP"] = dp
    sample = ":".join(smp.get(k, ".") for k in fmt_keys)
    line = "\t".join([
        first.chrom, str(first.position), first.id, ref_max, ",".join(alts),
        str(qual), ";".join(filters) if filters else "PASS",
        f"DP={dp}", first.format, sample])
    return [line] + [v.raw_line for v in group if v.alt_allele == "."]


def _uncrush_group(group: List[VcfVariant]) -> List[str]:
    out = []
    changed = False
    for v in group:
        alts = v.alt_allele.split(",")
        if len(alts) < 2:
            out.append(v.raw_line)
            continue
        changed = True
        gts = v.genotypes
        ad = gts.get("AD", "").split(",")
        fmt_keys = v.format.split(":")
        for i, alt in enumerate(alts):
            if alt in ("<M>", "*"):
                continue
            ref_t, alt_t = trim_trailing_bases(v.ref_allele, alt)
            smp = dict(zip(fmt_keys, v.sample.split(":")))
            smp["GT"] = "0/1" if len(alts) > 1 else smp.get("GT", "./.")
            if len(ad) > i:
                # crushed AD lists per-alt supports
                dp = gts.get("DP", v.info_fields.get("DP", "0"))
                try:
                    ref_support = max(int(dp) - sum(int(x) for x in ad), 0)
                except ValueError:
                    ref_support = 0
                smp["AD"] = f"{ref_support},{ad[i]}"
            sample = ":".join(smp.get(k, ".") for k in fmt_keys)
            out.append("\t".join([
                v.chrom, str(v.position), v.id, ref_t, alt_t, v.quality,
                v.filters, v.info, v.format, sample]))
    return out if changed else None


def reformat(in_path: str, out_path: str, crush: bool) -> str:
    update = _crush_group if crush else _uncrush_group
    update_vcf_loci_by_loci(in_path, out_path, update)
    return out_path


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="reformat-vcf")
    p.add_argument("-vcf", required=True)
    p.add_argument("-log", default=None, help="log file name base")
    p.add_argument("-crush", default=None, help="true to crush, false to uncrush")
    p.add_argument("-o", "--out", default=None)
    args = p.parse_args(argv)
    crush = (args.crush or "true").lower() == "true"
    out_dir = args.out or os.path.dirname(args.vcf)
    os.makedirs(out_dir, exist_ok=True)
    suffix = ".crushed.vcf" if crush else ".uncrushed.vcf"
    out = os.path.join(out_dir,
                       os.path.basename(args.vcf).replace(".vcf", suffix))
    reformat(args.vcf, out, crush)
    return 0


if __name__ == "__main__":
    sys.exit(main())
