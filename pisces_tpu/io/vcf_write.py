"""VCF/gVCF emission.

Header and record layout mirror the reference writer exactly
(src/lib/Pisces.IO/VcfFileWriter.cs:39-141, VcfFormatter.cs:14-133):
FORMAT = GT:GQ:AD:DP:VF[:NL:SB][:NC][:GP][:US], crushed vs multi-line modes,
filter strings, and .NET-style numeric formatting (round half away from zero).
"""
from __future__ import annotations

import datetime
import decimal
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

from pisces_tpu.domain.types import (
    AlleleCategory, FilterType, Genotype,
)
from pisces_tpu.calling.alleles import CalledAllele

PASS_FILTER = "PASS"
UNSPECIFIED_ALLELE = "<M>"
MIN_SB_SCORE = -100.0
MAX_SB_SCORE = 0.0


def dotnet_format(value: float, decimals: int) -> str:
    """C# double.ToString("0.000"-style): round half away from zero."""
    if value != value:  # NaN
        return "NaN"
    if value == float("inf"):
        return "Infinity"
    if value == float("-inf"):
        return "-Infinity"
    q = decimal.Decimal(1).scaleb(-decimals)
    d = decimal.Decimal(value).quantize(q, rounding=decimal.ROUND_HALF_UP)
    return f"{d:.{decimals}f}"


class VcfWriterConfig:
    """Derived writer configuration (VcfFileWriter.cs VcfWriterConfig ctor)."""

    def __init__(self, options=None, has_forced_gt: bool = False):
        from pisces_tpu.options import PiscesApplicationOptions
        options = options or PiscesApplicationOptions()
        options.validate()
        v = options.variant_calling_parameters
        o = options.vcf_writing_parameters
        self.depth_filter_threshold: Optional[int] = (
            v.minimum_coverage if o.output_gvcf_file
            else (v.low_depth_filter if (v.low_depth_filter or 0) > v.minimum_coverage
                  else None))
        self.indel_repeat_filter_threshold = (
            v.indel_repeat_filter if (v.indel_repeat_filter or 0) > 0 else None)
        self.variant_quality_filter_threshold = v.minimum_variant_qscore_filter
        self.genotype_quality_filter_threshold = (
            v.low_genotype_quality_filter
            if (v.low_genotype_quality_filter is not None
                and v.minimum_variant_qscore_filter > v.minimum_variant_qscore)
            else None)
        self.strand_bias_filter_threshold = (
            v.strand_bias_acceptance_criteria
            if v.strand_bias_acceptance_criteria < 1 else None)
        self.amplicon_bias_filter_threshold = (
            v.amplicon_bias_filter_threshold
            if (v.amplicon_bias_filter_threshold or 0) > 0 else None)
        self.frequency_filter_threshold = (
            v.minimum_frequency_filter
            if v.minimum_frequency_filter > v.minimum_frequency else None)
        from pisces_tpu.domain.types import PloidyModel
        if v.ploidy_model == PloidyModel.DIPLOID_BY_ADAPTIVE_GT:
            self.frequency_filter_threshold = v.minimum_frequency
        self.min_frequency_threshold = v.minimum_frequency
        self.should_output_no_call_fraction = o.report_no_calls
        self.should_output_strand_bias_and_noise_level = (
            options.debug_mode or options.output_bias_files
            or v.strand_bias_acceptance_criteria < 1)
        self.should_filter_only_one_strand_coverage = (
            v.filter_out_variants_present_only_one_strand)
        self.estimated_base_call_quality = v.noise_level_used_for_q_scoring
        self.should_output_rc_counts = o.report_rc_counts
        self.should_output_ts_counts = o.report_ts_counts
        self.allow_multiple_vcf_lines_per_loci = o.allow_multiple_vcf_lines_per_loci
        self.ploidy_model = v.ploidy_model
        self.rmxn_filter_max_length_repeat = v.rmxn_filter_max_length_repeat
        self.rmxn_filter_min_repetitions = v.rmxn_filter_min_repetitions
        self.should_report_gp = o.report_gp
        self.no_call_filter_threshold = v.no_call_filter_threshold
        self.should_output_suspicious_coverage_fraction = (
            o.report_suspicious_coverage_fraction)
        self.should_output_probe_bias = False
        self.has_forced_gt = has_forced_gt
        self.probe_pool_bias_filter_threshold = None

        # frequency significant figures (VcfFormatter.UpdateFrequencyFormat)
        def sig_digits(s: str) -> int:
            if "E" in s or "e" in s:
                return abs(int(s.lower().split("e")[1]))
            return len(s) - 1
        digits = sig_digits(_csharp_float_str(self.min_frequency_threshold))
        if self.frequency_filter_threshold is not None:
            digits = max(digits, sig_digits(_csharp_float_str(self.frequency_filter_threshold)))
        self.freq_decimals = digits


def _csharp_float_str(x: float) -> str:
    """float.ToString() approximation (shortest round-trip)."""
    s = repr(float(f"{x:.7g}"))
    if s.endswith(".0"):
        s = s[:-2]
    return s


class VcfFormatter:
    def __init__(self, config: VcfWriterConfig):
        self.config = config

    def frequency_filter_threshold_string(self) -> str:
        c = self.config
        if c.frequency_filter_threshold is None:
            return ""
        return dotnet_format(c.frequency_filter_threshold, c.freq_decimals)

    def generate_filter_strings(self) -> Dict[FilterType, str]:
        """GenerateFilterStringsByType (VcfFormatter.cs:73-133)."""
        c = self.config
        out: Dict[FilterType, str] = {}
        if c.variant_quality_filter_threshold is not None:
            out[FilterType.LOW_VARIANT_QSCORE] = (
                f"##FILTER=<ID=q{c.variant_quality_filter_threshold},"
                f"Description=\"Quality score less than "
                f"{c.variant_quality_filter_threshold}\">")
        if c.amplicon_bias_filter_threshold is not None:
            out[FilterType.AMPLICON_BIAS] = (
                "##FILTER=<ID=AB,Description=\"Amplicon bias - disparate variant "
                "frequencies detected by amplicon\">")
        if c.depth_filter_threshold is not None:
            out[FilterType.LOW_DEPTH] = (
                "##FILTER=<ID=LowDP,Description=\"Low coverage (DP tag), "
                "therefore no genotype called\">")
        if (c.strand_bias_filter_threshold is not None
                and c.should_filter_only_one_strand_coverage):
            out[FilterType.STRAND_BIAS] = (
                "##FILTER=<ID=SB,Description=\"Variant strand bias too high or "
                "coverage on only one strand\">")
        elif c.strand_bias_filter_threshold is not None:
            out[FilterType.STRAND_BIAS] = (
                "##FILTER=<ID=SB,Description=\"Variant strand bias too high\">")
        elif c.should_filter_only_one_strand_coverage:
            out[FilterType.STRAND_BIAS] = (
                "##FILTER=<ID=SB,Description=\"Variant support on only one strand\">")
        if c.frequency_filter_threshold is not None:
            out[FilterType.LOW_VARIANT_FREQUENCY] = (
                f"##FILTER=<ID=LowVariantFreq,Description=\"Variant frequency "
                f"less than {self.frequency_filter_threshold_string()}\">")
        if c.genotype_quality_filter_threshold is not None:
            out[FilterType.LOW_GENOTYPE_QUALITY] = (
                f"##FILTER=<ID=LowGQ,Description=\"Genotype Quality less than "
                f"{c.genotype_quality_filter_threshold}\">")
        if c.indel_repeat_filter_threshold is not None:
            out[FilterType.INDEL_REPEAT_LENGTH] = (
                f"##FILTER=<ID=R{c.indel_repeat_filter_threshold},Description="
                f"\"Indel repeat greater than or equal to "
                f"{c.indel_repeat_filter_threshold}\">")
        from pisces_tpu.domain.types import PloidyModel
        if c.ploidy_model in (PloidyModel.DIPLOID_BY_THRESHOLDING,
                              PloidyModel.DIPLOID_BY_ADAPTIVE_GT):
            out[FilterType.MULTI_ALLELIC_SITE] = (
                "##FILTER=<ID=MultiAllelicSite,Description=\"Variant does not "
                "conform to diploid model\">")
        if (c.rmxn_filter_max_length_repeat is not None
                and c.rmxn_filter_min_repetitions is not None):
            out[FilterType.RMXN] = (
                f"##FILTER=<ID=R{c.rmxn_filter_max_length_repeat}x"
                f"{c.rmxn_filter_min_repetitions},Description=\"Repeats of part or "
                f"all of the variant allele (max repeat length "
                f"{c.rmxn_filter_max_length_repeat}) in the reference greater than "
                f"or equal to {c.rmxn_filter_min_repetitions}\">")
        if c.has_forced_gt:
            out[FilterType.FORCED_REPORT] = (
                "##FILTER=<ID=ForcedReport,Description=\"Variants is called "
                "because it is one of forced genotype alleles\">")
            if c.depth_filter_threshold is None:
                out[FilterType.LOW_DEPTH] = (
                    "##FILTER=<ID=LowDP,Description=\"Low coverage (DP tag), "
                    "therefore no genotype called\">")
            if c.frequency_filter_threshold is None:
                out[FilterType.LOW_VARIANT_FREQUENCY] = (
                    f"##FILTER=<ID=LowVariantFreq,Description=\"Variant frequency "
                    f"less than "
                    f"{dotnet_format(c.min_frequency_threshold, c.freq_decimals)}\">")
        if (c.no_call_filter_threshold is not None
                and c.no_call_filter_threshold != 1.0):
            out[FilterType.NO_CALL] = (
                f"##FILTER=<ID=NC,Description=\"No-call rate is above "
                f"{_csharp_float_str(c.no_call_filter_threshold)}\">")
        return out

    def map_filter(self, f: FilterType) -> str:
        c = self.config
        if f == FilterType.LOW_VARIANT_QSCORE:
            return f"q{c.variant_quality_filter_threshold}"
        if f == FilterType.STRAND_BIAS:
            return "SB"
        if f == FilterType.POOL_BIAS:
            return "PB"
        if f == FilterType.AMPLICON_BIAS:
            return "AB"
        if f == FilterType.LOW_DEPTH:
            return "LowDP"
        if f == FilterType.LOW_VARIANT_FREQUENCY:
            return "LowVariantFreq"
        if f == FilterType.LOW_GENOTYPE_QUALITY:
            return "LowGQ"
        if f == FilterType.INDEL_REPEAT_LENGTH:
            return f"R{c.indel_repeat_filter_threshold}"
        if f == FilterType.RMXN:
            return (f"R{c.rmxn_filter_max_length_repeat}x"
                    f"{c.rmxn_filter_min_repetitions}")
        if f == FilterType.MULTI_ALLELIC_SITE:
            return "MultiAllelicSite"
        if f == FilterType.FORCED_REPORT:
            return "ForcedReport"
        if f == FilterType.NO_CALL:
            return "NC"
        if f == FilterType.UNKNOWN:
            return "Other"
        return ""

    def map_filters(self, variants: Sequence[CalledAllele]) -> str:
        seen = []
        for v in variants:
            for f in v.filters:
                if f not in seen:
                    seen.append(f)
        s = ";".join(self.map_filter(f) for f in seen)
        return s if s else PASS_FILTER

    def get_depth_count(self, variants: Sequence[CalledAllele]) -> int:
        """GetDepthCountInt (VcfFormatter.cs)."""
        first = variants[0]
        if first.is_ref_type:
            total_depth = first.reference_support
        else:
            total_depth = first.reference_support + first.allele_support
        total_variant_reads = 0
        for v in variants:
            total_depth = max(total_depth, max(v.total_coverage, total_depth))
            total_variant_reads += v.allele_support
        return max(total_depth, total_variant_reads)

    def _frequency_string(self, variants: Sequence[CalledAllele],
                          is_reference: bool, total_depth: int) -> str:
        first = variants[0]
        d = self.config.freq_decimals
        if is_reference:
            if first.total_coverage == 0:
                return dotnet_format(0.0, d)
            return dotnet_format(1.0 - first.frequency, d)
        gt = first.genotype
        if gt in (Genotype.HETEROZYGOUS_ALT1_ALT2, Genotype.ALT12_LIKE_NOCALL):
            if total_depth == 0:
                # C# double 0/0 -> NaN, printed "NaN" (VcfFormatter.cs:345)
                return dotnet_format(float("nan"), d)
            s = sum(v.allele_support / total_depth for v in variants)
            return dotnet_format(s, d)
        return dotnet_format(first.frequency, d)

    def _allele_count_string(self, variants: Sequence[CalledAllele],
                             is_reference: bool, total_depth: int) -> str:
        first = variants[0]
        if is_reference:
            return str(first.allele_support)
        gt = first.genotype
        if gt in (Genotype.HETEROZYGOUS_ALT1_ALT2, Genotype.ALT12_LIKE_NOCALL,
                  Genotype.OTHERS):
            if len(variants) > 1:
                return ",".join(str(v.allele_support) for v in variants)
            other = total_depth - first.allele_support - first.reference_support
            if first.phase_set_index == 1 or gt == Genotype.OTHERS:
                return f"{first.reference_support},{first.allele_support},{other}"
            return f"{first.reference_support},{other},{first.allele_support}"
        return f"{first.reference_support},{first.allele_support}"

    def construct_format_and_sample(self, variants: Sequence[CalledAllele],
                                    total_depth: int) -> Tuple[str, str]:
        c = self.config
        first = variants[0]
        gt_quality = min(v.genotype_qscore for v in variants)
        gt_string = first.genotype_str()
        is_reference = first.is_ref_type

        fmt = ["GT", "GQ", "AD", "DP", "VF"]
        smp = [gt_string, str(gt_quality),
               self._allele_count_string(variants, is_reference, total_depth),
               str(total_depth),
               self._frequency_string(variants, is_reference, total_depth)]

        if c.should_output_strand_bias_and_noise_level:
            sb = min(max(MIN_SB_SCORE, first.strand_bias_gatk), MAX_SB_SCORE)
            fmt += ["NL", "SB"]
            smp += [str(first.noise_level_applied), dotnet_format(sb, 4)]

        if c.should_output_no_call_fraction:
            fmt.append("NC")
            smp.append(dotnet_format(first.fraction_no_calls, 4))

        if c.should_report_gp and first.genotype_posteriors is not None:
            fmt.append("GP")
            smp.append(",".join(dotnet_format(float(x), 2)
                                for x in first.genotype_posteriors))

        if c.should_output_rc_counts:
            import numpy as _np
            from pisces_tpu.domain.types import ReadCollapsedType as _R
            mut = first.read_collapsed_counts_mut
            tot = first.read_collapsed_count_total
            mut = mut if mut is not None else _np.zeros(8, _np.int64)
            tot = tot if tot is not None else _np.zeros(8, _np.int64)
            if c.should_output_ts_counts:
                order = [_R.DUPLEX_STITCHED, _R.DUPLEX_NON_STITCHED,
                         _R.SIMPLEX_FORWARD_STITCHED,
                         _R.SIMPLEX_FORWARD_NON_STITCHED,
                         _R.SIMPLEX_REVERSE_STITCHED,
                         _R.SIMPLEX_REVERSE_NON_STITCHED]
            else:
                order = [_R.DUPLEX_STITCHED, _R.DUPLEX_NON_STITCHED,
                         _R.SIMPLEX_STITCHED, _R.SIMPLEX_NON_STITCHED]
            fmt.append("US")
            smp.append(",".join([str(int(mut[int(t)])) for t in order]
                                + [str(int(tot[int(t)])) for t in order]))

        if c.should_output_suspicious_coverage_fraction:
            sc = ";".join(
                f"{v.confident_coverage_start},{v.suspicious_coverage_start},"
                f"{v.confident_coverage_end},{v.suspicious_coverage_end},"
                f"{v.allele_support},{v.well_anchored_support},"
                f"{_csharp_float_str(v.unanchored_coverage_weight)}"
                for v in variants)
            fmt.append("SC")
            smp.append(sc)

        return ":".join(fmt), ":".join(smp)

    def uncrushed_ref_and_alt(self, v: CalledAllele) -> Tuple[str, str]:
        ref, alt = v.ref_allele, v.alt_allele
        if v.genotype in (Genotype.HETEROZYGOUS_ALT1_ALT2,
                          Genotype.ALT12_LIKE_NOCALL, Genotype.OTHERS):
            if v.phase_set_index == 1 or v.genotype == Genotype.OTHERS:
                alt = v.alt_allele + "," + UNSPECIFIED_ALLELE
            else:
                alt = UNSPECIFIED_ALLELE + "," + v.alt_allele
        return ref, alt

    def merge_crushed_ref_and_alt(self, variants: Sequence[CalledAllele]
                                  ) -> Tuple[str, str]:
        ref_max = ""
        for v in variants:
            if len(v.ref_allele) > len(ref_max):
                ref_max = v.ref_allele
        alts = []
        for v in variants:
            rep = v.alt_allele
            if len(ref_max) != len(v.ref_allele):
                rep += ref_max[len(v.ref_allele):]
            alts.append(rep)
        return ref_max, ",".join(alts)


class VcfWriter:
    """Streaming VCF writer (uncrushed + crushed modes)."""

    def __init__(self, path: str, config: VcfWriterConfig,
                 reference_name: str, sample_name: str,
                 contigs: Optional[Iterable[Tuple[str, int]]] = None,
                 command_line: str = "", source_name: str = "Pisces 5.2.11.163",
                 file_date: Optional[str] = None):
        self.path = path
        self.config = config
        self.formatter = VcfFormatter(config)
        self._fh = open(path, "w", newline="\n")
        self._reference_name = reference_name
        self._sample_name = sample_name
        self._contigs = list(contigs) if contigs else None
        self._command_line = command_line
        self._source_name = source_name
        self._file_date = file_date or datetime.date.today().strftime("%Y%m%d")
        self._last_position_written = 0

    def write_header(self) -> None:
        c = self.config
        w = self._fh.write
        w("##fileformat=VCFv4.1\n")
        w(f"##fileDate={self._file_date}\n")
        w(f"##source={self._source_name}\n")
        name = self._source_name.split(" ")[0]
        w(f"##{name}_cmdline=\"{self._command_line}\"\n")
        w(f"##reference={self._reference_name}\n")
        w("##ALT=<ID=<M>,Description=\"There is an overlapping other allele that "
          "has been called in a separate VCF record\">\n")
        w("##INFO=<ID=DP,Number=1,Type=Integer,Description=\"Total Depth\">\n")
        for line in self.formatter.generate_filter_strings().values():
            w(line + "\n")
        w("##FORMAT=<ID=GT,Number=1,Type=String,Description=\"Genotype\">\n")
        w("##FORMAT=<ID=GQ,Number=1,Type=Integer,Description=\"Genotype Quality\">\n")
        w("##FORMAT=<ID=AD,Number=.,Type=Integer,Description=\"Allele Depth\">\n")
        w("##FORMAT=<ID=DP,Number=1,Type=Integer,Description=\"Total Depth Used "
          "For Variant Calling\">\n")
        w("##FORMAT=<ID=VF,Number=.,Type=Float,Description=\"Variant Frequency\">\n")
        if c.should_output_suspicious_coverage_fraction:
            w("##FORMAT=<ID=SC,Number=.,Type=String,Description=\"Suspicious "
              "coverage statistics: (confident start coverage, suspicious start "
              "coverage, confident end coverage, suspicious end coverage, "
              "variant-specific suspicious coverage weighting factor\">\n")
        if c.should_output_strand_bias_and_noise_level:
            w("##FORMAT=<ID=NL,Number=1,Type=Integer,Description=\"Applied "
              "BaseCall Noise Level\">\n")
            w("##FORMAT=<ID=SB,Number=1,Type=Float,Description=\"StrandBias "
              "Score\">\n")
        if c.should_output_no_call_fraction:
            w("##FORMAT=<ID=NC,Number=1,Type=Float,Description=\"Fraction of "
              "bases which were uncalled or with basecall quality below the "
              "minimum threshold\">\n")
        if c.should_report_gp:
            w("##FORMAT=<ID=GP,Number=G,Type=Float,Description=\"Genotype "
              "Posterior\">\n")
        if c.should_output_rc_counts:
            w("##FORMAT=<ID=US,Number=.,Type=Integer,Description=\"Supporting "
              "read type counts\">\n")
        if self._contigs:
            for name, length in self._contigs:
                w(f"##contig=<ID={name},length={length}>\n")
        w("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
          f"{self._sample_name}\n")

    def write_colocated(self, variants: List[CalledAllele]) -> None:
        """WriteListOfColocatedAlleles."""
        if not variants:
            return
        self._last_position_written = variants[0].position
        fmtr = self.formatter
        total_depth = fmtr.get_depth_count(variants)
        joint_q = min(v.variant_qscore for v in variants)
        first = variants[0]
        fmt, smp = fmtr.construct_format_and_sample(variants, total_depth)
        if len(variants) == 1:
            ref_s, alt_s = fmtr.uncrushed_ref_and_alt(first)
        else:
            ref_s, alt_s = fmtr.merge_crushed_ref_and_alt(variants)
        if (not first.is_forced_to_report
                and first.genotype in (Genotype.HOMOZYGOUS_REF,
                                       Genotype.REF_LIKE_NOCALL,
                                       Genotype.REF_AND_NOCALL,
                                       Genotype.HEMIZYGOUS_NOCALL,
                                       Genotype.HEMIZYGOUS_REF)):
            alt_s = "."
        self._fh.write(
            f"{first.chromosome}\t{first.position}\t.\t{ref_s}\t{alt_s}\t"
            f"{joint_q}\t{fmtr.map_filters(variants)}\tDP={total_depth}\t"
            f"{fmt}\t{smp}\n")

    def write(self, alleles: Iterable[CalledAllele], region_mapper=None) -> None:
        if self.config.allow_multiple_vcf_lines_per_loci:
            for a in alleles:
                self._pad_if_needed(a.position, region_mapper)
                self.write_colocated([a])
        else:
            group: List[CalledAllele] = []
            for a in alleles:
                if not group or (a.position == group[0].position
                                 and a.chromosome == group[0].chromosome):
                    group.append(a)
                else:
                    self._pad_if_needed(group[0].position, region_mapper)
                    self.write_colocated(group)
                    group = [a]
            if group:
                self._pad_if_needed(group[0].position, region_mapper)
                self.write_colocated(group)

    def _pad_if_needed(self, position: int, region_mapper) -> None:
        """gVCF interval padding (VcfFileWriter.PadIfNeeded)."""
        if region_mapper is None:
            return
        if (self._last_position_written == 0
                or self._last_position_written + 1 < position):
            while True:
                nocall = region_mapper.get_next_empty_call(
                    self._last_position_written + 1, position - 1)
                if nocall is None:
                    break
                self.write_colocated([nocall])

    def write_remaining(self, region_mapper=None) -> None:
        if region_mapper is None:
            return
        while True:
            nocall = region_mapper.get_next_empty_call(
                self._last_position_written + 1, None)
            if nocall is None:
                break
            self.write_colocated([nocall])
        self._last_position_written = 0

    def close(self) -> None:
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
