"""UMI collapsed read-type tests."""
import numpy as np
import pytest

from pisces_tpu.domain.types import DirectionType, ReadCollapsedType as R
from pisces_tpu.pileup import collapsed

F = int(DirectionType.FORWARD)
S = int(DirectionType.STITCHED)


class TestCollapsedTypes:
    def test_duplex(self):
        assert collapsed.collapsed_type(S, True, "FR") == int(R.DUPLEX_STITCHED)
        assert collapsed.collapsed_type(F, True, "FR") == int(R.DUPLEX_NON_STITCHED)

    def test_simplex(self):
        assert collapsed.collapsed_type(S, False, "FR") == int(R.SIMPLEX_FORWARD_STITCHED)
        assert collapsed.collapsed_type(S, False, "RF") == int(R.SIMPLEX_REVERSE_STITCHED)
        assert collapsed.collapsed_type(F, False, "FR") == int(R.SIMPLEX_FORWARD_NON_STITCHED)
        assert collapsed.collapsed_type(F, False, "RF") == int(R.SIMPLEX_REVERSE_NON_STITCHED)

    def test_non_proper_pairs_ignored(self):
        assert collapsed.collapsed_type(F, False, "FF") is None
        assert collapsed.collapsed_type(F, False, None) is None

    def test_candidate_counts_double_bump(self):
        c = collapsed.candidate_collapsed_counts(F, False, "FR")
        assert c[int(R.SIMPLEX_NON_STITCHED)] == 1
        assert c[int(R.SIMPLEX_FORWARD_NON_STITCHED)] == 1
        assert c.sum() == 2
        c = collapsed.candidate_collapsed_counts(S, True, "FR")
        assert c[int(R.DUPLEX_STITCHED)] == 1
        assert c.sum() == 1

    def test_is_duplex(self):
        assert collapsed.is_duplex({"XV": 2, "XW": 1})
        assert not collapsed.is_duplex({"XV": 2, "XW": 0})
        assert not collapsed.is_duplex({"XV": 0})
        assert not collapsed.is_duplex(None)

    def test_pair_direction_from_flags(self):
        # proper pair, forward, first mate -> FR
        assert collapsed.pair_direction(0x1 | 0x2 | 0x40, None) == "FR"
        # proper pair, reverse, first mate -> RF
        assert collapsed.pair_direction(0x1 | 0x2 | 0x10 | 0x40, None) == "RF"
        # XR wins
        assert collapsed.pair_direction(0, "FR") == "FR"


class TestUmIRoundTrip:
    def test_bam_tags_roundtrip(self, tmp_path):
        from pisces_tpu.io.bam_write import BamWriter
        from pisces_tpu.io.bam import BamReader
        bam = str(tmp_path / "umi.bam")
        w = BamWriter(bam, ["chr1"], [100])
        w.add_read("r1", "chr1", 10, "5M", "ACGTA",
                   tags={"XR": "FR", "XD": "5S"})
        w.write()
        rb = BamReader(bam)
        batch = rb.fetch(0, parse_tags=True)
        assert batch.extra_tags[0].get("XR") == "FR"
        assert batch.xd_tags[0] == "5S"


class TestCollapsedTotalAssignment:
    """CollapsedCoverageCalculator.cs:18-36 — spanning alleles read the
    per-position collapsed totals at the spanning START position
    (deletion: pos+1 per CoverageCalculator.cs:32; MNV/ins/SNV/ref: pos)."""

    def _allele(self, cat, pos=100):
        from pisces_tpu.calling.alleles import CalledAllele
        from pisces_tpu.domain.types import AlleleCategory
        ref = {"DELETION": "ACT", "INSERTION": "A", "MNV": "AC",
               "SNV": "A", "REFERENCE": "A"}[cat]
        alt = {"DELETION": "A", "INSERTION": "ACT", "MNV": "GT",
               "SNV": "G", "REFERENCE": "."}[cat]
        return CalledAllele("chr1", pos, ref, alt,
                            getattr(AlleleCategory, cat))

    def test_lookup_positions(self):
        assert collapsed.total_lookup_position(self._allele("DELETION")) == 101
        assert collapsed.total_lookup_position(self._allele("MNV")) == 100
        assert collapsed.total_lookup_position(self._allele("INSERTION")) == 100
        assert collapsed.total_lookup_position(self._allele("SNV")) == 100
        assert collapsed.total_lookup_position(self._allele("REFERENCE")) == 100

    def test_assign_uses_deletion_start_point(self):
        import numpy as np
        t100 = np.arange(8, dtype=np.int64)
        t101 = np.arange(8, dtype=np.int64) + 10
        totals = {100: t100, 101: t101}
        snv = self._allele("SNV")
        dele = self._allele("DELETION")
        collapsed.assign_collapsed_totals({100: [snv, dele]}, totals)
        assert snv.read_collapsed_count_total is t100
        assert dele.read_collapsed_count_total is t101
