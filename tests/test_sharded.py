"""Production mesh sharding: byte-parity of the distributed scoring step.

The (dp, sp) mesh path (parallel/sharding.py) routes reads to the position
shard owning their start, scatter-adds PARTIAL per-shard count buffers, and
ships boundary overflow to the right neighbor with a ppermute halo before
scoring (the device-native form of the reference's block hold-and-spill,
RegionStateManager.cs:303-314). These tests prove:

  1. the halo genuinely carries data (reads cross shard edges),
  2. sharded per-locus outputs == single-device fused-kernel outputs,
  3. end-to-end VCF bytes are identical at mesh sizes 1 (off) / 2 / 8
     on a reference-shipped BAM,
  4. the -MultiHost entry produces the same bytes in a 1-process job.
"""
import os

import numpy as np
import pytest

import conftest
from pisces_tpu.apps.pisces import process_bam
from pisces_tpu.io.fasta import Genome
from pisces_tpu.options import PiscesApplicationOptions
from pisces_tpu.ops.jax_scoring import ScoringParams
from pisces_tpu.parallel.sharding import (
    build_partial_counts, make_mesh, plan_shards,
    sharded_score_reference_positions,
)
from pisces_tpu.pileup.events import build_base_events
from util import make_batch


def _synthetic_batch(n_reads=160, read_len=40, span=1800, seed=7):
    """Tiled reads over a small domain so many cross 256-aligned shard
    edges (l_local is a multiple of 256)."""
    rng = np.random.default_rng(seed)
    reads = []
    for i in range(n_reads):
        pos1 = 1 + int(rng.integers(0, span))
        seq = "".join(rng.choice(list("ACGT"), read_len))
        reads.append({"pos1": pos1, "cigar": f"{read_len}M", "seq": seq,
                      "qual": int(rng.integers(20, 40)),
                      "flag": 16 if rng.integers(0, 2) else 0})
    return make_batch(reads)


def _refseq(length=4096, seed=3):
    rng = np.random.default_rng(seed)
    return rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), length)


def _per_position(out):
    """Expand unique-tuple outputs back to per-position arrays."""
    inv = out["inv"]
    return {k: np.asarray(v)[inv] for k, v in out.items()
            if k not in ("inv", "ref_base")}


class TestShardedStep:
    def test_halo_carries_real_data(self):
        import jax
        batch = _synthetic_batch()
        keep = np.ones(batch.n, bool)
        ev = build_base_events(batch, keep, 20, 5)
        geo = plan_shards(ev, 8)
        assert geo is not None and geo.n_shards == 8
        partial = build_partial_counts(ev, geo)
        width = geo.l_local + geo.halo
        tails = partial.reshape(8, width, 6, 3)[:, geo.l_local:]
        # at least one shard's halo tail holds boundary-crossing counts
        assert tails.sum() > 0

    @pytest.mark.parametrize("n_devices", [1, 2, 8])
    def test_sharded_equals_single_device(self, n_devices, monkeypatch):
        import jax
        from pisces_tpu.calling import fast_gvcf
        from pisces_tpu.calling.fast_gvcf import score_reference_positions
        from pisces_tpu.pileup.counts import build_counts_host

        # compare f32-device vs f32-device: force the single-device path
        # onto the device regardless of the production batch-size gate
        monkeypatch.setattr(fast_gvcf, "DEVICE_TUPLE_THRESHOLD", 1)

        batch = _synthetic_batch()
        keep = np.ones(batch.n, bool)
        ev = build_base_events(batch, keep, 20, 5)
        refseq = _refseq()
        params = ScoringParams()

        mesh = make_mesh(jax.devices()[:n_devices])
        pos_s, out_s, stats = sharded_score_reference_positions(
            ev, refseq, params, mesh)

        pc = build_counts_host(ev, anchor_size=5)
        pos_1, out_1 = score_reference_positions(pc, refseq, params,
                                                 use_device=True)

        assert np.array_equal(pos_s, pos_1)
        a, b = _per_position(out_s), _per_position(out_1)
        for k in ("total_coverage", "support", "variant_qscore",
                  "genotype", "gq"):
            assert np.array_equal(a[k], b[k]), k
        assert np.allclose(a["sb_gatk"], b["sb_gatk"], rtol=0, atol=0)
        assert np.array_equal(out_s["ref_base"], out_1["ref_base"])
        assert stats["loci_covered"] == int((a["total_coverage"] > 0).sum())


def _run_e2e(tmp_path, sub, mesh_devices, bam, genome, use_device=True):
    d = tmp_path / sub
    d.mkdir()
    o = PiscesApplicationOptions()
    o.output_directory = str(d)
    o.vcf_writing_parameters.output_gvcf_file = True
    o.mesh_devices = mesh_devices
    return process_bam(o, bam, genome, use_device=use_device)


class TestShardedEndToEnd:
    @pytest.mark.parametrize("mesh_devices", [2, 8])
    def test_vcf_bytes_identical(self, tmp_path, mesh_devices):
        bam = conftest.shared_bam("Chr17Chr19.bam")
        genome = Genome(conftest.shared_genome("chr19"))
        single = _run_e2e(tmp_path, "single", 0, bam, genome)
        sharded = _run_e2e(tmp_path, f"mesh{mesh_devices}", mesh_devices,
                           bam, genome)
        la = [l for l in open(single) if not l.startswith("##")]
        lb = [l for l in open(sharded) if not l.startswith("##")]
        assert la == lb
        assert len(la) > 100


class TestMultiHostEntry:
    def test_single_process_job_matches(self, tmp_path):
        from pisces_tpu.parallel.multihost import process_bam_multihost
        bam = conftest.shared_bam("Chr17Chr19.bam")
        genome_dir = conftest.shared_genome("chr19")
        genome = Genome(genome_dir)

        d1 = tmp_path / "plain"
        d1.mkdir()
        o1 = PiscesApplicationOptions()
        o1.output_directory = str(d1)
        plain = process_bam(o1, bam, genome, use_device=False)

        d2 = tmp_path / "mh"
        d2.mkdir()
        o2 = PiscesApplicationOptions()
        o2.output_directory = str(d2)
        merged = process_bam_multihost(o2, bam, genome_dir, use_device=False)
        assert merged is not None
        la = [l for l in open(plain) if not l.startswith("#")]
        lb = [l for l in open(merged) if not l.startswith("#")]
        assert la == lb


class TestShardedWithIntervals:
    def test_interval_vcf_bytes_identical(self, tmp_path):
        """Mesh mode with intervals: padded + in-block interval positions
        carry the same RegionMapper/NL semantics as the single-device path."""
        testdata = os.path.join(conftest.REFERENCE_ROOT,
                                "src/test/Pisces.Tests/TestData")
        bam = os.path.join(testdata, "Chr17again.bam")
        genome = Genome(conftest.shared_genome("chr19"))
        intervals = ("chr19\t3118870\t3118895\n"
                     "chr19\t3118940\t3118960\n"
                     "chr19\t3000000\t3000019\n")

        def run(sub, mesh):
            d = tmp_path / sub
            d.mkdir()
            o = PiscesApplicationOptions()
            o.output_directory = str(d)
            o.vcf_writing_parameters.output_gvcf_file = True
            o.mesh_devices = mesh
            ipath = os.path.join(str(d), "i.picard")
            with open(ipath, "w") as f:
                f.write(intervals)
            o.interval_paths = [ipath]
            return process_bam(o, bam, genome, use_device=True)

        single = run("single", 0)
        sharded = run("mesh8", 8)
        la = [l for l in open(single) if not l.startswith("##")]
        lb = [l for l in open(sharded) if not l.startswith("##")]
        assert la == lb
        assert any(l.startswith("chr19\t3000000\t") for l in la)


class TestShardedCandidateScoring:
    def test_snv_tuples_mesh_matches_single(self):
        """sharded_score_snv_tuples over 8 devices == single-device
        score_snv_loci on every output."""
        import jax
        from pisces_tpu.ops.jax_scoring import score_snv_loci
        from pisces_tpu.parallel.sharding import sharded_score_snv_tuples

        rng = np.random.default_rng(3)
        n = 1000  # deliberately not a multiple of the shard unit
        cov = rng.integers(0, 300, size=(n, 3)).astype(np.int32)
        sup = (cov * rng.random((n, 3)) * 0.3).astype(np.int32)
        total = cov.sum(axis=1).astype(np.int32)
        ref_sup = (total - sup.sum(axis=1)).clip(0).astype(np.int32)
        nc = rng.integers(0, 4, size=n).astype(np.int32)
        params = ScoringParams()

        mesh = make_mesh(jax.devices()[:8])
        sharded = sharded_score_snv_tuples(sup, cov, ref_sup, nc, total,
                                           params, mesh)
        single = score_snv_loci(sup, cov, ref_sup, nc, total, params)
        for k in ("variant_qscore", "genotype", "gq", "filter_bits"):
            np.testing.assert_array_equal(sharded[k], np.asarray(single[k]),
                                          err_msg=k)

    def test_variant_vcf_bytes_identical_with_mesh_candidates(
            self, tmp_path, monkeypatch):
        """End-to-end on a variant-bearing BAM (SNVs + a deletion + an
        insertion): -MeshDevices 8 with the candidate batch forced through
        the mesh (threshold 1) produces byte-identical VCF to single-device."""
        from pisces_tpu.calling import fast_gvcf
        from pisces_tpu.io.bam_write import (
            BamRecord, BamWriter, parse_cigar_string,
        )

        monkeypatch.setenv("PISCES_DEVICE_BATCH_THRESHOLD", "1")
        # ref-line scoring must use the same precision on both sides
        # (mesh scores refs in f32 on-device; keep the single-device run
        # on-device too instead of the f64 host small-batch route)
        monkeypatch.setattr(fast_gvcf, "DEVICE_TUPLE_THRESHOLD", 1)
        rng = np.random.default_rng(11)
        chrom_len = 4000
        bases = np.frombuffer(b"ACGT", dtype=np.uint8)
        seq = bases[rng.integers(0, 4, chrom_len)]
        gdir = tmp_path / "genome"
        gdir.mkdir()
        with open(gdir / "chrT.fa", "wb") as f:
            f.write(b">chrT\n")
            for i in range(0, chrom_len, 70):
                f.write(seq[i:i + 70].tobytes() + b"\n")
        with open(gdir / "chrT.fa.fai", "w") as f:
            f.write(f"chrT\t{chrom_len}\t7\t70\t71\n")
        with open(gdir / "GenomeSize.xml", "w") as f:
            f.write('<sequenceSizes genomeName="t">\n\t<chromosome '
                    f'fileName="chrT.fa" contigName="chrT" '
                    f'totalBases="{chrom_len}" isCircular="false" md5="x" '
                    f'ploidy="2" knownBases="{chrom_len}" />\n'
                    '</sequenceSizes>')

        bam_path = str(tmp_path / "v.bam")
        w = BamWriter(bam_path, ["chrT"], [chrom_len])
        rl = 60
        q30 = [30] * rl
        recs = []
        for i in range(400):
            p = 1 + int(rng.integers(0, chrom_len - rl - 10))
            rseq = bytearray(seq[p - 1:p - 1 + rl].tobytes())
            cigar = f"{rl}M"
            if i % 4 == 0:   # SNV at a fixed site the read covers
                rseq[10] = b"ACGT"[(seq[p + 9] + 1) % 4]
            elif i % 7 == 0:  # 2-base deletion
                cigar = "30M2D30M"
                rseq = bytearray(seq[p - 1:p + 29].tobytes()
                                 + seq[p + 31:p + 61].tobytes())
            elif i % 11 == 0:  # 2-base insertion
                cigar = "30M2I28M"
                rseq = bytearray(seq[p - 1:p + 29].tobytes() + b"AC"
                                 + seq[p + 29:p + 57].tobytes())
            recs.append((p, cigar, rseq))
        for i, (p, cigar, rseq) in enumerate(
                sorted(recs, key=lambda r: r[0])):
            w.records.append(BamRecord(
                f"v{i}", 0, p - 1, 60, 0x10 if i & 1 else 0,
                parse_cigar_string(cigar), rseq.decode(), [30] * len(rseq)))
        w.write()

        genome = Genome(str(gdir))
        single = _run_e2e(tmp_path, "single_v", 0, bam_path, genome)
        sharded = _run_e2e(tmp_path, "mesh8_v", 8, bam_path, genome)
        la = [l for l in open(single) if not l.startswith("##")]
        lb = [l for l in open(sharded) if not l.startswith("##")]
        assert la == lb
        # the workload must actually contain called SNVs and indels
        data = [l.split("\t") for l in la if not l.startswith("#")]
        snvs = [d for d in data if len(d[3]) == 1 and len(d[4]) == 1
                and d[4] not in (".", "<M>") and d[3] != d[4]]
        indels = [d for d in data if len(d[3]) != len(d[4])
                  and d[4] not in (".",)]
        assert snvs and indels


class TestMultiHostRecovery:
    def test_host0_steals_orphaned_chromosome(self, tmp_path):
        """Elastic recovery: when no shard progress happens for stall_s,
        host 0 processes the missing chromosomes itself (atomic rename,
        first writer wins) and the merged VCF equals a clean run."""
        import bench
        from pisces_tpu.parallel.multihost import wait_and_merge_shards

        bam, gdir = bench._write_synthetic_workload(
            str(tmp_path / "wl"), n_chroms=2, chrom_len=30_000,
            n_reads=3_000)
        genome = Genome(gdir)
        out_dir = tmp_path / "mh"
        out_dir.mkdir()

        def run_chrom(chrom, dest):
            o = PiscesApplicationOptions()
            o.output_directory = str(out_dir)
            o.vcf_writing_parameters.output_gvcf_file = True
            o.chromosome_filter = chrom
            tmp = dest + ".t"
            process_bam(o, bam, genome, out_vcf=tmp, use_device=False)
            os.replace(tmp, dest)

        shard_of = {c: str(out_dir / f"s.vcf_{c}") for c in ("chr1", "chr2")}
        run_chrom("chr1", shard_of["chr1"])  # chr2's "host" died

        recovered = []

        def recover(chrom):
            recovered.append(chrom)
            run_chrom(chrom, shard_of[chrom])

        final = wait_and_merge_shards(str(out_dir / "final.vcf"), shard_of,
                                      ["chr1", "chr2"], timeout_s=60,
                                      poll_s=0.2, recover=recover,
                                      stall_s=0.5)
        assert recovered == ["chr2"]
        data = [l for l in open(final) if not l.startswith("#")]
        assert any(l.startswith("chr1\t") for l in data)
        assert any(l.startswith("chr2\t") for l in data)


class TestRealTwoProcessDistributed:
    def test_coordinator_joined_workers_match_single_process(self, tmp_path):
        """TWO actual OS processes join a jax.distributed coordinator
        (CPU backend), split a 2-chromosome workload via the LPT partition,
        write atomic shards, and host 0's merge barrier produces a VCF
        byte-equal to the single-process run. Reference analog: the
        -InsideSubProcess fan-out (Pisces Program.cs:46-48). The launcher
        asserts process_count=2 inside each worker."""
        import bench
        from pisces_tpu.parallel.multihost import (
            process_bam_multihost, run_local_multihost,
        )

        bam, gdir = bench._write_synthetic_workload(
            str(tmp_path / "wl"), n_chroms=2, chrom_len=40_000,
            n_reads=4_000)
        merged = run_local_multihost(bam, gdir, str(tmp_path / "mh"),
                                     n_procs=2, timeout_s=240)

        o = PiscesApplicationOptions()
        o.output_directory = str(tmp_path / "sp")
        os.makedirs(o.output_directory, exist_ok=True)
        o.vcf_writing_parameters.output_gvcf_file = True
        single = process_bam_multihost(o, bam, gdir, use_device=False)

        la = [l for l in open(single) if not l.startswith("##")]
        lb = [l for l in open(merged) if not l.startswith("##")]
        assert la == lb
        assert len(lb) > 100

    def test_survivor_recovers_after_real_worker_sigkill(self, tmp_path):
        """A REAL process death: worker 1 is SIGKILLed right after its
        first shard lands (jax_enable_recoverability keeps the survivor
        alive through the lost heartbeat); host 0 detects the stall,
        work-steals the dead worker's remaining chromosomes, and the
        merged VCF is byte-equal to a clean single-process run.
        Reference analog: the parent reaps a crashed -InsideSubProcess
        child's exit code (CliTask.cs:55-90) and the job must not hang."""
        import bench
        from pisces_tpu.parallel.multihost import (
            process_bam_multihost, run_local_multihost,
        )

        bam, gdir = bench._write_synthetic_workload(
            str(tmp_path / "wl"), n_chroms=4, chrom_len=30_000,
            n_reads=6_000)
        merged = run_local_multihost(bam, gdir, str(tmp_path / "mh"),
                                     n_procs=2, timeout_s=300,
                                     kill_worker=1, recover_stall_s=4,
                                     delay_per_chr=3)

        o = PiscesApplicationOptions()
        o.output_directory = str(tmp_path / "sp")
        os.makedirs(o.output_directory, exist_ok=True)
        o.vcf_writing_parameters.output_gvcf_file = True
        single = process_bam_multihost(o, bam, gdir, use_device=False)

        la = [l for l in open(single) if not l.startswith("##")]
        lb = [l for l in open(merged) if not l.startswith("##")]
        assert la == lb
        assert len(lb) > 100
