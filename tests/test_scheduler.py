"""Scheduler tests: threaded (bam x chr) jobs with ordered merge, modeled on
GenomeProcessorTests.ExecuteChromosomeThreadingTest (scheduling behavior
validated by faking/replacing heavy compute with real small inputs)."""
import os

import numpy as np
import pytest

import conftest
from pisces_tpu.io.fasta import Genome
from pisces_tpu.options import PiscesApplicationOptions
from pisces_tpu.parallel.scheduler import (
    JobManager, OrderedChromosomeWriter, process_bams_parallel,
)


class TestJobManager:
    def test_runs_all_jobs(self):
        results = []
        jobs = [lambda i=i: results.append(i) for i in range(20)]
        JobManager(4).process(jobs)
        assert sorted(results) == list(range(20))

    def test_terminate_on_error(self):
        def bad():
            raise ValueError("boom")
        with pytest.raises(ValueError):
            JobManager(2).process([bad])

    def test_error_mode_none_swallows(self):
        def bad():
            raise ValueError("boom")
        done = []
        JobManager(2, error_mode="none").process(
            [bad, lambda: done.append(1)])
        assert done == [1]


class TestOrderedWriter:
    def test_out_of_order_completion_writes_in_order(self):
        import threading
        import time
        ow = OrderedChromosomeWriter(["chr1", "chr2", "chr3"])
        written = []

        def worker():
            time.sleep(0.02)
            ow.submit("chr3", ["c"])
            ow.submit("chr1", ["a"])
            time.sleep(0.02)
            ow.submit("chr2", ["b"])

        t = threading.Thread(target=worker)
        t.start()
        ow.drain(lambda name, alleles: written.append((name, alleles)))
        t.join()
        assert written == [("chr1", ["a"]), ("chr2", ["b"]), ("chr3", ["c"])]


@pytest.mark.parametrize("max_threads", [1, 2, 3])
def test_parallel_matches_serial(tmp_path, max_threads):
    """1/2/3 threads over a multi-chr genome produce identical output to the
    serial path (the reference's ExecuteChromosomeThreadingTest shape)."""
    from pisces_tpu.apps.pisces import process_bam

    bam = os.path.join(conftest.REFERENCE_ROOT,
                       "src/test/Pisces.Tests/TestData/Sample_S1.bam")
    genome = Genome(conftest.shared_genome("chr19"))

    def make_options(outdir):
        o = PiscesApplicationOptions()
        o.output_directory = str(outdir)
        o.vcf_writing_parameters.output_gvcf_file = True
        return o

    serial_dir = tmp_path / "serial"
    serial_dir.mkdir()
    serial_out = process_bam(make_options(serial_dir), bam, genome,
                             use_device=False)

    par_dir = tmp_path / f"par{max_threads}"
    par_dir.mkdir()
    par_outs = process_bams_parallel(make_options(par_dir), [bam], genome,
                                     max_threads=max_threads,
                                     use_device=False)
    serial_lines = [l for l in open(serial_out) if not l.startswith("##")]
    par_lines = [l for l in open(par_outs[0]) if not l.startswith("##")]
    assert serial_lines == par_lines


def test_multiprocess_shards_and_resume(tmp_path):
    """MultiProcess path: per-chr shard workers, atomic shard rename, merge;
    resume=True skips chromosomes whose completed shard exists (SURVEY.md §5
    checkpoint/resume: shard-granularity restart)."""
    from pisces_tpu.apps.pisces import process_bam
    from pisces_tpu.parallel.scheduler import process_chromosomes_multiprocess

    bam = os.path.join(conftest.REFERENCE_ROOT,
                       "src/test/Pisces.Tests/TestData/Sample_S1.bam")
    genome_dir = conftest.shared_genome("chr19")

    def make_options(outdir):
        o = PiscesApplicationOptions()
        o.output_directory = str(outdir)
        o.vcf_writing_parameters.output_gvcf_file = True
        return o

    serial_dir = tmp_path / "serial"
    serial_dir.mkdir()
    serial_out = process_bam(make_options(serial_dir), bam,
                             Genome(genome_dir), use_device=False)
    mp_dir = tmp_path / "mp"
    mp_dir.mkdir()
    out = process_chromosomes_multiprocess(make_options(mp_dir), bam,
                                           genome_dir, 2, False)
    serial_lines = [l for l in open(serial_out) if not l.startswith("##")]
    mp_lines = [l for l in open(out) if not l.startswith("##")]
    assert serial_lines == mp_lines
    assert not os.path.exists(mp_dir / "Sample_S1.progress.json")

    # a pre-existing completed shard is trusted verbatim under resume=True
    shard = mp_dir / "Sample_S1.vcf_chr19"
    shard.write_text("#CHROM\nchr19\t1\t.\tA\tC\t.\tPASS\tSENTINEL\n")
    out2 = process_chromosomes_multiprocess(make_options(mp_dir), bam,
                                            genome_dir, 2, False, resume=True)
    assert "SENTINEL" in open(out2).read()


class TestMultihost:
    def test_assignment_balanced_and_deterministic(self):
        from pisces_tpu.parallel.multihost import host_chromosome_assignment
        chroms = [(f"chr{i}", (23 - i) * 10_000_000) for i in range(1, 23)]
        plan1 = host_chromosome_assignment(chroms, 4)
        plan2 = host_chromosome_assignment(list(reversed(chroms)), 4)
        assert plan1 == plan2  # order-independent determinism
        assert sorted(c for h in plan1 for c in h) == sorted(c for c, _ in chroms)
        loads = [sum(dict(chroms)[c] for c in h) for h in plan1]
        assert max(loads) <= min(loads) * 1.35  # LPT balance

    def test_wait_and_merge_shards(self, tmp_path):
        import threading
        import time as _time
        from pisces_tpu.parallel.multihost import wait_and_merge_shards
        shard_of = {c: str(tmp_path / f"s.vcf_{c}") for c in ["c1", "c2", "c3"]}

        def late_writer():
            _time.sleep(0.15)
            for c in ["c3", "c1", "c2"]:  # out of order, like remote hosts
                with open(shard_of[c] + ".tmp", "w") as f:
                    f.write(f"##hdr\n#CHROM\n{c}\t1\t.\tA\tC\t.\tPASS\t.\n")
                os.replace(shard_of[c] + ".tmp", shard_of[c])

        t = threading.Thread(target=late_writer)
        t.start()
        out = wait_and_merge_shards(str(tmp_path / "final.vcf"), shard_of,
                                    ["c1", "c2", "c3"], timeout_s=10,
                                    poll_s=0.05)
        t.join()
        lines = open(out).read().splitlines()
        assert lines[0] == "##hdr"
        data = [l.split("\t")[0] for l in lines if not l.startswith("#")]
        assert data == ["c1", "c2", "c3"]  # genome order despite arrival order
        assert not any(os.path.exists(p) for p in shard_of.values())

    def test_wait_times_out(self, tmp_path):
        from pisces_tpu.parallel.multihost import wait_and_merge_shards
        with pytest.raises(TimeoutError):
            wait_and_merge_shards(str(tmp_path / "f.vcf"),
                                  {"c1": str(tmp_path / "never")}, ["c1"],
                                  timeout_s=0.2, poll_s=0.05)


def test_thread_by_chr_byte_identical(tmp_path):
    """-ThreadByChr per-(bam,chr) shard writers + genome-order concat
    (GenomeProcessor.cs:81-186) must produce exactly the streaming-writer
    output, and must leave no shard files behind."""
    import glob
    import bench

    bam, gdir = bench._write_synthetic_workload(
        str(tmp_path / "wl"), n_chroms=3, chrom_len=60_000, n_reads=9_000,
        variant_rate=0.01)
    genome = Genome(gdir)
    outs = {}
    for mode in (False, True):
        o = PiscesApplicationOptions()
        o.output_directory = str(tmp_path / f"tbc_{mode}")
        os.makedirs(o.output_directory, exist_ok=True)
        o.vcf_writing_parameters.output_gvcf_file = True
        res = process_bams_parallel(o, [bam], genome, 3,
                                    use_device=False, thread_by_chr=mode)
        outs[mode] = [l for l in open(res[0]) if not l.startswith("##")]
        assert not glob.glob(os.path.join(o.output_directory, "*.vcf_*"))
    assert outs[False] == outs[True]


def test_crashed_subprocess_leaves_shards_and_resumes(tmp_path):
    """A worker that dies mid-run (its chromosome's reference made
    unreadable) fails the multiprocess run, but completed shards survive
    on disk; after the fault is repaired, resume=True finishes only the
    missing chromosomes and the merged VCF equals a clean run's."""
    import shutil
    import bench
    from pisces_tpu.parallel.scheduler import process_chromosomes_multiprocess

    bam, gdir = bench._write_synthetic_workload(
        str(tmp_path / "wl"), n_chroms=3, chrom_len=40_000, n_reads=6_000,
        variant_rate=0.0)

    def make_options(out_dir):
        o = PiscesApplicationOptions()
        o.output_directory = str(out_dir)
        os.makedirs(o.output_directory, exist_ok=True)
        o.vcf_writing_parameters.output_gvcf_file = True
        return o

    clean = process_chromosomes_multiprocess(
        make_options(tmp_path / "clean"), bam, gdir, 2, False)

    # poison chr2: its lazy reference load dies inside that worker only
    fa = os.path.join(gdir, "chr2.fa")
    shutil.move(fa, fa + ".hidden")
    crash_dir = tmp_path / "crash"
    with pytest.raises(Exception):
        process_chromosomes_multiprocess(make_options(crash_dir), bam, gdir,
                                         2, False)
    shards = [p for p in os.listdir(crash_dir) if ".vcf_chr" in p]
    assert shards, "completed shards must survive the crash"
    assert not any(p.endswith("_chr2") for p in shards)

    shutil.move(fa + ".hidden", fa)
    out = process_chromosomes_multiprocess(make_options(crash_dir), bam,
                                           gdir, 2, False, resume=True)
    got = [l for l in open(out) if not l.startswith("#")]
    exp = [l for l in open(clean) if not l.startswith("#")]
    assert got == exp


def test_native_tsan_harness():
    """Build and run the ThreadSanitizer stress harness over the native
    module (per-thread handles, concurrent decode+pileup — the scheduler's
    concurrency shape). TSan exits non-zero on any data race."""
    import subprocess
    native_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "pisces_tpu", "io", "_native")
    r = subprocess.run(["make", "-C", native_dir, "tsan"],
                       capture_output=True, text=True)
    if r.returncode != 0:
        pytest.skip(f"tsan build unavailable: {r.stderr[-200:]}")
    bam = conftest.shared_bam("Chr17Chr19.bam")
    r = subprocess.run([os.path.join(native_dir, "tsan_check"), bam,
                        "8", "3"], capture_output=True, text=True,
                       timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "tsan_check ok" in r.stdout
