"""Benchmark: candidate loci scored/sec/chip (the north-star metric).

Primary: steady-state throughput of the fused per-locus scoring kernel
(coverage totals + Poisson q-score + strand bias + somatic GT/GQ + filter
bits) over padded locus tiles on one chip, vs the single-core host (numpy
f64) implementation of the same math — the in-repo baseline proxy, since the
reference publishes no throughput numbers (BASELINE.md).

Also measures (stderr, informational): end-to-end bam -> gVCF throughput on
a synthetic 50k-read dataset through the full pipeline (native BAM decode,
C++ pileup, candidate discovery, scoring, VCF emission).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def bench_device(counts, ref_code, iters=20):
    import jax
    from pisces_tpu.ops.jax_scoring import ScoringParams, score_reference_loci

    params = ScoringParams()
    counts_d = jax.device_put(counts)
    ref_d = jax.device_put(ref_code)

    @jax.jit
    def step(c, r, salt):
        # salt defeats any cross-call caching without changing memory traffic
        out = score_reference_loci(c, r, params)
        return (out["variant_qscore"].sum() + out["gq"].sum()
                + out["filter_bits"].sum() + salt)

    float(step(counts_d, ref_d, 0))  # compile + warm
    t0 = time.perf_counter()
    acc = 0
    for i in range(iters):
        acc += int(step(counts_d, ref_d, i))  # host fetch syncs every step
    dt = time.perf_counter() - t0
    assert acc != 0
    return counts.shape[0] * iters / dt


def bench_host(counts, ref_code, iters=1):
    """Same scoring contract in the f64 numpy parity backend."""
    from pisces_tpu.ops import stats

    cov_alleles = np.array([0, 1, 2, 3, 5])
    t0 = time.perf_counter()
    for _ in range(iters):
        c = counts.sum(axis=-1)
        cov_by_dir = c[:, cov_alleles, :].sum(axis=1)
        total_cov = cov_by_dir.sum(axis=-1)
        sup_by_dir = c[np.arange(len(c)), ref_code, :]
        support = sup_by_dir.sum(axis=-1)
        q = stats.compute_variant_qscores(support, total_cov, 100, 20)
        stats.compute_strand_bias(sup_by_dir, cov_by_dir, 20, 0.01, 0.5, 1)
        freq = np.where(total_cov == 0, 0.0, support / np.maximum(total_cov, 1))
        gt = stats.somatic_genotypes(np.ones(len(c), bool),
                                     freq.astype(np.float32),
                                     freq.astype(np.float32), total_cov, 0.01, 10)
        stats.somatic_genotype_qscores(gt, q, freq.astype(np.float32),
                                       total_cov, 0.01, 0, 100)
    dt = time.perf_counter() - t0
    return counts.shape[0] * iters / dt


def _write_synthetic_workload(tmp: str, n_chroms: int, chrom_len: int,
                              n_reads: int, read_len: int = 100,
                              variant_rate: float = 0.01,
                              seed: int = 0):
    """Synthetic multi-chromosome BAM + genome with planted SNVs/indels so
    both the dense gVCF path and the candidate-scoring path do real work."""
    import shutil

    from pisces_tpu.io.bam_write import BamRecord, BamWriter, parse_cigar_string

    rng = np.random.default_rng(seed)
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.join(tmp, "genome"))
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    chroms = [f"chr{i + 1}" for i in range(n_chroms)]
    seqs = {}
    gs = []
    for c in chroms:
        seq = bases[rng.integers(0, 4, chrom_len)]
        seqs[c] = seq
        with open(os.path.join(tmp, "genome", f"{c}.fa"), "wb") as f:
            f.write(f">{c}\n".encode())
            for i in range(0, chrom_len, 70):
                f.write(seq[i:i + 70].tobytes() + b"\n")
        with open(os.path.join(tmp, "genome", f"{c}.fa.fai"), "w") as f:
            f.write(f"{c}\t{chrom_len}\t{len(c) + 2}\t70\t71\n")
        gs.append(f'\t<chromosome fileName="{c}.fa" contigName="{c}" '
                  f'totalBases="{chrom_len}" isCircular="false" md5="x" '
                  f'ploidy="2" knownBases="{chrom_len}" />')
    with open(os.path.join(tmp, "genome", "GenomeSize.xml"), "w") as f:
        f.write('<sequenceSizes genomeName="b">\n' + "\n".join(gs)
                + "\n</sequenceSizes>")

    # plant variant sites: SNVs at ~variant_rate of read starts + a few indels
    w = BamWriter(os.path.join(tmp, "b.bam"), chroms, [chrom_len] * n_chroms)
    cig = parse_cigar_string(f"{read_len}M")
    q30 = [30] * read_len
    per_chrom = n_reads // n_chroms
    var_sites = {c: rng.integers(1, chrom_len - read_len,
                                 max(8, int(chrom_len * variant_rate / 10)))
                 for c in chroms}
    for ci, c in enumerate(chroms):
        seq = seqs[c]
        positions = np.sort(rng.integers(1, chrom_len - read_len, per_chrom))
        sites = np.sort(var_sites[c])
        for i in range(per_chrom):
            p = int(positions[i])
            rseq = bytearray(seq[p - 1:p - 1 + read_len].tobytes())
            # plant a SNV on ~40% of reads covering a variant site
            j = np.searchsorted(sites, p)
            if j < len(sites) and sites[j] < p + read_len and i % 5 < 2:
                off = int(sites[j]) - p
                rseq[off] = b"ACGT"[(seq[sites[j] - 1] + 1) % 4]
            w.records.append(BamRecord(
                f"r{ci}_{i}", ci, p - 1, 60, 0x10 if i & 1 else 0,
                cig, rseq.decode(), q30))
    w.write()
    return os.path.join(tmp, "b.bam"), os.path.join(tmp, "genome")


def bench_end_to_end(tmp="/tmp/pisces_tpu_bench"):
    """Small single-thread end-to-end run (informational trend line)."""
    from pisces_tpu.io.fasta import Genome
    from pisces_tpu.options import PiscesApplicationOptions
    from pisces_tpu.apps.pisces import process_bam

    bam, gdir = _write_synthetic_workload(tmp, 1, 400_000, 50_000,
                                          variant_rate=0.0)
    o = PiscesApplicationOptions()
    o.output_directory = tmp
    o.vcf_writing_parameters.output_gvcf_file = True
    genome = Genome(gdir)
    t0 = time.perf_counter()
    out = process_bam(o, bam, genome, use_device=False)
    dt = time.perf_counter() - t0
    n_reads = 50_000
    lines = sum(1 for l in open(out) if not l.startswith("#"))
    return n_reads / dt, lines / dt


def bench_end_to_end_wes(tmp="/tmp/pisces_tpu_bench_wes", threads: int = 4):
    """Multi-threaded end-to-end wall clock on a WES-scale-shaped synthetic
    workload (multi-chromosome, planted variants, gVCF): the honest proxy
    for BASELINE.md's whole-exome wall-clock target. There is no dotnet
    runtime in this environment, so `dotnet Pisces.dll` cannot be timed
    here; this number is the committed per-round trend the >=10x target is
    tracked against (BENCH_r*.json), with the byte-parity suite pinning
    equivalence of the output."""
    from pisces_tpu.io.fasta import Genome
    from pisces_tpu.options import PiscesApplicationOptions
    from pisces_tpu.parallel.scheduler import process_bams_parallel

    n_chroms, chrom_len, n_reads = 4, 600_000, 160_000
    bam, gdir = _write_synthetic_workload(tmp, n_chroms, chrom_len, n_reads,
                                          variant_rate=0.01)
    o = PiscesApplicationOptions()
    o.output_directory = tmp
    o.vcf_writing_parameters.output_gvcf_file = True
    genome = Genome(gdir)
    t0 = time.perf_counter()
    outs = process_bams_parallel(o, [bam], genome, threads, use_device=False)
    dt = time.perf_counter() - t0
    lines = sum(1 for l in open(outs[0]) if not l.startswith("#"))
    return n_reads / dt, lines / dt, dt


def bench_candidates(iters: int = 20):
    """Device throughput of the fused variant-candidate kernel
    (ops/jax_scoring.score_snv_loci — the AlleleCaller.cs:208-234 hot loop)."""
    import jax
    from pisces_tpu.ops.jax_scoring import ScoringParams, score_snv_loci

    rng = np.random.default_rng(1)
    n = 1 << 18
    cov_by_dir = rng.integers(0, 400, size=(n, 3)).astype(np.int32)
    sup_by_dir = (cov_by_dir * rng.random((n, 3)) * 0.2).astype(np.int32)
    total = cov_by_dir.sum(axis=1).astype(np.int32)
    ref = (total - sup_by_dir.sum(axis=1)).astype(np.int32)
    nc = rng.integers(0, 5, size=n).astype(np.int32)
    params = ScoringParams()

    @jax.jit
    def step(s, c, r, k, t, salt):
        out = score_snv_loci(s, c, r, k, t, params)
        return (out["variant_qscore"].sum() + out["filter_bits"].sum() + salt)

    args = [jax.device_put(x) for x in (sup_by_dir, cov_by_dir, ref, nc, total)]
    float(step(*args, 0))
    t0 = time.perf_counter()
    acc = 0
    for i in range(iters):
        acc += int(step(*args, i))
    dt = time.perf_counter() - t0
    assert acc != 0
    return n * iters / dt


def main():
    rng = np.random.default_rng(0)
    L = 1 << 20  # 1M loci per tile
    counts = rng.integers(0, 30, size=(L, 6, 3, 11)).astype(np.int32)
    ref_code = rng.integers(0, 4, size=(L,)).astype(np.int32)

    host_rate = bench_host(counts[: L // 8], ref_code[: L // 8])
    try:
        device_rate = bench_device(counts, ref_code)
    except Exception as e:  # no accelerator available
        print(f"device bench failed ({e}); reporting host rate",
              file=sys.stderr)
        device_rate = host_rate

    # the driver contract line goes out FIRST: every bench below is
    # informational trend data, and the XLA compile of a second kernel over
    # the tunnel can push total wall time past the driver's window
    print(json.dumps({
        "metric": "candidate loci scored/sec/chip",
        "value": round(device_rate),
        "unit": "loci/s",
        "vs_baseline": round(device_rate / host_rate, 2),
    }), flush=True)

    try:
        e2e_reads, e2e_loci = bench_end_to_end()
        print(f"end-to-end: {e2e_reads:.0f} reads/s, {e2e_loci:.0f} "
              f"gvcf loci/s (single thread, host scoring)", file=sys.stderr,
              flush=True)
    except Exception as e:
        print(f"e2e bench failed: {e}", file=sys.stderr)

    try:
        wes_reads, wes_loci, wes_wall = bench_end_to_end_wes()
        print(f"WES-scale e2e (4 chrom, 160k reads, planted variants, "
              f"4 threads): {wes_wall:.1f}s wall = {wes_reads:,.0f} reads/s, "
              f"{wes_loci:,.0f} gvcf loci/s. NOTE: no dotnet runtime in this "
              f"environment; BASELINE.md's >=10x-vs-dotnet target is tracked "
              f"via this committed per-round trend (BENCH_r*.json), with the "
              f"byte-parity suite pinning output equivalence.",
              file=sys.stderr, flush=True)
    except Exception as e:
        print(f"WES e2e bench failed: {e}", file=sys.stderr)

    try:
        cand_rate = bench_candidates()
        print(f"candidate-path kernel: {cand_rate:,.0f} candidates/s/chip "
              f"(fused score_snv_loci)", file=sys.stderr, flush=True)
    except Exception as e:
        print(f"candidate bench failed: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
