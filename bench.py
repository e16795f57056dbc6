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


def bench_end_to_end(tmp="/tmp/pisces_tpu_bench"):
    """Small end-to-end run through the full pipeline (informational)."""
    import shutil

    from pisces_tpu.io.bam_write import BamRecord, BamWriter, parse_cigar_string
    from pisces_tpu.io.fasta import Genome
    from pisces_tpu.options import PiscesApplicationOptions
    from pisces_tpu.apps.pisces import process_bam

    rng = np.random.default_rng(0)
    L = 400_000
    n_reads = 50_000
    read_len = 100
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(os.path.join(tmp, "genome"))
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    genome_seq = bases[rng.integers(0, 4, L)]
    with open(os.path.join(tmp, "genome", "chr1.fa"), "wb") as f:
        f.write(b">chr1\n")
        for i in range(0, L, 70):
            f.write(genome_seq[i:i + 70].tobytes() + b"\n")
    with open(os.path.join(tmp, "genome", "chr1.fa.fai"), "w") as f:
        f.write(f"chr1\t{L}\t6\t70\t71\n")
    with open(os.path.join(tmp, "genome", "GenomeSize.xml"), "w") as f:
        f.write(f'<sequenceSizes genomeName="b">\n\t<chromosome '
                f'fileName="chr1.fa" contigName="chr1" totalBases="{L}" '
                f'isCircular="false" md5="x" ploidy="2" knownBases="{L}" />\n'
                f'</sequenceSizes>')
    w = BamWriter(os.path.join(tmp, "b.bam"), ["chr1"], [L])
    cig = parse_cigar_string(f"{read_len}M")
    q30 = [30] * read_len
    positions = np.sort(rng.integers(1, L - read_len, n_reads))
    for i in range(n_reads):
        p = int(positions[i])
        seq = genome_seq[p - 1:p - 1 + read_len]
        w.records.append(BamRecord(f"r{i}", 0, p - 1, 60, 0x10 if i & 1 else 0,
                                   cig, seq.tobytes().decode(), q30))
    w.write()

    o = PiscesApplicationOptions()
    o.output_directory = tmp
    o.vcf_writing_parameters.output_gvcf_file = True
    genome = Genome(os.path.join(tmp, "genome"))
    t0 = time.perf_counter()
    out = process_bam(o, os.path.join(tmp, "b.bam"), genome, use_device=False)
    dt = time.perf_counter() - t0
    lines = sum(1 for l in open(out) if not l.startswith("#"))
    return n_reads / dt, lines / dt


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

    try:
        e2e_reads, e2e_loci = bench_end_to_end()
        print(f"end-to-end: {e2e_reads:.0f} reads/s, {e2e_loci:.0f} "
              f"gvcf loci/s (single thread, host scoring)", file=sys.stderr)
    except Exception as e:
        print(f"e2e bench failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "candidate loci scored/sec/chip",
        "value": round(device_rate),
        "unit": "loci/s",
        "vs_baseline": round(device_rate / host_rate, 2),
    }))


if __name__ == "__main__":
    main()
