"""NoiseModel.Window end-to-end: the q-score noise level is derived from the
mean observed base-call error probability at the locus,
noise = PtoQ(SumOfBaseQuality / TotalCoverage)
(AlleleCaller.cs:215-218), instead of the flat NoiseLevelUsedForQScoring."""
import conftest
from pisces_tpu.domain.types import NoiseModel
from pisces_tpu.io.bam_write import BamWriter
from pisces_tpu.io.fasta import Genome, create_genome_size_xml
from pisces_tpu.options import PiscesApplicationOptions


def _run(tmp_path, noise_model, qual):
    ref = "ACGTACGTAC" * 10
    gdir = tmp_path / f"genome_{noise_model.name}_{qual}"
    gdir.mkdir()
    with open(gdir / "chr1.fa", "w") as f:
        f.write(">chr1\n" + ref + "\n")
    create_genome_size_xml(str(gdir))
    genome = Genome(str(gdir))
    bam = str(tmp_path / f"n_{noise_model.name}_{qual}.bam")
    w = BamWriter(bam, ["chr1"], [len(ref)])
    site = 45
    for i in range(100):
        start = 20 + (i % 10)
        seq = list(ref[start - 1:start - 1 + 50])
        if i % 10 == 0:  # 10% C
            seq[site - start] = "C"
        w.add_read(f"r{i}", "chr1", start, "50M", "".join(seq), qual=qual,
                   flag=0x10 if i % 2 else 0)
    w.write()

    from pisces_tpu.apps.pisces import process_bam
    o = PiscesApplicationOptions()
    o.output_directory = str(tmp_path)
    o.vcf_writing_parameters.output_gvcf_file = False
    o.variant_calling_parameters.noise_model = noise_model
    out = process_bam(o, bam, genome, use_device=False)
    recs = [l.rstrip("\n").split("\t") for l in open(out)
            if not l.startswith("#")]
    var = [r for r in recs if r[1] == "45" and r[4] == "C"]
    assert len(var) == 1, recs
    fmt = dict(zip(var[0][8].split(":"), var[0][9].split(":")))
    return int(var[0][5]), int(fmt["NL"])


def test_window_noise_uses_mean_base_quality(tmp_path):
    q_flat, nl_flat = _run(tmp_path, NoiseModel.FLAT, 35)
    q_win, nl_win = _run(tmp_path, NoiseModel.WINDOW, 35)
    assert nl_flat == 20          # flat: NoiseLevelUsedForQScoring default
    assert nl_win == 35           # window: PtoQ(mean(10^-3.5)) = 35
    assert q_win >= q_flat        # cleaner noise floor -> higher confidence

    # window model tracks the actual qualities: q=20 reads give a mean error
    # of 0.010000000000000007 (fp accumulation), PtoQ = 19.9999...; the
    # reference's (int) cast truncates to 19 and so do we
    q_win20, nl_win20 = _run(tmp_path, NoiseModel.WINDOW, 20)
    assert nl_win20 == 19
    assert q_win20 <= q_flat      # noisier floor -> no higher confidence
