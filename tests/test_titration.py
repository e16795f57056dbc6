"""VF-titration accuracy harness (apps/titration.py): the offline analog
of the reference's som.py paper analysis (docker/ExamplePiscesPaperAnalysis/
run_analysis.sh:65-140). Pins the caller's detection behavior against
planted truth across the titration ladder."""
import conftest  # noqa: F401  (forces cpu platform + sys.path)

from pisces_tpu.apps.titration import run_titration, score_calls, \
    generate_titration_workload


def test_titration_recall_precision(tmp_path):
    points = run_titration(
        str(tmp_path / "titr"), vf_points=(0.01, 0.05, 0.08),
        sites_per_point=12, depth=500, seed=11)
    hi = points[0.08]
    mid = points[0.05]
    lo = points[0.01]
    # at 5%+ VF against a 1%-noise model and 500x depth, every planted
    # site (SNV, 1bp ins, 1bp del) must be recovered with PASS status
    assert mid.recall >= 0.9, vars(mid)
    assert hi.recall >= 0.9, vars(hi)
    assert mid.precision >= 0.95 and hi.precision >= 0.95
    # 1% VF equals the default noise level (NL 20 -> 1% error): the
    # Poisson q model is honestly powerless there — recall ~0, never
    # spuriously high
    assert lo.recall <= 0.25, vars(lo)
    # monotone ladder
    assert lo.recall <= mid.recall <= hi.recall
    # summary CSV written with one row per point
    csv = (tmp_path / "titr" / "titration_summary.csv").read_text()
    assert csv.count("\n") == 4 and csv.startswith("vf,")


def test_low_vf_regime(tmp_path):
    """BASELINE config 4's headline regime (run_analysis.sh:84-135): 1-2%
    VF somatic detection at deep targeted depth with a noise model matched
    to the planted Q30 error floor (-minbq 30 -> NL 30,
    VariantQualityCalculator.cs:27-65). 2% VF at 2000x must be called with
    high recall/precision; 1% sits at the threshold (MinimumFrequency
    0.01) and must be measurably nonzero."""
    points = run_titration(
        str(tmp_path / "deep"), vf_points=(0.01, 0.02),
        sites_per_point=10, depth=2000, seed=19, min_bq=30,
        chrom_len=12_000)
    two = points[0.02]
    one = points[0.01]
    assert two.recall >= 0.9, vars(two)
    assert two.precision >= 0.95, vars(two)
    assert one.tp > 0, vars(one)  # nonzero 1% detection
    assert one.precision >= 0.95 or one.tp + one.fp == 0, vars(one)


def test_score_calls_matching(tmp_path):
    """score_calls matches on exact (chrom,pos,ref,alt), counts non-PASS
    and absent truth as FN, and bins non-truth PASS lines as FP."""
    bam, gdir, truth = generate_titration_workload(
        str(tmp_path / "gen"), (0.05,), 4, 60, chrom_len=12_000, seed=3)
    t = truth[0]
    vcf = tmp_path / "x.vcf"
    header = "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"
    fmt = "GT:GQ:AD:DP:VF:NL:SB"
    lines = [
        f"{t.chrom}\t{t.position}\t.\t{t.ref}\t{t.alt}\t100\tPASS\t"
        f"DP=100\t{fmt}\t0/1:100:95,5:100:0.050:20:-20.0",
        # non-PASS truth twin elsewhere -> FN
        f"{truth[1].chrom}\t{truth[1].position}\t.\t{truth[1].ref}\t"
        f"{truth[1].alt}\t10\tq30\tDP=100\t{fmt}\t"
        "0/1:10:95,5:100:0.050:20:-20.0",
        # PASS non-truth -> FP binned to nearest VF point
        f"{t.chrom}\t99\t.\tA\tT\t100\tPASS\tDP=100\t{fmt}\t"
        "0/1:100:95,5:100:0.049:20:-20.0",
    ]
    vcf.write_text(header + "\n".join(lines) + "\n")
    pts = score_calls(str(vcf), truth, (0.05,))
    p = pts[0.05]
    assert p.tp == 1 and p.fp == 1 and p.fn == 3
