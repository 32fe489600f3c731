"""Agreement gates on a TRAINED checkpoint (VERDICT r3 item 1).

Round 3's wire/compute gates (f16, int8 "100.000% agreement", the
engine-plane byte comparisons) were exercised on random-init weights,
where every prob sits near 0.5 and agreement is weak evidence. This
harness re-runs every gate with the converged flagship checkpoint from
benchmarks/trained_ckpt.py (valid accuracy ~1.0 on the methylation
fixture; probs hug 0/1), on held-out mixed reads:

  base      transfer float32, compute float32, scan   (exact numerics)
  f16       transfer float16 vs base
  int8      transfer int8    vs base  (the remote-attach auto wire)
  bf16      compute bfloat16 (f16 wire) vs base
  prod      the full auto production config (int8 + bf16 + pallas on
            remote TPU) vs base — what a CLI user actually gets

(The round-3 experimental int4 wire was gated here once — 99.93%, 3
flips, max |dP1| 0.984 — and retired on that evidence plus its measured
~25% slowdown; docs/BENCH.md "int4 signal wire: RETIRED".)

Each variant reports call agreement, prob deltas, and the margin
distribution (fraction of |p1-0.5| > 0.4/0.1 on the base run proves the
checkpoint actually separates). Writes docs/TRAINED_GATES.md and prints
one JSON summary line. Run on the TPU rig for the committed numbers; the
harness is backend-agnostic.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.join(REPO, "tests"), os.path.dirname(
        os.path.abspath(__file__))):
    if p not in sys.path:
        sys.path.insert(0, p)

from trained_ckpt import ensure_fixture  # noqa: E402


def _calls(path: str) -> dict:
    m = {}
    with open(path) as fh:
        for line in fh:
            c = line.rstrip("\n").split("\t")
            m[(c[0], c[1], c[2], c[4])] = (float(c[6]), float(c[7]))
    return m


def compare(base: dict, other: dict) -> dict:
    assert base.keys() == other.keys()
    n = len(base)
    flips = dp = dmax = 0.0
    flips = sum(1 for k in base
                if (base[k][1] > base[k][0]) != (other[k][1] > other[k][0]))
    deltas = [abs(base[k][1] - other[k][1]) for k in base]
    dp = sum(deltas) / n
    dmax = max(deltas)
    return {"rows": n, "call_flips": flips,
            "agreement_pct": round(100.0 * (n - flips) / n, 4),
            "prob1_mean_abs_diff": round(dp, 7),
            "prob1_max_abs_diff": round(dmax, 6)}


def margins(base: dict) -> dict:
    import numpy as np
    p1 = np.array([v[1] for v in base.values()])
    m = np.abs(p1 - 0.5)
    return {"rows": len(p1),
            "median_margin": round(float(np.median(m)), 4),
            "pct_margin_gt_0.4": round(100.0 * float((m > 0.4).mean()), 2),
            "pct_margin_gt_0.1": round(100.0 * float((m > 0.1).mean()), 2),
            "pct_called_methylated": round(
                100.0 * float((p1 > 0.5).mean()), 2)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "docs",
                                                  "TRAINED_GATES.md"))
    ap.add_argument("--fixture_dir", default=None)
    ap.add_argument("--device_batch", type=int, default=2048)
    args = ap.parse_args()

    meta = ensure_fixture(**({"out_dir": args.fixture_dir}
                             if args.fixture_dir else {}))
    import jax

    from deepsignal_plant_tpu.config import CallConfig, ModelConfig
    from deepsignal_plant_tpu.models.convert import load_checkpoint
    from deepsignal_plant_tpu.pipeline.call_mods import CallModsEngine
    from deepsignal_plant_tpu.utils.jaxinit import (resolve_compute_dtype,
                                                    resolve_recurrence)
    backend = jax.default_backend()
    _params, cfg0 = load_checkpoint(meta["npz_ckpt"])
    cfg0 = cfg0.with_(dropout_rate=0.0)
    feat = meta["eval_features"]
    ckpt = meta["npz_ckpt"]
    outdir = os.path.join(os.path.dirname(ckpt), "gates")
    os.makedirs(outdir, exist_ok=True)

    VARIANTS = {
        "base": (cfg0, CallConfig(transfer_dtype="float32",
                                  device_batch=args.device_batch)),
        "f16": (cfg0, CallConfig(transfer_dtype="float16",
                                 device_batch=args.device_batch)),
        "int8": (cfg0, CallConfig(transfer_dtype="int8",
                                  device_batch=args.device_batch)),
        "bf16": (cfg0.with_(compute_dtype=resolve_compute_dtype(
                     "bfloat16")),
                 CallConfig(transfer_dtype="float16",
                            device_batch=args.device_batch)),
        "prod": (cfg0.with_(compute_dtype=resolve_compute_dtype("auto"),
                            recurrence=resolve_recurrence(
                                "auto", allow_multi_device=True)),
                 CallConfig(transfer_dtype="auto",
                            device_batch=args.device_batch)),
    }
    results, timings, resolved = {}, {}, {}
    for name, (mcfg, ccfg) in VARIANTS.items():
        eng = CallModsEngine(ckpt, mcfg, ccfg)
        out = os.path.join(outdir, f"calls_{name}.tsv")
        t0 = time.time()
        stats = eng.run_features_file(feat, out)
        timings[name] = round(time.time() - t0, 2)
        resolved[name] = {"transfer": eng.call_cfg.transfer_dtype,
                          "compute": eng.model_cfg.compute_dtype,
                          "recurrence": eng.model_cfg.recurrence}
        results[name] = _calls(out)
        print(f"{name}: {stats.sites} sites in {timings[name]}s "
              f"({resolved[name]})", flush=True)

    base = results["base"]
    marg = margins(base)
    gates = {n: compare(base, results[n]) for n in VARIANTS if n != "base"}

    lines = [
        "# Trained-checkpoint agreement gates",
        "",
        f"- checkpoint: flagship both_bilstm (hid 256, b13/s16) trained to "
        f"valid accuracy {meta['best_valid_accuracy']:.4f} on the "
        f"methylation fixture (benchmarks/trained_ckpt.py; "
        f"{meta['train_rows']} train rows; torch<->npz round trip exact: "
        f"{meta['torch_npz_roundtrip_exact']})",
        f"- eval inputs: {meta['eval_rows']} held-out sites (mixed "
        f"methylated/unmethylated reads, decorrelated from strand)",
        f"- backend: {backend}; every variant vs the exact-numerics base "
        "(float32 wire, float32 compute, scan recurrence)",
        "",
        "## Does the checkpoint separate? (base-run margins)",
        "```json", json.dumps(marg, indent=2), "```",
        "",
        "## Gates",
        "",
        "| variant | wire | compute | recurrence | agreement | flips | "
        "mean abs dP1 | max abs dP1 |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for n, g in gates.items():
        r = resolved[n]
        lines.append(
            f"| {n} | {r['transfer']} | {r['compute']} | "
            f"{r['recurrence']} | {g['agreement_pct']}% | "
            f"{g['call_flips']} | {g['prob1_mean_abs_diff']} | "
            f"{g['prob1_max_abs_diff']} |")
    lines += [
        "",
        "Interpretation: with probs hugging 0/1 (median margin "
        f"{marg['median_margin']}), any wire/compute numeric perturbation "
        "must not flip calls; agreement here is strong evidence, unlike "
        "the round-3 random-init runs where the reference's own "
        "self-agreement was ~77%.",
        "",
        "```json", json.dumps({"meta": {k: meta[k] for k in (
            "best_valid_accuracy", "train_rows", "eval_rows", "seed")},
            "backend": backend, "timings_s": timings,
            "resolved": resolved, "gates": gates}, indent=2), "```", ""]
    if os.path.exists(args.out) and "addendum" in open(args.out).read():
        # the committed report carries manually appended addenda (e.g.
        # the end-to-end accuracy section) — don't silently destroy them
        args.out += ".new"
        print(f"existing report has addenda; writing {args.out} instead "
              f"(merge by hand)")
    with open(args.out, "w") as fh:
        fh.write("\n".join(lines))
    print(f"report written to {args.out}")
    print(json.dumps({"backend": backend, "margins": marg,
                      "gates": {n: g["agreement_pct"]
                                for n, g in gates.items()}}))


if __name__ == "__main__":
    main()
