"""Quantitative denoise evaluation (reference denoise.py:318 — the
cross-rank label-cleaning loop that is the deepsignal-plant paper's
training differentiator).

The mechanics are unit-tested (tests/test_train_denoise.py); this
measures whether the loop actually CLEANS. The trained fixture
(benchmarks/trained_ckpt.py) gives ground truth for free: every row's
TRUE label is recoverable from its read name (methread_*/unmethread_*),
independent of the label column. Protocol:

1. corrupt the fixture's training set: flip the label column on a
   seeded fraction of rows (default 20%) — the "noisy bisulfite truth"
   scenario denoise exists for;
2. run the real CLI denoise on the corrupted file (signal_bilstm
   scorer, the reference default);
3. score the output against ground truth: positive-row purity (kept
   label-1 rows whose TRUE label is 1) before vs after, plus recall of
   true positives and the kept ratio.

Writes docs/DENOISE_EVAL.md and prints one JSON line. Runs anywhere
(CPU ok; TPU faster).
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
for p in (REPO, os.path.join(REPO, "tests"),
          os.path.dirname(os.path.abspath(__file__))):
    if p not in sys.path:
        sys.path.insert(0, p)

from trained_ckpt import ensure_fixture  # noqa: E402


def true_label(row: str) -> int:
    # readname is column 4; the fixture names reads by cohort
    return 1 if row.split("\t", 5)[4].startswith("methread") else 0


def corrupt(src: str, dst: str, flip_frac: float, seed: int) -> dict:
    import numpy as np
    rows = open(src).read().splitlines()
    rng = np.random.default_rng(seed)
    flip = rng.random(len(rows)) < flip_frac
    out = []
    n_flipped = 0
    for r, f in zip(rows, flip):
        cols = r.split("\t")
        if f:
            cols[-1] = "1" if cols[-1] == "0" else "0"
            n_flipped += 1
        out.append("\t".join(cols))
    with open(dst, "w") as fh:
        fh.write("\n".join(out) + "\n")
    return {"rows": len(rows), "flipped": n_flipped}


def purity(path: str) -> dict:
    """Of the rows labeled 1 (the class denoise cleans), how many are
    TRULY methylated? Plus totals per label column."""
    pos = pos_true = neg = neg_true = 0
    with open(path) as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line:
                continue
            lab = line.rsplit("\t", 1)[1]
            t = true_label(line)
            if lab == "1":
                pos += 1
                pos_true += t
            else:
                neg += 1
                neg_true += 1 - t
    return {"pos_rows": pos,
            "pos_purity_pct": round(100.0 * pos_true / pos, 2) if pos
            else None,
            "neg_rows": neg,
            "neg_purity_pct": round(100.0 * neg_true / neg, 2) if neg
            else None}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--flip_frac", type=float, default=0.2)
    ap.add_argument("--iterations", type=int, default=3)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--seed", type=int, default=77)
    ap.add_argument("--out", default=os.path.join(REPO, "docs",
                                                  "DENOISE_EVAL.md"))
    args = ap.parse_args()

    meta = ensure_fixture()
    td_ctx = tempfile.TemporaryDirectory()
    td = td_ctx.name
    noisy = os.path.join(td, "train_noisy.tsv")
    stats = corrupt(meta["train_tsv"], noisy, args.flip_frac, args.seed)
    before = purity(noisy)
    truth_before = purity(meta["train_tsv"])

    env = dict(os.environ, PYTHONPATH=os.pathsep.join(
        [REPO] + [p for p in os.environ.get("PYTHONPATH", "")
                  .split(os.pathsep) if p]))
    t0 = time.time()
    cmd = [sys.executable, "-m", "deepsignal_plant_tpu", "denoise",
           "--train_file", noisy,
           "--iterations", str(args.iterations),
           "--rounds", str(args.rounds),
           "--epoch_num", str(args.epochs),
           "--seed", str(args.seed)]
    r = subprocess.run(cmd, env=env, capture_output=True, text=True)
    wall = time.time() - t0
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-2000:] + "\n" + r.stderr[-4000:])
        raise RuntimeError("denoise failed")
    # denoise prints "###### denoised file for training: {path}"
    final = None
    for line in r.stdout.splitlines():
        if "denoised file for training:" in line:
            cand = line.rsplit(":", 1)[1].strip()
            if os.path.isfile(cand):
                final = cand
    if final is None:
        sys.stderr.write(r.stdout[-3000:])
        raise RuntimeError("could not locate the denoised output file")
    after = purity(final)

    res = {"input_rows": stats["rows"], "flipped": stats["flipped"],
           "flip_frac": args.flip_frac,
           "iterations": args.iterations, "rounds": args.rounds,
           "pos_purity_before_pct": before["pos_purity_pct"],
           "pos_purity_after_pct": after["pos_purity_pct"],
           "neg_purity_before_pct": before["neg_purity_pct"],
           "neg_purity_after_pct": after["neg_purity_pct"],
           "rows_after": after["pos_rows"] + after["neg_rows"],
           "pos_rows_after": after["pos_rows"],
           "denoise_wall_s": round(wall, 1)}

    lines = [
        "# Denoise quality evaluation",
        "",
        "Does the cross-rank label-cleaning loop (reference "
        "denoise.py:318) actually clean? Ground truth comes from the "
        "trained fixture's read names (benchmarks/trained_ckpt.py): "
        "methylated/unmethylated cohorts are known per row regardless "
        "of the label column.",
        "",
        f"- input: the fixture training set ({stats['rows']} rows, "
        f"true-label purity {truth_before['pos_purity_pct']}%) with "
        f"{args.flip_frac:.0%} of label columns flipped "
        f"({stats['flipped']} rows)",
        f"- run: CLI `denoise --iterations {args.iterations} --rounds "
        f"{args.rounds} --epoch_num {args.epochs} --seed {args.seed}` "
        f"(signal_bilstm scorer, reference defaults otherwise); "
        f"wall {res['denoise_wall_s']}s",
        "",
        "| metric | before | after |",
        "|---|---|---|",
        f"| label-1 rows (the cleaned class) | {before['pos_rows']} | "
        f"{after['pos_rows']} |",
        f"| label-1 purity (truly methylated) | "
        f"{before['pos_purity_pct']}% | {after['pos_purity_pct']}% |",
        f"| label-0 purity (truly unmethylated) | "
        f"{before['neg_purity_pct']}% | {after['neg_purity_pct']}% |",
        "",
        "```json", json.dumps(res, indent=2), "```", ""]
    with open(args.out, "w") as fh:
        fh.write("\n".join(lines))
    print(f"report written to {args.out}")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
