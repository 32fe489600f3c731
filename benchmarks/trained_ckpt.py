"""Trained-checkpoint fixture for the agreement gates (VERDICT r3 item 1).

All round-3 call-agreement evidence except the bf16 gate was produced on
RANDOM-INIT weights, where probs cluster at ~0.5 and agreement carries no
signal. This module builds the missing evidence base offline:

1. synthesize a methylation fixture — tombo fast5s where "methylated"
   reads carry a ~+1 sigma raw-signal shift at CG sites (mirroring how 5mC
   shifts nanopore current; tests/make_synthetic.py meth_mode);
2. extract labeled features with OUR extractor (methylated cohort
   --methy_label 1, unmethylated 0) — the reference's own training recipe
   (reference README.md:171-227: extract with labels from truth sets);
3. train the flagship both_bilstm (full size: hid 256, b13/s16) to
   convergence on those features;
4. export the weights BOTH ways — native .npz and a reference-layout torch
   .ckpt (models/convert.params_to_torch_state_dict) — and verify the
   torch->npz round trip is exact.

The resulting checkpoint separates classes with large margins on features
extracted from held-out fixture reads, so call agreement between planes
(f32/bf16, f32/f16/int8 wires, ours-vs-reference) finally measures
numerics, not coin flips. Consumers: benchmarks/trained_gates.py,
benchmarks/parity_run.py --trained.

Artifacts are cached under --out (default benchmarks/.trained_fixture/,
not committed — the torch ckpt is ~33 MB); meta.json records the training
evidence. Deterministic given the seed.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.join(REPO, "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)

DEFAULT_OUT = os.path.join(REPO, "benchmarks", ".trained_fixture")

#: bump when the fixture recipe changes (cache invalidation)
FIXTURE_VERSION = 2

#: meta keys whose paths must exist for a cached fixture to be valid
_ARTIFACT_KEYS = ("fasta", "eval_fast5_dir", "eval_features",
                  "torch_ckpt", "npz_ckpt", "train_tsv", "valid_tsv")


def _meta_valid(meta: dict) -> bool:
    return meta.get("version") == FIXTURE_VERSION and all(
        os.path.exists(meta.get(k, "")) for k in _ARTIFACT_KEYS)


def _extract(fast5_dir: str, fasta: str, out_tsv: str, methy_label: int,
             motifs: str, nproc: int = 4) -> None:
    env = dict(os.environ, PYTHONPATH=os.pathsep.join(
        [REPO] + [p for p in os.environ.get("PYTHONPATH", "")
                  .split(os.pathsep) if p]))
    cmd = [sys.executable, "-m", "deepsignal_plant_tpu", "extract",
           "--fast5_dir", fast5_dir, "--write_path", out_tsv,
           "--reference_path", fasta, "--motifs", motifs,
           "--methy_label", str(methy_label), "--downsample", "compat",
           "--nproc", str(nproc)]
    r = subprocess.run(cmd, env=env, capture_output=True, text=True)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-2000:] + "\n" + r.stderr[-4000:] + "\n")
        raise RuntimeError("extract failed for %s" % fast5_dir)


def build_fixture(out_dir: str = DEFAULT_OUT, seed: int = 1234,
                  n_train_reads: int = 32, n_eval_reads: int = 24,
                  read_len: int = 3000, motifs: str = "CG",
                  max_epochs: int = 8, force: bool = False) -> dict:
    """Build (or return cached) fixture; returns the meta dict with paths.

    ``n_train_reads`` is per cohort (methylated + unmethylated)."""
    meta_path = os.path.join(out_dir, "meta.json")
    if not force and os.path.isfile(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
        if _meta_valid(meta):
            return meta

    import numpy as np

    import make_synthetic as ms
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    genome = ms.synth_genome(rng, {"chr1": 60000, "chr2": 60000})
    fasta = ms.write_fasta(os.path.join(out_dir, "genome.fa"), genome)

    meth_dir = os.path.join(out_dir, "train_meth_fast5s")
    unmeth_dir = os.path.join(out_dir, "train_unmeth_fast5s")
    eval_dir = os.path.join(out_dir, "eval_fast5s")
    # shift_dac 250 (~1.7 sigma after MAD normalization) over the mod
    # base +-2: strong class separation -> large-margin calls, which is
    # what the agreement gates need (a checkpoint whose probs hug 0/1)
    inj = dict(motifs=motifs, shift_dac=250, shift_halfwidth=2)
    ms.synth_fast5_dir(meth_dir, genome, rng, n_reads=n_train_reads,
                       read_len=read_len, max_event_len=12,
                       meth_mode="all", name_prefix="methread", **inj)
    ms.synth_fast5_dir(unmeth_dir, genome, rng, n_reads=n_train_reads,
                       read_len=read_len, max_event_len=12,
                       meth_mode="none", name_prefix="unmethread")
    # held-out mixed cohort for the gates / parity run (meth decorrelated
    # from strand: reads r % 4 >= 2 are methylated)
    ms.synth_fast5_dir(eval_dir, genome, rng, n_reads=n_eval_reads,
                       read_len=read_len, max_event_len=12,
                       meth_mode="mixed", name_prefix="evalread", **inj)

    t0 = time.time()
    meth_tsv = os.path.join(out_dir, "feat_meth.tsv")
    unmeth_tsv = os.path.join(out_dir, "feat_unmeth.tsv")
    eval_tsv = os.path.join(out_dir, "eval_features.tsv")
    _extract(meth_dir, fasta, meth_tsv, 1, motifs)
    _extract(unmeth_dir, fasta, unmeth_tsv, 0, motifs)
    _extract(eval_dir, fasta, eval_tsv, 1, motifs)
    t_extract = time.time() - t0

    # shuffled 85/15 train/valid split over the union of both cohorts
    rows = open(meth_tsv).read().splitlines() + \
        open(unmeth_tsv).read().splitlines()
    order = rng.permutation(len(rows))
    n_valid = max(256, len(rows) // 7)
    train_tsv = os.path.join(out_dir, "train.tsv")
    valid_tsv = os.path.join(out_dir, "valid.tsv")
    with open(train_tsv, "w") as fh:
        fh.write("\n".join(rows[i] for i in order[n_valid:]) + "\n")
    with open(valid_tsv, "w") as fh:
        fh.write("\n".join(rows[i] for i in order[:n_valid]) + "\n")

    from deepsignal_plant_tpu.config import ModelConfig, TrainConfig
    from deepsignal_plant_tpu.io.dataset import FeatureDataset
    from deepsignal_plant_tpu.pipeline.train import train_loop

    model_cfg = ModelConfig(dropout_rate=0.5)   # flagship both_bilstm
    # adaptive batch: tiny smoke fixtures still need >= ~10 steps/epoch.
    # lr 0.005: the 8.2M-param model sees only a few hundred steps total
    # on this fixture; the reference default 0.001 measured ~flat over
    # the first 10 steps while 0.005 reached 0.94 on the smoke fixture
    bs = min(512, max(64, (len(order) - n_valid) // 16))
    train_cfg = TrainConfig(batch_size=bs, max_epoch_num=max_epochs,
                            min_epoch_num=max_epochs, lr=0.005,
                            lr_decay_step=max(2, max_epochs // 2),
                            step_interval=20, seed=seed)
    t0 = time.time()
    res = train_loop(model_cfg, train_cfg,
                     FeatureDataset.from_file(train_tsv),
                     FeatureDataset.from_file(valid_tsv),
                     out_dir + "/", verbose=False)
    t_train = time.time() - t0
    if res["best_accuracy"] < 0.99:
        raise RuntimeError(
            "trained fixture failed to converge: valid accuracy %.4f < "
            "0.99 — the agreement gates need large-margin calls"
            % res["best_accuracy"])

    # export both ways + exact round-trip check (npz -> torch -> params)
    import numpy as np
    import torch

    from deepsignal_plant_tpu.models.convert import (
        load_checkpoint, load_torch_checkpoint, params_to_torch_state_dict,
        save_checkpoint)
    params, _cfg = load_checkpoint(res["best_ckpt"])
    infer_cfg = model_cfg.with_(dropout_rate=0.0)
    npz_ckpt = os.path.join(out_dir, "model.trained.npz")
    save_checkpoint(npz_ckpt, params, infer_cfg)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in params_to_torch_state_dict(params, infer_cfg).items()}
    torch_ckpt = os.path.join(out_dir, "model.trained.ckpt")
    torch.save(sd, torch_ckpt)
    rt = load_torch_checkpoint(torch_ckpt, infer_cfg)
    flat_a = jax_tree_flatten(params)
    flat_b = jax_tree_flatten(rt)
    assert len(flat_a) == len(flat_b)
    roundtrip_exact = all(
        np.array_equal(np.asarray(a, np.float32), np.asarray(b, np.float32))
        for a, b in zip(flat_a, flat_b))
    if not roundtrip_exact:
        raise RuntimeError("torch<->npz checkpoint round trip not exact")

    meta = {
        "version": FIXTURE_VERSION, "seed": seed,
        "motifs": motifs, "read_len": read_len,
        "n_train_reads_per_cohort": n_train_reads,
        "n_eval_reads": n_eval_reads,
        "train_rows": len(order) - n_valid, "valid_rows": n_valid,
        "eval_rows": sum(1 for _ in open(eval_tsv)),
        "best_valid_accuracy": res["best_accuracy"],
        "train_seconds": round(t_train, 1),
        "extract_seconds": round(t_extract, 1),
        "train_backend": _backend_name(),
        "torch_npz_roundtrip_exact": roundtrip_exact,
        "fasta": fasta, "eval_fast5_dir": eval_dir,
        "eval_features": eval_tsv, "train_tsv": train_tsv,
        "valid_tsv": valid_tsv, "torch_ckpt": torch_ckpt,
        "npz_ckpt": npz_ckpt,
    }
    with open(meta_path, "w") as fh:
        json.dump(meta, fh, indent=2)
    return meta


def _backend_name() -> str:
    import jax
    return jax.default_backend()


def jax_tree_flatten(params) -> list:
    import jax
    return jax.tree_util.tree_leaves(params)


def ensure_fixture(out_dir: str = DEFAULT_OUT, cpu: bool = True) -> dict:
    """Return cached fixture meta, building it in a CPU subprocess when
    missing (training is small; CPU keeps the build deterministic and
    immune to tunnel weather — the consumers then run wherever they
    like)."""
    meta_path = os.path.join(out_dir, "meta.json")
    if os.path.isfile(meta_path):
        with open(meta_path) as fh:
            meta = json.load(fh)
        # same artifact-existence check as build_fixture: a partially
        # deleted fixture dir must trigger a rebuild, not dangling paths
        if _meta_valid(meta):
            return meta
    env = dict(os.environ, PYTHONPATH=os.pathsep.join(
        [REPO] + [p for p in os.environ.get("PYTHONPATH", "")
                  .split(os.pathsep) if p]))
    if cpu:
        env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--out", out_dir], env=env)
    if r.returncode != 0:
        raise RuntimeError("trained fixture build failed")
    with open(meta_path) as fh:
        return json.load(fh)


def main() -> None:
    ap = argparse.ArgumentParser()
    # the axon sitecustomize overrides JAX_PLATFORMS at interpreter
    # startup; honor a cpu request the way tests/conftest.py does
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    ap.add_argument("--out", default=DEFAULT_OUT)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--n_train_reads", type=int, default=32)
    ap.add_argument("--n_eval_reads", type=int, default=24)
    ap.add_argument("--read_len", type=int, default=3000)
    ap.add_argument("--max_epochs", type=int, default=8)
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()
    meta = build_fixture(args.out, seed=args.seed,
                         n_train_reads=args.n_train_reads,
                         n_eval_reads=args.n_eval_reads,
                         read_len=args.read_len, max_epochs=args.max_epochs,
                         force=args.force)
    print(json.dumps({k: meta[k] for k in
                      ("best_valid_accuracy", "train_rows", "eval_rows",
                       "train_seconds", "train_backend",
                       "torch_npz_roundtrip_exact")}))


if __name__ == "__main__":
    main()
