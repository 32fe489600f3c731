"""Engine coverage: all model variants through the CLI, and the fused
fast5 -> call_mods path with region/positions filters."""
import os

import numpy as np
import pytest

from make_synthetic import (synth_fast5_dir, synth_feature_rows,
                            synth_genome, write_fasta, write_feature_file)

from deepsignal_plant_tpu.cli import main as cli_main
from deepsignal_plant_tpu.config import ModelConfig
from deepsignal_plant_tpu.models.bilstm import init_params
from deepsignal_plant_tpu.models.convert import save_checkpoint


@pytest.mark.parametrize("module", ["seq_bilstm", "signal_bilstm"])
def test_call_mods_model_variants(tmp_path, rng, module):
    import jax
    cfg = ModelConfig(hidden_size=32, dropout_rate=0.0, module=module)
    ckpt = str(tmp_path / f"{module}.ckpt.npz")
    save_checkpoint(ckpt, init_params(jax.random.PRNGKey(0), cfg), cfg)
    feat = write_feature_file(str(tmp_path / "f.tsv"),
                              synth_feature_rows(rng, 3, 20))
    out = str(tmp_path / "calls.tsv")
    cli_main(["call_mods", "-i", feat, "-m", ckpt, "-o", out,
              "--hid_rnn", "32", "--model_type", module,
              "--device_batch", "64"])
    lines = open(out).read().splitlines()
    assert len(lines) == 60
    assert all(len(l.split("\t")) == 10 for l in lines)


@pytest.fixture(scope="module")
def fused_env(tmp_path_factory):
    rng = np.random.default_rng(17)
    genome = synth_genome(rng, {"chr1": 2500, "chr2": 2500})
    d = tmp_path_factory.mktemp("fused")
    fasta = write_fasta(str(d / "ref.fa"), genome)
    f5dir = str(d / "f5")
    synth_fast5_dir(f5dir, genome, rng, n_reads=6, read_len=150)

    import jax
    cfg = ModelConfig(hidden_size=32, dropout_rate=0.0)
    ckpt = str(d / "m.ckpt.npz")
    save_checkpoint(ckpt, init_params(jax.random.PRNGKey(1), cfg), cfg)
    return f5dir, fasta, ckpt, d


def _run_fused(fused_env, out_name, extra=()):
    f5dir, fasta, ckpt, d = fused_env
    out = str(d / out_name)
    cli_main(["call_mods", "-i", f5dir, "-m", ckpt, "-o", out,
              "--hid_rnn", "32", "--device_batch", "64",
              "--reference_path", fasta, "--motifs", "CG",
              "--nproc", "2", *extra])
    return out


def test_fused_fast5_to_calls(fused_env):
    out = _run_fused(fused_env, "all.tsv")
    lines = open(out).read().splitlines()
    assert len(lines) > 0
    for ln in lines:
        w = ln.split("\t")
        assert len(w) == 10
        assert w[0] in ("chr1", "chr2")


def test_fused_region_filter(fused_env):
    out_all = _run_fused(fused_env, "all2.tsv")
    out_r = _run_fused(fused_env, "chr1.tsv", ["--region", "chr1"])
    all_lines = open(out_all).read().splitlines()
    r_lines = open(out_r).read().splitlines()
    assert 0 < len(r_lines) < len(all_lines)
    assert all(l.split("\t")[0] == "chr1" for l in r_lines)
    # region-filtered calls are a subset of the full run's sites
    keys = {tuple(l.split("\t")[:6]) for l in all_lines}
    assert all(tuple(l.split("\t")[:6]) in keys for l in r_lines)


def test_fused_positions_filter(fused_env):
    out_all = _run_fused(fused_env, "all3.tsv")
    lines = open(out_all).read().splitlines()
    picked = [l.split("\t") for l in lines[:3]]
    f5dir, fasta, ckpt, d = fused_env
    posfile = str(d / "pos.tsv")
    with open(posfile, "w") as wf:
        for w in picked:
            wf.write("\t".join([w[0], w[1], w[2]]) + "\n")
    out_p = _run_fused(fused_env, "pos.tsv.calls", ["--positions", posfile])
    p_lines = open(out_p).read().splitlines()
    got = {tuple(l.split("\t")[:3]) for l in p_lines}
    want = {tuple(w[:3]) for w in picked}
    assert got == want
