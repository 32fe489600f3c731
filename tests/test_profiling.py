"""Observability: stage counters and the jax.profiler trace flag."""
import os

import numpy as np

from make_synthetic import synth_feature_rows, write_feature_file

from deepsignal_plant_tpu.utils.prof import PROFILER, Profiler, device_trace


def test_profiler_stage_accounting():
    p = Profiler()
    with p.stage("parse", items=100):
        pass
    with p.stage("parse", items=50):
        pass
    with p.stage("format"):
        pass
    rep = p.report()
    assert "parse" in rep and "format" in rep
    assert p.stages["parse"].calls == 2
    assert p.stages["parse"].items == 150
    assert p.stages["parse"].seconds >= 0


def test_device_trace_writes_profile(tmp_path):
    import jax
    import jax.numpy as jnp
    trace_dir = str(tmp_path / "trace")
    with device_trace(trace_dir):
        jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    # a profile dump appears under the trace dir
    found = []
    for root, _dirs, files in os.walk(trace_dir):
        found += files
    assert found, "jax.profiler trace produced no files"


def test_call_mods_verbose_stages(tmp_path, rng, capsys):
    import jax

    from deepsignal_plant_tpu.cli import main as cli_main
    from deepsignal_plant_tpu.config import ModelConfig
    from deepsignal_plant_tpu.models.bilstm import init_params
    from deepsignal_plant_tpu.models.convert import save_checkpoint

    feat = write_feature_file(str(tmp_path / "f.tsv"),
                              synth_feature_rows(rng, 2, 20))
    cfg = ModelConfig(hidden_size=32, dropout_rate=0.0)
    ckpt = str(tmp_path / "m.ckpt.npz")
    save_checkpoint(ckpt, init_params(jax.random.PRNGKey(0), cfg), cfg)
    out = str(tmp_path / "c.tsv")
    cli_main(["call_mods", "-i", feat, "-m", ckpt, "-o", out,
              "--hid_rnn", "32", "--device_batch", "40",
              "--verbose_stages"])
    printed = capsys.readouterr().out
    assert "dispatch" in printed and "format" in printed
