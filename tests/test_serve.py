"""serve — watch-directory call_mods with one warm engine."""
import os
import subprocess
import sys

import numpy as np
import pytest

import jax

from make_synthetic import synth_feature_rows, write_feature_file

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    from deepsignal_plant_tpu.config import ModelConfig
    from deepsignal_plant_tpu.models.bilstm import init_params
    from deepsignal_plant_tpu.models.convert import save_checkpoint

    path = str(tmp_path_factory.mktemp("m") / "m.ckpt.npz")
    cfg = ModelConfig(hidden_size=32, dropout_rate=0.0)
    save_checkpoint(path, init_params(jax.random.PRNGKey(0), cfg), cfg)
    return path, cfg


def _make_engine(ckpt):
    from deepsignal_plant_tpu.config import CallConfig
    from deepsignal_plant_tpu.pipeline.call_mods import CallModsEngine

    path, cfg = ckpt
    return CallModsEngine(path, cfg, CallConfig(device_batch=256))


def test_watch_server_backlog_and_markers(tmp_path, rng, ckpt):
    from deepsignal_plant_tpu.pipeline.serve import WatchServer

    watch = tmp_path / "in"
    out = tmp_path / "out"
    watch.mkdir()
    write_feature_file(str(watch / "a.tsv"),
                       synth_feature_rows(rng, 4, 16))
    write_feature_file(str(watch / "b.tsv"),
                       synth_feature_rows(rng, 3, 16))
    (watch / "ignored.txt").write_text("not features\n")
    (watch / ".hidden.tsv").write_text("skip\n")

    server = WatchServer(_make_engine(ckpt), str(watch), str(out),
                         poll_s=0.01)
    server.run(once=True)

    for name, rows in (("a.tsv", 4 * 16), ("b.tsv", 3 * 16)):
        res = out / f"{name}.call_mods.tsv"
        assert res.exists()
        assert sum(1 for _ in open(res)) == rows
        marker = (out / f"{name}.done").read_text().split("\t")
        assert int(marker[0]) == rows
    assert not (out / "ignored.txt.call_mods.tsv").exists()

    # at-most-once: a second backlog run reprocesses nothing
    before = {p.name: p.stat().st_mtime_ns for p in out.iterdir()}
    server2 = WatchServer(_make_engine(ckpt), str(watch), str(out),
                          poll_s=0.01)
    server2.run(once=True)
    after = {p.name: p.stat().st_mtime_ns for p in out.iterdir()}
    assert before == after


def test_watch_server_failed_marker_keeps_serving(tmp_path, rng, ckpt):
    from deepsignal_plant_tpu.pipeline.serve import WatchServer

    watch = tmp_path / "in"
    out = tmp_path / "out"
    watch.mkdir()
    (watch / "bad.tsv").write_text("this\tis\tnot\ta\tfeature\trow\n")
    write_feature_file(str(watch / "good.tsv"),
                       synth_feature_rows(rng, 2, 8))

    server = WatchServer(_make_engine(ckpt), str(watch), str(out),
                         poll_s=0.01)
    server.run(once=True)

    assert (out / "bad.tsv.failed").exists()
    assert not (out / "bad.tsv.call_mods.tsv").exists()
    assert (out / "good.tsv.done").exists()
    assert sum(1 for _ in open(out / "good.tsv.call_mods.tsv")) == 16


def test_watch_server_waits_for_stable_files(tmp_path, rng, ckpt):
    from deepsignal_plant_tpu.pipeline.serve import WatchServer

    watch = tmp_path / "in"
    out = tmp_path / "out"
    watch.mkdir()
    write_feature_file(str(watch / "x.tsv"), synth_feature_rows(rng, 2, 8))

    server = WatchServer(_make_engine(ckpt), str(watch), str(out),
                         poll_s=0.01)
    # first sweep only records the signature — nothing processed yet
    assert server.sweep() == 0
    # file grows between polls: still not stable
    with open(watch / "x.tsv", "a") as fh:
        fh.write("\n".join(synth_feature_rows(rng, 1, 8)) + "\n")
    assert server.sweep() == 0
    # unchanged across two polls: processed now
    assert server.sweep() == 1
    assert (out / "x.tsv.done").exists()
    assert sum(1 for _ in open(out / "x.tsv.call_mods.tsv")) == 3 * 8


def test_watch_server_complete_marker(tmp_path, rng, ckpt):
    """X.complete makes X ready on the FIRST sweep (no stability wait);
    require_complete makes the marker the only pickup signal."""
    from deepsignal_plant_tpu.pipeline.serve import WatchServer

    watch = tmp_path / "in"
    out = tmp_path / "out"
    watch.mkdir()
    write_feature_file(str(watch / "m.tsv"), synth_feature_rows(rng, 2, 8))
    (watch / "m.tsv.complete").touch()
    write_feature_file(str(watch / "u.tsv"), synth_feature_rows(rng, 1, 8))

    server = WatchServer(_make_engine(ckpt), str(watch), str(out),
                         poll_s=0.01)
    # marked file processes immediately; unmarked still waits for the
    # two-poll stability signature
    assert server.sweep() == 1
    assert (out / "m.tsv.done").exists()
    assert not (out / "u.tsv.done").exists()
    assert server.sweep() == 1
    assert (out / "u.tsv.done").exists()

    # require_complete: unmarked inputs are NEVER picked up
    watch2 = tmp_path / "in2"
    out2 = tmp_path / "out2"
    watch2.mkdir()
    write_feature_file(str(watch2 / "m.tsv"), synth_feature_rows(rng, 2, 8))
    (watch2 / "m.tsv.complete").touch()
    write_feature_file(str(watch2 / "u.tsv"), synth_feature_rows(rng, 1, 8))
    strict = WatchServer(_make_engine(ckpt), str(watch2), str(out2),
                         poll_s=0.01, require_complete=True)
    for _ in range(3):
        strict.sweep()
    assert (out2 / "m.tsv.done").exists()
    assert not (out2 / "u.tsv.done").exists()
    # producer finishes the upload and marks it
    (watch2 / "u.tsv.complete").touch()
    assert strict.sweep() == 1
    assert (out2 / "u.tsv.done").exists()


def test_serve_cli_once(tmp_path, rng, ckpt):
    """End-to-end through the CLI with --once."""
    watch = tmp_path / "in"
    out = tmp_path / "out"
    watch.mkdir()
    write_feature_file(str(watch / "f.tsv"), synth_feature_rows(rng, 3, 8))

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # PYTHONPATH = repo ONLY: drop the axon sitecustomize dir so the TPU
    # plugin never registers in the child — observed one suite run where
    # the child resolved the axon backend despite JAX_PLATFORMS=cpu
    # (plugin registration can pre-empt env selection) and hung past the
    # test timeout attaching to a busy chip
    env["PYTHONPATH"] = REPO
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run(
        [sys.executable, "-m", "deepsignal_plant_tpu", "serve",
         "--watch_dir", str(watch), "--result_dir", str(out),
         "--model_path", ckpt[0], "--hid_rnn", "32", "--once",
         "--device_batch", "256"],
        env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-1500:]
    assert "compute float32" in r.stdout, r.stdout[-500:]
    assert (out / "f.tsv.done").exists()
    assert sum(1 for _ in open(out / "f.tsv.call_mods.tsv")) == 24


def test_watch_server_run_folder_fused(tmp_path, rng, ckpt):
    """A subdirectory of fast5s (a sequencer run-folder) goes through
    the fused extract->call path; non-fast5 dirs are ignored."""
    import argparse

    from make_synthetic import synth_fast5_dir, synth_genome
    from deepsignal_plant_tpu.pipeline.serve import WatchServer

    watch = tmp_path / "in"
    out = tmp_path / "out"
    watch.mkdir()
    genome = synth_genome(rng, {"chr1": 4000})
    synth_fast5_dir(str(watch / "run_0001"), genome, rng, n_reads=4,
                    read_len=300)
    (watch / "not_a_run").mkdir()
    (watch / "not_a_run" / "x.txt").write_text("hi")

    ex_args = argparse.Namespace(
        recursively="yes", corrected_group="RawGenomeCorrected_000",
        basecall_subgroup="BaseCalled_template", normalize_method="mad",
        motifs="CG", mod_loc=0, seq_len=13, signal_len=16, positions=None,
        region=None, reference_path=None, is_dna="yes", f5_batch_size=30,
        nproc=2, gzip=False)
    server = WatchServer(_make_engine(ckpt), str(watch), str(out),
                         poll_s=0.01, extract_args=ex_args)
    server.run(once=True)

    res = out / "run_0001.call_mods.tsv"
    assert (out / "run_0001.done").exists()
    assert res.exists() and sum(1 for _ in open(res)) > 0
    assert not (out / "not_a_run.done").exists()

    # without extract_args, run-folders are not picked up at all
    server2 = WatchServer(_make_engine(ckpt), str(watch),
                          str(tmp_path / "out2"), poll_s=0.01)
    server2.run(once=True)
    assert not (tmp_path / "out2" / "run_0001.done").exists()


def test_watch_server_gz_and_npz_inputs(tmp_path, rng, ckpt):
    """.tsv.gz and .npz inputs call identically to the same rows as
    plain TSV (serve accepts every input plane the engine does)."""
    import gzip

    from deepsignal_plant_tpu.io.batching import batches_from_features_file
    from deepsignal_plant_tpu.pipeline.serve import WatchServer
    from deepsignal_plant_tpu.utils.formats import save_feature_npz

    watch = tmp_path / "in"
    out = tmp_path / "out"
    watch.mkdir()
    rows = synth_feature_rows(rng, 3, 8)
    write_feature_file(str(watch / "a.tsv"), rows)
    with gzip.open(watch / "b.tsv.gz", "wt") as fh:
        fh.write("\n".join(rows) + "\n")
    pb = next(batches_from_features_file(str(watch / "a.tsv"), 256))
    from deepsignal_plant_tpu.io.batching import _split
    fb, _ = _split(pb.features, pb.n_valid)
    save_feature_npz(str(watch / "c.npz"), fb)

    server = WatchServer(_make_engine(ckpt), str(watch), str(out),
                         poll_s=0.01)
    server.run(once=True)

    ref = (out / "a.tsv.call_mods.tsv").read_bytes()
    assert len(ref.splitlines()) == 24
    assert (out / "b.tsv.gz.done").exists()
    assert (out / "b.tsv.gz.call_mods.tsv").read_bytes() == ref
    assert (out / "c.npz.done").exists()
    assert (out / "c.npz.call_mods.tsv").read_bytes() == ref


def test_watch_server_gzip_mode(tmp_path, rng, ckpt):
    """Regression: in gzip mode the engine's AsyncWriter forces a .gz
    suffix on its output path; a temp name without it meant the rename
    found nothing and EVERY gzip input was marked failed."""
    import gzip

    from deepsignal_plant_tpu.pipeline.serve import WatchServer

    watch = tmp_path / "in"
    out = tmp_path / "out"
    watch.mkdir()
    write_feature_file(str(watch / "a.tsv"),
                       synth_feature_rows(rng, 2, 8))

    server = WatchServer(_make_engine(ckpt), str(watch), str(out),
                         poll_s=0.01, is_gzip=True)
    server.run(once=True)

    assert (out / "a.tsv.done").exists(), \
        (out / "a.tsv.failed").read_text() \
        if (out / "a.tsv.failed").exists() else "no marker at all"
    res = out / "a.tsv.call_mods.tsv.gz"
    assert res.exists()
    with gzip.open(res, "rt") as fh:
        assert sum(1 for _ in fh) == 16
    # no stray temp artifacts
    assert not [p for p in out.iterdir() if p.name.startswith(".")]


def test_watch_server_same_dir_no_self_ingestion(tmp_path, rng, ckpt):
    """result_dir == watch_dir must not re-call our own outputs
    (X.call_mods.tsv matches the input extensions)."""
    from deepsignal_plant_tpu.pipeline.serve import WatchServer

    d = tmp_path / "both"
    d.mkdir()
    write_feature_file(str(d / "a.tsv"), synth_feature_rows(rng, 2, 8))

    server = WatchServer(_make_engine(ckpt), str(d), str(d), poll_s=0.01)
    server.run(once=True)
    assert (d / "a.tsv.done").exists()
    # further sweeps must not pick up a.tsv.call_mods.tsv (or markers)
    for _ in range(3):
        assert server.sweep() == 0
    names = sorted(p.name for p in d.iterdir())
    assert "a.tsv.call_mods.tsv.call_mods.tsv" not in names
    assert not any(".done.call_mods" in n or ".failed.call_mods" in n
                   for n in names)
