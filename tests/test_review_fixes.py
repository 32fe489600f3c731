"""Regression tests for the round-1 code-review findings."""
import os

import numpy as np
import pytest

from make_synthetic import synth_fast5_dir, synth_genome, write_fasta

from deepsignal_plant_tpu.pipeline.extract import (ExtractContext,
                                                   ExtractOptions,
                                                   extract_features)
from deepsignal_plant_tpu.utils.motifs import motif_locs_in_seq


def test_long_motif_scan_no_overflow():
    """Motifs of 8+ bases must scan (base-256 packing overflows int64)."""
    seq = "AACGCGCGCGCAA" + "CGCGCGCGC" + "TTTT"
    long_motif = "CGCGCGCGC"  # 9 bases
    locs = motif_locs_in_seq(seq, [long_motif], 0)
    # oracle: naive substring scan
    expect = [i for i in range(len(seq) - 8)
              if seq[i:i + 9] == long_motif]
    assert locs == expect and len(locs) > 0
    # 8-mer boundary case
    locs8 = motif_locs_in_seq(seq, ["CGCGCGCG"], 0)
    expect8 = [i for i in range(len(seq) - 7) if seq[i:i + 8] == "CGCGCGCG"]
    assert locs8 == expect8


def test_even_kmer_len_rejected():
    with pytest.raises(ValueError, match="odd"):
        ExtractContext.build(ExtractOptions(kmer_len=12))


def test_seeded_compat_extraction_reproducible(tmp_path, rng):
    """--downsample compat --seed N gives byte-identical output across
    runs (per-batch RNG, independent of worker pids)."""
    genome = synth_genome(rng, {"chr1": 2000})
    fasta = write_fasta(str(tmp_path / "ref.fa"), genome)
    f5dir = str(tmp_path / "f5")
    # long events (> signal_len) so compat mode actually randomizes
    synth_fast5_dir(f5dir, genome, rng, n_reads=4, read_len=80,
                    max_event_len=40)
    ctx = ExtractContext.build(ExtractOptions(
        motifs="CG", reference_path=fasta, downsample="compat"))
    out1 = str(tmp_path / "a.tsv")
    out2 = str(tmp_path / "b.tsv")
    extract_features(f5dir, True, ctx, out1, nproc=1, f5_batch_size=2,
                     seed=42)
    extract_features(f5dir, True, ctx, out2, nproc=1, f5_batch_size=2,
                     seed=42)
    assert open(out1).read() == open(out2).read()
    # a different seed gives different downsampling
    out3 = str(tmp_path / "c.tsv")
    extract_features(f5dir, True, ctx, out3, nproc=1, f5_batch_size=2,
                     seed=43)
    assert open(out1).read() != open(out3).read()


def test_seeded_extraction_reproducible_with_worker_pool(tmp_path, rng):
    """--seed must give byte-identical output even with a real process
    pool (submission-order drain, not as_completed)."""
    genome = synth_genome(rng, {"chr1": 2500})
    fasta = write_fasta(str(tmp_path / "ref.fa"), genome)
    f5dir = str(tmp_path / "f5")
    synth_fast5_dir(f5dir, genome, rng, n_reads=6, read_len=80,
                    max_event_len=40)
    ctx = ExtractContext.build(ExtractOptions(
        motifs="CG", reference_path=fasta, downsample="compat"))
    out1 = str(tmp_path / "a.tsv")
    out2 = str(tmp_path / "b.tsv")
    extract_features(f5dir, True, ctx, out1, nproc=4, f5_batch_size=1,
                     seed=7)
    extract_features(f5dir, True, ctx, out2, nproc=4, f5_batch_size=1,
                     seed=7)
    assert open(out1).read() == open(out2).read()


def test_async_writer_error_does_not_hang(tmp_path):
    """A dead writer thread surfaces its error instead of deadlocking
    producers (review finding: close() blocked on a full queue)."""
    from deepsignal_plant_tpu.io.batching import AsyncWriter

    w = AsyncWriter(str(tmp_path / "out.tsv"), depth=2)
    w._fh.close()  # simulate the fd dying mid-run
    with pytest.raises(Exception):
        # enough writes to fill the queue past its depth, then close
        for _ in range(50):
            w.write_rows(["row"] * 10)
        w.close()


def test_make_mesh_uses_local_devices():
    import jax

    from deepsignal_plant_tpu.parallel.mesh import make_mesh
    mesh = make_mesh()
    assert mesh.devices.size == len(jax.local_devices())


def test_stall_watchdog_flags_and_fills():
    """VERDICT r4 item 5: the dispatch watchdog flags round trips past
    max(floor, ratio x running median) and fills CallStats."""
    from deepsignal_plant_tpu.pipeline.call_mods import (CallStats,
                                                         StallWatchdog)
    wd = StallWatchdog(abs_floor_s=0.01, ratio=8.0)
    # cold threshold is lenient (compiles): max(floor, 30)
    assert wd.threshold() >= 30.0
    for _ in range(5):
        with wd.track():
            pass                       # ~0s dispatches
    # warm now: median ~0 -> threshold = abs floor
    assert wd.threshold() == pytest.approx(0.01)
    import time as _t
    with wd.track():
        _t.sleep(0.05)                 # stall: 5x the floor
    assert wd.stall_events == 1
    assert wd.stall_seconds > 0.0
    st = wd.fill(CallStats(sites=10, seconds=1.0))
    assert st.stalled and st.stall_events == 1

    # clean runs stay unflagged
    wd2 = StallWatchdog(abs_floor_s=5.0)
    for _ in range(6):
        with wd2.track():
            pass
    st2 = wd2.fill(CallStats())
    assert not st2.stalled and st2.stall_seconds == 0.0


def test_engine_run_reports_stall_fields(tmp_path):
    """End-to-end: a normal engine run returns CallStats with the stall
    fields present and zero (no storm on CPU)."""
    import jax
    import numpy as np

    from deepsignal_plant_tpu.config import CallConfig, ModelConfig
    from deepsignal_plant_tpu.models.bilstm import init_params
    from deepsignal_plant_tpu.models.convert import save_checkpoint
    from deepsignal_plant_tpu.pipeline.call_mods import CallModsEngine
    sys_path_tests = os.path.join(os.path.dirname(__file__))
    import sys
    sys.path.insert(0, sys_path_tests)
    from make_synthetic import synth_feature_rows
    rows = synth_feature_rows(np.random.default_rng(5), 4, 10)
    feat = tmp_path / "f.tsv"
    feat.write_text("\n".join(rows) + "\n")
    cfg = ModelConfig(hidden_size=16, dropout_rate=0.0)
    ckpt = str(tmp_path / "m.npz")
    save_checkpoint(ckpt, init_params(jax.random.PRNGKey(0), cfg), cfg)
    eng = CallModsEngine(ckpt, cfg, CallConfig(device_batch=16))
    st = eng.run_features_file(str(feat), str(tmp_path / "o.tsv"))
    assert st.sites == 40
    assert st.stall_events == 0 and not st.stalled
