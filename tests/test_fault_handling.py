"""Failure handling: corrupt inputs are counted and skipped, not fatal
(reference behavior: per-read try/except with an error counter,
extract_features.py:373-375,649)."""
import os

import numpy as np

from make_synthetic import synth_fast5_dir, synth_genome, write_fasta

from deepsignal_plant_tpu.pipeline.extract import (ExtractContext,
                                                   ExtractOptions,
                                                   extract_features)


def test_corrupt_fast5_counted_not_fatal(tmp_path, rng):
    genome = synth_genome(rng, {"chr1": 1500})
    fasta = write_fasta(str(tmp_path / "ref.fa"), genome)
    f5dir = str(tmp_path / "f5")
    n = synth_fast5_dir(f5dir, genome, rng, n_reads=4, read_len=100)
    # two corrupt files: truncated garbage and an empty file
    with open(os.path.join(f5dir, "corrupt_a.fast5"), "wb") as fh:
        fh.write(b"\x89HDF\r\n\x1a\nnot really hdf5")
    open(os.path.join(f5dir, "corrupt_b.fast5"), "wb").close()

    ctx = ExtractContext.build(ExtractOptions(motifs="CG",
                                              reference_path=fasta))
    out = str(tmp_path / "features.tsv")
    total, errors = extract_features(f5dir, True, ctx, out, nproc=2,
                                     f5_batch_size=2)
    assert total == n + 2
    assert errors == 2
    lines = open(out).read().splitlines()
    assert len(lines) > 0  # good reads still extracted
    assert all(len(l.split("\t")) == 12 for l in lines)


def test_fast5_without_alignment_skipped(tmp_path, rng):
    """A fast5 missing the tombo Alignment group is skipped silently
    (reference returns empty attrs, extract_features.py:172-173)."""
    import h5py

    genome = synth_genome(rng, {"chr1": 1500})
    fasta = write_fasta(str(tmp_path / "ref.fa"), genome)
    f5dir = str(tmp_path / "f5")
    synth_fast5_dir(f5dir, genome, rng, n_reads=2, read_len=100)
    # valid HDF5 with raw signal but no tombo analysis
    with h5py.File(os.path.join(f5dir, "noalign.fast5"), "w") as h5:
        g = h5.create_group("Raw/Reads/Read_0")
        g.attrs["read_id"] = np.bytes_("noalign")
        g.create_dataset("Signal", data=np.zeros(10, np.int16))

    ctx = ExtractContext.build(ExtractOptions(motifs="CG",
                                              reference_path=fasta))
    out = str(tmp_path / "features.tsv")
    total, errors = extract_features(f5dir, True, ctx, out, nproc=1)
    assert total == 3
    assert errors == 0  # skip, not error — matches reference semantics


def test_multiread_fast5_actionable_error(tmp_path, rng, capsys):
    """A multi-read fast5 container (top-level read_<uuid> groups) raises
    MultiReadFast5Error with the multi_to_single_fast5 conversion hint
    (reference README.md:177-188); extraction counts it as an error and
    prints the hint once instead of silently skipping every file."""
    import h5py
    import pytest

    from deepsignal_plant_tpu.io.fast5 import (MultiReadFast5Error,
                                               read_tombo_fast5)

    genome = synth_genome(rng, {"chr1": 1500})
    fasta = write_fasta(str(tmp_path / "ref.fa"), genome)
    f5dir = str(tmp_path / "f5")
    n = synth_fast5_dir(f5dir, genome, rng, n_reads=2, read_len=100)
    multi = os.path.join(f5dir, "multi.fast5")
    with h5py.File(multi, "w") as h5:
        for rid in ("read_0a1b", "read_9f3c"):
            g = h5.create_group(f"{rid}/Raw")
            g.create_dataset("Signal", data=np.zeros(10, np.int16))

    with pytest.raises(MultiReadFast5Error, match="multi_to_single_fast5"):
        read_tombo_fast5(multi)

    ctx = ExtractContext.build(ExtractOptions(motifs="CG",
                                              reference_path=fasta))
    out = str(tmp_path / "features.tsv")
    total, errors = extract_features(f5dir, True, ctx, out, nproc=1)
    assert total == n + 1
    assert errors == 1
    assert "multi_to_single_fast5" in capsys.readouterr().out


class _FakeVbzDset:
    _filters = {"32020": (1, "vbz")}

    def __getitem__(self, key):
        raise OSError("Can't read data (can't open directory: "
                      "/usr/local/hdf5/lib/plugin)")


class _FakePlainDset:
    _filters = {}

    def __getitem__(self, key):
        raise OSError("truncated file")


def test_vbz_missing_plugin_actionable_error():
    """VBZ-compressed datasets without the plugin raise an error naming
    HDF5_PLUGIN_PATH (reference README.md:239 requirement surfaced)."""
    import pytest
    from deepsignal_plant_tpu.io import fast5 as f5
    with pytest.raises(f5.VBZPluginError, match="HDF5_PLUGIN_PATH"):
        f5._read_dataset(_FakeVbzDset(), "/x/read.fast5", "Signal")
    # non-VBZ read errors pass through untranslated
    with pytest.raises(OSError) as ei:
        f5._read_dataset(_FakePlainDset(), "/x/read.fast5", "Signal")
    assert not isinstance(ei.value, f5.VBZPluginError)


def test_vbz_probe_is_bool():
    from deepsignal_plant_tpu.io.fast5 import vbz_plugin_available
    assert isinstance(vbz_plugin_available(), bool)


def test_mutated_fast5_never_aborts_reader(tmp_path, rng):
    """Byte-level mutations of a valid fast5 must yield a TomboRead, a
    None skip, or a Python exception through the public reader — never
    a crash (the low-level path must punt cleanly on anything odd)."""
    from make_synthetic import synth_fast5_dir, synth_genome
    from deepsignal_plant_tpu.io.fast5 import read_tombo_fast5

    genome = synth_genome(rng, {"chr1": 3000})
    f5dir = tmp_path / "f5"
    synth_fast5_dir(str(f5dir), genome, rng, n_reads=1, read_len=200)
    src = next(f5dir.glob("*.fast5"))
    data = bytearray(src.read_bytes())

    mut = tmp_path / "mut.fast5"
    outcomes = {"read": 0, "none": 0, "error": 0}
    for trial in range(40):
        m = bytearray(data)
        if trial < 8:                      # truncations
            m = m[:max(16, len(m) * trial // 8)]
        else:                              # byte flips, incl. the header
            for _ in range(rng.integers(1, 8)):
                pos = int(rng.integers(0, len(m)))
                m[pos] ^= int(rng.integers(1, 256))
        mut.write_bytes(bytes(m))
        try:
            r = read_tombo_fast5(str(mut))
            outcomes["read" if r is not None else "none"] += 1
        except Exception:
            outcomes["error"] += 1
    # the exact split depends on where mutations land; what matters is
    # that every trial completed without killing the process
    assert sum(outcomes.values()) == 40


def _crash_fixture(tmp_path, rng, n_reads=8):
    """Synthetic fast5 dir where one file's NAME carries the crash
    marker used by extract._test_crash_hook."""
    from make_synthetic import write_fasta

    genome = synth_genome(rng, {"chr1": 4000})
    fasta = write_fasta(str(tmp_path / "ref.fa"), genome)
    f5dir = str(tmp_path / "f5")
    synth_fast5_dir(f5dir, genome, rng, n_reads=n_reads, read_len=150)
    victim = os.path.join(f5dir, "synthread_003.fast5")
    crash = os.path.join(f5dir, "crashme_003.fast5")
    os.rename(victim, crash)
    ctx = ExtractContext.build(ExtractOptions(motifs="CG",
                                              reference_path=fasta))
    return f5dir, ctx


def _read_names(path):
    return {line.split("\t")[4] for line in open(path)}


def test_worker_crash_retry_recovers(tmp_path, rng, monkeypatch):
    """A worker killed mid-batch (SIGKILL — the BrokenProcessPool class
    of failure: native segfault / OOM-kill) is retried on a respawned
    pool; the run completes with ZERO loss when the crash is transient."""
    f5dir, ctx = _crash_fixture(tmp_path, rng)

    baseline = str(tmp_path / "base.tsv")
    extract_features(f5dir, True, ctx, baseline, nproc=2, f5_batch_size=2)

    monkeypatch.setenv("DSP_TEST_CRASH_MARKER", "crashme")
    monkeypatch.setenv("DSP_TEST_CRASH_ONCE", str(tmp_path / "sentinel"))
    out = str(tmp_path / "out.tsv")
    total, errors = extract_features(f5dir, True, ctx, out, nproc=2,
                                     f5_batch_size=2)
    assert total == 8
    assert errors == 0
    assert sorted(open(out)) == sorted(open(baseline))


def test_worker_crash_quarantine(tmp_path, rng, monkeypatch):
    """A batch that kills its worker on EVERY attempt is quarantined:
    its files count as failed, every other batch's output survives."""
    from deepsignal_plant_tpu.utils.fileio import get_fast5s

    f5dir, ctx = _crash_fixture(tmp_path, rng)
    baseline = str(tmp_path / "base.tsv")
    extract_features(f5dir, True, ctx, baseline, nproc=2, f5_batch_size=2)

    fast5s = get_fast5s(f5dir, True)
    batches = [fast5s[i:i + 2] for i in range(0, len(fast5s), 2)]
    crash_batch = next(b for b in batches if any("crashme" in p for p in b))
    # readname == filename stem, except the renamed crash file
    lost = {os.path.basename(p)[:-len(".fast5")].replace("crashme",
                                                         "synthread")
            for p in crash_batch}

    monkeypatch.setenv("DSP_TEST_CRASH_MARKER", "crashme")
    monkeypatch.delenv("DSP_TEST_CRASH_ONCE", raising=False)
    out = str(tmp_path / "out.tsv")
    total, errors = extract_features(f5dir, True, ctx, out, nproc=2,
                                     f5_batch_size=2)
    assert total == 8
    assert errors == len(crash_batch) == 2
    assert _read_names(out) == _read_names(baseline) - lost


def test_worker_crash_npz_and_packed_recover(tmp_path, rng, monkeypatch):
    """Elastic recovery covers the binary output formats too."""
    from deepsignal_plant_tpu.utils.formats import (load_feature_npz,
                                                    load_packed_npz)

    f5dir, ctx = _crash_fixture(tmp_path, rng)
    monkeypatch.setenv("DSP_TEST_CRASH_MARKER", "crashme")
    for fmt, load in (("npz", load_feature_npz),
                      ("npz_packed", load_packed_npz)):
        monkeypatch.setenv("DSP_TEST_CRASH_ONCE",
                           str(tmp_path / f"sentinel_{fmt}"))
        outdir = str(tmp_path / f"out_{fmt}")
        total, errors = extract_features(f5dir, True, ctx, outdir, nproc=2,
                                         f5_batch_size=2, out_format=fmt)
        assert total == 8
        assert errors == 0
        n = sum(getattr(load(os.path.join(outdir, f)), "n", None) or
                len(load(os.path.join(outdir, f)))
                for f in os.listdir(outdir))
        assert n > 0


def test_worker_crash_fused_path_recovers(tmp_path, rng, monkeypatch):
    """The fused fast5->call_mods path (pooled wire-parts streaming into
    the engine) also survives worker death: crash-once retries to a
    complete result, always-crash quarantines just the one batch."""
    import jax

    from deepsignal_plant_tpu.cli import main as cli_main
    from deepsignal_plant_tpu.config import ModelConfig
    from deepsignal_plant_tpu.models.bilstm import init_params
    from deepsignal_plant_tpu.models.convert import save_checkpoint
    from make_synthetic import write_fasta

    genome = synth_genome(rng, {"chr1": 4000})
    fasta = write_fasta(str(tmp_path / "ref.fa"), genome)
    f5dir = str(tmp_path / "f5")
    synth_fast5_dir(f5dir, genome, rng, n_reads=8, read_len=150)
    os.rename(os.path.join(f5dir, "synthread_003.fast5"),
              os.path.join(f5dir, "crashme_003.fast5"))
    ckpt = str(tmp_path / "m.ckpt.npz")
    cfg = ModelConfig(hidden_size=32, dropout_rate=0.0)
    save_checkpoint(ckpt, init_params(jax.random.PRNGKey(0), cfg), cfg)

    def fused(out):
        cli_main(["call_mods", "-i", f5dir, "-m", ckpt, "-o", out,
                  "--hid_rnn", "32", "--device_batch", "256",
                  "--reference_path", fasta, "--motifs", "CG",
                  "--nproc", "2", "--f5_batch_size", "2"])

    base = str(tmp_path / "base.tsv")
    fused(base)
    base_rows = sorted(open(base))
    assert base_rows

    monkeypatch.setenv("DSP_TEST_CRASH_MARKER", "crashme")
    monkeypatch.setenv("DSP_TEST_CRASH_ONCE", str(tmp_path / "sentinel"))
    out1 = str(tmp_path / "retry.tsv")
    fused(out1)
    assert sorted(open(out1)) == base_rows

    monkeypatch.delenv("DSP_TEST_CRASH_ONCE")
    out2 = str(tmp_path / "quarantine.tsv")
    fused(out2)
    rows2 = sorted(open(out2))
    assert 0 < len(rows2) < len(base_rows)
    assert set(rows2) <= set(base_rows)
    # exactly the crash batch's reads are lost, nothing else
    from deepsignal_plant_tpu.utils.fileio import get_fast5s
    fast5s = get_fast5s(f5dir, True)
    batches = [fast5s[i:i + 2] for i in range(0, len(fast5s), 2)]
    crash_batch = next(b for b in batches if any("crashme" in p for p in b))
    lost = {os.path.basename(p)[:-len(".fast5")].replace("crashme",
                                                         "synthread")
            for p in crash_batch}
    assert {r.split("\t")[4] for r in base_rows} - \
        {r.split("\t")[4] for r in rows2} == \
        lost & {r.split("\t")[4] for r in base_rows}
