"""Long-tail coverage: RNA mode, combine_freq_files CLI, freq gzip input."""
import gzip

import numpy as np
import pytest

from deepsignal_plant_tpu.cli import main as cli_main
from deepsignal_plant_tpu.pipeline.extract import (ExtractContext,
                                                   ExtractOptions)
from deepsignal_plant_tpu.utils.bases import complement_seq
from deepsignal_plant_tpu.utils.motifs import expand_motifs


def test_rna_mode_motifs_and_complement():
    """is_dna=no expands motifs over the RNA alphabet (reference
    process_utils.py:42-47) and complements with U."""
    assert set(expand_motifs("CG", is_dna=False)) == {"CG"}
    # Y = C/U in RNA (C/T in DNA)
    assert set(expand_motifs("CY", is_dna=False)) == {"CC", "CU"}
    assert set(expand_motifs("CY", is_dna=True)) == {"CC", "CT"}
    assert complement_seq("ACGU", "RNA") == "ACGU"
    ctx = ExtractContext.build(ExtractOptions(motifs="CY"), is_dna=False)
    assert set(ctx.motif_seqs) == {"CC", "CU"}


def _freq_row(chrom, pos, met, unmet):
    cov = met + unmet
    return "%s\t%d\t+\t%d\t%.3f\t%.3f\t%d\t%d\t%d\t%.4f\t%s" % (
        chrom, pos, pos, float(met), float(unmet), met, unmet, cov,
        met / cov, "ACGCGTACGCGTA")


def test_combine_freq_files_cli(tmp_path):
    f1 = tmp_path / "a.freq.txt"
    f2 = tmp_path / "b.freq.txt"
    f1.write_text(_freq_row("c1", 5, 2, 1) + "\n")
    f2.write_text(_freq_row("c1", 5, 1, 2) + "\n" +
                  _freq_row("c2", 9, 3, 0) + "\n")
    out = str(tmp_path / "combined.txt")
    cli_main(["tools", "combine_freq_files", "--modspath", str(f1),
              "--modspath", str(f2), "--wfile", out, "--sort"])
    lines = open(out).read().splitlines()
    assert len(lines) == 2
    w = lines[0].split("\t")
    assert w[0] == "c1" and int(w[6]) == 3 and int(w[8]) == 6
    assert float(w[9]) == pytest.approx(0.5)


def test_call_freq_reads_gzip_calls(tmp_path):
    calls = tmp_path / "calls.tsv.gz"
    rows = []
    for i in range(4):
        rows.append("\t".join(["c1", str(i), "+", str(i), "r", "t",
                               "0.1", "0.9", "1", "ACGCG"]))
    with gzip.open(calls, "wt") as wf:
        wf.write("\n".join(rows) + "\n")
    out = str(tmp_path / "freq.tsv")
    cli_main(["call_freq", "-i", str(calls), "-o", out, "--sort"])
    lines = open(out).read().splitlines()
    assert len(lines) == 4
    assert all(l.split("\t")[6] == "1" for l in lines)   # all met


def test_estimate_rows_tsv_and_npz(tmp_path, rng):
    from make_synthetic import synth_feature_rows
    from deepsignal_plant_tpu.pipeline.call_mods import _estimate_rows
    from deepsignal_plant_tpu.utils.formats import (parse_feature_lines,
                                                    save_feature_npz)
    rows = synth_feature_rows(rng, 4, 32)   # 128 rows
    feat = str(tmp_path / "f.tsv")
    with open(feat, "w") as f:
        f.write("\n".join(rows) + "\n")
    est = _estimate_rows(feat)
    assert 64 <= est <= 256   # within 2x of 128

    d = tmp_path / "npz"
    d.mkdir()
    fb = parse_feature_lines([r + "\n" for r in rows])
    save_feature_npz(str(d / "000.npz"), fb)
    assert _estimate_rows(str(d)) == 128
    assert _estimate_rows(str(tmp_path / "missing.tsv")) is None


def test_estimate_rows_adversarial(tmp_path, rng):
    """Pathological inputs: the estimator must stay graceful (its only
    consumer picks a CLAMPED power-of-two device_batch, so the worst
    case is a suboptimal width, never a wrong answer)."""
    import jax
    from make_synthetic import synth_feature_rows
    from deepsignal_plant_tpu.config import CallConfig, ModelConfig
    from deepsignal_plant_tpu.models.bilstm import init_params
    from deepsignal_plant_tpu.models.convert import save_checkpoint
    from deepsignal_plant_tpu.pipeline.call_mods import (CallModsEngine,
                                                         _estimate_rows)

    # gzip: not estimable -> None (caller falls back to the default)
    gz = str(tmp_path / "f.tsv.gz")
    with gzip.open(gz, "wt") as f:
        f.write("\n".join(synth_feature_rows(rng, 1, 8)) + "\n")
    assert _estimate_rows(gz) is None

    # empty file -> 0
    empty = tmp_path / "empty.tsv"
    empty.touch()
    assert _estimate_rows(str(empty)) == 0

    # one row longer than the 256 KB head sample (no newline in sample)
    # -> degenerate but finite estimate
    big = tmp_path / "bigrow.tsv"
    big.write_text("x" * (1 << 19) + "\n")
    assert _estimate_rows(str(big)) == 1

    # npz dir whose first file is corrupt -> None, not a crash
    d = tmp_path / "npz"
    d.mkdir()
    (d / "000.npz").write_bytes(b"not a zipfile")
    assert _estimate_rows(str(d)) is None

    # heterogeneous row lengths: short rows fill the head sample, rows
    # with a 3000-char readname (a free-text column) dominate the tail
    # -> the bytes/row estimate undershoots, but _resolve_target clamps
    # and the engine still calls EVERY row correctly
    short = synth_feature_rows(rng, 2, 16)

    def _inflate(row, i):
        f = row.split("\t")
        f[4] = "r" * 3000 + str(i)
        return "\t".join(f)

    long_rows = [_inflate(r, i) for i, r in
                 enumerate(synth_feature_rows(rng, 2, 16))]
    het = str(tmp_path / "het.tsv")
    with open(het, "w") as f:
        f.write("\n".join(short) + "\n")
        f.write("\n".join(long_rows) + "\n")
    est = _estimate_rows(het)
    assert est is not None and est >= 1

    cfg = ModelConfig(hidden_size=32, dropout_rate=0.0)
    ckpt = str(tmp_path / "m.npz")
    save_checkpoint(ckpt, init_params(jax.random.PRNGKey(1), cfg), cfg)
    eng = CallModsEngine(ckpt, cfg, CallConfig())   # auto sizing
    target = eng._resolve_target(het)
    assert eng.AUTO_MIN_BATCH <= target <= eng._auto_max_batch
    out = str(tmp_path / "calls.tsv")
    st = eng.run_features_file(het, out)
    assert st.sites == 64
    assert len(open(out).read().splitlines()) == 64


def test_auto_device_batch_sizing(tmp_path, rng):
    """device_batch=None sizes the step to the input: tiny files get a
    small padded batch, not the 32768 maximum."""
    import jax
    from make_synthetic import synth_feature_rows
    from deepsignal_plant_tpu.config import CallConfig, ModelConfig
    from deepsignal_plant_tpu.models.bilstm import init_params
    from deepsignal_plant_tpu.models.convert import save_checkpoint
    from deepsignal_plant_tpu.pipeline.call_mods import CallModsEngine
    cfg = ModelConfig(hidden_size=32, dropout_rate=0.0)
    ckpt = str(tmp_path / "m.npz")
    save_checkpoint(ckpt, init_params(jax.random.PRNGKey(1), cfg), cfg)
    eng = CallModsEngine(ckpt, cfg, CallConfig())   # auto
    assert eng._auto_batch

    rows = synth_feature_rows(rng, 2, 20)   # 40 rows
    feat = str(tmp_path / "f.tsv")
    with open(feat, "w") as f:
        f.write("\n".join(rows) + "\n")
    target = eng._resolve_target(feat)
    assert target == eng.AUTO_MIN_BATCH        # tiny input -> floor
    assert eng._resolve_target("/nope.tsv") == eng.device_batch

    # explicit width always wins
    eng2 = CallModsEngine(ckpt, cfg, CallConfig(device_batch=64))
    assert not eng2._auto_batch
    assert eng2._resolve_target(feat) == 64

    out = str(tmp_path / "calls.tsv")
    st = eng.run_features_file(feat, out)
    assert st.sites == 40
    assert len(open(out).read().splitlines()) == 40


def test_fetch_real_data_offline_paths(tmp_path, monkeypatch, capsys):
    """VERDICT r4 item 6: the real-data fetch is one command when online
    and a graceful, DISTINCT skip offline. check-only never touches the
    network; verification failure is a different exit code."""
    import os
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(repo, "benchmarks"))
    import fetch_real_data as frd

    # missing assets + check_only -> EXIT_OFFLINE, no network calls
    def boom(*a, **k):
        raise AssertionError("check-only must not touch the network")
    monkeypatch.setattr(frd, "download_gdrive", boom)
    with pytest.raises(SystemExit) as ei:
        frd.fetch(str(tmp_path), check_only=True)
    assert ei.value.code == frd.EXIT_OFFLINE

    # a fetch attempt with no egress -> EXIT_OFFLINE too
    import urllib.error

    def offline(*a, **k):
        raise urllib.error.URLError("no egress")
    monkeypatch.setattr(frd, "download_gdrive", offline)
    with pytest.raises(SystemExit) as ei2:
        frd.fetch(str(tmp_path))
    assert ei2.value.code == frd.EXIT_OFFLINE

    # pinned asset with wrong bytes -> the DOCUMENTED verify exit (2),
    # distinct from offline (3) and from generic failure (1)
    name = next(iter(frd.ASSETS))
    for n in frd.ASSETS:
        (tmp_path / n).write_bytes(b"corrupt")
    monkeypatch.setattr(frd, "load_lock",
                        lambda: {name: {"sha256": "0" * 64}})
    with pytest.raises(SystemExit) as ei3:
        frd.fetch(str(tmp_path), check_only=True)
    assert ei3.value.code == frd.EXIT_VERIFY_FAIL

    # present-but-unpinned HTML interstitial must NOT get pinned
    monkeypatch.setattr(frd, "load_lock", lambda: {})
    saved = {}
    monkeypatch.setattr(frd, "save_lock", saved.update)
    for n in frd.ASSETS:
        (tmp_path / n).write_bytes(
            b"<!DOCTYPE html><html>quota exceeded</html>")
    with pytest.raises(SystemExit) as ei4:
        frd.fetch(str(tmp_path), check_only=True)
    assert ei4.value.code == frd.EXIT_VERIFY_FAIL
    assert not saved

    # plausible out-of-band assets DO pin (magic bytes + size pass)
    ck = [n for n in frd.ASSETS if frd.ASSETS[n]["kind"] == "ckpt"][0]
    tb = [n for n in frd.ASSETS if frd.ASSETS[n]["kind"] == "tarball"][0]
    (tmp_path / ck).write_bytes(b"PK\x03\x04" + b"\x00" * (1 << 20))
    (tmp_path / tb).write_bytes(b"\x1f\x8b\x08" + b"\x00" * (1 << 20))
    monkeypatch.setattr(frd, "unpack", lambda d: {})  # fake tar: skip
    frd.fetch(str(tmp_path), check_only=True)
    assert set(saved) == set(frd.ASSETS)


def test_auto_batch_remote_cap_16384(tmp_path):
    """The remote auto cap is 16384 post-blob (r5 sweep); direct stays
    32768. Pinned here so a future cap change is a deliberate edit."""
    import deepsignal_plant_tpu.pipeline.call_mods as cm
    assert cm.CallModsEngine.AUTO_MAX_BATCH_REMOTE == 16384
    assert cm.CallModsEngine.AUTO_MAX_BATCH_DIRECT == 32768
    # and the forward tile is decoupled from the dispatch width
    assert cm.COMPUTE_TILE == 4096
