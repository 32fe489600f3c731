"""CLI end-to-end tests for extract and train subcommands (call_mods /
call_freq / tools are covered in test_call_pipeline.py)."""
import os

import numpy as np
import pytest

from make_synthetic import (synth_fast5_dir, synth_feature_rows,
                            synth_genome, write_fasta, write_feature_file)

from deepsignal_plant_tpu.cli import main as cli_main


def test_cli_version(capsys):
    with pytest.raises(SystemExit):
        cli_main(["--version"])
    assert "deepsignal_plant_tpu version" in capsys.readouterr().out


def test_cli_no_args_prints_help(capsys):
    assert cli_main([]) == 0
    assert "modules" in capsys.readouterr().out


def test_cli_extract_e2e(tmp_path, rng):
    genome = synth_genome(rng, {"chr1": 2000})
    fasta = write_fasta(str(tmp_path / "ref.fa"), genome)
    f5dir = str(tmp_path / "f5")
    synth_fast5_dir(f5dir, genome, rng, n_reads=4, read_len=100)
    out = str(tmp_path / "features.tsv")
    cli_main(["extract", "-i", f5dir, "-o", out,
              "--reference_path", fasta, "--motifs", "CG", "--nproc", "2"])
    lines = open(out).read().splitlines()
    assert len(lines) > 0
    assert all(len(l.split("\t")) == 12 for l in lines)
    # rotating-dir + gzip output mode
    outdir = str(tmp_path / "featdir")
    cli_main(["extract", "-i", f5dir, "-o", outdir, "--w_is_dir", "yes",
              "--w_batch_num", "1", "--gzip",
              "--reference_path", fasta, "--motifs", "CG", "--nproc", "1"])
    files = sorted(os.listdir(outdir))
    assert files and all(f.endswith(".tsv.gz") for f in files)


def test_cli_train_e2e(tmp_path, rng):
    train_f = write_feature_file(str(tmp_path / "t.tsv"),
                                 synth_feature_rows(rng, 10, 20))
    valid_f = write_feature_file(str(tmp_path / "v.tsv"),
                                 synth_feature_rows(rng, 4, 10))
    model_dir = str(tmp_path / "models")
    cli_main(["train", "--train_file", train_f, "--valid_file", valid_f,
              "--model_dir", model_dir, "--hid_rnn", "32",
              "--batch_size", "64", "--max_epoch_num", "2",
              "--min_epoch_num", "2", "--step_interval", "4"])
    ckpts = [f for f in os.listdir(model_dir) if f.endswith(".ckpt.npz")]
    assert ckpts, "train must save at least one checkpoint"
    # name scheme parity: model_type.b{seq}_s{sig}_epoch{N}.ckpt.npz
    assert any(f.startswith("both_bilstm.b13_s16_epoch") for f in ckpts)

    # the saved ckpt drives call_mods
    out = str(tmp_path / "calls.tsv")
    cli_main(["call_mods", "-i", valid_f, "-m",
              os.path.join(model_dir, sorted(ckpts)[-1]), "-o", out,
              "--hid_rnn", "32", "--device_batch", "64"])
    assert len(open(out).read().splitlines()) == 40
