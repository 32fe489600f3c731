"""The complete user journey from the reference README quick start
(README.md:137-169), through our CLI: fast5s -> extract -> call_mods ->
call_freq -> split-by-motif -> strand-combine -> bedMethyl."""
import os

import numpy as np
import pytest

from make_synthetic import synth_fast5_dir, synth_genome, write_fasta

from deepsignal_plant_tpu.cli import main as cli_main
from deepsignal_plant_tpu.config import ModelConfig
from deepsignal_plant_tpu.models.bilstm import init_params
from deepsignal_plant_tpu.models.convert import save_checkpoint


def test_full_workflow(tmp_path, rng):
    import jax

    genome = synth_genome(rng, {"chr1": 3000, "chr2": 2000})
    fasta = write_fasta(str(tmp_path / "ref.fa"), genome)
    f5dir = str(tmp_path / "fast5s")
    synth_fast5_dir(f5dir, genome, rng, n_reads=6, read_len=200)
    ckpt = str(tmp_path / "model.ckpt.npz")
    cfg = ModelConfig(hidden_size=32, dropout_rate=0.0)
    save_checkpoint(ckpt, init_params(jax.random.PRNGKey(0), cfg), cfg)

    # 1. extract (all cytosines, like the README's --motifs C flow)
    features = str(tmp_path / "features.tsv")
    cli_main(["extract", "-i", f5dir, "-o", features,
              "--reference_path", fasta, "--motifs", "C", "--nproc", "2"])
    n_features = len(open(features).read().splitlines())
    assert n_features > 0

    # 2. call_mods from the features file
    calls = str(tmp_path / "fast5s.C.call_mods.tsv")
    cli_main(["call_mods", "-i", features, "-m", ckpt, "-o", calls,
              "--hid_rnn", "32", "--device_batch", "256"])
    assert len(open(calls).read().splitlines()) == n_features

    # 2b. the fused fast5 path gives the same per-site call set.
    # --f5_batch_size 2 forces multiple batches so --nproc 2 actually
    # takes the POOLED wire-parts fast path (the default batch size of
    # 30 would collapse this 6-read fixture to one batch = one worker)
    calls_fused = str(tmp_path / "fused.tsv")
    cli_main(["call_mods", "-i", f5dir, "-m", ckpt, "-o", calls_fused,
              "--hid_rnn", "32", "--device_batch", "256",
              "--reference_path", fasta, "--motifs", "C", "--nproc", "2",
              "--f5_batch_size", "2"])
    keys_a = {tuple(l.split("\t")[:6])
              for l in open(calls).read().splitlines()}
    keys_b = {tuple(l.split("\t")[:6])
              for l in open(calls_fused).read().splitlines()}
    assert keys_a == keys_b

    # 2c. pooled fused path (workers save wire-npz parts -> fast engine)
    # must emit the SAME rows as the in-process legacy fused path
    calls_legacy = str(tmp_path / "fused_legacy.tsv")
    cli_main(["call_mods", "-i", f5dir, "-m", ckpt, "-o", calls_legacy,
              "--hid_rnn", "32", "--device_batch", "256",
              "--reference_path", fasta, "--motifs", "C", "--nproc", "1"])
    assert sorted(open(calls_legacy).read().splitlines()) == \
        sorted(open(calls_fused).read().splitlines())

    # 3. call_freq
    freq = str(tmp_path / "fast5s.C.call_mods.frequency.tsv")
    cli_main(["call_freq", "-i", calls, "-o", freq, "--sort",
              "--prob_cf", "0"])
    freq_lines = open(freq).read().splitlines()
    assert len(freq_lines) > 0
    assert all(len(l.split("\t")) == 11 for l in freq_lines)

    # 4. split the frequency file into CG / CHG / CHH context files
    cli_main(["tools", "split_freq_by_motif", "--freqfile", freq])
    stem = freq[:-len(".tsv")]
    parts = 0
    for tag in ("CG", "CHG", "CHH"):
        p = stem.replace(".frequency", "") + f".{tag}.frequency.tsv"
        assert os.path.exists(p), p
        parts += len(open(p).read().splitlines())
    assert 0 < parts <= len(freq_lines)  # unknown contexts (edge Cs) drop

    # 5. combine CpG strands onto forward positions
    cli_main(["tools", "combine_strands_freq", "--frequency_fp", freq,
              "-r", fasta])
    combined = stem + ".fb_combined.tsv"
    combined_lines = open(combined).read().splitlines()
    assert combined_lines            # CpGs exist in a random genome
    for l in combined_lines:
        w = l.split("\t")
        assert w[2] == "+"            # everything mapped to fwd strand

    # 6. bedMethyl conversion
    cli_main(["tools", "freq2bed", "--freqfile", freq, "--sort"])
    bed = stem + ".bed"
    bed_lines = open(bed).read().splitlines()
    assert len(bed_lines) == len(freq_lines)
    for l in bed_lines:
        w = l.split("\t")
        assert len(w) == 11 and 0 <= int(w[10]) <= 100

    # 7. evaluate against (synthetic) truth call files
    cli_main(["tools", "evaluate_calls", "--methylated", calls,
              "--unmethylated", calls,
              "--result_file", str(tmp_path / "eval.tsv"), "--seed", "1"])
    assert open(str(tmp_path / "eval.tsv")).readline().startswith(
        "tested_type")
