"""Regression tests for the round-1 code-review findings."""
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
