"""Synthetic data builders for tests and verification drives.

- feature TSV rows with a learnable signal (label shifts the means), in the
  exact 12-column format;
- synthetic tombo-layout fast5 directories + matching FASTA reference.
"""
from __future__ import annotations

import os

import numpy as np

BASES = "ACGT"


def synth_feature_rows(rng: np.random.Generator, n_reads: int = 10,
                       sites_per_read: int = 20, kmer_len: int = 13,
                       signal_len: int = 16, chrom: str = "chr1",
                       label_mode: str = "mixed") -> list[str]:
    """Rows grouped per read (like real extract output). ``label_mode``:
    "mixed" alternates 0/1 with mean shift, or an int label for all rows."""
    rows = []
    for r in range(n_reads):
        readname = f"read_{r:04d}"
        strand = "+" if r % 2 == 0 else "-"
        for s in range(sites_per_read):
            if label_mode == "mixed":
                label = int((r + s) % 2)
            else:
                label = int(label_mode)
            pos = 1000 * r + 10 * s
            shift = 0.8 if label == 1 else -0.8
            kmer_codes = rng.integers(0, 4, size=kmer_len)
            kmer = "".join(BASES[c] for c in kmer_codes)
            kmer = kmer[:kmer_len // 2] + "C" + kmer[kmer_len // 2 + 1:]
            means = np.around(rng.normal(shift, 0.3, kmer_len), 6)
            stds = np.around(np.abs(rng.normal(0.5, 0.1, kmer_len)), 6)
            lens = rng.integers(3, 30, kmer_len)
            sig = np.around(rng.normal(shift, 0.5, (kmer_len, signal_len)),
                            6)
            means_s = ",".join(str(x) for x in means.tolist())
            stds_s = ",".join(str(x) for x in stds.tolist())
            lens_s = ",".join(str(int(x)) for x in lens)
            sig_s = ";".join(",".join(str(y) for y in row)
                             for row in sig.tolist())
            rows.append("\t".join([
                chrom, str(pos), strand, str(pos), readname, "t", kmer,
                means_s, stds_s, lens_s, sig_s, str(label)]))
    return rows


def write_feature_file(path: str, rows: list[str]) -> str:
    with open(path, "w") as wf:
        for r in rows:
            wf.write(r + "\n")
    return path


def synth_genome(rng: np.random.Generator, contigs: dict[str, int]
                 ) -> dict[str, str]:
    return {name: "".join(rng.choice(list(BASES), size=n))
            for name, n in contigs.items()}


def write_fasta(path: str, genome: dict[str, str]) -> str:
    with open(path, "w") as wf:
        for name, seq in genome.items():
            wf.write(f">{name}\n")
            for i in range(0, len(seq), 70):
                wf.write(seq[i:i + 70] + "\n")
    return path


def synth_fast5_dir(dirpath: str, genome: dict[str, str],
                    rng: np.random.Generator, n_reads: int = 6,
                    read_len: int = 200, max_event_len: int = 12,
                    meth_mode: str = "none", motifs: str = "CG",
                    mod_loc: int = 0, shift_dac: int = 150,
                    shift_halfwidth: int = 1,
                    name_prefix: str = "synthread") -> int:
    """Write n_reads synthetic tombo fast5s aligned to ``genome``.

    Event lengths stay <= max_event_len (< signal_len 16) so extraction is
    fully deterministic (no downsampling) — good for golden comparisons.

    ``meth_mode`` injects a learnable methylation signature: for
    "methylated" reads, the raw DAC of the events at every ``motifs`` site
    (mod base ± ``shift_halfwidth`` bases) is shifted by ``shift_dac``
    (~+1 sigma after MAD normalization for the 300-700 DAC background).
    Modes: "none" (default, byte-identical to the historical fixture),
    "all" (every read methylated), "mixed" (reads r with r % 4 >= 2 —
    decorrelated from the r % 2 strand alternation). This mirrors how real
    5mC shifts nanopore current at modified sites, and makes a checkpoint
    trained on extracted features produce large-margin calls — the
    trained-ckpt agreement gates need exactly that (VERDICT r3 item 1).
    """
    from deepsignal_plant_tpu.io.fast5 import write_tombo_fast5

    if meth_mode not in ("none", "all", "mixed"):
        raise ValueError("meth_mode must be none|all|mixed")
    motif_seqs: list[str] = []
    if meth_mode != "none":
        from deepsignal_plant_tpu.utils.motifs import expand_motifs
        motif_seqs = expand_motifs(motifs)

    os.makedirs(dirpath, exist_ok=True)
    contig_names = list(genome.keys())
    for r in range(n_reads):
        chrom = contig_names[r % len(contig_names)]
        seq_full = genome[chrom]
        start = int(rng.integers(0, max(1, len(seq_full) - read_len)))
        bases = seq_full[start:start + read_len]
        ev_lens = rng.integers(3, max_event_len, size=len(bases))
        ev_starts = np.concatenate([[0], np.cumsum(ev_lens)[:-1]])
        total = int(ev_lens.sum())
        # DAC integers; scaling recovers pA-ish floats
        raw = rng.integers(300, 700, size=total).astype(np.int16)
        meth = meth_mode == "all" or (meth_mode == "mixed" and r % 4 >= 2)
        if meth and motif_seqs:
            from deepsignal_plant_tpu.utils.motifs import motif_locs_in_seq
            for loc in motif_locs_in_seq(bases, motif_seqs, mod_loc):
                lo = max(0, loc - shift_halfwidth)
                hi = min(len(bases), loc + shift_halfwidth + 1)
                raw[ev_starts[lo]:ev_starts[hi - 1] + ev_lens[hi - 1]] += \
                    shift_dac
        write_tombo_fast5(
            os.path.join(dirpath, f"{name_prefix}_{r:03d}.fast5"),
            readname=f"{name_prefix}_{r:03d}", raw_signal=raw, bases=bases,
            event_starts=ev_starts, event_lengths=ev_lens, chrom=chrom,
            chrom_start=start, alignstrand="+" if r % 2 == 0 else "-")
    return n_reads
