"""Training dataset: features TSV parsed once into dense host arrays.

The reference trains off linecache re-parsing every row every epoch
(dataloader.py:34-56) — pure-Python parsing inside the training process is
its throughput ceiling (SURVEY.md §3.4). Here the file is vector-parsed a
single time into flat numpy arrays; epochs are permutations of an index
vector and batches are contiguous gathers, so the host feed is minutes ->
microseconds per step.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import numpy as np

from ..models.bilstm import Batch
from ..utils.formats import parse_feature_lines
from .batching import iter_line_blocks


@dataclass
class FeatureDataset:
    kmer: np.ndarray              # (N, L) int32
    base_means: np.ndarray        # (N, L) f32
    base_stds: np.ndarray         # (N, L) f32
    base_signal_lens: np.ndarray  # (N, L) f32
    signals: np.ndarray           # (N, L, S) f32
    labels: np.ndarray            # (N,) int32

    def __len__(self) -> int:
        return len(self.labels)

    @classmethod
    def from_file(cls, path: str, kmer_len: int = 13, signal_len: int = 16,
                  block_lines: int = 100_000) -> "FeatureDataset":
        from ..utils.fastparse import native_available, parse_feature_bytes
        from ..utils.formats import feature_npz_paths, load_feature_npz
        npz_files = feature_npz_paths(path)
        if npz_files is not None:
            parts = [load_feature_npz(f) for f in npz_files]
        elif native_available():
            from .batching import iter_byte_blocks
            parts = [parse_feature_bytes(raw, kmer_len, signal_len)
                     for raw in iter_byte_blocks(path)]
        else:
            parts = [parse_feature_lines(block, kmer_len, signal_len)
                     for block in iter_line_blocks(path, block_lines)]
        if not parts:
            z = np.zeros
            return cls(z((0, kmer_len), np.int32), z((0, kmer_len), np.float32),
                       z((0, kmer_len), np.float32), z((0, kmer_len), np.float32),
                       z((0, kmer_len, signal_len), np.float32),
                       z((0,), np.int32))
        return cls(
            kmer=np.concatenate([p.kmer for p in parts]),
            base_means=np.concatenate([p.base_means for p in parts]),
            base_stds=np.concatenate([p.base_stds for p in parts]),
            base_signal_lens=np.concatenate(
                [p.base_signal_lens for p in parts]),
            signals=np.concatenate([p.signals for p in parts]),
            labels=np.concatenate([p.labels for p in parts]))

    def take(self, idx: np.ndarray) -> "FeatureDataset":
        return FeatureDataset(self.kmer[idx], self.base_means[idx],
                              self.base_stds[idx],
                              self.base_signal_lens[idx],
                              self.signals[idx], self.labels[idx])

    def batch_at(self, idx: np.ndarray) -> tuple[Batch, np.ndarray]:
        return (Batch(self.kmer[idx], self.base_means[idx],
                      self.base_stds[idx], self.base_signal_lens[idx],
                      self.signals[idx]),
                self.labels[idx])

    def iter_batches(self, batch_size: int, shuffle: bool,
                     rng: np.random.Generator | None = None,
                     drop_last: bool = False,
                     pad_to_batch: bool = False,
                     ) -> Iterator[tuple[Batch, np.ndarray, int]]:
        """Yield (batch, labels, n_valid). With ``pad_to_batch`` every batch
        has exactly ``batch_size`` rows (tail repeated-zero padded) so one
        compiled executable serves the whole epoch."""
        n = len(self)
        order = (rng or np.random.default_rng()).permutation(n) \
            if shuffle else np.arange(n)
        for s in range(0, n, batch_size):
            idx = order[s:s + batch_size]
            n_valid = len(idx)
            if n_valid < batch_size:
                if drop_last:
                    return
                if pad_to_batch:
                    pad = np.zeros(batch_size - n_valid, dtype=idx.dtype)
                    idx = np.concatenate([idx, pad])
            batch, labels = self.batch_at(idx)
            yield batch, labels, n_valid


class StreamingFeatureDataset:
    """Bounded-memory training dataset over a big features TSV (or .npz
    batch directory): rows stream per epoch in shuffled *blocks* with
    within-block shuffling, holding only one block in RAM.

    The in-memory FeatureDataset regresses the reference's disk-backed
    linecache access for 100M-row files; this restores disk-scale training
    with an approximate (block-local) shuffle — the standard big-data
    trade (extract's rotating output and ``tools shuffle_file`` provide
    global pre-shuffling when needed).
    """

    def __init__(self, path: str, kmer_len: int = 13, signal_len: int = 16,
                 block_rows: int = 65536):
        from ..utils.formats import feature_npz_paths
        self._path = path
        self._kmer_len = kmer_len
        self._signal_len = signal_len
        self._block_rows = block_rows
        self._npz_files = feature_npz_paths(path)
        self._seekable = not path.endswith(".gz")
        if self._npz_files is not None:
            from ..utils.formats import load_feature_npz
            self._n = sum(len(load_feature_npz(f).labels)
                          for f in self._npz_files)
            self._offsets = None
        else:
            # one pass: record byte offsets of every block boundary
            offsets = [0]
            n = 0
            with open(path, "rb") if not path.endswith(".gz") else \
                    __import__("gzip").open(path, "rb") as rf:
                for line in rf:
                    n += 1
                    if n % block_rows == 0:
                        offsets.append(rf.tell())
            self._n = n
            self._offsets = offsets

    def __len__(self) -> int:
        return self._n

    def _iter_blocks(self, order: np.ndarray) -> Iterator[FeatureDataset]:
        if self._npz_files is not None:
            from ..utils.formats import load_feature_npz
            for bi in order:
                fb = load_feature_npz(self._npz_files[bi])
                yield FeatureDataset(
                    fb.kmer, fb.base_means, fb.base_stds,
                    fb.base_signal_lens, fb.signals, fb.labels)
        else:
            from ..utils.fastparse import (native_available,
                                           parse_feature_bytes)
            from ..utils.formats import parse_feature_lines
            use_native = native_available()
            opener = (open if self._seekable
                      else __import__("gzip").open)
            with opener(self._path, "rb") as rf:
                for bi in order:
                    if self._seekable:
                        rf.seek(self._offsets[bi])
                    raw_lines = []
                    for _ in range(self._block_rows):
                        raw = rf.readline()
                        if not raw:
                            break
                        raw_lines.append(raw)
                    if use_native:
                        fb = parse_feature_bytes(b"".join(raw_lines),
                                                 self._kmer_len,
                                                 self._signal_len)
                    else:
                        fb = parse_feature_lines(
                            [r.decode() for r in raw_lines],
                            self._kmer_len, self._signal_len)
                    yield FeatureDataset(
                        fb.kmer, fb.base_means, fb.base_stds,
                        fb.base_signal_lens, fb.signals, fb.labels)

    def iter_batches(self, batch_size: int, shuffle: bool,
                     rng: np.random.Generator | None = None,
                     drop_last: bool = False,
                     pad_to_batch: bool = False,
                     ) -> Iterator[tuple[Batch, np.ndarray, int]]:
        rng = rng or np.random.default_rng()
        n_blocks = (len(self._npz_files) if self._npz_files is not None
                    else len(self._offsets))
        # gzip streams cannot seek cheaply: backward seeks re-inflate the
        # whole prefix. Read gz files in file order (within-block shuffle
        # still applies); seekable inputs shuffle block order too.
        can_shuffle_blocks = shuffle and (self._npz_files is not None
                                          or self._seekable)
        order = (rng.permutation(n_blocks) if can_shuffle_blocks
                 else np.arange(n_blocks))
        carry: FeatureDataset | None = None
        for block in self._iter_blocks(order):
            if carry is not None and len(carry):
                block = FeatureDataset(
                    np.concatenate([carry.kmer, block.kmer]),
                    np.concatenate([carry.base_means, block.base_means]),
                    np.concatenate([carry.base_stds, block.base_stds]),
                    np.concatenate([carry.base_signal_lens,
                                    block.base_signal_lens]),
                    np.concatenate([carry.signals, block.signals]),
                    np.concatenate([carry.labels, block.labels]))
            idx = rng.permutation(len(block)) if shuffle \
                else np.arange(len(block))
            full = (len(idx) // batch_size) * batch_size
            for s in range(0, full, batch_size):
                batch, labels = block.batch_at(idx[s:s + batch_size])
                yield batch, labels, batch_size
            carry = block.take(idx[full:])
        if carry is not None and len(carry):
            n_valid = len(carry)
            if drop_last:
                return
            idx = np.arange(n_valid)
            if pad_to_batch:
                idx = np.concatenate(
                    [idx, np.zeros(batch_size - n_valid, np.int64)])
            batch, labels = carry.batch_at(idx)
            yield batch, labels, n_valid
