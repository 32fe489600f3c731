"""Host-side feed: stream ragged feature rows into static-shape device
batches with a prefetch pipeline.

This replaces the reference's sleep-polled multiprocessing queue chain
(call_modifications.py:55-127, process_utils.py:569) with a bounded
thread pipeline: TPU steps are launched asynchronously by JAX, so the host
thread only has to keep parsing ahead of the device — backpressure comes
from the bounded queues, not sleep().

Batches are padded to a fixed ``device_batch`` so every step reuses one
compiled executable (static shapes are an XLA requirement, not a tuning
choice).
"""
from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import Callable, Iterable, Iterator

import numpy as np

from ..utils.formats import FeatureBatch, open_text, parse_feature_lines

_SENTINEL = object()


def iter_line_blocks(path: str, block_lines: int) -> Iterator[list[str]]:
    """Yield blocks of raw lines from a (possibly gzipped) features file."""
    with open_text(path) as rf:
        block: list[str] = []
        for line in rf:
            block.append(line)
            if len(block) >= block_lines:
                yield block
                block = []
        if block:
            yield block


def iter_byte_blocks(path: str, block_bytes: int = 8 << 20
                     ) -> Iterator[bytes]:
    """Yield newline-aligned byte blocks (for the native parser)."""
    import gzip
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as rf:
        carry = b""
        while True:
            chunk = rf.read(block_bytes)
            if not chunk:
                if carry:
                    yield carry
                return
            chunk = carry + chunk
            cut = chunk.rfind(b"\n")
            if cut == -1:
                carry = chunk
                continue
            yield chunk[:cut + 1]
            carry = chunk[cut + 1:]


def iter_read_grouped_blocks(path: str, reads_per_block: int
                             ) -> Iterator[list[str]]:
    """Yield blocks holding whole reads (``reads_per_block`` distinct read
    ids per block) — the reference's read-grouping contract
    (call_modifications.py:91-123, README.rst:29)."""
    with open_text(path) as rf:
        block: list[str] = []
        nreads = 0
        prev_read: str | None = None
        for line in rf:
            read_id = line.split("\t", 5)[4]
            if read_id != prev_read:
                if prev_read is not None and nreads >= reads_per_block:
                    yield block
                    block = []
                    nreads = 0
                nreads += 1
                prev_read = read_id
            block.append(line)
        if block:
            yield block


@dataclass
class PaddedBatch:
    """A FeatureBatch padded to a static shape with its valid count."""
    features: FeatureBatch
    n_valid: int


def pad_feature_batch(fb: FeatureBatch, target: int) -> PaddedBatch:
    """Pad all arrays up to ``target`` rows (repeating zeros) so the jitted
    forward sees one static shape."""
    n = len(fb)
    if n == target:
        return PaddedBatch(fb, n)
    if n > target:
        raise ValueError(f"batch of {n} rows exceeds target {target}")
    pad = target - n

    def _pad(a: np.ndarray) -> np.ndarray:
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return np.pad(a, widths)

    padded = FeatureBatch(
        sampleinfo=fb.sampleinfo,
        kmer=_pad(fb.kmer), base_means=_pad(fb.base_means),
        base_stds=_pad(fb.base_stds),
        base_signal_lens=_pad(fb.base_signal_lens),
        signals=_pad(fb.signals), labels=_pad(fb.labels),
        read_ids=fb.read_ids)
    return PaddedBatch(padded, n)


def default_parse_workers() -> int:
    """Host-side parser thread count: all cores up to 4 (the ctypes parse
    releases the GIL; beyond ~4 threads the GIL-held merge/format work on
    the main thread becomes the binding constraint)."""
    import os
    return max(2, min(4, os.cpu_count() or 2))


def batches_from_features_file(path: str, device_batch: int,
                               kmer_len: int = 13, signal_len: int = 16,
                               parse_workers: int | None = None,
                               out_dtype: str = "float32",
                               ) -> Iterator[PaddedBatch]:
    """Parse a features TSV into fixed-size PaddedBatches.

    Rows are re-chunked to exactly ``device_batch`` (carrying remainders
    across line blocks); only the final batch is padded.
    """
    from ..utils.fastparse import native_available, parse_feature_bytes
    from ..utils.formats import feature_npz_paths, load_feature_npz

    w = parse_workers or default_parse_workers()
    npz_files = feature_npz_paths(path)
    if npz_files is not None:
        blocks = bounded_thread_map(
            lambda f: load_feature_npz(f, with_read_ids=False), npz_files,
            workers=w, depth=2 * w)
    elif native_available():
        blocks = bounded_thread_map(
            lambda raw: parse_feature_bytes(raw, kmer_len, signal_len,
                                            out_dtype=out_dtype),
            iter_byte_blocks(path, 4 << 20), workers=w, depth=2 * w)
    else:
        blocks = (parse_feature_lines(block, kmer_len, signal_len)
                  for block in iter_line_blocks(path, device_batch))

    asm = BatchAssembler(device_batch)
    for fb in blocks:
        asm.add(fb)
        while (full := asm.pop_full()) is not None:
            yield PaddedBatch(full, device_batch)
    rest = asm.pop_rest()
    if rest is not None:
        yield pad_feature_batch(rest, device_batch)


def _merge(batches: list[FeatureBatch]) -> FeatureBatch:
    if len(batches) == 1:
        return batches[0]
    from itertools import chain
    return FeatureBatch(
        sampleinfo=list(chain.from_iterable(b.sampleinfo for b in batches)),
        kmer=np.concatenate([b.kmer for b in batches]),
        base_means=np.concatenate([b.base_means for b in batches]),
        base_stds=np.concatenate([b.base_stds for b in batches]),
        base_signal_lens=np.concatenate(
            [b.base_signal_lens for b in batches]),
        signals=np.concatenate([b.signals for b in batches]),
        labels=np.concatenate([b.labels for b in batches]),
        read_ids=list(chain.from_iterable(b.read_ids for b in batches)))


def _split(fb: FeatureBatch, n: int) -> tuple[FeatureBatch, FeatureBatch]:
    """Split into (first n rows, rest); array parts are views, not copies."""
    head = FeatureBatch(fb.sampleinfo[:n], fb.kmer[:n], fb.base_means[:n],
                        fb.base_stds[:n], fb.base_signal_lens[:n],
                        fb.signals[:n], fb.labels[:n], fb.read_ids[:n])
    tail = FeatureBatch(fb.sampleinfo[n:], fb.kmer[n:], fb.base_means[n:],
                        fb.base_stds[n:], fb.base_signal_lens[n:],
                        fb.signals[n:], fb.labels[n:], fb.read_ids[n:])
    return head, tail


class BatchAssembler:
    """Re-chunk a stream of ragged FeatureBatches into exact ``target``-row
    batches with one array copy per emitted batch (fragments are views)."""

    def __init__(self, target: int):
        from collections import deque
        self.target = target
        self._frags: deque = deque()
        self._rows = 0

    def add(self, fb: FeatureBatch) -> None:
        if len(fb):
            self._frags.append(fb)
            self._rows += len(fb)

    @property
    def rows(self) -> int:
        return self._rows

    def pop_full(self) -> FeatureBatch | None:
        if self._rows < self.target:
            return None
        pieces: list[FeatureBatch] = []
        need = self.target
        while need > 0:
            fb = self._frags.popleft()
            if len(fb) <= need:
                pieces.append(fb)
                need -= len(fb)
            else:
                head, tail = _split(fb, need)
                pieces.append(head)
                self._frags.appendleft(tail)
                need = 0
        self._rows -= self.target
        if len(pieces) == 1:
            return pieces[0]
        return _merge(pieces)

    def pop_rest(self) -> FeatureBatch | None:
        if self._rows == 0:
            return None
        pieces = list(self._frags)
        self._frags.clear()
        self._rows = 0
        return pieces[0] if len(pieces) == 1 else _merge(pieces)


def bounded_thread_map(fn: Callable, it: Iterable, workers: int = 2,
                       depth: int = 4) -> Iterator:
    """Ordered parallel map over an iterator with bounded lookahead —
    ThreadPoolExecutor.map without its unbounded input consumption. Made
    for the native parser, whose ctypes calls release the GIL."""
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    it = iter(it)
    pool = ThreadPoolExecutor(max_workers=workers)
    window: deque = deque()
    try:
        exhausted = False
        while True:
            while not exhausted and len(window) < depth:
                try:
                    window.append(pool.submit(fn, next(it)))
                except StopIteration:
                    exhausted = True
            if not window:
                break
            yield window.popleft().result()
    finally:
        pool.shutdown(wait=False, cancel_futures=True)


class PrefetchIterator:
    """Run an iterator in a daemon thread with a bounded queue: the producer
    (TSV parsing) overlaps the consumer (device compute + writing)."""

    def __init__(self, it: Iterable, depth: int = 4):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err: BaseException | None = None

        def _run():
            try:
                for item in it:
                    self._q.put(item)
            except BaseException as exc:  # propagated to the consumer
                self._err = exc
            finally:
                self._q.put(_SENTINEL)

        self._t = threading.Thread(target=_run, daemon=True)
        self._t.start()

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is _SENTINEL:
            if self._err is not None:
                raise self._err
            raise StopIteration
        return item


class AsyncWriter:
    """Bounded background writer thread (text rows -> file), replacing the
    reference's writer process (call_modifications.py:262-282)."""

    def __init__(self, path: str, is_gzip: bool = False, depth: int = 64):
        import gzip

        from ..utils.formats import gzip_path
        self._path = gzip_path(path) if is_gzip else path
        # binary handles: text rows are encoded on the writer thread, and
        # the native emitter's pre-built byte blocks pass straight through
        self._fh = gzip.open(self._path, "wb") if is_gzip else open(
            self._path, "wb")
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err: BaseException | None = None
        self._t = threading.Thread(target=self._run, daemon=True)
        self._t.start()

    def _run(self):
        try:
            while True:
                rows = self._q.get()
                if rows is _SENTINEL:
                    break
                if isinstance(rows, bytes):  # native-emitted block
                    self._fh.write(rows)
                elif isinstance(rows, str):  # pre-joined block
                    self._fh.write(rows.encode())
                else:
                    self._fh.write("\n".join(rows).encode())
                    self._fh.write(b"\n")
        except BaseException as exc:
            self._err = exc
            # keep draining so producers blocked on a full queue (and
            # close()'s sentinel put) never hang; the error surfaces on
            # the producer's next write_rows/close call
            while True:
                item = self._q.get()
                if item is _SENTINEL:
                    break
        finally:
            self._fh.close()

    def write_rows(self, rows: list[str]):
        if self._err is not None:
            raise self._err
        if rows:
            self._q.put(rows)

    def write_text(self, text: str):
        """Write a pre-joined, newline-terminated block."""
        if self._err is not None:
            raise self._err
        if text:
            self._q.put(text)

    def write_bytes(self, block: bytes):
        """Write a pre-built, newline-terminated byte block."""
        if self._err is not None:
            raise self._err
        if block:
            self._q.put(block)

    def close(self):
        self._q.put(_SENTINEL)
        self._t.join()
        if self._err is not None:
            raise self._err

    @property
    def path(self) -> str:
        return self._path
