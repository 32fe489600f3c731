"""extract — per-site feature extraction from tombo-resquiggled fast5s.

Reference behavior (extract_features.py:277-378,589-651): per read,
rescale + normalize the raw signal, rebuild the genome-aligned sequence and
per-base signal segments from the event table, scan for motif hits, and for
each centered site emit a 12-column feature row. Process topology: worker
pool over fast5 batches + one writer.

TPU-native redesign of the hot loop: the per-base Python loops are replaced
with vectorized segment statistics (float64 cumulative sums over the event
table) and a single gathered (n_bases, signal_len) signal matrix build —
downsampling is deterministic evenly-spaced by default ("even") with a
reference-compatible random mode ("compat", extract_features.py:248).
"""
from __future__ import annotations

import contextlib
import os
import random
import shutil
import time
import multiprocessing as mp
from concurrent.futures import ProcessPoolExecutor, as_completed
from dataclasses import dataclass, replace as dc_replace

import numpy as np

from ..io.fast5 import TomboRead, read_tombo_fast5
from ..utils.bases import seq_to_codes
from ..utils.fasta import get_contig2len
from ..utils.fileio import get_fast5s
from ..utils.formats import FeatureBatch, format_feature_row, gzip_path
from ..utils.motifs import (PositionIndex, expand_motifs,
                            motif_locs_in_codes, parse_region)

# MAD consistency constant: Gaussian.ppf(3/4), the statsmodels robust.mad
# default the reference relies on (extract_features.py:183)
_MAD_C = 0.6744897501960817


def normalize_signals(signals: np.ndarray, method: str = "mad") -> np.ndarray:
    """Read-level normalization, rounded to 6 decimals
    (extract_features.py:179-190)."""
    signals = np.asarray(signals, dtype=np.float64)
    if method == "zscore":
        shift, scale = np.mean(signals), float(np.std(signals))
    elif method == "mad":
        med = np.median(signals)
        shift, scale = med, float(np.median(np.abs(signals - med)) / _MAD_C)
    else:
        raise ValueError("normalize_method must be mad or zscore")
    if scale == 0.0:
        norm = signals
    else:
        norm = (signals - shift) / scale
    return np.around(norm, decimals=6)


def segment_stats(norm: np.ndarray, starts: np.ndarray, lengths: np.ndarray
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Per-event mean/std over ``norm`` segments [start, start+length) via
    float64 cumulative sums — O(signal+bases) instead of a Python loop."""
    cs = np.concatenate([[0.0], np.cumsum(norm, dtype=np.float64)])
    cs2 = np.concatenate([[0.0], np.cumsum(norm * norm, dtype=np.float64)])
    ends = starts + lengths
    sums = cs[ends] - cs[starts]
    sums2 = cs2[ends] - cs2[starts]
    n = np.maximum(lengths, 1).astype(np.float64)
    means = sums / n
    var = np.maximum(sums2 / n - means * means, 0.0)
    return means, np.sqrt(var)


def segment_stats_exact(norm: np.ndarray, starts: np.ndarray,
                        lengths: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Bit-exact np.mean/np.std per segment (pairwise summation) — the
    reference's numerics (extract_features.py:364-365). Used in "compat"
    mode; the cumsum path can differ by 1 ulp at 6-decimal rounding
    boundaries."""
    means = np.empty(len(starts), np.float64)
    stds = np.empty(len(starts), np.float64)
    for i in range(len(starts)):
        seg = norm[starts[i]:starts[i] + lengths[i]]
        means[i] = np.mean(seg)
        stds[i] = np.std(seg)
    return means, stds


def build_signal_rect(norm: np.ndarray, starts: np.ndarray,
                      lengths: np.ndarray, signal_len: int,
                      downsample: str = "even",
                      rng: random.Random | None = None) -> np.ndarray:
    """(n_bases, signal_len) matrix: center-zero-padded when a base has
    fewer samples, downsampled (order-preserving) when it has more
    (extract_features.py:232-251).

    "even": deterministic evenly-spaced downsampling (TPU-native default —
    reproducible outputs). "compat": the reference's sorted random sample.
    """
    n = len(starts)
    S = signal_len
    rel = np.arange(S)[None, :]                       # (1, S)
    lens = lengths[:, None]                           # (n, 1)
    st = starts[:, None]

    if downsample == "even":
        # long bases: strictly increasing evenly-spaced picks
        long_idx = st + (rel * lens) // S
    elif downsample == "compat":
        rng = rng or random
        from ..utils.fastparse import CompatSampler, build_rect_compat
        if isinstance(rng, CompatSampler):
            # native whole-read kernel on the same MT stream (byte-
            # identical to the loop below under the same seed; falls
            # back on corrupt event tables)
            r = build_rect_compat(norm, starts, lengths, S, rng)
            if r is not None:
                return r
        long_idx = np.empty((n, S), dtype=np.int64)
        long_rows = np.nonzero(lengths > S)[0]
        for i in long_rows:
            picks = sorted(rng.sample(range(int(lengths[i])), S))
            long_idx[i] = starts[i] + np.asarray(picks)
        short_rows = lengths <= S
        long_idx[short_rows] = (st + (rel * lens) // S)[short_rows]
    else:
        raise ValueError("downsample must be 'even' or 'compat'")

    pad_left = (S - lens) // 2                        # (n, 1), for short rows
    k = rel - pad_left
    short_valid = (k >= 0) & (k < lens)
    short_idx = st + np.clip(k, 0, np.maximum(lens - 1, 0))

    is_long = lens > S
    idx = np.where(is_long, long_idx, short_idx)
    mask = np.where(is_long, True, short_valid)
    # np.where (not multiply): pad slots must be +0.0, never -0.0
    rect = np.where(mask, norm[np.clip(idx, 0, len(norm) - 1)], 0.0)
    return rect


@dataclass
class ExtractOptions:
    corrected_group: str = "RawGenomeCorrected_000"
    basecall_subgroup: str = "BaseCalled_template"
    normalize_method: str = "mad"
    motifs: str = "CG"
    mod_loc: int = 0
    kmer_len: int = 13
    signal_len: int = 16
    methy_label: int = 1
    positions: str | None = None          # path to positions file
    region: str | None = None
    reference_path: str | None = None
    downsample: str = "even"
    # packed-wire producers set this: the signal rect is assembled
    # natively straight to float16 (the wire's dtype), skipping the
    # float64 numpy gather + astype pass. Identical values (same
    # round-to-nearest-even, tested); only honored with downsample
    # "even" and the native library present.
    rect_f16: bool = False


@dataclass
class ExtractContext:
    """Pre-resolved, worker-shareable state (reference _extract_preprocess_,
    extract_features.py:532-553)."""
    motif_seqs: list[str]
    chrom2len: dict | None
    positions: PositionIndex | None
    regioninfo: tuple
    opts: ExtractOptions

    @classmethod
    def build(cls, opts: ExtractOptions, is_dna: bool = True
              ) -> "ExtractContext":
        if opts.kmer_len % 2 == 0:
            raise ValueError("kmer_len must be odd")
        motif_seqs = expand_motifs(opts.motifs, is_dna)
        chrom2len = (get_contig2len(opts.reference_path)
                     if opts.reference_path else None)
        positions = (PositionIndex(opts.positions)
                     if opts.positions else None)
        regioninfo = parse_region(opts.region)
        return cls(motif_seqs, chrom2len, positions, regioninfo, opts)


def extract_read_features(read: TomboRead, ctx: ExtractContext,
                          rng: random.Random | None = None):
    """All feature rows of one read as struct-of-arrays, or None if the read
    is filtered out. Site semantics parity: extract_features.py:296-372."""
    opts = ctx.opts
    rg_chrom, rg_start, rg_end = ctx.regioninfo
    if rg_chrom is not None and rg_chrom != read.chrom:
        return None

    seq = read.seq
    L = len(seq)
    read_rg_start = read.chrom_start if rg_start is None else rg_start
    read_rg_end = read.chrom_start + L if rg_end is None else rg_end
    if read_rg_start >= read.chrom_start + L or \
            read_rg_end <= read.chrom_start:
        return None

    chromlen = None
    if ctx.chrom2len is not None:
        chromlen = ctx.chrom2len.get(read.chrom)
        if chromlen is None:
            print("warning - chrom_name in fast5 not in provided reference "
                  "genome!")

    seq_bytes = np.frombuffer(seq.encode("ascii"), dtype=np.uint8)
    locs = motif_locs_in_codes(seq_bytes, ctx.motif_seqs, opts.mod_loc)
    nb = (opts.kmer_len - 1) // 2
    locs = locs[(locs >= nb) & (locs < L - nb)]
    if len(locs) == 0:
        return None

    if read.alignstrand == "-":
        pos = read.chrom_start + L - 1 - locs
    else:
        pos = read.chrom_start + locs
    if chromlen is not None:
        pos_in_strand = (chromlen - 1 - pos if read.alignstrand == "-"
                         else pos)
    else:
        pos_in_strand = np.full_like(pos, -1)

    keep = np.ones(len(locs), dtype=bool)
    if rg_chrom is not None:
        keep &= (pos >= read_rg_start) & (pos < read_rg_end)
    if ctx.positions is not None:
        keep &= ctx.positions.mask(read.chrom, read.alignstrand, pos)
    locs, pos, pos_in_strand = locs[keep], pos[keep], pos_in_strand[keep]
    if len(locs) == 0:
        return None

    # fused native kernel: normalize + round + segment stats + f16 rect
    # in one C pass (dsp_read_norm_stats) — bit-exact with the numpy
    # chain below, which remains the fallback (no native lib, zscore's
    # pairwise-sum numerics, compat mode, corrupt event tables)
    f16pre = None
    nres = None
    if opts.normalize_method == "mad" and opts.downsample == "even":
        from ..utils.fastparse import extract_norm_stats
        # rect only when the f16 wire wants it: TSV/f64 consumers
        # rebuild the rect in float64 below, so computing the f16 one
        # too would be pure waste (it was a measured slice of the kernel)
        nres = extract_norm_stats(read.raw_signal, read.event_starts,
                                  read.event_lengths, opts.signal_len,
                                  want_rect=opts.rect_f16)
    if nres is not None:
        norm, means, stds = nres["norm"], nres["means"], nres["stds"]
        if opts.rect_f16:
            rect = nres["rect16"]
            f16pre = (nres["means16"], nres["stds16"], nres["lens16"])
        else:
            rect = build_signal_rect(norm, read.event_starts,
                                     read.event_lengths, opts.signal_len,
                                     opts.downsample, rng)
    elif opts.normalize_method == "mad" and opts.downsample == "compat":
        # native compat chain (VERDICT r4 item 6): MAD normalize + exact
        # pairwise-sum per-event stats in C; the rect goes native inside
        # build_signal_rect when rng is a CompatSampler. Byte-identical
        # to the Python chain below (fuzz-tested), which stays the
        # fallback for a missing lib or corrupt event tables.
        from ..utils.fastparse import (normalize_mad_native,
                                       segment_stats_exact_native)
        norm = normalize_mad_native(read.raw_signal)
        if norm is None:
            norm = normalize_signals(read.raw_signal, "mad")
        nstats = segment_stats_exact_native(norm, read.event_starts,
                                            read.event_lengths)
        if nstats is not None:
            means, stds = nstats
        else:
            means, stds = segment_stats_exact(norm, read.event_starts,
                                              read.event_lengths)
        rect = build_signal_rect(norm, read.event_starts,
                                 read.event_lengths, opts.signal_len,
                                 "compat", rng)
    else:
        norm = normalize_signals(read.raw_signal, opts.normalize_method)
        stats_fn = (segment_stats_exact if opts.downsample == "compat"
                    else segment_stats)
        means, stds = stats_fn(norm, read.event_starts,
                               read.event_lengths)
        rect = None
        if opts.rect_f16 and opts.downsample == "even":
            from ..utils.fastparse import build_rect_f16
            rect = build_rect_f16(norm, read.event_starts,
                                  read.event_lengths, opts.signal_len)
        if rect is None:
            rect = build_signal_rect(norm, read.event_starts,
                                     read.event_lengths, opts.signal_len,
                                     opts.downsample, rng)

    # per-read arrays + site locs; the 13-mer windows are gathered lazily
    # (windowize_features) or on device by the packed wire path — adjacent
    # sites share kmer_len-1 window bases, so materializing windows here
    # would duplicate every base up to kmer_len times
    return {
        "chrom": read.chrom, "strand": read.alignstrand,
        "readname": read.readname, "read_strand": read.read_strand,
        "pos": pos, "pos_in_strand": pos_in_strand,
        "locs": locs, "seq": seq, "kmer_len": opts.kmer_len,
        "r_means": means, "r_stds": stds,
        "r_lens": read.event_lengths, "r_rect": rect,
        # packed-wire producers: round6+astype(f16) already fused into
        # the native kernel — (means16, stds16, lens16) or None
        "r_f16": f16pre,
        "label": opts.methy_label,
    }


def windowize_features(feats: dict) -> dict:
    """Materialize the per-site kmer windows of one read's features
    (extract_features.py:296-372's per-site view of the read arrays)."""
    if "means" in feats:
        return feats
    locs, seq = feats["locs"], feats["seq"]
    nb = (feats["kmer_len"] - 1) // 2
    win = locs[:, None] + np.arange(-nb, nb + 1)[None, :]   # (n, k)
    return {**feats,
            "kmers": [seq[lo - nb:lo + nb + 1] for lo in locs],
            "means": feats["r_means"][win], "stds": feats["r_stds"][win],
            "lens": feats["r_lens"][win], "rect": feats["r_rect"][win]}


def features_to_rows(feats: dict) -> list[str]:
    """Format one read's features as TSV rows (extract_features.py:381).
    Uses the native column formatter when available."""
    from ..utils.fastparse import format_feature_cols

    feats = windowize_features(feats)
    n = len(feats["pos"])
    cols = format_feature_cols(feats["means"], feats["stds"],
                               feats["lens"], feats["rect"])
    if cols is not None:
        label = str(feats["label"])
        chrom, strand = feats["chrom"], feats["strand"]
        readname, read_strand = feats["readname"], feats["read_strand"]
        return ["\t".join([chrom, str(int(feats["pos"][i])), strand,
                           str(int(feats["pos_in_strand"][i])), readname,
                           read_strand, feats["kmers"][i], cols[i], label])
                for i in range(n)]

    rows = []
    means = np.around(feats["means"], 6)
    stds = np.around(feats["stds"], 6)
    for i in range(n):
        rows.append(format_feature_row(
            feats["chrom"], int(feats["pos"][i]), feats["strand"],
            int(feats["pos_in_strand"][i]), feats["readname"],
            feats["read_strand"], feats["kmers"][i], means[i], stds[i],
            feats["lens"][i], feats["rect"][i].tolist(), feats["label"]))
    return rows


def features_to_batch(feats_list: list[dict], kmer_len: int,
                      signal_len: int) -> FeatureBatch:
    """Assemble reads' features straight into model-ready arrays — the fused
    fast5 -> call_mods path skips text round-tripping entirely."""
    sampleinfo: list[str] = []
    read_ids: list[str] = []
    kmers, means, stds, lens, rects, labels = [], [], [], [], [], []
    for f in feats_list:
        f = windowize_features(f)
        n = len(f["pos"])
        for i in range(n):
            sampleinfo.append("\t".join([
                f["chrom"], str(int(f["pos"][i])), f["strand"],
                str(int(f["pos_in_strand"][i])), f["readname"],
                f["read_strand"]]))
            read_ids.append(f["readname"])
        kmers.append(np.stack([seq_to_codes(k) for k in f["kmers"]]))
        # match the on-disk 6-decimal rounding so the fused path and the
        # TSV path feed the model identical values
        means.append(np.around(f["means"], 6))
        stds.append(np.around(f["stds"], 6))
        lens.append(f["lens"])
        rects.append(f["rect"])
        labels.append(np.full(n, f["label"], dtype=np.int32))
    return FeatureBatch(
        sampleinfo,
        np.concatenate(kmers).astype(np.int32),
        np.concatenate(means).astype(np.float32),
        np.concatenate(stds).astype(np.float32),
        np.concatenate(lens).astype(np.float32),
        np.concatenate(rects).astype(np.float32),
        np.concatenate(labels), read_ids)


def features_to_packed(feats_list: list[dict]):
    """Assemble reads' features into a read-packed wire block
    (fastparse.PackedFeatureBlock): per-base arrays concatenated across
    reads + per-site window centers. No per-site windows are materialized
    anywhere on the host — the kmer gather happens on device."""
    from ..utils.fastparse import PackedFeatureBlock, format_info_rows

    info_blobs: list[bytes] = []
    info_lens_l: list[np.ndarray] = []
    centers_l, labels_l = [], []
    codes_l, means_l, stds_l, lens_l, rect_l = [], [], [], [], []
    base_off = 0
    kmer_len = feats_list[0]["kmer_len"]
    for f in feats_list:
        n = len(f["pos"])
        chrom, strand = f["chrom"], f["strand"]
        readname, read_strand = f["readname"], f["read_strand"]
        pos, pis = f["pos"], f["pos_in_strand"]
        # per-site info prefixes: native formatter (one C call per read);
        # the Python genexpr fallback measured ~25% of this worker's time
        native = format_info_rows(chrom, strand, readname, read_strand,
                                  pos, pis)
        if native is not None:
            blob, rlens = native
            info_blobs.append(blob)
            info_lens_l.append(rlens)
        else:
            rows = ["\t".join([chrom, str(int(pos[i])), strand,
                               str(int(pis[i])), readname,
                               read_strand]).encode() for i in range(n)]
            info_blobs.append(b"".join(rows))
            info_lens_l.append(np.fromiter(map(len, rows), np.int64, n))
        centers_l.append(f["locs"].astype(np.int64) + base_off)
        labels_l.append(np.full(n, f["label"], np.int32))
        codes_l.append(seq_to_codes(f["seq"]).astype(np.int8))
        # match the on-disk 6-decimal rounding (features_to_batch does the
        # same on its windowed view — identical values either way); the
        # native kernel pre-fuses this round+cast when it ran
        if f.get("r_f16") is not None:
            m16, s16, l16 = f["r_f16"]
            means_l.append(m16)
            stds_l.append(s16)
            lens_l.append(l16)
        else:
            means_l.append(np.around(f["r_means"], 6).astype(np.float16))
            stds_l.append(np.around(f["r_stds"], 6).astype(np.float16))
            lens_l.append(f["r_lens"].astype(np.float16))
        rect_l.append(np.asarray(f["r_rect"], np.float16))
        base_off += len(f["seq"])
    lens_b = np.concatenate(info_lens_l) if info_lens_l else \
        np.zeros(0, np.int64)
    n_rows = len(lens_b)
    row_starts = np.zeros(n_rows, np.int64)
    if n_rows > 1:
        np.cumsum(lens_b[:-1], out=row_starts[1:])
    return PackedFeatureBlock(
        b"".join(info_blobs), row_starts, row_starts + lens_b,
        np.concatenate(centers_l).astype(np.int32),
        np.concatenate(codes_l), np.concatenate(means_l),
        np.concatenate(stds_l), np.concatenate(lens_l),
        np.concatenate(rect_l), np.concatenate(labels_l), kmer_len)


# ---------------------------------------------------------------------------
# process-pool pipeline
# ---------------------------------------------------------------------------

_G_CTX: ExtractContext | None = None
_G_SEED: int | None = None
# pooled-run sink spec: workers write their own output (part files / npz
# batches) instead of shipping rows through the result queue — the
# executor's result pipe measured ~15 MB/s effective under concurrent
# 20 MB string-list payloads, capping 3-worker extraction at 31k rows/s
# vs 94k+ with worker-side writes (same fixture, same host)
_G_SINK: tuple | None = None


def _init_worker(ctx: ExtractContext, seed: int | None,
                 sink: tuple | None = None):
    global _G_CTX, _G_SEED, _G_SINK
    _G_CTX = ctx
    _G_SEED = seed
    _G_SINK = sink


def _batch_rng(batch_idx: int) -> random.Random | None:
    """Deterministic per-batch RNG for "compat" downsampling: keyed by the
    batch index, not the worker pid, so --seed reproduces byte-identical
    output across runs and pool layouts. Prefers the native
    CPython-compatible MT sampler (same stream, same picks as
    random.Random — fuzz-tested) so the compat rect can run in C."""
    from ..utils.fastparse import compat_sampler
    if _G_SEED is None:
        # unseeded (reference-like nondeterminism) — still prefer the
        # native sampler, entropy-seeded like CPython's default
        return compat_sampler(int.from_bytes(os.urandom(16), "little"))
    seed = _G_SEED * 1_000_003 + batch_idx
    return compat_sampler(seed) or random.Random(seed)


_warned_actionable = False


def _test_crash_hook(paths: list[str]) -> None:
    """Deterministic worker-death injection for elastic-recovery tests:
    SIGKILL this worker when the batch contains a path matching
    $DSP_TEST_CRASH_MARKER. With $DSP_TEST_CRASH_ONCE set (a filesystem
    sentinel path), only the FIRST matching worker dies — exercising the
    respawn-and-retry path; without it every attempt dies — exercising
    quarantine. No-op unless the env vars are set (tests only)."""
    marker = os.environ.get("DSP_TEST_CRASH_MARKER")
    if not marker or not any(marker in p for p in paths):
        return
    once = os.environ.get("DSP_TEST_CRASH_ONCE")
    if once:
        try:
            os.close(os.open(once, os.O_CREAT | os.O_EXCL | os.O_WRONLY))
        except FileExistsError:
            return   # already crashed once: behave this time
    import signal as _signal
    os.kill(os.getpid(), _signal.SIGKILL)


def _extract_batch_feats(paths: list[str], batch_idx: int = 0
                         ) -> tuple[list[dict], int]:
    from ..io.fast5 import MultiReadFast5Error, VBZPluginError
    global _warned_actionable
    _test_crash_hook(paths)
    ctx = _G_CTX
    rng = _batch_rng(batch_idx)
    feats_list: list[dict] = []
    errors = 0
    for p in paths:
        try:
            read = read_tombo_fast5(p, ctx.opts.corrected_group,
                                    ctx.opts.basecall_subgroup)
            if read is None:
                continue
            feats = extract_read_features(read, ctx, rng)
            if feats is not None:
                feats_list.append(feats)
        except (MultiReadFast5Error, VBZPluginError) as exc:
            # these failures have a user fix (convert / install plugin);
            # surface the hint once per process instead of only counting
            if not _warned_actionable:
                _warned_actionable = True
                print(f"[warn] {exc}")
            errors += 1
        except Exception:
            errors += 1
    return feats_list, errors


def _worker_rows(paths: list[str], batch_idx: int = 0
                 ) -> tuple[list[str], int]:
    feats_list, errors = _extract_batch_feats(paths, batch_idx)
    rows: list[str] = []
    for f in feats_list:
        rows.extend(features_to_rows(f))
    return rows, errors


def _worker_batch(paths: list[str], batch_idx: int = 0):
    feats_list, errors = _extract_batch_feats(paths, batch_idx)
    ctx = _G_CTX
    if not feats_list:
        return None, errors
    return features_to_batch(feats_list, ctx.opts.kmer_len,
                             ctx.opts.signal_len), errors


def part_path(part_dir: str, batch_idx: int) -> str:
    return os.path.join(part_dir, f"{batch_idx:06d}.part")


def _drain_pool_elastic(batches: list, worker, nworkers: int, initargs,
                        on_done, label: str = "extract") -> None:
    """Run ``worker(batch, bi)`` over a process pool, surviving worker
    PROCESS death (segfault/OOM-kill in native or HDF5 code — distinct
    from per-read exceptions, which workers already catch and count).

    One dead worker breaks the whole ProcessPoolExecutor: every
    outstanding future raises BrokenProcessPool and, without recovery,
    the run aborts and completed work is lost. Recovery here: respawn
    the pool for the unfinished batches while rounds make progress; a
    round with NO progress switches to serial isolation (one
    single-worker pool per batch) so the culprit batch is identified
    exactly and quarantined — ``on_done(bi, None)``, its files counted
    as failed — while innocent batches still complete. Reference
    behavior: worker death there is detected only by is_alive polling
    and kills the run (extract_features.py:633-639); per-read error
    counting is extract_features.py:373-375.

    ``on_done(bi, result)`` is called exactly once per batch, from this
    thread; ``result`` is None only for quarantined batches."""
    from concurrent.futures import CancelledError
    from concurrent.futures.process import BrokenProcessPool

    def _pool(workers: int):
        return ProcessPoolExecutor(max_workers=workers,
                                   mp_context=mp.get_context("spawn"),
                                   initializer=_init_worker,
                                   initargs=initargs)

    pending = dict(enumerate(batches))
    while pending:
        before = len(pending)
        pool = _pool(min(nworkers, len(pending)))
        broken = False
        try:
            futs = {pool.submit(worker, b, bi): bi
                    for bi, b in sorted(pending.items())}
            for fut in as_completed(futs):
                try:
                    res = fut.result()
                except (BrokenProcessPool, CancelledError):
                    broken = True
                    continue
                on_done(futs[fut], res)
                del pending[futs[fut]]
        finally:
            pool.shutdown(wait=False, cancel_futures=True)
        if not broken:
            return
        if len(pending) < before:
            print(f"[{label}] a worker process died; respawning the pool "
                  f"for {len(pending)} unfinished batches", flush=True)
            continue
        # no progress: isolate serially to identify the culprit exactly
        print(f"[{label}] worker pool died with no progress; isolating "
              f"{len(pending)} batches serially", flush=True)
        for bi in sorted(pending):
            with _pool(1) as p1:
                try:
                    res = p1.submit(worker, pending[bi], bi).result()
                except (BrokenProcessPool, CancelledError):
                    print(f"[{label}] batch {bi} kills its worker — "
                          f"quarantined ({len(pending[bi])} files "
                          f"counted as failed)", flush=True)
                    res = None
            on_done(bi, res)
        return


def _worker_rows_part(paths: list[str], batch_idx: int = 0
                      ) -> tuple[int, int]:
    """Pooled TSV worker: extract + format + WRITE a part file (gzip
    member when the output is gzip — concatenated members form a valid
    gzip stream), returning only (n_rows, n_errors). Keeps multi-MB row
    payloads out of the executor's result queue."""
    part_dir, is_gzip = _G_SINK
    rows, errors = _worker_rows(paths, batch_idx)
    data = ("\n".join(rows) + "\n").encode() if rows else b""
    path = part_path(part_dir, batch_idx)
    if is_gzip:
        import gzip as _gzip
        with _gzip.open(path, "wb") as fh:
            fh.write(data)
    else:
        with open(path, "wb") as fh:
            fh.write(data)
    return len(rows), errors


def _worker_packed(paths: list[str], batch_idx: int = 0):
    feats_list, errors = _extract_batch_feats(paths, batch_idx)
    if not feats_list:
        return None, errors
    return features_to_packed(feats_list), errors


def _worker_batch_save(paths: list[str], batch_idx: int = 0
                       ) -> tuple[int, int]:
    """Pooled npz worker: extract + save the batch-indexed .npz itself
    (deterministic names regardless of completion order), returning only
    counts — array payloads never cross the result queue."""
    from ..utils.formats import (save_feature_npz, save_packed_npz,
                                 save_wire_npz)
    write_dir, out_format = _G_SINK
    path = os.path.join(write_dir, f"{batch_idx:06d}.npz")
    # atomic: a worker SIGKILLed mid-save must not leave a truncated
    # .npz behind — the run would report success (batch retried or
    # quarantined with errors counted) while a later consumer crashes on
    # the corrupt zip. The dot-temp doesn't end in ".npz" so directory
    # loaders (feature_npz_paths) never pick it up; np.savez appends no
    # extension to an open file object.
    tmp = os.path.join(write_dir, f".{batch_idx:06d}.npz.tmp")

    def _atomic_save(save_fn, payload) -> None:
        with open(tmp, "wb") as fh:
            save_fn(fh, payload)
        os.replace(tmp, path)

    if out_format == "npz_packed":
        pb, errors = _worker_packed(paths, batch_idx)
        if pb is None or pb.n == 0:
            return 0, errors
        _atomic_save(save_packed_npz, pb)
        return pb.n, errors
    fb, errors = _worker_batch(paths, batch_idx)
    if fb is None or not len(fb):
        return 0, errors
    save_fn = save_wire_npz if out_format == "npz_wire" else save_feature_npz
    _atomic_save(save_fn, fb)
    return len(fb), errors


class _RotatingSinkBase:
    """Shared sink skeleton: one output file, or a rotating directory of
    batch files with a new file every ``w_batch_num`` batches
    (reference extract_features.py:451-517). Subclasses provide
    ``_open(path)`` for their payload type; ``_advance()`` implements
    the shared rotation."""

    def __init__(self, write_path: str, is_dir: bool, w_batch_num: int,
                 is_gzip: bool):
        self._gz = is_gzip
        self._is_dir = is_dir
        self._w_batch_num = w_batch_num
        self._batch_count = 0
        self._file_count = 0
        if is_dir:
            if os.path.exists(write_path) and os.path.isfile(write_path):
                raise FileExistsError(
                    f"{write_path} already exists as a file, please use "
                    "another write_dir")
            os.makedirs(write_path, exist_ok=True)
            self._dir = write_path
            self._fh = self._open_next()
        else:
            self._fh = self._open(gzip_path(write_path) if is_gzip
                                  else write_path)

    def _open_next(self):
        ext = ".tsv.gz" if self._gz else ".tsv"
        return self._open("/".join([self._dir,
                                    str(self._file_count) + ext]))

    def _advance(self):
        """Rotate (dir mode) before a batch, count it after — callers
        wrap each batch write between _advance() and _batch_done()."""
        if self._is_dir and self._batch_count >= self._w_batch_num:
            self._fh.close()
            self._file_count += 1
            self._fh = self._open_next()
            self._batch_count = 0

    def _batch_done(self):
        self._batch_count += 1

    def close(self):
        self._fh.close()


class _RotatingWriter(_RotatingSinkBase):
    """Row-level sink for single-process runs."""

    def _open(self, path: str):
        if self._gz:
            import gzip as _gzip
            return _gzip.open(path, "wt")
        return open(path, "w")

    def write_rows(self, rows: list[str]):
        self._advance()
        for r in rows:
            self._fh.write(r + "\n")
        self._batch_done()


class _PartConcatWriter(_RotatingSinkBase):
    """Byte-level sink for pooled runs: workers wrote finished part files
    (plain text or gzip members); this appends them into the final
    output via os.sendfile (zero-copy), so the main process stays off
    the CPUs the workers need. Gzip outputs become multi-member
    streams: every decompressor yields bytes identical to the
    single-member file."""

    def _open(self, path: str):
        return open(path, "wb")

    def append_part(self, part: str):
        self._advance()
        # any buffered bytes (copyfileobj fallback tails) must hit the
        # fd before sendfile writes at the kernel offset, or output
        # bytes reorder
        self._fh.flush()
        with open(part, "rb") as pfh:
            size = os.fstat(pfh.fileno()).st_size
            off = 0
            try:
                while off < size:
                    sent = os.sendfile(self._fh.fileno(), pfh.fileno(),
                                       off, size - off)
                    if sent == 0:
                        break
                    off += sent
            except OSError:
                pass                    # fs without sendfile support
            if off < size:
                pfh.seek(off)
                shutil.copyfileobj(pfh, self._fh, 4 << 20)
        os.remove(part)
        self._batch_done()


def extract_features(fast5_dir: str, is_recursive: bool,
                     ctx: ExtractContext, write_path: str, nproc: int = 4,
                     f5_batch_size: int = 30, w_is_dir: bool = False,
                     w_batch_num: int = 200, is_gzip: bool = False,
                     seed: int | None = None,
                     out_format: str = "tsv") -> tuple[int, int]:
    """Directory of fast5s -> features TSV (reference format) or a
    directory of binary .npz feature batches (``out_format="npz"`` — the
    TPU-native container, no text codec downstream). Returns
    (n_fast5s, n_errors). Multi-host runs shard the fast5 list per host."""
    from ..parallel.dist import host_output_path, shard_for_host
    from ..utils.formats import save_feature_npz

    print("[main] extract_features starts..")
    t0 = time.time()
    if out_format == "npz_packed":
        # the packed wire is f16: assemble the rect natively at that
        # dtype (same rounding; skips a float64 gather per read)
        ctx = dc_replace(ctx, opts=dc_replace(ctx.opts, rect_f16=True))
    if not os.path.isdir(fast5_dir):
        raise ValueError("--fast5_dir is not a directory!")
    from ..io.fast5 import vbz_plugin_available
    if not vbz_plugin_available():
        print("[warn] HDF5 VBZ plugin (filter 32020) not loaded — "
              "VBZ-compressed fast5s will fail to read. Install "
              "ont-vbz-hdf5-plugin and set HDF5_PLUGIN_PATH if your reads "
              "are VBZ-compressed.")
    fast5s = shard_for_host(get_fast5s(fast5_dir, is_recursive))
    print("{} fast5 files in total (this host)..".format(len(fast5s)))
    # hosts must not clobber each other's output
    write_path = host_output_path(write_path)

    as_npz = out_format in ("npz", "npz_wire", "npz_packed")
    if as_npz:
        from ..utils.formats import save_packed_npz, save_wire_npz
        save_fn = {"npz_wire": save_wire_npz,
                   "npz_packed": save_packed_npz,
                   "npz": save_feature_npz}[out_format]
        if os.path.isfile(write_path):
            raise FileExistsError(f"{write_path} exists as a file")
        os.makedirs(write_path, exist_ok=True)

    batches = [fast5s[i:i + f5_batch_size]
               for i in range(0, len(fast5s), f5_batch_size)]
    errors = 0
    # workers write their own output (npz batches / TSV part files) and
    # return only counts: shipping multi-MB row payloads through the
    # executor's result queue measured ~15 MB/s effective and made the
    # pooled path SLOWER than single-process (31k vs 33k rows/s; part
    # files: 94k). The main process only concatenates bytes, so every
    # nproc slot can be an extraction worker (the reference reserves one
    # of nproc for its writer process, extract_features.py:560-575).
    nworkers = max(1, min(nproc, len(batches)))
    if nworkers == 1:
        if as_npz:
            def _sink(result, batch_idx):
                fb, err = result
                n = 0 if fb is None else (
                    fb.n if out_format == "npz_packed" else len(fb))
                if n:
                    save_fn(os.path.join(write_path,
                                         f"{batch_idx:06d}.npz"), fb)
                return err

            worker = (_worker_packed if out_format == "npz_packed"
                      else _worker_batch)
        else:
            writer = _RotatingWriter(write_path, w_is_dir, w_batch_num,
                                     is_gzip)

            def _sink(result, batch_idx):
                rows, err = result
                writer.write_rows(rows)
                return err

            worker = _worker_rows
        _init_worker(ctx, seed)
        for bi, b in enumerate(batches):
            errors += _sink(worker(b, bi), bi)
        if not as_npz:
            writer.close()
    elif as_npz:
        def _on_npz(bi, res):
            nonlocal errors
            errors += len(batches[bi]) if res is None else res[1]

        _drain_pool_elastic(batches, _worker_batch_save, nworkers,
                            (ctx, seed, (write_path, out_format)), _on_npz)
        # sweep dot-temps a SIGKILLed save attempt may have left (the
        # final .npz names are always complete — writes are atomic)
        for f in os.listdir(write_path):
            if f.startswith(".") and f.endswith(".npz.tmp"):
                with contextlib.suppress(OSError):
                    os.unlink(os.path.join(write_path, f))
    else:
        import tempfile
        writer = _PartConcatWriter(write_path, w_is_dir, w_batch_num,
                                   is_gzip)
        # created after the writer: a writer-construction failure must
        # not leak a hidden parts directory next to the user's output
        parent = os.path.dirname(os.path.abspath(write_path)) or "."
        part_dir = tempfile.mkdtemp(prefix=".extract_parts_", dir=parent)
        try:
            done_parts: set[int] = set()

            def _on_part(bi, res):
                nonlocal errors
                if res is None:   # quarantined: skip its (partial) part
                    errors += len(batches[bi])
                    return
                errors += res[1]
                if seed is not None:
                    # --seed promises byte-identical (decompressed)
                    # output: parts are appended AFTER the drain, in
                    # batch-index order, independent of scheduling
                    done_parts.add(bi)
                else:
                    writer.append_part(part_path(part_dir, bi))

            _drain_pool_elastic(batches, _worker_rows_part, nworkers,
                                (ctx, seed, (part_dir, is_gzip)), _on_part)
            for bi in sorted(done_parts):
                writer.append_part(part_path(part_dir, bi))
        finally:
            writer.close()
            shutil.rmtree(part_dir, ignore_errors=True)
    print("%d of %d fast5 files failed..\n"
          "[main] extract_features costs %.1f seconds.." % (
              errors, len(fast5s), time.time() - t0))
    return len(fast5s), errors


def extract_to_call_mods(engine, fast5_dir: str, args,
                         result_file: str | None = None):
    """Fused fast5 -> call_mods path (reference GPU pipeline,
    call_modifications.py:361-442): extraction workers produce model-ready
    arrays; the main process pads, shards, and runs the jitted step.
    Multi-host: each host processes its shard of the fast5 list."""
    from ..io.batching import AsyncWriter, pad_feature_batch
    from ..parallel.dist import shard_for_host
    from ..utils.bases import CODE2BASE_DNA, str2bool
    from ..utils.formats import format_call_rows
    from .call_mods import CallStats

    result_file = result_file or args.result_file

    opts = ExtractOptions(
        corrected_group=args.corrected_group,
        basecall_subgroup=args.basecall_subgroup,
        normalize_method=args.normalize_method, motifs=args.motifs,
        mod_loc=args.mod_loc, kmer_len=args.seq_len,
        signal_len=args.signal_len, methy_label=1,
        positions=args.positions, region=args.region,
        reference_path=args.reference_path,
        downsample=getattr(args, "downsample", "even"))
    ctx = ExtractContext.build(opts, str2bool(args.is_dna))
    fast5s = shard_for_host(get_fast5s(fast5_dir, str2bool(args.recursively)))
    print("{} fast5 files in total (this host)..".format(len(fast5s)))
    f5_batch = args.f5_batch_size
    batches = [fast5s[i:i + f5_batch]
               for i in range(0, len(fast5s), f5_batch)]

    target = engine.device_batch
    from ..utils.fastparse import native_available
    # cap at the host's core count: extraction workers are CPU-bound, so
    # over-subscription only thrashes — measured on a 4-core host
    # (benchmarks/fused_ab.py, same fixture, interleaved with the TSV
    # plane): nproc=4 runs at 0.925x the features-TSV plane, nproc=6 at
    # ~0.71x. The reference's suggested --nproc 30 would be pathological
    # here; explicit small values still win when the user wants to leave
    # cores free.
    ncores = os.cpu_count() or 4
    nworkers = max(1, min(args.nproc, len(batches), ncores))
    is_gzip = getattr(args, "gzip", False)

    if nworkers > 1 and native_available():
        # pooled fast path: extraction workers save read-packed wire .npz
        # parts (deduplicated per-base arrays + site centers — arrays
        # never cross the executor's result queue, which measured
        # ~15 MB/s under concurrent multi-MB payloads), and the main
        # process streams the parts into the engine's packed loop
        # (device-side window gather, int8 wire, native row emit) — the
        # same engine that serves --w_format npz_packed inputs. The
        # engine falls back to host windows per run when the motif is
        # too sparse for the packed wire to pay.
        import tempfile

        from ..utils.formats import load_packed_npz
        parent = os.path.dirname(os.path.abspath(result_file)) or "."
        part_dir = tempfile.mkdtemp(prefix=".fused_parts_", dir=parent)
        err_box = [0]
        # the pool is owned HERE, not inside the generator: if the
        # engine loop dies mid-stream the abandoned generator would
        # never exit its with-block, and part_dir would be removed
        # under still-running workers
        # packed parts are f16: let workers assemble the rect natively
        # at that dtype (same rounding, no float64 gather)
        ctx_f16 = dc_replace(ctx,
                             opts=dc_replace(ctx.opts, rect_f16=True))
        def _spawn_pool(workers: int):
            return ProcessPoolExecutor(max_workers=workers,
                                       mp_context=mp.get_context("spawn"),
                                       initializer=_init_worker,
                                       initargs=(ctx_f16, None,
                                                 (part_dir, "npz_packed")))

        # the pool is boxed so the finally below always shuts the CURRENT
        # pool: if the engine loop dies mid-stream the abandoned generator
        # never reaches its own cleanup, and part_dir must not be removed
        # under still-running workers
        pool_box = [_spawn_pool(nworkers)]
        try:
            def wire_blocks():
                # elastic drain (see _drain_pool_elastic; inlined here
                # because blocks stream to the engine as they complete):
                # respawn on worker death while rounds progress, isolate
                # + quarantine when they don't
                from concurrent.futures import CancelledError
                from concurrent.futures.process import BrokenProcessPool
                from itertools import chain

                def _take(bi, n):
                    path = os.path.join(part_dir, f"{bi:06d}.npz")
                    if n and os.path.exists(path):
                        blk = load_packed_npz(path)
                        os.remove(path)
                        return blk
                    return None

                # the engine derives its packed routing + static
                # base-axis cap from the FIRST block, so batch 0 must be
                # the first block yielded regardless of completion order
                # — including across pool respawns after a worker death
                # (a broken round can complete other batches before
                # batch 0; yielding them would make routing and jit
                # geometry depend on crash timing). Completed parts sit
                # on disk, so holding them back costs nothing.
                pending = dict(enumerate(batches))
                first_pending = True   # batch 0 not yet yielded/failed
                held: list = []        # [(bi, n)] awaiting batch 0

                def _emit(bi, n):
                    nonlocal first_pending
                    out = []
                    if first_pending and bi != 0:
                        held.append((bi, n))
                        return out
                    blk = _take(bi, n)
                    if blk is not None:
                        out.append(blk)
                    if bi == 0 or not pending:
                        first_pending = False
                        for hbi, hn in sorted(held):
                            hblk = _take(hbi, hn)
                            if hblk is not None:
                                out.append(hblk)
                        held.clear()
                    return out

                while pending:
                    before = len(pending)
                    futs = {pool_box[0].submit(_worker_batch_save, b, bi):
                            bi for bi, b in sorted(pending.items())}
                    if first_pending and 0 in pending:
                        # block on part 0 first so holding is brief
                        f0 = next(f for f, bi in futs.items() if bi == 0)
                        order = chain([f0], (f for f in as_completed(futs)
                                             if f is not f0))
                    else:
                        order = as_completed(futs)
                    broken = False
                    for fut in order:
                        try:
                            n, err = fut.result()
                        except (BrokenProcessPool, CancelledError):
                            broken = True
                            continue
                        bi = futs[fut]
                        del pending[bi]
                        err_box[0] += err
                        yield from _emit(bi, n)
                    if not broken:
                        for hbi, hn in sorted(held):   # all settled
                            hblk = _take(hbi, hn)
                            if hblk is not None:
                                yield hblk
                        held.clear()
                        return
                    pool_box[0].shutdown(wait=False, cancel_futures=True)
                    if len(pending) < before:
                        print(f"[fused extract] a worker process died; "
                              f"respawning the pool for {len(pending)} "
                              f"unfinished batches", flush=True)
                        pool_box[0] = _spawn_pool(min(nworkers,
                                                      len(pending)))
                        continue
                    print(f"[fused extract] worker pool died with no "
                          f"progress; isolating {len(pending)} batches "
                          f"serially", flush=True)
                    for bi in sorted(list(pending)):
                        batch_files = pending[bi]
                        pool_box[0] = _spawn_pool(1)
                        try:
                            n, err = pool_box[0].submit(
                                _worker_batch_save, batch_files,
                                bi).result()
                            err_box[0] += err
                            del pending[bi]
                            yield from _emit(bi, n)
                        except (BrokenProcessPool, CancelledError):
                            print(f"[fused extract] batch {bi} kills its "
                                  f"worker — quarantined "
                                  f"({len(batch_files)} files counted as "
                                  f"failed)", flush=True)
                            err_box[0] += len(batch_files)
                            del pending[bi]
                            if bi == 0:
                                # batch 0 is permanently gone: release
                                # the held blocks (lowest index first —
                                # deterministic for a given failure)
                                yield from _emit(bi, 0)
                        finally:
                            pool_box[0].shutdown(wait=False,
                                                 cancel_futures=True)
                    return

            from ..io.batching import PrefetchIterator
            stats = engine._run_fast_packed(
                PrefetchIterator(wire_blocks(), depth=4), result_file,
                is_gzip, target)
        finally:
            pool_box[0].shutdown(wait=True, cancel_futures=True)
            shutil.rmtree(part_dir, ignore_errors=True)
        print("%d of %d fast5 files failed.." % (err_box[0], len(fast5s)))
        return stats

    # legacy array path: model-ready batches cross the pool queue and
    # rows are formatted in-process. Kept for hosts without the native
    # library (still pooled there — slower per worker, but parallel)
    # and for nproc=1.
    stats = CallStats()
    t0 = time.time()
    errors = 0

    from ..io.batching import BatchAssembler
    asm = BatchAssembler(target)
    inflight: list[tuple] = []
    writer = AsyncWriter(result_file, is_gzip)

    def _drain(entry):
        probs, fb, n_valid = entry
        probs = np.asarray(probs)[:n_valid]
        kmer_strs = ["".join(CODE2BASE_DNA[int(c)] for c in row)
                     for row in fb.kmer[:n_valid]]
        rows = format_call_rows(fb.sampleinfo, fb.kmer[:n_valid],
                                probs[:, 0], probs[:, 1], kmer_strs)
        writer.write_rows(rows)
        stats.sites += n_valid
        stats.batches += 1
        called = probs[:, 1] > probs[:, 0]
        stats.label_correct += int(
            (called == (fb.labels[:n_valid] == 1)).sum())

    def _dispatch(fb, n_valid):
        probs = engine.predict_probs(fb)
        inflight.append((probs, fb, n_valid))
        if len(inflight) > 1:
            _drain(inflight.pop(0))

    def _flush_pending(final: bool):
        while (full := asm.pop_full()) is not None:
            _dispatch(full, target)
        if final:
            rest = asm.pop_rest()
            if rest is not None:
                pb = pad_feature_batch(rest, target)
                _dispatch(pb.features, pb.n_valid)

    def _consume(results):
        nonlocal errors
        for fb, err in results:
            errors += err
            if fb is not None and len(fb):
                asm.add(fb)
                _flush_pending(False)

    if nworkers == 1:
        _init_worker(ctx, None)
        _consume(map(_worker_batch, batches))
    else:
        def _on_arr(bi, res):
            nonlocal errors
            if res is None:
                errors += len(batches[bi])
            else:
                _consume([res])

        _drain_pool_elastic(batches, _worker_batch, nworkers, (ctx, None),
                            _on_arr, label="fused extract")
    _flush_pending(True)
    for entry in inflight:
        _drain(entry)
    writer.close()
    stats.seconds = time.time() - t0
    print("%d of %d fast5 files failed.." % (errors, len(fast5s)))
    return stats
