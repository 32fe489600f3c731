"""ctypes glue for the native features-TSV parser (native/featparse.cpp).

``parse_feature_bytes`` parses a newline-terminated byte block into a
FeatureBatch ~10x faster than the Python codec; returns None when the
native library is unavailable so callers can fall back.
"""
from __future__ import annotations

import ctypes

import numpy as np

from ..native import get_native_lib
from .formats import FeatureBatch

_configured = False


def _configure(lib) -> None:
    global _configured
    if _configured:
        return
    c_char_p = ctypes.c_char_p
    i64 = ctypes.c_int64
    i32 = ctypes.c_int32
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.dsp_count_lines.argtypes = [c_char_p, i64]
    lib.dsp_count_lines.restype = i64
    lib.dsp_parse_features.argtypes = [
        c_char_p, i64, i32, i32, i32p, f32p, f32p, f32p, f32p, i32p,
        i64p, i64p]
    lib.dsp_parse_features.restype = i64
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.dsp_format_call_suffixes.argtypes = [f32p, i32p, i64, i32, u8p,
                                             i32p]
    lib.dsp_format_call_suffixes.restype = i64
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.dsp_format_feature_cols.argtypes = [f64p, f64p, i32p, f64p, i64,
                                            i32, i32, u8p, i32p]
    lib.dsp_format_feature_cols.restype = i64
    lib.dsp_parse_calls.argtypes = [
        c_char_p, i64, i32p, i64p, u8p, i64p, f64p, f64p, i32p, i64p,
        i32p, ctypes.c_char_p, i64, ctypes.POINTER(ctypes.c_int32)]
    lib.dsp_parse_calls.restype = i64
    i8p = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
    u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
    lib.dsp_parse_features_f16.argtypes = [
        c_char_p, i64, i32, i32, i8p, u16p, u16p, u16p, u16p, i32p,
        i64p, i64p]
    lib.dsp_parse_features_f16.restype = i64
    lib.dsp_emit_call_rows.argtypes = [c_char_p, i64p, i64p, f32p, i8p,
                                       i64, i32, u8p]
    lib.dsp_emit_call_rows.restype = i64
    f16p = np.ctypeslib.ndpointer(np.float16, flags="C_CONTIGUOUS")
    lib.dsp_quantize_i8_f16.argtypes = [f16p, i64, i8p]
    lib.dsp_quantize_i8_f16.restype = ctypes.c_float
    lib.dsp_quantize_i8_f32.argtypes = [f32p, i64, i8p]
    lib.dsp_quantize_i8_f32.restype = ctypes.c_float
    lib.dsp_pack_rows.argtypes = [c_char_p, i64p, i64p, i8p, u16p, u16p,
                                  u16p, u16p, i64, i32, i32, i8p, u16p,
                                  u16p, u16p, u16p, i32p]
    lib.dsp_pack_rows.restype = i64
    lib.dsp_format_info_rows.argtypes = [c_char_p, i64, c_char_p, i64,
                                         c_char_p, i64, c_char_p, i64,
                                         i64p, i64p, i64, u8p, i64p]
    lib.dsp_format_info_rows.restype = i64
    lib.dsp_build_rect_f16.argtypes = [f64p, i64p, i64p, i64, i32, f16p]
    lib.dsp_build_rect_f16.restype = None
    lib.dsp_read_norm_stats.argtypes = [f64p, i64, i64p, i64p, i64, i32,
                                        f64p, f64p, f64p, f16p, f16p,
                                        f16p, f16p]
    lib.dsp_read_norm_stats.restype = i32
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    lib.dsp_mt_seed.argtypes = [u32p, u32p, i64]
    lib.dsp_mt_seed.restype = None
    lib.dsp_mt_sample_sorted.argtypes = [u32p, i64, i64, i64p]
    lib.dsp_mt_sample_sorted.restype = i32
    lib.dsp_normalize_mad.argtypes = [f64p, i64, f64p]
    lib.dsp_normalize_mad.restype = i32
    lib.dsp_segment_stats_exact.argtypes = [f64p, i64p, i64p, i64, f64p,
                                            f64p]
    lib.dsp_segment_stats_exact.restype = i32
    lib.dsp_rect_compat.argtypes = [f64p, i64p, i64p, i64, i32, u32p,
                                    f64p]
    lib.dsp_rect_compat.restype = i32
    _configured = True


def quantize_int8(arr: np.ndarray) -> tuple[np.ndarray, float] | None:
    """Native symmetric int8 quantization (SIMD, GIL-released).

    Bit-exact with the numpy path in
    ``pipeline.call_mods.quantize_for_wire`` but ~2 orders of magnitude
    cheaper and parallel across dispatch threads (the numpy version holds
    the GIL for ~0.35 s/32k-row batch and *negatively* scales under the
    dispatch pool). Returns ``(int8 array, dequant scale)``, or None when
    the native library is missing or the dtype isn't f16/f32 (callers
    fall back to numpy)."""
    lib = get_native_lib()
    if lib is None or arr.dtype not in (np.float16, np.float32):
        return None
    _configure(lib)
    a = np.ascontiguousarray(arr)
    out = np.empty(a.shape, np.int8)
    if a.dtype == np.float16:
        s = lib.dsp_quantize_i8_f16(a.reshape(-1), a.size, out.reshape(-1))
    else:
        s = lib.dsp_quantize_i8_f32(a.reshape(-1), a.size, out.reshape(-1))
    return out, float(s)


def native_available() -> bool:
    return get_native_lib() is not None


class CompatSampler:
    """CPython-``random.Random``-compatible MT19937 sampler backed by the
    native lib (dsp_mt_seed / dsp_mt_sample_sorted). Given the same int
    seed it consumes the SAME stream as ``random.Random`` and its
    ``sample()`` returns the same picks (sorted), so compat-mode
    extraction is byte-identical whichever side draws — the native
    whole-read rect kernel (dsp_rect_compat) and the Python
    build_signal_rect loop can even interleave on one stream. Construct
    via :func:`compat_sampler` (returns None without the native lib)."""

    __slots__ = ("_lib", "state")

    def __init__(self, lib, seed: int):
        _configure(lib)
        self._lib = lib
        self.state = np.zeros(625, np.uint32)
        n = abs(int(seed))
        words = []
        while n:
            words.append(n & 0xFFFFFFFF)
            n >>= 32
        key = np.array(words or [0], np.uint32)
        lib.dsp_mt_seed(self.state, key, len(key))

    def sample(self, population, k: int) -> list:
        """random.sample(range(n), k), sorted. ``population`` must be a
        range starting at 0 (all compat-mode call sites pass
        ``range(event_length)``)."""
        n = len(population)
        out = np.empty(k, np.int64)
        if self._lib.dsp_mt_sample_sorted(self.state, n, k, out) != 0:
            raise ValueError(f"sample({n}, {k}) invalid")
        return out.tolist()


def compat_sampler(seed: int) -> CompatSampler | None:
    lib = get_native_lib()
    return CompatSampler(lib, seed) if lib is not None else None


def normalize_mad_native(signal: np.ndarray) -> np.ndarray | None:
    """Native MAD normalize + 6-dp round (bit-exact with
    pipeline.extract.normalize_signals(method="mad")), or None without
    the native lib."""
    lib = get_native_lib()
    if lib is None:
        return None
    _configure(lib)
    signal = np.ascontiguousarray(signal, np.float64)
    if len(signal) == 0:
        return None
    norm = np.empty(len(signal), np.float64)
    if lib.dsp_normalize_mad(signal, len(signal), norm) != 0:
        return None
    return norm


def segment_stats_exact_native(norm: np.ndarray, starts: np.ndarray,
                               lengths: np.ndarray
                               ) -> tuple[np.ndarray, np.ndarray] | None:
    """Bit-exact np.mean/np.std per event via numpy's pairwise-summation
    order in C (compat mode's stats; reference extract_features.py:
    364-365), or None when the native lib is missing or the event table
    is corrupt (callers fall back to the per-event numpy loop)."""
    lib = get_native_lib()
    if lib is None:
        return None
    _configure(lib)
    norm = np.ascontiguousarray(norm, np.float64)
    starts = np.ascontiguousarray(starts, np.int64)
    lengths = np.ascontiguousarray(lengths, np.int64)
    nb = len(starts)
    if nb == 0:
        return None
    if int(lengths.min()) < 0 or int(starts.min()) < 0 or \
            int((starts + lengths).max()) > len(norm):
        return None
    means = np.empty(nb, np.float64)
    stds = np.empty(nb, np.float64)
    if lib.dsp_segment_stats_exact(norm, starts, lengths, nb, means,
                                   stds) != 0:
        return None
    return means, stds


def build_rect_compat(norm: np.ndarray, starts: np.ndarray,
                      lengths: np.ndarray, signal_len: int,
                      sampler: CompatSampler) -> np.ndarray | None:
    """Native build_signal_rect("compat"): center-zero-pad short events,
    sorted random.sample picks for long ones, drawn from ``sampler``'s
    MT stream in ascending row order (the Python loop's order). Returns
    the (n, signal_len) float64 rect, or None when unavailable/corrupt
    (callers fall back to the Python loop on the SAME stream)."""
    lib = get_native_lib()
    if lib is None:
        return None
    _configure(lib)
    norm = np.ascontiguousarray(norm, np.float64)
    starts = np.ascontiguousarray(starts, np.int64)
    lengths = np.ascontiguousarray(lengths, np.int64)
    nb = len(starts)
    if nb and (int(lengths.min()) < 0 or int(starts.min()) < 0
               or int((starts + lengths).max()) > len(norm)):
        return None
    rect = np.empty((nb, signal_len), np.float64)
    if lib.dsp_rect_compat(norm, starts, lengths, nb, signal_len,
                           sampler.state, rect) != 0:
        return None
    return rect


def build_rect_f16(norm: np.ndarray, starts: np.ndarray,
                   lengths: np.ndarray, signal_len: int
                   ) -> np.ndarray | None:
    """Native signal-rect assembly straight to float16 ("even"
    downsampling semantics of pipeline.extract.build_signal_rect).
    Returns the (n, signal_len) f16 matrix, or None without the native
    library."""
    lib = get_native_lib()
    if lib is None:
        return None
    _configure(lib)
    norm = np.ascontiguousarray(norm, np.float64)
    starts = np.ascontiguousarray(starts, np.int64)
    lengths = np.ascontiguousarray(lengths, np.int64)
    # the C loop indexes norm[start .. start+len) unchecked — a corrupt
    # event table (negative length, segment past the signal) must fall
    # back to the Python path, which clips indices and zero-pads, rather
    # than read/write out of bounds (a negative length would corrupt the
    # heap and SIGABRT the pool worker)
    if len(starts) and (int(lengths.min()) < 0 or int(starts.min()) < 0
                        or int((starts + lengths).max()) > len(norm)):
        return None
    rect = np.empty((len(starts), signal_len), np.float16)
    lib.dsp_build_rect_f16(norm, starts, lengths, len(starts),
                           signal_len, rect)
    return rect


def extract_norm_stats(signal: np.ndarray, starts: np.ndarray,
                       lengths: np.ndarray, signal_len: int,
                       want_rect: bool = True) -> dict | None:
    """Fused native per-read extraction kernel (dsp_read_norm_stats):
    MAD normalize + 6-dp round + per-event mean/std (cumsum semantics)
    + f16 signal rect + the packed wire's rounded-f16 means/stds/lens,
    in one C pass. Bit-exact with pipeline.extract's
    normalize_signals -> segment_stats -> build_signal_rect("even")
    chain (tested). Returns None when the native library is missing or
    the event table is corrupt (negative/overflowing segments) —
    callers fall back to the numpy path, which clips."""
    lib = get_native_lib()
    if lib is None:
        return None
    _configure(lib)
    signal = np.ascontiguousarray(signal, np.float64)
    starts = np.ascontiguousarray(starts, np.int64)
    lengths = np.ascontiguousarray(lengths, np.int64)
    ns, nb = len(signal), len(starts)
    if ns == 0 or nb == 0:
        return None
    if int(lengths.min()) < 0 or int(starts.min()) < 0 or \
            int((starts + lengths).max()) > ns:
        return None
    norm = np.empty(ns, np.float64)
    means64 = np.empty(nb, np.float64)
    stds64 = np.empty(nb, np.float64)
    means16 = np.empty(nb, np.float16)
    stds16 = np.empty(nb, np.float16)
    lens16 = np.empty(nb, np.float16)
    # want_rect=False (TSV/f64 consumers rebuild the rect in float64):
    # S=0 skips the nb*S gather in the kernel; the dummy buffer is
    # never touched
    S = signal_len if want_rect else 0
    rect16 = np.empty((nb, S), np.float16)
    rc = lib.dsp_read_norm_stats(signal, ns, starts, lengths, nb,
                                 S, norm, means64, stds64,
                                 means16, stds16, lens16, rect16)
    if rc != 0:
        return None
    out = {"norm": norm, "means": means64, "stds": stds64,
           "means16": means16, "stds16": stds16, "lens16": lens16}
    if want_rect:
        out["rect16"] = rect16
    return out


def format_info_rows(chrom: str, strand: str, readname: str,
                     read_strand: str, pos: np.ndarray, pis: np.ndarray
                     ) -> tuple[bytes, np.ndarray] | None:
    """Native per-site info prefixes for one read:
    ``chrom\\tpos\\tstrand\\tpos_in_strand\\treadname\\tread_strand``.
    Returns (concatenated bytes, per-row byte lengths), or None without
    the native library (callers fall back to the Python genexpr)."""
    lib = get_native_lib()
    if lib is None:
        return None
    _configure(lib)
    n = len(pos)
    cb, sb = chrom.encode(), strand.encode()
    rb_, rsb = readname.encode(), read_strand.encode()
    pos = np.ascontiguousarray(pos, np.int64)
    pis = np.ascontiguousarray(pis, np.int64)
    cap = n * (len(cb) + len(sb) + len(rb_) + len(rsb) + 47)
    out = np.empty(cap, np.uint8)
    row_lens = np.empty(n, np.int64)
    total = lib.dsp_format_info_rows(cb, len(cb), sb, len(sb), rb_,
                                     len(rb_), rsb, len(rsb), pos, pis, n,
                                     out, row_lens)
    return out[:total].tobytes(), row_lens


def parse_feature_bytes(block: bytes, kmer_len: int = 13,
                        signal_len: int = 16,
                        with_read_ids: bool = False,
                        out_dtype: str = "float32"
                        ) -> FeatureBatch | None:
    """Parse a features byte block natively.

    out_dtype "float16" fills the engine's exact f16 wire format (int8
    base codes, _Float16 values written by the parser itself) so the hot
    path never runs an astype pass over ~260 values/row."""
    lib = get_native_lib()
    if lib is None:
        return None
    _configure(lib)

    f16 = out_dtype == "float16"
    fdt = np.float16 if f16 else np.float32
    kdt = np.int8 if f16 else np.int32
    n_max = lib.dsp_count_lines(block, len(block))
    if n_max == 0:
        return FeatureBatch([], np.empty((0, kmer_len), kdt),
                            np.empty((0, kmer_len), fdt),
                            np.empty((0, kmer_len), fdt),
                            np.empty((0, kmer_len), fdt),
                            np.empty((0, kmer_len, signal_len), fdt),
                            np.empty(0, np.int32))
    kmer = np.empty((n_max, kmer_len), kdt)
    means = np.empty((n_max, kmer_len), fdt)
    stds = np.empty((n_max, kmer_len), fdt)
    slens = np.empty((n_max, kmer_len), fdt)
    signals = np.empty((n_max, kmer_len, signal_len), fdt)
    labels = np.empty(n_max, np.int32)
    row_starts = np.empty(n_max, np.int64)
    info_ends = np.empty(n_max, np.int64)

    if f16:
        n = lib.dsp_parse_features_f16(
            block, len(block), kmer_len, signal_len, kmer,
            means.view(np.uint16), stds.view(np.uint16),
            slens.view(np.uint16), signals.view(np.uint16), labels,
            row_starts, info_ends)
    else:
        n = lib.dsp_parse_features(block, len(block), kmer_len, signal_len,
                                   kmer, means, stds, slens, signals,
                                   labels, row_starts, info_ends)
    if n < 0:
        raise ValueError(f"malformed features row at line {-n - 1}")
    n = int(n)
    sampleinfo = [block[row_starts[i]:info_ends[i]].decode()
                  for i in range(n)]
    read_ids = ([s.rsplit("\t", 2)[1] for s in sampleinfo]
                if with_read_ids else [])
    return FeatureBatch(sampleinfo, kmer[:n], means[:n], stds[:n],
                        slens[:n], signals[:n], labels[:n], read_ids)


class RawFeatureBlock:
    """Wire-format parsed features with byte spans instead of decoded
    sampleinfo strings — the zero-Python-strings call_mods fast path.
    Output rows are later emitted natively by memcpy'ing cols 0-5 straight
    from ``raw`` (dsp_emit_call_rows)."""
    __slots__ = ("raw", "row_starts", "info_ends", "kmer", "means", "stds",
                 "slens", "signals", "labels")

    def __init__(self, raw, row_starts, info_ends, kmer, means, stds,
                 slens, signals, labels):
        self.raw = raw
        self.row_starts = row_starts    # (n,) int64 offsets into raw
        self.info_ends = info_ends      # (n,) int64
        self.kmer = kmer                # (n, L) int8
        self.means = means              # (n, L) f16
        self.stds = stds
        self.slens = slens
        self.signals = signals          # (n, L, S) f16
        self.labels = labels            # (n,) int32

    @property
    def n(self) -> int:
        return len(self.labels)


def parse_raw_feature_block(block: bytes, kmer_len: int = 13,
                            signal_len: int = 16
                            ) -> RawFeatureBlock | None:
    """Parse a features byte block into wire-format arrays + info spans
    (no per-row Python strings). None when the native lib is missing."""
    lib = get_native_lib()
    if lib is None:
        return None
    _configure(lib)
    n_max = lib.dsp_count_lines(block, len(block))
    kmer = np.empty((n_max, kmer_len), np.int8)
    means = np.empty((n_max, kmer_len), np.float16)
    stds = np.empty((n_max, kmer_len), np.float16)
    slens = np.empty((n_max, kmer_len), np.float16)
    signals = np.empty((n_max, kmer_len, signal_len), np.float16)
    labels = np.empty(n_max, np.int32)
    row_starts = np.empty(n_max, np.int64)
    info_ends = np.empty(n_max, np.int64)
    if n_max:
        n = lib.dsp_parse_features_f16(
            block, len(block), kmer_len, signal_len, kmer,
            means.view(np.uint16), stds.view(np.uint16),
            slens.view(np.uint16), signals.view(np.uint16), labels,
            row_starts, info_ends)
        if n < 0:
            raise ValueError(f"malformed features row at line {-n - 1}")
        n = int(n)
    else:
        n = 0
    return RawFeatureBlock(block, row_starts[:n], info_ends[:n], kmer[:n],
                           means[:n], stds[:n], slens[:n], signals[:n],
                           labels[:n])


def emit_call_rows(rb: RawFeatureBlock, lo: int, hi: int,
                   probs: np.ndarray) -> bytes:
    """Emit complete call_mods rows for rb rows [lo, hi) natively."""
    return emit_call_rows_arrays(rb.raw, rb.row_starts[lo:hi],
                                 rb.info_ends[lo:hi], rb.kmer[lo:hi], probs)


def emit_call_rows_arrays(raw: bytes, starts: np.ndarray, ends: np.ndarray,
                          kmer: np.ndarray, probs: np.ndarray) -> bytes:
    """Emit complete call_mods rows natively from raw info-byte spans +
    per-site kmer codes (the pieces both RawFeatureBlock and
    PackedFeatureBlock carry)."""
    lib = get_native_lib()
    _configure(lib)
    n = len(starts)
    starts = np.ascontiguousarray(starts)
    ends = np.ascontiguousarray(ends)
    kmer = np.ascontiguousarray(kmer)
    probs = np.ascontiguousarray(probs, np.float32)
    cap = int((ends - starts).sum()) + n * 40
    out = np.empty(cap, np.uint8)
    total = lib.dsp_emit_call_rows(raw, starts, ends, probs, kmer, n,
                                   kmer.shape[1], out)
    return out[:total].tobytes()


class PackedFeatureBlock:
    """Read-packed wire features: deduplicated per-base arrays over
    concatenated reads plus per-site int32 window-center offsets.

    Adjacent motif sites of one read share ``kmer_len - 1`` of their
    ``kmer_len`` window bases, so a per-site wire (RawFeatureBlock)
    re-ships every base up to kmer_len times. Packing the base axis once
    and gathering the 13-mer windows *on device* (call_mods packed step)
    cuts wire bytes by ~kmer_len/(bases-per-site) — ~3x for dense plant
    C motifs — exactly where a remote-attached link's aggregate MB/s
    bounds throughput. For sparse motifs (bases-per-site > kmer_len the
    dedup loses) the engine falls back to host windows (to_raw_block).

    ``centers`` is non-decreasing (reads are concatenated in order, site
    locs are sorted within a read), which lets the engine split batches
    at any site index by slicing the covering base range.

    ``src`` optionally holds the RawFeatureBlock a packed block was
    rebuilt from (pack_raw_block) so a sparse-density fallback returns
    the original windows instead of re-gathering them.
    """
    __slots__ = ("raw", "row_starts", "info_ends", "centers", "codes",
                 "means", "stds", "lens", "rect", "labels", "kmer_len",
                 "src")

    def __init__(self, raw, row_starts, info_ends, centers, codes, means,
                 stds, lens, rect, labels, kmer_len, src=None):
        self.raw = raw                  # info byte blob (cols 0-5 per site)
        self.row_starts = row_starts    # (n,) int64 offsets into raw
        self.info_ends = info_ends      # (n,) int64
        self.centers = centers          # (n,) int32 offsets into base axis
        self.codes = codes              # (nb,) int8 base codes
        self.means = means              # (nb,) f16
        self.stds = stds                # (nb,) f16
        self.lens = lens                # (nb,) f16
        self.rect = rect                # (nb, S) f16
        self.labels = labels            # (n,) int32
        self.kmer_len = kmer_len
        self.src = src

    @property
    def n(self) -> int:
        return len(self.labels)

    @property
    def n_bases(self) -> int:
        return len(self.codes)

    def window_index(self, lo: int = 0, hi: int | None = None) -> np.ndarray:
        """(n, kmer_len) base-axis gather indices for sites [lo, hi)."""
        nb = (self.kmer_len - 1) // 2
        c = self.centers[lo:hi if hi is not None else self.n]
        return c[:, None].astype(np.int64) + np.arange(-nb, nb + 1)[None, :]

    def to_raw_block(self) -> RawFeatureBlock:
        """Materialize per-site windows on host (used when site density is
        too sparse for the packed wire to pay)."""
        if self.src is not None:
            return self.src
        win = self.window_index()
        return RawFeatureBlock(self.raw, self.row_starts, self.info_ends,
                               self.codes[win], self.means[win],
                               self.stds[win], self.lens[win],
                               self.rect[win], self.labels)

def pack_raw_block(rb: RawFeatureBlock,
                   kmer_len: int | None = None) -> PackedFeatureBlock:
    """Rebuild the read-packed wire from parsed per-site rows (the TSV ->
    packed bridge, native dsp_pack_rows). Dedup is conservative — rows
    join a run only when their identity columns match and every
    overlapping window byte is identical — so ANY row order yields
    byte-identical downstream output; non-extraction-ordered rows just
    pack worse. The original block rides along as ``src`` for the
    sparse-density fallback."""
    lib = get_native_lib()
    _configure(lib)
    n, L = rb.kmer.shape
    S = rb.signals.shape[2]
    cap = n * L
    codes = np.empty(cap, np.int8)
    means = np.empty(cap, np.float16)
    stds = np.empty(cap, np.float16)
    lens = np.empty(cap, np.float16)
    rect = np.empty((cap, S), np.float16)
    centers = np.empty(n, np.int32)
    nb_out = lib.dsp_pack_rows(
        rb.raw, np.ascontiguousarray(rb.row_starts),
        np.ascontiguousarray(rb.info_ends),
        np.ascontiguousarray(rb.kmer),
        np.ascontiguousarray(rb.means).view(np.uint16),
        np.ascontiguousarray(rb.stds).view(np.uint16),
        np.ascontiguousarray(rb.slens).view(np.uint16),
        np.ascontiguousarray(rb.signals).view(np.uint16), n, L, S,
        codes, means.view(np.uint16), stds.view(np.uint16),
        lens.view(np.uint16), rect.reshape(-1).view(np.uint16), centers)
    if nb_out < 0:
        raise ValueError(f"malformed info columns at row {-nb_out - 1}")
    nb_out = int(nb_out)
    return PackedFeatureBlock(rb.raw, rb.row_starts, rb.info_ends, centers,
                              codes[:nb_out], means[:nb_out],
                              stds[:nb_out], lens[:nb_out], rect[:nb_out],
                              rb.labels, L, src=rb)


class CallBlock:
    """Parsed call_mods rows (struct-of-arrays) from one byte block."""
    __slots__ = ("chroms", "chrom_ids", "pos", "strand", "pos_in_strand",
                 "p0", "p1", "label", "kmer_off", "kmer_len", "raw")

    def __init__(self, chroms, chrom_ids, pos, strand, pos_in_strand, p0,
                 p1, label, kmer_off, kmer_len, raw):
        self.chroms = chroms            # list[str], block-local intern table
        self.chrom_ids = chrom_ids      # (n,) int32 indexes into chroms
        self.pos = pos                  # (n,) int64
        self.strand = strand            # (n,) uint8 ('+' / '-' ordinals)
        self.pos_in_strand = pos_in_strand  # (n,) int64
        self.p0 = p0                    # (n,) float64
        self.p1 = p1                    # (n,) float64
        self.label = label              # (n,) int32 called label
        self.kmer_off = kmer_off        # (n,) int64 offsets into raw
        self.kmer_len = kmer_len        # (n,) int32
        self.raw = raw                  # the input bytes (kmer storage)

    def __len__(self) -> int:
        return len(self.pos)

    def kmer_at(self, i: int) -> str:
        off = int(self.kmer_off[i])
        return self.raw[off:off + int(self.kmer_len[i])].decode()


def parse_call_bytes(block: bytes) -> CallBlock | None:
    """Parse a newline-terminated call_mods byte block natively; None when
    the native library is unavailable (callers fall back to Python)."""
    lib = get_native_lib()
    if lib is None:
        return None
    _configure(lib)
    n_max = lib.dsp_count_lines(block, len(block))
    chrom_ids = np.empty(n_max, np.int32)
    pos = np.empty(n_max, np.int64)
    strand = np.empty(n_max, np.uint8)
    pis = np.empty(n_max, np.int64)
    p0 = np.empty(n_max, np.float64)
    p1 = np.empty(n_max, np.float64)
    label = np.empty(n_max, np.int32)
    kmer_off = np.empty(n_max, np.int64)
    kmer_len = np.empty(n_max, np.int32)
    cap = 4 << 20
    chrom_buf = ctypes.create_string_buffer(cap)
    n_chroms = ctypes.c_int32(0)
    n = lib.dsp_parse_calls(block, len(block), chrom_ids, pos, strand, pis,
                            p0, p1, label, kmer_off, kmer_len, chrom_buf,
                            cap, ctypes.byref(n_chroms))
    if n == np.iinfo(np.int64).min:
        raise ValueError("chromosome-name table exceeded 4 MiB")
    if n < 0:
        raise ValueError(f"malformed call_mods row at line {-n - 1}")
    n = int(n)
    names = chrom_buf.raw[:chrom_buf.raw.index(b"\x00")].decode()
    chroms = names.split("\n")[:n_chroms.value] if n else []
    return CallBlock(chroms, chrom_ids[:n], pos[:n], strand[:n], pis[:n],
                     p0[:n], p1[:n], label[:n], kmer_off[:n], kmer_len[:n],
                     block)


def format_feature_cols(means: np.ndarray, stds: np.ndarray,
                        lens: np.ndarray, rect: np.ndarray
                        ) -> list[str] | None:
    """Native-formatted feature columns 7-10 per site (means/stds/lens csv +
    ';'-joined rect), parity with np.around(...,6)+str including -0.0.
    Returns None when the native library is unavailable."""
    lib = get_native_lib()
    if lib is None:
        return None
    _configure(lib)
    n, L = means.shape
    S = rect.shape[2]
    means = np.ascontiguousarray(means, np.float64)
    stds = np.ascontiguousarray(stds, np.float64)
    lens = np.ascontiguousarray(lens, np.int32)
    rect = np.ascontiguousarray(rect, np.float64)
    # 32 bytes/value covers the widest minimal-decimal and %g fallbacks
    out = np.empty(n * (3 * L * 32 + L * S * 32), np.uint8)
    out_lens = np.empty(n, np.int32)
    total = lib.dsp_format_feature_cols(means, stds, lens, rect, n, L, S,
                                        out, out_lens)
    text = out[:total].tobytes().decode("ascii")
    cols = []
    pos = 0
    for i in range(n):
        end = pos + int(out_lens[i])
        cols.append(text[pos:end])
        pos = end
    return cols


def format_call_block(sampleinfo: list[str], probs: np.ndarray,
                      kmer: np.ndarray) -> str | None:
    """Native-formatted call_mods text block (rows joined, trailing
    newline) — parity with utils.formats.format_call_rows. Returns None
    when the native library is unavailable."""
    lib = get_native_lib()
    if lib is None:
        return None
    _configure(lib)
    n, L = kmer.shape
    probs = np.ascontiguousarray(probs, dtype=np.float32)
    kmer = np.ascontiguousarray(kmer, dtype=np.int32)
    out = np.empty(n * 40, dtype=np.uint8)
    lens = np.empty(n, dtype=np.int32)
    total = lib.dsp_format_call_suffixes(probs, kmer, n, L, out, lens)
    suffixes = out[:total].tobytes().decode("ascii")
    parts: list[str] = []
    pos = 0
    for i, info in enumerate(sampleinfo):
        end = pos + int(lens[i])
        parts.append(info)
        parts.append(suffixes[pos:end])
        pos = end
    return "".join(parts)
