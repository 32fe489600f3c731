"""Text-format codecs for the three on-disk artifacts.

These formats are the compatibility contract with the reference toolchain:

- features TSV, 12 columns (extract_features.py:381-395):
    chrom, pos, strand, pos_in_strand, readname, read_strand, kmer,
    means(csv 6dp), stds(csv 6dp), lens(csv int), signals(';'-rows of csv 6dp),
    methy_label
- call_mods TSV, 10 columns (call_modifications.py:176-188):
    chrom, pos, strand, pos_in_strand, readname, read_strand,
    prob_0(6dp), prob_1(6dp), called_label, center-5mer
- freq TSV, 11 columns / bedMethyl, 11 columns (call_mods_freq.py:100-118)

Parsing is batch-vectorized: numeric columns of a whole block of lines are
joined and converted once (C-level) instead of per-row Python loops.
"""
from __future__ import annotations

import gzip
from dataclasses import dataclass, field

import numpy as np

from .bases import BASE2CODE_DNA, seq_to_codes

KEY_SEP = "||"


def open_text(path: str, mode: str = "rt"):
    """Open a possibly-gzipped text file."""
    if path.endswith(".gz"):
        return gzip.open(path, mode if "t" in mode else mode + "t")
    return open(path, mode)


def gzip_path(path: str) -> str:
    """Reference convention: force a .gz suffix when gzip output is on
    (extract_features.py:454, call_modifications.py:265)."""
    return path if path.endswith(".gz") else path + ".gz"


# ---------------------------------------------------------------------------
# features TSV
# ---------------------------------------------------------------------------

@dataclass
class FeatureBatch:
    """A parsed block of feature rows as flat numpy arrays.

    ``sampleinfo`` holds the 6 leading text columns re-joined by tab — they
    pass through the model untouched and come back out in call_mods rows.
    """
    sampleinfo: list[str]
    kmer: np.ndarray          # (B, L) int32 base codes
    base_means: np.ndarray    # (B, L) float32
    base_stds: np.ndarray     # (B, L) float32
    base_signal_lens: np.ndarray  # (B, L) float32
    signals: np.ndarray       # (B, L, S) float32
    labels: np.ndarray        # (B,) int32
    read_ids: list[str] = field(default_factory=list)

    def __len__(self) -> int:
        return len(self.sampleinfo)


def parse_feature_lines(lines: list[str], kmer_len: int = 13,
                        signal_len: int = 16) -> FeatureBatch:
    """Parse a block of features-TSV lines into a FeatureBatch.

    Numeric parity with the reference row parser (dataloader.py:14-31,
    call_modifications.py:83-117); vectorized over the block.
    """
    n = len(lines)
    sampleinfo: list[str] = []
    read_ids: list[str] = []
    kmers = np.empty((n, kmer_len), dtype=np.int32)
    labels = np.empty(n, dtype=np.int32)
    means_parts: list[str] = []
    stds_parts: list[str] = []
    lens_parts: list[str] = []
    sig_parts: list[str] = []
    for i, line in enumerate(lines):
        w = line.rstrip("\n").split("\t")
        sampleinfo.append("\t".join(w[0:6]))
        read_ids.append(w[4])
        kmers[i] = seq_to_codes(w[6])
        means_parts.append(w[7])
        stds_parts.append(w[8])
        lens_parts.append(w[9])
        sig_parts.append(w[10].replace(";", ","))
        labels[i] = int(w[11])

    def _csv_block(parts: list[str], count: int) -> np.ndarray:
        joined = ",".join(parts)
        return np.fromiter(map(float, joined.split(",")), dtype=np.float32,
                           count=count)

    base_means = _csv_block(means_parts, n * kmer_len).reshape(n, kmer_len)
    base_stds = _csv_block(stds_parts, n * kmer_len).reshape(n, kmer_len)
    base_signal_lens = _csv_block(lens_parts, n * kmer_len).reshape(n, kmer_len)
    signals = _csv_block(sig_parts, n * kmer_len * signal_len).reshape(
        n, kmer_len, signal_len)
    return FeatureBatch(sampleinfo, kmers, base_means, base_stds,
                        base_signal_lens, signals, labels, read_ids)


def format_feature_row(chrom: str, pos: int, strand: str, pos_in_strand: int,
                       readname: str, read_strand: str, kmer: str,
                       signal_means, signal_stds, signal_lens,
                       signals_rect, methy_label: int) -> str:
    """One features-TSV row, byte-identical to _features_to_str
    (extract_features.py:381): means/stds rounded to 6dp with shortest-repr
    float printing, signal matrix rows joined by ';'."""
    means_text = ",".join(str(x) for x in np.around(signal_means, 6).tolist())
    stds_text = ",".join(str(x) for x in np.around(signal_stds, 6).tolist())
    lens_text = ",".join(str(int(x)) for x in signal_lens)
    sig_text = ";".join(
        ",".join(str(y) for y in row) for row in signals_rect)
    return "\t".join([chrom, str(pos), strand, str(pos_in_strand), readname,
                      read_strand, kmer, means_text, stds_text, lens_text,
                      sig_text, str(methy_label)])


def save_feature_npz(path: str, fb: FeatureBatch,
                     compress: bool = False) -> None:
    """Binary feature container: one .npz per batch — the TPU-native
    alternative to the 12-column TSV (no text codec on the hot path).
    Compact dtypes on disk; exact values (floats stay float32).

    Uncompressed by default: zlib inflate (~100 MB/s/core) would bound
    the binary data plane far below the device rate; ``compress=True``
    trades load speed for ~2-3x smaller files."""
    save = np.savez_compressed if compress else np.savez
    save(
        path,
        sampleinfo=np.array(fb.sampleinfo, dtype=np.bytes_),
        kmer=fb.kmer.astype(np.int8),
        base_means=fb.base_means.astype(np.float32),
        base_stds=fb.base_stds.astype(np.float32),
        base_signal_lens=fb.base_signal_lens.astype(np.int32),
        signals=fb.signals.astype(np.float32),
        labels=fb.labels.astype(np.int8))


def load_feature_npz(path: str, with_read_ids: bool = True
                     ) -> FeatureBatch:
    with np.load(path) as z:
        if "sampleinfo" not in z.files:
            ver = (int(z["wire_version"])
                   if "wire_version" in z.files else "?")
            raise ValueError(
                f"{path} is a wire-format (v{ver}) inference container; "
                "training and tools need the v1 container "
                "(save_feature_npz / extract --w_format npz)")
        sampleinfo = [s.decode() for s in z["sampleinfo"]]
        return FeatureBatch(
            sampleinfo,
            z["kmer"].astype(np.int32),
            z["base_means"].astype(np.float32),
            z["base_stds"].astype(np.float32),
            z["base_signal_lens"].astype(np.float32),
            z["signals"].astype(np.float32),
            z["labels"].astype(np.int32),
            [s.rsplit("\t", 2)[1] for s in sampleinfo]
            if with_read_ids else [])


def save_wire_npz(path: str, fb: FeatureBatch) -> None:
    """Wire-format inference container (.npz v2): the engine's exact f16
    transfer layout (int8 base codes, f16 values) plus the untouched
    cols-0..5 text as one concatenated byte blob with per-row offsets.
    Loads straight into a RawFeatureBlock — zero parsing, zero per-row
    Python strings end to end (native emitter memcpys the blob slices).
    For training/archival use the v1 container (save_feature_npz)."""
    infos = [s.encode() for s in fb.sampleinfo]
    lens = np.fromiter((len(b) for b in infos), np.int64, len(infos))
    row_starts = np.zeros(len(infos), np.int64)
    if len(infos) > 1:
        np.cumsum(lens[:-1], out=row_starts[1:])
    blob = b"".join(infos)
    np.savez(path,
             wire_version=np.uint8(2),
             info_blob=np.frombuffer(blob, np.uint8),
             row_starts=row_starts,
             info_ends=row_starts + lens,
             kmer=fb.kmer.astype(np.int8),
             base_means=fb.base_means.astype(np.float16),
             base_stds=fb.base_stds.astype(np.float16),
             base_signal_lens=fb.base_signal_lens.astype(np.float16),
             signals=fb.signals.astype(np.float16),
             labels=fb.labels.astype(np.int32))


def _read_npz_arrays(path: str) -> dict[str, np.ndarray]:
    """Every member of an .npz as an array, via raw zip member reads +
    np.frombuffer instead of np.load's ZipExtFile chunked-copy path.
    Measured (benchmarks/loader_ab.py): 2.2x faster single-threaded, and
    — the actual bug it fixes — np.load collapses ~4x under the engine's
    thread pool (GIL thrash: 1.9M rows/s at 1 thread -> 480k at 4),
    which made the staged binary planes LOSE to the TSV plane in rounds
    2-3. zipfile's read() handles compressed members transparently.
    Returned arrays are read-only views over the member bytes (every
    consumer only reads/gathers). Falls back to np.load per file on any
    structural surprise."""
    import zipfile
    from io import BytesIO
    out: dict[str, np.ndarray] = {}
    try:
        with zipfile.ZipFile(path) as z:
            for name in z.namelist():
                if not name.endswith(".npy"):
                    continue
                raw = z.read(name)
                bio = BytesIO(raw)
                version = np.lib.format.read_magic(bio)
                shape, fortran, dtype = np.lib.format._read_array_header(
                    bio, version)
                if dtype.hasobject:
                    raise ValueError("object array member " + name)
                n = 1
                for s in shape:
                    n *= int(s)
                arr = np.frombuffer(raw, dtype=dtype, count=n,
                                    offset=bio.tell())
                out[name[:-4]] = arr.reshape(
                    shape, order="F" if fortran else "C")
        return out
    except (zipfile.BadZipFile, ValueError, KeyError, OSError):
        raise
    except Exception:
        # private-API drift (np.lib.format internals): correctness first
        with np.load(path) as z:
            return {k: z[k] for k in z.files}


def load_wire_npz(path: str):
    """Load a wire-format .npz batch as a fastparse.RawFeatureBlock."""
    from .fastparse import RawFeatureBlock
    z = _read_npz_arrays(path)
    ver = int(z["wire_version"])
    if ver != 2:
        raise ValueError(
            f"{path} is wire-format v{ver}, not v2 — a directory must "
            "not mix wire versions (regenerate with one extract "
            "--w_format)")
    return RawFeatureBlock(
        z["info_blob"].tobytes(), z["row_starts"], z["info_ends"],
        z["kmer"], z["base_means"], z["base_stds"],
        z["base_signal_lens"], z["signals"],
        z["labels"].astype(np.int32))


def is_wire_npz(path: str) -> bool:
    """Cheap container-version check (zip directory read only)."""
    import zipfile
    try:
        with zipfile.ZipFile(path) as zf:
            return "wire_version.npy" in zf.namelist()
    except Exception:
        return False


def wire_npz_version(path: str) -> int:
    """0 = v1 (plain feature arrays), 2 = per-site wire, 3 = read-packed
    wire. Reads only the tiny version member."""
    import zipfile
    from io import BytesIO
    try:
        with zipfile.ZipFile(path) as zf:
            if "wire_version.npy" not in zf.namelist():
                return 0
            bio = BytesIO(zf.read("wire_version.npy"))
            return int(np.lib.format.read_array(bio))
    except zipfile.BadZipFile:
        return 0


def save_packed_npz(path: str, pb) -> None:
    """Read-packed wire container (.npz v3): deduplicated per-base arrays
    + per-site window centers (fastparse.PackedFeatureBlock). The 13-mer
    window gather happens on device — see the class docstring for the
    wire-bytes math. Info blob layout matches v2."""
    np.savez(path,
             wire_version=np.uint8(3),
             kmer_len=np.int32(pb.kmer_len),
             info_blob=np.frombuffer(pb.raw, np.uint8),
             row_starts=pb.row_starts.astype(np.int64),
             info_ends=pb.info_ends.astype(np.int64),
             centers=pb.centers.astype(np.int32),
             codes=pb.codes.astype(np.int8),
             base_means=pb.means.astype(np.float16),
             base_stds=pb.stds.astype(np.float16),
             base_signal_lens=pb.lens.astype(np.float16),
             signals=pb.rect.astype(np.float16),
             labels=pb.labels.astype(np.int32))


def load_packed_npz(path: str):
    """Load a read-packed wire .npz as a fastparse.PackedFeatureBlock."""
    from .fastparse import PackedFeatureBlock
    z = _read_npz_arrays(path)
    ver = int(z["wire_version"])
    if ver != 3:
        raise ValueError(
            f"{path} is wire-format v{ver}, not v3 — a directory must "
            "not mix wire versions (regenerate with one extract "
            "--w_format)")
    centers = z["centers"]
    kmer_len = int(z["kmer_len"])
    nb = (kmer_len - 1) // 2
    if len(centers) > 1 and np.any(np.diff(centers) < 0):
        raise ValueError(
            f"{path}: packed-wire centers are not non-decreasing")
    if len(centers) and (int(centers[0]) < nb or
                         int(centers[-1]) + nb >= len(z["codes"])):
        raise ValueError(
            f"{path}: packed-wire centers out of bounds for the base "
            "axis (corrupt or truncated container)")
    return PackedFeatureBlock(
        z["info_blob"].tobytes(), z["row_starts"], z["info_ends"],
        centers, z["codes"], z["base_means"], z["base_stds"],
        z["base_signal_lens"], z["signals"],
        z["labels"].astype(np.int32), kmer_len)


def feature_npz_paths(path: str) -> list[str] | None:
    """If ``path`` is a .npz file or a directory containing .npz batches,
    return the sorted file list; else None."""
    import os
    if os.path.isfile(path) and path.endswith(".npz"):
        return [path]
    if os.path.isdir(path):
        files = sorted(os.path.join(path, f) for f in os.listdir(path)
                       if f.endswith(".npz"))
        if files:
            return files
    return None


# ---------------------------------------------------------------------------
# call_mods TSV
# ---------------------------------------------------------------------------

def format_call_rows(sampleinfo: list[str], kmer_codes: np.ndarray,
                     prob0: np.ndarray, prob1: np.ndarray,
                     kmer_strs: list[str] | None = None) -> list[str]:
    """Format call_mods rows from normalized probabilities.

    Parity with call_modifications.py:175-188: prob_0 normalized to
    p0/(p0+p1) rounded 6dp, prob_1 = 1 - prob_0 (rounded), called label is
    argmax, last column is the center 5-mer of the k-mer.
    """
    if kmer_strs is None:
        code2base = {v: k for k, v in BASE2CODE_DNA.items()}
        kmer_strs = ["".join(code2base[int(c)] for c in row)
                     for row in kmer_codes]
    out = []
    for i, info in enumerate(sampleinfo):
        p0, p1 = float(prob0[i]), float(prob1[i])
        p0n = round(p0 / (p0 + p1), 6)
        p1n = round(1 - p0n, 6)
        label = 0 if p0 >= p1 else 1
        km = kmer_strs[i]
        c = len(km) // 2
        lo = max(c - 2, 0)
        hi = min(c + 3, len(km))
        out.append("\t".join([info, str(p0n), str(p1n), str(label),
                              km[lo:hi]]))
    return out


@dataclass
class ModCall:
    """One parsed call_mods row (utils/txt_formater.py:8)."""
    chrom: str
    pos: int
    strand: str
    pos_in_strand: int
    readname: str
    read_strand: str
    prob0: float
    prob1: float
    called_label: int
    kmer: str

    @classmethod
    def from_fields(cls, w: list[str]) -> "ModCall":
        return cls(w[0], int(w[1]), w[2], int(w[3]), w[4], w[5],
                   float(w[6]), float(w[7]), int(w[8]), w[9])

    @property
    def site_key(self) -> str:
        return KEY_SEP.join([self.chrom, str(self.pos)])

    def is_callable(self, prob_cf: float) -> bool:
        """Keep non-ambiguous calls: |p0-p1| >= prob_cf (txt_formater.py:23)."""
        return abs(self.prob0 - self.prob1) >= prob_cf


def split_site_key(key: str) -> tuple[str, int]:
    chrom, pos = key.split(KEY_SEP)
    return chrom, int(pos)


# ---------------------------------------------------------------------------
# freq TSV / bedMethyl
# ---------------------------------------------------------------------------

def format_freq_row(chrom: str, pos: int, strand: str, pos_in_strand: int,
                    prob0_sum: float, prob1_sum: float, met: int, unmet: int,
                    coverage: int, rmet: float, kmer: str) -> str:
    """11-column freq row (call_mods_freq.py:112 printf formats)."""
    return "%s\t%d\t%s\t%d\t%.3f\t%.3f\t%d\t%d\t%d\t%.4f\t%s" % (
        chrom, pos, strand, pos_in_strand, prob0_sum, prob1_sum, met, unmet,
        coverage, rmet, kmer)


def format_bed_row(chrom: str, pos: int, strand: str, coverage: int,
                   rmet: float) -> str:
    """bedMethyl row (call_mods_freq.py:107-110), including the reference's
    +0.001 rounding nudge on the percentage."""
    pct = str(int(round(rmet * 100 + 0.001, 0)))
    return "\t".join([chrom, str(pos), str(pos + 1), ".", str(coverage),
                      strand, str(pos), str(pos + 1), "0,0,0", str(coverage),
                      pct])
