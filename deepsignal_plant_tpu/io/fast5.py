"""Single-read fast5 (HDF5) reading — tombo-resquiggled layout.

Group layout contract (reference extract_features.py:44-170,255-271):
    Raw/Reads/<Read_N>/Signal                    raw DAC samples
    Raw/Reads/<Read_N>@read_id                   read name
    Analyses/<corrected_group>/<subgroup>/Events fields start/length/base,
        attr read_start_rel_to_raw
    Analyses/<corrected_group>/<subgroup>/Alignment attrs
        mapped_strand / mapped_chrom / mapped_start
    UniqueGlobalKey/channel_id attrs digitisation / range / offset
"""
from __future__ import annotations

from dataclasses import dataclass

import h5py
import numpy as np

READS_GROUP = "Raw/Reads"

# ONT's VBZ compression plugin (registered HDF5 filter id). Most real
# nanopore fast5s are VBZ-compressed; reading them requires the
# ont-vbz-hdf5-plugin shared library on HDF5_PLUGIN_PATH
# (reference README.md:239).
VBZ_FILTER_ID = 32020


class VBZPluginError(OSError):
    """Raised when a dataset needs the VBZ plugin and it isn't loaded."""


class MultiReadFast5Error(ValueError):
    """Raised for multi-read fast5 containers. The pipeline (like the
    reference) works on single-read tombo-resquiggled fast5s; multi-read
    files must be converted first (reference README.md:177-188)."""


def vbz_plugin_available() -> bool:
    """Whether HDF5 can decode VBZ (filter 32020) in this process."""
    try:
        return bool(h5py.h5z.filter_avail(VBZ_FILTER_ID))
    except Exception:
        return False


def _read_dataset(dset, path: str, name: str):
    """Read a dataset, mapping the opaque HDF5 filter error for
    VBZ-compressed data to an actionable message."""
    try:
        return dset[()]
    except OSError as exc:
        try:
            filters = dset._filters or {}
        except Exception:
            filters = {}
        if any(str(k) == str(VBZ_FILTER_ID) for k in filters) or \
                ("32020" in str(exc)):
            raise VBZPluginError(
                f"{path}: dataset '{name}' is VBZ-compressed (HDF5 filter "
                f"{VBZ_FILTER_ID}) but the vbz plugin is not loaded. "
                "Install ont-vbz-hdf5-plugin and point HDF5_PLUGIN_PATH at "
                "the directory containing libvbz_hdf_plugin.so "
                "(see ONT's vbz_compression releases)."
            ) from exc
        raise


def _attr_str(v) -> str:
    """HDF5 attrs may be bytes or str depending on writer version
    (reference handles both, extract_features.py:109-127)."""
    if isinstance(v, bytes):
        return v.decode("utf-8")
    s = str(v)
    if s.startswith("b'"):
        return s.split("'")[1]
    return s


@dataclass
class TomboRead:
    """Everything needed from one resquiggled read."""
    readname: str
    read_strand: str        # 't' (template) or 'c' (complement)
    alignstrand: str        # '+' / '-'
    chrom: str
    chrom_start: int
    raw_signal: np.ndarray  # float64, channel-rescaled DAC
    event_starts: np.ndarray   # int64, absolute into raw_signal
    event_lengths: np.ndarray  # int64
    seq: str                # genome-aligned base sequence


def read_tombo_fast5(path: str,
                     corrected_group: str = "RawGenomeCorrected_000",
                     basecall_subgroup: str = "BaseCalled_template",
                     ) -> TomboRead | None:
    """Read one fast5; returns None when the read has no alignment group
    (reference's skip, extract_features.py:164-176). Raises on corrupt files
    (caller counts errors, extract_features.py:373)."""
    with h5py.File(path, "r") as h5:
        corr_path = f"Analyses/{corrected_group}/{basecall_subgroup}"
        if f"{corr_path}/Alignment" not in h5:
            # distinguish "not resquiggled" (silent skip, reference
            # behavior extract_features.py:164-176) from "multi-read
            # container" (top-level read_<uuid> groups, no Raw/Reads):
            # the latter needs conversion, and a silent skip of every
            # file would be undebuggable
            if "Raw" not in h5 and any(
                    k.startswith("read_") for k in h5.keys()):
                raise MultiReadFast5Error(
                    f"{path} is a multi-read fast5 container; this "
                    "pipeline (like the reference) reads single-read "
                    "tombo-resquiggled fast5s. Convert with "
                    "ont_fast5_api's multi_to_single_fast5, then "
                    "basecall and tombo resquiggle.")
            return None

        first_read = next(iter(h5[READS_GROUP].keys()))
        raw_grp = h5[f"{READS_GROUP}/{first_read}"]
        readname = _attr_str(raw_grp.attrs["read_id"])
        raw = _read_dataset(raw_grp["Signal"], path, "Signal")

        align_attrs = h5[f"{corr_path}/Alignment"].attrs
        alignstrand = _attr_str(align_attrs["mapped_strand"])
        chrom = _attr_str(align_attrs["mapped_chrom"])
        chrom_start = int(align_attrs["mapped_start"])
        read_strand = "t" if basecall_subgroup.endswith("template") else "c"

        events = h5[f"{corr_path}/Events"]
        rel = int(events.attrs["read_start_rel_to_raw"])
        table = _read_dataset(events, path, "Events")
        starts = table["start"].astype(np.int64) + rel
        lengths = table["length"].astype(np.int64)
        bases = table["base"]
        seq = b"".join(bases).decode("utf-8") \
            if bases.dtype.kind == "S" else "".join(map(str, bases))

        # channel rescaling: scaling * (sig + offset)
        # (extract_features.py:255-274); missing channel info -> raw as-is
        try:
            ch = h5["UniqueGlobalKey/channel_id"].attrs
            scaling = float(ch["range"]) / float(ch["digitisation"])
            offset = float(ch["offset"])
            raw = np.asarray(scaling * (raw + offset), dtype=float)
        except KeyError:
            raw = np.asarray(raw, dtype=float)

    return TomboRead(readname, read_strand, alignstrand, chrom, chrom_start,
                     raw, starts, lengths, seq)


def write_tombo_fast5(path: str, readname: str, raw_signal: np.ndarray,
                      bases: str, event_starts: np.ndarray,
                      event_lengths: np.ndarray, chrom: str,
                      chrom_start: int, alignstrand: str = "+",
                      corrected_group: str = "RawGenomeCorrected_000",
                      basecall_subgroup: str = "BaseCalled_template",
                      digitisation: float = 8192.0, prange: float = 1465.0,
                      offset: float = 10.0,
                      read_start_rel_to_raw: int = 0) -> None:
    """Create a minimal tombo-layout fast5 (test fixtures and format docs).

    ``raw_signal`` is stored as DAC integers; readers recover picoamps via
    the channel scaling attrs.
    """
    with h5py.File(path, "w") as h5:
        rg = h5.create_group(f"{READS_GROUP}/Read_0")
        rg.attrs["read_id"] = np.bytes_(readname)
        rg.create_dataset("Signal", data=np.asarray(raw_signal,
                                                    dtype=np.int16))
        ch = h5.create_group("UniqueGlobalKey/channel_id")
        ch.attrs["digitisation"] = float(digitisation)
        ch.attrs["range"] = float(prange)
        ch.attrs["offset"] = float(offset)

        corr = h5.create_group(f"Analyses/{corrected_group}/"
                               f"{basecall_subgroup}")
        align = corr.create_group("Alignment")
        align.attrs["mapped_strand"] = np.bytes_(alignstrand)
        align.attrs["mapped_chrom"] = np.bytes_(chrom)
        align.attrs["mapped_start"] = int(chrom_start)

        n = len(bases)
        ev = np.zeros(n, dtype=[("start", "<i8"), ("length", "<i8"),
                                ("base", "S1")])
        ev["start"] = np.asarray(event_starts, dtype=np.int64)
        ev["length"] = np.asarray(event_lengths, dtype=np.int64)
        ev["base"] = [b.encode() for b in bases]
        dset = corr.create_dataset("Events", data=ev)
        dset.attrs["read_start_rel_to_raw"] = int(read_start_rel_to_raw)
