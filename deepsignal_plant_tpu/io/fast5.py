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


class _FallbackToHighLevel(Exception):
    """Internal: the low-level reader punts to the high-level path."""


def _ll_attr(obj, name: bytes):
    """Read one attribute via the low-level API (no property dance)."""
    a = h5py.h5a.open(obj, name)
    out = np.empty(a.shape if a.shape else (), a.dtype)
    a.read(out)
    return out[()]


def _read_tombo_fast5_ll(path: str, corrected_group: str,
                         basecall_subgroup: str) -> TomboRead:
    """Low-level (h5f/h5o/h5a/h5d) reader — 2.5x the high-level h5py
    property chain per read (the fast5 open/attr overhead is ~half the
    extraction worker's time). Raises _FallbackToHighLevel for anything
    it doesn't recognize — missing alignment, multi-read containers,
    exotic attr encodings, VBZ errors — so the high-level reader below
    remains the single source of truth for semantics and error
    messages."""
    import os as _os
    h5d, h5f, h5g, h5o = h5py.h5d, h5py.h5f, h5py.h5g, h5py.h5o
    corr = f"Analyses/{corrected_group}/{basecall_subgroup}".encode()
    try:
        fid = h5f.open(_os.fsencode(path), h5f.ACC_RDONLY)
    except Exception:
        raise _FallbackToHighLevel
    try:
        try:
            align = h5o.open(fid, corr + b"/Alignment")
            alignstrand = _attr_str(_ll_attr(align, b"mapped_strand"))
            chrom = _attr_str(_ll_attr(align, b"mapped_chrom"))
            chrom_start = int(_ll_attr(align, b"mapped_start"))

            ev = h5d.open(fid, corr + b"/Events")
            rel = int(_ll_attr(ev, b"read_start_rel_to_raw"))
            table = np.empty(ev.shape, ev.dtype)
            ev.read(h5py.h5s.ALL, h5py.h5s.ALL, table)

            reads = h5g.open(fid, READS_GROUP.encode())
            rg = h5g.open(reads, reads.get_objname_by_idx(0))
            readname = _attr_str(_ll_attr(rg, b"read_id"))
            sig = h5d.open(rg, b"Signal")
            raw = np.empty(sig.shape, sig.dtype)
            sig.read(h5py.h5s.ALL, h5py.h5s.ALL, raw)

            try:
                ch = h5g.open(fid, b"UniqueGlobalKey/channel_id")
                scaling = (float(_ll_attr(ch, b"range"))
                           / float(_ll_attr(ch, b"digitisation")))
                offset = float(_ll_attr(ch, b"offset"))
                raw = np.asarray(scaling * (raw + offset), dtype=float)
            except KeyError:
                raw = np.asarray(raw, dtype=float)
        except _FallbackToHighLevel:
            raise
        except Exception:
            # missing groups, multi-read layout, VBZ filter errors,
            # unusual attr types: let the high-level reader produce the
            # correct skip/None/error
            raise _FallbackToHighLevel
    finally:
        fid.close()

    starts = table["start"].astype(np.int64) + rel
    lengths = table["length"].astype(np.int64)
    bases = table["base"]
    seq = b"".join(bases).decode("utf-8") \
        if bases.dtype.kind == "S" else "".join(map(str, bases))
    read_strand = "t" if basecall_subgroup.endswith("template") else "c"
    return TomboRead(readname, read_strand, alignstrand, chrom,
                     chrom_start, raw, starts, lengths, seq)


def read_tombo_fast5(path: str,
                     corrected_group: str = "RawGenomeCorrected_000",
                     basecall_subgroup: str = "BaseCalled_template",
                     ) -> TomboRead | None:
    """Read one fast5; returns None when the read has no alignment group
    (reference's skip, extract_features.py:164-176). Raises on corrupt files
    (caller counts errors, extract_features.py:373)."""
    try:
        return _read_tombo_fast5_ll(path, corrected_group,
                                    basecall_subgroup)
    except _FallbackToHighLevel:
        pass
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
