"""call_freq — genome-level methylation frequency aggregation.

Reference behavior (call_mods_freq.py:29-296): stream call_mods rows, drop
ambiguous calls (|p0-p1| < prob_cf), accumulate per-site probability sums /
met / unmet / coverage, emit an 11-column TSV or bedMethyl, optionally
sorted, optionally contig-parallel.

Design here: a vectorized per-contig accumulator. Byte blocks are parsed
by the native row parser (featparse.cpp dsp_parse_calls; Python split
fallback), ambiguity-filtered as a vector, block-deduped with np.unique,
and segment-summed with np.add.at into flat per-site arrays — the Python
dict holds only site-key -> array-index, touched once per *block-unique*
site instead of ~8 attribute updates per row. np.add.at iterates in row
order, so per-site float sums associate exactly like the reference's
sequential accumulation (call_mods_freq.py:60-66). The first-seen
strand/pos_in_strand/kmer per site (the reference keeps the first
record's metadata, call_mods_freq.py:55-59) comes from np.unique's
first-occurrence indices. Contig-parallel mode uses a process pool over
contigs like the reference, without the temp-file demux pass.
"""
from __future__ import annotations

import os
import time
import uuid

import numpy as np

from ..utils.fasta import get_contig_names, is_genome_fasta
from ..utils.formats import (format_bed_row, format_freq_row, gzip_path,
                             open_text)

# site key = chrom_id * 2^40 + pos: positions fit well under 2^40 for any
# genome; 2^23 contigs headroom in a signed int64
_KEY_SHIFT = np.int64(1) << 40


class FreqAccumulator:
    """Streaming per-site accumulator over call_mods rows."""

    def __init__(self, prob_cf: float = 0.5, contig: str | None = None,
                 device_agg: bool = False):
        self.prob_cf = prob_cf
        self.contig = contig
        #: offload the per-block site-key sort + integer segment sums to
        #: the accelerator (ops/segment_agg; SURVEY.md §7 step 5). Float
        #: prob sums stay host float64 so output is byte-identical.
        self.device_agg = device_agg
        self.count = 0
        self.used = 0
        self._chrom2gid: dict[str, int] = {}
        self._chroms: list[str] = []
        self._key2idx: dict[int, int] = {}
        self.n_sites = 0
        cap = 1024
        self._gid = np.empty(cap, np.int64)
        self._pos = np.empty(cap, np.int64)
        self._strand = np.empty(cap, np.uint8)
        self._pis = np.empty(cap, np.int64)
        self._prob0 = np.zeros(cap, np.float64)
        self._prob1 = np.zeros(cap, np.float64)
        self._met = np.zeros(cap, np.int64)
        self._coverage = np.zeros(cap, np.int64)
        self._kmers: list[str] = []

    def _grow(self, extra: int) -> None:
        need = self.n_sites + extra
        cap = len(self._pos)
        if need <= cap:
            return
        while cap < need:
            cap *= 2
        for name in ("_gid", "_pos", "_strand", "_pis", "_prob0", "_prob1",
                     "_met", "_coverage"):
            old = getattr(self, name)
            new = (np.zeros if old.dtype != np.uint8 else np.empty)(
                cap, old.dtype)
            new[:self.n_sites] = old[:self.n_sites]
            setattr(self, name, new)

    def add_file(self, path: str, block_bytes: int = 8 << 20) -> None:
        from ..io.batching import iter_byte_blocks
        from ..utils.fastparse import parse_call_bytes
        for raw in iter_byte_blocks(path, block_bytes):
            cb = parse_call_bytes(raw)
            if cb is None:
                cb = _parse_calls_py(raw)
            self._add_block(cb)

    def _add_block(self, cb) -> None:
        n = len(cb)
        if n == 0:
            return
        # block-local chrom ids -> global ids
        lg2g = np.empty(len(cb.chroms), np.int64)
        for j, name in enumerate(cb.chroms):
            g = self._chrom2gid.get(name)
            if g is None:
                g = len(self._chroms)
                self._chrom2gid[name] = g
                self._chroms.append(name)
            lg2g[j] = g
        gids = lg2g[cb.chrom_ids]

        keep = np.abs(cb.p0 - cb.p1) >= self.prob_cf
        if self.contig is not None:
            # off-contig rows are skipped before counting
            # (call_mods_freq.py:52-53 continues before count += 1)
            try:
                target = cb.chroms.index(self.contig)
            except ValueError:
                return
            on_contig = cb.chrom_ids == target
            self.count += int(on_contig.sum())
            keep &= on_contig
        else:
            self.count += n
        self.used += int(keep.sum())
        rows = np.nonzero(keep)[0]
        if len(rows) == 0:
            return
        if self.device_agg:
            self._add_rows_device(cb, gids, rows)
            return

        keys = gids[rows] * _KEY_SHIFT + cb.pos[rows]
        ukeys, first_idx, inverse = np.unique(
            keys, return_index=True, return_inverse=True)
        # resolve block-unique keys against the global site table
        g_of_u = np.empty(len(ukeys), np.int64)
        k2i = self._key2idx
        new_local: list[int] = []
        for j, k in enumerate(ukeys.tolist()):
            gi = k2i.get(k)
            if gi is None:
                new_local.append(j)
                gi = -1
            g_of_u[j] = gi
        if new_local:
            # append new sites in first-occurrence (file) order — the
            # reference's insertion-ordered dict contract
            new_local.sort(key=lambda j: first_idx[j])
            base = self.n_sites
            self._grow(len(new_local))
            nl = np.asarray(new_local)
            g_of_u[nl] = base + np.arange(len(new_local))
            for t, j in enumerate(new_local):
                k2i[int(ukeys[j])] = base + t
            src = rows[first_idx[nl]]
            sl = slice(base, base + len(new_local))
            self._gid[sl] = gids[src]
            self._pos[sl] = cb.pos[src]
            self._strand[sl] = cb.strand[src]
            self._pis[sl] = cb.pos_in_strand[src]
            self._kmers.extend(cb.kmer_at(int(r)) for r in src)
            self.n_sites += len(new_local)

        ridx = g_of_u[inverse]
        np.add.at(self._prob0, ridx, cb.p0[rows])
        np.add.at(self._prob1, ridx, cb.p1[rows])
        np.add.at(self._met, ridx, cb.label[rows])
        np.add.at(self._coverage, ridx, 1)

    def _add_rows_device(self, cb, gids, rows) -> None:
        """Device-offloaded block aggregation (SURVEY.md §7 step 5): a
        jitted XLA kernel sorts the kept rows by (chrom, pos) and returns
        exact integer segment sums; the host resolves block-unique sites
        against the global table and drives float64 ``np.add.at`` with
        the sorted order. A stable sort keeps file order within each
        site, so the float partial sums associate exactly like
        ``_add_block`` and the reference's sequential accumulation —
        output stays byte-identical across all three paths."""
        from ..ops.segment_agg import sort_segment_reduce
        order, seg, cov_seg, met_seg, nu = sort_segment_reduce(
            gids[rows].astype(np.int32), cb.pos[rows].astype(np.int32),
            cb.label[rows].astype(np.int32))
        srows = rows[order]          # site-sorted, file order within site
        first_rows = srows[np.flatnonzero(np.diff(seg, prepend=-1))]
        ukeys = gids[first_rows] * _KEY_SHIFT + cb.pos[first_rows]
        g_of_u = np.empty(nu, np.int64)
        k2i = self._key2idx
        new_local: list[int] = []
        for j, k in enumerate(ukeys.tolist()):
            gi = k2i.get(k)
            if gi is None:
                new_local.append(j)
                gi = -1
            g_of_u[j] = gi
        if new_local:
            # first-seen (file) order, the insertion-order contract
            new_local.sort(key=lambda j: first_rows[j])
            base = self.n_sites
            self._grow(len(new_local))
            nl = np.asarray(new_local)
            g_of_u[nl] = base + np.arange(len(new_local))
            for t, j in enumerate(new_local):
                k2i[int(ukeys[j])] = base + t
            src = first_rows[nl]
            sl = slice(base, base + len(new_local))
            self._gid[sl] = gids[src]
            self._pos[sl] = cb.pos[src]
            self._strand[sl] = cb.strand[src]
            self._pis[sl] = cb.pos_in_strand[src]
            self._kmers.extend(cb.kmer_at(int(r)) for r in src)
            self.n_sites += len(new_local)
        np.add.at(self._prob0, g_of_u[seg], cb.p0[srows])
        np.add.at(self._prob1, g_of_u[seg], cb.p1[srows])
        self._met[g_of_u] += met_seg
        self._coverage[g_of_u] += cov_seg

    def merge_table(self, chroms: list[str], gids_l, pos, strand, pis,
                    prob0, prob1, met, coverage, kmers: list[str]) -> None:
        """Merge a pre-aggregated per-site table (one site per row, keys
        unique within the table) — the cross-host reduction step."""
        if len(pos) == 0:
            return
        lg2g = np.empty(len(chroms), np.int64)
        for j, name in enumerate(chroms):
            g = self._chrom2gid.get(name)
            if g is None:
                g = len(self._chroms)
                self._chrom2gid[name] = g
                self._chroms.append(name)
            lg2g[j] = g
        gids = lg2g[np.asarray(gids_l)]
        keys = gids * _KEY_SHIFT + np.asarray(pos)
        g_of = np.empty(len(keys), np.int64)
        k2i = self._key2idx
        new_rows: list[int] = []
        for j, k in enumerate(keys.tolist()):
            gi = k2i.get(k)
            if gi is None:
                new_rows.append(j)
                gi = -1
            g_of[j] = gi
        if new_rows:
            base = self.n_sites
            self._grow(len(new_rows))
            nr = np.asarray(new_rows)
            g_of[nr] = base + np.arange(len(new_rows))
            for t, j in enumerate(new_rows):
                k2i[int(keys[j])] = base + t
            sl = slice(base, base + len(new_rows))
            self._gid[sl] = gids[nr]
            self._pos[sl] = np.asarray(pos)[nr]
            self._strand[sl] = np.asarray(strand)[nr]
            self._pis[sl] = np.asarray(pis)[nr]
            self._kmers.extend(kmers[int(j)] for j in new_rows)
            self.n_sites += len(new_rows)
        np.add.at(self._prob0, g_of, prob0)
        np.add.at(self._prob1, g_of, prob1)
        np.add.at(self._met, g_of, met)
        np.add.at(self._coverage, g_of, coverage)

    def state_payload(self) -> dict:
        """Picklable aggregation state (for cross-host gathering)."""
        n = self.n_sites
        return {"chroms": self._chroms, "gid": self._gid[:n].copy(),
                "pos": self._pos[:n].copy(),
                "strand": self._strand[:n].copy(),
                "pis": self._pis[:n].copy(),
                "prob0": self._prob0[:n].copy(),
                "prob1": self._prob1[:n].copy(),
                "met": self._met[:n].copy(),
                "coverage": self._coverage[:n].copy(),
                "kmers": self._kmers, "count": self.count,
                "used": self.used}

    def report(self) -> str:
        pct = self.used / float(self.count) * 100 if self.count else 0.0
        tag = "" if self.contig is None else f" for {self.contig}"
        return "{:.2f}% ({} of {}) calls used{}..".format(
            pct, self.used, self.count, tag)


def merge_across_hosts(acc: FreqAccumulator) -> FreqAccumulator:
    """Reduce per-host accumulators into one identical global accumulator
    on every host — the TPU-native equivalent of the reference's
    "run per node, merge the files later" multi-node story (SURVEY.md
    §5.8: cross-host aggregation over collectives). Each host's site
    table rides a device all-gather (parallel/multihost.allgather_bytes);
    the merge walks hosts in process order so first-seen metadata and
    unsorted output order are deterministic."""
    import jax
    if jax.process_count() == 1:
        return acc
    import pickle

    from ..parallel.multihost import allgather_bytes
    payloads = allgather_bytes(pickle.dumps(acc.state_payload()))
    merged = FreqAccumulator(prob_cf=acc.prob_cf, contig=acc.contig)
    for raw in payloads:
        pl = pickle.loads(raw)
        merged.merge_table(pl["chroms"], pl["gid"], pl["pos"],
                           pl["strand"], pl["pis"], pl["prob0"],
                           pl["prob1"], pl["met"], pl["coverage"],
                           pl["kmers"])
        merged.count += pl["count"]
        merged.used += pl["used"]
    return merged


class _PyCallBlock:
    """Python-parsed stand-in for fastparse.CallBlock."""

    def __init__(self, cols: list[list[str]]):
        self.chroms: list[str] = []
        chrom2id: dict[str, int] = {}
        ids = np.empty(len(cols), np.int32)
        for i, w in enumerate(cols):
            c = w[0]
            g = chrom2id.get(c)
            if g is None:
                g = len(self.chroms)
                chrom2id[c] = g
                self.chroms.append(c)
            ids[i] = g
        self.chrom_ids = ids
        n = len(cols)
        self.pos = np.fromiter((w[1] for w in cols), np.int64, n)
        self.strand = np.fromiter((ord(w[2][0]) for w in cols), np.uint8, n)
        self.pos_in_strand = np.fromiter((w[3] for w in cols), np.int64, n)
        self.p0 = np.fromiter((w[6] for w in cols), np.float64, n)
        self.p1 = np.fromiter((w[7] for w in cols), np.float64, n)
        self.label = np.fromiter((w[8] for w in cols), np.int32, n)
        self._cols = cols

    def __len__(self) -> int:
        return len(self.pos)

    def kmer_at(self, i: int) -> str:
        return self._cols[i][9]


def _parse_calls_py(raw: bytes) -> _PyCallBlock:
    lines = raw.decode().splitlines()
    return _PyCallBlock([ln.split("\t") for ln in lines if ln])


def write_freq(acc: FreqAccumulator, result_file: str, is_sort: bool,
               is_bed: bool, is_gzip: bool) -> None:
    """Emit the accumulated sites (call_mods_freq.py:77-122 formats)."""
    n = acc.n_sites
    gid = acc._gid[:n]
    pos = acc._pos[:n]
    chrom_names = np.array(acc._chroms, dtype=str)[gid] if n else \
        np.empty(0, dtype="U1")
    if is_sort:
        # reference sorts (chrom_str, pos) tuples: string-major
        order = np.lexsort((pos, chrom_names))
    else:
        order = np.arange(n)
    coverage = acc._coverage[:n]
    met = acc._met[:n]
    unmet = coverage - met
    prob0 = acc._prob0[:n]
    prob1 = acc._prob1[:n]
    strand = acc._strand[:n]
    pis = acc._pis[:n]
    kmers = acc._kmers
    path = gzip_path(result_file) if is_gzip else result_file
    wf = open_text(path, "wt") if is_gzip else open(path, "w")
    try:
        for i in order.tolist():
            cov = int(coverage[i])
            if cov <= 0:
                print(f"{chrom_names[i]} {pos[i]} has no coverage..")
                continue
            rmet = float(met[i]) / cov
            if is_bed:
                wf.write(format_bed_row(str(chrom_names[i]), int(pos[i]),
                                        chr(strand[i]), cov, rmet) + "\n")
            else:
                wf.write(format_freq_row(
                    str(chrom_names[i]), int(pos[i]), chr(strand[i]),
                    int(pis[i]), float(prob0[i]), float(prob1[i]),
                    int(met[i]), int(unmet[i]), cov, rmet,
                    kmers[i]) + "\n")
    finally:
        wf.close()


def _freq_one_contig(contig: str, mods_files: list[str], prob_cf: float,
                     result_file: str, issort: bool, isbed: bool,
                     device_agg: bool = False) -> str:
    """Worker: aggregate one contig into its own temp result file
    (reference _call_and_write_modsfreq_process, call_mods_freq.py:175)."""
    acc = FreqAccumulator(prob_cf=prob_cf, contig=contig,
                          device_agg=device_agg)
    for f in mods_files:
        acc.add_file(f)
    print(acc.report())
    fname, fext = os.path.splitext(result_file)
    c_file = fname + "." + contig + "." + str(uuid.uuid1()) + fext
    write_freq(acc, c_file, issort, isbed, False)
    return c_file


def _concat_results(contig_files: list[str], result_file: str,
                    is_gzip: bool) -> None:
    path = gzip_path(result_file) if is_gzip else result_file
    wf = open_text(path, "wt") if is_gzip else open(path, "w")
    try:
        for cfile in sorted(contig_files):
            with open(cfile) as rf:
                for line in rf:
                    wf.write(line)
            os.remove(cfile)
    finally:
        wf.close()


def resolve_contigs(contigs_arg: str | None) -> list[str] | None:
    """--contigs accepts a genome FASTA, a name-per-line file, or a
    comma-separated string (call_mods_freq.py:245-255)."""
    if contigs_arg is None:
        return None
    if os.path.isfile(contigs_arg):
        if contigs_arg.endswith((".fa", ".fasta", ".fna")) or \
                is_genome_fasta(contigs_arg):
            return get_contig_names(contigs_arg)
        with open(contigs_arg) as rf:
            return sorted(set(rf.read().splitlines()))
    return sorted(set(contigs_arg.strip().split(",")))


def collect_mods_files(input_paths: list[str],
                       file_uid: str | None) -> list[str]:
    """Expand --input_path entries (files or directories), filtering by
    --file_uid (call_mods_freq.py:230-243)."""
    mods_files = []
    for ipath in input_paths:
        input_path = os.path.abspath(ipath)
        if os.path.isdir(input_path):
            for ifile in os.listdir(input_path):
                if file_uid is None or ifile.find(file_uid) != -1:
                    mods_files.append("/".join([input_path, ifile]))
        elif os.path.isfile(input_path):
            mods_files.append(input_path)
        else:
            raise ValueError("--input_path is not a file or a directory!")
    return mods_files


def call_mods_frequency_to_file(args) -> None:
    """CLI entry, mirroring call_mods_freq.py:218."""
    print("[main]call_freq starts..")
    t0 = time.time()
    mods_files = collect_mods_files(args.input_path, args.file_uid)
    print("get {} input file(s)..".format(len(mods_files)))
    contigs = resolve_contigs(args.contigs)
    device_agg = getattr(args, "device_agg", False)

    if contigs is None:
        acc = FreqAccumulator(prob_cf=args.prob_cf, device_agg=device_agg)
        for f in mods_files:
            acc.add_file(f)
        import jax
        if jax.process_count() > 1:
            # pod mode: each host aggregated its own input shard; reduce
            # over collectives and let process 0 write the single output
            acc = merge_across_hosts(acc)
            print(acc.report())
            if jax.process_index() == 0:
                write_freq(acc, args.result_file, args.sort, args.bed,
                           args.gzip)
        else:
            print(acc.report())
            write_freq(acc, args.result_file, args.sort, args.bed,
                       args.gzip)
    else:
        print("start processing {} contigs..".format(len(contigs)))
        import multiprocessing as mp
        from concurrent.futures import ProcessPoolExecutor
        nproc = max(1, args.nproc)
        resfiles: list[str] = []
        if nproc == 1:
            for c in contigs:
                resfiles.append(_freq_one_contig(
                    c, mods_files, args.prob_cf, args.result_file,
                    args.sort, args.bed, device_agg))
        else:
            # spawn: fork is unsafe once JAX's thread pools exist
            with ProcessPoolExecutor(max_workers=nproc,
                                     mp_context=mp.get_context("spawn")
                                     ) as pool:
                futs = [pool.submit(_freq_one_contig, c, mods_files,
                                    args.prob_cf, args.result_file,
                                    args.sort, args.bed, device_agg)
                        for c in contigs]
                resfiles = [f.result() for f in futs]
        print("combine results of {} contigs..".format(len(resfiles)))
        _concat_results(resfiles, args.result_file, args.gzip)
    print("[main]call_freq costs %.1f seconds.." % (time.time() - t0))
