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

    def _intern_chroms(self, names: list[str]) -> np.ndarray:
        """Map block-local chrom names to global ids (interning new
        ones), returned as a local-id -> global-id lookup table."""
        lg2g = np.empty(len(names), np.int64)
        for j, name in enumerate(names):
            g = self._chrom2gid.get(name)
            if g is None:
                g = len(self._chroms)
                self._chrom2gid[name] = g
                self._chroms.append(name)
            lg2g[j] = g
        return lg2g

    def _resolve_and_append(self, ukeys, order_vals, gid_u, pos_u,
                            strand_u, pis_u, kmer_of) -> np.ndarray:
        """Map unique site keys to global table rows, appending unseen
        sites in ascending ``order_vals`` order (the first-occurrence /
        insertion-order contract, reference call_mods_freq.py:55-59).
        Metadata arrays are per-unique-key; ``kmer_of(j)`` returns key
        j's kmer string. Shared by the host block path, the device block
        path, and the cross-host table merge."""
        g_of = np.empty(len(ukeys), np.int64)
        k2i = self._key2idx
        new_local: list[int] = []
        for j, k in enumerate(ukeys.tolist()):
            gi = k2i.get(k)
            if gi is None:
                new_local.append(j)
                gi = -1
            g_of[j] = gi
        if new_local:
            new_local.sort(key=lambda j: order_vals[j])
            base = self.n_sites
            self._grow(len(new_local))
            nl = np.asarray(new_local)
            g_of[nl] = base + np.arange(len(new_local))
            for t, j in enumerate(new_local):
                k2i[int(ukeys[j])] = base + t
            sl = slice(base, base + len(new_local))
            self._gid[sl] = gid_u[nl]
            self._pos[sl] = pos_u[nl]
            self._strand[sl] = strand_u[nl]
            self._pis[sl] = pis_u[nl]
            self._kmers.extend(kmer_of(int(j)) for j in new_local)
            self.n_sites += len(new_local)
        return g_of

    def _add_block(self, cb) -> None:
        n = len(cb)
        if n == 0:
            return
        gids = self._intern_chroms(cb.chroms)[cb.chrom_ids]

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
        # int32 device keys can't carry positions past 2**31-1
        # (giant-chromosome assemblies); such blocks take the host path
        if self.device_agg and int(cb.pos[rows].max()) < 2**31:
            self._add_rows_device(cb, gids, rows)
            return

        keys = gids[rows] * _KEY_SHIFT + cb.pos[rows]
        ukeys, first_idx, inverse = np.unique(
            keys, return_index=True, return_inverse=True)
        src_rows = rows[first_idx]
        g_of_u = self._resolve_and_append(
            ukeys, first_idx, gids[src_rows], cb.pos[src_rows],
            cb.strand[src_rows], cb.pos_in_strand[src_rows],
            lambda j: cb.kmer_at(int(src_rows[j])))
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
        g_of_u = self._resolve_and_append(
            ukeys, first_rows, gids[first_rows], cb.pos[first_rows],
            cb.strand[first_rows], cb.pos_in_strand[first_rows],
            lambda j: cb.kmer_at(int(first_rows[j])))
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
        gids = self._intern_chroms(chroms)[np.asarray(gids_l)]
        keys = gids * _KEY_SHIFT + np.asarray(pos)
        g_of = self._resolve_and_append(
            keys, np.arange(len(keys)), gids, np.asarray(pos),
            np.asarray(strand), np.asarray(pis), lambda j: kmers[j])
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
    """Reduce per-host accumulators over collectives — the TPU-native
    equivalent of the reference's "run per node, merge the files later"
    multi-node story (SURVEY.md §5.8). Each host's site table rides a
    chunked device all-gather (parallel/multihost.allgather_bytes);
    process 0 — the one writer — walks hosts in process order so
    first-seen metadata and unsorted output order are deterministic.
    Non-zero processes never materialize the other hosts' tables (peak
    memory there is bounded by the gather chunk, not pcount * table);
    they return an accumulator carrying only the exact global
    count/used, so ``report()`` agrees on every host."""
    import jax
    if jax.process_count() == 1:
        return acc
    import pickle

    from jax.experimental import multihost_utils as mhu

    from ..parallel.multihost import allgather_bytes, join_i64, split_i64
    root = jax.process_index() == 0
    payloads = allgather_bytes(pickle.dumps(acc.state_payload()),
                               keep=root)
    merged = FreqAccumulator(prob_cf=acc.prob_cf, contig=acc.contig)
    for raw in payloads:
        pl = pickle.loads(raw)
        merged.merge_table(pl["chroms"], pl["gid"], pl["pos"],
                           pl["strand"], pl["pis"], pl["prob0"],
                           pl["prob1"], pl["met"], pl["coverage"],
                           pl["kmers"])
    # exact global counts on every host (int31 word pairs: int64 arrays
    # are canonicalized to int32 and genome-scale call counts overflow)
    words = np.asarray(mhu.process_allgather(np.array(
        split_i64(acc.count) + split_i64(acc.used), np.int32)))
    totals = join_i64(words.reshape(-1, 2, 2)).sum(axis=0)
    merged.count, merged.used = int(totals[0]), int(totals[1])
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


def _pod_input_fingerprint(f: str) -> str:
    """Content fingerprint for the pod-mode shared-list cross-check.

    size + sampled content hash: same-path files with EQUAL sizes but
    different content (per-host local shards written to the same path)
    must not pass the shared-list check — sharding that "shared" list
    would drop every host's local rows but host 0's. Small files hash
    whole; larger ones hash head + tail + strided interior chunks
    (ADVICE r4: head/tail alone left same-size files differing only in
    the middle indistinguishable). Still O(600 KiB) of IO per file
    regardless of size."""
    import hashlib
    size = os.path.getsize(f)
    h = hashlib.sha256()
    chunk = 65536
    with open(f, "rb") as fh:
        if size <= 8 * chunk:               # <= 512 KiB: hash whole
            for blk in iter(lambda: fh.read(chunk), b""):
                h.update(blk)
        else:
            h.update(fh.read(chunk))                       # head
            # 6 interior chunks at even strides through the middle
            for i in range(1, 7):
                fh.seek(chunk + (size - 2 * chunk) * i // 7)
                h.update(fh.read(chunk))
            fh.seek(-chunk, os.SEEK_END)                   # tail
            h.update(fh.read(chunk))
    return "{}\t{}\t{}".format(os.path.abspath(f), size,
                               h.hexdigest()[:16])


def _pod_resolve_inputs(mods_files: list[str], mode: str) -> tuple[
        list[str], bool]:
    """Resolve the per-host input list in pod mode -> (files, shared_fs).

    On a shared filesystem every host sees every file, so the list must be
    sharded or every count is multiplied by process_count. On the
    disjoint-per-host layout (parallel/dist.py data plane: each host
    ingests its own shard, host-suffixed outputs on local disk), sharding
    each host's local list silently DROPS files. ``mode``:

    - ``always``: shard unconditionally (caller asserts shared FS);
    - ``never``: keep this host's list (caller asserts disjoint layout);
    - ``auto``: cross-check over the merge collective — all-gather each
      host's (abspath, size) list; shard only when every host sees the
      identical list, keep local lists when they are pairwise disjoint,
      and error loudly on partial overlap instead of guessing.
    """
    from ..parallel.dist import shard_for_host
    if mode == "always":
        return shard_for_host(mods_files), True
    if mode == "never":
        return list(mods_files), False
    from ..parallel.multihost import allgather_bytes

    ident = "\n".join(_pod_input_fingerprint(f) for f in sorted(mods_files))
    payloads = allgather_bytes(ident.encode())
    sets = [set(p.decode().splitlines()) if p else set() for p in payloads]
    if all(s == sets[0] for s in sets):
        out = shard_for_host(mods_files)
        print("pod mode: shared input list; this host aggregates {} of {} "
              "file(s)".format(len(out), len(mods_files)))
        return out, True
    # Disjointness is judged on PATHS alone: the full fingerprints above
    # must match exactly for the shared-shard route, but the same path
    # observed with two different sizes/contents (stale NFS attribute
    # cache, a file still flushing, per-host local files at one path) is
    # NOT two disjoint files — treating it as such would hand the full
    # list to every host and silently multiply that file's counts by
    # process_count.
    path_sets = [set(line.split("\t", 1)[0] for line in s) for s in sets]
    if sum(len(s) for s in path_sets) == len(set().union(*path_sets)):
        print("pod mode: disjoint per-host inputs; this host aggregates "
              "all {} local file(s)".format(len(mods_files)))
        return list(mods_files), False
    raise ValueError(
        "pod call_freq: input file lists neither match exactly across "
        "hosts (same paths, sizes, and content samples) nor are pairwise "
        "disjoint — e.g. a partially overlapping partition, one shared "
        "file observed mid-write / through a stale NFS cache, or "
        "per-host LOCAL files living at the same path. Refusing to guess the partition (counts would "
        "be dropped or double-counted). Pass --pod_shard_inputs always "
        "(shared filesystem) or never (disjoint per-host inputs) to "
        "assert the layout.")


def call_mods_frequency_to_file(args) -> None:
    """CLI entry, mirroring call_mods_freq.py:218."""
    print("[main]call_freq starts..")
    t0 = time.time()
    mods_files = collect_mods_files(args.input_path, args.file_uid)
    print("get {} input file(s)..".format(len(mods_files)))
    contigs = resolve_contigs(args.contigs)
    device_agg = getattr(args, "device_agg", False)

    # pod detection via the env init_distributed reads — NOT
    # jax.process_count(), which would initialize the backend (a
    # multi-second TPU client grab) in an otherwise host-only tool
    from ..parallel.dist import pod_configured
    pod = pod_configured()

    pod_shard_inputs = getattr(args, "pod_shard_inputs", "auto")

    if contigs is None:
        if pod:
            # each host must aggregate its OWN shard of the input files —
            # but only when the filesystem is shared (see
            # _pod_resolve_inputs; on the disjoint-per-host layout,
            # sharding local lists would drop files)
            mods_files, _ = _pod_resolve_inputs(mods_files,
                                                pod_shard_inputs)
        acc = FreqAccumulator(prob_cf=args.prob_cf, device_agg=device_agg)
        for f in mods_files:
            acc.add_file(f)
        if pod:
            # reduce over collectives; process 0 writes the single output
            import jax
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
        result_file = args.result_file
        if pod:
            # pod mode: with a SHARED input list, shard the contig list
            # across hosts; with disjoint per-host inputs every host must
            # keep ALL contigs over its own files (a contig's rows can
            # live in any host's shard). Either way each host writes its
            # own suffixed output (the reference's multi-node story —
            # merge downstream with `tools combine_freq_files`).
            from ..parallel.dist import host_output_path, shard_for_host
            mods_files, shared_fs = _pod_resolve_inputs(mods_files,
                                                        pod_shard_inputs)
            if shared_fs:
                # undo the file split (contig split is the partition here)
                mods_files = collect_mods_files(args.input_path,
                                                args.file_uid)
                contigs = shard_for_host(contigs)
            result_file = host_output_path(result_file)
            print("pod mode: this host takes {} contig(s) over {} "
                  "file(s) -> {}".format(len(contigs), len(mods_files),
                                         result_file))
        print("start processing {} contigs..".format(len(contigs)))
        import multiprocessing as mp
        from concurrent.futures import ProcessPoolExecutor
        nproc = max(1, args.nproc)
        if device_agg and nproc > 1 and len(contigs) > 1:
            # accelerators are process-exclusive; spawn-pool workers must
            # not each bring up their own backend
            print("[warn] --device_agg is disabled under contig-parallel "
                  "workers (-p > 1); aggregating on the host instead")
            device_agg = False
        resfiles: list[str] = []
        if nproc == 1 or len(contigs) == 1:
            for c in contigs:
                resfiles.append(_freq_one_contig(
                    c, mods_files, args.prob_cf, result_file,
                    args.sort, args.bed, device_agg))
        else:
            # spawn: fork is unsafe once JAX's thread pools exist
            with ProcessPoolExecutor(max_workers=nproc,
                                     mp_context=mp.get_context("spawn")
                                     ) as pool:
                futs = [pool.submit(_freq_one_contig, c, mods_files,
                                    args.prob_cf, result_file,
                                    args.sort, args.bed, device_agg)
                        for c in contigs]
                resfiles = [f.result() for f in futs]
        print("combine results of {} contigs..".format(len(resfiles)))
        _concat_results(resfiles, result_file, args.gzip)
    print("[main]call_freq costs %.1f seconds.." % (time.time() - t0))
