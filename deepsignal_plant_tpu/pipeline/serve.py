"""serve — long-running call_mods over a watched directory.

Production deployment mode the reference does not have: sequencing
runs deposit feature files (TSV / any .npz wire version) continuously;
this keeps ONE warm engine (checkpoint loaded once, executables
compiled once) and calls each file as it lands, instead of paying
model-load + jit compile per CLI invocation (minutes on remote-attached
TPU rigs, seconds warm).

Contract per input file ``X``:
    <result_dir>/X.call_mods.tsv      the calls (atomic: written to a
                                      dot-temp name, renamed when done)
    <result_dir>/X.done               marker: "<sites>\t<seconds>"
    <result_dir>/X.failed             marker: first line of the error

A file is picked up when its (size, mtime) is STABLE across two polls —
half-written uploads are never read — and is processed at most once
(markers are the dedup record, so restarts resume where they left off).
SIGTERM/SIGINT finish the in-flight file, then exit cleanly.

Producer-side completion markers: if ``X.complete`` exists next to input
``X``, ``X`` is picked up immediately (no stability wait). Stat
stability is a heuristic — a transfer that stalls longer than one poll
interval mid-file looks stable — so producers that can signal should:
``touch X.complete`` after the upload finishes. ``--require_complete``
turns the convention into a contract: ONLY marked inputs are processed
(the mode for rsync/scp-style deposits; sequencer run-folders that never
write markers keep the default stability heuristic).
"""
from __future__ import annotations

import os
import signal
import time

#: input extensions the engine accepts directly
_EXTS = (".tsv", ".npz", ".tsv.gz")


def _holds_fast5s(path: str) -> bool:
    for _root, _dirs, files in os.walk(path):
        if any(f.endswith(".fast5") for f in files):
            return True
    return False




def _stat_sig(path: str) -> tuple | None:
    """Stability signature: (size, mtime) for a file; (file count, total
    bytes, newest mtime) over the tree for a run-folder."""
    try:
        if not os.path.isdir(path):
            st = os.stat(path)
            return (st.st_size, st.st_mtime_ns)
        n = total = newest = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                try:
                    st = os.stat(os.path.join(root, f))
                except OSError:
                    continue
                n += 1
                total += st.st_size
                newest = max(newest, st.st_mtime_ns)
        return (n, total, newest)
    except OSError:
        return None


class WatchServer:
    """Poll-loop server around one warm CallModsEngine."""

    def __init__(self, engine, watch_dir: str, result_dir: str,
                 poll_s: float = 2.0, is_gzip: bool = False,
                 extract_args=None, require_complete: bool = False):
        self.engine = engine
        self.watch_dir = watch_dir
        self.result_dir = result_dir
        self.poll_s = poll_s
        self.is_gzip = is_gzip
        self.require_complete = require_complete
        # argparse-like namespace with the extraction options the fused
        # fast5 path needs (motifs, corrected_group, nproc, ...); None
        # disables run-folder processing
        self.extract_args = extract_args
        self._stop = False
        self._last_sig: dict[str, tuple] = {}
        os.makedirs(result_dir, exist_ok=True)

    def request_stop(self, *_):
        self._stop = True

    def _marker(self, name: str, kind: str) -> str:
        return os.path.join(self.result_dir, f"{name}.{kind}")

    def _is_done(self, name: str) -> bool:
        return (os.path.exists(self._marker(name, "done"))
                or os.path.exists(self._marker(name, "failed")))

    def _ready(self, path: str) -> bool:
        """Producer marker wins; else stable across two polls (size+mtime
        unchanged). With require_complete, the marker is the ONLY signal."""
        if os.path.exists(path + ".complete"):
            return True
        if self.require_complete:
            return False
        sig = _stat_sig(path)
        if sig is None:
            return False
        prev = self._last_sig.get(path)
        self._last_sig[path] = sig
        return prev == sig

    def process_one(self, path: str) -> bool:
        name = os.path.basename(path)
        out_name = name + ".call_mods.tsv" + (".gz" if self.is_gzip else "")
        final = os.path.join(self.result_dir, out_name)
        # the temp must END in .gz in gzip mode: the engine's AsyncWriter
        # forces the suffix (gzip_path), so any other temp name means the
        # writer writes <tmp>.gz and the rename below finds nothing —
        # every gzip input would be marked failed
        tmp = os.path.join(self.result_dir, "." + name + ".tmp.call_mods.tsv"
                           + (".gz" if self.is_gzip else ""))
        t0 = time.time()
        try:
            if os.path.isdir(path):
                from .extract import extract_to_call_mods
                stats = extract_to_call_mods(self.engine, path,
                                             self.extract_args,
                                             result_file=tmp)
            else:
                stats = self.engine.run_features_file(
                    path, tmp, is_gzip=self.is_gzip)
            os.replace(tmp, final)
            with open(self._marker(name, "done"), "w") as fh:
                fh.write(f"{stats.sites}\t{time.time() - t0:.3f}\n")
            print(f"[serve] {name}: {stats.sites} sites in "
                  f"{time.time() - t0:.2f}s ({stats.sites_per_s:,.0f}/s)",
                  flush=True)
            return True
        except Exception as exc:  # keep serving: one bad file != outage
            try:
                os.remove(tmp)
            except OSError:
                pass
            with open(self._marker(name, "failed"), "w") as fh:
                fh.write(str(exc).split("\n")[0] + "\n")
            print(f"[serve] {name}: FAILED ({exc})", flush=True)
            return False

    def _pending(self) -> list[str]:
        """Unprocessed candidates. The done-marker check runs BEFORE the
        run-folder fast5 probe: a backlog of thousands of already-served
        run-folders must cost two result-dir stats each per poll, not a
        full os.walk each."""
        include_dirs = self.extract_args is not None
        out = []
        for name in sorted(os.listdir(self.watch_dir)):
            if name.startswith("."):
                continue
            # never re-ingest our own products: with result_dir ==
            # watch_dir (nothing forbids it) the output X.call_mods.tsv
            # matches _EXTS and would be re-called forever
            if ".call_mods.tsv" in name or \
                    name.endswith((".done", ".failed", ".complete")):
                continue
            if self._is_done(name):
                continue
            path = os.path.join(self.watch_dir, name)
            if any(name.endswith(e) for e in _EXTS):
                out.append(path)
            elif include_dirs and os.path.isdir(path) \
                    and _holds_fast5s(path):
                out.append(path)
        return out

    def sweep(self) -> int:
        """One poll: process every stable, unprocessed input. Returns the
        number of files processed."""
        n = 0
        pending = self._pending()
        # prune stability signatures of paths no longer pending (served,
        # failed, or deleted) — a months-long server would otherwise keep
        # one dict entry per file ever observed
        live = set(pending)
        for stale in [p for p in self._last_sig if p not in live]:
            del self._last_sig[stale]
        for path in pending:
            if self._stop:
                break
            if not self._ready(path):
                continue
            self.process_one(path)
            n += 1
        return n

    def run(self, once: bool = False) -> None:
        if once:
            # process the current backlog: first poll records signatures,
            # second confirms stability. The polls must be poll_s apart —
            # back-to-back sweeps would compare signatures microseconds
            # apart and deem a mid-upload file "stable" (truncated calls
            # marked .done, never retried)
            self.sweep()
            time.sleep(self.poll_s)
            self.sweep()
            return
        while not self._stop:
            self.sweep()
            # interruptible sleep
            deadline = time.time() + self.poll_s
            while not self._stop and time.time() < deadline:
                time.sleep(0.1)
        print("[serve] stopped.", flush=True)


def serve(args) -> None:
    """CLI entry: build one warm engine and watch a directory."""
    from ..config import call_config_from_args, model_config_from_args
    from ..utils.jaxinit import setup_jax
    from .call_mods import CallModsEngine

    setup_jax()
    model_cfg = model_config_from_args(args, dropout_rate=0.0,
                                       allow_multi_device=True)
    call_cfg = call_config_from_args(args)
    engine = CallModsEngine(os.path.abspath(args.model_path), model_cfg,
                            call_cfg)
    # run-folder (fast5 dir) inputs take the fused path with these
    # extraction options; args already carries the f5/extraction flags
    # (the serve parser includes _add_f5_args), so pass it through
    server = WatchServer(engine, os.path.abspath(args.watch_dir),
                         os.path.abspath(args.result_dir),
                         poll_s=args.poll_s,
                         is_gzip=getattr(args, "gzip", False),
                         extract_args=args,
                         require_complete=getattr(args, "require_complete",
                                                  False))
    signal.signal(signal.SIGTERM, server.request_stop)
    signal.signal(signal.SIGINT, server.request_stop)
    print(f"[serve] watching {args.watch_dir} -> {args.result_dir} "
          f"(poll {args.poll_s}s, compute {model_cfg.compute_dtype}, "
          f"once={args.once})", flush=True)
    server.run(once=args.once)
