"""Loader A/B (VERDICT r3 item 3): why does the packed-npz plane trail
the TSV plane in the driver artifact when it ships fewer bytes and
skips parsing entirely?

Phase 1 (host only, no device): pure feed rates of each input chain —
  tsv        iter_byte_blocks -> native parse -> dsp_pack_rows
  packed     np.load(v3 .npz) per file
  packed-raw zipfile raw member reads -> np.frombuffer (zero-parse
             alternative to np.load's ZipExtFile chunked copies)
  wire       np.load(v2 .npz) per file
both single-threaded and through bounded_thread_map at the engine's
worker count. If a loader's feed ceiling sits below the engine's
end-to-end rate, IT is the bottleneck.

Phase 2 (TPU): interleaved end-to-end A/B, alternating plane order
round-robin so tunnel weather hits both arms equally.

Prints one JSON line; run on the bench rig.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
for p in (REPO, os.path.join(REPO, "tests")):
    if p not in sys.path:
        sys.path.insert(0, p)

N_ROWS = int(os.environ.get("AB_ROWS", "131072"))
DEVICE_BATCH = 4096
ROUNDS = int(os.environ.get("AB_ROUNDS", "4"))


def stage_inputs(td: str):
    import bench
    feats = os.path.join(td, "feats.tsv")
    bench.make_features_file(feats, N_ROWS)
    packed_dir = os.path.join(td, "packed")
    bench.make_packed_dir(packed_dir, N_ROWS, DEVICE_BATCH)
    wire_dir = os.path.join(td, "wire")
    bench.make_npz_dir(feats, wire_dir, DEVICE_BATCH, wire=True)
    return feats, packed_dir, wire_dir


def feed_tsv(feats: str, workers: int) -> float:
    from deepsignal_plant_tpu.io.batching import (bounded_thread_map,
                                                  iter_byte_blocks)
    from deepsignal_plant_tpu.utils.fastparse import (pack_raw_block,
                                                      parse_raw_feature_block)

    def parse_and_pack(raw):
        return pack_raw_block(parse_raw_feature_block(raw, 13, 16))

    t0 = time.perf_counter()
    n = 0
    if workers == 1:
        for raw in iter_byte_blocks(feats, 8 << 20):
            n += parse_and_pack(raw).n
    else:
        for pb in bounded_thread_map(parse_and_pack,
                                     iter_byte_blocks(feats, 8 << 20),
                                     workers=workers, depth=2 * workers):
            n += pb.n
    return n / (time.perf_counter() - t0)


def feed_npz(dirpath: str, loader, workers: int) -> float:
    from deepsignal_plant_tpu.io.batching import bounded_thread_map
    from deepsignal_plant_tpu.utils.formats import feature_npz_paths
    files = feature_npz_paths(dirpath)
    t0 = time.perf_counter()
    n = 0
    if workers == 1:
        for f in files:
            n += loader(f).n
    else:
        for b in bounded_thread_map(loader, files, workers=workers,
                                    depth=2 * workers):
            n += b.n
    return n / (time.perf_counter() - t0)


def load_packed_raw(path: str):
    """load_packed_npz semantics via the PRODUCTION raw-zip reader
    (formats._read_npz_arrays) — the A/B arm measures the exact code the
    engine runs, minus load_packed_npz's validation passes."""
    import numpy as np

    from deepsignal_plant_tpu.utils.fastparse import PackedFeatureBlock
    from deepsignal_plant_tpu.utils.formats import _read_npz_arrays
    z = _read_npz_arrays(path)
    return PackedFeatureBlock(
        z["info_blob"].tobytes(), z["row_starts"], z["info_ends"],
        z["centers"], z["codes"], z["base_means"], z["base_stds"],
        z["base_signal_lens"], z["signals"],
        z["labels"].astype(np.int32),
        int(np.asarray(z.get("kmer_len", 13)).reshape(-1)[0]))


def run_engine(engine, path: str, out: str) -> float:
    return engine.run_features_file(path, out).sites_per_s


def main() -> None:
    from deepsignal_plant_tpu.config import CallConfig, ModelConfig
    from deepsignal_plant_tpu.io.batching import default_parse_workers
    from deepsignal_plant_tpu.pipeline.call_mods import CallModsEngine
    from deepsignal_plant_tpu.utils.formats import (load_packed_npz,
                                                    load_wire_npz)
    from deepsignal_plant_tpu.utils.jaxinit import (resolve_compute_dtype,
                                                    resolve_recurrence)

    td_ctx = tempfile.TemporaryDirectory()
    td = td_ctx.name
    feats, packed_dir, wire_dir = stage_inputs(td)
    pw = default_parse_workers()

    res = {"rows": N_ROWS, "parse_workers": pw, "feed": {}}
    # phase 1: host feed ceilings (3 passes, report max — file cache warm)
    arms = [("tsv_1t", lambda: feed_tsv(feats, 1)),
            ("tsv_pool", lambda: feed_tsv(feats, pw))]
    for w in (1, 2, 4, pw):
        arms.append((f"packed_{w}t",
                     lambda w=w: feed_npz(packed_dir, load_packed_npz, w)))
        arms.append((f"packed_raw_{w}t",
                     lambda w=w: feed_npz(packed_dir, load_packed_raw, w)))
    arms += [("wire_1t", lambda: feed_npz(wire_dir, load_wire_npz, 1)),
             ("wire_pool", lambda: feed_npz(wire_dir, load_wire_npz, pw))]
    for name, fn in arms:
        rates = [fn() for _ in range(3)]
        res["feed"][name] = round(max(rates), 1)
        print(f"feed {name}: {res['feed'][name]:,.0f} rows/s", flush=True)

    if os.environ.get("AB_HOST_ONLY"):
        print(json.dumps(res))
        return

    # phase 2: interleaved end-to-end on the device
    import jax
    res["backend"] = jax.default_backend()
    engine = CallModsEngine(
        _mk_ckpt(td),
        ModelConfig(dropout_rate=0.0,
                    compute_dtype=resolve_compute_dtype("auto"),
                    recurrence=resolve_recurrence(
                        "auto", allow_multi_device=True)),
        CallConfig(device_batch=DEVICE_BATCH))
    out = os.path.join(td, "out.tsv")
    arms = {"tsv": feats, "packed": packed_dir, "wire": wire_dir}
    for path in arms.values():              # warm every plane's jit
        run_engine(engine, path, out)
    series: dict[str, list] = {k: [] for k in arms}
    order = list(arms)
    for r in range(ROUNDS):
        for k in order[r % len(order):] + order[:r % len(order)]:
            series[k].append(round(run_engine(engine, arms[k], out), 1))
            print(f"round {r} {k}: {series[k][-1]:,.0f}", flush=True)
    res["e2e"] = {k: {"median": round(statistics.median(v), 1),
                      "passes": v} for k, v in series.items()}
    print(json.dumps(res))


def _mk_ckpt(td: str) -> str:
    import jax

    from deepsignal_plant_tpu.config import ModelConfig
    from deepsignal_plant_tpu.models.bilstm import init_params
    from deepsignal_plant_tpu.models.convert import save_checkpoint
    cfg = ModelConfig(dropout_rate=0.0)
    p = os.path.join(td, "m.npz")
    save_checkpoint(p, init_params(jax.random.PRNGKey(0), cfg), cfg)
    return p


if __name__ == "__main__":
    main()
