"""Interleaved A/B: fused fast5 -> call_mods vs the features-TSV plane
on the SAME sites at CG density (VERDICT r2 #1's done criterion: fused
within ~10% of the TSV plane, outputs identical).

The fused arm pays extraction (pool spawn + per-read event walk) inline;
the TSV arm reads pre-extracted features. With the native per-read
kernel (dsp_read_norm_stats) the extraction workers should fully overlap
the engine, so the two arms converge. Arms alternate order per round so
tunnel drift cancels.

Usage: python benchmarks/fused_ab.py [n_reads] [rounds] [nproc]
"""
import os
import statistics
import sys
import tempfile
import time
from types import SimpleNamespace

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))

N_READS = int(sys.argv[1]) if len(sys.argv) > 1 else 768
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
NPROC = int(sys.argv[3]) if len(sys.argv) > 3 else 6

def main():
    import numpy as np  # noqa: E402

    import make_synthetic as ms  # noqa: E402
    from deepsignal_plant_tpu.config import CallConfig, ModelConfig  # noqa
    from deepsignal_plant_tpu.pipeline.call_mods import CallModsEngine  # noqa
    from deepsignal_plant_tpu.pipeline.extract import (ExtractContext,  # noqa
                                                       ExtractOptions,
                                                       extract_features,
                                                       extract_to_call_mods)
    from deepsignal_plant_tpu.utils.jaxinit import (resolve_compute_dtype,  # noqa
                                                    resolve_recurrence,
                                                    setup_jax)

    setup_jax()
    import jax  # noqa: E402

    from deepsignal_plant_tpu.models.bilstm import init_params  # noqa: E402
    from deepsignal_plant_tpu.models.convert import save_checkpoint  # noqa

    print("devices:", jax.devices(), flush=True)

    td = tempfile.TemporaryDirectory()
    rng = np.random.default_rng(7)
    genome = ms.synth_genome(rng, {"chr1": 120000, "chr2": 120000})
    f5dir = os.path.join(td.name, "fast5s")
    t0 = time.time()
    ms.synth_fast5_dir(f5dir, genome, rng, n_reads=N_READS, read_len=8000,
                       max_event_len=25)
    print(f"fixture: {N_READS} fast5 reads in {time.time()-t0:.1f}s",
          flush=True)

    # pre-extract the TSV arm's input once (CG motif)
    opts = ExtractOptions(motifs="CG")
    ctx = ExtractContext.build(opts)
    tsv = os.path.join(td.name, "features.tsv")
    t0 = time.time()
    extract_features(f5dir, True, ctx, tsv, nproc=NPROC, f5_batch_size=32,
                     out_format="tsv")
    n_rows = sum(1 for _ in open(tsv))
    print(f"extracted {n_rows} sites to TSV in {time.time()-t0:.1f}s",
          flush=True)

    ckpt = os.path.join(td.name, "bench.ckpt.npz")
    cfg = ModelConfig(dropout_rate=0.0)
    cpu0 = jax.devices("cpu")[0]
    with jax.default_device(cpu0):
        params = jax.device_get(init_params(jax.random.PRNGKey(0), cfg))
    save_checkpoint(ckpt, params, cfg)

    mcfg = ModelConfig(dropout_rate=0.0,
                       compute_dtype=resolve_compute_dtype("auto"),
                       recurrence=resolve_recurrence("auto",
                                                     allow_multi_device=True))
    engine = CallModsEngine(ckpt, mcfg, CallConfig())

    fused_args = SimpleNamespace(
        corrected_group="RawGenomeCorrected_000",
        basecall_subgroup="BaseCalled_template",
        normalize_method="mad", motifs="CG", mod_loc=0, seq_len=13,
        signal_len=16, positions=None, region=None, reference_path=None,
        downsample="even", result_file=None, f5_batch_size=32, nproc=NPROC,
        recursively="yes", is_dna="yes", gzip=False)

    out_fused = os.path.join(td.name, "fused.tsv")
    out_tsv = os.path.join(td.name, "plane.tsv")


    def run_fused():
        t0 = time.time()
        st = extract_to_call_mods(engine, f5dir, fused_args, out_fused)
        wall = time.time() - t0
        return st, wall


    def run_tsv():
        t0 = time.time()
        st = engine.run_features_file(tsv, out_tsv)
        wall = time.time() - t0
        return st, wall


    # warm both arms (compile + page cache)
    st, w = run_fused()
    print(f"warm fused: {st.sites_per_s:,.0f} sites/s (wall {w:.1f}s, "
          f"stats {st.seconds:.1f}s, {st.sites} sites)", flush=True)
    st, w = run_tsv()
    print(f"warm tsv:   {st.sites_per_s:,.0f} sites/s (wall {w:.1f}s)",
          flush=True)

    rates = {"fused": [], "tsv": []}
    walls = {"fused": [], "tsv": []}
    arms = {"fused": run_fused, "tsv": run_tsv}
    for r in range(ROUNDS):
        order = ["fused", "tsv"] if r % 2 == 0 else ["tsv", "fused"]
        for name in order:
            st, wall = arms[name]()
            rates[name].append(st.sites_per_s)
            walls[name].append(st.sites / wall)
            print(f"round {r} {name}: {st.sites_per_s:,.0f} sites/s "
                  f"(wall-scope {st.sites/wall:,.0f}; {st.sites} sites)",
                  flush=True)

    # the two arms must call the same SITES; probs can differ in the last
    # decimal because batch composition differs between planes (fused
    # streams per extraction part, TSV per parse block) and the int8
    # wire's per-batch scales + bf16 tiling are composition-dependent —
    # the same documented noise band as the device_batch sweep
    # (docs/PARITY.md). Assert: identical site keys, zero call flips,
    # max |dP| within the band.
    def parse(path):
        recs = {}
        for ln in open(path):
            f = ln.rstrip("\n").split("\t")
            # chrom, pos, strand, pos_in_strand, readname, read_strand,
            # prob0, prob1, call, kmer
            recs[(f[0], f[1], f[2], f[4])] = (float(f[6]), float(f[7]),
                                              f[8])
        return recs

    rf, rt = parse(out_fused), parse(out_tsv)
    assert rf.keys() == rt.keys(), (
        f"site sets differ: {len(rf)} vs {len(rt)} keys, "
        f"{len(rf.keys() ^ rt.keys())} mismatched")
    flips = sum(1 for k in rf if rf[k][2] != rt[k][2])
    max_dp = max(abs(rf[k][0] - rt[k][0]) for k in rf)
    print(f"arms agree on {len(rf)} sites: call flips {flips}, "
          f"max |dP| {max_dp:.1e}")
    assert flips == 0, f"{flips} call flips between fused and TSV arms"
    assert max_dp < 5e-4, f"max |dP| {max_dp} beyond the bf16/int8 band"

    for name in arms:
        med = statistics.median(rates[name])
        print(f"{name}: median {med:,.0f} best {max(rates[name]):,.0f} "
              f"wall-med {statistics.median(walls[name]):,.0f} all "
              f"{[round(x) for x in rates[name]]}")
    f_med = statistics.median(rates["fused"])
    t_med = statistics.median(rates["tsv"])
    print(f"fused/tsv ratio: {f_med / t_med:.3f} "
          f"(criterion: >= 0.90 => extraction fully overlapped)")


if __name__ == "__main__":
    # REQUIRED: extraction pools use spawn workers which re-import
    # __main__; module-level work would fork-bomb (re-running setup_jax
    # and the fixture synthesis in every worker)
    main()
