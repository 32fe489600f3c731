"""deepsignal_plant_tpu CLI — five subcommands mirroring the reference
(deepsignal_plant/deepsignal_plant.py:85-117): extract, call_mods,
call_freq, train, denoise — plus the post-processing tool set under
``tools`` (reference scripts/).

Flag names and defaults follow the reference so existing pipelines can
switch by changing the binary name.
"""
from __future__ import annotations

import argparse
import sys

from ._version import DEEPSIGNAL_PLANT_TPU_VERSION
from .utils.bases import str2bool


def display_args(args):
    print("# ===============================================")
    print("## parameters: ")
    for k, v in vars(args).items():
        if k != "func":
            print("{}:\n\t{}".format(k, v))
    print("# ===============================================")


def _add_model_args(p, dropout_default: float, model_type_default="both_bilstm",
                    compute_dtype_default="float32"):
    p.add_argument("--model_type", type=str, default=model_type_default,
                   choices=["both_bilstm", "seq_bilstm", "signal_bilstm"],
                   help="model variant, default %(default)s")
    p.add_argument("--seq_len", type=int, default=13,
                   help="len of kmer. default 13")
    p.add_argument("--signal_len", type=int, default=16,
                   help="signal num of one base, default 16")
    p.add_argument("--layernum1", type=int, default=3,
                   help="lstm layer num for combined feature, default 3")
    p.add_argument("--layernum2", type=int, default=1,
                   help="lstm layer num for seq/signal branch, default 1")
    p.add_argument("--class_num", type=int, default=2)
    p.add_argument("--dropout_rate", type=float, default=dropout_default)
    p.add_argument("--n_vocab", type=int, default=16)
    p.add_argument("--n_embed", type=int, default=4)
    p.add_argument("--is_base", type=str, default="yes")
    p.add_argument("--is_signallen", type=str, default="yes")
    p.add_argument("--hid_rnn", type=int, default=256,
                   help="BiLSTM hidden size, default 256")
    p.add_argument("--recurrence", type=str, default="auto",
                   choices=["auto", "scan", "pallas"],
                   help="BiLSTM recurrence impl: fused pallas kernels "
                        "(auto on TPU) or lax.scan")
    p.add_argument("--compute_dtype", type=str,
                   default=compute_dtype_default,
                   choices=["auto", "float32", "bfloat16"],
                   help="on-device math dtype (default %(default)s). "
                        "bfloat16 runs the matmuls at the MXU's native "
                        "rate (fused recurrence 1.76x f32; the pallas "
                        "kernels keep gate math, cell states and dW "
                        "accumulation f32; logits upcast to f32 before "
                        "softmax). Measured prob deviation vs f32 on the "
                        "real chip: max ~1.2e-4, 100.0000%% call "
                        "agreement — ~30x below the reference's own "
                        "randn-h0/c0 run-to-run noise. auto = bfloat16 "
                        "on TPU, float32 elsewhere. See docs/BENCH.md")


def _add_f5_args(p):
    p.add_argument("--recursively", "-r", type=str, default="yes")
    p.add_argument("--corrected_group", type=str,
                   default="RawGenomeCorrected_000")
    p.add_argument("--basecall_subgroup", type=str,
                   default="BaseCalled_template")
    p.add_argument("--is_dna", type=str, default="yes")
    p.add_argument("--normalize_method", type=str,
                   choices=["mad", "zscore"], default="mad")
    p.add_argument("--motifs", type=str, default="CG")
    p.add_argument("--mod_loc", type=int, default=0)
    p.add_argument("--region", type=str, default=None)
    p.add_argument("--positions", type=str, default=None)
    p.add_argument("--reference_path", type=str, default=None)
    p.add_argument("--downsample", type=str, default="even",
                   choices=["even", "compat"],
                   help="per-base signal downsampling: deterministic "
                        "evenly-spaced (even) or reference-compatible "
                        "random (compat)")


def main_extract(args):
    from .pipeline.extract import (ExtractContext, ExtractOptions,
                                   extract_features)
    display_args(args)
    opts = ExtractOptions(
        corrected_group=args.corrected_group,
        basecall_subgroup=args.basecall_subgroup,
        normalize_method=args.normalize_method, motifs=args.motifs,
        mod_loc=args.mod_loc, kmer_len=args.seq_len,
        signal_len=args.signal_len, methy_label=args.methy_label,
        positions=args.positions, region=args.region,
        reference_path=args.reference_path, downsample=args.downsample)
    ctx = ExtractContext.build(opts, str2bool(args.is_dna))
    extract_features(args.fast5_dir, str2bool(args.recursively), ctx,
                     args.write_path, args.nproc, args.f5_batch_size,
                     str2bool(args.w_is_dir), args.w_batch_num, args.gzip,
                     seed=args.seed, out_format=args.w_format)


def main_call_mods(args):
    from .pipeline.call_mods import call_mods
    display_args(args)
    call_mods(args)


def main_serve(args):
    from .pipeline.serve import serve
    display_args(args)
    serve(args)


def main_call_freq(args):
    from .pipeline.call_freq import call_mods_frequency_to_file
    display_args(args)
    call_mods_frequency_to_file(args)


def main_train(args):
    from .pipeline.train import train
    display_args(args)
    train(args)


def main_denoise(args):
    from .pipeline.denoise import denoise
    display_args(args)
    denoise(args)


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="deepsignal_plant_tpu",
        description="deepsignal_plant_tpu detects 5mC from nanopore reads "
                    "of plants on TPU:\n"
                    "\tcall_mods: call modifications\n"
                    "\tcall_freq: genome-level modification frequency\n"
                    "\textract: extract features from tombo fast5s\n"
                    "\ttrain: train a model\n"
                    "\tdenoise: clean training samples by cross-rank\n"
                    "\ttools: post-processing utilities",
        formatter_class=argparse.RawTextHelpFormatter)
    parser.add_argument("-v", "--version", action="version",
                        version="deepsignal_plant_tpu version: {}".format(
                            DEEPSIGNAL_PLANT_TPU_VERSION))
    subparsers = parser.add_subparsers(title="modules")

    # ---- extract ----
    p = subparsers.add_parser("extract",
                              description="extract features from corrected "
                                          "(tombo) fast5s")
    p.add_argument("--fast5_dir", "-i", type=str, required=True)
    _add_f5_args(p)
    p.add_argument("--seq_len", type=int, default=13,
                   help="len of kmer. default 13")
    p.add_argument("--signal_len", type=int, default=16,
                   help="signals per base, default 16")
    p.add_argument("--methy_label", type=int, choices=[1, 0], default=1)
    p.add_argument("--write_path", "-o", type=str, required=True)
    p.add_argument("--w_is_dir", type=str, default="no")
    p.add_argument("--w_batch_num", type=int, default=200)
    p.add_argument("--w_format", type=str, default="tsv",
                   choices=["tsv", "npz", "npz_wire", "npz_packed"],
                   help="tsv: reference-compatible text; npz: binary "
                        "feature batches (directory output, no text codec "
                        "downstream); npz_wire: inference-staging batches "
                        "in the engine's exact per-site f16 wire layout; "
                        "npz_packed: read-packed wire (deduplicated "
                        "per-base arrays + site centers, window gather on "
                        "device — fastest call_mods input for dense "
                        "motifs)")
    p.add_argument("--gzip", action="store_true", default=False)
    p.add_argument("--nproc", "-p", type=int, default=4)
    p.add_argument("--f5_batch_size", type=int, default=30)
    p.add_argument("--seed", type=int, default=None,
                   help="seed the per-worker RNG of --downsample compat "
                        "for reproducible extraction")
    p.set_defaults(func=main_extract)

    # ---- call_mods ----
    p = subparsers.add_parser("call_mods", description="call modifications")
    p.add_argument("--input_path", "-i", type=str, required=True,
                   help="features file from extract, or a fast5 directory")
    p.add_argument("--f5_batch_size", type=int, default=30)
    p.add_argument("--model_path", "-m", type=str, required=True,
                   help=".ckpt (torch) or .ckpt.npz (native) checkpoint")
    # inference defaults to auto (bf16 on TPU): deviation vs f32 is far
    # inside the reference's own run-to-run noise
    _add_model_args(p, dropout_default=0.0, compute_dtype_default="auto")
    p.add_argument("--batch_size", "-b", type=int, default=512)
    p.add_argument("--device_batch", type=int, default=None,
                   help="padded per-step TPU batch (rows)")
    p.add_argument("--transfer_dtype", type=str, default="auto",
                   choices=["auto", "float32", "float16", "int8"],
                   help="host->device wire format; auto = int8 (quantized, "
                        "dequant on device) on remote-attached links where "
                        "wire MB/s binds, float16 on directly-attached "
                        "backends; float32 for exact-parity runs")
    p.add_argument("--parse_workers", type=int, default=None,
                   help="host parser threads (default: cores, max 4)")
    p.add_argument("--dispatch_workers", type=int, default=8,
                   help="concurrent device dispatches (overlaps per-call "
                        "transfer latency on remote-attached runtimes)")
    p.add_argument("--packed_wire", type=str, default="auto",
                   choices=["auto", "force", "off"],
                   help="read-packed wire plane: auto keeps the on-device "
                        "window gather only where it saves wire bytes for "
                        "the mesh (converts to per-site windows on host "
                        "otherwise); force always gathers on device; off "
                        "always converts")
    p.add_argument("--device_resident", type=str, default="never",
                   choices=["never", "always"],
                   help="always = upload each K*device_batch-row segment "
                        "to HBM once and run it in one compiled dispatch "
                        "(a lax.scan over the forwards) — no per-batch "
                        "wire. Outputs byte-identical to streaming runs "
                        "at float16/float32 transfer; int8 (the remote "
                        "auto wire) resolves to f16 on this plane, so "
                        "probs differ from an int8 streaming run in the "
                        "6th decimal. Serves features TSV and "
                        "wire-format .npz inputs")
    p.add_argument("--result_file", "-o", type=str, required=True)
    p.add_argument("--gzip", action="store_true", default=False)
    _add_f5_args(p)
    p.add_argument("--nproc", "-p", type=int, default=4)
    p.add_argument("--nproc_gpu", type=int, default=2,
                   help="accepted for reference CLI compatibility (unused: "
                        "the TPU engine data-parallelizes over the mesh)")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler device trace here")
    p.add_argument("--verbose_stages", action="store_true", default=False,
                   help="print per-stage host timing counters at the end")
    p.set_defaults(func=main_call_mods)

    # ---- serve (watch-directory call_mods; not in the reference) ----
    p = subparsers.add_parser(
        "serve",
        description="long-running call_mods over a watched directory: one "
                    "warm engine (checkpoint + compiles paid once) calls "
                    "each feature file (.tsv/.tsv.gz/.npz any wire "
                    "version) as it lands; outputs + .done/.failed "
                    "markers land in --result_dir; stable-size pickup, "
                    "at-most-once semantics across restarts, graceful "
                    "SIGTERM")
    p.add_argument("--watch_dir", "-i", type=str, required=True)
    p.add_argument("--result_dir", "-o", type=str, required=True)
    p.add_argument("--model_path", "-m", type=str, required=True)
    p.add_argument("--poll_s", type=float, default=2.0,
                   help="poll interval seconds, default %(default)s")
    p.add_argument("--once", action="store_true", default=False,
                   help="process the current backlog and exit")
    p.add_argument("--require_complete", action="store_true", default=False,
                   help="only process inputs X with a producer-written "
                        "X.complete marker (exact pickup for rsync/scp "
                        "deposits); default also accepts inputs whose "
                        "size+mtime are stable across two polls. A "
                        "marker always makes X ready immediately")
    p.add_argument("--batch_size", "-b", type=int, default=512)
    p.add_argument("--device_batch", type=int, default=None)
    p.add_argument("--transfer_dtype", type=str, default="auto",
                   choices=["auto", "float32", "float16", "int8"])
    p.add_argument("--dispatch_workers", type=int, default=8)
    p.add_argument("--packed_wire", type=str, default="auto",
                   choices=["auto", "force", "off"],
                   help="read-packed wire plane: auto keeps the on-device "
                        "window gather only where it saves wire bytes for "
                        "the mesh (converts to per-site windows on host "
                        "otherwise); force always gathers on device; off "
                        "always converts")
    p.add_argument("--gzip", action="store_true", default=False)
    p.add_argument("--nproc", "-p", type=int, default=4,
                   help="extraction workers for run-folder (fast5 dir) "
                        "inputs")
    p.add_argument("--f5_batch_size", type=int, default=30)
    _add_model_args(p, dropout_default=0.0, compute_dtype_default="auto")
    _add_f5_args(p)
    p.set_defaults(func=main_serve)

    # ---- call_freq ----
    p = subparsers.add_parser("call_freq",
                              description="calculate modification frequency "
                                          "at genome level")
    p.add_argument("--input_path", "-i", action="append", type=str,
                   required=True)
    p.add_argument("--file_uid", type=str, default=None)
    p.add_argument("--result_file", "-o", type=str, required=True)
    p.add_argument("--contigs", type=str, default=None)
    p.add_argument("--nproc", type=int, default=1)
    p.add_argument("--bed", action="store_true", default=False)
    p.add_argument("--sort", action="store_true", default=False)
    p.add_argument("--prob_cf", type=float, default=0.5)
    p.add_argument("--gzip", action="store_true", default=False)
    p.add_argument("--device_agg", action="store_true", default=False,
                   help="offload the per-block site sort + integer "
                        "segment sums to the accelerator (for "
                        "direct-attached chips on genome-scale runs); "
                        "output is byte-identical to the host path")
    p.add_argument("--pod_shard_inputs", type=str, default="auto",
                   choices=["auto", "always", "never"],
                   help="pod mode only: how to partition the input files "
                        "across hosts. auto (default) cross-checks the "
                        "per-host file lists over the collective and "
                        "shards only a shared list; always asserts a "
                        "shared filesystem; never asserts disjoint "
                        "per-host inputs")
    p.set_defaults(func=main_call_freq)

    # ---- train ----
    p = subparsers.add_parser("train", description="train a model")
    p.add_argument("--train_file", type=str, required=True)
    p.add_argument("--valid_file", type=str, required=True)
    p.add_argument("--model_dir", type=str, required=True)
    # auto = bf16 mixed precision on TPU (2.6x the f32 scan step; f32
    # master params/optimizer, f32 gate math in the kernels). Evidence
    # for defaulting it: identical best accuracy across seeds on both
    # the separable AND the 10%-label-noise fixtures, loss traces
    # matching to the 3rd decimal, grads within bf16 rounding of the
    # f32 truth (tests/test_pallas_vjp.py). --compute_dtype float32
    # restores exact f32 math.
    _add_model_args(p, dropout_default=0.5, compute_dtype_default="auto")
    p.add_argument("--optim_type", type=str, default="Adam",
                   choices=["Adam", "RMSprop", "SGD", "Ranger"])
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--lr_decay", type=float, default=0.1)
    p.add_argument("--lr_decay_step", type=int, default=2)
    p.add_argument("--max_epoch_num", type=int, default=10)
    p.add_argument("--min_epoch_num", type=int, default=5)
    p.add_argument("--step_interval", type=int, default=100)
    p.add_argument("--pos_weight", type=float, default=1.0)
    p.add_argument("--init_model", type=str, default=None)
    p.add_argument("--resume", action="store_true", default=False,
                   help="resume from the saved train state in --model_dir "
                        "(params + optimizer + epoch position)")
    p.add_argument("--stream", type=str, default="auto",
                   choices=["auto", "yes", "no"],
                   help="stream the training file in shuffled blocks "
                        "(bounded memory); auto streams files over 8GB")
    p.add_argument("--device_resident", type=str, default="auto",
                   choices=["auto", "never"],
                   help="auto: keep in-memory datasets resident in device "
                        "HBM and run step_interval steps per dispatch in "
                        "one compiled scan (single-device; no per-step "
                        "host->device input traffic)")
    p.add_argument("--tmpdir", type=str, default="/tmp")
    p.set_defaults(func=main_train)

    # ---- denoise ----
    p = subparsers.add_parser("denoise",
                              description="clean training samples by "
                                          "cross-rank")
    p.add_argument("--train_file", type=str, required=True)
    p.add_argument("--is_filter_fn", type=str, default="no")
    # denoise trains THROWAWAY filter models (up to 2*rounds*iterations
    # of them) whose only output is averaged probabilities against a
    # coarse threshold — bf16's ~1e-4 prob noise is immaterial there, so
    # auto (bf16 on TPU) is the default here as everywhere
    _add_model_args(p, dropout_default=0.5,
                    model_type_default="signal_bilstm",
                    compute_dtype_default="auto")
    p.add_argument("--pos_weight", type=float, default=1.0)
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--epoch_num", type=int, default=3)
    p.add_argument("--step_interval", type=int, default=100)
    p.add_argument("--iterations", type=int, default=10)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--score_cf", type=float, default=0.5)
    p.add_argument("--kept_ratio", type=float, default=0.99)
    p.add_argument("--fst_iter_prob", action="store_true", default=False)
    p.add_argument("--seed", type=int, default=None,
                   help="seed every random choice of the loop (half "
                        "splits, mini-training init, shuffles, k-mer-"
                        "balanced negative reselection) for a "
                        "reproducible denoise")
    p.add_argument("--device_resident", type=str, default="auto",
                   choices=["auto", "never"],
                   help="auto: mini-trainings run on the device-resident "
                        "plane (one dispatch per epoch) when the halves "
                        "fit HBM and are large enough to amortize the "
                        "scan compiles")
    p.set_defaults(func=main_denoise)

    # ---- tools ----
    from .tools import register_tools
    register_tools(subparsers)
    return parser


def main(argv=None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    from .utils.jaxinit import setup_jax
    setup_jax()
    from .parallel.dist import init_distributed
    init_distributed()  # no-op unless a multi-process env is configured
    if hasattr(args, "func"):
        args.func(args)
    else:
        parser.print_help()
    return 0


if __name__ == "__main__":
    sys.exit(main())
