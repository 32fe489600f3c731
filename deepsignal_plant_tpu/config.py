"""Typed configuration objects.

The reference spreads every hyperparameter across four argparse subparsers
with duplicated defaults (deepsignal_plant.py:231-251, 338-354, 400-416).
Here a single frozen dataclass is the source of truth; the CLI overlays it.
"""
from __future__ import annotations

from dataclasses import dataclass, replace

MODULE_TYPES = ("both_bilstm", "seq_bilstm", "signal_bilstm")


@dataclass(frozen=True)
class ModelConfig:
    """Hyperparameters of ModelBiLSTM (reference ctor models.py:103-106)."""
    seq_len: int = 13
    signal_len: int = 16
    num_layers_comb: int = 3      # reference --layernum1
    num_layers_branch: int = 1    # reference --layernum2
    num_classes: int = 2
    dropout_rate: float = 0.5
    hidden_size: int = 256
    vocab_size: int = 16
    embedding_size: int = 4
    is_base: bool = True
    is_signallen: bool = True
    module: str = "both_bilstm"
    compute_dtype: str = "float32"  # "float32" (parity) or "bfloat16" (fast)
    recurrence: str = "scan"        # "scan" | "pallas" (fused TPU kernels
                                    # with a custom-VJP backward)

    def __post_init__(self):
        if self.module not in MODULE_TYPES:
            raise ValueError(f"module must be one of {MODULE_TYPES}")
        if self.recurrence not in ("scan", "pallas"):
            raise ValueError("recurrence must be 'scan' or 'pallas' "
                             "(resolve 'auto' via "
                             "utils.jaxinit.resolve_recurrence first)")
        if self.compute_dtype not in ("float32", "bfloat16"):
            raise ValueError("compute_dtype must be 'float32' or "
                             "'bfloat16' (resolve 'auto' via "
                             "utils.jaxinit.resolve_compute_dtype first)")

    @property
    def nhid_seq(self) -> int:
        if self.module == "seq_bilstm":
            return self.hidden_size
        return self.hidden_size // 2

    @property
    def nhid_signal(self) -> int:
        if self.module == "signal_bilstm":
            return self.hidden_size
        return self.hidden_size - self.hidden_size // 2

    @property
    def sigfea_num(self) -> int:
        return 3 if self.is_signallen else 2

    @property
    def seq_input_size(self) -> int:
        base = self.embedding_size if self.is_base else 0
        return base + self.sigfea_num

    def with_(self, **kw) -> "ModelConfig":
        return replace(self, **kw)


@dataclass(frozen=True)
class CallConfig:
    """Inference-engine settings (reference CALL/PARALLEL arg groups)."""
    batch_size: int = 512
    # per-step padded device batch; large batches amortize per-dispatch
    # latency. None = auto: sized from the input so small files don't pay
    # full 32768-row padding
    device_batch: int | None = None
    f5_batch_size: int = 30
    num_parse_workers: int | None = None  # None = auto (cores, <=4)
    dispatch_workers: int = 16    # concurrent jit dispatches (overlaps
                                  # per-call transfer latency). Interleaved
                                  # sweeps on the remote-attached v5e:
                                  # 2->4 +45% (r2), 4->6 +38% with the
                                  # 4096 auto batch (r3), 6->8 +6% (r4).
                                  # r5: the fused kernels cut per-batch
                                  # compute 2.2x, so more in-flight
                                  # round trips pay again — 8->16
                                  # measured medians 191k->296k
                                  # (storm-noisy session; 24/32 within
                                  # noise of 16, benchmarks/
                                  # workers_ab.py round-5 sweeps).
    # wire format host->device: "float16" halves transfer bytes (the model
    # computes in compute_dtype regardless); "float32" for exact parity;
    # "int8" quantizes means/stds/signals with per-batch scales dequantized
    # on device (~1.8x fewer bytes again; native SIMD quantizer, measured
    # +37% median end-to-end on the remote-attached v5e at 100.000% call
    # agreement / <=1e-4 prob shift — see docs/BENCH.md). "auto" picks
    # int8 when the device link is remote-attached (axon platform, where
    # aggregate wire MB/s binds) and float16 on directly-attached
    # TPU/CPU backends (link is ~free; skip the quantization noise).
    transfer_dtype: str = "auto"
    # read-packed wire plane: "auto" keeps the on-device window gather
    # only while it saves wire bytes for the mesh (density <=
    # engine.packed_density_threshold(); on an n-device mesh the base
    # arrays replicate, so the threshold tightens to seq_len/n) and
    # converts packed inputs to per-site windows on host otherwise;
    # "force" always gathers on device; "off" always converts.
    packed_wire: str = "auto"
    # device-resident inference plane: "always" uploads each
    # K*device_batch-row segment to HBM once and runs it in one compiled
    # lax.scan dispatch (no per-batch wire; measures the chip-bound
    # ceiling). "never" (default) keeps the streaming engine. Outputs
    # are byte-identical to streaming at float16/float32 transfer; the
    # resident plane resolves int8 (remote auto) to f16, so probs vs an
    # int8 streaming run differ in the 6th decimal.
    device_resident: str = "never"

    def __post_init__(self):
        if self.transfer_dtype not in ("auto", "float32", "float16",
                                       "int8"):
            raise ValueError(
                "transfer_dtype must be auto|float32|float16|int8")
        if self.packed_wire not in ("auto", "force", "off"):
            raise ValueError("packed_wire must be auto|force|off")
        if self.device_resident not in ("never", "always"):
            raise ValueError("device_resident must be never|always")
        if self.dispatch_workers < 1:
            raise ValueError("dispatch_workers must be >= 1")
        if self.device_batch is not None and self.device_batch < 1:
            raise ValueError("device_batch must be >= 1 (or None = auto)")


@dataclass(frozen=True)
class TrainConfig:
    """Training-loop settings (reference train.py main args)."""
    batch_size: int = 512
    lr: float = 0.001
    lr_decay: float = 0.1
    lr_decay_step: int = 2
    max_epoch_num: int = 10
    min_epoch_num: int = 5
    step_interval: int = 100
    pos_weight: float = 1.0
    optim_type: str = "Adam"      # Adam | RMSprop | SGD | Ranger
    clip_grad: float = 0.5
    seed: int = 1234
    #: "auto": single-device in-memory datasets are uploaded to HBM once
    #: and `step_interval` steps run per dispatch in one jitted scan
    #: (no per-step host->device input traffic); "never" disables
    device_resident: str = "auto"


def model_config_from_args(args, *, dropout_rate: float,
                           allow_multi_device: bool = False,
                           ) -> ModelConfig:
    """One ModelConfig construction for all four CLI entry points
    (call_mods, serve, train, denoise) — per-site duplication had
    already drifted once (serve's stale dispatch_workers fallback)."""
    from .utils.bases import str2bool
    from .utils.jaxinit import resolve_compute_dtype, resolve_recurrence
    return ModelConfig(
        seq_len=args.seq_len, signal_len=args.signal_len,
        num_layers_comb=args.layernum1, num_layers_branch=args.layernum2,
        num_classes=args.class_num, dropout_rate=dropout_rate,
        hidden_size=args.hid_rnn, vocab_size=args.n_vocab,
        embedding_size=args.n_embed, is_base=str2bool(args.is_base),
        is_signallen=str2bool(args.is_signallen), module=args.model_type,
        compute_dtype=resolve_compute_dtype(
            getattr(args, "compute_dtype", "auto")),
        recurrence=resolve_recurrence(
            getattr(args, "recurrence", "auto"),
            allow_multi_device=allow_multi_device))


def call_config_from_args(args) -> CallConfig:
    """One CallConfig construction for call_mods and serve. Field
    fallbacks are the dataclass defaults, so a retuned default can never
    silently diverge between entry points again."""
    return CallConfig(
        batch_size=args.batch_size,
        device_batch=getattr(args, "device_batch", None),
        f5_batch_size=getattr(args, "f5_batch_size",
                              CallConfig.f5_batch_size),
        num_parse_workers=getattr(args, "parse_workers", None),
        dispatch_workers=getattr(args, "dispatch_workers",
                                 CallConfig.dispatch_workers),
        transfer_dtype=getattr(args, "transfer_dtype", "auto"),
        packed_wire=getattr(args, "packed_wire", "auto"),
        device_resident=getattr(args, "device_resident", "never"))
