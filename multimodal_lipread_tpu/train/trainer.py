"""Generic data-parallel trainer for every pipeline.

One Trainer replaces the reference's seven copy-pasted train.py epoch loops
(reference: audio/train.py:59-197, video/train.py:85-285,
audio_video/train.py:57-160, audio_cues/train.py:65-179,
cues_video/train.py:86-237, audio_cues_video/train.py:52-212), reproducing
their observable behavior:

- Adam with torch-style L2 weight decay (decay added to the gradient BEFORE
  the Adam moments, like ``torch.optim.Adam(weight_decay=...)``)
- ReduceLROnPlateau on val loss (mode='min') or val acc (mode='max')
- per-epoch CSV + TXT metric logs (7-column schema, ``Final Test`` footer)
- best-val-accuracy checkpoint; optional rolling per-epoch checkpoint with
  resume; final test runs on the RELOADED best checkpoint
- optional class-weighted cross entropy (reference:
  cues/models/minilm_models/dense.py:198-201)

Deliberate divergence: epoch losses here are EXACT per-example means. The
reference's audio/video/audio_video trainers log mean-of-batch-means
(e.g. audio/train.py:105 total_loss/len(dataloader)) over SHUFFLED val
loaders, which over-weights the short final batch by a per-epoch-random
factor; reproducing that would add noise to the plateau scheduler's input
for no benefit. Accuracies are unaffected; loss columns can differ from
reference logs in the last decimal places, and LR-reduction epochs can
shift by the same noise the reference itself exhibits across reruns.

TPU-first design (not in the reference):

- the whole dataset is preprocessed to fixed-shape arrays up front, so the
  hot loop is pure device compute — no per-epoch feature recomputation in
  loader workers (SURVEY.md §3.1 bottleneck)
- every batch is padded to one static shape and sharded over a 1-D
  ``jax.sharding.Mesh`` (`P('data')`); parameters are replicated; XLA inserts
  the gradient ``psum`` over ICI
- one ``jax.jit``-compiled train step (donated state) and eval step for the
  entire run; the learning rate is an ``optax.inject_hyperparams`` leaf, so
  plateau reductions never recompile
- per-example correctness/loss are computed on device and reduced once per
  batch; only two scalars cross back to the host
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.core import FrozenDict

from multimodal_lipread_tpu.parallel.mesh import batch_sharding, get_mesh, replicate
from multimodal_lipread_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from multimodal_lipread_tpu.train.schedule import ReduceLROnPlateau
from multimodal_lipread_tpu.utils.metrics_log import MetricLogger


@dataclasses.dataclass
class ArrayDataset:
    """A fully-materialized dataset: tuple of input arrays + integer labels.

    All arrays share the leading (example) axis. This is the post-preprocessing
    contract every pipeline lowers its data to before training.
    """

    inputs: Tuple[np.ndarray, ...]
    labels: np.ndarray

    def __post_init__(self):
        n = len(self.labels)
        for a in self.inputs:
            assert a.shape[0] == n, f"input leading dim {a.shape[0]} != {n}"

    def __len__(self) -> int:
        return len(self.labels)


@dataclasses.dataclass
class TrainerConfig:
    model_name: str
    num_classes: int
    batch_size: int = 32
    epochs: int = 10
    learning_rate: float = 5e-4
    weight_decay: float = 1e-4
    scheduler_mode: str = "min"  # 'min' → val loss, 'max' → val acc
    scheduler_factor: float = 0.5
    scheduler_patience: int = 5
    min_lr: float = 0.0
    # 'plateau' (ReduceLROnPlateau per epoch) or 'linear_warmup' (per-STEP
    # torch get_linear_schedule_with_warmup semantics — ramps 0→lr over
    # warmup_proportion of total steps, then decays linearly to 0; reference:
    # cues/models/minilm_models/cnn_lstm.py:177-178,199)
    lr_schedule: str = "plateau"
    warmup_proportion: float = 0.1
    # multiplicative LR ramp over the first `warmup_epochs` epochs, composed
    # ON TOP of the plateau schedule (per-step: lr = scheduler.lr *
    # min(1, step/warmup_steps)). The reference has no warmup; this is the
    # documented optimization-stability divergence that keeps aggressive
    # family LRs (e.g. audio_cues' 1e-3, ac_config.yaml:14) from killing
    # ReLU6 encoders in the first Adam steps (ZOO.md round-3 footnote).
    # 0 disables (reference semantics). Ignored under lr_schedule=
    # 'linear_warmup', which has its own ramp.
    warmup_epochs: float = 0.0
    seed: int = 0
    metrics_dir: str = "metrics"
    checkpoints_dir: str = "models_trained"
    log_columns: str = "full"  # 'full' or 'train_val'
    # pre-create the TXT log with the reference's "Training Log" banner
    # (video/cues_video/triple trainers only)
    log_txt_header: bool = False
    test_every_epoch: bool = True
    rolling_checkpoint: bool = False
    class_weights: Optional[np.ndarray] = None
    half_precision: bool = False  # cast inputs to bf16 before the model
    profile_dir: Optional[str] = None  # write a jax.profiler trace of epoch 1
    mixup_alpha: float = 0.0  # >0 enables batch mixup (full batches only)
    remat: bool = False  # jax.checkpoint the forward: trade FLOPs for HBM
    # 'msgpack' (single file), 'orbax' (sharded dir), or 'orbax_async'
    # (orbax with background writes overlapping the next epoch; fit() waits
    # for all in-flight saves before returning)
    checkpoint_backend: str = "msgpack"
    # keep ArrayDatasets resident on device (replicated) and gather each
    # batch ON DEVICE by index — the per-step host→device traffic drops from
    # the full batch (e.g. 11 MB of lips at batch 64) to a few KB of indices.
    # Only for datasets that fit in HBM; streaming covers the rest.
    device_resident: bool = False
    # param-path prefixes excluded from ALL optimizer updates (weight decay
    # included) — torch requires_grad=False semantics for frozen encoders
    frozen_param_prefixes: Tuple[Tuple[str, ...], ...] = ()
    # tensor parallelism (opt-in): (path regex, PartitionSpec axis tuple)
    # rules sharding parameters — and, because optax moments mirror the
    # param tree, the Adam state — over the mesh's 'model' axis. Pass a
    # 2-D mesh from parallel.mesh.get_mesh_2d alongside. Empty = pure DP
    # with replicated params (the default; the reference families are far
    # below TP scale — BERT fine-tune is the exception, models/bert.py
    # ships BERT_TP_RULES).
    param_partition_rules: Tuple[Tuple[str, Tuple[Optional[str], ...]], ...] = ()
    # run batch PREPARATION (host decode, padding, the device_put H2D copy)
    # in a side thread, up to this many batches ahead of the consuming step
    # loop. The step dispatch itself is already async, but on hosts where
    # device_put blocks on the transfer (tunneled devices, multi-host
    # assembly) the inline generator serializes batch k+1's copy behind
    # step k; a bounded FIFO restores the overlap without changing batch
    # order (trajectories stay bit-identical). 0 disables.
    host_prefetch: int = 2
    # PRNG implementation for the per-step dropout/mixup stream. 'rbg'
    # (default) uses the TPU's hardware RngBitGenerator — measured 2.26×
    # faster train steps on the dropout-dense conformer (11.32 → 5.01 ms;
    # docs/PERFORMANCE.md "MFU attribution: audio conformer"), because
    # threefry2x32 computes ~32 VPU ops per random bit while rbg streams
    # bits at hardware rate. This matches the reference's effective
    # semantics (torch dropout uses curand's hardware Philox generator,
    # not a pure-function PRNG). 'threefry2x32' is the opt-in for strict
    # bit-identical masks across backends/XLA versions; both choices give
    # reproducible trajectories for a fixed seed on a fixed stack.
    dropout_rng_impl: str = "rbg"
    # fuse K consecutive train/eval steps into ONE compiled dispatch via
    # ``lax.scan`` (device_resident ArrayDatasets only): the per-step host
    # dispatch — the dominant cost for small compiled steps on a tunneled
    # chip (measured: the cached-frozen-feature tail, experiments/
    # frozen_cache_bench.py) — is paid once per K batches instead of per
    # batch. Trajectory-identical to K sequential steps: the scan body IS
    # the train step (same per-step rng fold on state['step'], same order).
    # Leftover batches (< K at the epoch tail) run per-step. Incompatible
    # with per-STEP LR schedules (linear_warmup) — those fall back to the
    # per-step path. 1 disables.
    steps_per_dispatch: int = 1
    # DEVICE-SIDE input preprocessing (opt-in): a jit-traceable callable
    # ``(*inputs) -> tuple(inputs)`` applied inside the compiled train/eval
    # steps BEFORE the uint8 cast/normalize. This is the hook for the
    # north-star "host video-decode stage feeding device-side
    # crop/resize/normalize kernels" layout: the host ships full decoded
    # uint8 frames + int32 lip boxes, and ops/crop_resize.crop_resize_pad
    # runs fused with the model's forward (the reference crops per frame in
    # host cv2: /root/reference/video/data_utils/visual_preprocessing.py:111-162).
    device_preproc: Optional[Callable[..., tuple]] = None
    # catch SIGTERM/SIGINT during fit(): finish the in-flight batch, write
    # the rolling checkpoint (attributed to the last COMPLETED epoch, so a
    # --resume replays the interrupted epoch), and return with
    # result["preempted"]=True instead of dying mid-step — the preemption
    # story a TPU-pod job needs. (The reference has none; a killed run
    # restarts from its last best-val save at unknown epoch.)
    handle_preemption: bool = False


@dataclasses.dataclass
class EpochMetrics:
    loss: float
    acc: float  # percent, like the reference logs


def _host_prefetch_iter(it, depth: int):
    """Drain a batch iterator from a daemon thread, ``depth`` items ahead.

    Keeps host-side batch preparation (streaming decode, weight-0 padding,
    the H2D ``device_put``) off the step loop's critical path: while the
    device executes step k, the producer thread is already preparing and
    copying batches k+1..k+depth. The bounded queue is the backpressure —
    at most ``depth`` extra batches hold host/device memory. FIFO order is
    preserved, so the training trajectory is identical to the inline path.

    Producer exceptions re-raise in the consumer; an early consumer exit
    (preemption break) stops the producer via the ``finally`` close.
    """
    if depth <= 0:
        yield from it
        return
    import queue as queue_mod
    import threading

    q: Any = queue_mod.Queue(maxsize=depth)
    stop = threading.Event()
    end = object()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.25)
                return True
            except queue_mod.Full:
                continue
        return False

    def _produce():
        try:
            for item in it:
                if not _put(item):
                    return
            tail: Any = end
        except BaseException as e:  # noqa: BLE001 — delivered to the consumer
            tail = e
        _put(tail)

    t = threading.Thread(target=_produce, name="mlt-host-prefetch", daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is end:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        t.join(timeout=5.0)


class _AsyncMetrics:
    """Per-batch metric accumulator with a bounded fetch lookahead.

    ``float(device_scalar)`` after every step makes the host WAIT for that
    step — serializing the next batch's host→device copy behind the current
    step's compute. Holding the device scalars in a small window and
    fetching them ``depth`` steps late keeps the host dispatching ahead (the
    H2D copy of batch k+1 overlaps step k on device) while still providing
    backpressure: at most ``depth`` in-flight batches hold HBM.
    """

    def __init__(self, depth: int = 2):
        from collections import deque

        self.depth = depth
        self.pending: Any = deque()
        self.loss_sum = 0.0
        self.correct = 0.0
        self.count = 0.0
        self.wsum = 0.0

    def push(self, l, c, n, w) -> None:
        self.pending.append((l, c, n, w))
        if len(self.pending) > self.depth:
            self._drain_one()

    def _drain_one(self) -> None:
        l, c, n, w = self.pending.popleft()
        self.loss_sum += float(l)
        self.correct += float(c)
        self.count += float(n)
        self.wsum += float(w)

    def result(self) -> EpochMetrics:
        while self.pending:
            self._drain_one()
        return EpochMetrics(
            loss=self.loss_sum / max(self.wsum, 1e-9),
            acc=100.0 * self.correct / max(self.count, 1),
        )


def _enable_compile_cache() -> None:
    """Point XLA's persistent compilation cache at a user-level directory.

    Train-step compiles of the video models cost minutes; repeat runs with
    unchanged shapes should pay them once. Respects an explicit user setting,
    and ``MLT_COMPILE_CACHE`` overrides the location (empty string disables).
    """
    import jax

    # getattr: on a jax without the knob this must be a no-op, not a crash
    if getattr(jax.config, "jax_compilation_cache_dir", None) is not None:
        return  # user already configured one
    path = os.environ.get(
        "MLT_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "multimodal_lipread_tpu", "xla"),
    )
    if not path:
        return
    try:
        # Segregate by backend platform: a TPU-session process can cache
        # host-CPU AOT entries compiled on the REMOTE compile helper's
        # machine, whose vector features a plain-CPU process on this host
        # may not support (observed XLA 'could lead to SIGILL' warning when
        # sharing one directory across axon and cpu processes).
        path = f"{path}-{jax.default_backend()}"
        if jax.default_backend() == "cpu":
            # XLA:CPU AOT results embed the COMPILING host's vector features
            # (avx512/amx/prefer-no-gather...) and the persistent-cache key
            # does not; loading them on a lesser host risks SIGILL (XLA only
            # warns). Sessions of this project migrate between hosts, so key
            # the CPU cache by the host's own feature set.
            import hashlib

            try:
                with open("/proc/cpuinfo") as f:
                    flags = next(
                        (l for l in f if l.startswith("flags")), ""
                    )
            except OSError:
                flags = ""
            path = f"{path}-{hashlib.sha1(flags.encode()).hexdigest()[:8]}"
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # older jax without the knob: compile-cache is an optimization only


class Trainer:
    """Data-parallel trainer over a 1-D device mesh."""

    def __init__(
        self,
        model: Any,
        config: TrainerConfig,
        mesh: Optional[Any] = None,
        apply_train_kwargs: Optional[Dict[str, Any]] = None,
    ):
        _enable_compile_cache()
        self.model = model
        self.config = config
        self.mesh = mesh if mesh is not None else get_mesh()
        self.n_devices = self.mesh.devices.size
        # pad the per-step batch so it shards evenly over the mesh
        bs = config.batch_size
        self.batch_size = ((bs + self.n_devices - 1) // self.n_devices) * self.n_devices
        self._batch_sharding = batch_sharding(self.mesh)
        self._apply_train_kwargs = apply_train_kwargs or {}
        self._compiled = False
        self._preempted = False
        self.state: Optional[Dict[str, Any]] = None
        self.scheduler = ReduceLROnPlateau(
            config.learning_rate,
            mode=config.scheduler_mode,
            factor=config.scheduler_factor,
            patience=config.scheduler_patience,
            min_lr=config.min_lr,
        )
        self.logger = MetricLogger(config.metrics_dir, config.model_name,
                                   columns=config.log_columns,
                                   txt_header=config.log_txt_header)
        cw = config.class_weights
        self._class_weights = None if cw is None else jnp.asarray(cw, jnp.float32)
        # per-step LR function, built in fit() once total steps are known
        self._lr_step_fn: Optional[Callable[[int], float]] = None
        self._global_step = 0
        # host-side mirror of the injected LR leaf: lets _set_lr skip the
        # per-step device_put once a warmup ramp has saturated (None =
        # unknown, e.g. right after init/restore replaced opt_state)
        self._current_lr: Optional[float] = None

    # ------------------------------------------------------------------ setup

    def _make_tx(self) -> optax.GradientTransformation:
        frozen = tuple(tuple(p) for p in self.config.frozen_param_prefixes)

        def trainable_mask(params):
            def rec(tree, path):
                if isinstance(tree, dict) or hasattr(tree, "items"):
                    return {k: rec(v, path + (k,)) for k, v in tree.items()}
                return not any(path[: len(p)] == p for p in frozen)

            return rec(params, ())

        def label_fn(params):
            # 'train' / 'frozen' labels per leaf for optax.multi_transform
            mask = trainable_mask(params)
            return jax.tree_util.tree_map(lambda m: "train" if m else "frozen", mask)

        def tx_fn(learning_rate):
            base = optax.chain(
                optax.add_decayed_weights(self.config.weight_decay),
                optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
                optax.scale(-learning_rate),
            )
            if not frozen:
                return base
            # frozen subtrees get a LITERAL zero update (decay included) —
            # torch requires_grad=False semantics. NOTE: optax.masked would
            # pass the RAW gradient through for masked-out leaves (ascent!),
            # so multi_transform with set_to_zero is required here.
            return optax.multi_transform(
                {"train": base, "frozen": optax.set_to_zero()}, label_fn
            )

        return optax.inject_hyperparams(tx_fn)(learning_rate=self.config.learning_rate)

    def _dropout_rng(self, seed: int):
        """Key for the per-step dropout/mixup stream (config.dropout_rng_impl).

        Parameter INIT stays on threefry (init_state) — init draws are tiny
        and keeping them impl-independent means switching dropout_rng_impl
        never changes a model's starting point.
        """
        impl = self.config.dropout_rng_impl
        if impl == "threefry2x32":
            return jax.random.PRNGKey(seed)
        return jax.random.key(seed, impl=impl)

    def init_state(self, example_inputs: Sequence[np.ndarray]) -> Dict[str, Any]:
        """Initialize parameters/optimizer; replicate over the mesh."""
        rng = jax.random.PRNGKey(self.config.seed)

        def init_cast(x):
            # mirror the train-step cast: uint8 inputs are device-normalized,
            # int16 waveforms device-cast to f32
            if x.dtype == jnp.uint8:
                return x.astype(jnp.float32) / 255.0
            if x.dtype == jnp.int16:
                return x.astype(jnp.float32)
            return x

        rows = self.n_devices
        if "stage" in getattr(self.mesh, "axis_names", ()):
            # pipeline-parallel models microbatch the batch axis inside
            # their forward — the init trace needs a REAL batch (per-shard
            # rows divisible by num_microbatches), not n_devices rows
            rows = max(rows, self.config.batch_size)

        def take(a):
            a = np.asarray(a)
            if a.shape[0] >= rows:
                return a[:rows]
            reps = -(-rows // a.shape[0])
            return np.concatenate([a] * reps)[:rows]

        dummy = tuple(jnp.asarray(take(a)) for a in example_inputs)
        if self.config.device_preproc is not None:
            # the model only ever sees preprocessed inputs (e.g. full frames
            # + boxes → cropped lips), at init exactly like in the steps
            dummy = tuple(self.config.device_preproc(*dummy))
        dummy = tuple(init_cast(x) for x in dummy)
        variables = self.model.init(
            {"params": rng, "dropout": rng}, *dummy, train=False, **self._apply_train_kwargs
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict({}))
        tx = self._make_tx()
        opt_state = tx.init(params)
        state = {
            "params": params,
            "batch_stats": batch_stats,
            "opt_state": opt_state,
            "step": jnp.zeros((), jnp.int32),
        }
        self._tx = tx
        self.state = self._place(state)
        self._current_lr = float(self.config.learning_rate)  # tx.init's leaf
        return self.state

    def _place(self, state: Dict[str, Any]) -> Dict[str, Any]:
        """Put a host-side state tree on the mesh: replicated (pure DP) or
        per-leaf rule-sharded (tensor parallel)."""
        rules = self.config.param_partition_rules
        if not rules:
            return replicate(self.mesh, state)
        from multimodal_lipread_tpu.parallel.mesh import place_state

        return place_state(self.mesh, state, rules)

    def ensure_initialized(self, ds: Any) -> None:
        """Initialize parameters from a dataset's input template if needed.

        Works for both ArrayDataset (materialized) and StreamingDataset
        (grain-backed) — pipelines call this before pretrained grafting.
        """
        if self.state is not None:
            return
        if isinstance(ds, ArrayDataset):
            self.init_state(ds.inputs)
        else:
            self.init_state(ds.example_inputs(self.n_devices))

    def set_apply_kwargs(self, **kwargs) -> None:
        """Update the extra kwargs passed to every ``model.apply`` (e.g.
        ``cached_features=True`` after frozen-feature precomputation).

        Must be called before the step functions compile — typically after
        ``init_state``/pretrained loading and before ``fit``.
        """
        if self._compiled:
            raise RuntimeError(
                "set_apply_kwargs after the step functions compiled — the "
                "change would silently not apply"
            )
        self._apply_train_kwargs.update(kwargs)

    # ------------------------------------------------------------ step fns

    def _build_steps(self):
        model = self.model
        tx = self._tx
        class_weights = self._class_weights
        half = self.config.half_precision

        def cast(x):
            # uint8 inputs (e.g. lip regions) cross the host→device boundary
            # at 1/4 the bytes and are scaled to [0,1] ON DEVICE — the
            # "device-side normalize" stage of the lip pipeline
            if x.dtype == jnp.uint8:
                x = x.astype(jnp.bfloat16 if half else jnp.float32) / 255.0
            elif x.dtype == jnp.int16:
                # PCM16 waveforms ship as int16 (half the H2D bytes); models
                # see the same int16-amplitude f32 the decoders produce
                # (data/audio_io.py:44 — no /32768 scaling there either)
                x = x.astype(jnp.bfloat16 if half else jnp.float32)
            elif half and jnp.issubdtype(x.dtype, jnp.floating):
                x = x.astype(jnp.bfloat16)
            return x

        device_preproc = self.config.device_preproc

        def prepare(inputs):
            # device-side preproc (e.g. lip crop/resize/pad from full
            # frames+boxes) runs INSIDE the compiled step, fused with the
            # normalize cast and the model's forward
            if device_preproc is not None:
                inputs = tuple(device_preproc(*inputs))
            return tuple(cast(x) for x in inputs)
        extra = self._apply_train_kwargs

        def per_example_weight(labels, weights):
            if class_weights is None:
                return weights
            return weights * class_weights[labels]

        use_remat = self.config.remat

        def forward(params, batch_stats, inputs, train, rngs):
            variables = {"params": params, "batch_stats": batch_stats}
            if train:
                def fwd(variables, *inputs):
                    return model.apply(
                        variables, *inputs, train=True, mutable=["batch_stats"],
                        rngs=rngs, **extra,
                    )

                if use_remat:
                    # rematerialize activations in backward: HBM for FLOPs
                    fwd = jax.checkpoint(fwd)
                logits, mutated = fwd(variables, *inputs)
                return logits, mutated.get("batch_stats", batch_stats)
            logits = model.apply(variables, *inputs, train=False, **extra)
            return logits, batch_stats

        mixup_alpha = self.config.mixup_alpha
        num_classes = self.config.num_classes

        # under tensor parallelism, pin the updated params/opt_state to the
        # rule shardings — GSPMD would almost always propagate them anyway,
        # but the constraint makes "params stay 'model'-sharded across steps"
        # a compiler invariant rather than a heuristic outcome. (params and
        # opt_state only: the model.apply-returned batch_stats container type
        # can differ from the state's — FrozenDict vs dict — and an empty-BN
        # model would fail the whole-tree prefix match.)
        tp_shardings = None
        if self.config.param_partition_rules and self.state is not None:
            tp_shardings = (
                jax.tree_util.tree_map(lambda a: a.sharding, self.state["params"]),
                jax.tree_util.tree_map(lambda a: a.sharding, self.state["opt_state"]),
            )

        def train_step(state, inputs, labels, weights, rng):
            inputs = prepare(inputs)
            step_rng = jax.random.fold_in(rng, state["step"])
            w = per_example_weight(labels, weights)
            denom = jnp.maximum(jnp.sum(w), 1e-9)

            soft_labels = None
            if mixup_alpha > 0:
                from multimodal_lipread_tpu.data.augment import mixup

                mix_rng = jax.random.fold_in(step_rng, 1)
                onehot = jax.nn.one_hot(labels, num_classes)
                mixed_inputs, mixed_onehot = mixup(mix_rng, inputs, onehot, mixup_alpha)
                # only mix full batches: a padded (weight-0) row mixed into a
                # real row would corrupt its inputs and label
                full = jnp.sum(weights) == weights.shape[0]
                inputs = tuple(jnp.where(full, m, x) for m, x in zip(mixed_inputs, inputs))
                soft_labels = jnp.where(full, mixed_onehot, onehot)

            def loss_fn(params):
                logits, new_bs = forward(
                    params, state["batch_stats"], inputs, True, {"dropout": step_rng}
                )
                logits = logits.astype(jnp.float32)
                if soft_labels is not None:
                    ce = optax.softmax_cross_entropy(logits, soft_labels)
                else:
                    ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
                loss = jnp.sum(ce * w) / denom
                return loss, (logits, new_bs)

            (loss, (logits, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state["params"]
            )
            updates, new_opt = tx.update(grads, state["opt_state"], state["params"])
            new_params = optax.apply_updates(state["params"], updates)
            correct = jnp.sum((jnp.argmax(logits, -1) == labels) * weights)
            n = jnp.sum(weights)
            if tp_shardings is not None:
                new_params = jax.lax.with_sharding_constraint(new_params, tp_shardings[0])
                new_opt = jax.lax.with_sharding_constraint(new_opt, tp_shardings[1])
            new_state = {
                "params": new_params,
                "batch_stats": new_bs,
                "opt_state": new_opt,
                "step": state["step"] + 1,
            }
            return new_state, loss * jnp.sum(w), correct, n, jnp.sum(w)

        def eval_step(params, batch_stats, inputs, labels, weights):
            inputs = prepare(inputs)
            logits, _ = forward(params, batch_stats, inputs, False, None)
            logits = logits.astype(jnp.float32)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            w = per_example_weight(labels, weights)
            loss_sum = jnp.sum(ce * w)
            correct = jnp.sum((jnp.argmax(logits, -1) == labels) * weights)
            return loss_sum, correct, jnp.sum(weights), jnp.sum(w)

        batch_shard = self._batch_sharding

        def gather(data, labels_all, idx):
            # replicated data + P('data')-sharded idx → each chip gathers its
            # own batch rows locally; constrain the output so GSPMD never
            # materializes an unsharded batch
            inputs = tuple(
                jax.lax.with_sharding_constraint(jnp.take(d, idx, axis=0), batch_shard)
                for d in data
            )
            labels = jax.lax.with_sharding_constraint(
                jnp.take(labels_all, idx, axis=0), batch_shard
            )
            return inputs, labels

        def train_step_idx(state, data, labels_all, idx, weights, rng):
            inputs, labels = gather(data, labels_all, idx)
            return train_step(state, inputs, labels, weights, rng)

        def eval_step_idx(params, batch_stats, data, labels_all, idx, weights):
            inputs, labels = gather(data, labels_all, idx)
            return eval_step(params, batch_stats, inputs, labels, weights)

        # Pipeline-parallel mesh: the generic jit step would let GSPMD's
        # data-axis grad all-reduces race the stage-axis ppermutes (XLA:CPU
        # in-process rendezvous deadlock — round-4 lane crash). Swap in the
        # single-shard_map step with totally ordered collectives; eval is
        # forward-only (its data-axis reductions depend on the pipeline
        # output, so they are already ordered) and stays on the jit path.
        pp_active = (
            "stage" in getattr(self.mesh, "axis_names", ())
            and dict(zip(self.mesh.axis_names, self.mesh.devices.shape))["stage"] > 1
        )
        if pp_active:
            from multimodal_lipread_tpu.parallel.pipeline import build_pp_train_step

            if mixup_alpha > 0:
                raise NotImplementedError("mixup is not supported with pipeline parallelism")
            if use_remat:
                raise NotImplementedError("remat is not supported with pipeline parallelism")
            if device_preproc is not None:
                raise NotImplementedError(
                    "device_preproc is not supported with pipeline parallelism"
                )
            if jax.tree_util.tree_leaves(self.state["batch_stats"]):
                raise NotImplementedError(
                    "BatchNorm models are not supported with pipeline parallelism"
                )
            pp_step = build_pp_train_step(
                model, tx, self.mesh, self.state,
                extra_kwargs=extra, class_weights=class_weights,
                half_precision=half,
            )

            def pp_step_idx(state, data, labels_all, idx, weights, rng):
                inputs, labels = gather(data, labels_all, idx)
                return pp_step(state, inputs, labels, weights, rng)

            train_step, train_step_idx = pp_step, pp_step_idx

        self._train_step = jax.jit(train_step, donate_argnums=(0,))
        self._eval_step = jax.jit(eval_step)
        self._train_step_idx = jax.jit(train_step_idx, donate_argnums=(0,))
        self._eval_step_idx = jax.jit(eval_step_idx)

        # multi-step-per-dispatch (steps_per_dispatch > 1): scan the idx
        # step over K stacked (idx, weights) batches — one XLA program per
        # K optimizer steps. Built on the FINAL step fns, so it composes
        # with TP/device_preproc; PP's shard_map step is excluded (its
        # collective ordering contract is per-dispatch).
        self._train_scan = self._eval_scan = None
        if self.config.steps_per_dispatch > 1 and not pp_active:

            def train_steps_scan(state, data, labels_all, idxs, weightss, rng):
                def body(st, xw):
                    new, l, c, n, w = train_step_idx(st, data, labels_all, xw[0], xw[1], rng)
                    if isinstance(st["batch_stats"], FrozenDict) and not isinstance(
                        new["batch_stats"], FrozenDict
                    ):
                        # flax mutable() hands back a plain dict where the
                        # carry holds a FrozenDict (empty-BN models) — the
                        # scan carry pytree must stay fixed
                        new = {**new, "batch_stats": FrozenDict(new["batch_stats"])}
                    return new, (l, c, n, w)

                state, ms = jax.lax.scan(body, state, (idxs, weightss))
                return state, ms

            def eval_steps_scan(params, batch_stats, data, labels_all, idxs, weightss):
                def body(carry, xw):
                    return carry, eval_step_idx(
                        params, batch_stats, data, labels_all, xw[0], xw[1]
                    )

                _, ms = jax.lax.scan(body, 0, (idxs, weightss))
                return ms

            self._train_scan = jax.jit(train_steps_scan, donate_argnums=(0,))
            self._eval_scan = jax.jit(eval_steps_scan)
        self._compiled = True

    # ------------------------------------------------------------ batching

    def _device_dataset(self, ds: ArrayDataset):
        """Place a dataset on device once, replicated over the mesh.

        The cache holds a strong reference to each dataset and verifies it
        by identity — ``id()`` alone can be recycled by the allocator after
        a dataset is garbage-collected, which would silently serve a stale
        device copy. Bounded to the run's train/val/test trio: inserting a
        4th dataset evicts the oldest (frees its HBM replica).
        """
        if not hasattr(self, "_device_data_cache"):
            self._device_data_cache: Dict[int, Any] = {}
        entry = self._device_data_cache.get(id(ds))
        if entry is None or entry[0] is not ds:
            data = tuple(replicate(self.mesh, jnp.asarray(a)) for a in ds.inputs)
            labels = replicate(self.mesh, jnp.asarray(ds.labels.astype(np.int32)))
            entry = (ds, (data, labels))
            self._device_data_cache[id(ds)] = entry
            while len(self._device_data_cache) > 3:
                self._device_data_cache.pop(next(iter(self._device_data_cache)))
        return entry[1]

    def _index_batches_host(self, ds: ArrayDataset, shuffle: bool, rng: np.random.Generator):
        """Yield (idx, weights) numpy batches for the device-resident path.

        Same pad-with-real-rows-at-weight-0 contract as ``_batches``; only
        int32 indices and float32 weights ever cross host→device.
        """
        n = len(ds)
        order = rng.permutation(n) if shuffle else np.arange(n)
        bs = self.batch_size
        for start in range(0, n, bs):
            idx = order[start : start + bs]
            k = len(idx)
            weights = np.zeros((bs,), np.float32)
            weights[:k] = 1.0
            if k < bs:
                fill = order[: bs - k] if n >= bs else np.resize(order, bs - k)
                idx = np.concatenate([idx, fill.astype(idx.dtype)])
            yield idx.astype(np.int32), weights

    def _index_batches(self, ds: ArrayDataset, shuffle: bool, rng: np.random.Generator):
        for idx, weights in self._index_batches_host(ds, shuffle, rng):
            yield (
                jax.device_put(idx, self._batch_sharding),
                jax.device_put(weights, self._batch_sharding),
            )

    def _index_groups(self, ds: ArrayDataset, shuffle: bool, rng: np.random.Generator):
        """Group K=steps_per_dispatch index batches into stacked (K, bs)
        device arrays for the scan step; a final group smaller than K is
        yielded as ``('tail', [per-batch device pairs])`` so the caller
        runs it per-step (padding the scan with weight-0 batches would
        still advance Adam moments/weight decay and fork the trajectory).
        """
        from jax.sharding import NamedSharding, PartitionSpec as P

        k = self.config.steps_per_dispatch
        sh = NamedSharding(self.mesh, P(None, "data"))
        buf = []
        for pair in self._index_batches_host(ds, shuffle, rng):
            buf.append(pair)
            if len(buf) == k:
                yield (
                    "scan",
                    (
                        jax.device_put(np.stack([b[0] for b in buf]), sh),
                        jax.device_put(np.stack([b[1] for b in buf]), sh),
                    ),
                )
                buf = []
        if buf:
            yield (
                "tail",
                [
                    (
                        jax.device_put(i, self._batch_sharding),
                        jax.device_put(w, self._batch_sharding),
                    )
                    for i, w in buf
                ],
            )

    def _batches(self, ds: ArrayDataset, shuffle: bool, rng: np.random.Generator):
        """Yield fixed-shape (inputs, labels, weights) batches, zero-padded."""
        n = len(ds)
        order = rng.permutation(n) if shuffle else np.arange(n)
        bs = self.batch_size
        for start in range(0, n, bs):
            idx = order[start : start + bs]
            k = len(idx)
            weights = np.zeros((bs,), np.float32)
            weights[:k] = 1.0
            if k < bs:
                # pad with REAL examples at weight 0: loss/metrics ignore
                # them, but BatchNorm statistics stay clean (zero rows would
                # bias the batch means during training)
                fill = order[: bs - k] if n >= bs else np.resize(order, bs - k)
                idx = np.concatenate([idx, fill.astype(idx.dtype)])
            inputs = tuple(
                jax.device_put(a[idx], self._batch_sharding) for a in ds.inputs
            )
            labels = jax.device_put(ds.labels[idx].astype(np.int32), self._batch_sharding)
            w = jax.device_put(weights, self._batch_sharding)
            yield inputs, labels, w

    def _stream_batches(self, ds: Any, epoch: int, shuffle: bool = True):
        """Fixed-shape batches from a StreamingDataset (grain-backed).

        Same pad-to-static + weight-0 contract as ``_batches``: every device
        batch has exactly ``self.batch_size`` rows; short loader batches are
        padded by repeating real rows at weight 0 (loss/metrics ignore them,
        BatchNorm statistics stay clean). Under multi-host, each host streams
        its own 1/hosts shard and the global array is assembled from
        process-local data.
        """
        n_proc = jax.process_count()
        if self.batch_size % n_proc:
            raise ValueError(
                f"batch_size {self.batch_size} must be divisible by the "
                f"process count {n_proc} for streaming (each host loads "
                "batch_size/processes records per step)"
            )
        per_host = self.batch_size // n_proc
        if n_proc > 1:
            def put(a):
                return jax.make_array_from_process_local_data(self._batch_sharding, a)
        else:
            def put(a):
                return jax.device_put(a, self._batch_sharding)

        emitted = 0
        last_inputs = last_labels = None
        for inputs, labels in ds.epoch_batches(epoch, shuffle, per_host):
            k = len(labels)
            weights = np.zeros((per_host,), np.float32)
            weights[:k] = 1.0
            if k < per_host:
                fill = np.resize(np.arange(k), per_host - k)
                inputs = tuple(np.concatenate([a, a[fill]], axis=0) for a in inputs)
                labels = np.concatenate([labels, labels[fill]], axis=0)
            emitted += 1
            last_inputs, last_labels = inputs, labels
            yield (
                tuple(put(a) for a in inputs),
                put(labels.astype(np.int32)),
                put(weights),
            )
        # Multi-host alignment: ceil-split shards can differ by one record,
        # which near a batch boundary gives hosts DIFFERENT batch counts —
        # and each batch is a cross-host collective step, so mismatched
        # counts desync the SPMD program. Hosts with a short shard emit
        # all-weight-0 batches (ignored by loss/metrics) up to the largest
        # shard's count.
        target = (
            ds.global_batches(per_host) if hasattr(ds, "global_batches") else emitted
        )
        while emitted < target:
            if last_inputs is None:
                last_inputs = tuple(
                    np.asarray(a) for a in ds.example_inputs(per_host)
                )
                last_labels = np.zeros((per_host,), np.int32)
            emitted += 1
            yield (
                tuple(put(a) for a in last_inputs),
                put(last_labels.astype(np.int32)),
                put(np.zeros((per_host,), np.float32)),
            )

    # ------------------------------------------------------------ epochs

    def train_single_batch(self, ds: ArrayDataset, seed: int = 0) -> float:
        """Run ONE optimizer step on the first batch of ``ds``; return the loss.

        Public single-step API for compile checks and dry runs (e.g. the
        driver's multi-chip dryrun): initializes parameters and compiles the
        train step if needed, consumes one statically-shaped sharded batch,
        and returns the host float loss (which fences device execution).
        """
        if self.state is None:
            self.init_state(ds.inputs)
        if not self._compiled:
            self._build_steps()
        inputs, labels, weights = next(
            self._batches(ds, shuffle=False, rng=np.random.default_rng(seed))
        )
        self.state, loss_sum, _correct, _n, wsum = self._train_step(
            self.state, inputs, labels, weights, self._dropout_rng(seed)
        )
        return float(loss_sum) / max(float(wsum), 1e-9)

    def train_epoch(
        self, ds: Any, rng: np.random.Generator, base_rng, epoch: int = 0
    ) -> EpochMetrics:
        acc = _AsyncMetrics()
        if (
            isinstance(ds, ArrayDataset)
            and self.config.device_resident
            and self._train_scan is not None
            and self._lr_step_fn is None  # per-step LR can't change inside a scan
        ):
            data, labels_all = self._device_dataset(ds)
            for kind, payload in self._index_groups(ds, shuffle=True, rng=rng):
                if self._preempted and jax.process_count() == 1:
                    break
                if kind == "scan":
                    idxs, weightss = payload
                    self.state, (l, c, n, w) = self._train_scan(
                        self.state, data, labels_all, idxs, weightss, base_rng
                    )
                    self._global_step += int(idxs.shape[0])
                    acc.push(l.sum(), c.sum(), n.sum(), w.sum())
                else:  # tail: fewer than K batches left — run per-step
                    for idx, weights in payload:
                        self.state, l, c, n, w = self._train_step_idx(
                            self.state, data, labels_all, idx, weights, base_rng
                        )
                        self._global_step += 1
                        acc.push(l, c, n, w)
            return acc.result()
        if isinstance(ds, ArrayDataset) and self.config.device_resident:
            data, labels_all = self._device_dataset(ds)
            for idx, weights in self._index_batches(ds, shuffle=True, rng=rng):
                if self._preempted and jax.process_count() == 1:
                    # multi-host runs must not break mid-epoch: each batch is
                    # a collective step, and hosts receive SIGTERM at
                    # different times — consensus happens at the epoch
                    # boundary in _fit_loop instead
                    break
                if self._lr_step_fn is not None:
                    self._set_lr(self._lr_step_fn(self._global_step))
                self.state, l, c, n, w = self._train_step_idx(
                    self.state, data, labels_all, idx, weights, base_rng
                )
                self._global_step += 1
                acc.push(l, c, n, w)
            return acc.result()
        if isinstance(ds, ArrayDataset):
            batches = self._batches(ds, shuffle=True, rng=rng)
        else:  # StreamingDataset (grain-backed host loading)
            batches = self._stream_batches(ds, epoch, shuffle=True)
        for inputs, labels, weights in _host_prefetch_iter(
            batches, self.config.host_prefetch
        ):
            if self._preempted and jax.process_count() == 1:
                break  # multi-host: see the device-resident loop's comment
            if self._lr_step_fn is not None:
                self._set_lr(self._lr_step_fn(self._global_step))
            self.state, l, c, n, w = self._train_step(self.state, inputs, labels, weights, base_rng)
            self._global_step += 1
            acc.push(l, c, n, w)
        return acc.result()

    def evaluate(self, ds: Any, params=None, batch_stats=None) -> EpochMetrics:
        params = self.state["params"] if params is None else params
        batch_stats = self.state["batch_stats"] if batch_stats is None else batch_stats
        acc = _AsyncMetrics()
        rng = np.random.default_rng(0)
        if isinstance(ds, ArrayDataset) and self.config.device_resident:
            data, labels_all = self._device_dataset(ds)
            if self._eval_scan is not None:
                for kind, payload in self._index_groups(ds, shuffle=False, rng=rng):
                    if kind == "scan":
                        l, c, n, w = self._eval_scan(
                            params, batch_stats, data, labels_all, *payload
                        )
                        acc.push(l.sum(), c.sum(), n.sum(), w.sum())
                    else:
                        for idx, weights in payload:
                            acc.push(*self._eval_step_idx(
                                params, batch_stats, data, labels_all, idx, weights
                            ))
                return acc.result()
            for idx, weights in self._index_batches(ds, shuffle=False, rng=rng):
                l, c, n, w = self._eval_step_idx(
                    params, batch_stats, data, labels_all, idx, weights
                )
                acc.push(l, c, n, w)
            return acc.result()
        if isinstance(ds, ArrayDataset):
            batches = self._batches(ds, shuffle=False, rng=rng)
        else:
            batches = self._stream_batches(ds, epoch=0, shuffle=False)
        for inputs, labels, weights in _host_prefetch_iter(
            batches, self.config.host_prefetch
        ):
            l, c, n, w = self._eval_step(params, batch_stats, inputs, labels, weights)
            acc.push(l, c, n, w)
        return acc.result()

    # ------------------------------------------------------------ orchestration

    def _ckpt_path(self, kind: str) -> str:
        os.makedirs(self.config.checkpoints_dir, exist_ok=True)
        suffix = "msgpack" if self.config.checkpoint_backend == "msgpack" else "orbax"
        return os.path.join(
            self.config.checkpoints_dir, f"{self.config.model_name}_{kind}.{suffix}"
        )

    def _save_ckpt(self, path: str, tree: Dict[str, Any]) -> None:
        if self.config.checkpoint_backend in ("orbax", "orbax_async"):
            from multimodal_lipread_tpu.train.checkpoint import save_checkpoint_orbax

            # async: arrays stage to host now, files write in background —
            # the next epoch overlaps the checkpoint I/O; fit() waits for
            # all in-flight saves before returning
            save_checkpoint_orbax(
                path, tree, async_save=self.config.checkpoint_backend == "orbax_async"
            )
        else:
            save_checkpoint(path, tree)

    def _load_ckpt(self, path: str, template: Dict[str, Any]) -> Dict[str, Any]:
        if self.config.checkpoint_backend in ("orbax", "orbax_async"):
            from multimodal_lipread_tpu.train.checkpoint import load_checkpoint_orbax

            return load_checkpoint_orbax(path, template)
        return load_checkpoint(path, template)

    def _set_lr(self, lr: float) -> None:
        if self._current_lr is not None and lr == self._current_lr:
            return  # warmup fns call this every step; skip once saturated
        # keep the replicated sharding of the existing leaf — a plain
        # jnp.asarray would be single-device and force a recompile on meshes
        old = self.state["opt_state"].hyperparams["learning_rate"]
        new = jnp.asarray(lr, jnp.float32)
        if hasattr(old, "sharding"):
            new = jax.device_put(new, old.sharding)
        self.state["opt_state"].hyperparams["learning_rate"] = new
        self._current_lr = float(lr)

    def request_preemption(self) -> None:
        """Ask a running fit() to stop: the in-flight batch finishes, a
        checkpoint is written, and fit returns with result['preempted']=True.
        Safe to call from signal handlers or other threads."""
        self._preempted = True

    def _install_preemption_handlers(self):
        """SIGTERM/SIGINT → request_preemption. Returns an undo callable.
        No-op outside the main thread (signal module restriction)."""
        import signal
        import threading

        if threading.current_thread() is not threading.main_thread():
            return lambda: None
        previous = {}

        def _handler(signum, frame):
            self.request_preemption()

        for sig in (signal.SIGTERM, signal.SIGINT):
            previous[sig] = signal.signal(sig, _handler)

        def _restore():
            for sig, old in previous.items():
                signal.signal(sig, old)

        return _restore

    def fit(
        self,
        train_ds: Any,  # ArrayDataset or StreamingDataset (grain-backed)
        val_ds: Any,
        test_ds: Optional[Any] = None,
        resume: bool = False,
        progress: Optional[Callable[[str], None]] = print,
    ) -> Dict[str, Any]:
        """Full training run; returns history + final (best-checkpoint) test metrics."""
        cfg = self.config
        self.ensure_initialized(train_ds)
        if not self._compiled:
            self._build_steps()
        if cfg.steps_per_dispatch > 1 and (
            self._train_scan is None
            or not cfg.device_resident
            or not isinstance(train_ds, ArrayDataset)
        ):
            import warnings

            warnings.warn(
                "training.steps_per_dispatch > 1 has no effect here: the "
                "scanned dispatch path needs a device_resident ArrayDataset "
                "(and is excluded under pipeline parallelism) — training "
                "falls back to per-step dispatch",
                stacklevel=2,
            )
        self._preempted = False  # a resumed/reused Trainer starts fresh
        restore_signals = (
            self._install_preemption_handlers() if cfg.handle_preemption else lambda: None
        )
        try:
            return self._fit_loop(train_ds, val_ds, test_ds, resume, progress)
        finally:
            restore_signals()
            if self.config.checkpoint_backend == "orbax_async":
                from multimodal_lipread_tpu.train.checkpoint import wait_for_async_saves

                wait_for_async_saves()  # returned runs are durable on disk

    def _fit_loop(
        self,
        train_ds: Any,
        val_ds: Any,
        test_ds: Optional[Any],
        resume: bool,
        progress: Optional[Callable[[str], None]],
    ) -> Dict[str, Any]:
        cfg = self.config

        if cfg.lr_schedule == "linear_warmup" or cfg.warmup_epochs > 0:
            if isinstance(train_ds, ArrayDataset):
                steps_per_epoch = max(1, -(-len(train_ds) // self.batch_size))
            else:
                # streaming: every host must derive the IDENTICAL schedule.
                # len() of a streaming dataset is the PER-HOST shard length,
                # and ceil-split shards can differ by one record near a batch
                # boundary — so compute steps from global_batches(), the same
                # collective step count the weight-0 padding path aligns to
                # (otherwise hosts apply different LR scalars at the same
                # collective step and replicated params silently diverge).
                per_host = max(1, self.batch_size // jax.process_count())
                if hasattr(train_ds, "global_batches"):
                    steps_per_epoch = max(1, int(train_ds.global_batches(per_host)))
                else:
                    steps_per_epoch = max(1, -(-len(train_ds) // per_host))

        if cfg.lr_schedule == "linear_warmup":
            # torch get_linear_schedule_with_warmup over the whole run;
            # stepped per batch AFTER the optimizer step (factor(0)=0 ⇒ the
            # first step trains at lr 0, like torch LambdaLR)
            total = steps_per_epoch * cfg.epochs
            warmup = int(cfg.warmup_proportion * total)
            base_lr = cfg.learning_rate

            def lr_at(step, _w=warmup, _t=total, _lr=base_lr):
                if step < _w:
                    return _lr * step / max(1, _w)
                return _lr * max(0.0, (_t - step) / max(1, _t - _w))

            self._lr_step_fn = lr_at
        elif cfg.warmup_epochs > 0:
            # warmup-then-plateau: the per-step fn reads the LIVE scheduler
            # lr, so plateau reductions at epoch boundaries still apply; the
            # ramp multiplies on top and reaches 1 after warmup (from then on
            # _set_lr's host-side mirror makes the per-step call a no-op).
            # step+1: the FIRST optimizer step already trains at lr/warmup
            # (not 0) — a zero first step would waste one batch every run.
            warmup_steps = max(1, int(round(cfg.warmup_epochs * steps_per_epoch)))

            def plateau_warmup_lr(step, _w=warmup_steps):
                return self.scheduler.lr * min(1.0, (step + 1) / _w)

            self._lr_step_fn = plateau_warmup_lr

        if self._lr_step_fn is not None and cfg.steps_per_dispatch > 1:
            import warnings

            warnings.warn(
                "training.steps_per_dispatch > 1 is ignored with a per-step "
                "LR schedule (linear_warmup / warmup_epochs): the LR cannot "
                "change inside a scanned dispatch — training falls back to "
                "per-step dispatch",
                stacklevel=2,
            )
        start_epoch = 1
        best_val_acc = -1.0

        def ckpt_template():
            # restore template for _load_ckpt — built LAZILY: the full-state
            # D2H gather (params + Adam moments, ~3x model size) is paid only
            # on the resume and final-best-reload paths that actually need it
            return {
                "epoch": 0,
                "state": jax.tree_util.tree_map(np.asarray, self.state),
                "val_acc": 0.0,
                "scheduler_lr": float(self.scheduler.lr),
                "scheduler_best": 0.0,
                "scheduler_has_best": False,
                "scheduler_bad_epochs": 0,
                "best_val_acc": -1.0,
            }

        rolling_path = self._ckpt_path("checkpoint")
        best_path = self._ckpt_path("best")
        if resume and os.path.exists(rolling_path):
            ckpt = self._load_ckpt(rolling_path, ckpt_template())
            self.state = self._place(ckpt["state"])
            self._current_lr = None  # restored leaf value unknown to the mirror
            start_epoch = int(ckpt["epoch"]) + 1
            self.scheduler.lr = float(ckpt["scheduler_lr"])
            # restore the FULL plateau state so a resumed run reduces the LR
            # exactly when an uninterrupted run would have
            self.scheduler.best = (
                float(ckpt["scheduler_best"]) if bool(ckpt["scheduler_has_best"]) else None
            )
            self.scheduler.num_bad_epochs = int(ckpt["scheduler_bad_epochs"])
            # the rolling checkpoint's val_acc is the LAST epoch's, not the
            # best — restore the true running best so a resumed run never
            # overwrites the best checkpoint with a worse model
            best_val_acc = float(ckpt["best_val_acc"])
            self._global_step = int(np.asarray(ckpt["state"]["step"]))
            self._set_lr(self.scheduler.lr)
            if progress:
                progress(f"Resumed from {rolling_path} at epoch {start_epoch}")

        data_rng = np.random.default_rng(cfg.seed)
        # exact-replay determinism: each completed epoch consumed ONE
        # permutation draw (_batches/_index_batches), so a resumed run must
        # skip the same draws — otherwise the replayed epoch k trains on
        # epoch 1's shuffle order and the trajectory deviates from an
        # uninterrupted run. (Streaming datasets seed per-epoch and don't
        # touch data_rng.)
        if start_epoch > 1 and isinstance(train_ds, ArrayDataset):
            for _ in range(start_epoch - 1):
                data_rng.permutation(len(train_ds))
        base_rng = self._dropout_rng(cfg.seed + 1)
        history: List[Dict[str, float]] = []

        boundary_state = None
        for epoch in range(start_epoch, cfg.epochs + 1):
            t0 = time.time()
            if cfg.handle_preemption:
                # host snapshot of the epoch-BOUNDARY state: the preemption
                # save below is labeled epoch-1 and --resume REPLAYS the
                # interrupted epoch, so it must not contain that epoch's
                # partial optimizer updates (replaying early batches on
                # already-advanced params/Adam moments would deviate from an
                # uninterrupted run). One D2H gather per epoch, paid only
                # when preemption handling is enabled.
                boundary_state = jax.tree_util.tree_map(np.asarray, self.state)
            tracing = cfg.profile_dir is not None and epoch == start_epoch
            if tracing:
                jax.profiler.start_trace(cfg.profile_dir)
            tr = self.train_epoch(train_ds, data_rng, base_rng, epoch=epoch)
            if tracing:
                jax.profiler.stop_trace()
            if cfg.handle_preemption and jax.process_count() > 1:
                # all hosts must agree to stop, or the survivors hang in the
                # next collective; any host's SIGTERM preempts every host
                from jax.experimental import multihost_utils

                flags = multihost_utils.process_allgather(
                    np.asarray(1 if self._preempted else 0)
                )
                self._preempted = bool(np.asarray(flags).max())
            if self._preempted:
                # attribute the save to the last COMPLETED epoch: --resume
                # replays the interrupted one from its start, from the
                # epoch-boundary state snapshot (EXACT replay — scheduler and
                # best_val_acc are only mutated at epoch end, so their current
                # values already equal the boundary values). Without
                # handle_preemption there is no boundary snapshot (its per-
                # epoch D2H gather is not paid) — request_preemption() then
                # saves the CURRENT state: the replayed epoch's early batches
                # re-train on slightly-advanced params (approximate resume),
                # but the checkpoint is always valid.
                ckpt = {
                    "epoch": epoch - 1,
                    "state": boundary_state
                    if boundary_state is not None
                    else jax.tree_util.tree_map(np.asarray, self.state),
                    "val_acc": float(best_val_acc),
                    "scheduler_lr": float(self.scheduler.lr),
                    "scheduler_best": float(
                        self.scheduler.best if self.scheduler.best is not None else 0.0
                    ),
                    "scheduler_has_best": self.scheduler.best is not None,
                    "scheduler_bad_epochs": int(self.scheduler.num_bad_epochs),
                    "best_val_acc": float(best_val_acc),
                }
                self._save_ckpt(rolling_path, ckpt)
                if progress:
                    progress(
                        f"Preempted during epoch {epoch}; checkpoint saved to "
                        f"{rolling_path} (resume replays epoch {epoch})"
                    )
                return {
                    "history": history,
                    "best_val_acc": best_val_acc,
                    "preempted": True,
                }
            va = self.evaluate(val_ds)
            if cfg.lr_schedule == "plateau":
                metric = va.loss if cfg.scheduler_mode == "min" else va.acc
                new_lr = self.scheduler.step(metric)
                if self._lr_step_fn is None:
                    self._set_lr(new_lr)
                else:
                    # warmup-on-plateau: the per-step fn reads the updated
                    # scheduler.lr next step; record the ramped value
                    new_lr = self._lr_step_fn(self._global_step)
            else:
                new_lr = self._lr_step_fn(self._global_step)
            te = (
                self.evaluate(test_ds)
                if (test_ds is not None and cfg.test_every_epoch)
                else None
            )
            self.logger.log_epoch(
                epoch, tr.loss, tr.acc, va.loss, va.acc,
                te.loss if te else None, te.acc if te else None,
            )
            history.append(
                {
                    "epoch": epoch, "train_loss": tr.loss, "train_acc": tr.acc,
                    "val_loss": va.loss, "val_acc": va.acc,
                    **({"test_loss": te.loss, "test_acc": te.acc} if te else {}),
                    "lr": new_lr, "seconds": time.time() - t0,
                    "clips_per_sec": len(train_ds) / max(time.time() - t0, 1e-9),
                }
            )
            if progress:
                msg = (
                    f"Epoch {epoch}/{cfg.epochs} "
                    f"train {tr.loss:.4f}/{tr.acc:.2f}% val {va.loss:.4f}/{va.acc:.2f}%"
                )
                if te:
                    msg += f" test {te.loss:.4f}/{te.acc:.2f}%"
                progress(msg + f" lr {new_lr:.2e} ({time.time() - t0:.1f}s)")

            is_best = va.acc > best_val_acc
            if is_best:
                best_val_acc = va.acc
            if is_best or cfg.rolling_checkpoint:
                # gathering the full state (params + Adam moments) to host is
                # 3x model size — only do it when a checkpoint will be written
                ckpt = {
                    "epoch": epoch,
                    "state": jax.tree_util.tree_map(np.asarray, self.state),
                    "val_acc": float(va.acc),
                    "scheduler_lr": float(self.scheduler.lr),
                    "scheduler_best": float(self.scheduler.best if self.scheduler.best is not None else 0.0),
                    "scheduler_has_best": self.scheduler.best is not None,
                    "scheduler_bad_epochs": int(self.scheduler.num_bad_epochs),
                    "best_val_acc": float(best_val_acc),
                }
                if is_best:
                    self._save_ckpt(best_path, ckpt)
                if cfg.rolling_checkpoint:
                    self._save_ckpt(rolling_path, ckpt)

        result: Dict[str, Any] = {"history": history, "best_val_acc": best_val_acc}
        if cfg.checkpoint_backend == "orbax_async":
            # the best checkpoint may still be writing in background; commit
            # it BEFORE the existence gate below, or final-test-on-best races
            # the async rename (and can silently skip)
            from multimodal_lipread_tpu.train.checkpoint import wait_for_async_saves

            wait_for_async_saves()
        have_best = os.path.exists(best_path)
        if jax.process_count() > 1:
            # evaluate() is a collective: every host must take the same
            # branch. Hosts checkpoint to host-local dirs, so a per-host
            # filesystem hiccup could otherwise strand the others in the
            # eval collective — agree on min(exists) first.
            from jax.experimental import multihost_utils

            flags = multihost_utils.process_allgather(np.asarray(1 if have_best else 0))
            have_best = bool(np.asarray(flags).min())
        if test_ds is not None and have_best:
            best = self._load_ckpt(best_path, ckpt_template())
            best_state = self._place(best["state"])
            final = self.evaluate(
                test_ds, params=best_state["params"], batch_stats=best_state["batch_stats"]
            )
            self.logger.log_final(final.loss, final.acc)
            result["final_test_loss"] = final.loss
            result["final_test_acc"] = final.acc
            if progress:
                progress(f"Final Test Loss: {final.loss:.4f}, Final Test Acc: {final.acc:.2f}%")
        return result
