"""MFU attribution for the three unexplained low-utilization bench rows
(BENCH_r03: audio conformer 0.125, triple late_fusion_mobile 0.132,
av middle_fusion_mobilenet 0.089).

Method = the resnet_lstm / depthwise studies' (docs/PERFORMANCE.md): chained
dependent applications inside ONE jit with a single value fetch (the ~4 ms
tunnel dispatch otherwise swamps ops at these sizes), fwd+bwd per component
via grad-through-the-chain, plus a train-step batch sweep (utilization at
these tiny model dims is batch-starved if anything is).

Components measured at the bench row's exact shapes:
- conformer (B,117,144): _FFN, LayerNorm+MHSA, _ConvModule (depthwise k=7 +
  GLU + BN), LayerNorm — the four sublayers of every block, plus the
  (B,117,80)->144 input projection.
- the two mobile fusion rows decompose per ENCODER (non-chainable shapes:
  serialized with a scalar data dependency): MelMobileNet over (B,80,117),
  video MobileNetV2 over B*T frames, cue MLP, fusion tail.

Outputs: experiments/mfu_attribution/summary.jsonl rows; conclusions go to
docs/PERFORMANCE.md.

Run on the chip:  PYTHONPATH=/root/repo:/root/.axon_site \
    python experiments/mfu_attribution.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT = os.path.join(REPO, "experiments", "mfu_attribution")

CHAIN = 30  # dependent applications per jit


def _emit(row):
    os.makedirs(OUT, exist_ok=True)
    print(json.dumps(row), flush=True)
    with open(os.path.join(OUT, "summary.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


def time_component(name, module, x_np, train=True, chain=CHAIN,
                   flag="train"):
    """fwd+bwd seconds/application for a shape-preserving module, measured
    as grad(sum(chain(x)))) — CHAIN dependent applications, one fetch.

    ``flag`` names the module's mode kwarg: ``train`` (ConformerBlock,
    _ConvModule) or ``deterministic`` (_FFN — inverted semantics)."""
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(x_np)
    rng = jax.random.PRNGKey(0)
    eval_kw = {flag: False if flag == "train" else True}
    mode_kw = {flag: train if flag == "train" else not train}
    variables = module.init({"params": rng, "dropout": rng}, x, **eval_kw)
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def chained_loss(p, x):
        y = x
        for _ in range(chain):
            out = module.apply(
                {"params": p, **rest}, y, **mode_kw,
                rngs={"dropout": rng},
                mutable=list(rest.keys()) if train and rest else False,
            )
            y = out[0] if isinstance(out, tuple) else out
            if y.shape != x.shape:  # sanity: chaining needs shape preservation
                raise ValueError(f"{name}: {y.shape} != {x.shape}")
        return jnp.sum(y.astype(jnp.float32))

    g = jax.jit(jax.grad(chained_loss))
    out = g(params, x)
    jax.block_until_ready(out)  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = g(params, x)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    per_app = best / chain
    _emit({"component": name, "fwd_bwd_ms": round(per_app * 1e3, 3),
           "chain": chain, "shape": list(x_np.shape)})
    return per_app


def time_encoder(name, apply_fn, params, x_np, chain=10):
    """fwd+bwd per application for a NON-shape-preserving encoder: serialize
    repeats with a scalar data dependency folded into the input."""
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(x_np)

    def chained_loss(p, x):
        s = jnp.float32(0.0)
        for _ in range(chain):
            xi = x * (1.0 + 1e-12 * s).astype(x.dtype)
            out = apply_fn(p, xi)
            s = s + jnp.sum(out.astype(jnp.float32))
        return s

    g = jax.jit(jax.grad(chained_loss))
    out = g(params, x)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = g(params, x)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    per_app = best / chain
    _emit({"component": name, "fwd_bwd_ms": round(per_app * 1e3, 3),
           "chain": chain, "shape": list(x_np.shape)})
    return per_app


def branch_study(which: str):
    """Authoritative attribution for the two mobile fusion rows: time each
    modality branch as its OWN full train step (fwd+bwd+Adam) with
    bench._bench_train_step — the same instrument behind the bench table —
    at the row's exact batch and input shapes. The chain-timing method above
    produced a physically impossible reading for MobileNetV3Small
    (implied ~520 TFLOP/s > 163 measured peak), so sub-ms chain rows are
    untrusted; these branch rows are the record."""
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    import bench

    rng = np.random.default_rng(0)
    B = bench.VIDEO_BATCH * len(jax.devices())
    labels = rng.integers(0, 4, size=B).astype(np.int32)

    def step_row(tag, model, inputs):
        cps, flops, dt = bench._bench_train_step(model, inputs, labels, steps=10)
        _emit({"branch": f"{which}/{tag}", "step_ms": round(dt / 10 * 1e3, 2),
               "clips_per_s": round(cps, 1), "flops_per_step": flops,
               "achieved_tflops": round(flops / (dt / 10) / 1e12, 1)})

    class _Head(nn.Module):
        encoder: nn.Module

        @nn.compact
        def __call__(self, x, train: bool = False):
            h = self.encoder(x, train)
            return nn.Dense(4, dtype=jnp.float32, name="head")(h)

    class _CNNMeanPool(nn.Module):
        """Per-frame backbone + mean over T: the video branch minus its
        BiLSTM, isolating backbone cost from recurrence cost."""
        backbone: str

        @nn.compact
        def __call__(self, video, train: bool = False):
            from multimodal_lipread_tpu.models.backbones import (
                MobileNetV2, MobileNetV3Small)
            B, T = video.shape[0], video.shape[1]
            flat = video.reshape((B * T,) + video.shape[2:])
            bb = (MobileNetV2(dtype=jnp.bfloat16, name="cnn")
                  if self.backbone == "mobilenet_v2"
                  else MobileNetV3Small(dtype=jnp.bfloat16, name="cnn"))
            feats = bb(flat, train)
            return feats.reshape(B, T, -1).mean(axis=1)

    class _LSTMOnly(nn.Module):
        """The video branch's BiLSTM alone, on a pre-featurized sequence."""
        hidden: int
        layers: int
        dropout: float

        @nn.compact
        def __call__(self, seq, train: bool = False):
            from multimodal_lipread_tpu.nn.recurrent import BiLSTM
            out = BiLSTM(self.hidden, self.layers, dropout=self.dropout,
                         dtype=jnp.bfloat16, name="lstm")(seq, train=train)
            return out[:, -1, :]

    if which == "av":
        from multimodal_lipread_tpu.models.audio_video import (
            AudioCNNMidEncoder, VideoSeqEncoder, get_av_model)

        (mels, lips), _ = bench._fusion_inputs(B, with_cue=False)
        step_row("full", get_av_model("middle_fusion_mobilenet", 4,
                                      dtype=jnp.bfloat16), (mels, lips))
        step_row("audio_branch",
                 _Head(AudioCNNMidEncoder(channels=(32, 64), dtype=jnp.bfloat16)),
                 (mels,))
        step_row("video_branch",
                 _Head(VideoSeqEncoder(backbone="mobilenet_v3_small",
                                       lstm_hidden=256, lstm_layers=1,
                                       dtype=jnp.bfloat16)),
                 (lips,))
        step_row("video_cnn_only",
                 _Head(_CNNMeanPool("mobilenet_v3_small")), (lips,))
        seq = rng.standard_normal((B, 29, 576)).astype(np.float32)
        step_row("video_lstm_only", _Head(_LSTMOnly(256, 1, 0.2)), (seq,))
    elif which == "triple":
        from multimodal_lipread_tpu.models.audio_cues_video import (
            TripleAudioEncoder, TripleCueEncoder, TripleVideoEncoder,
            get_triple_model)

        (mels, cues, lips), _ = bench._fusion_inputs(B)
        step_row("full", get_triple_model("late_fusion_mobile", 4,
                                          dtype=jnp.bfloat16),
                 (mels, cues, lips))
        step_row("audio_branch",
                 _Head(TripleAudioEncoder(dtype=jnp.bfloat16)), (mels,))
        step_row("cue_branch",
                 _Head(TripleCueEncoder(style="plain", dtype=jnp.bfloat16)),
                 (cues,))
        step_row("video_branch",
                 _Head(TripleVideoEncoder("mobilenet_v2", lstm_layers=2,
                                          dtype=jnp.bfloat16)),
                 (lips,))
        step_row("video_cnn_only",
                 _Head(_CNNMeanPool("mobilenet_v2")), (lips,))
        seq = rng.standard_normal((B, 29, 1280)).astype(np.float32)
        step_row("video_lstm_only", _Head(_LSTMOnly(128, 2, 0.3)), (seq,))
    else:
        raise ValueError(which)


def conformer_study():
    import jax.numpy as jnp

    import bench
    from multimodal_lipread_tpu.models.audio import get_audio_model
    from multimodal_lipread_tpu.nn.conformer import ConformerBlock, _FFN, _ConvModule

    B, T, D = 128, 117, 144
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, T, D)).astype(np.float32)

    time_component("conformer/_FFN", _FFN(dtype=jnp.bfloat16), x,
                   flag="deterministic")
    time_component("conformer/_ConvModule",
                   _ConvModule(7, dtype=jnp.bfloat16), x)
    time_component("conformer/full_block",
                   ConformerBlock(dtype=jnp.bfloat16), x)

    import flax.linen as nn

    class _MHSA(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            y = nn.LayerNorm(dtype=jnp.bfloat16)(x)
            return x + nn.MultiHeadDotProductAttention(
                num_heads=4, dtype=jnp.bfloat16)(y, y)

    time_component("conformer/ln_mhsa", _MHSA(), x)

    # train-step batch sweep at the bench protocol
    labels4 = lambda n: rng.integers(0, 4, size=n).astype(np.int32)
    for batch in (128, 256, 512, 1024):
        mels = rng.standard_normal((batch, 80, 117)).astype(np.float32)
        model = get_audio_model("conformer", 4, dtype=jnp.bfloat16)
        cps, flops, dt = bench._bench_train_step(
            model, (mels,), labels4(batch), steps=30)
        _emit({"sweep": "conformer_batch", "batch": batch,
               "clips_per_s": round(cps, 1),
               "step_ms": round(dt / 30 * 1e3, 2),
               "flops_per_step": flops})


def fusion_study(which: str):
    import jax
    import jax.numpy as jnp

    import bench

    rng = np.random.default_rng(0)
    B = bench.VIDEO_BATCH * len(jax.devices())
    labels = rng.integers(0, 4, size=B).astype(np.int32)

    if which == "triple":
        from multimodal_lipread_tpu.models.audio_cues_video import get_triple_model

        model = get_triple_model("late_fusion_mobile", 4, dtype=jnp.bfloat16)
        inputs, _ = bench._fusion_inputs(B)
        tag = "triple late_fusion_mobile"
    else:
        from multimodal_lipread_tpu.models.audio_video import get_av_model

        model = get_av_model("middle_fusion_mobilenet", 4, dtype=jnp.bfloat16)
        inputs, _ = bench._fusion_inputs(B, with_cue=False)
        tag = "av middle_fusion_mobilenet"

    # encoder decomposition at the row's exact shapes
    rngk = jax.random.PRNGKey(0)

    from multimodal_lipread_tpu.models.backbones import (MobileNetV2,
                                                         MobileNetV3Small)

    # video frames through the row's OWN per-frame backbone (the
    # dominant-FLOPs suspect): triple late_fusion_mobile wraps MobileNetV2
    # (audio_cues_video.py), av middle_fusion_mobilenet wraps
    # MobileNetV3Small (audio_video.py VideoSeqEncoder default)
    lips = inputs[-1]
    frames = (lips.reshape((-1,) + lips.shape[2:])[: B * lips.shape[1]]
              .astype(np.float32) / 255.0)
    mnv = (MobileNetV2(dtype=jnp.bfloat16) if which == "triple"
           else MobileNetV3Small(dtype=jnp.bfloat16))
    mv = mnv.init(rngk, jnp.asarray(frames[:2]), False)

    def mn_apply(p, x):
        out = mnv.apply({"params": p["params"], "batch_stats": p["batch_stats"]},
                        x, True, mutable=["batch_stats"])
        return out[0]

    time_encoder(f"{which}/video_backbone_frames", mn_apply,
                 {"params": mv["params"], "batch_stats": mv.get("batch_stats", {})},
                 frames, chain=5)

    # mel branch: 2-D mel image through its encoder — approximate with the
    # same MobileNetV2 on (B, 80, 117, 1->3)? No: measure the model's OWN
    # audio path by timing the full model minus video via component rows is
    # model-specific; instead record the full step + batch sweep and derive
    # the residual (full - video - tail) as the audio branch.
    for batch in (B // 2, B, 2 * B):
        ins = tuple(x[:batch] if x.shape[0] >= batch else
                    np.concatenate([x, x], axis=0)[:batch] for x in inputs)
        lb = rng.integers(0, 4, size=batch).astype(np.int32)
        cps, flops, dt = bench._bench_train_step(model, ins, lb, steps=10)
        _emit({"sweep": f"{which}_batch", "batch": batch,
               "clips_per_s": round(cps, 1),
               "step_ms": round(dt / 10 * 1e3, 2),
               "flops_per_step": flops, "row": tag})


def rng_study():
    """Dropout-RNG cost: the conformer block samples FIVE dropout masks per
    block (2 on the 4d FFN hiddens) — ~104 M threefry draws per batch-128
    step. Measure the train step (a) as shipped, (b) dropout_rate=0 (upper
    bound on what the masks + RNG cost), (c) threefry swapped for the
    hardware RBG generator (jax_default_prng_impl='rbg' — same step, cheap
    bits). If (c) ≈ (b), the cost is bit GENERATION (recoverable with a
    config knob); if (c) ≈ (a), it's the mask bandwidth (architectural)."""
    import jax
    import jax.numpy as jnp

    import bench
    from multimodal_lipread_tpu.models.audio import AudioConformer

    rng = np.random.default_rng(0)
    batch = 128
    mels = rng.standard_normal((batch, 80, 117)).astype(np.float32)
    labels = rng.integers(0, 4, size=batch).astype(np.int32)

    def row(tag, dropout):
        model = AudioConformer(4, dropout_rate=dropout, dtype=jnp.bfloat16)
        cps, flops, dt = bench._bench_train_step(model, (mels,), labels, steps=30)
        _emit({"sweep": "conformer_rng", "variant": tag,
               "clips_per_s": round(cps, 1), "step_ms": round(dt / 30 * 1e3, 2),
               "flops_per_step": flops})

    row("threefry_p0.1", 0.1)
    row("no_dropout", 0.0)
    jax.config.update("jax_default_prng_impl", "rbg")
    try:
        row("rbg_p0.1", 0.1)
    finally:
        jax.config.update("jax_default_prng_impl", "threefry2x32")


def dmodel_study():
    """MXU-alignment sweep: the conformer's d_model=144 pads every GEMM's
    128-lane dimension to 256 (44% wasted lanes) and gives head_dim 36
    (→128, 72% waste). The batch sweep above shows throughput is FLAT in
    batch, so utilization is alignment-bound, not batch-starved. Measure
    the same 4-layer model at lane-aligned widths to quantify the cliff."""
    import jax.numpy as jnp

    import bench
    from multimodal_lipread_tpu.models.audio import AudioConformer

    rng = np.random.default_rng(0)
    batch = 128
    mels = rng.standard_normal((batch, 80, 117)).astype(np.float32)
    labels = rng.integers(0, 4, size=batch).astype(np.int32)
    for d in (128, 144, 160, 192, 256):
        model = AudioConformer(4, d_model=d, dtype=jnp.bfloat16)
        cps, flops, dt = bench._bench_train_step(
            model, (mels,), labels, steps=30)
        _emit({"sweep": "conformer_dmodel", "d_model": d, "batch": batch,
               "clips_per_s": round(cps, 1),
               "step_ms": round(dt / 30 * 1e3, 2),
               "flops_per_step": flops})


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "conformer"):
        conformer_study()
    if which in ("all", "triple"):
        fusion_study("triple")
    if which in ("all", "av"):
        fusion_study("av")
    if which == "dmodel":
        dmodel_study()
    if which in ("branches", "all_branches"):
        branch_study("triple")
        branch_study("av")
    if which == "rng":
        rng_study()
    print("attribution complete", flush=True)
