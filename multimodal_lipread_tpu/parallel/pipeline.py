"""GPipe-style pipeline parallelism over a ``(data, stage)`` device mesh.

The reference is single-device (SURVEY.md §2.10) and most of the zoo is far
below any scale where pipelining pays; the BERT cue fine-tune
(cues/models/bert.py:23-299, bert-base = 110M params, 12 uniform encoder
layers) is the one family deep enough to stage. This module implements the
TPU-native version of pipeline parallelism:

- Encoder layers are stored STACKED (leading axis = num_layers) and sharded
  over the mesh's ``stage`` axis, so each stage's devices hold — and the
  optimizer updates — only their ``num_layers / S`` layer slice (params AND
  Adam moments, via the same ``place_state`` rules as tensor parallelism).
- The schedule is explicit ``shard_map`` + ``lax.ppermute``: microbatches
  enter at stage 0 and activations hop stage→stage+1 over ICI each tick —
  the GPipe fill/drain schedule with ``M + S - 1`` ticks for M microbatches.
  Everything is a ``lax.scan`` (reverse-differentiable, single XLA program);
  gradients flow backwards through the same ``ppermute`` edges reversed.
- The ``data`` mesh axis composes orthogonally: each data-parallel row of
  the mesh pipelines its own batch shard, and GSPMD inserts the gradient
  all-reduce over ``data`` exactly as in pure DP.

There is no torch equivalent to cite in the reference — this is added
capability, like DP/TP (docs/PARALLELISM.md records the disposition).
"""

from __future__ import annotations

import contextlib
import functools
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from multimodal_lipread_tpu.parallel.mesh import DATA_AXIS

STAGE_AXIS = "stage"

# Trace-time flag: when True, gpipe_apply is being traced INSIDE an outer
# shard_map that already established the (data, stage) axes (the PP train
# step, build_pp_train_step) — run the per-device body directly instead of
# opening a nested shard_map. Tracing is single-threaded, so a module-level
# flag (saved/restored by the context manager) is sufficient.
_INSIDE_MESH = False


def in_mesh() -> bool:
    """True while tracing per-device inside the PP train step's shard_map."""
    return _INSIDE_MESH


@contextlib.contextmanager
def inside_mesh():
    """Mark the enclosed trace as already running per-device on a PP mesh."""
    global _INSIDE_MESH
    prev = _INSIDE_MESH
    _INSIDE_MESH = True
    try:
        yield
    finally:
        _INSIDE_MESH = prev


def get_mesh_pp(num_stages: int, devices: Optional[Sequence[Any]] = None) -> Mesh:
    """2-D ``(data, stage)`` mesh: batch over 'data', layers over 'stage'.

    The stage axis is innermost so the per-tick activation hop
    (``ppermute`` stage i → i+1) rides adjacent ICI links.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if num_stages < 1 or n % num_stages:
        raise ValueError(f"num_stages={num_stages} must divide the {n} devices")
    grid = np.asarray(devices).reshape(n // num_stages, num_stages)
    return Mesh(grid, (DATA_AXIS, STAGE_AXIS))


def gpipe_apply(
    apply_layer: Callable[..., jax.Array],
    stacked_params: Any,
    x: jax.Array,
    mask: Optional[jax.Array],
    *,
    mesh: Mesh,
    num_microbatches: int,
    dropout_key: Optional[jax.Array] = None,
) -> jax.Array:
    """Run ``num_layers`` stacked layers over ``x`` with a GPipe schedule.

    Args:
      apply_layer: ``(one_layer_params, x, mask, key_or_None) -> x`` — a pure
        per-layer forward (e.g. ``BertLayer.apply`` closed over config).
      stacked_params: pytree whose every leaf has leading axis ``num_layers``,
        sharded ``P('stage')`` on that axis (``place_state`` rule).
      x: activations ``(batch, seq, hidden)``, sharded ``P('data')``.
      mask: optional attention mask ``(batch, 1, 1, seq)`` — NOT permuted
        between stages; every stage indexes the microbatch it is currently
        processing (masks are tiny, so replication over 'stage' is free).
      mesh: a ``get_mesh_pp`` mesh with ('data', 'stage') axes.
      num_microbatches: M; must divide the per-data-shard batch rows.
      dropout_key: optional PRNG key; each (global layer, microbatch) cell
        gets ``fold_in(fold_in(key, layer), microbatch)`` so the mask stream
        is invariant to the stage count S at fixed M and per-shard batch.
        Changing M (or the data-axis size, which reassigns examples to fold
        cells) changes the draws — same caveat as ``sequential_apply``.

    Fill/drain ticks run real layer compute on bubble cells (stage 0 re-feeds
    microbatch ``last`` for t > last; stages s > 0 see zero-state for t < s);
    outputs are ``where``-gated so correctness holds. This is a deliberate
    compute-for-simplicity trade-off: gating the bubble inputs would save
    roughly (S-1)/(M+S-1) of the tick compute but adds a select per tick on
    the hot path, and the zero/repeated inputs are benign (LayerNorm of
    zeros and masked softmax are finite).

    Returns ``x`` after all layers, sharded ``P('data')`` (replicated over
    'stage' — the last stage's result is broadcast with one ``psum``).

    Inside ``inside_mesh()`` (the PP train step's outer shard_map), the
    per-device body runs directly: ``stacked_params`` is then the LOCAL
    layer slice (leading axis = num_layers / S) and ``x`` the local batch
    shard.
    """
    num_stages = mesh.shape[STAGE_AXIS]
    leading = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if _INSIDE_MESH:
        # the outer shard_map already sliced the layer axis over 'stage'
        layers_per_stage = leading
    else:
        if leading % num_stages:
            raise ValueError(
                f"{leading} layers not divisible by {num_stages} pipeline stages"
            )
        layers_per_stage = leading // num_stages
    if num_microbatches < 1:
        raise ValueError(f"num_microbatches={num_microbatches} must be >= 1")

    has_mask = mask is not None
    has_key = dropout_key is not None
    # raw uint32 key data crosses the shard_map boundary (typed keys are
    # opaque to sharding specs); re-wrapped with the same impl inside.
    key_impl = None
    key_data = jnp.zeros((0,), jnp.uint32)
    if has_key:
        key_impl = str(jax.random.key_impl(dropout_key))
        key_data = jax.random.key_data(dropout_key)

    def body(layers_local, x_local, mask_local, key_raw):
        stage = jax.lax.axis_index(STAGE_AXIS)
        b = x_local.shape[0]
        if b % num_microbatches:
            raise ValueError(
                f"per-shard batch {b} not divisible by "
                f"num_microbatches={num_microbatches}"
            )
        m = b // num_microbatches
        xm = x_local.reshape((num_microbatches, m) + x_local.shape[1:])
        maskm = (
            mask_local.reshape((num_microbatches, m) + mask_local.shape[1:])
            if has_mask
            else None
        )
        key = jax.random.wrap_key_data(key_raw, impl=key_impl) if has_key else None
        last = num_microbatches - 1

        def run_stage(h, mb_id, mask_mb):
            def layer_body(h, scanned):
                p_i, local_i = scanned
                k = None
                if has_key:
                    global_layer = stage * layers_per_stage + local_i
                    k = jax.random.fold_in(jax.random.fold_in(key, global_layer), mb_id)
                return apply_layer(p_i, h, mask_mb, k), None

            h, _ = jax.lax.scan(
                layer_body, h, (layers_local, jnp.arange(layers_per_stage))
            )
            return h

        def tick(carry, t):
            state, outputs = carry
            feed = jax.lax.dynamic_index_in_dim(
                xm, jnp.clip(t, 0, last), keepdims=False
            )
            inp = jnp.where(stage == 0, feed, state)
            mb_id = jnp.clip(t - stage, 0, last)
            mask_mb = (
                jax.lax.dynamic_index_in_dim(maskm, mb_id, keepdims=False)
                if has_mask
                else None
            )
            y = run_stage(inp, mb_id, mask_mb)
            out_id = jnp.clip(t - (num_stages - 1), 0, last)
            valid = (t >= num_stages - 1) & (stage == num_stages - 1)
            cur = jax.lax.dynamic_index_in_dim(outputs, out_id, keepdims=False)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs, jnp.where(valid, y, cur), out_id, 0
            )
            state = jax.lax.ppermute(
                y, STAGE_AXIS, [(i, (i + 1) % num_stages) for i in range(num_stages)]
            )
            return (state, outputs), None

        carry0 = (jnp.zeros_like(xm[0]), jnp.zeros_like(xm))
        (_, outputs), _ = jax.lax.scan(
            tick, carry0, jnp.arange(num_microbatches + num_stages - 1)
        )
        # broadcast the last stage's result to every stage so the out-spec
        # (replicated over 'stage') holds a single well-defined value
        outputs = jax.lax.psum(
            jnp.where(stage == num_stages - 1, outputs, jnp.zeros_like(outputs)),
            STAGE_AXIS,
        )
        return outputs.reshape(x_local.shape)

    mask_arg = mask if has_mask else jnp.zeros((0,), jnp.int32)
    if _INSIDE_MESH:
        return body(stacked_params, x, mask_arg, key_data)
    in_specs = (
        jax.tree_util.tree_map(lambda _: P(STAGE_AXIS), stacked_params),
        P(DATA_AXIS),
        P(DATA_AXIS) if has_mask else P(),
        P(),
    )
    pipe = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )
    return pipe(stacked_params, x, mask_arg, key_data)


def _spec_has_axis(spec, axis: str) -> bool:
    """True if a PartitionSpec mentions ``axis`` (entries may be tuples)."""
    for entry in tuple(spec):
        if entry == axis or (isinstance(entry, tuple) and axis in entry):
            return True
    return False


def _fused_psum(leaves, axes):
    """psum a list of arrays as ONE all-reduce per dtype (ravel+concat+split).

    Collective-order determinism is the point: a tree psum can lower to one
    AllReduce per leaf, and independent collectives may be scheduled in
    different orders on different devices — XLA:CPU's in-process rendezvous
    then deadlocks (the round-4 lane crash). Fusing each group into a single
    flat vector leaves exactly one rendezvous per dtype, and multiple dtypes
    are chained with optimization_barrier so their order is fixed too.
    """
    if not leaves:
        return []
    order = {}  # dtype -> list of indices
    for i, leaf in enumerate(leaves):
        order.setdefault(jnp.dtype(leaf.dtype), []).append(i)
    out = [None] * len(leaves)
    prev = None
    for dt, idxs in order.items():
        group = [leaves[i] for i in idxs]
        if prev is not None:
            # chain dtype groups: this group's all-reduce sequences after
            # the previous one's
            group = list(jax.lax.optimization_barrier((tuple(group), prev))[0])
        flat = jnp.concatenate([g.reshape(-1) for g in group])
        red = jax.lax.psum(flat, axes)
        pos = 0
        red_group = []
        for i, g in zip(idxs, group):
            n = g.size
            out[i] = jax.lax.dynamic_slice_in_dim(red, pos, n).reshape(g.shape)
            red_group.append(out[i])
            pos += n
        prev = tuple(red_group)
    return out


def build_pp_train_step(
    model: Any,
    tx: Any,
    mesh: Mesh,
    state: Any,
    *,
    extra_kwargs: Optional[dict] = None,
    class_weights: Optional[jax.Array] = None,
    half_precision: bool = False,
):
    """Train step for a pipeline-parallel model as ONE top-level shard_map.

    Why not the Trainer's generic jit step: there, GSPMD inserts the
    data-axis gradient all-reduces for replicated params (embeddings /
    pooler / classifier) with no ordering dependency on the stage-axis
    ``ppermute``s inside ``gpipe_apply``'s shard_map — XLA:CPU's concurrent
    thunk executor then starts the two collective families in different
    orders on different devices and the in-process rendezvous deadlocks
    (SIGABRT after 40s — the round-4 default-lane crash; ADVICE.md round 4,
    high). Putting the WHOLE step (forward, loss, backward, grad reduce,
    optimizer) inside one shard_map makes every collective explicit, and
    data dependencies + ``optimization_barrier`` chains give them a total
    order:

      forward ppermutes (scan-carried) < output psum('stage') <
      backward ppermutes (transpose scan) < [barrier: all grads] <
      stage-sharded-grad all-reduce over 'data' < [barrier] <
      replicated-grad + metrics all-reduce over ('data','stage')

    Per-leaf reduction rule: the local loss is GATED to the last stage
    (``where(stage == S-1, ce_sum, 0)``), so every replicated leaf's local
    grad is nonzero on exactly one stage coordinate (classifier/pooler on
    the last stage where the loss lives; embeddings on stage 0 where the
    pipeline-input cotangent lands) — one uniform ``psum`` over
    ('data','stage') is then correct for ALL replicated leaves, with no
    model-specific knowledge. Stage-sharded leaves (the stacked encoder)
    hold their own slice's grads on every stage and reduce over 'data' only.

    Semantics match Trainer.train_step: loss = sum(ce*w)/max(sum(w),1e-9)
    with per-class weights folded into w; returns
    (new_state, loss_sum, correct, n, weight_sum). Unsupported with PP
    (raise at build time in the Trainer): mixup, BatchNorm models, remat.
    """
    extra_kwargs = extra_kwargs or {}
    num_stages = mesh.shape[STAGE_AXIS]
    state_specs = jax.tree_util.tree_map(lambda a: a.sharding.spec, state)
    param_spec_leaves = jax.tree_util.tree_leaves(
        state_specs["params"], is_leaf=lambda x: isinstance(x, P)
    )

    def cast(x):
        # mirror Trainer._build_steps.cast: uint8 normalizes on device
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.bfloat16 if half_precision else jnp.float32) / 255.0
        elif half_precision and jnp.issubdtype(x.dtype, jnp.floating):
            x = x.astype(jnp.bfloat16)
        return x

    def step_body(key_impl, state, inputs, labels, weights, key_raw):
        stage = jax.lax.axis_index(STAGE_AXIS)
        inputs = tuple(cast(x) for x in inputs)
        rng = (
            jax.random.wrap_key_data(key_raw, impl=key_impl)
            if key_impl is not None
            else key_raw
        )
        step_rng = jax.random.fold_in(rng, state["step"])
        w = weights if class_weights is None else weights * class_weights[labels]
        last = (stage == num_stages - 1).astype(jnp.float32)

        def loss_fn(params):
            with inside_mesh():
                logits = model.apply(
                    {"params": params}, *inputs, train=True,
                    rngs={"dropout": step_rng}, **extra_kwargs,
                )
            logits = logits.astype(jnp.float32)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            # gate the loss to the last stage: see the docstring's per-leaf
            # reduction rule (makes one uniform replicated-grad psum correct)
            return jnp.sum(ce * w) * last, logits

        (ce_sum, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"]
        )

        flat, treedef = jax.tree_util.tree_flatten(grads)
        # 1) tie every grad leaf to the full backward: the embedding grad
        #    transitively depends on every reverse ppermute, so after this
        #    barrier nothing can be scheduled before the pipeline drains
        flat = list(jax.lax.optimization_barrier(tuple(flat)))
        stage_idx = [
            i for i, s in enumerate(param_spec_leaves) if _spec_has_axis(s, STAGE_AXIS)
        ]
        repl_idx = [
            i
            for i in range(len(flat))
            if i not in set(stage_idx)
        ]
        a_red = _fused_psum([flat[i] for i in stage_idx], DATA_AXIS)
        # metrics, gated like the loss so ('data','stage') psum counts once
        correct = jnp.sum((jnp.argmax(logits, -1) == labels) * weights) * last
        n = jnp.sum(weights) * last
        wsum = jnp.sum(w) * last
        b_leaves = [flat[i] for i in repl_idx] + [ce_sum, correct, n, wsum]
        if a_red:
            # 2) chain: the replicated-grad all-reduce sequences after the
            #    stage-sharded one
            b_leaves = list(
                jax.lax.optimization_barrier((tuple(b_leaves), tuple(a_red)))[0]
            )
        b_red = _fused_psum(b_leaves, (DATA_AXIS, STAGE_AXIS))
        for i, v in zip(stage_idx, a_red):
            flat[i] = v
        for i, v in zip(repl_idx, b_red):
            flat[i] = v
        ce_sum, correct, n, wsum = b_red[len(repl_idx):]
        grads = jax.tree_util.tree_unflatten(treedef, flat)
        denom = jnp.maximum(wsum, 1e-9)
        grads = jax.tree_util.tree_map(lambda g: g / denom, grads)

        updates, new_opt = tx.update(grads, state["opt_state"], state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        new_state = {
            "params": new_params,
            "batch_stats": state["batch_stats"],
            "opt_state": new_opt,
            "step": state["step"] + 1,
        }
        return new_state, ce_sum, correct, n, wsum

    def train_step(state, inputs, labels, weights, rng):
        if jax.dtypes.issubdtype(rng.dtype, jax.dtypes.prng_key):
            key_impl = str(jax.random.key_impl(rng))
            key_raw = jax.random.key_data(rng)
        else:  # old-style uint32[2] threefry key
            key_impl = None
            key_raw = rng
        in_specs = (
            state_specs,
            tuple(P(DATA_AXIS) for _ in inputs),
            P(DATA_AXIS),
            P(DATA_AXIS),
            P(),
        )
        mapped = jax.shard_map(
            functools.partial(step_body, key_impl),
            mesh=mesh,
            in_specs=in_specs,
            out_specs=(state_specs, P(), P(), P(), P()),
            check_vma=False,
        )
        return mapped(state, tuple(inputs), labels, weights, key_raw)

    return train_step


def sequential_apply(
    apply_layer: Callable[..., jax.Array],
    stacked_params: Any,
    x: jax.Array,
    mask: Optional[jax.Array],
    dropout_key: Optional[jax.Array] = None,
) -> jax.Array:
    """Plain ``lax.scan`` over the stacked layers — the num_stages=1 path.

    The per-example math is identical to ``gpipe_apply`` (pipelining only
    reschedules it), so deterministic forward/backward agree to float
    tolerance. Dropout draws differ between the two paths unless the
    microbatch fold cells coincide (this path folds every example into
    microbatch 0), so trajectory-parity tests run dropout-free.
    """
    num_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]

    def layer_body(h, scanned):
        p_i, i = scanned
        k = None
        if dropout_key is not None:
            k = jax.random.fold_in(jax.random.fold_in(dropout_key, i), 0)
        return apply_layer(p_i, h, mask, k), None

    x, _ = jax.lax.scan(layer_body, x, (stacked_params, jnp.arange(num_layers)))
    return x
