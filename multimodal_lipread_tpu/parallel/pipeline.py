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

import functools
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from multimodal_lipread_tpu.parallel.mesh import DATA_AXIS

STAGE_AXIS = "stage"


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
        is schedule-independent (same draws whatever S or M is).

    Returns ``x`` after all layers, sharded ``P('data')`` (replicated over
    'stage' — the last stage's result is broadcast with one ``psum``).
    """
    num_stages = mesh.shape[STAGE_AXIS]
    num_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if num_layers % num_stages:
        raise ValueError(
            f"{num_layers} layers not divisible by {num_stages} pipeline stages"
        )
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
        layers_per_stage = num_layers // num_stages
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
    mask_arg = mask if has_mask else jnp.zeros((0,), jnp.int32)
    return pipe(stacked_params, x, mask_arg, key_data)


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
