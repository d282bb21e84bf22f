"""Minimal functional module engine.

Replaces the reference's Keras graph engine (Keras-2.0.8/keras/engine/topology.py —
``Layer``/``Node``/``Container`` symbolic graphs executed via ``tf.Session.run``)
with pure functions over *flat, name-keyed* parameter pytrees:

* ``params``: ``{layer_name: {leaf_name: jnp.ndarray}}`` — leaf names follow the
  Keras HDF5 convention (``kernel``/``bias``, BN ``gamma``/``beta``/
  ``moving_mean``/``moving_variance``), and layer names are kept byte-identical to
  the reference graph ('conv2_1_x1', 'bn_up0', '3dconv1', 'fianl_conv' [sic], ...)
  so the HDF5 weight converter is a straight rename-free mapping and parity is
  auditable layer-by-layer.
* ``state``: same structure, holding BN moving statistics.

A model is a single ``apply(ctx, x, ...)`` function. ``init()`` traces it once
under ``jax.eval_shape`` (zero FLOPs) with a recording ``Ctx`` to discover every
parameter's shape, then materializes them with per-name PRNG streams. This is the
single-source-of-truth equivalent of Keras ``Layer.build()``
(topology.py:369 ``add_weight``) without a stateful layer object graph.

Everything downstream is jit/pjit-friendly: apply functions are pure, shapes are
static, and BN state updates are returned functionally (``new_state``) instead of
being graph side-effects (reference normalization.py:114-123 ``add_update``).
"""
from __future__ import annotations

import contextlib
import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from . import initializers


@dataclasses.dataclass(frozen=True)
class ParamSpec:
    shape: tuple
    dtype: Any
    init: str


class Ctx:
    """Carries parameters/state/config through a model apply function.

    Modes:
      * record=True  — used only by :func:`init`; collects ParamSpecs and returns
        zeros so the trace is shape-correct but allocation-free.
      * record=False — normal execution; reads from ``params``/``state`` and
        collects functional BN-state updates into ``new_state``.
    """

    def __init__(
        self,
        params=None,
        state=None,
        *,
        record: bool = False,
        train: bool = False,
        rng=None,
        compute_dtype=jnp.float32,
        param_dtype=jnp.float32,
        remat: bool = False,
        remat_policy: str = "full",
    ):
        self.params = params if params is not None else {}
        self.state = state if state is not None else {}
        self.record = record
        self.train = train
        self.rng = rng
        self._rng_count = 0
        self.compute_dtype = compute_dtype
        self.param_dtype = param_dtype
        # rematerialize checkpoint-wrapped blocks during backward (set by the
        # trainer from TrainConfig.remat; no-op outside grad transforms).
        # remat_policy: 'full' = save nothing inside the block (max memory
        # win, ~1 extra forward); 'convs' = save conv outputs (the MXU work)
        # and recompute only the elementwise BN/Scale/ReLU chains — most of
        # the memory win at a fraction of the recompute cost (the saved
        # tensors are the narrow conv outputs; the recomputed ones are the
        # wide concat-width elementwise intermediates).
        self.remat = remat
        self.remat_policy = remat_policy
        self.param_specs: dict[str, dict[str, ParamSpec]] = {}
        self.state_specs: dict[str, dict[str, tuple]] = {}
        self.new_state: dict[str, dict[str, jnp.ndarray]] = {}

    # ---- parameters -----------------------------------------------------
    def param(self, name: str, leaf: str, shape, init: str):
        if self.record:
            self.param_specs.setdefault(name, {})[leaf] = ParamSpec(
                tuple(int(s) for s in shape), self.param_dtype, init
            )
            return jnp.zeros(shape, self.param_dtype)
        return self.params[name][leaf]

    # ---- BN moving statistics -------------------------------------------
    def stat(self, name: str, leaf: str, shape, fill: float):
        if self.record:
            self.state_specs.setdefault(name, {})[leaf] = (
                tuple(int(s) for s in shape),
                fill,
            )
            return jnp.full(shape, fill, jnp.float32)
        return self.state[name][leaf]

    def put_stat(self, name: str, leaf: str, value):
        if not self.record:
            self.new_state.setdefault(name, {})[leaf] = value

    # ---- dropout RNG ------------------------------------------------------
    def next_rng(self):
        if self.rng is None:
            raise ValueError("Ctx.rng is required for dropout when train=True")
        self._rng_count += 1
        return jax.random.fold_in(self.rng, self._rng_count)


def init(
    apply_fn: Callable,
    rng,
    *example_args,
    param_dtype=jnp.float32,
    **apply_kwargs,
):
    """Initialize (params, state) for ``apply_fn(ctx, *args, **kwargs)``.

    The apply function is traced abstractly (``jax.eval_shape``) so no model
    FLOPs run at init time; parameters are then materialized with a dedicated
    PRNG stream per (layer, leaf) in sorted-name order (reproducible regardless
    of trace order).

    Materialization runs eagerly on the HOST CPU backend: a full-preset hybrid
    has ~2,000 leaves, and per-leaf eager dispatch to an accelerator pays
    ~2,000 device round-trips at process start (minutes-to-hours through a
    high-latency link; measured as the dominant startup cost on the tunneled
    TPU host). Threefry and the initializer math are bit-identical across
    backends, and the arrays transfer to the accelerator in bulk at the first
    jit call — so values, checkpoints, and tests are unaffected.
    """
    ctx = Ctx(record=True, train=False, param_dtype=param_dtype)
    jax.eval_shape(lambda *a: apply_fn(ctx, *a, **apply_kwargs), *example_args)

    flat = [
        (name, leaf, spec)
        for name in sorted(ctx.param_specs)
        for leaf, spec in sorted(ctx.param_specs[name].items())
    ]
    try:
        # local_devices, not devices: under a multi-process runtime the
        # global list starts with process 0's devices, and materializing on
        # another process's (non-addressable) device wedges the first
        # cross-process collective
        host = jax.local_devices(backend="cpu")[0]
    except RuntimeError:  # CPU backend disabled: materialize on the default
        host = None

    with contextlib.ExitStack() as stack:
        if host is not None:
            # default_device (not device_put) keeps every array UNCOMMITTED:
            # a committed-to-CPU pytree would pin later jit computations to
            # the CPU backend instead of transferring to the accelerator.
            stack.enter_context(jax.default_device(host))
            # pull the key's bytes to host ONCE so the per-leaf fold_ins
            # don't each round-trip an accelerator-resident key
            if jnp.issubdtype(getattr(rng, "dtype", None), jax.dtypes.prng_key):
                rng = jax.random.wrap_key_data(
                    jnp.asarray(jax.device_get(jax.random.key_data(rng)))
                )
            else:
                rng = jnp.asarray(jax.device_get(rng))
        params: dict[str, dict[str, jnp.ndarray]] = {}
        for i, (name, leaf, spec) in enumerate(flat):
            key = jax.random.fold_in(rng, i)
            params.setdefault(name, {})[leaf] = initializers.get(spec.init)(
                key, spec.shape, spec.dtype
            )

        state: dict[str, dict[str, jnp.ndarray]] = {}
        for name in sorted(ctx.state_specs):
            for leaf, (shape, fill) in sorted(ctx.state_specs[name].items()):
                state.setdefault(name, {})[leaf] = jnp.full(shape, fill, jnp.float32)
    return params, state


def maybe_remat(ctx: "Ctx", fn: Callable, x):
    """Apply ``fn(ctx, x)`` under jax.checkpoint when ctx.remat is set.

    The TPU-memory lever for DenseNet training: dense blocks concatenate
    features layer over layer, so saving every conv-block activation for the
    backward pass dominates HBM; rematerializing each block trades ~1 extra
    forward for O(depth) less live memory (SURVEY.md §7: jax.checkpoint /
    rematerialisation to trade FLOPs for memory). Closed-over parameters are
    residuals, not recomputed. BN-statistics updates produced inside the
    block are threaded through the checkpoint boundary as explicit outputs
    (side-channel writes would leak tracers) and merged back into the parent
    Ctx; dropout inside the block draws from a PRNG key folded off the
    parent stream so remat on/off keeps identical randomness structure.
    """
    if not ctx.remat or ctx.record:
        return fn(ctx, x)

    base_rng = None
    if ctx.rng is not None:
        ctx._rng_count += 1
        base_rng = jax.random.fold_in(ctx.rng, ctx._rng_count)

    def inner(x):
        sub = Ctx(
            ctx.params,
            ctx.state,
            train=ctx.train,
            rng=base_rng,
            compute_dtype=ctx.compute_dtype,
            param_dtype=ctx.param_dtype,
            remat=False,
        )
        y = fn(sub, x)
        return y, sub.new_state

    if getattr(ctx, "remat_policy", "full") == "convs":
        # selective: conv outputs (tagged 'conv_out' in layers.conv) are
        # saved as residuals; only the elementwise chains recompute
        policy = jax.checkpoint_policies.save_only_these_names("conv_out")
        y, new_state = jax.checkpoint(inner, policy=policy)(x)
        for name, leaves in new_state.items():
            ctx.new_state.setdefault(name, {}).update(leaves)
        return y

    y, new_state = jax.checkpoint(inner)(x)
    for name, leaves in new_state.items():
        ctx.new_state.setdefault(name, {}).update(leaves)
    return y


def merge_state(state, new_state):
    """Merge functional BN-stat updates back into the full state pytree."""
    out = {k: dict(v) for k, v in state.items()}
    for name, leaves in new_state.items():
        out.setdefault(name, {}).update(leaves)
    return out


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))
