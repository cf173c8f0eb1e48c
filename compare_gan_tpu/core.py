"""Functional parameter/state core for compare_gan_tpu.

A minimal, JAX-native module system. Models are plain Python functions that
declare parameters and mutable state through a thread-local build context;
`init` traces the function to create the variable pytrees and `apply` runs it
purely, returning updated state explicitly. This mirrors the reference
framework's variable_scope discipline (compare_gan/architectures/
abstract_arch.py:30-74) — names are '/'-joined scope paths so golden
variable-name tests translate directly — while staying a pure-function design
that composes with jax.jit / jax.grad / pjit.

State (spectral-norm `u` vectors, batch-norm moving averages and
accumulators, EMA shadows) is explicit: `apply` returns `(out, new_state)`
and the caller decides which forward passes commit their updates. This
resolves the reference's benign-update-race semantics (SURVEY.md §7 "hard
parts") deterministically.
"""

from __future__ import annotations

import contextlib
import dataclasses
import threading
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
Params = Dict[str, Array]
State = Dict[str, Array]

_local = threading.local()


@dataclasses.dataclass
class _Ctx:
    mode: str  # "init" | "apply"
    params: Dict[str, Array]
    state: Dict[str, Array]
    new_state: Dict[str, Array]
    rng: Optional[Array]
    scopes: list
    rng_counter: int = 0
    # Orders in which variables were created (stable iteration for tests).
    created: Optional[list] = None
    # When True, set_state is a no-op (reads still see latest commits).
    freeze_state: bool = False
    # Trace-time structural facts recorded by ops (e.g. "batch_coupled"
    # from a training-mode batch norm). Unlike state writes these survive
    # freeze_state — they describe the computation's structure, not its
    # committed values.
    tags: set = dataclasses.field(default_factory=set)


def _ctx() -> _Ctx:
    ctx = getattr(_local, "ctx", None)
    if ctx is None:
        raise RuntimeError(
            "No build context: call this function via core.init or core.apply."
        )
    return ctx


def in_context() -> bool:
    return getattr(_local, "ctx", None) is not None


def is_initializing() -> bool:
    """True while tracing under core.init (enables data-dependent init)."""
    ctx = getattr(_local, "ctx", None)
    return ctx is not None and ctx.mode == "init"


@contextlib.contextmanager
def scope(name: str):
    """Name scope; nests like TF variable_scope (abstract_arch.py:71-74)."""
    ctx = _ctx()
    ctx.scopes.append(name)
    try:
        yield
    finally:
        ctx.scopes.pop()


def current_scope() -> str:
    ctx = _ctx()
    return "/".join(ctx.scopes)


def _full_name(name: str) -> str:
    ctx = _ctx()
    return "/".join(ctx.scopes + [name])


def next_rng_key() -> Array:
    """Fresh PRNG key during init (for weight initialization)."""
    ctx = _ctx()
    if ctx.rng is None:
        raise RuntimeError("next_rng_key() requires an rng passed to core.init.")
    ctx.rng_counter += 1
    return jax.random.fold_in(ctx.rng, ctx.rng_counter)


def param(name: str, shape, init: Callable, dtype=jnp.float32) -> Array:
    """Declare/fetch a trainable parameter at the current scope."""
    full = _full_name(name)
    ctx = _ctx()
    if ctx.mode == "init":
        if full not in ctx.params:
            ctx.params[full] = init(next_rng_key(), tuple(shape), dtype)
            if ctx.created is not None:
                ctx.created.append(full)
        return ctx.params[full]
    try:
        return ctx.params[full]
    except KeyError:
        raise KeyError(
            f"Parameter '{full}' missing from params pytree. "
            f"Known: {sorted(ctx.params)[:8]}..."
        ) from None


def get_state(name: str, shape=None, init: Optional[Callable] = None,
              dtype=jnp.float32) -> Array:
    """Declare/fetch a non-trainable state variable (BN stats, SN u, ...).

    Reads see the *latest* value written this call (so sequential layers
    observe each other's updates within one forward, like TF assigns).
    """
    full = _full_name(name)
    ctx = _ctx()
    if full in ctx.new_state:
        return ctx.new_state[full]
    if ctx.mode == "init":
        if full not in ctx.state:
            if init is None:
                raise ValueError(f"State '{full}' needs an init fn at creation.")
            key = next_rng_key() if ctx.rng is not None else None
            ctx.state[full] = init(key, tuple(shape), dtype)
            if ctx.created is not None:
                ctx.created.append(full)
        return ctx.state[full]
    try:
        return ctx.state[full]
    except KeyError:
        raise KeyError(f"State '{full}' missing from state pytree.") from None


@contextlib.contextmanager
def no_state_updates():
    """Suppress set_state commits within scope. Used for forwards that must
    not commit stateful updates — e.g. the discriminator forward inside a
    gradient-penalty's inner jax.grad, whose values belong to a nested trace
    (reference: racing assigns, arch_ops.py:516-517; we pick the D-step
    forward as the committing one, SURVEY.md §7)."""
    ctx = _ctx()
    prev = ctx.freeze_state
    ctx.freeze_state = True
    try:
        yield
    finally:
        ctx.freeze_state = prev


def tag(name: str) -> None:
    """Record a structural trace-time tag at the current context.

    Ops call this to expose facts a caller cannot infer from state writes
    alone — e.g. `standardize_batch` tags "batch_coupled" whenever its
    output is normalized by the current batch's moments (is_training=True
    in BOTH moving-average and accumulator modes; the latter writes no
    state during training yet still couples examples — the write-detection
    hole found in round 2's review). Tags are scope-qualified (like
    variables) so a caller can attribute a tag to the module that raised
    it — a bare name would collapse G's and D's batch norms into one set
    entry and make "did *D* couple the batch?" undecidable. Tags are NOT
    suppressed by no_state_updates()."""
    _ctx().tags.add(_full_name(name))


def tags() -> frozenset:
    """The structural tags recorded so far in the active context."""
    return frozenset(_ctx().tags)


def set_state(name: str, value: Array) -> None:
    full = _full_name(name)
    ctx = _ctx()
    if ctx.freeze_state:
        return
    if ctx.mode == "init":
        # During init, record the post-forward value as the initial state
        # only if the variable exists; creation must go through get_state.
        if full not in ctx.state:
            raise KeyError(f"set_state on undeclared state '{full}'.")
    ctx.new_state[full] = value


def init(fn: Callable, rng: Optional[Array], *args, **kwargs
         ) -> Tuple[Any, Params, State]:
    """Trace `fn`, creating params/state. Returns (out, params, state)."""
    prev = getattr(_local, "ctx", None)
    ctx = _Ctx(mode="init", params={}, state={}, new_state={}, rng=rng,
               scopes=[], created=[])
    _local.ctx = ctx
    try:
        out = fn(*args, **kwargs)
    finally:
        _local.ctx = prev
    # State updates during the init trace do not overwrite initials; the
    # canonical initial state is the freshly created one.
    return out, ctx.params, ctx.state


def apply(fn: Callable, params: Params, state: State, *args, **kwargs
          ) -> Tuple[Any, State]:
    """Run `fn` purely. Returns (out, new_state) with ALL state entries
    present (updated where written, passthrough otherwise)."""
    prev = getattr(_local, "ctx", None)
    ctx = _Ctx(mode="apply", params=dict(params), state=dict(state),
               new_state={}, rng=None, scopes=[])
    _local.ctx = ctx
    try:
        out = fn(*args, **kwargs)
    finally:
        _local.ctx = prev
    new_state = dict(state)
    new_state.update(ctx.new_state)
    return out, new_state


def filter_prefix(tree: Dict[str, Array], prefix: str) -> Dict[str, Array]:
    """Sub-dict of variables whose name starts with `prefix + '/'`."""
    pre = prefix.rstrip("/") + "/"
    return {k: v for k, v in tree.items() if k.startswith(pre)}


def merge(*trees: Dict[str, Array]) -> Dict[str, Array]:
    out: Dict[str, Array] = {}
    for t in trees:
        out.update(t)
    return out


def count_params(params: Params) -> int:
    return sum(int(jnp.size(v)) for v in params.values())
