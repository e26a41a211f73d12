"""Trustworthy device timing under async/tunneled runtimes.

``block_until_ready`` can return before real completion on relayed
backends (observed: apparent 3.8 PFLOP/s on a v5e), so wall-clock timing
of dispatches is meaningless. This harness:

1. chains N iterations *inside one jit* with a data dependency (each
   iteration's input is perturbed by a value derived from the previous
   output, so no iteration can be elided or overlapped away), and
2. fetches a scalar reduction of the final output to host (a real
   device->host readback cannot complete before the compute does).

``chain_time(fn, x, n)`` returns seconds per iteration of ``fn``.
"""
from __future__ import annotations

import functools
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def _chained(fn: Callable, n: int):
    @jax.jit
    def run(x0, *cargs):
        def body(_, carry):
            x, acc = carry
            y = fn(x, *cargs)
            # tanh(tiny) == 0.0 in f32, so s == 1.0 exactly, but XLA must
            # still materialize sum(y) before the next iteration
            s = jnp.tanh(jnp.sum(y).astype(jnp.float32) * 1e-30) + 1.0
            return x * s.astype(x.dtype), acc + jnp.sum(y).astype(
                jnp.float32)

        _, acc = jax.lax.fori_loop(0, n, body, (x0, jnp.float32(0)))
        return acc

    return run


def chain_time(fn: Callable, x, n: int = 32, warmup: int = 1,
               args: tuple = ()) -> float:
    """Seconds per iteration of ``y = fn(x, *args)``, measured honestly.

    Two-point calibration: relayed runtimes add a large fixed per-call
    latency (observed ~35ms through the axon tunnel), so we time chains
    of n and 2n iterations and report (T(2n) - T(n)) / n, which cancels
    the per-call constant exactly.

    Pass large device operands via ``args`` — NOT via closure — so they
    enter the jitted chain as parameters instead of being baked into the
    HLO as constants.
    """
    def timed(k):
        run = _chained(fn, k)
        for _ in range(warmup):
            np.asarray(run(x, *args))  # compile + one real execution
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            np.asarray(run(x, *args))  # readback forces real completion
            best = min(best, time.perf_counter() - t0)
        return best

    t_n = timed(n)
    t_2n = timed(2 * n)
    return max((t_2n - t_n) / n, 1e-9)


def chain_time_multi(fn: Callable, args: tuple, time_arg: int = 0,
                     n: int = 32, warmup: int = 1) -> float:
    """Like chain_time for fn(*args), chaining through args[time_arg]."""
    rest_before = args[:time_arg]
    x0 = args[time_arg]
    rest_after = args[time_arg + 1:]
    g = lambda x: fn(*rest_before, x, *rest_after)
    return chain_time(g, x0, n=n, warmup=warmup)
