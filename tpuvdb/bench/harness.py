"""Device-timing harness.

Through a remote-execution relay (and even on directly attached TPUs, for
sub-ms kernels), wall-clocking single dispatches measures the host, not the
device. `chained_timer` measures an op by chaining N iterations ON DEVICE
inside a fori_loop with a data dependency on the carry, reading back one
scalar: cost = (t[1+N] - t[1]) / N, min over repetitions. Both loop
variants are compiled before timing (iters is a static arg — forgetting
this put a full XLA compile inside the timed region once).
"""

from __future__ import annotations

import functools
import time
from typing import Callable, Sequence


def chained_timer(
    fn: Callable,
    args: Sequence,
    iters: int = 20,
    reps: int = 3,
) -> float:
    """Seconds per invocation of fn(q, *rest). args[0] must be a float
    array (it receives the carry perturbation); fn must return arrays."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(q, *rest, n):
        def body(_, carry):
            out = fn(q + carry * 1e-30, *rest)
            leaves = jax.tree_util.tree_leaves(out)
            acc = sum(jnp.sum(x).astype(jnp.float32) * 0.0 for x in leaves)
            return acc + carry
        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    q, rest = args[0], tuple(args[1:])
    float(loop(q, *rest, n=1))
    float(loop(q, *rest, n=1 + iters))
    best = float("inf")
    for _ in range(reps):
        t1 = time.perf_counter()
        float(loop(q, *rest, n=1))
        t1 = time.perf_counter() - t1
        t2 = time.perf_counter()
        float(loop(q, *rest, n=1 + iters))
        t2 = time.perf_counter() - t2
        best = min(best, (t2 - t1) / iters)
    return max(best, 1e-9)
