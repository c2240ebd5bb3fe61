"""Completion-verified benchmark timing for the axon TPU relay.

Through the relay ``jax.block_until_ready`` can return before execution
completes, so dispatch-then-block windows measure queueing, not compute
(the round-2 verdict caught a published number ~5.9x the chip's bf16
peak produced that way). The only trustworthy wall-clock recipe:

- device-resident inputs (``device_put`` before timing),
- CHAINED launches — launch i+1 consumes a scalar carry reduced from
  launch i's outputs, so the final carry transitively depends on every
  launch in the window,
- each timed window ends with a 4-byte host read of the carry, proving
  the window's launches all executed,
- analytic FLOPs (XLA ``cost_analysis``) convert the rate to an implied
  MFU; results over the chip's peak are refused outright.

The first host read of a process flips the relay into its degraded
launch mode (CLAUDE.md pathology 1); the flip is performed BEFORE
timing, so results are a lower bound on device capability but are real,
completion-verified throughput. For publishable numbers run trials in
fresh processes (the relay pins a process into a fast or slow mode at
random) and take the process-level median, as ``bench.py`` does.
"""

from __future__ import annotations

import time

import numpy as np

V5E_BF16_PEAK_FLOPS = 197e12


def bench_chained(step_fn, step_args, units_per_launch, windows=4,
                  k_per_window=8, peak_flops=V5E_BF16_PEAK_FLOPS):
    """AOT-compile ``step_fn(*step_args, carry, salt) -> carry`` (carry
    and salt int32 scalars) and time chained-launch windows, each
    completion-verified by a host read of the carry. Returns a dict with
    the median rate (units/s), launch latency, analytic FLOPs and
    implied MFU."""
    import jax
    import jax.numpy as jnp

    # flip the relay's read path up front so timed windows are all in
    # the same (degraded-but-readable) regime
    _ = np.asarray(jax.device_put(np.zeros((1,), np.float32)))

    step = jax.jit(step_fn)
    compiled = step.lower(*step_args, jnp.int32(0), jnp.int32(0)).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    flops = float(cost.get("flops", -1.0)) if cost else -1.0

    carry = compiled(*step_args, jnp.int32(0), jnp.int32(1))
    _ = int(np.asarray(carry))  # warmup launch + read

    rates = []
    salt = 2
    for _w in range(windows):
        t0 = time.perf_counter()
        for _ in range(k_per_window):
            salt += 1
            carry = compiled(*step_args, carry, jnp.int32(salt))
        _ = int(np.asarray(carry))  # proves completion of the chain
        dt = time.perf_counter() - t0
        rates.append(units_per_launch * k_per_window / dt)
    rates.sort()
    med = rates[len(rates) // 2]
    mfu = (med / units_per_launch * flops / peak_flops * 100.0
           if flops > 0 else None)
    if mfu is not None and mfu > 100.0:
        raise SystemExit(
            f"REFUSING impossible result: {med:.0f} units/s implies "
            f"{mfu:.0f}% MFU (> chip peak) — timing is not "
            f"completion-verified")
    return {"units_per_s": med, "launch_ms": units_per_launch / med * 1e3,
            "flops_per_launch": flops, "implied_mfu_pct": mfu,
            "window_rates": [round(r, 1) for r in rates]}
