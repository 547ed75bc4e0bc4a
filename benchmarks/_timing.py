"""Tunnel-safe measurement helpers shared by bench.py and benchmarks/.

One home for the measurement rules this environment imposes (established
round 3 after several confounded probes):

  * Every blocking host readback costs ~RTT_MS regardless of size —
    amortize with many dispatches per readback, or subtract it (clamped).
  * An OUTER lax.scan around a fast_rng mix program faulted the TPU
    worker (~30-40 min recovery) during the removed rbg-hardware-keys
    experiment.  Today's splitmix counter-hash path is not known to
    fault, but chained plain async dispatches — linked through a tiny
    data dependency so the device runs them back-to-back — measure
    identically with ONE readback at the end, so all fast_rng timing
    stays on that proven-safe shape.
  * The first trials after compile absorb server-side warmup: warm up
    twice, then take the best of `reps` timed trials.
"""
import time

import jax
import jax.numpy as jnp

RTT_MS = 31.0  # blocking host readback round-trip through the tunnel


def time_chained_dispatches(fn, key, images, inner, reps=3,
                            readout_scale=1e-9):
    """Best-of-`reps` wall seconds for `inner` chained dispatches of
    fn(key, images) -> images-like.

    Each dispatch folds the chain index into `key` and consumes the
    previous accumulator through `images + acc * 0.0`, so the dispatches
    serialize on device without an outer scan (see module doc) and only
    the final accumulator is read back (one RTT per chain).
    """
    @jax.jit
    def run_once(k, images, acc):
        out = fn(k, images + acc * 0.0)
        # full-batch sum: an out[0] readout lets XLA dead-code-eliminate
        # the other images' work for fusable elementwise pipelines
        # (observed: single-spec gaussian measured ~0 while the scanned
        # mix — which XLA cannot DCE per-step — measured it honestly)
        return acc + jnp.sum(out.astype(jnp.float32)) * readout_scale

    def chain(n):
        acc = jnp.float32(0)
        for i in range(n):
            acc = run_once(jax.random.fold_in(key, i), images, acc)
        return float(acc)

    chain(1)  # compile + warmup
    chain(2)  # second warmup (scheduler settle)
    best = float('inf')
    for _ in range(reps):
        t0 = time.perf_counter()
        chain(inner)
        best = min(best, time.perf_counter() - t0)
    return best


def ms_per_item_minus_rtt(best_s: float, n_items: int) -> float:
    """Convert a one-readback chain time to ms/item with the tunnel RTT
    subtracted, clamped at zero — without the clamp, stages cheaper than
    one RTT report negative per-item times that poison any cost
    attribution summed from them."""
    return max(best_s * 1000.0 - RTT_MS, 0.0) / n_items
