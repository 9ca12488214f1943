"""Shared TPU timing protocol for the tools/ benchmarks and diags.

The protocol is load-bearing (CLAUDE.md): on the tunneled test TPU,
``block_until_ready`` is unreliable, so completion must be forced by
FETCHING a scalar to the host; the link adds ~40 ms per device call,
which every scanned-loop measurement subtracts.  Keeping the protocol in
one place means a revision (e.g. a re-measured overhead constant)
changes every tool at once instead of drifting across copies.
"""

import time

# Measured fixed dispatch+fetch overhead of one device call over the
# tunneled link (tools/diag_transfer.py); subtracted from every
# one-call-many-steps measurement.
LINK_OVERHEAD_S = 0.040


def fetch_timed(run, steps, overhead_s=LINK_OVERHEAD_S):
    """Seconds per step of ``run``, a zero-arg callable that executes the
    jitted S-step loop AND forces completion by fetching a scalar
    (``float(...)``).  Calls it once to compile+warm, once timed."""
    run()
    t0 = time.time()
    run()
    return (time.time() - t0 - overhead_s) / steps


def train_step_harness(model, steps, *, n_ent=14951, n_rel=1345, b=1000,
                       seed=0):
    """The standard fixed-id scanned train-step loop: returns a jitted
    ``loop(state) -> last-step loss`` over ``steps`` full train steps
    with host-fixed ids (negatives rotate per step so the scatter
    pattern is not degenerate).  Shared by capture_r3.step_model and the
    per-model step diags so their numbers are the same measurement."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    rng = np.random.RandomState(seed)
    h = jnp.asarray(rng.randint(0, n_ent, b), jnp.int32)
    r = jnp.asarray(rng.randint(0, n_rel, b), jnp.int32)
    t = jnp.asarray(rng.randint(0, n_ent, b), jnp.int32)
    neg = jnp.asarray(rng.randint(0, n_ent, b), jnp.int32)

    @jax.jit
    def loop(st):
        def body(st, i):
            st2, log = model.train_step(st, h, r, t, (neg + i) % n_ent,
                                        None, neg_head=False)
            return st2, log["loss"]
        st, losses = lax.scan(body, st, jnp.arange(steps))
        return losses[-1]

    return loop
