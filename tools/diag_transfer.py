"""Diagnose the tunneled link's host->device transfer behavior.

The fused eval measures ~660 edges/s at FB15k shape while its device
compute is ~1 ms/call: time scales with uploaded bytes, not rows or
calls (tools/tpu_session.log 10:13).  Hypotheses to separate:
  (a) jit-arg numpy uploads pay a slow per-transfer path (small-chunk
      RPC with round trips) while bulk jax.device_put rides a fast one;
  (b) the link is uniformly slow for h2d (ruled out if device_put of
      100 MB is quick - bench.py's 98 MB triple upload already suggests
      this);
  (c) per-call dispatch latency dominates (ruled out if tiny-arg calls
      are fast).
Prints one line per probe; run inside a tools/tpu_session.sh window.
"""
import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np


def fence():
    # host-fetch fence: block_until_ready is unreliable over the tunnel
    return float(jnp.zeros(()).sum())


def main():
    dev = jax.devices()[0]
    print(f"device={dev.platform}")
    fence()

    # 1. bulk device_put bandwidth at several sizes
    for mb in (0.1, 1.0, 10.0, 100.0):
        n = int(mb * 1e6 / 4)
        x = np.ones((n,), np.float32)
        t0 = time.time()
        y = jax.device_put(x, dev)
        _ = float(y[0])  # fence on THIS buffer
        dt = time.time() - t0
        print(f"device_put {mb:6.1f} MB: {dt*1e3:8.1f} ms "
              f"({mb/dt:8.2f} MB/s)")

    # 2. jit call with NUMPY args (the eval path) vs DEVICE args,
    #    at the eval call's actual payload shape
    @jax.jit
    def f(h, r, t, fid, fm):
        return h.sum() + r.sum() + t.sum() + fid.sum() + fm.sum()

    for b in (64, 512):
        G, F = 32, 8
        h = np.ones((G, b), np.int64)
        fid = np.ones((G, b, F), np.int32)
        fm = np.ones((G, b, F), np.uint8)
        args = (h, h + 1, h + 2, fid, fm)
        nbytes = sum(a.nbytes for a in args)
        _ = float(f(*args))  # compile
        t0 = time.time()
        for _ in range(4):
            out = f(*args)
        _ = float(out)
        dt = (time.time() - t0) / 4
        print(f"jit numpy-args B={b} ({nbytes/1e3:.0f} KB): {dt*1e3:8.1f} ms/call")
        dargs = jax.device_put(args, dev)
        _ = float(f(*dargs))
        t0 = time.time()
        for _ in range(4):
            out = f(*dargs)
        _ = float(out)
        dt = (time.time() - t0) / 4
        print(f"jit device-args B={b}: {dt*1e3:8.1f} ms/call")

    # 3. per-arg cost: one fused arg vs five separate numpy args of the
    #    same total size (per-transfer round trips show up here)
    big = np.ones((5, 32, 512, 8), np.int32)
    parts = [big[i] for i in range(5)]

    @jax.jit
    def g1(x):
        return x.sum()

    @jax.jit
    def g5(a, b_, c, d, e):
        return a.sum() + b_.sum() + c.sum() + d.sum() + e.sum()

    _ = float(g1(big)); _ = float(g5(*parts))
    t0 = time.time()
    for _ in range(4):
        out = g1(big)
    _ = float(out)
    print(f"1 arg x {big.nbytes/1e3:.0f} KB: {(time.time()-t0)/4*1e3:8.1f} ms/call")
    t0 = time.time()
    for _ in range(4):
        out = g5(*parts)
    _ = float(out)
    print(f"5 args x {parts[0].nbytes/1e3:.0f} KB: {(time.time()-t0)/4*1e3:8.1f} ms/call")

    # 4. dispatch latency floor: tiny-arg jit call
    @jax.jit
    def tiny(x):
        return x + 1

    x = np.float32(1.0)
    _ = float(tiny(x))
    t0 = time.time()
    for _ in range(8):
        out = tiny(x)
    _ = float(out)
    print(f"tiny call: {(time.time()-t0)/8*1e3:8.1f} ms/call")

    # 5. d2h fetch cost at rank-array size
    y = jax.device_put(np.ones((32, 512), np.int32), dev)
    _ = float(y[0, 0])
    t0 = time.time()
    for _ in range(4):
        _ = np.asarray(y)
    print(f"fetch 64 KB: {(time.time()-t0)/4*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
