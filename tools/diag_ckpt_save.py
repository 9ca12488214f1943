"""Measure big-table checkpoint save time on the tunneled TPU (VERDICT
r4 #4: the 12M-entity record burned 376-3568 s per 6.1 GB save).

Builds a 12M x 128 fp32 state ON DEVICE (no upload), then times:
  A. the OLD monolithic path (one blocking device_get of the table);
  B. the streamed chunked path (utils.io._save_table — bounded-window
     concurrent fetches overlapping the file write);
  C. the raw d2h fetch rate at several chunk sizes and concurrency
     levels (what is the tunnel actually capable of?).

Appends one JSON line; run inside tools/tpu_hunt.sh.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_ROWS = 12_000_000
DIM = 128
GB = N_ROWS * DIM * 4 / 2**30


def main():
    from dglke_tpu.utils import io as io_mod

    key = jax.random.PRNGKey(0)
    emb = jax.jit(lambda k: jax.random.normal(
        k, (N_ROWS, DIM), jnp.float32) * 0.01)(key)
    float(np.asarray(emb[0, 0]))
    out_dir = "/tmp/diag_ckpt"
    os.makedirs(out_dir, exist_ok=True)
    results = {}

    # C: raw fetch rate — sequential single chunk, then concurrent
    import concurrent.futures as cf

    def fetch(a, b):
        return np.asarray(emb[a:b])

    chunk = io_mod._STREAM_CHUNK // (DIM * 4)
    t0 = time.time()
    fetch(0, chunk)
    dt = time.time() - t0
    results["seq_chunk_MBps"] = round(chunk * DIM * 4 / 2**20 / dt, 1)
    for workers in (2, 4, 8):
        t0 = time.time()
        with cf.ThreadPoolExecutor(workers) as ex:
            list(ex.map(lambda i: fetch(i * chunk, (i + 1) * chunk),
                        range(workers)))
        dt = time.time() - t0
        results[f"conc{workers}_MBps"] = round(
            workers * chunk * DIM * 4 / 2**20 / dt, 1)

    # B: streamed save of the full table
    t0 = time.time()
    io_mod._save_table(os.path.join(out_dir, "streamed.npy"), emb,
                       N_ROWS, DIM)
    results["streamed_save_s"] = round(time.time() - t0, 1)

    # A: the old monolithic path (device_get + astype + np.save)
    t0 = time.time()
    arr = np.asarray(jax.device_get(emb))[:N_ROWS, :DIM]
    io_mod._atomic_save(os.path.join(out_dir, "mono.npy"),
                        arr.astype(np.float32))
    results["mono_save_s"] = round(time.time() - t0, 1)
    del arr

    a = np.load(os.path.join(out_dir, "streamed.npy"), mmap_mode="r")
    b = np.load(os.path.join(out_dir, "mono.npy"), mmap_mode="r")
    results["identical"] = bool(
        np.array_equal(np.asarray(a[::100_000]), np.asarray(b[::100_000])))
    for f in ("streamed.npy", "mono.npy"):
        os.unlink(os.path.join(out_dir, f))

    rec = {"metric": "diag_ckpt_save", "rows": N_ROWS, "dim": DIM,
           "gib": round(GB, 2), "backend": jax.default_backend(),
           **results,
           "speedup": round(results["mono_save_s"]
                            / max(results["streamed_save_s"], 1e-9), 2),
           "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    print(json.dumps(rec), flush=True)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "session_r5_diag_ckpt_save.json"), "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
