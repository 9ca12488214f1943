"""`dglke_tpu-dist_train` — multi-host launcher.

The reference launcher (dist_train.py) generates a shell script per machine
that starts KV servers + clients over SSH.  The TPU-native design has no
parameter server: every host runs the SAME SPMD program under
`jax.distributed.initialize`, with the entity table sharded over the global
mesh and each host feeding its edge partition.  This launcher:

  1. reads `ip_config.txt` ("ip [port] [count]" lines, reference format),
  2. scp's nothing (the repo is assumed present at --path on every host),
  3. ssh-launches `python -m dglke_tpu.cli.train --dist ...` on each host
     with coordinator/process-id env vars,
  4. waits and propagates failures (like dist_train.py:93-99).

On a TPU pod slice where hosts are provisioned by the platform runtime,
step 3 is usually unnecessary — run train with --dist on every host — but
the SSH path mirrors the reference's workflow for bare clusters.
"""

from __future__ import annotations

import argparse
import os
import shlex
import subprocess
import sys
import time
from typing import List, Tuple


def read_ip_config(path: str) -> List[Tuple[str, int]]:
    """Lines: "ip [port] [server_count]"; we need ip (+optional port)."""
    out = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            ip = parts[0]
            port = int(parts[1]) if len(parts) > 1 else 2379
            out.append((ip, port))
    return out


def construct_cmd(args, rank: int, coordinator: str) -> str:
    passthrough = list(args.train_args or [])
    if passthrough and passthrough[0] == "--":
        passthrough = passthrough[1:]  # a '--' separator must not reach
        # the remote train parser (it rejects positional tokens)
    quoted = " ".join(shlex.quote(a) for a in passthrough)
    cmd = (f"cd {shlex.quote(args.path)} && "
           f"JAX_COORDINATOR_ADDRESS={coordinator} "
           f"JAX_NUM_PROCESSES={args.num_hosts} "
           f"JAX_PROCESS_ID={rank} "
           f"{sys.executable} -m dglke_tpu.cli.train --dist " + quoted)
    return cmd


def main(argv=None):
    p = argparse.ArgumentParser("dglke_tpu-dist_train")
    p.add_argument("--path", type=str, required=True,
                   help="workspace path on every machine")
    p.add_argument("--ip_config", type=str, required=True)
    p.add_argument("--ssh_key", type=str, default=None)
    p.add_argument("--user", type=str, default=None)
    # everything not recognized here is forwarded to dglke_tpu-train on
    # every host ('--' separator optional): argparse.REMAINDER cannot
    # capture option-like tokens, so parse_known_args does the split
    args, extra = p.parse_known_args(argv)
    args.train_args = extra

    hosts = read_ip_config(args.ip_config)
    args.num_hosts = len(hosts)
    coordinator = f"{hosts[0][0]}:{hosts[0][1]}"

    procs = []
    for rank, (ip, _port) in enumerate(hosts):
        cmd = construct_cmd(args, rank, coordinator)
        # -tt: allocate a pty so terminating the local ssh client tears
        # down the REMOTE rank too (otherwise sshd leaves it running,
        # wedged in a collective)
        ssh = ["ssh", "-tt", "-o", "StrictHostKeyChecking=no"]
        if args.ssh_key:
            ssh += ["-i", args.ssh_key]
        target = f"{args.user}@{ip}" if args.user else ip
        procs.append(subprocess.Popen(ssh + [target, cmd]))
        print(f"launched rank {rank} on {ip}")

    # Fail fast: a dead rank stalls the surviving ranks' collectives, so
    # on the first non-zero exit terminate the rest (the reference only
    # waits, dist_train.py:93-99, leaving the cluster wedged).  The
    # finally block also reaps every rank on Ctrl-C / unexpected errors.
    rc = 0
    live = dict(enumerate(procs))
    try:
        while live and rc == 0:
            for rank, proc in list(live.items()):
                code = proc.poll()
                if code is None:
                    continue
                del live[rank]
                if code != 0:
                    print(f"rank {rank} failed with exit code {code}; "
                          f"terminating remaining ranks", file=sys.stderr)
                    rc = code
            if rc == 0 and live:
                time.sleep(0.5)
    finally:
        for proc in live.values():
            proc.terminate()
        for proc in live.values():
            proc.wait()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
