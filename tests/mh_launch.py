"""Shared launch harness for `jax.distributed` worker subprocesses.

One place for the worker-launch recipe (PYTHONPATH with repo + tests dirs,
JAX_PLATFORMS cleared so the worker picks its own backend, XLA_FLAGS popped
so the worker sets its own virtual device count) — imported by
tests/test_multihost.py AND scripts/certify_k17_multihost.py, so a recipe
change (e.g. the r5 XLA_FLAGS pop) propagates everywhere at once.

`multihost_worker.py` itself cannot host these helpers: it runs the job at
module top level, so importing it would launch a build.
"""

import os
import socket
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multihost_worker.py")


def free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_workers(nproc, worker_args, env_extra=None, timeout=300):
    """Launch multihost_worker.py once per pid and wait for all.

    ``worker_args``: the argv tail after `<pid> <nproc> <port>` (fasta, K,
    [chunk_windows] [checkpoint_every] [abort_after_saves]
    [fail_decode_pid]); values are str()-ed. Returns a list of
    (returncode, combined stdout+stderr text) in pid order.
    """
    port = free_port()
    env = {**os.environ, "JAX_PLATFORMS": "", "PYTHONPATH": os.pathsep.join(
        [os.path.dirname(HERE), HERE, os.environ.get("PYTHONPATH", "")]),
        **(env_extra or {})}
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(nproc), str(port),
             *map(str, worker_args)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for pid in range(nproc)
    ]
    outs = [p.communicate(timeout=timeout)[0].decode() for p in procs]
    return [(p.returncode, out) for p, out in zip(procs, outs)]
