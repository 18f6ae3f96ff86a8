"""One-TPU-process guard: reap an unattended training stack via pid files.

The axon TPU tunnel supports exactly one client; two concurrent clients
contend and wedge the RPC stream (PERF.md incident log). Long unattended
runs are driven by scripts/watchdog_train.py + scripts/tpu_queue.sh, which
record their pids in well-known files. A process that must own the TPU
(bench.py, most importantly the round driver's benchmark run) calls
``reap_training_stack()`` before its first backend use: the stack is
SIGTERM'd via those pid files — never by process-name pattern — and
training resumes from its stage checkpoints on the next watchdog launch.
"""

from __future__ import annotations

import os
import signal
import sys
import time

# order matters: queue first (so it cannot launch the next job), then the
# watchdog (its SIGTERM handler kills its child), then stragglers, then
# the host-CPU arbitration pair (scripts/cpu_yield.py + the CPU insurance
# run it freezes) — the bench wants a quiet host core, not just a free TPU
PID_FILES = (
    "/tmp/queue.pid",
    "/tmp/tpu_queue.pid",      # scripts/tpu_queue.sh
    "/tmp/tpu_queue2.pid",     # scripts/tpu_queue2.sh (follow-up queue)
    "/tmp/watchdog.pid",
    "/tmp/watchdog_child.pid",
    "/tmp/tpu_job.pid",
    "/tmp/cpu_guard.pid",      # before the trainer: it relaunches on exit
    "/tmp/cpu_yield.pid",
    "/tmp/cpu_insurance.pid",
)


def _read_pid(path: str):
    try:
        return int(open(path).read().strip())
    except (OSError, ValueError):
        return None


def reap_training_stack(pid_files=PID_FILES, wait_s: float = 25.0,
                        log=sys.stderr) -> list:
    """SIGTERM every live pid in ``pid_files`` (skipping this process and
    its parent), wait up to ``wait_s`` for the TPU-holding ones to exit.
    Returns the list of pids signalled."""
    me = {os.getpid(), os.getppid()}
    reaped = []
    for pf in pid_files:
        pid = _read_pid(pf)
        if pid is None or pid in me:
            continue
        try:
            os.kill(pid, signal.SIGTERM)
        except (ProcessLookupError, PermissionError):
            continue
        try:
            # a SIGSTOPped target (cpu_yield freezes the insurance run
            # while a TPU client is live) never delivers the SIGTERM;
            # SIGCONT wakes it so it actually exits instead of lingering
            # frozen with the signal pending
            os.kill(pid, signal.SIGCONT)
        except (ProcessLookupError, PermissionError):
            pass
        reaped.append(pid)
        print(f"[run_guard] reaped {pf} pid={pid} (one-TPU-process rule)",
              file=log, flush=True)
    deadline = time.time() + wait_s
    holders = [p for p in pid_files
               if p.endswith(("watchdog_child.pid", "tpu_job.pid"))]
    while time.time() < deadline:
        alive = False
        for pf in holders:
            pid = _read_pid(pf)
            if pid is None or pid in me:
                continue
            try:
                os.kill(pid, 0)
                alive = True
            except (ProcessLookupError, PermissionError):
                pass
        if not alive:
            break
        time.sleep(0.5)
    return reaped
