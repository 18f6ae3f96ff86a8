"""Host-CPU yield daemon: freeze the CPU insurance run while a TPU client
is live.

Round-3 incident log (PERF.md): the axon TPU tunnel's RPC stream wedges
when the single host core is saturated by concurrent CPU work (a 1080^2
XLA CPU compile stalled a live TPU training run's readbacks until the
relay died).  During the long tunnel outage we run a medium-scale CPU
parity run as evidence insurance (configs/m512_synth.json) — but the
moment the tunnel returns, the unattended watchdog relaunches full-scale
TPU training on this same host, and the insurance run's 100%-CPU XLA
work would re-create exactly the wedge that killed the last run.

This daemon arbitrates: while any TPU-holding pid (the watchdog's
training child or the job queue's current job) is alive, the insurance
pid is SIGSTOPped; when no TPU client is alive (tunnel down / between
jobs), it is SIGCONTed so the CPU evidence keeps accruing.  SIGSTOP
rather than SIGTERM because the insurance run loses nothing — it simply
resumes mid-iteration when the TPU goes quiet again.

The round driver's bench owns the TPU *and* wants a quiet host: it reaps
this daemon and the insurance run via pid files
(d3human_tpu/utils/run_guard.py — SIGTERM then SIGCONT, so a stopped
insurance process wakes up and exits instead of lingering frozen).

Usage:
    nohup python scripts/cpu_yield.py > /tmp/cpu_yield.log 2>&1 &
    echo $! > /tmp/cpu_yield.pid

Reads /tmp/cpu_insurance.pid (the CPU run to arbitrate) and the standard
TPU-holder pid files.  Exits when the insurance pid dies.
"""

from __future__ import annotations

import os
import signal
import sys
import time

INSURANCE_PID_FILE = "/tmp/cpu_insurance.pid"
TPU_HOLDER_PID_FILES = ("/tmp/watchdog_child.pid", "/tmp/tpu_job.pid")


def read_pid(path: str):
    try:
        return int(open(path).read().strip())
    except (OSError, ValueError):
        return None


def pid_alive(pid) -> bool:
    if pid is None:
        return False
    try:
        os.kill(pid, 0)
        return True
    except (ProcessLookupError, PermissionError):
        return False


def desired_state(tpu_holder_alive: bool) -> str:
    """Pure decision: 'stopped' while a TPU client holds the chip,
    'running' otherwise."""
    return "stopped" if tpu_holder_alive else "running"


def main(poll_s: float = 15.0) -> int:
    # The insurance pid FILE is re-read every poll: a completion guard
    # (scripts/m512_guard.sh) may relaunch the CPU run with a new pid, and
    # this daemon must keep arbitrating across those generations rather
    # than exit with the first one.
    ins = read_pid(INSURANCE_PID_FILE)
    state = "running"

    def _bail(signum, frame):
        # never leave the insurance run frozen on our way out
        if state == "stopped" and pid_alive(ins):
            os.kill(ins, signal.SIGCONT)
        sys.exit(0)

    signal.signal(signal.SIGTERM, _bail)
    print(f"[cpu_yield] arbitrating insurance pid file "
          f"{INSURANCE_PID_FILE} (current={ins})", flush=True)

    while True:
        cur = read_pid(INSURANCE_PID_FILE)
        if cur != ins:
            print(f"[cpu_yield] insurance pid {ins} -> {cur}", flush=True)
            ins, state = cur, "running"   # a fresh process starts running
        if not pid_alive(ins):
            time.sleep(poll_s)            # idle until the guard relaunches
            continue
        holder = any(pid_alive(read_pid(p)) for p in TPU_HOLDER_PID_FILES)
        want = desired_state(holder)
        if want != state:
            sig = signal.SIGSTOP if want == "stopped" else signal.SIGCONT
            try:
                os.kill(ins, sig)
                state = want
                print(f"[cpu_yield] insurance pid={ins} -> {want} "
                      f"(tpu holder alive={holder})", flush=True)
            except (ProcessLookupError, PermissionError):
                pass
        time.sleep(poll_s)


if __name__ == "__main__":
    sys.exit(main())
