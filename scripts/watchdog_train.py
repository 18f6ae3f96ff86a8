"""Failure-detecting watchdog for long TPU training runs.

Observed failure mode (twice in r3): the axon TPU tunnel's host relay dies
or its RPC stream wedges; the training process then sleeps forever in a
futex wait at 0% CPU with a healthy-looking process table — a 4-hour run
silently loses everything after its last checkpoint. The reference has no
equivalent (single local GPU), but elastic recovery is a first-class aux
subsystem for this framework (SURVEY §5): every stage checkpoints its full
TrainState and ``train_d3h.py --resume`` restarts any stage from the latest
one, so the watchdog only needs to detect the stall and relaunch.

    python scripts/watchdog_train.py --log /tmp/parity.log \
        --stale-min 10 -- \
        python train_d3h.py --config configs/f3c_synth.json --synthetic \
            --out-dir out/parity --resume

Detection:
  * log-staleness: no write to --log for --stale-min minutes -> kill+resume;
  * tunnel-death: TCP connect to the relay port fails -> hold the relaunch
    (a new process would hang in ``import jax``) and poll until the tunnel
    returns, then resume.
"""

from __future__ import annotations

import argparse
import os
import signal
import socket
import subprocess
import sys
import time


def tunnel_alive(port: int) -> bool:
    try:
        with socket.create_connection(("127.0.0.1", port), timeout=3):
            return True
    except OSError:
        return False


def log_age_s(path: str) -> float:
    try:
        return time.time() - os.path.getmtime(path)
    except OSError:
        return 0.0


def device_probe(timeout_s: float = 150.0) -> bool:
    """The axon relay can be HALF-dead: TCP accepts connections but the
    next client's backend init futex-waits forever (observed r4: the first
    trainer after an idle gap wedged at 0% CPU and cost one full stale-min
    window to detect). Probe with a disposable subprocess running one
    trivial device op — killing a hung probe is free, and the trainer only
    launches once a fresh client can actually reach the chip."""
    cmd = [sys.executable, "-c",
           "import jax; jax.numpy.zeros((1,)).block_until_ready(); "
           "print('probe-ok')"]
    try:
        r = subprocess.run(cmd, timeout=timeout_s, capture_output=True)
        return r.returncode == 0 and b"probe-ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def proc_tree_cpu_s(pid: int) -> float:
    """Cumulative CPU seconds (utime+stime) of ``pid`` AND its children,
    from /proc. The observed wedge (dead tunnel RPC stream) parks the
    trainer in a futex wait at 0% CPU; a long XLA compile of a full-scale
    step burns 100% host CPU for 10-20 min with zero log output. CPU-clock
    advance is the discriminator — a stale log alone is NOT a stall (this
    false-positive killed a full-scale compile mid-flight in r3).

    Children matter because the training command may be a wrapper (bash,
    timeout) around the real python process."""
    hz = os.sysconf("SC_CLK_TCK")
    total = 0.0
    pids = [pid]
    seen = set()
    while pids:
        p = pids.pop()
        if p in seen:
            continue
        seen.add(p)
        try:
            with open(f"/proc/{p}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            # fields after comm: state is parts[0]; utime/stime are 14/15
            # 1-indexed in proc(5) -> parts[11]/parts[12] here
            total += (int(parts[11]) + int(parts[12])) / hz
            with open(f"/proc/{p}/task/{p}/children") as f:
                pids.extend(int(c) for c in f.read().split())
        except (OSError, IndexError, ValueError):
            continue
    return total


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--log", required=True, help="training stdout/stderr log")
    p.add_argument("--stale-min", type=float, default=10.0)
    p.add_argument("--tunnel-port", type=int, default=8082,
                   help="axon relay port (0 disables the tunnel check)")
    p.add_argument("--poll-s", type=float, default=30.0)
    p.add_argument("--stall-cpu-s", type=float, default=5.0,
                   help="minimum CPU-seconds the child tree must accrue "
                        "per staleness window to count as alive")
    p.add_argument("--max-restarts", type=int, default=20)
    p.add_argument("--child-pid-file", default="/tmp/watchdog_child.pid",
                   help="records the live training child's pid so the "
                        "one-TPU-process reap (utils/run_guard.py) can "
                        "sweep stragglers")
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="-- training command (must be resumable)")
    args = p.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        p.error("no training command given after --")

    restarts = 0
    proc = None
    logf = None

    # The round driver's bench must be the only TPU client while it runs:
    # it SIGTERMs this watchdog via /tmp/watchdog.pid. Kill the child too
    # (training resumes from its stage checkpoint next launch) instead of
    # orphaning a live TPU process that would wedge the bench.
    def _terminate(signum, frame):
        if proc is not None and proc.poll() is None:
            print(f"[watchdog] SIGTERM: killing child pid={proc.pid}",
                  flush=True)
            proc.send_signal(signal.SIGTERM)
            try:
                proc.wait(timeout=20)
            except subprocess.TimeoutExpired:
                proc.kill()
        _clear_child_pid()
        sys.exit(2)

    def _clear_child_pid():
        try:
            os.remove(args.child_pid_file)
        except OSError:
            pass

    signal.signal(signal.SIGTERM, _terminate)

    while True:
        if proc is None:
            if args.tunnel_port and not tunnel_alive(args.tunnel_port):
                print(f"[watchdog] tunnel :{args.tunnel_port} down; waiting",
                      flush=True)
                time.sleep(args.poll_s)
                continue
            if args.tunnel_port and not device_probe():
                print("[watchdog] device probe hung/failed (half-dead "
                      "relay); retrying before launch", flush=True)
                time.sleep(args.poll_s)
                continue
            if restarts > args.max_restarts:
                print("[watchdog] restart budget exhausted", flush=True)
                return 1
            logf = open(args.log, "ab", buffering=0)
            proc = subprocess.Popen(cmd, stdout=logf, stderr=logf)
            with open(args.child_pid_file, "w") as pf:
                pf.write(str(proc.pid))
            print(f"[watchdog] launched pid={proc.pid} (restart {restarts})",
                  flush=True)
            restarts += 1
            cpu_mark = (0.0, time.time())   # (cpu_s at mark, wall at mark)
            time.sleep(args.poll_s)
            continue

        rc = proc.poll()
        if rc is not None:
            logf.close()
            _clear_child_pid()
            if rc == 0:
                print("[watchdog] training exited cleanly", flush=True)
                return 0
            print(f"[watchdog] training exited rc={rc}; relaunching",
                  flush=True)
            proc = None
            continue

        # Stall = stale log AND a stopped CPU clock. A busy child (XLA
        # compile, host-side mesh surgery) keeps its CPU clock advancing
        # even when it logs nothing; the wedge signature is 0% CPU.
        cpu_now = proc_tree_cpu_s(proc.pid)
        if cpu_now - cpu_mark[0] >= args.stall_cpu_s:
            cpu_mark = (cpu_now, time.time())
        cpu_stopped = time.time() - cpu_mark[1] > args.stale_min * 60
        stale = log_age_s(args.log) > args.stale_min * 60 and cpu_stopped
        dead_tunnel = args.tunnel_port and not tunnel_alive(args.tunnel_port)
        if stale or dead_tunnel:
            why = "stale log + stopped cpu clock" if stale else "tunnel down"
            print(f"[watchdog] {why}; killing pid={proc.pid}", flush=True)
            proc.send_signal(signal.SIGTERM)
            try:
                proc.wait(timeout=20)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait()
            logf.close()
            proc = None
            continue
        time.sleep(args.poll_s)


if __name__ == "__main__":
    sys.exit(main())
