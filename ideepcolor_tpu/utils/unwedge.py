"""Self-recovery for the wedged-first-dispatch failure mode.

On a tunnel-attached device, a freshly started process's FIRST dispatch
can wedge indefinitely (sleeping, ~0 CPU) while the device server works
through the previous holder's claim — measured r5: 8 s best case,
100-370 s after heavy or ungracefully-killed holders, and occasionally
stuck until a second tiny jax process (a "nudge") joins the claim queue,
which reliably un-sticks it (observed across bench, serve and train
runs; see CLAUDE.md).

``guard()`` arms a watchdog thread around the first device touch: if it
hasn't been disarmed within ``stall_s``, fire a nudge subprocess (up to
``attempts`` times). Nudges are SIGINT-self-limited via ``timeout`` so
an orphaned nudge (e.g. the caller hard-exited) drains from the claim
queue gracefully instead of blocking the next TPU process.

Used by bench.py and the training/eval CLIs; serving boots instead rely
on accept-early 503s plus ready_probe's stage decomposition (a nudge
from inside the serving process would race its own warmup).
"""

import os
import signal
import subprocess
import sys
import threading


def guard(stall_s: float = 120.0, attempts: int = 5,
          label: str = "first dispatch"):
    """Arm the watchdog. Returns a ``disarm()`` callable to invoke once
    the first dispatch+readback completes; ``disarm.thread`` exposes the
    watchdog thread so tests can join it before asserting call counts.

    The default 2-minute stall avoids spurious nudges on a merely-cold
    compile cache (a cold first compile is ~20-40 s); unattended runs
    with tight budgets pass a smaller ``stall_s``.
    """
    done = threading.Event()

    def watchdog():
        for attempt in range(1, attempts + 1):
            if done.wait(stall_s):
                return
            print(f"# {label} stalled >{stall_s:.0f}s (wedged "
                  f"tunnel, or an unusually slow cold start); "
                  f"nudge attempt {attempt}/{attempts}", file=sys.stderr)
            try:
                # self-limiting (timeout -s INT -k 20): an orphaned
                # nudge must not sit in the device-claim queue blocking
                # the next TPU process (observed r5: a 14-minute
                # orphan). SIGINT at 400 s lets python exit gracefully
                # rather than re-wedging the tunnel with another
                # ungraceful kill; -k 20 makes `timeout` SIGKILL a
                # nudge so wedged it can't even process the SIGINT.
                # own session so the last-resort killpg below reaps the
                # python itself, not just the `timeout` wrapper.
                p = subprocess.Popen(
                    ["timeout", "-k", "20", "-s", "INT", "400",
                     sys.executable, "-c",
                     "import jax, jax.numpy as jnp, numpy;"
                     "numpy.asarray(jnp.ones(()))"],
                    stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                    start_new_session=True)
                try:
                    p.wait(timeout=440)
                except subprocess.TimeoutExpired:
                    try:
                        os.killpg(p.pid, signal.SIGKILL)
                    except (ProcessLookupError, PermissionError):
                        p.kill()
                    p.wait(timeout=30)
                    print("# nudge timed out after 440s and its whole "
                          "process group was killed mid-dispatch — "
                          "this is itself an ungraceful TPU-process "
                          "kill and may re-wedge the next dispatch",
                          file=sys.stderr)
            except Exception as e:
                print(f"# nudge subprocess failed: "
                      f"{type(e).__name__}: {str(e)[:120]}",
                      file=sys.stderr)

    t = threading.Thread(target=watchdog, daemon=True)
    t.start()

    def disarm():
        done.set()
        # don't orphan an in-flight nudge: it completes in seconds once
        # the tunnel works (disarm means our own dispatch just finished);
        # bounded so disarm can't hang the caller
        t.join(60.0)

    disarm.thread = t
    return disarm


def warm_first_dispatch(stall_s: float | None = None,
                        label: str = "first dispatch"):
    """Complete one tiny jitted dispatch+readback under the watchdog.

    The whole arm → dispatch → disarm protocol in one call, so every CLI
    (train, eval, bench) warms the tunnel the same way. ``stall_s``
    defaults to the ``IDEEPCOLOR_UNWEDGE_STALL_S`` env var (240 s — a
    cold first compile is ~20-40 s, so this never fires spuriously).
    """
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    if stall_s is None:
        stall_s = float(os.environ.get("IDEEPCOLOR_UNWEDGE_STALL_S", "240"))
    disarm = guard(stall_s=stall_s, label=label)
    try:
        np.asarray(jax.jit(lambda x: x + 1.0)(jnp.zeros((2,), jnp.float32)))
    finally:
        disarm()
