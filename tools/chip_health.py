"""TPU chip/tunnel health probes, codifying the working patterns.

The tunneled single-chip axon backend fails in layers (observed over
rounds 1-2, most severe first):

  1. tunnel down: even backend INIT (``jax.devices()``) hangs — nothing
     TPU-side can run, cached or not;
  2. compile service down: init + cached programs run, any FRESH
     compile hangs at ~0 CPU (and can wedge the claim if killed softly);
  3. healthy.

Each probe runs in a subprocess with a hard timeout and a kill -9
fallback (hung claims ignore SIGTERM; killing by PID is safe, killing
by pattern is forbidden — it can match the caller's own command line).

Usage:
  python tools/chip_health.py probe          # one shot: prints the layer
  python tools/chip_health.py wait [N]       # poll every ~7 min until
                                             # healthy or N minutes pass
                                             # (default 180); exit 0 iff
                                             # a fresh compile succeeded

Exit codes: 0 healthy, 2 cached-only (compile service down), 3 init-only
(execution blocked), 4 tunnel down.

After any probe that timed out, expect the NEXT claim to block ~3 min
while the stale grant expires (CLAUDE.md "Wedged chip claim").
"""
import os
import signal
import subprocess
import sys
import tempfile
import time

INIT_SRC = """
import jax
print("INIT_OK", len(jax.devices()))
"""

# fixed tiny shapes: compiled many times before, hits the remote cache
CACHED_SRC = """
import numpy as np, jax, jax.numpy as jnp
r = np.asarray(jax.jit(lambda a, b: a @ b)(
    jnp.ones((8, 128), jnp.bfloat16), jnp.ones((128, 8), jnp.bfloat16)))
print("CACHED_OK", float(r.sum()))
"""

# time-salted shape: never cached, forces a fresh remote compile
FRESH_SRC = """
import time, numpy as np, jax, jax.numpy as jnp
m = 131 + (int(time.time()) % 97)
r = np.asarray(jax.jit(lambda a: (a @ a.T).sum())(
    jnp.ones((m, 257), jnp.bfloat16)))
print("FRESH_OK", float(r), m)
"""


def _run(src: str, timeout_s: int) -> bool:
    """Run probe source in a subprocess; kill -9 by PID on timeout."""
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(src)
        path = f.name
    try:
        proc = subprocess.Popen([sys.executable, path],
                                stdout=subprocess.PIPE,
                                stderr=subprocess.DEVNULL, text=True)
        try:
            out, _ = proc.communicate(timeout=timeout_s)
            return proc.returncode == 0 and "_OK" in out
        except subprocess.TimeoutExpired:
            os.kill(proc.pid, signal.SIGKILL)
            proc.wait()
            return False
    finally:
        os.unlink(path)


def probe(verbose: bool = True) -> int:
    """Return 0 healthy / 2 cached-only / 3 init-only / 4 tunnel down."""
    def say(msg):
        if verbose:
            print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)

    if not _run(INIT_SRC, 120):
        say("backend init hangs -> tunnel DOWN (layer 4)")
        return 4
    say("init ok")
    if not _run(CACHED_SRC, 180):
        say("cached op blocked -> execution blocked (layer 3)")
        return 3
    say("cached op ok")
    if not _run(FRESH_SRC, 240):
        say("fresh compile hangs -> compile service DOWN (layer 2)")
        return 2
    say("fresh compile ok -> HEALTHY")
    return 0


def wait(minutes: int) -> int:
    deadline = time.time() + minutes * 60
    while True:
        rc = probe()
        if rc == 0 or time.time() >= deadline:
            return rc
        time.sleep(420)


def main():
    cmd = sys.argv[1] if len(sys.argv) > 1 else "probe"
    if cmd == "probe":
        sys.exit(probe())
    if cmd == "wait":
        sys.exit(wait(int(sys.argv[2]) if len(sys.argv) > 2 else 180))
    print(__doc__)
    sys.exit(64)


if __name__ == "__main__":
    main()
