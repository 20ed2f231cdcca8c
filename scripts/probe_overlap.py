"""Can a D2H fetch ride the tunnel WHILE the device executes other work?

Premise for the cross-modality extraction pipeline (r4): the text stage is
D2H-floor-bound (~0.4-1.0 s for its contract-fixed 11.4 MB layer stack)
and the video stage is ~19 s of pure device compute.  If the tunnel
transfers concurrently with execution, running the stages overlapped hides
the whole text/audio host+wire cost behind video and the headline becomes
video-wall-only.  If the runtime serializes D2H with execution, the
overlap driver is worthless — measure before building.

Method: dispatch a long chained matmul loop (N steps, output feeds input —
dedup-proof), then immediately np.asarray() a FRESH previously-computed
11.4 MB bf16 array from a separate buffer.  Compare:
  a) fetch wall-time with the device busy
  b) fetch wall-time with the device idle
  c) busy-loop wall-time alone vs busy-loop + fetch total
Concurrent if (c_total ~= busy_alone) and (a ~= b).
"""

import sys
import time

sys.path.insert(0, ".")

import algonauts2025_tpu  # noqa: F401  (persistent XLA cache)
import jax
import jax.numpy as jnp
import numpy as np

dev = jax.devices()[0]
print(f"device: {dev}", flush=True)

# ~11.4 MB bf16, the text-stage fetch shape
FETCH_SHAPE = (29, 64, 3072)


@jax.jit
def make_fetch(seed):
    k = jax.random.PRNGKey(seed)
    return jax.random.normal(k, FETCH_SHAPE, dtype=jnp.bfloat16)


@jax.jit
def busy(x, n):
    def body(_, a):
        return jnp.tanh(a @ a)

    return jax.lax.fori_loop(0, n, body, x)


x0 = jax.device_put(np.random.default_rng(0).standard_normal((4096, 4096), dtype=np.float32))
# warm up (compile) OUTSIDE the calibration window, then calibrate on a
# CHAINED input (output feeds input) so the remote runtime cannot dedup
# the execution (CLAUDE.md r3: repeated identical executions are deduped).
r = busy(x0, 5)
_ = float(r[0, 0])
t0 = time.time()
r = busy(r, 100)
_ = float(r[0, 0])
per = (time.time() - t0) / 100
n_busy = max(10, int(8.0 / per))
print(f"busy: {per*1e3:.2f} ms/iter -> n={n_busy}", flush=True)

# busy-alone reference, measured for real (chained input, no dedup)
t0 = time.time()
r = busy(r, n_busy)
_ = float(r[0, 0])
busy_alone = time.time() - t0
print(f"busy alone: {busy_alone:.3f}s", flush=True)

# (b) idle-device fetch baseline (fresh array per fetch — host copies cache)
idle = []
for s in range(3):
    a = make_fetch(s)
    _ = float(a[0, 0, 0])  # ensure computed
    t0 = time.time()
    np.asarray(a)
    idle.append(time.time() - t0)
print(f"idle fetch: {sorted(idle)} s", flush=True)

# (a)+(c): busy-device fetch.  Each trial chains the busy input from the
# previous result so every execution is unique (dedup-proof).
for trial in range(3):
    a = make_fetch(10 + trial)
    _ = float(a[0, 0, 0])
    t0 = time.time()
    fut = busy(r, n_busy)  # async dispatch
    t_dispatch = time.time() - t0
    t1 = time.time()
    np.asarray(a)
    t_fetch = time.time() - t1
    _ = float(fut[0, 0])
    t_total = time.time() - t0
    r = fut
    print(
        f"trial {trial}: dispatch {t_dispatch:.3f}s fetch-under-load {t_fetch:.3f}s "
        f"total {t_total:.3f}s (busy alone {busy_alone:.2f}s)",
        flush=True,
    )

print("verdict: CONCURRENT if fetch-under-load ~= idle fetch and total ~= busy alone", flush=True)
