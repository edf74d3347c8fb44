"""Benchmark: SOM batch-training throughput on the flagship workload.

Runs whole training epochs (fused BMU search + sufficient-statistics
update, on-device epoch loop) for the north-star configuration shape —
a 128×128 codebook over 64-dimensional fp32 samples (BASELINE.md) — on the
default JAX backend (the real TPU chip under the driver) and prints ONE
JSON line:

    {"metric": "som_batch_step_samples_per_sec_per_chip", "value": ...,
     "unit": "samples/s/chip", "vs_baseline": ...}

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
ratio is taken against the BASELINE.json north-star requirement expressed
per chip: 10^8 samples/epoch/min on a v5p-64 slice = 10^8 / 64 / 60
≈ 26,042 samples/s/chip on this workload. vs_baseline = value / 26042.

Synchronization note: ``block_until_ready`` is advisory on some tunneled
TPU transports, so timing syncs by fetching a reduction to host.

Timing method (round 3): two-depth SLOPE. Each timed dispatch carries a
per-dispatch constant R (tunnel round-trip + queue; 20-100 ms observed,
time-varying — BASELINE.md round-3 header) that direct per-epoch division
folds into the result. Timing the SAME compiled train_fn at two epoch
depths and dividing the time DELTA by the epoch delta cancels R exactly:

    per_epoch = (t(hi) - t(lo)) / (hi - lo)

Both depths are sampled in alternation within one window, min-of-3 each.
The direct (dispatch-inclusive) number is printed to stderr alongside.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

NORTH_STAR_SAMPLES_PER_SEC_PER_CHIP = 1e8 / 64 / 60  # BASELINE.json north star

METRIC = "som_batch_step_samples_per_sec_per_chip"
UNIT = "samples/s/chip"

# Second BASELINE.json metric (round 5, VERDICT r4 #6): BMU argmin
# throughput at the flagship search shape (16384 samples vs the 128×128
# codebook, D=64, packed mode). The reference publishes no number, so the
# anchor is this repo's first clean on-chip capture (round 3, BASELINE.md:
# 13.2 M searches/s at full fp32-equivalent fidelity) — the ratio tracks
# drift across rounds.
BMU_METRIC = "bmu_argmin_searches_per_sec"
BMU_UNIT = "searches/s"
BMU_BASELINE_SEARCHES_PER_SEC = 13.2e6


def _emit_error(msg):
    """Structured failure line (round-4, VERDICT r3 weak #2): when the
    backend is down the round's perf record should say so in the same
    JSON shape the driver parses, not die with a bare traceback."""
    print(
        json.dumps(
            {
                "metric": METRIC,
                "value": None,
                "unit": UNIT,
                "vs_baseline": None,
                "error": msg[:500],
            }
        )
    )


def _preflight(probe_timeout=None, retries=None, sleep_between=None):
    """Probe backend health in a SUBPROCESS before this process imports
    jax. A stranded axon relay claim hangs ``import jax`` for tens of
    minutes (CLAUDE.md); killing a hung *probe* subprocess is safe,
    killing a TPU-attached *run* is not — so the probe absorbs the risk.
    Bounded retry window (~6 min default) rides out transient relay
    outages like the one that turned BENCH_r03.json red; the
    XSOM_BENCH_PREFLIGHT_* env knobs widen it for manual captures during
    flappy windows."""
    if probe_timeout is None:
        probe_timeout = int(os.environ.get("XSOM_BENCH_PREFLIGHT_TIMEOUT", 60))
    if retries is None:
        retries = int(os.environ.get("XSOM_BENCH_PREFLIGHT_RETRIES", 4))
    if sleep_between is None:
        sleep_between = int(os.environ.get("XSOM_BENCH_PREFLIGHT_SLEEP", 75))
    code = "import jax, jax.numpy as jnp; print(float(jnp.sum(jnp.ones((8,128)))))"
    last = ""
    for attempt in range(retries):
        if attempt:
            time.sleep(sleep_between)
        try:
            proc = subprocess.run(
                [sys.executable, "-c", code],
                capture_output=True,
                text=True,
                timeout=probe_timeout,
            )
        except subprocess.TimeoutExpired:
            last = f"probe hung >{probe_timeout}s (relay claim stranded?)"
            print(f"preflight {attempt + 1}/{retries}: {last}", file=sys.stderr)
            continue
        if proc.returncode == 0:
            if attempt:
                print(
                    f"preflight recovered on attempt {attempt + 1}",
                    file=sys.stderr,
                )
            return True
        last = (proc.stderr or "").strip().splitlines()[-1:] or ["rc!=0"]
        last = last[0]
        print(f"preflight {attempt + 1}/{retries}: {last}", file=sys.stderr)
    _emit_error(f"backend preflight failed after {retries} attempts: {last}")
    return False


def main():
    import jax
    import jax.numpy as jnp

    from xpysom_dask_tpu.core import SomSpec, chunk_data, make_train_fn

    # env overrides for smoke-testing on small hosts; driver runs defaults
    x = y = int(os.environ.get("XSOM_BENCH_XY", 128))
    d = int(os.environ.get("XSOM_BENCH_D", 64))
    n = int(os.environ.get("XSOM_BENCH_N", 1 << 19))
    chunk = int(os.environ.get("XSOM_BENCH_CHUNK", 16384))
    epochs_warmup = 1
    # Two-depth slope (module docstring): the deep depth is the env knob
    # (smoke tests shrink it); the shallow depth scales with it.
    epochs_hi = int(os.environ.get("XSOM_BENCH_EPOCHS", 35))
    epochs_lo = max(1, epochs_hi // 7)
    reps = 3

    spec = SomSpec(
        x=x,
        y=y,
        input_len=d,
        sigma=x / 2,
        sigmaN=1.0,
        learning_rate=0.5,
        learning_rateN=0.01,
    )
    # schedule length (static); we time fresh slices of it — sized so the
    # warmup + all timed reps always stay inside the schedule
    num_epochs = max(128, epochs_warmup + reps * (epochs_lo + epochs_hi))

    rng = np.random.RandomState(0)
    data_np = rng.rand(n, d).astype(np.float32)
    chunks, mask, _ = chunk_data(data_np, chunk)
    chunks = jnp.asarray(chunks)
    mask = jnp.asarray(mask)
    w = jnp.asarray(rng.rand(x, y, d).astype(np.float32))

    train_fn = make_train_fn(spec, num_epochs)

    def sync(arr):
        return float(jnp.sum(arr))

    print(
        f"backend={jax.default_backend()} devices={jax.devices()} "
        f"workload: {x}x{y}x{d} SOM, N={n}, chunk={chunk}",
        file=sys.stderr,
    )

    w = train_fn(w, chunks, mask, jnp.int32(0), jnp.int32(epochs_warmup))
    sync(w)

    # Alternate depths within one window; min-of-reps per depth (the
    # minimum is the honest lower envelope under load-dependent queue
    # latency — 2 s -> 16 s round-trips observed, BASELINE.md). Each rep
    # times a fresh slice of the schedule, so decay math is real and the
    # compiled executable is the same object at both depths.
    t_min = {epochs_lo: float("inf"), epochs_hi: float("inf")}
    beg = epochs_warmup
    for _ in range(reps):
        for depth in (epochs_lo, epochs_hi):
            t0 = time.perf_counter()
            w = train_fn(
                w,
                chunks,
                mask,
                jnp.int32(beg),
                jnp.int32(beg + depth),
            )
            checksum = sync(w)
            t_min[depth] = min(t_min[depth], time.perf_counter() - t0)
            beg += depth

    direct = n * epochs_hi / t_min[epochs_hi]
    if epochs_hi > epochs_lo and t_min[epochs_hi] > t_min[epochs_lo]:
        per_epoch = (t_min[epochs_hi] - t_min[epochs_lo]) / (
            epochs_hi - epochs_lo
        )
        samples_per_sec = n / per_epoch
        method = "slope"
    else:
        # degenerate depths (smoke configs) or a window shift mid-run:
        # fall back to the dispatch-inclusive estimate
        samples_per_sec = direct
        method = "direct"

    print(
        f"t(lo={epochs_lo})={t_min[epochs_lo]:.3f}s "
        f"t(hi={epochs_hi})={t_min[epochs_hi]:.3f}s -> "
        f"{samples_per_sec:,.0f} samples/s/chip [{method}] "
        f"(dispatch-inclusive {direct:,.0f}; checksum {checksum:.1f})",
        file=sys.stderr,
    )

    # ---- metric 2: BMU argmin throughput (emitted BEFORE the headline
    # training metric — the driver reads the LAST line as the headline).
    # Method: r3_measure's inner-batched two-depth slope (a lax.scan runs
    # the kernel `inner` times per dispatch, iterations chained by a
    # ±1e-30 perturbation so XLA cannot hoist; the dispatch constant
    # cancels in the slope). Consumes idx only — the training-path
    # contract.
    try:
        # the scanned anti-hoisting harness is shared with the autotuner
        # (single source of truth for the timing trick); consume='idx'
        # times the training-path contract (indices only)
        from xpysom_dask_tpu.ops.pallas.autotune import _scanned_kernel

        sn = int(os.environ.get("XSOM_BENCH_SEARCH_N", 16384))
        sx = jnp.asarray(rng.rand(sn, d).astype(np.float32))
        w_flat = w.reshape(x * y, d)  # the just-trained codebook
        interp = jax.default_backend() != "tpu"  # CPU smoke only

        def run(inner):
            return float(
                _scanned_kernel(
                    "euclidean", sx, w_flat, None, None, interp, inner,
                    consume="idx",
                )
            )

        inner_lo, inner_hi = 8, 40
        if os.environ.get("XSOM_BENCH_SEARCH_INNER"):
            inner_hi = int(os.environ["XSOM_BENCH_SEARCH_INNER"])
            inner_lo = max(1, inner_hi // 5)
        tmin = {}  # min-of-3, NOT a median: slope math wants the
        # least-noise floor per depth (relay jitter only ever adds time)
        for inner in {inner_lo, inner_hi}:
            run(inner)  # warmup/compile
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                run(inner)
                ts.append(time.perf_counter() - t0)
            tmin[inner] = min(ts)
        if inner_hi > inner_lo:
            per_exec = (tmin[inner_hi] - tmin[inner_lo]) / (inner_hi - inner_lo)
        else:
            # degenerate depth (XSOM_BENCH_SEARCH_INNER=1): no slope is
            # possible — dispatch-inclusive estimate, like the headline
            # metric's 'direct' fallback
            per_exec = tmin[inner_hi] / inner_hi
        searches_per_sec = sn / per_exec if per_exec > 0 else None
        rate_s = (
            f"{searches_per_sec:,.0f}" if searches_per_sec else "n/a (slope<=0)"
        )
        print(
            f"BMU search: {sn}x{x * y}x{d} per_exec={per_exec * 1e3:.3f} ms "
            f"-> {rate_s} searches/s",
            file=sys.stderr,
        )
        print(
            json.dumps(
                {
                    "metric": BMU_METRIC,
                    "value": round(searches_per_sec, 1)
                    if searches_per_sec
                    else None,
                    "unit": BMU_UNIT,
                    "vs_baseline": round(
                        searches_per_sec / BMU_BASELINE_SEARCHES_PER_SEC, 3
                    )
                    if searches_per_sec
                    else None,
                }
            )
        )
    except Exception as e:  # metric 2 must never cost us the headline
        import traceback

        traceback.print_exc(file=sys.stderr)
        # the error detail stays on stderr: the JSON line keeps the
        # documented 4-key metric shape (tests/test_driver_contract.py)
        print(f"BMU search metric failed: {type(e).__name__}: {e}"[:500],
              file=sys.stderr)
        print(
            json.dumps(
                {
                    "metric": BMU_METRIC,
                    "value": None,
                    "unit": BMU_UNIT,
                    "vs_baseline": None,
                }
            )
        )

    print(
        json.dumps(
            {
                "metric": METRIC,
                "value": round(samples_per_sec, 1),
                "unit": UNIT,
                "vs_baseline": round(
                    samples_per_sec / NORTH_STAR_SAMPLES_PER_SEC_PER_CHIP, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    if not _preflight():
        sys.exit(1)
    try:
        main()
    except Exception as e:  # structured record even on mid-run failure
        import traceback

        traceback.print_exc(file=sys.stderr)
        _emit_error(f"{type(e).__name__}: {e}")
        sys.exit(1)
