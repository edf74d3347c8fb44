"""Round-3 wide-D scatter ranking: fused [x|1] vs split S/cnt, one window.

At D=512 the fused augmented scatter row is 513 lanes, which TPU HBM
layouts pad to 640 — a whole extra 128-lane tile of serial scatter RMW
traffic per row. The split formulation scatters S at exact 512 lanes and
cnt as a tiny (N,)->(XY,) add. Both are inlined below and ranked in ONE
window on the wide-D flagship (64x64x512, 32 chunks of 16384), slope
method per tools/r3_measure.py (t(8)-t(2))/6 cancels the per-dispatch
relay constant. Appends to tools/r3_results.jsonl.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from xpysom_dask_tpu.core import (  # noqa: E402
    SomSpec,
    _accumulate_stats,
    _bmu_chunk,
    _decays,
    _update_from_stats,
    chunk_data,
)
from tools.r3_measure import emit  # noqa: E402

LO, HI = 2, 8
REPS = 3
OUT = "tools/r3_results.jsonl"


def scanned(component, inner):
    @jax.jit
    def run(w, chunks, mask):
        def body(c, _):
            z = component(w * (1.0 + c), chunks, mask)
            return jnp.float32(1e-30) * jnp.tanh(z), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=inner)
        return c

    return run


def slope(component, args, label):
    med = {}
    rec = {
        "probe": "wide_scatter",
        "backend": jax.default_backend(),
        "label": label,
        "lo": LO,
        "hi": HI,
    }
    for inner in (LO, HI):
        fn = scanned(component, inner)
        t0 = time.perf_counter()
        float(fn(*args))
        rec[f"first_call_s_{inner}"] = round(time.perf_counter() - t0, 2)
        ts = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(fn(*args))
            ts.append(time.perf_counter() - t0)
        med[inner] = float(np.median(ts))
        rec[f"dispatch_ms_{inner}"] = round(med[inner] * 1e3, 3)
    per = (med[HI] - med[LO]) / (HI - LO)
    rec["per_epoch_ms"] = round(per * 1e3, 3)
    rec["overhead_ms"] = round((med[LO] - LO * per) * 1e3, 3)
    emit(OUT, rec)
    return rec


def main():
    import os

    # XSOM_WS_* overrides shrink the run for CPU smoke tests.
    x = y = int(os.environ.get("XSOM_WS_XY", 64))
    d = int(os.environ.get("XSOM_WS_D", 512))
    n = int(os.environ.get("XSOM_WS_N", 1 << 19))
    chunk = int(os.environ.get("XSOM_WS_CHUNK", 16384))
    spec = SomSpec(
        x=x, y=y, input_len=d, sigma=x / 2, sigmaN=1.0,
        learning_rate=0.5, learning_rateN=0.01,
    )
    dist = spec.distance_fn()
    xy = spec.xy
    num_epochs = 100

    rng = np.random.RandomState(0)
    data_np = rng.rand(n, d).astype(np.float32)
    chunks, mask, _ = chunk_data(data_np, chunk)
    chunks = jnp.asarray(chunks)
    mask = jnp.asarray(mask)
    w = jnp.asarray(rng.rand(x, y, d).astype(np.float32))

    print(f"backend={jax.default_backend()}", file=sys.stderr)

    def bmu_only(wp, cks, msk):
        w_flat = wp.reshape(xy, d)
        w_sq = jnp.sum(jnp.square(w_flat), axis=1, keepdims=True)

        def body(c, xs):
            xch, _ = xs
            bmu = _bmu_chunk(dist, xch, w_flat, w_sq, spec)
            return c + jnp.sum(bmu.astype(jnp.float32)), None

        z, _ = jax.lax.scan(body, jnp.float32(0.0), (cks, msk))
        return z

    def stats_fused(wp, cks, msk):
        # the single augmented-[x|1] scatter, inlined (513 -> 640 lanes)
        w_flat = wp.reshape(xy, d)
        w_sq = jnp.sum(jnp.square(w_flat), axis=1, keepdims=True)

        def body(carry, xs):
            xch, m = xs
            bmu = _bmu_chunk(dist, xch, w_flat, w_sq, spec)
            aug = (
                jnp.concatenate(
                    [xch, jnp.ones((xch.shape[0], 1), jnp.float32)], axis=1
                )
                * m[:, None]
            )
            part = jnp.zeros((xy, d + 1), dtype=jnp.float32).at[bmu].add(aug)
            return carry + part, None

        init = jnp.zeros((xy, d + 1), dtype=jnp.float32)
        acc, _ = jax.lax.scan(body, init, (cks, msk))
        return jnp.sum(acc)

    def stats_split(wp, cks, msk):
        # separate S (exact 512 lanes) + cnt scatters, inlined
        w_flat = wp.reshape(xy, d)
        w_sq = jnp.sum(jnp.square(w_flat), axis=1, keepdims=True)

        def body(carry, xs):
            s_acc, c_acc = carry
            xch, m = xs
            bmu = _bmu_chunk(dist, xch, w_flat, w_sq, spec)
            xm = xch * m[:, None]
            s_part = jnp.zeros((xy, d), dtype=jnp.float32).at[bmu].add(xm)
            c_part = jnp.zeros((xy,), dtype=jnp.float32).at[bmu].add(m)
            return (s_acc + s_part, c_acc + c_part), None

        init = (
            jnp.zeros((xy, d), dtype=jnp.float32),
            jnp.zeros((xy,), dtype=jnp.float32),
        )
        (s, cnt), _ = jax.lax.scan(body, init, (cks, msk))
        return jnp.sum(s) + jnp.sum(cnt)

    def full_epoch(wp, cks, msk):
        # routed: auto gate picks split at D=512
        w_flat = wp.reshape(xy, d)
        w_sq = jnp.sum(jnp.square(w_flat), axis=1, keepdims=True)
        eta, sig = _decays(spec, jnp.int32(3), num_epochs)
        s, cnt = _accumulate_stats(dist, w_flat, w_sq, cks, msk, xy, spec)
        new_flat = _update_from_stats(spec, w_flat, s, cnt, eta, sig)
        return jnp.sum(new_flat)

    args = (w, chunks, mask)
    nck = int(chunks.shape[0])
    r_bmu = slope(bmu_only, args, f"wideD_bmu_only_{nck}chunks")
    r_fused = slope(stats_fused, args, f"wideD_bmu+fused_scatter_{nck}chunks")
    r_split = slope(stats_split, args, f"wideD_bmu+split_scatter_{nck}chunks")
    r_epoch = slope(full_epoch, args, f"wideD_full_epoch_auto_{nck}chunks")

    n_eff = int(chunks.shape[0]) * chunk
    print(
        f"bmu={r_bmu['per_epoch_ms']} fused={r_fused['per_epoch_ms']} "
        f"split={r_split['per_epoch_ms']} epoch={r_epoch['per_epoch_ms']} "
        f"ms/epoch -> fused_scatter="
        f"{r_fused['per_epoch_ms'] - r_bmu['per_epoch_ms']:.2f} "
        f"split_scatter={r_split['per_epoch_ms'] - r_bmu['per_epoch_ms']:.2f} "
        f"| end-to-end {n_eff / r_epoch['per_epoch_ms'] * 1e3 / 1e6:.2f}M "
        f"samples/s/chip",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
