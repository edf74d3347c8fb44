"""Round-3 epoch anatomy, slope-decontaminated, post-Mosaic-scatter.

Decomposes the flagship training epoch (128x128x64 SOM, 32 chunks of
16384 rows) into slope-clean per-epoch components measured in ONE
window, each as a jitted scan whose body is the component applied to the
full 32-chunk epoch:

  bmu    — the BMU kernel scan only (consume winner-index sum)
  stats  — BMU + sufficient-statistics scatter (consume (S,cnt) sum)
  epoch  — the full epoch step incl. neighborhood update (consume W sum)

Differences localize the scatter cost and the update tail without
trusting any cross-window comparison. Method per tools/r3_measure.py:
t at inner depths (2, 8), slope = (t8 - t2) / 6 cancels the per-dispatch
relay constant. Results append to tools/r3_results.jsonl.
"""

import functools
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


def scanned_epoch_component(component, inner):
    """Jit ``inner`` repetitions of ``component(w, chunks, mask) -> scalar``,
    each iteration chained through a +-1e-30 perturbation of w."""

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
    rec = {"probe": "epoch_anatomy", "label": label, "lo": LO, "hi": HI}
    for inner in (LO, HI):
        fn = scanned_epoch_component(component, inner)
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
    x = y = 128
    d = 64
    n = 1 << 19
    chunk = 16384
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

    def stats_only(wp, cks, msk):
        w_flat = wp.reshape(xy, d)
        w_sq = jnp.sum(jnp.square(w_flat), axis=1, keepdims=True)
        s, cnt = _accumulate_stats(dist, w_flat, w_sq, cks, msk, xy, spec)
        return jnp.sum(s) + jnp.sum(cnt)

    def stats_xla_scatter(wp, cks, msk):
        # the XLA-scatter branch of _accumulate_stats, inlined so both
        # scatter variants can be ranked within one window
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

    def full_epoch(wp, cks, msk):
        w_flat = wp.reshape(xy, d)
        w_sq = jnp.sum(jnp.square(w_flat), axis=1, keepdims=True)
        eta, sig = _decays(spec, jnp.int32(3), num_epochs)
        s, cnt = _accumulate_stats(dist, w_flat, w_sq, cks, msk, xy, spec)
        new_flat = _update_from_stats(spec, w_flat, s, cnt, eta, sig)
        return jnp.sum(new_flat)

    def make_stats_fused(tiles):
        # VERDICT r2 #4 prototype: BMU + in-kernel stats scatter in ONE
        # Pallas kernel (ops/pallas/fused_stats.py); compare against
        # bmu+xla_scatter measured in the same window
        from xpysom_dask_tpu.ops.pallas.fused_stats import bmu_stats_fused

        def stats_fused(wp, cks, msk):
            w_flat = wp.reshape(xy, d)

            def body(carry, xs):
                xch, m = xs
                _, acc = bmu_stats_fused(xch, w_flat, m, tiles=tiles)
                return carry + acc, None

            init = jnp.zeros((xy, d + 1), dtype=jnp.float32)
            acc, _ = jax.lax.scan(body, init, (cks, msk))
            return jnp.sum(acc)

        return stats_fused

    args = (w, chunks, mask)
    r_bmu = slope(bmu_only, args, "bmu_only_32chunks")
    r_stats = slope(stats_only, args, "bmu+scatter_32chunks")
    r_xla = slope(stats_xla_scatter, args, "bmu+xla_scatter_32chunks")
    for tiles in ((1024, 512), (1024, 1024)):
        try:
            slope(
                make_stats_fused(tiles),
                args,
                f"bmu_fused_stats_{tiles[0]}x{tiles[1]}_32chunks",
            )
        except Exception as e:  # Mosaic VMEM reject is itself a result
            emit(OUT, {
                "probe": "epoch_anatomy",
                "label": f"bmu_fused_stats_{tiles[0]}x{tiles[1]}_32chunks",
                "error": f"{type(e).__name__}: {e}"[:300],
            })
    r_epoch = slope(full_epoch, args, "full_epoch_32chunks")

    print(
        f"bmu={r_bmu['per_epoch_ms']} stats={r_stats['per_epoch_ms']} "
        f"stats_xla={r_xla['per_epoch_ms']} "
        f"epoch={r_epoch['per_epoch_ms']} ms/epoch -> "
        f"scatter={r_stats['per_epoch_ms'] - r_bmu['per_epoch_ms']:.2f} "
        f"xla_scatter={r_xla['per_epoch_ms'] - r_bmu['per_epoch_ms']:.2f} "
        f"update_tail={r_epoch['per_epoch_ms'] - r_stats['per_epoch_ms']:.2f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
