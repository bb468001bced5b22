"""XLA-vs-Pallas microbenchmark for the two engine kernels, on the real
backend (TPU when available).

Decides (with numbers, not guesses) whether the production paths —
descriptor matching in ekf/measurement.py + frontend/pipeline.py and
RANSAC hypothesis scoring in vo/ransac.py — should route through the
Pallas kernels or stay on XLA, at production shapes. Run on TPU and
paste the table into BASELINE.md.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from pre3_tpu.ops.matching import match_descriptors, match_descriptors_pallas
from pre3_tpu.ops.ransac_score import (
    score_hypotheses_pallas, score_hypotheses_xla,
)


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return out, (time.perf_counter() - t0) / reps


def main():
    rng = np.random.default_rng(0)
    res = {"backend": jax.default_backend()}

    # ---- descriptor matching ----
    # production shapes: frontend frame-to-frame (256x256 .. 512x512) and
    # map-scale (K landmarks x frame features): 64..512 rows.
    jit_xla = jax.jit(lambda a, b: match_descriptors(a, b))
    for n1, n2 in [(64, 256), (256, 256), (512, 512), (2048, 2048),
                   (8192, 8192)]:
        d1 = jnp.asarray(rng.normal(size=(n1, 128)), jnp.float32)
        d2 = jnp.asarray(rng.normal(size=(n2, 128)), jnp.float32)
        mx, tx = timeit(jit_xla, d1, d2)
        tile1 = min(256, max(8, n1))
        tile2 = min(512, max(128, n2))
        mp, tp = timeit(
            lambda a, b: match_descriptors_pallas(
                a, b, tile_n1=tile1, tile_n2=tile2
            ),
            d1, d2,
        )
        agree = bool(jnp.mean(
            (mx.index == mp.index) | ~(mx.accepted & mp.accepted)
        ) > 0.999)
        res[f"match_{n1}x{n2}"] = {
            "xla_us": round(tx * 1e6, 1),
            "pallas_us": round(tp * 1e6, 1),
            "agree": agree,
        }
        print(f"match {n1}x{n2}: xla {tx*1e6:.0f}us pallas {tp*1e6:.0f}us "
              f"agree={agree}", flush=True)

    # ---- RANSAC hypothesis scoring ----
    thr = jnp.asarray(1e-3)
    for b, n in [(512, 256), (1024, 256), (2048, 512), (8192, 1024)]:
        r = jnp.tile(jnp.eye(3)[None], (b, 1, 1))
        t = jnp.asarray(rng.normal(scale=0.01, size=(b, 3)), jnp.float32)
        p1 = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
        p2 = p1 + jnp.asarray(
            rng.normal(scale=0.005, size=(n, 3)), jnp.float32
        )
        valid = jnp.ones((n,), bool)
        jx = jax.jit(score_hypotheses_xla)
        (sx, ex), tx = timeit(jx, r, t, p1, p2, valid, thr)
        (sp, ep), tp = timeit(
            lambda *a: score_hypotheses_pallas(*a, tile_b=256),
            r, t, p1, p2, valid, thr,
        )
        agree = bool(jnp.all(sx == sp))
        res[f"score_{b}x{n}"] = {
            "xla_us": round(tx * 1e6, 1),
            "pallas_us": round(tp * 1e6, 1),
            "agree": agree,
        }
        print(f"score {b}x{n}: xla {tx*1e6:.0f}us pallas {tp*1e6:.0f}us "
              f"agree={agree}", flush=True)

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
