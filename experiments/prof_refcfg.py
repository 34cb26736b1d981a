"""Decompose the per-iteration cost of the f64 reference-config GMRES
(n=300, m=50, order-2 Chebyshev) on the TPU.

Known: the full solve is ~15.1 s for 1200 inner iterations = 12.6 ms
per iteration (BENCH_r04.json decomposition), while the C++ baseline
does 7.9 ms/iter on CPU. This script measures each component with the
chained-slope method (utils/profiling.measure_bandwidth) so the ~30 ms
tunnel RTT cancels, passing all large operands as ARGUMENTS (CLAUDE.md
rule 10 — closure-captured matrices become XLA constants).
"""
import json
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
import gmres_tpu as gt
from gmres_tpu.ops import householder as wy
from gmres_tpu.ops.givens import givens_init, givens_step
from gmres_tpu.utils.profiling import measure_bandwidth

n, m = 300, 50
op = gt.poisson_operator(n)
m_inv = gt.chebyshev_preconditioner(op, 0.2, 8.2)

key = jax.random.PRNGKey(0)
rows = {}


def timed(label, fn, x, reps=50):
    r = measure_bandwidth(fn, x, bytes_moved=1, reps=reps)
    rows[label] = r["seconds"]
    print(f"{label:40s} {r['seconds']*1e3:9.4f} ms", flush=True)


for dtype in (jnp.float64, jnp.float32):
    tag = "f64" if dtype == jnp.float64 else "f32"
    P = jax.random.normal(key, (m + 1, n, n), dtype=dtype)
    P = P / jnp.sqrt(jnp.sum(P * P, axis=(1, 2), keepdims=True))
    T = jnp.triu(jnp.ones((m + 1, m + 1), dtype=dtype))
    v = jax.random.normal(key, (n, n), dtype=dtype)

    # 1. stencil (spectral radius 8 -> scale keeps the chain bounded)
    timed(f"stencil_{tag}", lambda u: op(u) / 8.0, v)
    # 2. cbpr2 (|mu| <= 0.49 -> x2 keeps it bounded)
    timed(f"cbpr2_{tag}", lambda u: m_inv(u) * 2.0, v)

    # 3/4. compact-WY products, P passed as argument
    timed(f"wy_apply_{tag}",
          lambda s: (s[0], s[1], wy.wy_apply(s[0], s[1], s[2])),
          (P, T, v))
    timed(f"wy_transpose_{tag}",
          lambda s: (s[0], s[1], wy.wy_apply_transpose(s[0], s[1], s[2])),
          (P, T, v))

    # 5. small-matrix Givens step at fixed t
    gst = givens_init(m, jnp.zeros((m + 1,), dtype=dtype).at[0].set(1.0))
    hcol = jnp.zeros((m + 1,), dtype=dtype).at[24].set(1.0).at[25].set(0.5)

    def giv_chain(s, _hcol=hcol):
        st = givens_init(m, s[1])._replace(omega=s[0])
        st2, _, _ = givens_step(st, _hcol, jnp.int32(25))
        return (st2.omega, st2.g)

    timed(f"givens_{tag}", giv_chain, (gst.omega, gst.g))

    # 6. wy_append at fixed k
    def append_chain(s):
        p2, t2 = wy.wy_append(s[0], s[1], s[2], jnp.int32(25))
        return (p2, t2, s[2])

    p_new = (jax.random.normal(key, (n, n), dtype=dtype))
    p_new = p_new / jnp.sqrt(jnp.sum(p_new * p_new))
    timed(f"wy_append_{tag}", append_chain, (P, T, p_new))

    # 7. composite: one realistic inner iteration (fixed t=25)
    fidx = jnp.arange(n * n).reshape(n, n)

    def iteration(s, _fidx=fidx, _dtype=dtype):
        P_, T_, w_prev = s
        e_t = (_fidx == 25).astype(_dtype)
        v_t = wy.wy_apply(P_, T_, e_t)
        z = m_inv(op(v_t))
        w = wy.wy_apply_transpose(P_, T_, z)
        whead = jax.lax.slice(w.reshape(-1), (0,), (m + 1,))
        tail_sq = jnp.sum(jnp.where(_fidx > 25, w * w, 0.0))
        tmp = jnp.sqrt(tail_sq)
        nrm = jnp.sqrt(jnp.sum(w * w))
        w = w / jnp.where(nrm > 0, nrm, 1.0) + 0.0 * (tmp + whead[0])
        return (P_, T_, w)

    timed(f"iteration_{tag}", iteration, (P, T, v))

print(json.dumps(rows))
