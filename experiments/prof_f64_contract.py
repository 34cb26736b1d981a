"""Which f64 contraction formulation does XLA:TPU lower acceptably?

prof_refcfg.py found tensordot((51,300,300) f64, (300,300) f64) takes
5.8 ms (~12 GB/s, 1.5% of HBM peak) while f64 ELEMENTWISE ops reach
~140 GB/s. Compare tensordot vs fused multiply+reduce and the dd
(f32-pair) jnp formulation for both contract (P v) and expand (P^T t).
"""
import json
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from gmres_tpu.ops import dd
from gmres_tpu.utils.profiling import measure_bandwidth

n, m = 300, 50
key = jax.random.PRNGKey(0)
P = jax.random.normal(key, (m + 1, n, n), dtype=jnp.float64)
P = P / jnp.sqrt(jnp.sum(P * P, axis=(1, 2), keepdims=True))
v = jax.random.normal(key, (n, n), dtype=jnp.float64)
t51 = jnp.zeros((m + 1,), jnp.float64).at[0].set(1.0)

rows = {}


def timed(label, fn, x, reps=50):
    r = measure_bandwidth(fn, x, bytes_moved=1, reps=reps)
    rows[label] = r["seconds"]
    print(f"{label:32s} {r['seconds']*1e3:9.4f} ms", flush=True)


def renorm(u):
    return u / jnp.sqrt(jnp.sum(u * u))


# contract: P v -> (51,).  X->X by re-expanding to v' = renorm(P^T c)
# would mix the two ops; instead carry (P, v) and emit v unchanged,
# folding c into v via a O(1)-cost perturbation so the chain depends
# on the contraction.
def chain_contract(fn):
    def f(s):
        Pb, u = s
        c = fn(Pb, u)
        return (Pb, renorm(u + 1e-30 * c[0]))
    return f


timed("contract_tensordot",
      chain_contract(lambda Pb, u: jnp.tensordot(
          Pb, u, axes=([1, 2], [0, 1]))), (P, v))
timed("contract_mulsum",
      chain_contract(lambda Pb, u: jnp.sum(Pb * u[None], axis=(1, 2))),
      (P, v))
timed("contract_reshape_dot",
      chain_contract(lambda Pb, u: Pb.reshape(m + 1, -1) @ u.reshape(-1)),
      (P, v))

# expand: P^T t -> (n, n)
def chain_expand(fn):
    def f(s):
        Pb, u = s
        e = fn(Pb)
        return (Pb, renorm(u + 1e-30 * e))
    return f


timed("expand_tensordot",
      chain_expand(lambda Pb: jnp.tensordot(t51, Pb, axes=(0, 0))), (P, v))
timed("expand_mulsum",
      chain_expand(lambda Pb: jnp.sum(
          t51[:, None, None] * Pb, axis=0)), (P, v))

# vdot f64: tensordot vs mulsum on the (n,n) vector
timed("vdot_tensordot",
      lambda u: renorm(u + 1e-30 * jnp.tensordot(
          u, u, axes=([0, 1], [0, 1]))), v)
timed("vdot_mulsum",
      lambda u: renorm(u + 1e-30 * jnp.sum(u * u)), v)

# dd contraction in plain jnp: elementwise two_prod + per-element dd
# accumulate is not expressible as a reduce; approximate the cost with
# hi/lo products summed in f64 (exactness carrier) — measures the
# traffic-feasibility of an XLA dd route without Pallas.
Ph, Pl = dd.dd_from_f64(P)
vh, vl = dd.dd_from_f64(v)


def dd_contract_xla(s):
    ph, pl, uh, ul = s
    hi_prod, e = dd.two_prod(ph, uh[None])
    rest = ph * ul[None] + pl * uh[None] + e
    c = (jnp.sum(hi_prod.astype(jnp.float64), axis=(1, 2))
         + jnp.sum(rest.astype(jnp.float64), axis=(1, 2)))
    un = renorm(uh.astype(jnp.float64) + 1e-30 * c[0])
    nh, nl = dd.dd_from_f64(un)
    return (ph, pl, nh, nl)


timed("dd_contract_xla_f64sum", dd_contract_xla, (Ph, Pl, vh, vl))

print(json.dumps(rows))
