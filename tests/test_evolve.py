"""θ-method time integration (solvers/evolve.py). Oracles: the exact
per-step rational decay factor ρ(λ) = (1 − (1−θ)Δtλ)/(1 + θΔtλ) on a
Laplacian eigenmode (machine-precision check), Crank–Nicolson's
second-order convergence to exp(−λT), the steady state L u = f, and
cross-step GCRO-DR recycling beating fresh per-step GMRES."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gmres_tpu as gt


def _eigenmode(n, i=1, j=1):
    """Grid eigenmode of the 5-point Laplacian with its eigenvalue."""
    k = jnp.arange(1, n + 1, dtype=jnp.float64)
    sx = jnp.sin(i * jnp.pi * k / (n + 1))
    sy = jnp.sin(j * jnp.pi * k / (n + 1))
    lam = 4 * np.sin(i * np.pi / (2 * (n + 1))) ** 2 + \
        4 * np.sin(j * np.pi / (2 * (n + 1))) ** 2
    return jnp.outer(sx, sy), float(lam)


@pytest.mark.parametrize("theta", [0.5, 1.0])
def test_eigenmode_decay_exact(theta):
    # One eigenmode: u_n = rho^n u0 EXACTLY (up to solver tol) — pins
    # both the step formula and the warm-start/solve plumbing.
    n, dt, steps = 32, 0.3, 20
    u0, lam = _eigenmode(n)
    L = gt.poisson_operator(n)
    res = gt.theta_evolve(L, u0, dt=dt, n_steps=steps, theta=theta,
                          solver="cg", tol=1e-13)
    assert bool(res.converged)
    rho = (1 - (1 - theta) * dt * lam) / (1 + theta * dt * lam)
    np.testing.assert_allclose(
        np.asarray(res.u), np.asarray(u0) * rho ** steps,
        atol=1e-10,
    )
    # Warm starts: a single eigenmode solves at the 1-2 iteration
    # noise floor every step — no growth beyond it.
    iters = np.asarray(res.iterations)
    assert iters.max() <= 2


def test_crank_nicolson_second_order():
    # Halving dt must cut the exp(-lam*T) error ~4x (ratio > 3 allows
    # the next-order term); backward Euler only ~2x.
    n, T = 32, 2.0
    u0, lam = _eigenmode(n)
    L = gt.poisson_operator(n)
    exact = np.asarray(u0) * np.exp(-lam * T)

    def err(steps, theta):
        r = gt.theta_evolve(L, u0, dt=T / steps, n_steps=steps,
                            theta=theta, solver="cg", tol=1e-13)
        assert bool(r.converged)
        return float(jnp.max(jnp.abs(r.u - exact)))

    e1, e2 = err(16, 0.5), err(32, 0.5)
    assert e1 / e2 > 3.0
    b1, b2 = err(16, 1.0), err(32, 1.0)
    assert 1.5 < b1 / b2 < 3.0


def test_constant_forcing_reaches_steady_state():
    # u_t + L u = f -> u_inf = L^{-1} f; backward Euler with large dt
    # converges there regardless of u0.
    n = 24
    L = gt.poisson_operator(n)
    key = jax.random.PRNGKey(0)
    f = jax.random.normal(key, (n, n), jnp.float64)
    # tol is ABSOLUTE (cg.f90:37 semantics) — with ‖rhs‖ ~ dt·‖f‖ ~ 1e3
    # an 1e-13 target sits below CG's attainable accuracy and the exit
    # certification would (correctly) report BREAKDOWN; 1e-9 is ~1e-12
    # relative.
    res = gt.theta_evolve(L, jnp.zeros((n, n)), dt=50.0, n_steps=40,
                          theta=1.0, forcing=f, solver="cg", tol=1e-9)
    assert bool(res.converged)
    steady = gt.cg(L, f, tol=1e-13)
    np.testing.assert_allclose(
        np.asarray(res.u), np.asarray(steady.x), atol=1e-8
    )


def test_callable_forcing_manufactured_solution():
    # u(t) = sin(t)·phi with L phi = lam phi solves
    # u_t + L u = (cos t + lam sin t)·phi; CN tracks it to O(dt^2).
    n, T, steps = 32, 1.5, 60
    phi, lam = _eigenmode(n)
    L = gt.poisson_operator(n)

    def f(t):
        return (jnp.cos(t) + lam * jnp.sin(t)) * phi

    res = gt.theta_evolve(L, jnp.zeros((n, n)), dt=T / steps,
                          n_steps=steps, theta=0.5, forcing=f,
                          solver="cg", tol=1e-13)
    assert bool(res.converged)
    exact = np.sin(T) * np.asarray(phi)
    assert float(jnp.max(jnp.abs(res.u - exact))) < 5e-4


def test_gcrodr_recycling_beats_fresh_gmres_on_convdiff():
    # Nonsymmetric convection-diffusion: the shifted operator is the
    # SAME every step, so the recycle import is exact — total inner
    # iterations must come in well under fresh per-step GMRES.
    n, dt, steps = 48, 2.0, 12
    L = gt.convection_diffusion_operator(n, 2.0, 1.0)
    u0 = jnp.ones((n, n), jnp.float64)
    rec = gt.theta_evolve(L, u0, dt=dt, n_steps=steps, theta=0.5,
                          solver="gcrodr", recycle_k=10, restart=40,
                          tol=1e-10, max_restarts=100)
    fresh = gt.theta_evolve(L, u0, dt=dt, n_steps=steps, theta=0.5,
                            solver="gmres", restart=40, tol=1e-10,
                            max_restarts=100)
    assert bool(rec.converged) and bool(fresh.converged)
    np.testing.assert_allclose(
        np.asarray(rec.u), np.asarray(fresh.u), atol=1e-8
    )
    assert int(rec.inner_total) < int(fresh.inner_total)
    # After the first step the recycle is live: per-step iterations
    # must drop from step 0 to the later steps.
    iters = np.asarray(rec.iterations)
    assert iters[2:].max() < iters[0]


def test_bicgstab_step_solver():
    n, dt, steps = 32, 1.0, 5
    L = gt.convection_diffusion_operator(n, 1.0, 0.5)
    u0, _ = _eigenmode(n)
    res = gt.theta_evolve(L, u0, dt=dt, n_steps=steps,
                          solver="bicgstab", tol=1e-12)
    ref = gt.theta_evolve(L, u0, dt=dt, n_steps=steps,
                          solver="gmres", tol=1e-12)
    assert bool(res.converged)
    np.testing.assert_allclose(
        np.asarray(res.u), np.asarray(ref.u), atol=1e-8
    )


def test_sharded_parity():
    # Row-sharded trajectory: identical per-step iteration counts and
    # the same final state as the single-device run.
    from jax.sharding import AxisType, NamedSharding
    from jax.sharding import PartitionSpec as P

    n, dt, steps = 64, 0.5, 6
    L = gt.poisson_operator(n)
    u0, _ = _eigenmode(n, 2, 3)
    base = gt.theta_evolve(L, u0, dt=dt, n_steps=steps, solver="cg",
                           tol=1e-12)
    mesh = jax.make_mesh((8,), ("grid",),
                         axis_types=(AxisType.Auto,))
    u0_sh = jax.device_put(u0, NamedSharding(mesh, P("grid", None)))
    sh = jax.jit(
        lambda u: gt.theta_evolve(L, u, dt=dt, n_steps=steps,
                                  solver="cg", tol=1e-12)
    )(u0_sh)
    assert bool(sh.converged)
    np.testing.assert_array_equal(
        np.asarray(sh.iterations), np.asarray(base.iterations)
    )
    np.testing.assert_allclose(
        np.asarray(sh.u), np.asarray(base.u), atol=1e-12
    )


def test_validation_errors():
    L = gt.poisson_operator(8)
    u0 = jnp.zeros((8, 8))
    with pytest.raises(ValueError, match="unknown solver"):
        gt.theta_evolve(L, u0, dt=0.1, n_steps=2, solver="nope")
    with pytest.raises(ValueError, match="theta"):
        gt.theta_evolve(L, u0, dt=0.1, n_steps=2, theta=1.5)


def test_save_trajectory():
    n, dt, steps = 32, 0.3, 5
    u0, lam = _eigenmode(n)
    L = gt.poisson_operator(n)
    res = gt.theta_evolve(L, u0, dt=dt, n_steps=steps, theta=1.0,
                          solver="cg", tol=1e-13,
                          save_trajectory=True)
    assert res.trajectory.shape == (steps, n, n)
    rho = 1.0 / (1 + dt * lam)
    for k in range(steps):
        np.testing.assert_allclose(
            np.asarray(res.trajectory[k]),
            np.asarray(u0) * rho ** (k + 1), atol=1e-10,
        )
    np.testing.assert_array_equal(
        np.asarray(res.trajectory[-1]), np.asarray(res.u)
    )
    # Default: shape-static empty placeholder.
    off = gt.theta_evolve(L, u0, dt=dt, n_steps=steps, solver="cg",
                          tol=1e-13)
    assert off.trajectory.shape == (0,)


def test_exponential_evolve_exact_with_forcing():
    # On an eigenmode basis the exponential-Euler rule is EXACT:
    # u_n = (beta - alpha/lam) e^{-n dt lam} phi + (alpha/lam) phi.
    n, dt, steps = 32, 0.4, 8
    phi, lam = _eigenmode(n)
    L = gt.poisson_operator(n)
    alpha, beta = 0.7, 2.0
    res = gt.exponential_evolve(L, beta * phi, dt=dt, n_steps=steps,
                                steps=6, forcing=alpha * phi)
    exact = ((beta - alpha / lam) * np.exp(-steps * dt * lam)
             + alpha / lam) * np.asarray(phi)
    np.testing.assert_allclose(np.asarray(res.u), exact, atol=1e-11)
    assert res.error_estimates.shape == (steps,)


def test_exponential_beats_crank_nicolson():
    # General initial data: ONE exponential step (spectral in time)
    # beats 32 CN steps covering the same interval.
    n, T = 24, 1.0
    L = gt.poisson_operator(n)
    rng = np.random.default_rng(8)
    u0 = jnp.asarray(rng.standard_normal((n, n)))
    a = np.asarray(gt.poisson_matrix(n))
    import scipy.linalg

    exact = (scipy.linalg.expm(-T * a)
             @ np.asarray(u0).ravel()).reshape(n, n)
    e_exp = gt.exponential_evolve(L, u0, dt=T, n_steps=1, steps=40)
    cn = gt.theta_evolve(L, u0, dt=T / 32, n_steps=32, theta=0.5,
                         solver="cg", tol=1e-13)
    err_exp = float(jnp.max(jnp.abs(e_exp.u - exact)))
    err_cn = float(jnp.max(jnp.abs(cn.u - exact)))
    assert err_exp < 1e-9
    assert err_exp * 100 < err_cn


def test_exponential_trajectory():
    n = 16
    L = gt.poisson_operator(n)
    u0, lam = _eigenmode(n)
    res = gt.exponential_evolve(L, u0, dt=0.3, n_steps=4, steps=5,
                                save_trajectory=True)
    assert res.trajectory.shape == (4, n, n)
    for k in range(4):
        np.testing.assert_allclose(
            np.asarray(res.trajectory[k]),
            np.exp(-(k + 1) * 0.3 * lam) * np.asarray(u0),
            atol=1e-12,
        )


def test_stiff_steps_shifted_laplacian_preconditioner():
    # dt*lam_max >> 1: S = theta*dt*(L + sigma I), sigma = 1/(theta
    # dt) — the positively-shifted-Laplacian cycle IS multigrid for
    # (L + sigma I); scaled by 1/(theta dt) it preconditions S and
    # keeps per-step CG iterations low and flat.
    n, dt, steps, theta = 96, 10.0, 5, 0.5
    L = gt.poisson_operator(n)
    rng = np.random.default_rng(12)
    u0 = jnp.asarray(rng.standard_normal((n, n)))
    sigma = 1.0 / (theta * dt)
    cyc = gt.helmholtz_shifted_laplacian_preconditioner(
        n, kh2=sigma, shift=1.0
    )
    M = lambda r: cyc(r) / (theta * dt)  # noqa: E731
    plain = gt.theta_evolve(L, u0, dt=dt, n_steps=steps, theta=theta,
                            solver="cg", tol=1e-10)
    prec = gt.theta_evolve(L, u0, dt=dt, n_steps=steps, theta=theta,
                           solver="cg", tol=1e-10, M=M)
    assert bool(plain.converged) and bool(prec.converged)
    np.testing.assert_allclose(
        np.asarray(prec.u), np.asarray(plain.u), atol=1e-8
    )
    it_p = np.asarray(prec.iterations)
    it_u = np.asarray(plain.iterations)
    assert it_p.max() * 2 < it_u.max()
    assert it_p.max() - it_p.min() <= 2  # flat across steps


class TestIMEX:
    """IMEX splitting: explicit (possibly nonlinear) C, implicit SPD
    L — per-step solves stay on CG."""

    def _convdiff_split(self, n):
        L_full = gt.convection_diffusion_operator(n, 0.6, 0.3)
        L_diff = gt.poisson_operator(n)

        def C(v):
            return L_full(v) - gt.poisson_apply(v)

        return L_full, L_diff, C

    def test_matches_full_implicit_convdiff(self):
        # Linear splitting: CNAB (theta=1/2 + AB2) is 2nd order like
        # full CN, so against a fine reference both land close.
        n, T, steps = 32, 1.0, 40
        L_full, L_diff, C = self._convdiff_split(n)
        u0 = jnp.asarray(
            np.random.default_rng(3).standard_normal((n, n))
        )
        ref = gt.theta_evolve(L_full, u0, dt=T / 320, n_steps=320,
                              theta=0.5, solver="gmres", tol=1e-12)
        full = gt.theta_evolve(L_full, u0, dt=T / steps, n_steps=steps,
                               theta=0.5, solver="gmres", tol=1e-12)
        imex = gt.theta_evolve(L_diff, u0, dt=T / steps, n_steps=steps,
                               theta=0.5, solver="cg", tol=1e-12,
                               explicit=C)
        assert bool(imex.converged)
        e_full = float(jnp.max(jnp.abs(full.u - ref.u)))
        e_imex = float(jnp.max(jnp.abs(imex.u - ref.u)))
        # Same order; the splitting constant is allowed a small factor.
        assert e_imex < 10 * e_full + 1e-10

    def test_second_order_self_convergence(self):
        n, T = 32, 1.0
        _, L_diff, C = self._convdiff_split(n)
        u0 = jnp.asarray(
            np.random.default_rng(4).standard_normal((n, n))
        )

        def run(steps, order):
            return gt.theta_evolve(
                L_diff, u0, dt=T / steps, n_steps=steps, theta=0.5,
                solver="cg", tol=1e-13, explicit=C,
                explicit_order=order,
            ).u

        ref = run(256, 2)
        e1 = float(jnp.max(jnp.abs(run(16, 2) - ref)))
        e2 = float(jnp.max(jnp.abs(run(32, 2) - ref)))
        assert e1 / e2 > 3.0  # CNAB: 2nd order
        f1 = float(jnp.max(jnp.abs(run(16, 1) - ref)))
        f2 = float(jnp.max(jnp.abs(run(32, 1) - ref)))
        assert 1.5 < f1 / f2 < 3.0  # explicit Euler on C: 1st order

    def test_nonlinear_burgers(self):
        # 2-D Burgers-type: u_t + u*u_x = nu * Lap u. The nonlinear
        # convection is explicit; each step stays an SPD solve.
        n, nu, T, steps = 48, 0.5, 0.5, 64
        L = gt.poisson_operator(n)

        def C(u):
            up = jnp.pad(u, ((0, 0), (1, 1)))
            return u * 0.5 * (up[:, 2:] - up[:, :-2]) / nu

        k = jnp.arange(1, n + 1, dtype=jnp.float64)
        u0 = jnp.outer(jnp.sin(jnp.pi * k / (n + 1)),
                       jnp.sin(jnp.pi * k / (n + 1)))

        def run(s):
            r = gt.theta_evolve(L, u0, dt=T / s, n_steps=s,
                                theta=0.5, solver="cg", tol=1e-13,
                                explicit=C)
            assert bool(r.converged)
            return r.u

        ref = run(256)
        e1 = float(jnp.max(jnp.abs(run(steps) - ref)))
        e2 = float(jnp.max(jnp.abs(run(2 * steps) - ref)))
        assert np.isfinite(e1) and e1 < 1e-3  # stable, accurate
        assert e1 / e2 > 3.0  # 2nd order on the nonlinear problem

    def test_validation(self):
        L = gt.poisson_operator(8)
        with pytest.raises(ValueError, match="explicit_order"):
            gt.theta_evolve(L, jnp.zeros((8, 8)), dt=0.1, n_steps=2,
                            explicit=lambda u: u, explicit_order=3)


def test_stiff_convdiff_shifted_mg():
    # Nonsymmetric stiff steps: the convdiff cycle's shift= builds
    # multigrid for (A + sigma I) = S/(theta dt); per-step BiCGSTAB
    # iterations drop well under the unpreconditioned run and stay
    # flat across steps.
    n, dt, steps, theta = 64, 8.0, 5, 0.5
    L = gt.convection_diffusion_operator(n, 0.4, 0.2)
    rng = np.random.default_rng(13)
    u0 = jnp.asarray(rng.standard_normal((n, n)))
    sigma = 1.0 / (theta * dt)
    cyc = gt.convection_diffusion_multigrid_preconditioner(
        n, 0.4, 0.2, shift=sigma
    )
    M = lambda r: cyc(r) / (theta * dt)  # noqa: E731
    plain = gt.theta_evolve(L, u0, dt=dt, n_steps=steps, theta=theta,
                            solver="bicgstab", tol=1e-9)
    prec = gt.theta_evolve(L, u0, dt=dt, n_steps=steps, theta=theta,
                           solver="bicgstab", tol=1e-9, M=M)
    assert bool(plain.converged) and bool(prec.converged)
    np.testing.assert_allclose(
        np.asarray(prec.u), np.asarray(plain.u), atol=1e-7
    )
    it_p = np.asarray(prec.iterations)
    assert it_p.max() * 2 < np.asarray(plain.iterations).max()
    assert it_p.max() - it_p.min() <= 2
