"""Optimizer unit tests on standard functions (SURVEY.md §4 support)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpufwi.optimize import minimize


def _rosenbrock(x):
    return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2)


def _quadratic(x, A, b):
    return 0.5 * jnp.vdot(x, A @ x) - jnp.vdot(b, x)


def test_lbfgs_rosenbrock():
    vg = jax.jit(jax.value_and_grad(_rosenbrock))
    x0 = jnp.full((8,), -1.2, jnp.float64)
    x, infos = minimize(vg, x0, iterations=200, method="lbfgs")
    assert float(_rosenbrock(x)) < 1e-10
    assert np.allclose(np.asarray(x), 1.0, atol=1e-5)


def test_nlcg_quadratic():
    rng = np.random.default_rng(0)
    Q = rng.standard_normal((20, 20))
    A = jnp.asarray(Q @ Q.T + 20 * np.eye(20))
    b = jnp.asarray(rng.standard_normal(20))
    vg = jax.jit(jax.value_and_grad(lambda x: _quadratic(x, A, b)))
    x0 = jnp.zeros(20, jnp.float64)
    x, infos = minimize(vg, x0, iterations=120, method="nlcg")
    x_star = jnp.linalg.solve(A, b)
    assert float(jnp.linalg.norm(x - x_star)) < 1e-5


def test_lbfgs_respects_bounds():
    # minimum of (x-2)^2 constrained to [-1, 1] is at x = 1
    vg = jax.jit(jax.value_and_grad(lambda x: jnp.sum((x - 2.0) ** 2)))
    x0 = jnp.zeros(5, jnp.float64)
    x, _ = minimize(vg, x0, iterations=50, method="lbfgs", bounds=(-1.0, 1.0))
    assert np.allclose(np.asarray(x), 1.0, atol=1e-8)


def test_preconditioned_descent():
    # badly scaled quadratic: diagonal precondition fixes convergence
    d = jnp.asarray(np.geomspace(1.0, 1e4, 30))
    vg = jax.jit(jax.value_and_grad(lambda x: 0.5 * jnp.sum(d * x * x)))
    x0 = jnp.ones(30, jnp.float64)
    x, _ = minimize(vg, x0, iterations=60, method="gd", precond=lambda g: g / d)
    assert float(jnp.linalg.norm(x)) < 1e-6


def test_wolfe_lbfgs_rosenbrock():
    vg = jax.jit(jax.value_and_grad(_rosenbrock))
    x0 = jnp.full((8,), -1.2, jnp.float64)
    x, infos = minimize(vg, x0, iterations=200, method="lbfgs", linesearch="wolfe")
    assert float(_rosenbrock(x)) < 1e-10
    assert np.allclose(np.asarray(x), 1.0, atol=1e-5)


def test_wolfe_satisfies_curvature():
    # every accepted pair must pass the L-BFGS curvature test when the
    # strong-Wolfe search is used (that is the point of it)
    from tpufwi.optimize.linesearch import strong_wolfe_line_search

    vg = jax.jit(jax.value_and_grad(_rosenbrock))
    x = jnp.full((8,), -1.2, jnp.float64)
    f, g = vg(x)
    d = -g
    ls = strong_wolfe_line_search(vg, x, float(f), g, d, alpha0=1.0, c2=0.9)
    assert ls.success
    gd0 = float(jnp.vdot(g, d))
    f2, g2 = vg(ls.x_new)
    assert float(f2) <= float(f) + 1e-4 * ls.alpha * gd0  # Armijo
    assert abs(float(jnp.vdot(g2, d))) <= 0.9 * abs(gd0)  # curvature
    # s'y > 0 follows
    s = ls.x_new - x
    y = g2 - g
    assert float(jnp.vdot(s, y)) > 0.0


def test_wolfe_nlcg_quadratic():
    rng = np.random.default_rng(0)
    Q = rng.standard_normal((20, 20))
    A = jnp.asarray(Q @ Q.T + 20 * np.eye(20))
    b = jnp.asarray(rng.standard_normal(20))
    vg = jax.jit(jax.value_and_grad(lambda x: _quadratic(x, A, b)))
    x0 = jnp.zeros(20, jnp.float64)
    x, infos = minimize(vg, x0, iterations=120, method="nlcg", linesearch="wolfe")
    x_star = jnp.linalg.solve(A, b)
    assert float(jnp.linalg.norm(x - x_star)) < 1e-5


def test_backtracking_recovers_from_overscaled_alpha0():
    """Tiny-amplitude objectives make the scale-heuristic alpha0
    arbitrarily large; the far-outside-trust-region dive (x1e-3/eval)
    must still find an acceptable step within the eval budget."""
    import jax.numpy as jnp

    from tpufwi.optimize.linesearch import backtracking_line_search

    scale = 1e-18

    def f(x):
        return scale * float(jnp.sum(x * x))

    x0 = jnp.ones(5)
    g = 2 * scale * x0
    res = backtracking_line_search(
        lambda x: f(x), x0, f(x0), g, -g, alpha0=1e22, max_evals=12
    )
    assert res.success, res
    assert res.f_new < f(x0)


def test_backtracking_survives_f32_gradient_underflow():
    """fp32 gradients ~1e-23 have |g|^2 ~ 1e-46, which underflows f32
    accumulation to zero and used to trip the 'not a descent direction'
    early-out; the f64 host-side inner products must keep descending."""
    import jax.numpy as jnp

    from tpufwi.optimize.linesearch import backtracking_line_search

    scale = jnp.float32(1e-20)

    def f(x):
        return float(scale * jnp.sum(x * x))

    x0 = jnp.ones(8, jnp.float32)
    g = (2 * scale * x0).astype(jnp.float32)  # ~2e-20 per entry
    assert float(jnp.vdot(g, g)) >= 0.0  # f32 may underflow to 0 here
    res = backtracking_line_search(f, x0, f(x0), g, -g, alpha0=1e18)
    assert res.success and res.f_new < f(x0), res


def test_pytree_scaling_balances_disparate_magnitudes():
    """Per-leaf nondimensionalization (minimize_pytree scales_tree): a
    separable quadratic whose two fields differ by 4 orders of magnitude
    (vp ~2000 vs Thomsen eps ~0.2) converges in a few iterations when
    scaled; verify the scaled run reaches the minimizer and stays inside
    the scaled bounds, and that "auto" derives scales from bound ranges."""
    import jax
    import jax.numpy as jnp

    from tpufwi.optimize.driver import minimize_pytree

    target_a, target_b = 2000.0, 0.2

    def vg(m):
        a, b = m
        f = 0.5 * jnp.sum(((a - target_a) / 1000.0) ** 2) \
            + 0.5 * jnp.sum(((b - target_b) / 0.1) ** 2)
        return f, jax.grad(lambda mm: 0.5 * jnp.sum(((mm[0] - target_a) / 1000.0) ** 2)
                           + 0.5 * jnp.sum(((mm[1] - target_b) / 0.1) ** 2))(m)

    m0 = (jnp.full((4,), 1500.0), jnp.full((4,), 0.05))
    bounds = [(1000.0, 3000.0), (0.0, 0.4)]

    m_auto, infos, _ = minimize_pytree(
        vg, m0, 12, bounds_tree=bounds, scales_tree="auto")
    assert float(jnp.max(jnp.abs(m_auto[0] - target_a))) < 1.0
    assert float(jnp.max(jnp.abs(m_auto[1] - target_b))) < 1e-4
    # bounds respected throughout in ORIGINAL units
    assert float(m_auto[1].min()) >= 0.0 and float(m_auto[1].max()) <= 0.4

    # explicit per-leaf scales behave the same
    m_exp, _, _ = minimize_pytree(
        vg, m0, 12, bounds_tree=bounds, scales_tree=[2000.0, 0.4])
    assert float(jnp.max(jnp.abs(m_exp[1] - target_b))) < 1e-4


def test_pytree_scaling_identity_matches_unscaled():
    """scales_tree of all-ones must reproduce the unscaled trajectory
    exactly (the scaling wrapper is algebraically transparent)."""
    import jax
    import jax.numpy as jnp

    from tpufwi.optimize.driver import minimize_pytree

    def vg(m):
        f = jnp.sum((m[0] - 3.0) ** 2) + jnp.sum((m[1] + 1.0) ** 4)
        return f, jax.grad(lambda mm: jnp.sum((mm[0] - 3.0) ** 2)
                           + jnp.sum((mm[1] + 1.0) ** 4))(m)

    m0 = (jnp.zeros(3), jnp.zeros(3))
    a, ia, _ = minimize_pytree(vg, m0, 6)
    b, ib, _ = minimize_pytree(vg, m0, 6, scales_tree=[1.0, 1.0])
    assert float(jnp.max(jnp.abs(a[0] - b[0]))) == 0.0
    assert float(jnp.max(jnp.abs(a[1] - b[1]))) == 0.0
