"""Accumulation scan tests: associative scan == sequential reference loop."""

import jax
import jax.numpy as jnp
import numpy as np

from volumetricrenderer_tpu.ops import scatter_scan
from oracle import oracle as onp


def _random_inputs(d=16, h=6, w=10, seed=0, sigma_scale=1.0):
    rng = np.random.default_rng(seed)
    in_scatter = rng.uniform(0, 0.5, (d, h, w, 3)).astype(np.float32)
    extinction = (rng.uniform(0, 0.1, (d, h, w)) * sigma_scale).astype(np.float32)
    steps = rng.uniform(0.5, 3.0, (d,)).astype(np.float32)
    return in_scatter, extinction, steps


def test_scan_equals_sequential():
    s, e, st = _random_inputs()
    a = scatter_scan.accumulate_scan(jnp.asarray(s), jnp.asarray(e), jnp.asarray(st))
    b = scatter_scan.accumulate_sequential(jnp.asarray(s), jnp.asarray(e), jnp.asarray(st))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_blocked_equals_scan():
    s, e, st = _random_inputs(d=32, seed=7)
    a = scatter_scan.accumulate_blocked(jnp.asarray(s), jnp.asarray(e),
                                        jnp.asarray(st), block=8)
    b = scatter_scan.accumulate_scan(jnp.asarray(s), jnp.asarray(e),
                                     jnp.asarray(st))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)


def test_blocked_nondivisible_falls_back():
    s, e, st = _random_inputs(d=14, seed=8)
    a = scatter_scan.accumulate_blocked(jnp.asarray(s), jnp.asarray(e),
                                        jnp.asarray(st), block=8)
    b = scatter_scan.accumulate_scan(jnp.asarray(s), jnp.asarray(e),
                                     jnp.asarray(st))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)


def test_scan_matches_oracle_scatter_step_loop():
    s, e, st = _random_inputs(seed=3)
    a = np.asarray(scatter_scan.accumulate_scan(jnp.asarray(s), jnp.asarray(e),
                                                jnp.asarray(st)))
    d, h, w, _ = s.shape
    acc_l = np.zeros((h, w, 3))
    acc_t = np.ones((h, w))
    for i in range(d):
        acc_l, acc_t = onp.scatter_step(acc_l, acc_t, s[i].astype(np.float64),
                                        e[i].astype(np.float64), float(st[i]))
        np.testing.assert_allclose(a[i, ..., :3], acc_l, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(a[i, ..., 3], acc_t, rtol=1e-4, atol=1e-6)


def test_zero_extinction_taylor_limit():
    # sigma = 0 (the reference's local-light-only NaN case): L must be
    # inScatter * dz and T must stay 1.
    d, h, w = 8, 2, 3
    s = np.full((d, h, w, 3), 0.25, np.float32)
    e = np.zeros((d, h, w), np.float32)
    st = np.full((d,), 2.0, np.float32)
    a = np.asarray(scatter_scan.accumulate_scan(jnp.asarray(s), jnp.asarray(e),
                                                jnp.asarray(st)))
    np.testing.assert_allclose(a[..., 3], 1.0, atol=1e-6)
    expected = np.broadcast_to(
        0.25 * 2.0 * (np.arange(d)[:, None, None] + 1), (d, h, w))
    np.testing.assert_allclose(a[..., 0], expected, rtol=1e-5)


def test_taylor_continuity_at_threshold():
    # values straddling the 1e-5 switch must agree to float tolerance
    s = np.full((2, 1, 1, 3), 1.0, np.float32)
    st = np.full((2,), 1.0, np.float32)
    lo = np.asarray(scatter_scan.slice_integral(
        jnp.asarray(s), jnp.full((2, 1, 1), 0.99e-5), jnp.asarray(st).reshape(-1, 1, 1))[0])
    hi = np.asarray(scatter_scan.slice_integral(
        jnp.asarray(s), jnp.full((2, 1, 1), 1.01e-5), jnp.asarray(st).reshape(-1, 1, 1))[0])
    np.testing.assert_allclose(lo, hi, rtol=1e-4)


def test_transmittance_monotone_nonincreasing():
    s, e, st = _random_inputs(seed=5, sigma_scale=5.0)
    a = np.asarray(scatter_scan.accumulate_scan(jnp.asarray(s), jnp.asarray(e),
                                                jnp.asarray(st)))
    t = a[..., 3]
    assert np.all(t[1:] <= t[:-1] + 1e-6)
    assert np.all(t > 0)
