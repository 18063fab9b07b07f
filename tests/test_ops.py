"""Unit tests for the core operator toolbox."""
import numpy as np
import jax.numpy as jnp

from fesom2_tpu.core.ops import tridiag_solve, pcg, cumsum_bottom_up


def test_tridiag_matches_dense():
    rng = np.random.default_rng(0)
    nl, X = 12, 7
    a = rng.normal(size=(nl, X)) * 0.1
    c = rng.normal(size=(nl, X)) * 0.1
    b = 1.0 + np.abs(rng.normal(size=(nl, X)))
    a[0] = 0.0
    c[-1] = 0.0
    d = rng.normal(size=(nl, X))
    x = np.asarray(tridiag_solve(jnp.asarray(a), jnp.asarray(b), jnp.asarray(c),
                                 jnp.asarray(d)))
    for j in range(X):
        M = np.diag(b[:, j]) + np.diag(a[1:, j], -1) + np.diag(c[:-1, j], 1)
        ref = np.linalg.solve(M, d[:, j])
        assert np.allclose(x[:, j], ref, rtol=1e-10), j


def test_tridiag_identity_padding():
    nl, X = 6, 3
    a = jnp.zeros((nl, X))
    b = jnp.ones((nl, X))
    c = jnp.zeros((nl, X))
    d = jnp.arange(nl * X, dtype=jnp.float64).reshape(nl, X)
    x = tridiag_solve(a, b, c, d)
    assert np.allclose(np.asarray(x), np.asarray(d))


def test_pcg_solves_spd():
    rng = np.random.default_rng(1)
    n = 50
    Q = rng.normal(size=(n, n))
    A = Q @ Q.T + n * np.eye(n)
    x_true = rng.normal(size=n)
    rhs = A @ x_true
    Aj = jnp.asarray(A)
    x, it, res = pcg(lambda v: Aj @ v, jnp.asarray(rhs),
                     1.0 / jnp.asarray(np.diag(A)), tol=1e-12)
    assert res < 1e-10
    assert np.allclose(np.asarray(x), x_true, rtol=1e-8)


def test_cumsum_bottom_up():
    x = jnp.asarray(np.arange(12.0).reshape(4, 3))
    out = np.asarray(cumsum_bottom_up(x))
    ref = np.flip(np.cumsum(np.flip(np.arange(12.0).reshape(4, 3), 0), 0), 0)
    assert np.allclose(out, ref)
