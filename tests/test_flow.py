"""Deformation-field algebra (ops/flow.py) and the diffeomorphic SVF
model (models/svf.py): group properties, Jacobians, inverses,
differentiability, and training."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.test_util import check_grads

from interpol_tpu import (compose_disp, disp_jacobian, exp_disp,
                          invert_disp, jacobian_det)
from interpol_tpu.models import SVFModel, svf_mse_loss, svf_train_step


def _smooth_disp(rng, shape, amp=1.5, batch=1):
    """Band-limited random displacement (B, *shape, D): coarse noise
    upsampled with cubic splines, clamped to |u| <= amp per axis."""
    from interpol_tpu.ops.resize import resize
    D = len(shape)
    coarse = tuple(max(4, n // 8) for n in shape)
    x = rng.standard_normal((batch, D) + coarse).astype(np.float32)
    u = resize(jnp.asarray(x), shape=list(shape), anchor=["e"] * D,
               interpolation=3, prefilter=False)
    u = amp * jnp.tanh(u)
    return jnp.moveaxis(u, 1, -1)


def _interior(x, m=4):
    """Trim m voxels off every spatial edge (boundary effects)."""
    D = x.shape[-1] if x.ndim > 3 else 2
    sl = (slice(None),) + (slice(m, -m),) * (x.ndim - 2)
    return x[sl]


class TestCompose:
    def test_compose_with_zero_is_identity(self):
        rng = np.random.default_rng(0)
        u = _smooth_disp(rng, (24, 20))
        z = jnp.zeros_like(u)
        np.testing.assert_allclose(np.asarray(compose_disp(u, z)),
                                   np.asarray(u), atol=1e-5)
        # 0 o v = v (pull of zeros is zero everywhere)
        v = _smooth_disp(rng, (24, 20))
        np.testing.assert_allclose(np.asarray(compose_disp(z, v)),
                                   np.asarray(v), atol=1e-6)

    def test_compose_matches_dense_evaluation(self):
        """w(x) = u(x + v(x)) + v(x) against a direct gather at a few
        interior points (linear interpolation, 2-D)."""
        rng = np.random.default_rng(1)
        u = _smooth_disp(rng, (24, 20), amp=1.0)
        v = _smooth_disp(rng, (24, 20), amp=1.0)
        w = compose_disp(u, v, interpolation=1)
        un, vn, wn = (np.asarray(a)[0] for a in (u, v, w))
        for (i, j) in [(6, 7), (11, 9), (16, 12)]:
            x = np.array([i, j], np.float64) + vn[i, j]
            i0, j0 = int(np.floor(x[0])), int(np.floor(x[1]))
            ti, tj = x[0] - i0, x[1] - j0
            lerp = ((1 - ti) * (1 - tj) * un[i0, j0]
                    + (1 - ti) * tj * un[i0, j0 + 1]
                    + ti * (1 - tj) * un[i0 + 1, j0]
                    + ti * tj * un[i0 + 1, j0 + 1])
            np.testing.assert_allclose(wn[i, j], lerp + vn[i, j],
                                       atol=1e-5)

    def test_max_disp_window_path_matches_gather(self):
        rng = np.random.default_rng(2)
        u = _smooth_disp(rng, (24, 20), amp=1.0)
        v = _smooth_disp(rng, (24, 20), amp=1.0)
        a = compose_disp(u, v)
        b = compose_disp(u, v, max_disp=1.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)


class TestExp:
    def test_exp_zero_is_identity(self):
        z = jnp.zeros((1, 16, 16, 2))
        np.testing.assert_allclose(np.asarray(exp_disp(z)), 0.0)

    def test_exp_small_velocity_first_order(self):
        """exp(v) = v + O(|v|^2) for small v."""
        rng = np.random.default_rng(3)
        v = _smooth_disp(rng, (24, 20), amp=0.05)
        u = exp_disp(v, steps=6)
        err = np.abs(np.asarray(_interior(u - v))).max()
        assert err < 5e-3

    def test_exp_inverse_property(self):
        """exp(v) o exp(-v) ~= 0 away from the boundary."""
        rng = np.random.default_rng(4)
        v = _smooth_disp(rng, (32, 28), amp=1.5)
        up = exp_disp(v, steps=7)
        um = exp_disp(-v, steps=7)
        resid = compose_disp(up, um)
        err = np.abs(np.asarray(_interior(resid, m=6))).max()
        assert err < 0.05, err

    def test_exp_additivity_in_time(self):
        """exp(v) == exp(v/2) o exp(v/2) (one extra squaring)."""
        rng = np.random.default_rng(5)
        v = _smooth_disp(rng, (24, 20), amp=1.0)
        a = exp_disp(v, steps=6)
        half = exp_disp(v * 0.5, steps=5)
        b = compose_disp(half, half)
        np.testing.assert_allclose(np.asarray(_interior(a, 4)),
                                   np.asarray(_interior(b, 4)),
                                   atol=5e-3)

    def test_exp_positive_jacobian(self):
        """The exponential of a sizeable velocity keeps det J > 0
        (diffeomorphism) even where a raw displacement of the same
        magnitude would fold."""
        rng = np.random.default_rng(6)
        v = _smooth_disp(rng, (32, 28), amp=3.0)
        u = exp_disp(v, steps=7)
        det = np.asarray(_interior(jacobian_det(u)[..., None], 4))
        assert det.min() > 0.0

    def test_exp_differentiable(self):
        rng = np.random.default_rng(7)
        v = _smooth_disp(rng, (12, 10), amp=0.5)
        f = lambda vv: jnp.sum(exp_disp(vv, steps=4) ** 2)
        check_grads(f, (v,), order=1, modes=["rev"], atol=1e-2,
                    rtol=1e-2)


class TestJacobian:
    def test_affine_flow_jacobian(self):
        """u(x) = (A - I) x has J = A everywhere (interior; exact for
        any spline order since u is linear in x)."""
        A = np.array([[1.05, 0.02], [-0.03, 0.97]], np.float32)
        n = (20, 18)
        ident = np.stack(np.meshgrid(*[np.arange(k) for k in n],
                                     indexing="ij"), -1).astype(np.float32)
        u = jnp.asarray((ident @ (A.T - np.eye(2, dtype=np.float32)))
                        )[None]
        J = disp_jacobian(u)
        np.testing.assert_allclose(
            np.asarray(J[0, 6:-6, 6:-6]),
            np.broadcast_to(A, (8, 6, 2, 2)), atol=1e-4)

    def test_det_identity_is_one(self):
        u = jnp.zeros((1, 12, 11, 10, 3))
        np.testing.assert_allclose(np.asarray(jacobian_det(u)), 1.0,
                                   atol=1e-6)

    def test_det_3d_matches_linalg(self):
        rng = np.random.default_rng(8)
        u = _smooth_disp(rng, (12, 10, 11), amp=1.0)
        J = disp_jacobian(u)
        np.testing.assert_allclose(np.asarray(jacobian_det(u)),
                                   np.asarray(jnp.linalg.det(J)),
                                   atol=1e-5)


class TestInverse:
    def test_invert_roundtrip(self):
        rng = np.random.default_rng(9)
        u = exp_disp(_smooth_disp(rng, (32, 28), amp=1.5), steps=6)
        w = invert_disp(u, iters=30)
        resid = compose_disp(u, w)
        err = np.abs(np.asarray(_interior(resid, m=6))).max()
        assert err < 0.05, err

    def test_invert_matches_exp_of_negated(self):
        rng = np.random.default_rng(10)
        v = _smooth_disp(rng, (32, 28), amp=1.0)
        w1 = invert_disp(exp_disp(v, steps=6), iters=30)
        w2 = exp_disp(-v, steps=6)
        err = np.abs(np.asarray(_interior(w1 - w2, m=6))).max()
        assert err < 0.05, err


class TestSVFModel:
    def _images(self, rng, shape):
        from interpol_tpu.ops.resize import resize
        coarse = tuple(max(3, n // 4) for n in shape)
        x = rng.standard_normal((1, 1) + coarse).astype(np.float32)
        return resize(jnp.asarray(x), shape=list(shape),
                      anchor=["e"] * len(shape), interpolation=3,
                      prefilter=False)

    def test_svf_trains_and_stays_diffeomorphic(self):
        rng = np.random.default_rng(11)
        shape = (24, 24)
        model = SVFModel(vol_shape=shape, coarse_shape=(4, 4),
                         interpolation=1, max_disp=2.0, steps=5)
        moving = self._images(rng, shape)
        true = jnp.asarray(0.7 * rng.standard_normal((1, 4, 4, 2)),
                           jnp.float32)
        fixed = model.warp(true, moving)
        p = model.init_params(1)
        l0 = float(svf_mse_loss(model, p, moving, fixed))
        losses = []
        for _ in range(20):
            p, loss = svf_train_step(model, p, moving, fixed, lr=4.0)
            losses.append(float(loss))
        assert losses[-1] < 0.35 * l0
        det = np.asarray(jacobian_det(model.flow(p)))
        assert det[:, 3:-3, 3:-3].min() > 0.0

    def test_svf_inverse_consistency(self):
        """warp(inverse=True) undoes warp() up to interpolation error."""
        rng = np.random.default_rng(12)
        shape = (32, 32)
        model = SVFModel(vol_shape=shape, coarse_shape=(4, 4),
                         interpolation=3, max_disp=2.0, steps=6)
        moving = self._images(rng, shape)
        params = jnp.asarray(0.6 * rng.standard_normal((1, 4, 4, 2)),
                             jnp.float32)
        fwd = model.warp(params, moving)
        back = model.warp(params, fwd, inverse=True)
        err = np.abs(np.asarray((back - moving)[:, :, 6:-6, 6:-6])).max()
        scale = np.abs(np.asarray(moving)).max()
        assert err < 0.1 * scale, (err, scale)

    def test_jac_regularizer_finite_grad(self):
        rng = np.random.default_rng(13)
        shape = (16, 16)
        model = SVFModel(vol_shape=shape, coarse_shape=(4, 4),
                         interpolation=1, max_disp=1.5, steps=4)
        moving = self._images(rng, shape)
        fixed = jnp.roll(moving, 1, axis=2)
        p = model.init_params(1) + 0.1
        loss, g = jax.value_and_grad(svf_mse_loss, argnums=1)(
            model, p, moving, fixed, 0.1)
        assert np.isfinite(float(loss))
        assert np.isfinite(np.asarray(g)).all()
