"""GENEO kernel synthesis: golden parity vs a torch oracle of the reference
math (formulas from core/models/geneos/{cylinder,arrow,neg_sphere}.py),
plus structural invariants (zero-sum planes, gradient flow)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from scenenet_tpu.geneo import kernels as gk

EPS = 1e-8


# ---------------------------------------------------------------------------
# torch oracles — independent implementations of the reference formulas
# (plane value at (x, y) = f(||(x,y) - center||); equivalent to the
# reference's transpose/view construction for square floors)
# ---------------------------------------------------------------------------

def _floor_d2(ks):
    k_x, k_y = ks[1], ks[2]
    cx, cy = (k_x - 1) / 2, (k_y - 1) / 2
    xs = torch.arange(k_x, dtype=torch.float64)[:, None] - cx
    ys = torch.arange(k_y, dtype=torch.float64)[None, :] - cy
    return xs**2 + ys**2


def torch_cylinder_v2(radius, sigma, ks):
    d2 = _floor_d2(ks)
    plane = sigma * torch.exp(d2**2 * (-1 / (2 * (radius + EPS) ** 2)))
    plane = plane - plane.sum() / (ks[1] * ks[2])
    return plane[None].repeat(ks[0], 1, 1)


def torch_cylinder_v1(radius, sigma, ks):
    d2 = _floor_d2(ks)
    circ = d2 - radius**2
    plane = torch.exp(circ**2 * (-1 / (2 * sigma**2)))
    plane = plane - plane.sum() / (ks[1] * ks[2])
    return plane[None].repeat(ks[0], 1, 1)


def torch_arrow_v2(radius, sigma, cone_radius, cone_inc, apex, ks):
    hc = int(apex)
    cone_inc = min(max(cone_inc, 0.0), 0.499)
    d2 = _floor_d2(ks)
    planes = []
    cone_h = ks[0] - hc
    for z in range(ks[0]):
        rad = cone_radius * z * np.tan(cone_inc * np.pi) if z < cone_h else radius
        p = sigma * torch.exp(d2**2 * (-1 / (2 * (rad + EPS) ** 2)))
        planes.append(p - p.sum() / (ks[1] * ks[2]))
    return torch.stack(planes)


def torch_cone_v1(radius, sigma, cone_radius, cone_inc, apex, ks):
    hc = int(apex)
    d2 = _floor_d2(ks)
    cone_h = ks[0] - hc
    planes = []
    for z in range(ks[0]):
        if z < cone_h:
            h = cone_h - 1 - z
            sig = cone_radius * np.sin(cone_inc * np.pi / (2 + h))
        else:
            sig = sigma
        circ = d2 - radius**2
        p = torch.exp(circ**2 * (-1 / (2 * sig**2)))
        planes.append(p - p.sum() / (ks[1] * ks[2]))
    return torch.stack(planes)


def _vol_d2(ks):
    cz, cx, cy = ((k - 1) / 2 for k in ks)
    zs = torch.arange(ks[0], dtype=torch.float64)[:, None, None] - cz
    xs = torch.arange(ks[1], dtype=torch.float64)[None, :, None] - cx
    ys = torch.arange(ks[2], dtype=torch.float64)[None, None, :] - cy
    return zs**2 + xs**2 + ys**2


def torch_neg_sphere_v2(radius, sigma, neg_factor, ks):
    d2 = _vol_d2(ks)
    g = sigma * torch.exp(d2**2 * (-1 / (2 * (radius + EPS) ** 2)))
    k = -neg_factor * g
    vol = ks[0] * ks[1] * ks[2]
    return k - (k.sum() + neg_factor) / vol


def torch_neg_sphere_v1(radius, sigma, neg_factor, ks):
    d2 = _vol_d2(ks)
    circ = d2 - radius**2
    g = torch.exp(circ**2 * (-1 / (2 * sigma**2)))
    vol = ks[0] * ks[1] * ks[2]
    return g - g.sum() / vol - neg_factor


KS = (9, 5, 5)


class TestGoldenParity:
    def test_cylinder_v2(self):
        ours = gk.cylinder_v2({"radius": jnp.asarray(2.5), "sigma": jnp.asarray(1.4)}, KS)
        ref = torch_cylinder_v2(2.5, 1.4, KS).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    def test_cylinder_v1(self):
        ours = gk.cylinder_v1({"radius": jnp.asarray(1.5), "sigma": jnp.asarray(2.0)}, KS)
        ref = torch_cylinder_v1(1.5, 2.0, KS).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    @pytest.mark.parametrize("apex", [0.0, 4.0, 5.7, 9.0])
    def test_arrow_v2(self, apex):
        params = {
            "radius": jnp.asarray(1.0),
            "sigma": jnp.asarray(1.0),
            "cone_radius": jnp.asarray(2.0),
            "cone_inc": jnp.asarray(0.2),
            "apex": jnp.asarray(apex),
        }
        ours = gk.arrow_v2(params, KS)
        ref = torch_arrow_v2(1.0, 1.0, 2.0, 0.2, apex, KS).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    def test_arrow_clamps_cone_inc(self):
        params = {
            "radius": jnp.asarray(1.0), "sigma": jnp.asarray(1.0),
            "cone_radius": jnp.asarray(2.0), "cone_inc": jnp.asarray(0.9),
            "apex": jnp.asarray(4.0),
        }
        ours = gk.arrow_v2(params, KS)
        ref = torch_arrow_v2(1.0, 1.0, 2.0, 0.9, 4.0, KS).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    @pytest.mark.parametrize("apex", [3.0, 6.0])
    def test_cone_v1(self, apex):
        params = {
            "radius": jnp.asarray(1.0), "sigma": jnp.asarray(2.0),
            "cone_radius": jnp.asarray(2.0), "cone_inc": jnp.asarray(0.1),
            "apex": jnp.asarray(apex),
        }
        ours = gk.cone_v1(params, KS)
        ref = torch_cone_v1(1.0, 2.0, 2.0, 0.1, apex, KS).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    def test_neg_sphere_v2(self):
        params = {"radius": jnp.asarray(3.0), "sigma": jnp.asarray(2.0),
                  "neg_factor": jnp.asarray(0.5)}
        ours = gk.neg_sphere_v2(params, (9, 9, 9))
        ref = torch_neg_sphere_v2(3.0, 2.0, 0.5, (9, 9, 9)).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    def test_neg_sphere_v1(self):
        params = {"radius": jnp.asarray(2.0), "sigma": jnp.asarray(1.0),
                  "neg_factor": jnp.asarray(0.3)}
        ours = gk.neg_sphere_v1(params, (9, 9, 9))
        ref = torch_neg_sphere_v1(2.0, 1.0, 0.3, (9, 9, 9)).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)


class TestInvariants:
    def test_cylinder_planes_sum_zero(self):
        k = gk.cylinder_v2({"radius": jnp.asarray(2.0), "sigma": jnp.asarray(1.0)}, KS)
        sums = np.asarray(jnp.sum(k, axis=(1, 2)))
        np.testing.assert_allclose(sums, 0.0, atol=1e-5)

    def test_arrow_planes_sum_zero(self):
        params = {"radius": jnp.asarray(1.0), "sigma": jnp.asarray(1.0),
                  "cone_radius": jnp.asarray(2.0), "cone_inc": jnp.asarray(0.2),
                  "apex": jnp.asarray(5.0)}
        k = gk.arrow_v2(params, KS)
        np.testing.assert_allclose(np.asarray(jnp.sum(k, axis=(1, 2))), 0.0, atol=1e-5)

    def test_gradients_flow(self):
        def loss(radius):
            k = gk.cylinder_v2({"radius": radius, "sigma": jnp.asarray(1.0)}, KS)
            return jnp.sum(k**2)

        g = jax.grad(loss)(jnp.asarray(2.0))
        assert np.isfinite(float(g)) and abs(float(g)) > 0

    def test_apex_gets_no_gradient(self):
        def loss(apex):
            params = {"radius": jnp.asarray(1.0), "sigma": jnp.asarray(1.0),
                      "cone_radius": jnp.asarray(2.0), "cone_inc": jnp.asarray(0.2),
                      "apex": apex}
            return jnp.sum(gk.arrow_v2(params, KS) ** 2)

        g = jax.grad(loss)(jnp.asarray(5.0))
        assert float(g) == 0.0

    def test_grad_matches_finite_difference(self):
        def loss(p):
            params = {"radius": p[0], "sigma": p[1], "cone_radius": p[2],
                      "cone_inc": p[3], "apex": jnp.asarray(5.0)}
            return jnp.sum(gk.arrow_v2(params, KS) ** 2)

        p0 = jnp.asarray([1.0, 1.2, 2.0, 0.2])
        g = np.asarray(jax.grad(loss)(p0))
        eps = 1e-3
        for i in range(4):
            dp = np.zeros(4)
            dp[i] = eps
            fd = (float(loss(p0 + dp)) - float(loss(p0 - dp))) / (2 * eps)
            np.testing.assert_allclose(g[i], fd, rtol=2e-2, atol=1e-4)

    def test_random_configs_draw_in_range(self):
        rng = np.random.default_rng(0)
        for kind in gk.KERNEL_REGISTRY:
            params = gk.random_geneo_params(kind, rng, (9, 6, 6))
            for p in gk.KERNEL_REGISTRY[kind].mandatory:
                assert p in params
            k = gk.KERNEL_REGISTRY[kind].fn(
                {n: jnp.asarray(v) for n, v in params.items()}, (9, 6, 6)
            )
            assert k.shape == (9, 6, 6)
            assert np.isfinite(np.asarray(k)).all()


class TestExtremeParams:
    """Kernel synthesis must stay finite for zero, tiny, negative and huge
    parameter values — penalties keep training in range, but a transient
    step outside it must not poison the forward with NaNs."""

    @pytest.mark.parametrize("mode", ["zero", "tiny", "negative", "huge"])
    def test_all_kernels_finite(self, mode):
        from scenenet_tpu.geneo.kernels import (
            KERNEL_REGISTRY, random_geneo_params,
        )

        rng = np.random.default_rng(3)
        sub = {"zero": 0.0, "tiny": 1e-8, "huge": 50.0}
        for kind, kdef in KERNEL_REGISTRY.items():
            p = random_geneo_params(kind, rng, (9, 6, 6))
            for k in p:
                p[k] = -abs(float(rng.random())) if mode == "negative" \
                    else sub[mode]
            ker = kdef.fn({k: jnp.asarray(v, jnp.float32)
                           for k, v in p.items()}, (9, 6, 6))
            assert bool(jnp.isfinite(ker).all()), (kind, mode)
