"""Differentiable GENEO kernel synthesis — pure functions of scalar params.

A GENEO (Group Equivariant Non-Expansive Operator) kernel is a closed-form
geometric pattern — cylinder, cone-on-cylinder ("arrow"), negative sphere —
discretized on a (k_z, k_x, k_y) voxel lattice from a handful of
interpretable scalar parameters. The defining feature (preserved from the
reference, ``core/models/geneos/*.py``): kernels are synthesized *from the
scalars on every forward pass*, so gradients flow through the geometry.

This maps naturally onto JAX — each kernel is a pure jit-able function
``params dict → (k_z, k_x, k_y) array`` with no Python loops over planes
(the reference builds the arrow kernel with a per-plane ``torch.cat`` loop,
``arrow.py:246-250``; here the z-schedule is a vectorized masked radius
vector, which also makes the apex cut a static-shape operation).

Semantics parity notes (vs reference, citations are reference paths):
- Plane values: value at (x, y) = f(‖(x,y) − center‖) with
  center = ((k_x−1)/2, (k_y−1)/2) (``cylinder.py:73``). The reference's
  ``torch.t(...).view(...)`` reshape is equivalent for square floors
  (every shipped config: (9,5,5), (9,6,6), (9,9,9)); for non-square floors
  the reference scrambles indices — we implement the intended radial math.
- ``sum_zero``: subtract plane-sum / (k_x*k_y) per z-plane
  (``cylinder.py:81-82``); the neg-sphere variant subtracts over the full
  volume (``neg_sphere.py:133-134``).
- Arrow apex: the reference casts the (non-trainable) apex parameter to int
  and uses it as a concat boundary (``arrow.py:235``). Here
  ``h_c = stop_gradient(floor(apex))`` and the cylinder/cone split is a
  per-plane ``where`` mask — identical values for integer apex, fixed
  shapes for XLA.
- cone_inc is clamped to [0, 0.499] functionally (``arrow.py:244``; the
  reference mutates the parameter in place — we never mutate).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Dict, Mapping, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Mapping[str, jnp.ndarray]
KernelSize = Tuple[int, int, int]

_EPS = 1e-8


def _floor_dist2(kernel_size: KernelSize, dtype=jnp.float32) -> jnp.ndarray:
    """Squared distance of each (x, y) floor cell to the floor center."""
    _, k_x, k_y = kernel_size
    cx = (k_x - 1) / 2.0
    cy = (k_y - 1) / 2.0
    xs = jax.lax.broadcasted_iota(dtype, (k_x, k_y), 0) - cx
    ys = jax.lax.broadcasted_iota(dtype, (k_x, k_y), 1) - cy
    return xs * xs + ys * ys


def _vol_dist2(kernel_size: KernelSize, dtype=jnp.float32) -> jnp.ndarray:
    """Squared distance of each (z, x, y) cell to the volume center."""
    k_z, k_x, k_y = kernel_size
    cz, cx, cy = ((k - 1) / 2.0 for k in kernel_size)
    zs = jax.lax.broadcasted_iota(dtype, kernel_size, 0) - cz
    xs = jax.lax.broadcasted_iota(dtype, kernel_size, 1) - cx
    ys = jax.lax.broadcasted_iota(dtype, kernel_size, 2) - cy
    return zs * zs + xs * xs + ys * ys


def _sum_zero_planes(kernel: jnp.ndarray) -> jnp.ndarray:
    """Subtract each z-plane's mean (reference ``cylinder.py:81-82``)."""
    plane_cells = kernel.shape[1] * kernel.shape[2]
    return kernel - jnp.sum(kernel, axis=(1, 2), keepdims=True) / plane_cells


# ---------------------------------------------------------------------------
# Cylinder (reference core/models/geneos/cylinder.py)
# ---------------------------------------------------------------------------

def cylinder_v1(params: Params, kernel_size: KernelSize) -> jnp.ndarray:
    """Ring gaussian on the floor plane, zero-sum, tiled over z.

    ``exp(-((d² - r²)²) / (2σ²))`` (reference ``cylinder.py:72-103``).
    """
    radius = params["radius"]
    sigma = params.get("sigma", jnp.asarray(1.0))
    d2 = _floor_dist2(kernel_size)
    circ = d2 - radius**2
    plane = jnp.exp(circ**2 * (-1.0 / (2.0 * sigma**2)))
    plane = plane - jnp.sum(plane) / (kernel_size[1] * kernel_size[2])
    return jnp.tile(plane[None], (kernel_size[0], 1, 1))


def cylinder_v2(params: Params, kernel_size: KernelSize) -> jnp.ndarray:
    """Filled gaussian disc (live kernel used by ``SceneNet``).

    ``σ·exp(-(d²)² / (2(r+ε)²))``, zero-sum per plane, tiled over z
    (reference ``cylinder.py:152-176``).
    """
    radius = params["radius"]
    sigma = params.get("sigma", jnp.asarray(1.0))
    d2 = _floor_dist2(kernel_size)
    plane = sigma * jnp.exp(d2**2 * (-1.0 / (2.0 * (radius + _EPS) ** 2)))
    plane = plane - jnp.sum(plane) / (kernel_size[1] * kernel_size[2])
    return jnp.tile(plane[None], (kernel_size[0], 1, 1))


# ---------------------------------------------------------------------------
# Cone / arrow (reference core/models/geneos/arrow.py)
# ---------------------------------------------------------------------------

def _apex_cut(params: Params, kernel_size: KernelSize) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Non-differentiable integer apex height and the cone-region mask.

    Returns (h_c, is_cone[z]) where is_cone[z] = z < k_z - h_c.
    """
    apex = params["apex"]
    h_c = jax.lax.stop_gradient(jnp.floor(apex))
    z = jax.lax.broadcasted_iota(jnp.float32, (kernel_size[0], 1, 1), 0)
    cone_height = kernel_size[0] - h_c
    return z, z < cone_height


def cone_v1(params: Params, kernel_size: KernelSize) -> jnp.ndarray:
    """v1 cone: ring gaussians with a per-height sigma schedule.

    Cone planes use ``σ_h = cone_radius·sin(cone_inc·π/(2+h))`` with
    h = cone_height−1−z (planes are *prepended* in the reference loop,
    ``arrow.py:188-196``); cylinder planes use the base (radius, sigma).
    """
    radius = params["radius"]
    sigma = params.get("sigma", jnp.asarray(1.0))
    cone_radius = params.get("cone_radius", jnp.asarray(float(kernel_size[1] - 1)))
    cone_inc = params["cone_inc"]
    z, is_cone = _apex_cut(params, kernel_size)
    cone_height = kernel_size[0] - jax.lax.stop_gradient(jnp.floor(params["apex"]))
    h = cone_height - 1.0 - z
    sig_z = jnp.where(is_cone, cone_radius * jnp.sin(cone_inc * jnp.pi / (2.0 + h)), sigma)
    d2 = _floor_dist2(kernel_size)[None]
    circ = d2 - radius**2
    kernel = jnp.exp(circ**2 * (-1.0 / (2.0 * sig_z**2)))
    return _sum_zero_planes(kernel)


def arrow_v2(params: Params, kernel_size: KernelSize) -> jnp.ndarray:
    """Live arrow kernel: gaussian discs whose radius grows linearly with z.

    Cone planes (z < k_z − h_c): ``r_z = cone_radius·z·tan(clamp(cone_inc,
    0, 0.499)·π)``; cylinder planes: base radius. Every plane is
    ``σ·exp(-(d²)²/(2(r_z+ε)²))``, zero-sum (reference ``arrow.py:228-252``;
    plane z carries the radius of loop index h = z since the reference
    prepends planes for h = cone_height−1 … 0).
    """
    radius = params["radius"]
    sigma = params.get("sigma", jnp.asarray(1.0))
    cone_radius = params.get("cone_radius", jnp.asarray(float(kernel_size[1] - 1)))
    cone_inc = jnp.clip(params["cone_inc"], 0.0, 0.499)
    z, is_cone = _apex_cut(params, kernel_size)
    r_z = jnp.where(is_cone, cone_radius * z * jnp.tan(cone_inc * jnp.pi), radius)
    d2 = _floor_dist2(kernel_size)[None]
    kernel = sigma * jnp.exp(d2**2 * (-1.0 / (2.0 * (r_z + _EPS) ** 2)))
    return _sum_zero_planes(kernel)


# ---------------------------------------------------------------------------
# Negative sphere (reference core/models/geneos/neg_sphere.py)
# ---------------------------------------------------------------------------

def neg_sphere_v1(params: Params, kernel_size: KernelSize) -> jnp.ndarray:
    """3D ring gaussian, volume-mean-centered, shifted by −neg_factor
    (reference ``neg_sphere.py:123-158``)."""
    radius = params["radius"]
    sigma = params.get("sigma", jnp.asarray(1.0))
    neg_factor = params["neg_factor"]
    d2 = _vol_dist2(kernel_size)
    circ = d2 - radius**2
    g = jnp.exp(circ**2 * (-1.0 / (2.0 * sigma**2)))
    volume = math.prod(kernel_size)
    return g - jnp.sum(g) / volume - neg_factor


def neg_sphere_v2(params: Params, kernel_size: KernelSize) -> jnp.ndarray:
    """Live neg-sphere: ``−neg_factor·σ·exp(-(d²)²/(2(r+ε)²))`` then a mean
    shift of ``(sum + neg_factor)/volume`` (reference ``neg_sphere.py:160-199``)."""
    radius = params["radius"]
    sigma = params.get("sigma", jnp.asarray(1.0))
    neg_factor = params["neg_factor"]
    d2 = _vol_dist2(kernel_size)
    g = sigma * jnp.exp(d2**2 * (-1.0 / (2.0 * (radius + _EPS) ** 2)))
    kernel = -neg_factor * g
    volume = math.prod(kernel_size)
    return kernel - (jnp.sum(kernel) + neg_factor) / volume


# ---------------------------------------------------------------------------
# Registry + initialization (reference geneo_random_config / geneo_smart_config)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class KernelDef:
    """A GENEO kernel family: synthesis fn + parameter schema + initializers."""

    name: str
    fn: Callable[[Params, KernelSize], jnp.ndarray]
    mandatory: Tuple[str, ...]
    parameters: Tuple[str, ...]
    non_trainable: Tuple[str, ...]
    random_init: Callable[[np.random.Generator, KernelSize], Dict[str, float]]
    smart_init: Dict[str, float]


def _cyl_random(rng: np.random.Generator, ks: KernelSize) -> Dict[str, float]:
    # reference cylinder.py:112-123
    return {
        "radius": float(rng.integers(1, ks[1])) / 2.0,
        "sigma": float(rng.integers(5, 10)) / 5.0,
    }


def _cone_random(rng: np.random.Generator, ks: KernelSize) -> Dict[str, float]:
    # reference arrow.py:115-135 (apex is non-trainable)
    return {
        "radius": float(rng.integers(1, ks[1])) / 2.0,
        "apex": float(rng.integers(ks[0] // 2, ks[0] - 1)),
        "cone_radius": float(rng.integers(1, ks[1])) / 2.0,
        "cone_inc": float(rng.random()),
        "sigma": float(rng.integers(5, 10)) / 5.0,
    }


def _neg_random(rng: np.random.Generator, ks: KernelSize) -> Dict[str, float]:
    # reference neg_sphere.py:87-104
    return {
        "radius": float(rng.integers(1, ks[1])),
        "neg_factor": float(rng.integers(1, 10)) / 10.0,
        "sigma": float(rng.integers(5, 10)) / 10.0,
    }


KERNEL_REGISTRY: Dict[str, KernelDef] = {
    "cylinder": KernelDef(
        "cylinder", cylinder_v1, ("radius",), ("radius", "sigma"), (),
        _cyl_random, {"radius": 1.0, "sigma": 2.0},
    ),
    "cylinder_v2": KernelDef(
        "cylinder_v2", cylinder_v2, ("radius",), ("radius", "sigma"), (),
        _cyl_random, {"radius": 1.0, "sigma": 2.0},
    ),
    "cone": KernelDef(
        "cone", cone_v1, ("radius", "apex", "cone_radius", "cone_inc"),
        ("radius", "apex", "cone_radius", "cone_inc", "sigma"), ("apex",),
        _cone_random,
        {"radius": 1.0, "apex": 3.0, "cone_radius": 2.0, "cone_inc": 0.1, "sigma": 2.0},
    ),
    "arrow": KernelDef(
        "arrow", arrow_v2, ("radius", "apex", "cone_radius", "cone_inc"),
        ("radius", "apex", "cone_radius", "cone_inc", "sigma"), ("apex",),
        _cone_random,
        {"radius": 1.0, "apex": 3.0, "cone_radius": 2.0, "cone_inc": 0.1, "sigma": 2.0},
    ),
    "neg_sphere": KernelDef(
        "neg_sphere", neg_sphere_v1, ("radius", "neg_factor"),
        ("radius", "neg_factor", "sigma"), (),
        _neg_random, {"radius": 3.0, "sigma": 2.0, "neg_factor": 0.5},
    ),
    "neg_sphere_v2": KernelDef(
        "neg_sphere_v2", neg_sphere_v2, ("radius", "neg_factor"),
        ("radius", "neg_factor", "sigma"), (),
        _neg_random, {"radius": 3.0, "sigma": 2.0, "neg_factor": 0.5},
    ),
}


def random_geneo_params(
    kind: str, rng: np.random.Generator, kernel_size: KernelSize
) -> Dict[str, float]:
    """Random init mirroring the reference's ``geneo_random_config`` draws."""
    return KERNEL_REGISTRY[kind].random_init(rng, kernel_size)


def smart_geneo_params(kind: str) -> Dict[str, float]:
    """Hand-tuned init mirroring the reference's ``geneo_smart_config``."""
    return dict(KERNEL_REGISTRY[kind].smart_init)
