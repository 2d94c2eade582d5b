"""SCENE-Net: GENEO observers combined by trainable convex coefficients.

TPU-first re-design of the reference ``core/models/SCENE_Net.py``:

- The model is a frozen dataclass (static config) + a *pure params pytree*;
  ``apply(params, x)`` is jit/vmap/pjit-friendly and never mutates state.
- The reference stores the "last" convex coefficient as a non-trainable
  parameter that it re-writes inside ``forward``
  (``SCENE_Net.py:330-333``). Here that trick is a *reparameterization*:
  λ_last is derived functionally as ``1 − Σ_{i≠last} λ_i`` every call —
  identical math, no mutation (the stored slot is kept for checkpoint/
  logging parity but ignored by ``apply``).
- Because convolution is linear in the kernel, the default forward path
  synthesizes the G observer kernels, combines them with the convex
  coefficients *first*, and runs a single 1-channel XLA conv instead of a
  G-channel conv + weighted channel sum (``SCENE_Net.py:324-339``). This is
  exact (linearity) and does G× less conv work. ``apply(...,
  fuse_observers=False)`` keeps the per-observer responses for
  interpretability.

Version map (reference): ``SceneNet`` (live) uses the v2 kernels
(cylinderv2 / arrow / negSpherev2, ``SCENE_Net.py:267-275``) with λ init
U[−2/n, 1/n] (``:279-282``); the legacy ``SCENE_Net`` uses v1 kernels with
λ init U[0, 0.6] (``:174-177``). Select with ``version=``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from scenenet_tpu.geneo.kernels import KERNEL_REGISTRY, random_geneo_params, smart_geneo_params
from scenenet_tpu.ops.conv3d import conv3d_same

# geneo_num keys → kernel registry kinds, per model version
# (reference SCENE_Net.py:160-171 for v1, :264-275 for v2)
_KIND_MAP = {
    "v1": {"cy": "cylinder", "cone": "cone", "neg": "neg_sphere"},
    "v2": {"cy": "cylinder_v2", "cone": "arrow", "neg": "neg_sphere_v2"},
}
_LAMBDA_INIT = {"v1": (0.0, 0.6), "v2": None}  # v2 range depends on n


@dataclasses.dataclass(frozen=True)
class SceneNet:
    """Static model definition. Create with :meth:`create` to draw params."""

    geneo_num: Tuple[Tuple[str, int], ...] = (("cy", 1), ("cone", 1), ("neg", 1))
    kernel_size: Tuple[int, int, int] = (9, 6, 6)
    version: str = "v2"
    last_lambda: str = "lambda_neg_0"
    # "xla" | "pallas" (TPU fused stencil, f32-exact train path) |
    # "pallas_mxu" (banded-y MXU train forward, split-bf16 near-f32)
    backend: str = "xla"

    # ---- structure -------------------------------------------------------

    @property
    def observers(self) -> Tuple[Tuple[str, str], ...]:
        """Ordered (observer_name, kernel_kind) pairs, e.g. ('cy_0','cylinder_v2')."""
        kinds = _KIND_MAP[self.version]
        out = []
        for key, num in self.geneo_num:
            for i in range(num):
                out.append((f"{key}_{i}", kinds[key]))
        return tuple(out)

    @property
    def lambda_names(self) -> Tuple[str, ...]:
        return tuple(f"lambda_{name}" for name, _ in self.observers)

    # ---- init ------------------------------------------------------------

    @classmethod
    def create(
        cls,
        geneo_num: Optional[Mapping[str, int]] = None,
        kernel_size: Tuple[int, int, int] = (9, 6, 6),
        version: str = "v2",
        seed: int = 0,
        smart: bool = False,
        backend: str = "xla",
    ) -> Tuple["SceneNet", Dict]:
        """Build a model + randomly initialized params.

        Mirrors the reference constructor: per-observer random (or "smart")
        GENEO parameter draws, uniform λ draw, a random choice of the
        non-trainable "last" λ, and a final re-write of the stored last λ so
        the stored coefficients sum to 1 (``SCENE_Net.py:277-293``).
        """
        geneo_num = dict(geneo_num or {"cy": 1, "cone": 1, "neg": 1})
        rng = np.random.default_rng(seed)
        items = tuple((k, int(v)) for k, v in geneo_num.items())
        n = sum(v for _, v in items)

        lambda_names = [f"lambda_{k}_{i}" for k, v in items for i in range(v)]
        last = lambda_names[int(rng.integers(0, n))]
        model = cls(geneo_num=items, kernel_size=kernel_size, version=version,
                    last_lambda=last, backend=backend)

        geneo_params: Dict[str, Dict[str, jnp.ndarray]] = {}
        for name, kind in model.observers:
            init = smart_geneo_params(kind) if smart else random_geneo_params(kind, rng, kernel_size)
            geneo_params[name] = {k: jnp.asarray(v, jnp.float32) for k, v in init.items()}

        if version == "v1":
            lo, hi = _LAMBDA_INIT["v1"]
        else:
            lo, hi = -2.0 / n, 1.0 / n
        lam = {ln: jnp.asarray(rng.uniform(lo, hi), jnp.float32) for ln in lambda_names}
        lam[last] = 1.0 - sum(lam[ln] for ln in lambda_names) + lam[last]

        return model, {"geneo": geneo_params, "lambdas": lam}

    # ---- functional pieces -------------------------------------------------

    def synthesize_kernels(self, params: Mapping) -> jnp.ndarray:
        """Stack per-observer GENEO kernels: (G, k_z, k_x, k_y)."""
        ks = []
        for name, kind in self.observers:
            ks.append(KERNEL_REGISTRY[kind].fn(params["geneo"][name], self.kernel_size))
        return jnp.stack(ks)

    def effective_lambdas(self, params: Mapping) -> jnp.ndarray:
        """Convex coefficients with λ_last := 1 − Σ others, observer order."""
        free_sum = sum(
            params["lambdas"][ln] for ln in self.lambda_names if ln != self.last_lambda
        )
        lams = []
        for ln in self.lambda_names:
            lams.append(1.0 - free_sum if ln == self.last_lambda else params["lambdas"][ln])
        return jnp.stack(lams)

    def apply(
        self,
        params: Mapping,
        x: jnp.ndarray,
        fuse_observers: bool = True,
        inference: "bool | str" = False,
        tau: "float | None" = None,
    ) -> jnp.ndarray:
        """Forward pass: x (B, 1, Z, X, Y) → tower-probability grid, same shape.

        relu∘tanh head as in the reference (``SCENE_Net.py:337``).
        ``backend="pallas"`` (set on the model) routes the fused path
        through the Pallas stencil kernel — ~2.7× the XLA conv on a v5e
        and full-f32 (the TPU XLA conv rounds through lower precision).

        ``inference=True`` (pallas backend) takes the forward-only stencil
        with a bfloat16 tap scratch — ~12% faster, **bit-exact for {0,1}
        occupancy inputs** (the standard binarized pipeline; ≤~1e-3
        relative for general float grids), and not differentiable. Training
        keeps the default custom-VJP path.

        ``backend="pallas_mxu"`` additionally routes the *training*
        forward through the banded-y MXU stencil via
        :func:`~scenenet_tpu.ops.pallas_conv.fused_geneo_conv_mxu`
        (exact-f32 backward, near-f32 forward; ``inference=True`` then
        also takes the MXU path).

        ``inference="mxu"`` (pallas backend) takes the banded-y MXU
        stencil (:func:`~scenenet_tpu.ops.pallas_conv.geneo_stencil_conv_mxu`,
        hi|lo lane-packed split-bf16, near-f32 — max|Δ| ~5e-6, ZERO
        τ-mask flips over 134 M voxels at the headline shape): the k_y
        lane-rotates fold into 128-aligned MXU contractions, with the
        split's residual packed into the otherwise-wasted N lanes.
        ``inference="mxu_fast"`` (single-bf16, N=yy dots) is RETAINED
        FOR COMPATIBILITY but obsolete since round 5: the packed split
        is both faster (28.1 vs 29.0 ms conv-only at batch 512) and
        tighter — prefer ``"mxu"``. Non-VMEM-resident volumes fall back
        to the streamed MXU variant automatically.

        ``tau`` (static float) returns the τ-thresholded {0,1} mask
        instead of probabilities — ``(relu(tanh(c)) >= τ).astype(f32)``,
        exactly ``prob_to_label(apply(...), τ)``. On the MXU inference
        paths the threshold fuses into the kernel epilogue, saving the
        separate full-volume HBM pass over the probabilities (the
        headline mask contract).
        """
        kernels = self.synthesize_kernels(params).astype(x.dtype)
        lams = self.effective_lambdas(params).astype(x.dtype)
        if fuse_observers:
            # elementwise, NOT an einsum: a TPU dot at default matmul
            # precision would bf16-round the synthesized kernels
            combined = jnp.sum(lams[:, None, None, None] * kernels, axis=0)
            # the stencil kernel z-slabs the volume (VMEM-resident for
            # small grids, HBM-streamed via DMA for 128³+); any Z works —
            # non-slab-divisible extents are padded internally
            if self.backend in ("pallas", "pallas_mxu"):
                from scenenet_tpu.ops.pallas_conv import (
                    fused_geneo_conv, fused_geneo_conv_mxu,
                    geneo_stencil_conv, geneo_stencil_conv_mxu,
                )

                if inference in ("mxu", "mxu_fast") or (
                        inference and self.backend == "pallas_mxu"):
                    # ``tau`` fuses the prob_to_label threshold into the
                    # kernel epilogue (mask out, one HBM pass saved) —
                    # exact: (relu(tanh(c)) >= τ).astype(f32)
                    # max_bz=64: the r5 slab sweep (benchmarks/r5_probes.py
                    # + r5_probe3) measured taller slabs 1-2% faster for
                    # the MXU formulation, in isolation AND in-pipeline,
                    # with bit-identical outputs — the old bz=16 lesson
                    # was specific to the VPU stencil's prefetch overlap
                    return geneo_stencil_conv_mxu(
                        x.astype(jnp.float32),
                        combined.astype(jnp.float32),
                        activation=True, split=inference != "mxu_fast",
                        tau=tau, max_bz=64)
                if inference:
                    out = geneo_stencil_conv(x.astype(jnp.float32),
                                             combined.astype(jnp.float32),
                                             activation=True,
                                             scratch_dtype="bf16")
                    return (out >= tau).astype(out.dtype) \
                        if tau is not None else out
                if self.backend == "pallas_mxu":
                    out = fused_geneo_conv_mxu(x.astype(jnp.float32),
                                               combined.astype(jnp.float32))
                else:
                    out = fused_geneo_conv(x.astype(jnp.float32),
                                           combined.astype(jnp.float32))
                return (out >= tau).astype(out.dtype) \
                    if tau is not None else out
            conv = conv3d_same(x, combined[None, None])
        else:
            conv = conv3d_same(x, kernels[:, None])
            conv = jnp.sum(lams[None, :, None, None, None] * conv,
                           axis=1)[:, None]
        out = jax.nn.relu(jnp.tanh(conv))
        return (out >= tau).astype(out.dtype) if tau is not None else out

    def observer_responses(self, params: Mapping, x: jnp.ndarray) -> jnp.ndarray:
        """Per-observer convolution responses (B, G, Z, X, Y) — the white-box
        interpretability view (pre-λ, pre-activation)."""
        kernels = self.synthesize_kernels(params).astype(x.dtype)
        return conv3d_same(x, kernels[:, None])

    def __call__(self, params: Mapping, x: jnp.ndarray) -> jnp.ndarray:
        return self.apply(params, x)

    # ---- constraint/loss plumbing (reference get_cvx_coefficients /
    # get_geneo_params, SCENE_Net.py:299-311) -------------------------------

    def cvx_coefficients(self, params: Mapping) -> Dict[str, jnp.ndarray]:
        return dict(params["lambdas"])

    def geneo_params_flat(self, params: Mapping) -> Dict[str, jnp.ndarray]:
        out = {}
        for name, _ in self.observers:
            for p, v in params["geneo"][name].items():
                out[f"geneos_{name}_geneo_params_{p}"] = v
        return out

    def trainable_mask(self, params: Mapping) -> Dict:
        """Pytree of bools: False for per-kernel non-trainables and λ_last.

        Feed to ``optax.masked`` — the functional twin of the reference's
        ``requires_grad`` flags (``SCENE_Net.py:86``, ``:291``).
        """
        kinds = dict(self.observers)
        geneo = {
            name: {
                p: p not in KERNEL_REGISTRY[kinds[name]].non_trainable
                for p in params["geneo"][name]
            }
            for name, _ in self.observers
        }
        lam = {ln: ln != self.last_lambda for ln in self.lambda_names}
        return {"geneo": geneo, "lambdas": lam}

    def num_trainable_params(self, params: Mapping) -> int:
        """Trainable scalar count (reference ``get_num_total_params``,
        ``SCENE_Net.py:302-303`` — the recorded run reports 11/13)."""
        mask = self.trainable_mask(params)
        return int(sum(bool(m) for m in jax.tree.leaves(mask)))

    def num_total_params(self, params: Mapping) -> int:
        return len(jax.tree.leaves(params))

    def parameters_in_dict(self, params: Mapping) -> Dict[str, float]:
        """Scalar snapshot for interpretability logging (reference
        ``get_model_parameters_in_dict``, ``SCENE_Net.py:313-319``), with the
        *effective* λ_last."""
        out = {}
        for name, _ in self.observers:
            for p, v in params["geneo"][name].items():
                out[f"{name}.{p}"] = float(v)
        lams = self.effective_lambdas(params)
        for ln, v in zip(self.lambda_names, lams):
            out[ln] = float(v)
        return out


def GENEONet(geneo_num=None, kernel_size=(9, 6, 6), seed: int = 0,
             backend: str = "xla"):
    """Alias for SCENE_Net v1 — the reference's ``GENEONet``
    (``core/models/GENEONet.py:89-180``) is a byte-for-byte duplicate of
    ``SCENE_Net`` (same v1 kernels, U[0,0.6] λ init, identical forward)
    living in a dead import tree (``scenenet_pipeline.torch_geneo``, which
    doesn't resolve there). Returns ``(model, params)`` with
    ``version="v1"``."""
    return SceneNet.create(geneo_num, kernel_size, version="v1", seed=seed,
                           backend=backend)


@dataclasses.dataclass(frozen=True)
class QuantileSceneNet:
    """Ensemble of one SceneNet per target quantile (aleatoric uncertainty).

    Reference ``SCENENetQuantile`` (``SCENE_Net.py:347-415``): the ensemble
    members run under ``vmap`` here instead of a Python loop, producing the
    (B, Q, Z, X, Y) stacked prediction in one compiled conv.
    """

    net: SceneNet
    quantiles: Tuple[float, ...] = (0.1, 0.5, 0.9)

    @property
    def last_lambda(self) -> str:
        return self.net.last_lambda

    @classmethod
    def create(cls, geneo_num=None, kernel_size=(9, 6, 6), quantiles=(0.1, 0.5, 0.9),
               version: str = "v2", seed: int = 0, backend: str = "xla"):
        nets, params = [], []
        for q in range(len(quantiles)):
            net, p = SceneNet.create(geneo_num, kernel_size, version,
                                     seed=seed + q, backend=backend)
            nets.append(net)
            params.append(p)
        # ensemble members share structure; stack their params on a leading axis
        model = cls(net=nets[0], quantiles=tuple(quantiles))
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *params)
        return model, stacked

    def apply(self, params: Mapping, x: jnp.ndarray,
              inference: "bool | str" = False) -> jnp.ndarray:
        """``inference`` forwards to each member's :meth:`SceneNet.apply`
        (``True`` = bf16 tap-scratch stencil, ``"mxu"`` = banded-y MXU)."""
        pred = jax.vmap(
            lambda p: self.net.apply(p, x, inference=inference))(params)
        return jnp.moveaxis(pred[:, :, 0], 0, 1)  # (B, Q, Z, X, Y)

    def _member(self, params, q: int):
        return jax.tree.map(lambda a: a[q], params)

    def cvx_coefficients(self, params):
        return [
            self.net.cvx_coefficients(self._member(params, q))
            for q in range(len(self.quantiles))
        ]

    def geneo_params_flat(self, params):
        return [
            self.net.geneo_params_flat(self._member(params, q))
            for q in range(len(self.quantiles))
        ]

    def trainable_mask(self, params):
        base = self.net.trainable_mask(jax.tree.map(lambda a: a[0], params))
        return base


@dataclasses.dataclass(frozen=True)
class SceneNetClassifier:
    """SceneNet + trainable threshold τ → hard {0,1} grid.

    Reference ``SCENE_Net_Class`` (``SCENE_Net.py:421-466``). The hard
    comparison is non-differentiable there too; we expose a
    straight-through estimator so τ still receives gradient if trained.
    """

    net: SceneNet

    @classmethod
    def create(cls, geneo_num=None, kernel_size=(9, 6, 6), version: str = "v2", seed: int = 0):
        net, params = SceneNet.create(geneo_num, kernel_size, version, seed)
        rng = np.random.default_rng(seed + 17)
        # the reference draws tau = (tau_max - tau_min)·rand — U[0, 0.4]:
        # its tau_min=0.2 never shifts the draw (SCENE_Net.py:441-443).
        # Reproduced as executed, not as presumably intended.
        tau = jnp.asarray(0.4 * rng.random(), jnp.float32)
        return cls(net=net), {**params, "tau": tau}

    def apply(self, params: Mapping, x: jnp.ndarray, straight_through: bool = False) -> jnp.ndarray:
        probs = self.net.apply(params, x)
        hard = (probs >= params["tau"]).astype(x.dtype)
        if straight_through:
            soft = jax.nn.sigmoid((probs - params["tau"]) * 50.0)
            return soft + jax.lax.stop_gradient(hard - soft)
        return hard

    # constraint-penalty hooks forwarded to the inner net, like the
    # reference's get_cvx_coefficients/get_geneo_params (SCENE_Net.py:456-460)
    # — without these, GENEO criteria silently drop every penalty term
    # when training the classifier
    def cvx_coefficients(self, params):
        return self.net.cvx_coefficients(params)

    def geneo_params_flat(self, params):
        return self.net.geneo_params_flat(params)

    @property
    def last_lambda(self):
        return self.net.last_lambda

    def synthesize_kernels(self, params):
        return self.net.synthesize_kernels(params)

    def parameters_in_dict(self, params):
        out = dict(self.net.parameters_in_dict(params))
        out["tau"] = float(params["tau"])
        return out

    def trainable_mask(self, params):
        mask = self.net.trainable_mask(params)
        return {**mask, "tau": True}
