"""Golden parity against the ACTUAL reference implementation.

VERDICT r1 #4: the transcribed torch oracles in test_geneo_kernels.py could
share a misreading with the implementation. These tests import the real
reference modules (``core/models/geneos/*.py``, ``core/models/SCENE_Net.py``
— heavy deps stubbed by :mod:`scenenet_tpu.compat.reference_oracle`), run
the reference code, and compare:

- every kernel family (v1 + v2) across the shipped configs
  ((9,5,5) / (9,6,6) / (9,9,9)) over several random parameter draws,
- the FULL SceneNet forward (kernel synthesis → stacked conv → convex
  combination with derived last λ → relu∘tanh) on a real fixture crop.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from scenenet_tpu.compat.reference_oracle import load_reference
from scenenet_tpu.geneo.kernels import KERNEL_REGISTRY, random_geneo_params

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="/root/reference absent")

KSIZES = [(9, 5, 5), (9, 6, 6), (9, 9, 9)]


def _ref_class(kind):
    return {
        "cylinder": ref.cylinder.cylinder_kernel,
        "cylinder_v2": ref.cylinder.cylinderv2,
        "cone": ref.arrow.cone_kernel,
        "arrow": ref.arrow.arrow,
        "neg_sphere": ref.neg_sphere.neg_sphere_kernel,
        "neg_sphere_v2": ref.neg_sphere.negSpherev2,
    }[kind]


class TestKernelGolden:
    @pytest.mark.parametrize("kind", list(KERNEL_REGISTRY))
    @pytest.mark.parametrize("ks", KSIZES)
    def test_matches_reference_code(self, kind, ks):
        if kind.startswith("neg_sphere") and len(set(ks)) > 1:
            # documented deviation (geneo/kernels.py:21-24): the reference's
            # ``torch.t(...).view(kernel_size)`` scrambles indices for
            # non-cubic kernels (rows are built y-major but reshaped
            # z-major); we implement the intended radial math. For cubic
            # sizes the scramble is value-neutral (radial symmetry), so the
            # cubic golden below still executes the real reference code.
            pytest.skip("reference neg_sphere scrambles non-cubic kernels")
        cls = _ref_class(kind)
        for seed in range(3):
            rng = np.random.default_rng(100 * seed + sum(map(ord, kind)) % 97)
            draw = random_geneo_params(kind, rng, ks)
            tkwargs = {k: torch.tensor(float(v)) for k, v in draw.items()}
            theirs = cls(kind, ks, **tkwargs).kernel.detach().numpy()
            jparams = {k: jnp.asarray(v, jnp.float32) for k, v in draw.items()}
            mine = np.asarray(KERNEL_REGISTRY[kind].fn(jparams, ks))
            assert mine.shape == tuple(ks)
            np.testing.assert_allclose(
                mine, theirs, atol=2e-5, rtol=1e-4,
                err_msg=f"{kind} {ks} draw {draw}",
            )

    @pytest.mark.parametrize("apex", [0.0, 4.0, 5.7, 9.0])
    def test_arrow_apex_schedule(self, apex):
        # the masked fixed-shape z-schedule must match the reference's
        # data-dependent python loop at every apex regime
        ks = (9, 6, 6)
        draw = {"radius": 1.5, "apex": apex, "cone_radius": 2.0,
                "cone_inc": 0.2, "sigma": 1.4}
        tkwargs = {k: torch.tensor(float(v)) for k, v in draw.items()}
        theirs = ref.arrow.arrow("arrow", ks, **tkwargs).kernel.detach().numpy()
        jparams = {k: jnp.asarray(v, jnp.float32) for k, v in draw.items()}
        mine = np.asarray(KERNEL_REGISTRY["arrow"].fn(jparams, ks))
        np.testing.assert_allclose(mine, theirs, atol=2e-5, rtol=1e-4)


class TestFullForwardGolden:
    # non-cubic sizes use a neg-free observer bank (the reference's
    # neg_sphere scrambles non-cubic kernels — see TestKernelGolden); the
    # cubic config exercises all three kernel families
    @pytest.mark.parametrize("ks,geneo_num", [
        ((9, 5, 5), {"cy": 2, "cone": 1}),
        ((9, 6, 6), {"cy": 1, "cone": 2}),
        ((9, 9, 9), {"cy": 1, "cone": 1, "neg": 1}),
    ])
    def test_scenenet_forward_matches_reference(self, ks, geneo_num, sample_clouds):
        from scenenet_tpu.models import SceneNet
        from scenenet_tpu.ops.voxel_np import hist_on_voxel_np

        net, params = SceneNet.create(geneo_num, kernel_size=ks, seed=3)

        # build the reference model and copy our params into it
        tnet = ref.scene_net.SceneNet(geneo_num=dict(geneo_num), kernel_size=ks)
        tnet.last_lambda = net.last_lambda
        sd = {}
        for name, _ in net.observers:
            for p, v in params["geneo"][name].items():
                sd[f"geneos.{name}.geneo_params.{p}"] = torch.tensor(float(v))
        lams = net.effective_lambdas(params)
        for ln, v in zip(net.lambda_names, np.asarray(lams)):
            sd[f"lambdas_dict.{ln}"] = torch.tensor(float(v))
        tnet.load_state_dict(sd)

        cloud = sample_clouds[0]
        hist = hist_on_voxel_np(cloud[:, :3], (32, 32, 32))
        x = (hist > 0).astype(np.float32)[None, None]

        theirs = tnet(torch.tensor(x, dtype=torch.double)).detach().numpy()
        mine = np.asarray(net.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(mine, theirs, atol=5e-5, rtol=1e-4)

    def test_v1_scenenet_forward_matches_reference(self, sample_clouds):
        from scenenet_tpu.models import SceneNet
        from scenenet_tpu.ops.voxel_np import hist_on_voxel_np

        # neg-free bank: non-cubic kernel + the reference's neg_sphere
        # scramble (see TestKernelGolden) would otherwise diverge
        ks = (9, 6, 6)
        net, params = SceneNet.create({"cy": 2, "cone": 1},
                                      kernel_size=ks, version="v1", seed=5)
        tnet = ref.scene_net.SCENE_Net(
            geneo_num={"cy": 2, "cone": 1}, kernel_size=ks,
            device=torch.device("cpu"))
        tnet.last_lambda = net.last_lambda
        sd = {}
        for name, _ in net.observers:
            for p, v in params["geneo"][name].items():
                sd[f"geneos.{name}.geneo_params.{p}"] = torch.tensor(float(v))
        lams = net.effective_lambdas(params)
        for ln, v in zip(net.lambda_names, np.asarray(lams)):
            sd[f"lambdas_dict.{ln}"] = torch.tensor(float(v))
        tnet.load_state_dict(sd)

        cloud = sample_clouds[0]
        hist = hist_on_voxel_np(cloud[:, :3], (32, 32, 32))
        x = (hist > 0).astype(np.float32)[None, None]

        theirs = tnet(torch.tensor(x, dtype=torch.double)).detach().numpy()
        mine = np.asarray(net.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(mine, theirs, atol=5e-5, rtol=1e-4)
