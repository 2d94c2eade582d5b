"""Loss parity vs torch oracles of the reference formulas
(core/criterions/{w_mse,geneo_loss,tversky_loss,dice_loss,focal_loss,
iou_loss,quant_loss}.py), including the weighting-table quirks."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from scenenet_tpu import losses as L

FREQS = (52648, 52727, 52553, 52392, 52366, 52380, 52501, 51922, 52499, 52300)
RANGES = tuple(np.round(np.arange(10) * 0.1, 4))


def torch_weight_target(y, freqs, ranges, alpha=1.0, eps=0.1):
    """Oracle of WeightedMSE.get_weight_target incl. the sequential in-place
    index→frequency substitution (w_mse.py:114-145)."""
    # bin in float32 like the device path (the reference bins in float64;
    # they only differ at exact midpoint ties, which real reg targets avoid)
    y32 = torch.as_tensor(np.asarray(y, np.float32))
    freqs_t = torch.as_tensor(freqs, dtype=torch.int64)
    ranges_t = torch.as_tensor(np.asarray(ranges, np.float32))
    hist_idx = torch.abs(y32.unsqueeze(-1) - ranges_t).argmin(dim=-1)
    for idx in range(len(freqs_t)):
        hist_idx[hist_idx == idx] = freqs_t[idx]
    fmin, fmax = freqs_t.min(), freqs_t.max()
    dens = (hist_idx - fmin) / (fmax - fmin)
    w = torch.max(1 - alpha * dens, torch.full_like(dens, eps))
    return w / w.mean()


@pytest.fixture(scope="module")
def wmse():
    return L.WeightedMSE(freqs=FREQS, ranges=RANGES)


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    pred = rng.random((2, 1, 8, 8, 8)).astype(np.float32)
    gt = (rng.random((2, 1, 8, 8, 8)) > 0.8).astype(np.float32)
    return pred, gt


class TestWeightedMSE:
    def test_weight_target_matches_oracle(self, wmse):
        y = np.linspace(0, 1, 101).astype(np.float32)
        ours = np.asarray(wmse.weight_target(jnp.asarray(y)))
        ref = torch_weight_target(y, FREQS, RANGES).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5)

    def test_collision_quirk(self):
        # tiny frequencies collide with later bin indices — both paths must
        # substitute them twice, identically
        freqs = (3, 50, 40, 7, 60, 55, 44, 33, 22, 11)
        crit = L.WeightedMSE(freqs=freqs, ranges=RANGES)
        y = np.array([0.0, 0.3, 0.65, 1.0], dtype=np.float32)
        ours = np.asarray(crit.weight_target(jnp.asarray(y)))
        ref = torch_weight_target(y, freqs, RANGES).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5)

    def test_forward(self, wmse, data):
        pred, gt = data
        ours = float(wmse(jnp.asarray(pred), jnp.asarray(gt)))
        w = torch_weight_target(gt, FREQS, RANGES)
        ref = float((w * (torch.as_tensor(gt, dtype=torch.float64) -
                          torch.as_tensor(pred, dtype=torch.float64)) ** 2).mean())
        np.testing.assert_allclose(ours, ref, rtol=1e-4)

    def test_loads_reference_fixture(self):
        crit = L.WeightedMSE.create()
        assert crit.freqs == FREQS

    def test_hist_frequency_estimation(self):
        y = np.array([0.05, 0.05, 0.15, 0.95, 1.0])
        freqs, ranges = L.hist_frequency_estimation(y)
        # int(10*y): two in bin 0, one in bin 1, one in bin 9, 1.0 → bin 10
        assert freqs[0] == 2 and freqs[1] == 1 and freqs[9] == 1
        assert len(freqs) == 11 and freqs[10] == 1  # torch.bincount growth
        np.testing.assert_allclose(ranges, RANGES, atol=1e-6)


class TestSegmentationLosses:
    def test_tversky(self, data):
        pred, gt = data
        ours = float(L.TverskyLoss(0.5, 1.0, 1.0)(jnp.asarray(pred), jnp.asarray(gt)))
        p, t = torch.as_tensor(pred).flatten(), torch.as_tensor(gt).flatten()
        tp = (p * t).sum()
        fp = ((1 - t) * p).sum()
        fn = (t * (1 - p)).sum()
        ref = float(1 - (tp + 1) / (tp + 0.5 * fp + 1.0 * fn + 1))
        np.testing.assert_allclose(ours, ref, rtol=1e-5)

    def test_focal_tversky(self, data):
        pred, gt = data
        crit = L.FocalTverskyLoss(2.0, 1.0, 4.0, 1e-6)
        ours = float(crit(jnp.asarray(pred), jnp.asarray(gt)))
        p, t = torch.as_tensor(pred), torch.as_tensor(gt)
        tp = (p * t).sum(); fp = ((1 - t) * p).sum(); fn = (t * (1 - p)).sum()
        tv = (tp + 1e-6) / (tp + 2.0 * fp + 1.0 * fn + 1e-6)
        ref = float((1 - tv) ** 4.0)
        np.testing.assert_allclose(ours, ref, rtol=1e-4)

    def test_dice(self, data):
        pred, gt = data
        ours = float(L.BinaryDiceLoss()(jnp.asarray(pred), jnp.asarray(gt)))
        p = torch.as_tensor(pred).reshape(2, -1)
        t = torch.as_tensor(gt).reshape(2, -1)
        num = (p * t).sum(1) + 1
        den = (p**2 + t**2).sum(1) + 1
        ref = float((1 - num / den).mean())
        np.testing.assert_allclose(ours, ref, rtol=1e-5)

    def test_focal(self, data):
        pred, gt = data
        pred = np.clip(pred, 1e-4, 1 - 1e-4)
        ours = float(L.FocalLoss(0.5, 2.0)(jnp.asarray(pred), jnp.asarray(gt)))
        bce = torch.nn.functional.binary_cross_entropy(
            torch.as_tensor(pred).flatten(), torch.as_tensor(gt).flatten()
        )
        ref = float(0.5 * (1 - torch.exp(-bce)) ** 2 * bce)
        np.testing.assert_allclose(ours, ref, rtol=1e-4)

    def test_iou(self, data):
        pred, gt = data
        ours = float(L.IoULoss()(jnp.asarray(pred), jnp.asarray(gt)))
        p, t = torch.as_tensor(pred), torch.as_tensor(gt)
        inter = (p * t).sum()
        union = (p + t).sum() - inter
        ref = float(1 - (inter + 1) / (union + 1))
        np.testing.assert_allclose(ours, ref, rtol=1e-5)

    def test_dice_bce(self, data):
        pred, gt = data
        pred = np.clip(pred, 1e-4, 1 - 1e-4)
        crit = L.BinaryDiceBCE(w_mse=L.WeightedMSE(freqs=FREQS, ranges=RANGES))
        ours = float(crit(jnp.asarray(pred), jnp.asarray(gt)))
        w = torch_weight_target(gt, FREQS, RANGES)
        bce = torch.nn.functional.binary_cross_entropy(
            torch.as_tensor(pred, dtype=torch.float64),
            torch.as_tensor(gt, dtype=torch.float64), reduction="none",
        )
        p = torch.as_tensor(pred, dtype=torch.float64).reshape(2, -1)
        t = torch.as_tensor(gt, dtype=torch.float64).reshape(2, -1)
        dice = (1 - ((p * t).sum(1) + 1) / ((p**2 + t**2).sum(1) + 1)).mean()
        ref = float((w * bce).mean() + dice)
        np.testing.assert_allclose(ours, ref, rtol=1e-4)


class TestGENEOPenalties:
    def test_cvx_loss(self):
        cvx = {"lambda_cy_0": jnp.asarray(-0.2), "lambda_cone_0": jnp.asarray(0.5),
               "lambda_neg_0": jnp.asarray(0.4)}
        # derived last = 1 - 0.7 + 0.4 = 0.7 (positive, no penalty);
        # free penalty = relu(0.2) = 0.2
        val = float(L.cvx_loss(cvx, "lambda_neg_0", cvx_w=5.0))
        np.testing.assert_allclose(val, 5.0 * 0.2, rtol=1e-6)

    def test_cvx_loss_penalizes_derived_last(self):
        cvx = {"lambda_cy_0": jnp.asarray(0.8), "lambda_cone_0": jnp.asarray(0.5),
               "lambda_neg_0": jnp.asarray(0.0)}
        # derived last = 1 - 1.3 + 0.0 = -0.3
        val = float(L.cvx_loss(cvx, "lambda_neg_0", cvx_w=1.0))
        np.testing.assert_allclose(val, 0.3, rtol=1e-5)

    def test_positive_regularizer(self):
        params = {"a": jnp.asarray(-1.5), "b": jnp.asarray(2.0)}
        assert float(L.positive_regularizer(params, 2.0)) == pytest.approx(3.0)

    def test_empty_dicts(self):
        assert float(L.cvx_loss({}, None)) == 0.0
        assert float(L.positive_regularizer({})) == 0.0

    def test_geneo_tversky_composition(self, data):
        pred, gt = data
        crit = L.GENEOTverskyLoss(
            w_mse=L.WeightedMSE(freqs=FREQS, ranges=RANGES),
            convex_weight=5.0,
            tversky=L.FocalTverskyLoss(2.0, 1.0, 4.0, 1e-6),
        )
        cvx = {"lambda_cy_0": jnp.asarray(-0.1), "lambda_neg_0": jnp.asarray(0.2)}
        geneo = {"cy_0_radius": jnp.asarray(-2.0)}
        total = float(crit(jnp.asarray(pred), jnp.asarray(gt), cvx, geneo, "lambda_neg_0"))
        parts = (
            float(crit.w_mse(jnp.asarray(pred), jnp.asarray(gt)))
            + float(crit.tversky(jnp.asarray(pred), jnp.asarray(gt)))
            + float(L.cvx_loss(cvx, "lambda_neg_0", 5.0))
            + float(L.positive_regularizer(geneo, 5.0))
        )
        np.testing.assert_allclose(total, parts, rtol=1e-5)


class TestQuantile:
    def test_pinball(self):
        rng = np.random.default_rng(1)
        pred = rng.random((2, 3, 4, 4, 4)).astype(np.float32)
        gt = rng.random((2, 1, 4, 4, 4)).astype(np.float32)
        crit = L.QuantileLoss(w_mse=L.WeightedMSE(freqs=FREQS, ranges=RANGES))
        ours = float(crit(jnp.asarray(pred), jnp.asarray(gt)))

        qs = [0.1, 0.5, 0.9]
        g = torch.as_tensor(gt, dtype=torch.float64)[:, 0]
        p = torch.as_tensor(pred, dtype=torch.float64)
        qsum = sum(
            torch.max(q * (g - p[:, i]), (q - 1) * (g - p[:, i]))
            for i, q in enumerate(qs)
        )
        w = torch_weight_target(g.numpy(), FREQS, RANGES)
        ref = float((w * qsum).mean())
        np.testing.assert_allclose(ours, ref, rtol=1e-4)


class TestRegistry:
    @pytest.mark.parametrize("name", ["mse", "dice", "tversky", "focal_tversky",
                                      "geneo", "geneo_dice", "geneo_dice_bce",
                                      "geneo_tversky", "quantile"])
    def test_resolve_and_build(self, name, data):
        pred, gt = data
        pred = np.clip(pred, 1e-4, 1 - 1e-4)
        crit = L.resolve_criterion(name)(
            weight_alpha=1.0, weight_epsilon=0.1, mse_weight=1.0,
            convex_weight=5.0, tversky_alpha=2.0, tversky_beta=1.0,
            tversky_smooth=1e-6, focal_gamma=4.0,
        )
        if name == "quantile":
            pred_q = np.repeat(pred, 3, axis=1)
            val = float(crit(jnp.asarray(pred_q), jnp.asarray(gt)))
        else:
            val = float(crit(jnp.asarray(pred), jnp.asarray(gt), {}, {}, None))
        assert np.isfinite(val)

    def test_unknown_raises(self):
        with pytest.raises(NotImplementedError):
            L.resolve_criterion("nope")
