"""Import reference (PyTorch/Lightning) SCENE-Net checkpoints.

Lets users of the reference migrate trained models directly:
- Lightning ``.ckpt`` files (the bundled wandb run ships 24 of them) —
  ``state_dict`` keys ``model.geneos.<obs>.geneo_params.<p>`` and
  ``model.lambdas_dict.lambda_<obs>`` plus hyper_parameters
  (geneo_num / kernel_size).
- Legacy ``gnet.pt`` dicts ``{models: {tag: {model_state_dict}},
  model_props}`` including the ``phi`` → ``lambda`` key migration
  (reference ``core/models/SCENE_Net.py:18-49``).

Unpickling is *tolerant*: classes from packages we don't ship
(torchvision, pytorch_lightning) resolve to inert stubs, since only the
tensor leaves matter.
"""

from __future__ import annotations

import os
import pickle
import sys
from typing import Any, Dict, List, Optional, Tuple

import numpy as np


class _Stub:
    """Inert stand-in for unimportable classes inside a checkpoint."""

    def __init__(self, *args, **kwargs):
        pass

    def __setstate__(self, state):
        self.__dict__["_state"] = state

    def __reduce__(self):
        return (_Stub, ())


class _TolerantUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        try:
            __import__(module)
            return getattr(sys.modules[module], name)
        except Exception:
            return _Stub


class _PickleModule:
    Unpickler = _TolerantUnpickler

    @staticmethod
    def load(*args, **kwargs):
        return pickle.load(*args, **kwargs)


def _torch_load(path: str) -> Any:
    import torch

    return torch.load(path, map_location="cpu", weights_only=False,
                      pickle_module=_PickleModule)


def load_lightning_checkpoint(path: str) -> Dict[str, Any]:
    """Raw Lightning checkpoint dict (state_dict values → numpy)."""
    ck = _torch_load(path)
    state = {k: np.asarray(v) for k, v in ck["state_dict"].items()}
    return {
        "state_dict": state,
        "hyper_parameters": dict(ck.get("hyper_parameters", {}) or {}),
        "epoch": ck.get("epoch"),
        "global_step": ck.get("global_step"),
    }


def load_legacy_state_dict(path: str, model_tag: str = "loss") -> Dict[str, np.ndarray]:
    """Legacy ``gnet.pt`` format with phi→lambda migration."""
    run = _torch_load(path)
    models = run.get("models", {})
    if model_tag == "loss" and "best_loss" in models:
        model_tag = "best_loss"
    if model_tag not in models:
        raise KeyError(f"{model_tag!r} not in checkpoint; has {list(models)}")
    sd = models[model_tag]["model_state_dict"]
    out = {}
    for key, val in sd.items():
        out[key.replace("phi", "lambda")] = np.asarray(val)
    return out


def _params_from_state(state: Dict[str, np.ndarray], model) -> Dict:
    import jax.numpy as jnp

    geneo: Dict[str, Dict] = {}
    lambdas: Dict[str, Any] = {}
    for key, val in state.items():
        parts = key.split(".")
        if "geneo_params" in parts:
            obs = parts[parts.index("geneos") + 1]
            geneo.setdefault(obs, {})[parts[-1]] = jnp.asarray(val, jnp.float32)
        elif "lambdas_dict" in parts or parts[-1].startswith("lambda"):
            lambdas[parts[-1]] = jnp.asarray(val, jnp.float32)
    # sanity: every observer the model expects is present
    for name, _ in model.observers:
        if name not in geneo:
            raise KeyError(f"checkpoint missing observer {name!r}")
    for ln in model.lambda_names:
        if ln not in lambdas:
            raise KeyError(f"checkpoint missing coefficient {ln!r}")
    return {"geneo": geneo, "lambdas": lambdas}


def import_scenenet_params(path: str, version: str = "v2"):
    """Lightning ``.ckpt`` → (SceneNet model, params pytree).

    Note on the non-trainable "last" λ: the state dict does not record
    which coefficient was frozen, but the reference stores the frozen one
    already synced to ``1 − Σ others`` — so any choice of ``last_lambda``
    yields the same effective coefficients. We keep the model default.
    """
    from scenenet_tpu.models import SceneNet

    ck = load_lightning_checkpoint(path)
    hp = ck["hyper_parameters"]
    geneo_num = dict(hp.get("geneo_num") or {"cy": 1, "cone": 1, "neg": 1})
    kernel_size = tuple(hp.get("kernel_size") or (9, 6, 6))
    model, _ = SceneNet.create(geneo_num, kernel_size, version=version, seed=0)
    params = _params_from_state(ck["state_dict"], model)
    return model, params


def export_torch_state_dict(model, params, path: str) -> None:
    """Inverse migration: write our SceneNet params as a torch state dict
    with the reference's key layout (``model.geneos.<obs>.geneo_params.<p>``
    / ``model.lambdas_dict.lambda_<obs>``), loadable by the reference's
    Lightning wrapper."""
    import torch

    sd = {}
    for name, _ in model.observers:
        for p, v in params["geneo"][name].items():
            sd[f"model.geneos.{name}.geneo_params.{p}"] = torch.tensor(float(v))
    lams = model.effective_lambdas(params)
    for ln, v in zip(model.lambda_names, lams):
        sd[f"model.lambdas_dict.{ln}"] = torch.tensor(float(v))
    torch.save({
        "state_dict": sd,
        "hyper_parameters": {
            "geneo_num": dict(model.geneo_num),
            "kernel_size": tuple(model.kernel_size),
        },
    }, path)


def scan_model_zoo(root: str) -> List[Dict[str, Any]]:
    """Walk a directory tree of checkpoints and report what's loadable
    (reference ``observer_utils.py:658-723`` best-model search)."""
    report = []
    for dirpath, _, files in os.walk(root):
        for fname in files:
            path = os.path.join(dirpath, fname)
            entry: Dict[str, Any] = {"path": path}
            try:
                if fname.endswith(".ckpt"):
                    ck = load_lightning_checkpoint(path)
                    entry.update(kind="lightning", epoch=ck["epoch"],
                                 step=ck["global_step"],
                                 params=len(ck["state_dict"]))
                elif fname.endswith((".pt", ".pth")):
                    run = _torch_load(path)
                    entry.update(kind="legacy", tags=list(run.get("models", {})))
                elif fname.endswith(".npz"):
                    entry.update(kind="native", params=len(np.load(path).files))
                else:
                    continue
            except Exception as exc:
                entry.update(kind="unreadable", error=str(exc))
            report.append(entry)
    return report
