from scenenet_tpu.compat.torch_import import (
    load_lightning_checkpoint,
    load_legacy_state_dict,
    export_torch_state_dict,
    import_scenenet_params,
    scan_model_zoo,
)

__all__ = [
    "load_lightning_checkpoint",
    "load_legacy_state_dict",
    "export_torch_state_dict",
    "import_scenenet_params",
    "scan_model_zoo",
]
