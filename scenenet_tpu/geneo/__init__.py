from scenenet_tpu.geneo.kernels import (
    KERNEL_REGISTRY,
    KernelDef,
    cylinder_v1,
    cylinder_v2,
    cone_v1,
    arrow_v2,
    neg_sphere_v1,
    neg_sphere_v2,
    random_geneo_params,
    smart_geneo_params,
)

__all__ = [
    "KERNEL_REGISTRY",
    "KernelDef",
    "cylinder_v1",
    "cylinder_v2",
    "cone_v1",
    "arrow_v2",
    "neg_sphere_v1",
    "neg_sphere_v2",
    "random_geneo_params",
    "smart_geneo_params",
]
