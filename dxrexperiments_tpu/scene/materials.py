"""Material model.

Field-parity with ``MaterialParams``
(/root/reference/assets/shaders/RaytracingHlslCompat.h:87-96): albedo,
specular, emissive (rgb + strength in .a), reflectivity, roughness, index of
refraction, and an integer type (0 diffuse, 1 glossy, 2 glass).

Host-side materials are small dataclasses; the scene builder stacks them into
an SoA ``[M, ...]`` pytree so shading gathers per-hit material rows — the
TPU-native replacement for per-hit-group root constants
(/root/reference/src/ProgressiveRaytracingPipeline.cpp:220-226).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

MATERIAL_DIFFUSE = 0
MATERIAL_GLOSSY = 1
MATERIAL_GLASS = 2


@dataclasses.dataclass
class Material:
    """One material, reference-default values
    (cf. /root/reference/src/DXRExperimentsApp.cpp:95-104)."""

    albedo: tuple = (1.0, 1.0, 1.0, 1.0)
    specular: tuple = (0.0, 0.0, 0.0, 1.0)
    emissive: tuple = (0.0, 0.0, 0.0, 0.0)  # rgb + strength
    reflectivity: float = 0.0
    roughness: float = 1.0
    ior: float = 1.5
    type: int = MATERIAL_DIFFUSE
    # Optional [H, W, 3] float albedo image multiplied into `albedo` at hit
    # UVs (scene.textures — BEYOND-reference; the DXR materials are
    # constants, RaytracingHlslCompat.h:87-96).
    albedo_texture: "np.ndarray | None" = None

    @staticmethod
    def reference_default() -> "Material":
        """The single material the reference app creates
        (/root/reference/src/DXRExperimentsApp.cpp:98-103)."""
        return Material(
            albedo=(0.95, 0.05, 0.0, 1.0),
            specular=(0.58, 0.58, 0.58, 1.0),
            roughness=0.5,
            reflectivity=0.7,
            type=MATERIAL_GLOSSY,
        )


def stack_materials(materials: list[Material]) -> dict:
    """Stack host materials into the device SoA pytree [M, ...]."""
    if not materials:
        materials = [Material()]
    return {
        "albedo": jnp.asarray(
            np.array([m.albedo[:3] for m in materials], np.float32)
        ),
        "specular": jnp.asarray(
            np.array([m.specular[:3] for m in materials], np.float32)
        ),
        "emissive": jnp.asarray(
            np.array([m.emissive[:3] for m in materials], np.float32)
        ),
        "emissive_strength": jnp.asarray(
            np.array([m.emissive[3] for m in materials], np.float32)
        ),
        "reflectivity": jnp.asarray(
            np.array([m.reflectivity for m in materials], np.float32)
        ),
        "roughness": jnp.asarray(
            np.array([m.roughness for m in materials], np.float32)
        ),
        "ior": jnp.asarray(np.array([m.ior for m in materials], np.float32)),
        "type": jnp.asarray(np.array([m.type for m in materials], np.int32)),
    }


# Row indices of the fused-traversal material table (material_pack).
MP_ALBEDO, MP_SPECULAR, MP_EMISSIVE = 0, 3, 6
MP_ESTR, MP_REFL, MP_ROUGH, MP_TYPE, MP_IOR = 9, 10, 11, 12, 13
MP_MAX_MATERIALS = 128


def material_pack(mats: dict) -> jnp.ndarray:
    """Pack a stacked material pytree (stack_materials) into a [16, 128]
    table for the fused traversal megakernel: per-ray material fetch is one
    one-hot MXU matmul table[16,128] @ sel[128,R] (K=128 = the MXU sweet
    spot). Supports up to MP_MAX_MATERIALS materials (gated by
    supports_fused_traverse)."""
    m = int(mats["albedo"].shape[0])
    if m > MP_MAX_MATERIALS:
        raise ValueError(f"material_pack supports <= {MP_MAX_MATERIALS} materials, got {m}")
    pack = jnp.zeros((16, MP_MAX_MATERIALS), jnp.float32)  # jnp: trace-safe
    pack = pack.at[MP_ALBEDO : MP_ALBEDO + 3, :m].set(mats["albedo"].T)
    pack = pack.at[MP_SPECULAR : MP_SPECULAR + 3, :m].set(mats["specular"].T)
    pack = pack.at[MP_EMISSIVE : MP_EMISSIVE + 3, :m].set(mats["emissive"].T)
    pack = pack.at[MP_ESTR, :m].set(mats["emissive_strength"])
    pack = pack.at[MP_REFL, :m].set(mats["reflectivity"])
    pack = pack.at[MP_ROUGH, :m].set(mats["roughness"])
    pack = pack.at[MP_TYPE, :m].set(mats["type"].astype(jnp.float32))
    pack = pack.at[MP_IOR, :m].set(mats["ior"])
    return pack
