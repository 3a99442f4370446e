"""Host-side mutable scene container.

Mirror of /root/reference/src/Scene.{h,cpp}: asset containers, name-keyed
texture dedupe (Scene.cpp:38-45), material<->texture pairing by map name
(Scene.cpp:70-100), tri->material pairing by mtl name (deferred to IR
build), plus the default 0.5-grey HDRI.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .camera import Camera
from .hdri import HDRI
from .material import MAP_SLOTS, Material
from .objloader import MeshData


@dataclasses.dataclass
class PointLight:
    position: np.ndarray
    radiance: np.ndarray


class Scene:
    def __init__(self):
        self.camera = Camera()
        self.materials: list[Material] = []
        self.textures = []           # list[Texture]
        self.texture_ids: dict[str, int] = {}
        self.meshes: list[MeshData] = []
        self.point_lights: list[PointLight] = []
        self.hdri = HDRI()           # default constant 0.5 grey
        self.x_res = 1280
        self.y_res = 720
        # True whenever content changed since the last build(); lets the
        # command layer resume a paused render instead of rebuilding
        # (the reference rebuilds on every start, Managers.cpp:234-275,
        # and its declared pause is a no-op — this is the completion).
        self.dirty = True

    # -- mutators (Scene.cpp:36-68) ---------------------------------------
    def add_texture(self, texture) -> None:
        """Name-keyed dedupe (Scene.cpp:38-45)."""
        if texture.name not in self.texture_ids:
            self.texture_ids[texture.name] = len(self.textures)
            self.textures.append(texture)
            self.dirty = True

    def add_material(self, material: Material) -> None:
        self.materials.append(material)
        self.dirty = True

    def add_mesh(self, mesh: MeshData) -> None:
        self.meshes.append(mesh)
        self.dirty = True

    def add_meshes(self, meshes) -> None:
        for m in meshes:
            self.add_mesh(m)

    def add_point_light(self, light: PointLight) -> None:
        self.point_lights.append(light)
        self.dirty = True

    def add_hdri(self, hdri: HDRI) -> None:
        self.hdri = hdri
        self.dirty = True

    def set_camera(self, camera: Camera) -> None:
        self.camera = camera
        self.dirty = True

    # -- pairing ----------------------------------------------------------
    def pair_textures(self) -> None:
        """Resolve material map names -> texture IDs (Scene.cpp:70-100).

        The reference skips the transmission slot (a latent bug); we pair
        all seven slots — transmission maps otherwise could never load.
        """
        for mat in self.materials:
            for slot in MAP_SLOTS:
                name = getattr(mat, f"{slot}_map")
                if name and name in self.texture_ids:
                    setattr(mat, f"{slot}_texture_id", self.texture_ids[name])

    def pair_materials(self) -> None:
        """Tri->material by name happens at IR build; kept for API parity
        with Scene::pair_materials (Scene.cpp:102-120)."""

    # -- stats ------------------------------------------------------------
    @property
    def tri_count(self) -> int:
        return sum(m.tri_count for m in self.meshes)

    def build(self, config=None, bvh_depth=None, packed_attrs=True):
        """Flatten to (RenderConfig, device IR)."""
        from .ir import build_ir
        return build_ir(self, config=config, bvh_depth=bvh_depth,
                        packed_attrs=packed_attrs)
