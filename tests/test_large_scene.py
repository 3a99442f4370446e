"""BASELINE config 5 analog: ~1M-tri scene, sharded render on the
8-virtual-device mesh (multi-host stands in via the forced device count)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from elevenrender_tpu.parallel.mesh import (PIXEL_AXIS, make_mesh,
                                            replicate_ir,
                                            shard_render_state)
from elevenrender_tpu.render.integrator import (BEAUTY, init_state,
                                                render_sample)
from elevenrender_tpu.scene.hdri import HDRI
from elevenrender_tpu.scene.material import Material
from elevenrender_tpu.scene.scene import Scene
from elevenrender_tpu.scene.texture import Texture

from scenes import heightfield_mesh


def test_million_tri_sharded_render():
    mesh = heightfield_mesh(708)  # 2*707^2 = 999,698 tris
    assert mesh.tri_count > 990_000

    scene = Scene()
    scene.add_mesh(mesh)
    mat = Material(name="terrain", roughness=0.7)
    mat.compute_aniso_alphas()
    scene.add_material(mat)
    scene.add_hdri(HDRI(Texture.from_color([0.4, 0.5, 0.7])))
    scene.camera.position = np.array([0.0, 2.0, -4.0], np.float32)
    scene.camera.rotation = np.array([20.0, 0.0, 0.0], np.float32)
    scene.x_res = scene.y_res = 32

    config, ir = scene.build()
    config = config.replace(compat=False, max_bounces=1, sample_target=1)
    assert config.bvh_depth >= 14

    device_mesh = make_mesh(8)
    ir = replicate_ir(ir, device_mesh)
    state = shard_render_state(init_state(config), device_mesh)
    step = jax.jit(
        lambda ir, st: render_sample(config, ir, st),
        out_shardings={
            "passes": NamedSharding(device_mesh, P(None, PIXEL_AXIS, None)),
            "samples": NamedSharding(device_mesh, P(PIXEL_AXIS)),
            "rng": NamedSharding(device_mesh, P(PIXEL_AXIS)),
        })
    state = step(ir, state)
    img = np.asarray(state["passes"][BEAUTY, :, :3])
    assert np.isfinite(img).all()
    assert (img.sum(-1) > 0).mean() > 0.3  # terrain + sky both light pixels
