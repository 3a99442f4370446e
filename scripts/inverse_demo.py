"""Inverse rendering demo (BASELINE config 4): recover a wall albedo from
a target image by gradient descent through the renderer.

Usage: python scripts/inverse_demo.py [outdir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

if os.environ.get("ELEVENRT_DEVICE", "cpu") == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from elevenrender_tpu.render.grad import render_beauty, render_loss_and_grad  # noqa: E402
from scenes import cornell_scene  # noqa: E402

outdir = sys.argv[1] if len(sys.argv) > 1 else "out"
os.makedirs(outdir, exist_ok=True)

RES = 32
scene, config, ir = cornell_scene(res=RES, spp=2)
config = config.replace(compat=False, max_bounces=2)

target_albedo = jnp.array([0.15, 0.55, 0.75])  # teal wall to recover
target_ir = dict(ir)
target_ir["materials"] = {**ir["materials"],
                          "albedo": ir["materials"]["albedo"].at[0]
                          .set(target_albedo)}
target, _ = render_beauty(config, target_ir, 2)
target = jax.lax.stop_gradient(target)

params = {"materials": {"albedo": ir["materials"]["albedo"]}}
row_mask = jnp.zeros_like(params["materials"]["albedo"]).at[0].set(1.0)
opt = optax.adam(0.05)
opt_state = opt.init(params)

print(f"target albedo: {np.asarray(target_albedo)}")
for it in range(100):
    loss, grads = render_loss_and_grad(config, ir, params, target, 2)
    grads["materials"]["albedo"] = grads["materials"]["albedo"] * row_mask
    updates, opt_state = opt.update(grads, opt_state)
    params = optax.apply_updates(params, updates)
    params["materials"]["albedo"] = jnp.clip(
        params["materials"]["albedo"], 0.0, 1.0)
    if it % 10 == 0:
        print(f"iter {it:3d}  loss {float(loss):.6f}  "
              f"albedo {np.asarray(params['materials']['albedo'][0])}")

rec = np.asarray(params["materials"]["albedo"][0])
print(f"recovered: {rec}  (target {np.asarray(target_albedo)})")

from elevenrender_tpu.utils.image import write_png  # noqa: E402
merged = dict(ir)
merged["materials"] = {**ir["materials"], **params["materials"]}
img, _ = render_beauty(config, merged, 8)
timg, _ = render_beauty(config, target_ir, 8)
for name, data in (("inverse_recovered", img), ("inverse_target", timg)):
    arr = np.asarray(data).reshape(RES, RES, 3)
    write_png(os.path.join(outdir, f"{name}.png"),
              np.clip(np.abs(arr), 0, 1) ** (1 / 2.2))
print("images written to", outdir)
