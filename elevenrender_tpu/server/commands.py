"""Command layer: argv-style command parsing + session state + dispatch.

Mirror of the reference's L2/L3 (/root/reference/src/main.cpp:36-187,
CommandManager.{h,cpp}): command strings arrive as messages, are parsed
argv-style (str_to_argv, main.cpp:13-24), asset payloads follow as 1-2
data messages, and every load/start replies OK.  Supported commands and
flags match main.cpp:48-83:

  load_config load_texture load_object load_camera load_hdri
  load_brdf_material load_osl_material start pause abort
  --path --recompute_normals --mirror_x --mirror_y --output
  --get_info --get_sycl_info --get_pass <name>

Superset over the reference: pause/abort are declared but no-ops there
(main.cpp:81-82).  Here `pause` stops the render thread keeping the
accumulated state (a bare `start` resumes the remaining samples, since
the progressive carry IS the checkpoint), while `abort` discards it.

(get_* work both as ``--get_info`` flags, as the reference registers them,
and bare ``get_info`` for convenience.)  Disk loads (--path) are fully
implemented for OBJ (the only one the reference implements,
CommandManager.cpp:229-236) and additionally for config/camera/brdf JSON
files — capability superset.
"""

from __future__ import annotations

import json
import shlex

import numpy as np

from ..render.renderer import Renderer
from ..scene.camera import Camera
from ..scene.hdri import HDRI
from ..scene.ir import RenderConfig
from ..scene.material import Material
from ..scene.objloader import load_objs
from ..scene.scene import Scene
from ..scene.texture import Texture
from ..utils.logging import get_logger
from .protocol import Message

log = get_logger()


def parse_config_json(obj: dict) -> RenderConfig:
    """ConfigTCPLoadInputCommand::load (CommandManager.cpp:154-172).

    Superset key ``compat`` (default true = reference-quirk parity):
    false selects native mode — proper MIS weights, exact env CDF
    inversion, and live point-light NEE (required for lights loaded via
    load_point_light to contribute)."""
    return RenderConfig(
        x_res=int(obj["x_res"]), y_res=int(obj["y_res"]),
        sample_target=int(obj["sample_target"]),
        denoise=bool(obj["denoise"]),
        device=str(obj.get("device", "")),
        block_size=int(obj.get("block_size", 8)),
        compat=bool(obj.get("compat", True)),
    )


def parse_texture_msgs(metadata: dict, data: np.ndarray) -> Texture:
    """parse_texturejson (CommandManager.cpp:23-42)."""
    cs = metadata.get("color_space", "sRGB")
    return Texture.from_raw(
        name=str(metadata["name"]), width=int(metadata["width"]),
        height=int(metadata["height"]), channels=int(metadata["channels"]),
        data=data, filter=Texture.FILTER_NONE, srgb=(cs == "sRGB"))


COMMAND_WORDS = ("load_config", "load_texture", "load_object", "load_camera",
                 "load_hdri", "load_brdf_material", "load_osl_material",
                 "load_point_light", "start", "pause", "abort", "get_info",
                 "get_sycl_info", "get_pass")


def parse_command_args(command_str: str) -> dict[str, list[str]]:
    """argv-style parse (str_to_argv + boost::program_options,
    main.cpp:13-24, 43-86) -> {flag: [values]}.

    Hardened beyond the reference parser (which throws into a catch-all):
    - malformed quoting falls back to whitespace splitting;
    - a value may not begin with '--' (it starts the next flag — matching
      program_options, where such a token is always an option);
    - repeated flags keep the LAST occurrence;
    - bare command words act as flags, and a bare ``get_pass normal``
      binds the following positional as its value.
    """
    try:
        args = shlex.split(command_str)
    except ValueError:  # unbalanced quotes
        args = command_str.split()

    flags: dict[str, list[str]] = {}
    current: str | None = None
    for a in args:
        if a.startswith("--"):
            current = a[2:]
            flags[current] = []
        elif current is not None:
            flags[current].append(a)
        else:
            # Leading bare word: command itself (argv parity).
            if a in COMMAND_WORDS:
                current = a
                flags[current] = []
            else:
                flags.setdefault(a, [])
    return flags


class CommandSession:
    """Per-connection session: scene + render lifecycle (CommandManager)."""

    def __init__(self, send, recv):
        """send(Message), recv() -> Message are transport callbacks."""
        self.send = send
        self.recv = recv
        self.scene = Scene()
        self.config = RenderConfig()
        self.renderer: Renderer | None = None
        self._config_dirty = True
        # shader name -> registry slot bound via load_osl_material.
        self._shader_slots: dict[str, int] = {}

    # ---- command handling ----------------------------------------------
    def handle_command(self, command_str: str) -> bool:
        """Execute one command string.  Returns False to close session."""
        log.info("Parsing: %s", command_str)
        flags = parse_command_args(command_str)
        path = " ".join(flags["path"]).strip('"') if "path" in flags else None

        try:
            if "load_config" in flags:
                self._load_config(path)
            elif "load_camera" in flags:
                self._load_camera(path)
            elif "load_texture" in flags:
                self._load_texture(path, "mirror_x" in flags,
                                   "mirror_y" in flags)
            elif "load_hdri" in flags:
                self._load_hdri(path, "mirror_x" in flags,
                                "mirror_y" in flags)
            elif "load_brdf_material" in flags:
                self._load_brdf(path)
            elif "load_object" in flags:
                self._load_object(path, "recompute_normals" in flags)
            elif "load_point_light" in flags:
                self._load_point_light(path)
            elif "load_osl_material" in flags:
                self._load_osl_material(path, flags)
            elif "start" in flags:
                self._start()
            elif "pause" in flags:
                # Real pause (the reference declares it a no-op,
                # main.cpp:81): stop the render thread at the next chunk
                # boundary; the accumulation state stays, and a subsequent
                # bare `start` resumes exactly where it left off.
                if self.renderer is not None:
                    self.renderer.stop()
                    self.renderer.join()
                self.send(Message.ok())
            elif "abort" in flags:
                # Abort discards progress: the next start re-renders.
                if self.renderer is not None:
                    self.renderer.stop()
                    self.renderer.join()
                    self.renderer = None
                self.send(Message.ok())
            elif "help" in flags:
                self._help()
            elif "get_info" in flags:
                self._get_info()
            elif "get_sycl_info" in flags:
                self._get_device_info()
            elif "get_pass" in flags:
                name = flags["get_pass"][0] if flags["get_pass"] else "beauty"
                if "output" in flags and flags["output"]:
                    self._save_pass(name, flags["output"][0])
                else:
                    self._get_pass(name)
            else:
                log.error("Input Command not recognized in: %s", command_str)
        except Exception as e:  # log-and-continue (reference behavior)
            log.error("Command failed: %s", e, exc_info=True)
        return True

    # ---- loads ----------------------------------------------------------
    def _load_config(self, path):
        if path:
            with open(path) as f:
                rp = parse_config_json(json.load(f))
        else:
            rp = parse_config_json(self.recv().get_json_data())
        self.config = rp
        self.scene.x_res = rp.x_res
        self.scene.y_res = rp.y_res
        self._config_dirty = True
        self.send(Message.ok())

    def _load_camera(self, path):
        if path:
            with open(path) as f:
                cam = Camera.from_json(json.load(f))
        else:
            cam = Camera.from_json(self.recv().get_json_data())
        self.scene.set_camera(cam)
        self.send(Message.ok())

    def _load_texture(self, path, mirror_x=False, mirror_y=False):
        if path:
            tex = Texture.from_file(path)
        else:
            metadata = self.recv().get_json_data()
            data = self.recv().get_float_data()
            tex = parse_texture_msgs(metadata, data)
        if mirror_x:
            tex.mirror_x()
        if mirror_y:
            tex.mirror_y()
        self.scene.add_texture(tex)
        self.scene.pair_textures()
        self.send(Message.ok())

    def _load_hdri(self, path, mirror_x=False, mirror_y=False):
        if path:
            tex = Texture.from_file(path, srgb=False)
        else:
            metadata = self.recv().get_json_data()
            data = self.recv().get_float_data()
            tex = parse_texture_msgs(metadata, data)
        # HdriTCPLoadInputCommand::load (CommandManager.cpp:178-194).
        if mirror_x:
            tex.mirror_x()
        if mirror_y:
            tex.mirror_y()
        tex.pixel_shift(0.5, 0)
        self.scene.add_hdri(HDRI(tex))
        self.send(Message.ok())

    def _load_brdf(self, path):
        if path:
            with open(path) as f:
                mat = Material.from_json(json.load(f))
        else:
            mat = Material.from_json(self.recv().get_json_data())
        self.scene.add_material(mat)
        self.scene.pair_materials()
        self.scene.pair_textures()
        self.send(Message.ok())

    def _load_point_light(self, path):
        """Protocol superset: the reference has a PointLight type
        (Scene.h:62, PointLight.h:4-16) but no command to load one (and
        its point-light shading is dead code, kernel.cpp:269-301).  Here
        a JSON ``{"position": [x,y,z], "radiance": [r,g,b]}`` payload —
        from --path or a follow-up data message — feeds the native
        integrator's live point-light NEE."""
        from ..scene.scene import PointLight
        if path:
            with open(path) as f:
                obj = json.load(f)
        else:
            obj = self.recv().get_json_data()
        self.scene.add_point_light(PointLight(
            position=np.asarray(obj["position"], np.float32),
            radiance=np.asarray(obj["radiance"], np.float32)))
        self.send(Message.ok())

    def _load_osl_material(self, path, flags):
        """Programmable-shader binding over the wire — the capability the
        reference declares but never handles (main.cpp:60; the ASL slots
        exist only as build-time LLVM-IR splices, shader.h:5-18).

        No code crosses the wire: the command SELECTS a shader from the
        named registry (render/shaders.NAMED_SHADERS) and binds it to a
        material's albedo slot, exactly how the reference's
        albedoShaderID selects one of its 4 compiled-in bodies
        (kernel.cpp:530-536).  Two forms:

          load_osl_material --material <mat> --shader <name> [--slot N]
          load_osl_material --path spec.json   # same keys in JSON

        Unknown shader names and missing arguments keep the reference's
        no-op behavior (log + OK) so legacy clients are unaffected —
        including EVERY malformed-input path (bad --slot, unreadable
        --path, out-of-range slot): the reply must always be sent, or
        the client deadlocks in its ok-wait (a raise here would be
        swallowed by handle_command's catch-all WITHOUT replying)."""
        from ..render import shaders as shader_registry
        try:
            spec = {}
            if path:
                with open(path) as f:
                    spec = json.load(f)
            if "material" in flags and flags["material"]:
                spec["material"] = flags["material"][0]
            if "shader" in flags and flags["shader"]:
                spec["shader"] = flags["shader"][0]
            if "slot" in flags and flags["slot"]:
                spec["slot"] = int(flags["slot"][0])
        except Exception as e:  # noqa: BLE001 — malformed input = no-op
            log.error("load_osl_material: malformed request (%s); ignoring",
                      e)
            self.send(Message.ok())
            return

        name = spec.get("shader")
        mat_name = spec.get("material")
        if not name or not mat_name:
            log.error("load_osl_material needs --material and --shader "
                      "(or a --path JSON with those keys); ignoring")  # parity
            self.send(Message.ok())
            return
        fn = shader_registry.NAMED_SHADERS.get(name)
        if fn is None:
            log.error("load_osl_material: unknown shader %r (known: %s); "
                      "ignoring", name,
                      sorted(shader_registry.NAMED_SHADERS))
            self.send(Message.ok())
            return
        # Validate EVERYTHING before mutating anything: the no-op
        # contract means a failed request must leave the registry and
        # bindings untouched (an early register_shader would silently
        # change other materials bound to that slot at the next rebuild).
        mat = next((m for m in self.scene.materials if m.name == mat_name),
                   None)
        if mat is None:
            log.error("load_osl_material: material %r not loaded; ignoring",
                      mat_name)
            self.send(Message.ok())
            return
        slot = spec.get("slot")
        if slot is None:
            if name in self._shader_slots:
                slot = self._shader_slots[name]
            else:
                # First FREE slot (one not bound by any name), so an
                # explicit binding at slot k is never silently evicted
                # while free slots remain; only a truly full registry
                # wraps, with a warning.
                used = set(self._shader_slots.values())
                free = [s for s in range(shader_registry.MAX_SHADERS)
                        if s not in used]
                if free:
                    slot = free[0]
                else:
                    slot = len(self._shader_slots) % \
                        shader_registry.MAX_SHADERS
                    log.warning(
                        "load_osl_material: all %d shader slots bound; "
                        "auto-assigning %r to slot %d EVICTS the shader "
                        "previously there (materials bound to that slot "
                        "change appearance)",
                        shader_registry.MAX_SHADERS, name, slot)
                    # Drop stale entries for the evicted slot, or a
                    # later bind of the evicted NAME would silently
                    # reuse this slot and evict the new shader without
                    # any warning.
                    for other in [k for k, v in self._shader_slots.items()
                                  if v == slot]:
                        del self._shader_slots[other]
        slot = int(slot)
        if not (0 <= slot < shader_registry.MAX_SHADERS):
            log.error("load_osl_material: slot %d out of range [0, %d); "
                      "ignoring", slot, shader_registry.MAX_SHADERS)
            self.send(Message.ok())
            return
        shader_registry.register_shader(slot, fn)
        self._shader_slots[name] = slot
        mat.albedo_shader_id = slot
        self.scene.dirty = True
        log.info("Bound shader %r (slot %d) to material %r albedo",
                 name, slot, mat_name)
        self.send(Message.ok())

    def _load_object(self, path, recompute_normals):
        if path:
            meshes, mtl_mats = load_objs(path,
                                         recompute_normals=recompute_normals)
        else:
            obj_msg = self.recv()
            mtl_msg = self.recv()
            # Reference strips MTL to newmtl lines only (ObjLoader.cpp:156)
            # — materials arrive separately as BRDF JSONs; names suffice.
            meshes, mtl_mats = load_objs(
                obj_msg.data.decode("utf-8", "replace"),
                mtl_text=mtl_msg.get_string_data(),
                recompute_normals=recompute_normals)
        self.scene.add_meshes(meshes)
        self.scene.pair_materials()
        self.send(Message.ok())

    # ---- actions --------------------------------------------------------
    def _start(self):
        if (self.renderer is not None and not self.scene.dirty
                and not self._config_dirty):
            # Resume a paused render: nothing changed since the last
            # build, so keep the accumulated state and finish the
            # remaining samples.  Settle the render thread FIRST: reading
            # the sample count while chunks are still completing would
            # undercount `done` and overshoot sample_target (a bare
            # double --start must resume, not extend).
            self.renderer.stop()
            self.renderer.join()
            done = self.renderer.get_render_info()["samples"]
            remaining = self.config.sample_target - done
            if remaining > 0:
                self.renderer.start(remaining)
            self.send(Message.ok())
            return
        config, ir = self.scene.build(config=self.config)
        self.config = config
        self.scene.dirty = False
        self._config_dirty = False
        self.renderer = Renderer(config, ir)
        self.renderer.start(config.sample_target)
        self.send(Message.ok())

    _HELP_TEXT = """Allowed options:
  --help                     show this message
  --load_config              load render config (JSON follows, or --path)
  --load_camera              load camera (JSON follows, or --path)
  --load_texture             load texture (JSON + float data follow, or
                             --path; flags: --mirror_x --mirror_y)
  --load_hdri                load environment (JSON + float data follow,
                             or --path; flags: --mirror_x --mirror_y)
  --load_brdf_material       load Disney BRDF material (JSON, or --path)
  --load_osl_material        bind a named shader to a material's albedo:
                             --material <mat> --shader <name> [--slot N]
  --load_object              load OBJ (obj + mtl strings follow, or --path;
                             flag: --recompute_normals)
  --load_point_light         load point light (JSON, or --path)
  --start                    build scene and start rendering (resumes after
                             pause)
  --pause                    stop rendering, keep progress
  --abort                    stop rendering, discard progress
  --get_info                 render progress JSON
  --get_sycl_info            device inventory JSON
  --get_pass <name>          fetch pass (beauty/denoise/normal/tangent/
                             bitangent); --output <path> saves a PNG instead
"""

    def _help(self):
        """The reference's --help (boost::program_options description,
        main.cpp:48-86) — sent as a string message."""
        from .protocol import Message as M
        self.send(M("data", "string", self._HELP_TEXT.encode()))

    def _get_info(self):
        info = {"samples": 0}
        if self.renderer is not None:
            info = self.renderer.get_render_info()
        self.send(Message.json_msg(info))

    # Device-probe cache: compatibility of a device does not change within
    # a server process, so each device is probed at most once.
    _probe_cache: dict = {}

    @classmethod
    def _probe_device(cls, d) -> bool:
        """Real compatibility probe — the analog of the reference's
        ``sycl::is_compatible<KernelNameTest>`` (kernel.cpp:708-720),
        which actually test-compiles a kernel for the device.  Here:
        jit-compile and run a trivial step pinned to the device; any
        compile/runtime failure marks it incompatible."""
        import jax
        import jax.numpy as jnp
        key = (d.platform, d.id)
        if key not in cls._probe_cache:
            try:
                out = jax.jit(lambda x: x * 2.0 + 1.0)(
                    jax.device_put(jnp.ones((8,), jnp.float32), d))
                cls._probe_cache[key] = bool(abs(float(out[0]) - 3.0) < 1e-6)
            except Exception:  # noqa: BLE001 — any failure = incompatible
                cls._probe_cache[key] = False
        return cls._probe_cache[key]

    def _get_device_info(self):
        """get_sycl_info analog: enumerate JAX devices
        (CommandManager.cpp:303-362)."""
        import jax
        devices = []
        for d in jax.devices():
            devices.append({
                "name": f"{d.device_kind}:{d.id}",
                "platform": d.platform,
                "memory": getattr(d, "memory_stats", lambda: {})() or {},
                "max_compute_units": d.core_on_chip
                if hasattr(d, "core_on_chip") else 1,
                "is_compatible": self._probe_device(d),
                "online_compiler": True,
                "type": "tpu" if d.platform == "tpu" else d.platform,
            })
        self.send(Message.json_msg({"devices": devices}))

    def _get_pass(self, name):
        if self.renderer is None:
            self.send(Message.json_msg({"error": "no render started"}))
            return
        data = self.renderer.get_pass(name)
        self.send(Message.float_data(data, "float4"))

    def _save_pass(self, name, path):
        if self.renderer is not None:
            self.renderer.save_pass(name, path)
        self.send(Message.ok())
