"""Physical camera model (host side).

Mirror of /root/reference/src/Camera.h:5-25: 35mm focal, 36x24mm sensor,
aperture/focus-distance/bokeh for thin-lens DoF, XYZ-Euler rotation in
degrees, position.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class Camera:
    focal_length: float = 35 * 0.001
    sensor_width: float = 36 * 0.001
    sensor_height: float = 24 * 0.001
    aperture: float = 2.8
    focus_distance: float = 1000000.0
    rotation: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float32))
    bokeh: bool = False
    position: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(3, np.float32))

    @staticmethod
    def from_json(obj: dict) -> "Camera":
        """Parse the wire JSON (CommandManager.cpp:8-21 parse_camerajson)."""
        pos = obj["position"]
        rot = obj["rotation"]
        return Camera(
            focal_length=float(obj["focal_length"]),
            sensor_width=float(obj["sensor_width"]),
            sensor_height=float(obj["sensor_height"]),
            aperture=float(obj["aperture"]),
            focus_distance=float(obj["focus_distance"]),
            bokeh=bool(obj["bokeh"]),
            position=np.array([pos["x"], pos["y"], pos["z"]], np.float32),
            rotation=np.array([rot["x"], rot["y"], rot["z"]], np.float32),
        )
