"""HDRI environment with luminance CDF for importance sampling (host side).

Mirror of /root/reference/src/HDRI.{h,cpp}:
- per-pixel luminance CDF over the whole image (HDRI.cpp:62-83),
- solid-angle pdf with the sin(theta) term (HDRI.cpp:101-107),
- default environment = constant 0.5 grey (HDRI.cpp:18).

The CDF build is vectorized numpy (the reference's double loop is O(W*H)
scalar); device-side inversion sampling lives in ``ops/hdri.py``.
"""

from __future__ import annotations

import numpy as np

from .texture import Texture


class HDRI:
    def __init__(self, texture: Texture | None = None):
        if texture is None:
            texture = Texture.from_color([0.5, 0.5, 0.5])  # HDRI.cpp:18
        self.texture = texture
        self.cdf: np.ndarray = np.zeros(1, np.float32)
        self.radiance_sum: float = 0.0
        self.generate_cdf()

    def generate_cdf(self) -> None:
        """HDRI.cpp:62-83: cdf[i+1] = cdf[i] + (r+g+b)/radianceSum in
        row-major pixel order; cdf[0] = 0."""
        img = self.texture.data
        if img.shape[2] >= 3:
            lum = img[..., 0] + img[..., 1] + img[..., 2]
        else:
            lum = img[..., 0] * 3.0  # 1-channel promotes to grey
        lum = lum.astype(np.float64).reshape(-1)
        self.radiance_sum = float(lum.sum())
        # All-black env: the reference divides 0/0 here (NaN CDF) and every
        # sample dies in the NaN guard.  Guard the division so the CDF is
        # well-formed (all zeros); the device pdf is then 0 and native mode
        # zeroes the NEE term instead of poisoning the sample.
        cdf = np.empty(lum.size + 1, np.float64)
        cdf[0] = 0.0
        np.cumsum(lum / max(self.radiance_sum, 1e-30), out=cdf[1:])
        self.cdf = cdf.astype(np.float32)

    def pdf(self, x: int, y: int) -> float:
        """HDRI.cpp:101-107: hemisphere solid-angle pdf at pixel (x,y)."""
        dv = self.texture.value_at(x, y)
        theta = (float(y) / float(self.texture.height)) * np.pi
        return (float(dv.sum()) / self.radiance_sum) * self.texture.width * \
            self.texture.height / (2.0 * np.pi * np.sin(theta))

    def sample(self, r1: float) -> tuple[int, int]:
        """HDRI.cpp:109-117: invert the CDF -> pixel coords (host oracle;
        the device uses the same quirky binary search in ops/hdri.py)."""
        from ..ops.hdri import binary_search_host
        count = binary_search_host(self.cdf, r1,
                                   self.texture.width * self.texture.height)
        return count % self.texture.width, count // self.texture.width
