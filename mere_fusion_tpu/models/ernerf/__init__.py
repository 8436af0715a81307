"""ER-NeRF: audio-driven triplane NeRF talking head."""

from mere_fusion_tpu.models.ernerf.network import NeRFNetwork  # noqa: F401
from mere_fusion_tpu.models.ernerf.renderer import (  # noqa: F401
    DensityGrid,
    intersect_aabb,
    render_rays,
)
