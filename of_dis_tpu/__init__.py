"""of_dis_tpu — TPU-native Dense Inverse Search optical flow / stereo.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
tikroeger/OF_DIS ("Fast Optical Flow using Dense Inverse Search", Kroeger et
al., ECCV 2016, plus the bundled DeepFlow variational refinement).  Built
TPU-first: patches are batch axes, control flow is static, aggregation is a
deterministic scatter-add, and SOR is red-black.  Scaling is expressed with
jax.sharding meshes (data-parallel frame batches, spatial tiling).

Public API:
    dis_flow(img1, img2, cfg)   -> (H, W, 2) optical flow
    dis_stereo(img1, img2, cfg) -> (H, W) disparity
    DISConfig, operating_point, auto_first_scale
    io.read_flo / write_flo / read_pfm / write_pfm / load_image
    viz.flow_to_color / disparity_to_gray / save_image
"""

from .config import DISConfig, auto_first_scale, operating_point
from .models.dis import dis_flow, dis_raw, dis_stereo
from . import io
from .utils import viz

__version__ = "0.1.0"

__all__ = [
    "DISConfig",
    "auto_first_scale",
    "operating_point",
    "dis_flow",
    "dis_stereo",
    "dis_raw",
    "io",
    "viz",
]
