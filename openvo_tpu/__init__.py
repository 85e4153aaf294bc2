"""openvo_tpu: a TPU-native visual-odometry framework.

Built from scratch in JAX/XLA/Pallas with the full capability surface of the
openVO reference (see SURVEY.md): stereo rectification, SGBM disparity, ORB
features, Hamming matching, rigid 3D-3D pose estimation and the
frame-to-frame tracking loop — every OpenCV C++ primitive re-implemented as
native TPU compute so the per-frame update jit-compiles to one XLA program.

Public API mirrors the reference's four exports (reference
src/openVO/__init__.py:1-5) plus the TPU-native extensions.
"""

from openvo_tpu.config import OdometerConfig, ORBParams, SGBMParams
from openvo_tpu.models.stereo_camera import StereoCamera
from openvo_tpu.models.stereo_odometer import StereoOdometer
from openvo_tpu.utils.rot2rpy import rot2RPY
from openvo_tpu.utils.draw_pose import drawPoseOnImage

__version__ = "0.1.0"

__all__ = [
    "StereoCamera",
    "StereoOdometer",
    "rot2RPY",
    "drawPoseOnImage",
    "OdometerConfig",
    "ORBParams",
    "SGBMParams",
]
