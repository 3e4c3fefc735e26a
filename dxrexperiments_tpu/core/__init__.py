from . import camera, camera_controller, rng, timer, vecmath  # noqa: F401
from .camera import Camera, camera_params, primary_ray_grid  # noqa: F401
from .camera_controller import CameraController, InputState  # noqa: F401
from .timer import StepTimer  # noqa: F401
