from . import dds, image, stats  # noqa: F401
from .image import psnr, read_image, write_png  # noqa: F401
from .stats import FrameStats  # noqa: F401
