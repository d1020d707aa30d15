from .base import Frame, FrameReader, get_dataset  # noqa: F401
from . import cofusion, replica, tumrgbd, scannet, synthetic  # noqa: F401
