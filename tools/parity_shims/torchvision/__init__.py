"""torchvision shim (CPU parity harness): box ops + python NMS only."""
__version__ = "0.15-shim"
from torchvision import ops  # noqa: F401
