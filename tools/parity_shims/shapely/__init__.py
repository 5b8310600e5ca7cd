"""shapely shim: only imported transitively (cityscapes datasets); any actual
use raises."""


def __getattr__(name):
    raise ImportError(f"shapely shim: {name} not available in parity harness")
