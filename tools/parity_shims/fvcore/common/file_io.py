from iopath.common.file_io import PathManager as PathManagerBase
from iopath.common.file_io import PathHandler  # noqa: F401

PathManager = PathManagerBase()
