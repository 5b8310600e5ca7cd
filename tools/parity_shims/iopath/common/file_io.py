"""iopath shim: local-filesystem PathManager only (no network in this image)."""
import contextlib
import os
import shutil


class PathHandler:
    def _get_supported_prefixes(self):
        return []


class HTTPURLHandler(PathHandler):
    def _get_supported_prefixes(self):
        return ["http://", "https://", "ftp://"]


class OneDrivePathHandler(PathHandler):
    def _get_supported_prefixes(self):
        return ["https://1drv.ms/u/s!"]


class PathManager:
    def __init__(self):
        self._handlers = []

    def register_handler(self, handler, allow_override=True):
        self._handlers.append(handler)

    def set_strict_kwargs_checking(self, enable):
        pass

    def open(self, path, mode="r", **kwargs):
        return open(path, mode)

    def exists(self, path):
        return os.path.exists(path)

    def isfile(self, path):
        return os.path.isfile(path)

    def isdir(self, path):
        return os.path.isdir(path)

    def ls(self, path):
        return sorted(os.listdir(path))

    def mkdirs(self, path):
        os.makedirs(path, exist_ok=True)

    def rm(self, path):
        os.remove(path)

    def copy(self, src, dst, **kwargs):
        shutil.copy(src, dst)
        return True

    def get_local_path(self, path, **kwargs):
        return path

    def symlink(self, src, dst):
        os.symlink(src, dst)


g_pathmgr = PathManager()


@contextlib.contextmanager
def file_lock(path):
    # single-process parity harness: no locking needed
    yield
