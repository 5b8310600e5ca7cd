class COCOeval:
    def __init__(self, *a, **k):
        raise NotImplementedError("COCOeval not on parity path")


Params = COCOeval

from pycocotools import mask as maskUtils  # noqa: E402,F401
