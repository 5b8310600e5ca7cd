"""panopticapi.utils shim: exact rgb2id/id2rgb semantics."""
import numpy as np


def rgb2id(color):
    if isinstance(color, np.ndarray) and len(color.shape) == 3:
        color = color.astype(np.uint32)
        return color[:, :, 0] + 256 * color[:, :, 1] + 256 * 256 * color[:, :, 2]
    return int(color[0] + 256 * color[1] + 256 * 256 * color[2])


def id2rgb(id_map):
    if isinstance(id_map, np.ndarray):
        rgb = np.zeros(id_map.shape + (3,), dtype=np.uint8)
        for i in range(3):
            rgb[..., i] = id_map % 256
            id_map = id_map // 256
        return rgb
    color = []
    for _ in range(3):
        color.append(id_map % 256)
        id_map //= 256
    return color


class IdGenerator:
    def __init__(self, categories):
        self.categories = categories

    def get_id(self, cat_id):
        raise NotImplementedError
