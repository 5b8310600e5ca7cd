import sys
import os

import numpy as np

_REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", "..")
if _REPO not in sys.path:
    sys.path.insert(0, os.path.abspath(_REPO))

from hipie_tpu.evaluation.rle import (mask_iou_matrix, rle_area,  # noqa: E402
                                      rle_decode, rle_encode)


def encode(bimask):
    if bimask.ndim == 3:
        return [encode(np.asfortranarray(bimask[:, :, i]))
                for i in range(bimask.shape[2])]
    return rle_encode(np.ascontiguousarray(bimask))


def decode(rleObjs):
    if isinstance(rleObjs, list):
        return np.stack([rle_decode(r) for r in rleObjs], -1)
    return rle_decode(rleObjs)


def area(rleObjs):
    if isinstance(rleObjs, list):
        return np.asarray([rle_area(r) for r in rleObjs])
    return rle_area(rleObjs)


def iou(dt, gt, iscrowd):
    d = [rle_decode(r) if isinstance(r, dict) else np.asarray(r) for r in dt]
    g = [rle_decode(r) if isinstance(r, dict) else np.asarray(r) for r in gt]
    return mask_iou_matrix(d, g, np.asarray(iscrowd, bool))


def merge(rleObjs, intersect=0):
    ms = np.stack([rle_decode(r) for r in rleObjs], 0)
    merged = ms.all(0) if intersect else ms.any(0)
    return rle_encode(merged.astype(np.uint8))


def toBbox(rleObjs):
    single = not isinstance(rleObjs, list)
    objs = [rleObjs] if single else rleObjs
    out = []
    for r in objs:
        m = rle_decode(r)
        ys, xs = np.nonzero(m)
        if len(xs) == 0:
            out.append([0.0, 0.0, 0.0, 0.0])
        else:
            out.append([float(xs.min()), float(ys.min()),
                        float(xs.max() - xs.min() + 1),
                        float(ys.max() - ys.min() + 1)])
    arr = np.asarray(out)
    return arr[0] if single else arr


def frPyObjects(pyobj, h, w):
    raise NotImplementedError("polygon conversion not needed in parity harness")
