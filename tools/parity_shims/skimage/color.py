"""skimage.color shim: rgb2lab via cv2 with skimage value ranges.

skimage rgb2lab: input float [0,1] or uint8; output L in [0,100], a/b
roughly [-128,127]. cv2 gives L in [0,255] for 8U; use float path: cv2
float32 input in [0,1] -> L in [0,100], a/b centered at 0 (same as skimage).
"""
import cv2
import numpy as np


def rgb2lab(rgb):
    arr = np.asarray(rgb)
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    else:
        arr = arr.astype(np.float32)
    return cv2.cvtColor(arr, cv2.COLOR_RGB2LAB).astype(np.float64)
