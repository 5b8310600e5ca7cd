"""Geometric transform shims (enough for d2 data/transforms imports)."""
import numpy as np


class Transform:
    def _set_attributes(self, params=None):
        if params:
            for k, v in params.items():
                if k != "self" and not k.startswith("_"):
                    setattr(self, k, v)

    def apply_image(self, img):
        raise NotImplementedError

    def apply_coords(self, coords):
        raise NotImplementedError

    def apply_box(self, box):
        idxs = np.array([(0, 1), (2, 1), (0, 3), (2, 3)]).flatten()
        coords = np.asarray(box).reshape(-1, 4)[:, idxs].reshape(-1, 2)
        coords = self.apply_coords(coords).reshape((-1, 4, 2))
        minxy = coords.min(axis=1)
        maxxy = coords.max(axis=1)
        return np.concatenate((minxy, maxxy), axis=1)

    def apply_segmentation(self, segmentation):
        return self.apply_image(segmentation)

    def apply_polygons(self, polygons):
        return [self.apply_coords(p) for p in polygons]

    def inverse(self):
        raise NotImplementedError

    @classmethod
    def register_type(cls, data_type, func=None):
        if func is None:
            def deco(f):
                setattr(cls, "apply_" + data_type, f)
                return f
            return deco
        setattr(cls, "apply_" + data_type, func)


class TransformList(Transform):
    def __init__(self, transforms):
        self.transforms = []
        for t in transforms:
            if isinstance(t, TransformList):
                self.transforms.extend(t.transforms)
            else:
                self.transforms.append(t)

    def _apply(self, x, meth):
        for t in self.transforms:
            x = getattr(t, meth)(x)
        return x

    def __getattr__(self, name):
        if name.startswith("apply_"):
            return lambda x: self._apply(x, name)
        raise AttributeError(name)

    def __add__(self, other):
        others = other.transforms if isinstance(other, TransformList) else [other]
        return TransformList(self.transforms + others)

    def __len__(self):
        return len(self.transforms)

    def __getitem__(self, i):
        return self.transforms[i]

    def inverse(self):
        return TransformList([t.inverse() for t in self.transforms[::-1]])


class NoOpTransform(Transform):
    def apply_image(self, img):
        return img

    def apply_coords(self, coords):
        return coords

    def inverse(self):
        return self

    def __getattr__(self, name):
        if name.startswith("apply_"):
            return lambda x: x
        raise AttributeError(name)


class HFlipTransform(Transform):
    def __init__(self, width):
        self.width = width

    def apply_image(self, img):
        return np.flip(img, axis=1)

    def apply_coords(self, coords):
        coords = np.asarray(coords, dtype=np.float64).copy()
        coords[:, 0] = self.width - coords[:, 0]
        return coords

    def inverse(self):
        return self


class VFlipTransform(Transform):
    def __init__(self, height):
        self.height = height

    def apply_image(self, img):
        return np.flip(img, axis=0)

    def apply_coords(self, coords):
        coords = np.asarray(coords, dtype=np.float64).copy()
        coords[:, 1] = self.height - coords[:, 1]
        return coords

    def inverse(self):
        return self


class ScaleTransform(Transform):
    def __init__(self, h, w, new_h, new_w, interp=None):
        self._set_attributes(locals())

    def apply_image(self, img, interp=None):
        import cv2
        return cv2.resize(img, (self.new_w, self.new_h))

    def apply_coords(self, coords):
        coords = np.asarray(coords, dtype=np.float64).copy()
        coords[:, 0] *= self.new_w / self.w
        coords[:, 1] *= self.new_h / self.h
        return coords

    def inverse(self):
        return ScaleTransform(self.new_h, self.new_w, self.h, self.w)


class CropTransform(Transform):
    def __init__(self, x0, y0, w, h, orig_w=None, orig_h=None):
        self._set_attributes(locals())

    def apply_image(self, img):
        return img[self.y0:self.y0 + self.h, self.x0:self.x0 + self.w]

    def apply_coords(self, coords):
        coords = np.asarray(coords, dtype=np.float64).copy()
        coords[:, 0] -= self.x0
        coords[:, 1] -= self.y0
        return coords


class PadTransform(Transform):
    def __init__(self, x0, y0, x1, y1, orig_w=None, orig_h=None,
                 pad_value=0.0, seg_pad_value=0):
        self._set_attributes(locals())

    def apply_image(self, img):
        pad = ((self.y0, self.y1), (self.x0, self.x1)) + ((0, 0),) * (img.ndim - 2)
        return np.pad(img, pad, constant_values=self.pad_value)

    def apply_coords(self, coords):
        coords = np.asarray(coords, dtype=np.float64).copy()
        coords[:, 0] += self.x0
        coords[:, 1] += self.y0
        return coords


class BlendTransform(Transform):
    def __init__(self, src_image, src_weight, dst_weight):
        self._set_attributes(locals())

    def apply_image(self, img):
        img = img.astype(np.float32)
        out = self.src_weight * self.src_image + self.dst_weight * img
        return np.clip(out, 0, 255).astype(np.uint8)

    def apply_coords(self, coords):
        return coords

    def inverse(self):
        return NoOpTransform()
